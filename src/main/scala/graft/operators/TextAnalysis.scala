package graft.operators

import graft.Cut.CutOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: tokenization,
  * quality scoring, language-ID heuristics, document fingerprinting.
  *
  * Not present in the reference (its compute surface stops at validation
  * aggregates, SURVEY §2.6) — these are the north-star extensions, built as
  * pure `Column` expressions so they stay inside whole-stage codegen: at
  * 100 TB a per-document UDF would be the bottleneck, a codegen'd expression
  * tree is not. Every function has an exact ANSI-SQL mirror (used by the
  * DuckDB verification oracle) because determinism across engines is the
  * same property GOE's cross-DB validation relies on.
  */
object TextAnalysis {

  /** Whitespace tokenizer. `split(trim(x))` never yields empty tokens on
    * trimmed input, and matches DuckDB `string_split_regex(trim(x), '\s+')`. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count approximation: whitespace tokens plus an extra
    * unit per 6 chars of long tokens (a cheap, deterministic stand-in for a
    * real tokenizer's subword splitting). */
  def approxSubwordCount(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + greatest(lit(1L), ceil(length(t) / lit(6.0)).cast("long")))

  /** Corpus vocabulary: token frequency table, descending, deterministic
    * tiebreak on the token itself — the first step of tokenizer/BPE
    * training and OOV analysis. Scale shape: explode + groupBy(token) is
    * map-side partially aggregated (the heavy hitters collapse per
    * partition before the shuffle), and the top-k is a TakeOrdered — only
    * k rows ever reach the driver. */
  def vocabulary(docs: DataFrame, k: Int,
                 textCol: String = "text"): DataFrame =
    docs.select(explode(tokens(lower(col(textCol)))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(k)

  /** Grouped top-k vocabulary: token ranks WITHIN each group (language,
    * domain) — the window runs after the partial-aggregated groupBy, so
    * the shape is shuffle-on-(group,token) then shuffle-on-group, never a
    * global sort; each group's ranking is independent and parallel. */
  def vocabularyByGroup(docs: DataFrame, k: Int,
                        groupCol: String = "lang",
                        textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(col(groupCol), explode(tokens(lower(col(textCol)))).as("tok"))
      .groupBy(col(groupCol), col("tok")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("n").desc, col("tok").asc)
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .orderBy(col(groupCol), col("rk"))
  }

  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "on")

  /** Fraction of tokens that are stopwords (quality signal). Exact rational:
    * computed as double division of two ints — bitwise deterministic. */
  def stopwordRatio(text: Column,
                    stopwords: Seq[String] = DefaultStopwords): Column = {
    val stops = array(stopwords.map(lit): _*)
    val hits = size(filter(tokens(text), t => array_contains(stops, t)))
    hits.cast("double") / tokenCount(text).cast("double")
  }

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,;:!?'\"()-]", "")))
      .cast("double") / length(text).cast("double")

  /** Mean token length (verbosity signal). */
  def meanTokenLength(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t))
      .cast("double") / tokenCount(text).cast("double")

  /** Composite quality score in [0,1]: rewards mid-length docs, penalises
    * stopword-heavy and punctuation-heavy text. All double arithmetic in a
    * fixed evaluation order so two engines agree bitwise. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val stopPenalty = stopwordRatio(text) * lit(0.5)
    val punctPenalty = punctRatio(text) * lit(2.0)
    greatest(lit(0.0), lenScore - stopPenalty - punctPenalty)
  }

  /** Lexical-surprisal scoring — the perplexity-filter stand-in (cf.
    * CCNet's KenLM buckets) that needs NO language model and NO floating
    * transcendentals: a token's "information" is the bit-width of its
    * corpus frequency, `length(bin(tf))` = floor(log2(tf)) + 1 — an exact
    * INTEGER on every engine, so per-doc means (int sum / int count) are
    * bit-reproducible where a real log-prob would drift in the last ulp.
    * High mean bits = stopword-heavy fluent text; low = rare-token noise;
    * both tails are the filter candidates, exactly like perplexity
    * bucketing.
    *
    * Scale shape: corpus term frequencies are one partial-agg shuffle on
    * the token key; the join back is a token equi-join (high cardinality,
    * well partitioned); one groupBy doc. Occurrences, not distinct — a
    * doc repeating "the" 100× scores 100 common tokens. */
  def lexicalSurprisal(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    // the exploded occurrence relation feeds BOTH the tf aggregation and
    // the join side — lazily checkpoint it so tokenisation runs once
    // (same materialised-index rationale as jaccardPairs; checkpoint, not
    // persist, so the blocks are GC-reclaimed with the returned plan —
    // the Dedup.shingleOverlap discipline)
    val toks = docs.select(col(idCol).as("sid"),
      explode(tokens(col(textCol))).as("tok"))
      .cut(false)
    val tf = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
    toks.join(tf, "tok")
      .withColumn("bits", length(bin(col("tf"))).cast("long"))
      .groupBy(col("sid"))
      .agg(count(lit(1)).as("n_tokens"),
           sum(col("bits")).as("total_bits"))
      .withColumn("mean_bits",
        col("total_bits").cast("double") / col("n_tokens").cast("double"))
      .select(col("sid").as(idCol), col("n_tokens"), col("total_bits"),
              col("mean_bits"))
  }

  /** Quality-weighted sampling (cf. CCNet's perplexity buckets / the
    * "sample high-quality data at higher rates" recipe): each doc is kept
    * with probability `floorRate + quality × span`, decided by comparing a
    * deterministic per-doc uniform draw (first 8 md5 hex digits of
    * salt|id) against a per-doc hex threshold derived from its own quality
    * score. Map-only — each doc's fate is a pure function of (salt, id,
    * text), no shuffle, no RNG state; re-runs and external engines agree
    * on the exact kept set. `floorRate + span` must stay < 1 so the
    * threshold fits 8 hex digits. */
  def qualityWeightedSample(docs: DataFrame, floorRate: Double = 0.05,
                            span: Double = 0.9, salt: String = "qw",
                            idCol: String = "doc_id",
                            textCol: String = "text"): DataFrame = {
    require(floorRate > 0 && span >= 0 && floorRate + span < 1.0,
      "need 0 < floorRate and floorRate + span < 1")
    val rate = lit(floorRate) + qualityScore(col(textCol)) * lit(span)
    val threshold = lower(lpad(
      hex(floor(rate * lit(4294967296.0d)).cast("long")), 8, "0"))
    val draw = substring(
      md5(concat(lit(salt + "|"), col(idCol).cast("string"))), 1, 8)
    docs.withColumn("keep_rate", rate).filter(draw < threshold)
  }

  /** Per-language marker lexicons for the n-gram/stopword language-ID
    * heuristic. Deliberately tiny: language ID at pipeline scale is a
    * first-pass router, not a classifier. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "es" -> Seq("el", "la", "de", "que", "con"),
    "fr" -> Seq("le", "la", "et", "est", "avec"),
    "de" -> Seq("der", "die", "und", "ist", "mit"))

  /** Marker-hit count for one language. */
  def langScore(text: Column, markers: Seq[String]): Column = {
    val set = array(markers.map(lit): _*)
    size(filter(tokens(text), t => array_contains(set, t)))
  }

  /** Predicted language = argmax of marker hits, ties broken by lexicon
    * order, "und" (undetermined) when no marker hits at all. */
  def langId(text: Column): Column = {
    val scored = LangMarkers.map { case (lang, m) => (lang, langScore(text, m)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      // foldRight so earlier lexicons win ties (first match at max score)
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** HTML → text extraction (C4-style, cf. the C4 paper's cleaning rules
    * and trafilatura's tag-strip fallback): drop `<script>`/`<style>`
    * blocks wholesale (their content is code, not prose), strip remaining
    * tags, decode the six entities that dominate real crawl text, collapse
    * whitespace. Every step is a codegen'd `regexp_replace`/`replace`
    * chain — zero shuffle, scan-speed at any corpus size, and expressible
    * verbatim in any RE2/PCRE engine so an external oracle reproduces it
    * byte-for-byte. Deliberately NOT a parser: crawl HTML is malformed
    * more often than not, and a tolerant regexp pass over broken markup
    * beats a strict parser that throws (the same judgment call C4 made). */
  def cleanHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&" // amp LAST
    ).foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Sorted-token fingerprint: md5 over the sorted distinct token set —
    * canonicalises word order + repetition, the classic "fingerprint"
    * clustering key for near-dup detection. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Normalised-text exact-dup key (lowercase, collapse whitespace). */
  def exactKey(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Winnowing fingerprints (Schleimer et al., MOSS): hash every k-char
    * gram of the normalised text, slide a w-gram window, keep each window's
    * MINIMUM hash — the selected set is a position-robust document sketch
    * with guaranteed detection of matches ≥ w+k-1 chars. Rolling-hash
    * selection re-expressed relationally: explode gram positions, one
    * codegen'd window-min per doc, distinct the survivors. Scale shape: the
    * only shuffle is the per-doc window partition; rows are O(chars) and
    * the window is bounded — linear end to end. Docs shorter than one full
    * window (< k+w-1 chars) have no fingerprint, by construction.
    * Returns (doc_id, n_fp, fp_min) per qualifying doc. */
  def winnowFingerprints(docs: DataFrame, k: Int = 8, w: Int = 8,
                         idCol: String = "doc_id", textCol: String = "text")
      : DataFrame =
    docs
      .select(col(idCol),
        graft.functions.TextFunctions.winnowFingerprints(
          col(textCol), k, w).as("fps"))
      .filter(size(col("fps")) > 0)
      .select(col(idCol), size(col("fps")).cast("long").as("n_fp"),
        array_min(col("fps")).as("fp_min"))

  /** The selected fingerprint SET itself — one (id, fp) row per distinct
    * survivor; the sketch two documents are compared on. Kernel-evaluated:
    * map-only, no shuffle. */
  def winnowFingerprintSet(docs: DataFrame, k: Int = 8, w: Int = 8,
                           idCol: String = "doc_id", textCol: String = "text")
      : DataFrame =
    docs
      .select(col(idCol),
        explode(graft.functions.TextFunctions.winnowFingerprints(
          col(textCol), k, w)).as("fp"))

  /** Relational formulation (explode + window-min + distinct) — kept to
    * spec-check the kernel's equality; this is also the formulation the
    * DuckDB oracle mirrors. */
  def winnowFingerprintSetRelational(
      docs: DataFrame, k: Int = 8, w: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 1 && w >= 1)
    import org.apache.spark.sql.expressions.Window
    val norm = regexp_replace(trim(lower(col(textCol))), "\\s+", " ")
    val grams = docs
      .select(col(idCol), norm.as("norm"))
      .filter(length(col("norm")) >= k + w - 1)
      .select(col(idCol), col("norm"),
        (length(col("norm")) - k + 1).as("ng"),
        explode(sequence(lit(1), length(col("norm")) - k + 1)).as("i"))
      .select(col(idCol), col("ng"), col("i"),
        md5(col("norm").substr(col("i"), lit(k))).as("h"))
    val win = Window.partitionBy(col(idCol)).orderBy(col("i"))
      .rowsBetween(0, w - 1)
    grams
      .withColumn("fp", min(col("h")).over(win))
      .filter(col("i") <= col("ng") - w + 1) // complete windows only
      .select(col(idCol), col("fp")).distinct()
  }

  /** Repetition metrics (the Gopher/C4 quality-filter family): word-bigram
    * duplication fractions per document. `dup_frac` = share of bigram
    * occurrences that are repeats (1 − distinct/total); `top_frac` = share
    * taken by the single most frequent bigram. High values flag boilerplate
    * and degenerate machine text. Relational shape: explode bigrams, two
    * hash aggregations — one shuffle on (doc, gram), one on doc. */
  def repetitionMetrics(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val grams = docs.select(col(idCol),
      explode(graft.functions.TextFunctions.wordShinglesAll(
        col(textCol), 2)).as("gram"))
    grams
      .groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_2grams"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("max_2gram_count"))
      .withColumn("dup_frac",
        lit(1.0) - col("n_distinct").cast("double") /
          col("n_2grams").cast("double"))
      .withColumn("top_frac",
        col("max_2gram_count").cast("double") / col("n_2grams").cast("double"))
  }

  /** PII/url scrub metrics: match counts for URLs and e-mail addresses plus
    * the hash of the masked text (the cleaned corpus key). Pure codegen'd
    * regexp expressions — zero shuffle. */
  val UrlPattern = "https?://[^ ]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  def piiMetrics(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      regexp_count(t, lit(UrlPattern)).as("n_urls"),
      regexp_count(t, lit(EmailPattern)).as("n_emails"),
      md5(regexp_replace(regexp_replace(t, UrlPattern, "<URL>"),
        EmailPattern, "<EMAIL>")).as("masked_key"))
  }

  /** Encoding-anomaly (mojibake) detection: counts of the three signatures
    * of a broken decode pipeline — U+FFFD replacement characters (a decoder
    * already gave up), classic UTF-8-read-as-Latin-1 digraphs (`Ã`/`Â`
    * followed by a continuation-looking character, the `â€` smart-quote
    * prefix), and bare C1 control characters (Windows-1252 bytes that
    * survived a bad transcode). A crawl pipeline drops or re-decodes
    * flagged documents before they poison the token distribution.
    *
    * Pure codegen'd regexp projections appended to the input — zero
    * shuffle, composes with any downstream filter. */
  val ReplacementPattern = "\uFFFD"
  val MojibakePattern = "\u00C3.|\u00C2.|\u00E2\u20AC"
  val C1ControlPattern = "[\u0080-\u009F]"

  def encodingAnomalies(docs: DataFrame, textCol: String = "text")
      : DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_replacement",
        regexp_count(t, lit(ReplacementPattern)).cast("long"))
      .withColumn("n_mojibake",
        regexp_count(t, lit(MojibakePattern)).cast("long"))
      .withColumn("n_ctrl",
        regexp_count(t, lit(C1ControlPattern)).cast("long"))
      .withColumn("encoding_flagged",
        col("n_replacement") + col("n_mojibake") + col("n_ctrl") > 0)
  }

  /** Compression-ratio quality signal (deflate level 6): boilerplate and
    * template-heavy documents compress far below prose, and the ratio is
    * the cheap single-number proxy several published curation stacks
    * filter on. One `mapPartitions` pass with ONE `Deflater` reused
    * (reset) per task — codec init amortised exactly like the multimodal
    * decodes; no shuffle.
    *
    * Determinism: byte-exact for a fixed deflate level on a fixed zlib
    * implementation (the JDK's). No independent engine can be asked to
    * reproduce zlib output, so the registered query is a rows-only check
    * (q36 precedent) and the ORDERING properties — repetitive ≪ prose,
    * stability across runs — are spec-pinned instead. */
  def compressionMetrics(docs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val defl = new java.util.zip.Deflater(6, false)
        val buf = new Array[Byte](64 * 1024)
        rows.map { case (id, text) =>
          val raw = text.getBytes("UTF-8")
          defl.reset()
          defl.setInput(raw)
          defl.finish()
          var n = 0L
          while (!defl.finished()) n += defl.deflate(buf)
          (id, raw.length.toLong, n)
        }
      }
      .toDF(idCol, "n_raw", "n_deflated")
      .withColumn("ratio",
        col("n_deflated").cast("double") / col("n_raw").cast("double"))
  }

  /** Corpus curation verdict: the standard training-data filter chain —
    * quality floor, repetition ceiling, exact-duplicate removal (lowest id
    * is canonical) — composed into one keep/drop decision with the FIRST
    * failing rule as the drop reason (fixed rule order ⇒ deterministic
    * reasons). Plan shape: quality is a pure projection; repetition is the
    * two-aggregation bigram pass; canonical-copy detection is one window
    * min over the exact key — three bounded shuffles total, each on a
    * high-cardinality key. */
  def curate(docs: DataFrame, minQuality: Double = 0.3,
             maxDupFrac: Double = 0.5,
             idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val annotated = docs
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("exact_key", exactKey(col(textCol)))
      .withColumn("keep_id",
        min(col(idCol)).over(Window.partitionBy(col("exact_key"))))
    val rep = repetitionMetrics(docs, idCol, textCol)
      .select(col(idCol), col("dup_frac"))
    annotated.join(rep, Seq(idCol))
      .withColumn("drop_reason",
        when(col("quality") < minQuality, lit("low_quality"))
          .when(col("dup_frac") > maxDupFrac, lit("repetitive"))
          .when(col(idCol) =!= col("keep_id"), lit("duplicate"))
          .otherwise(lit(null).cast("string")))
      .withColumn("keep", col("drop_reason").isNull)
      .select(col(idCol), col("quality"), col("dup_frac"),
        col("keep_id"), col("keep"), col("drop_reason"))
  }

  /** Integer-exact TF-IDF retrieval: score every document against a bag of
    * query terms with Σ tf × idf_bits, where idf_bits =
    * `length(bin(N div df))` = floor(log2(N/df)) + 1 — the same bit-width
    * trick as [[lexicalSurprisal]], so the score is an exact BIGINT on
    * every engine (no libm, no last-ulp drift). BM25's saturation and
    * length terms are deliberately dropped: they need non-terminating
    * division, and the bit-width idf preserves the property that matters
    * for a corpus-curation ranker — rare terms outweigh common ones
    * exponentially (a df=N term scores 1 bit, a df=N/16 term 5).
    *
    * Scale shape: tokenisation is filtered to the query-term set BEFORE
    * any shuffle, so the non-matching bulk of the corpus never leaves the
    * map side; tf is one shuffle keyed (doc, term) bounded by matches; df
    * and the corpus count are term-cardinality / single-row aggregates
    * (broadcast — `ExplainAudit.bounded` proves the condition-less join
    * safe); the top-k is a TakeOrdered, k rows to the driver, no global
    * sort. */
  def tfIdfSearch(docs: DataFrame, queryTerms: Seq[String], k: Int,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty && k > 0, "need query terms and k > 0")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val occ = docs.select(col(idCol).as("doc_id"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .filter(col("term").isin(terms: _*))
    // tf feeds BOTH the scoring join and the df aggregation — checkpoint
    // the (tiny, post-filter) relation so the corpus is scanned once, not
    // twice (same materialised-index rationale as lexicalSurprisal)
    val tf = occ.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .cut(false)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val corpus = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(corpus))
      .withColumn("idf_bits",
        length(bin(expr("n_docs div df"))).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("idf_bits")).as("score"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** BM25 ranking over query terms, fully integer-exact. The standard
    * k1=1.2, b=0.75 parameters are rationals (6/5, 3/4), so the per-term
    * saturation factor
    * `tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`
    * reduces — after multiplying through by `20·L` with `avgdl = L/N`
    * (L = corpus token count, N = doc count) — to the integer ratio
    * `44·tf·L / (20·L·tf + 6·L + 18·dl·N)`.
    * Scored as `ppm(ratio) · idf_bits` per term with one integral divide
    * (DECIMAL(38,0) intermediates: at 100 TB, L ~ 10^13 would overflow the
    * 64-bit product), then summed per doc — both engines compute the same
    * digits. IDF is [[tfIdfSearch]]'s bit-length weight.
    *
    * Scale shape: the doc-length relation is one map pass; corpus stats
    * and per-term document frequencies are broadcast; the only shuffles
    * are the tf aggregation (query-term hits only) and the doc-key join
    * back to lengths. */
  /** Exact-phrase search: documents containing `phrase` as CONSECUTIVE
    * tokens, with the occurrence count — the position-aware retrieval
    * step bag-of-words scoring (tfIdf/bm25) cannot express ("table hash"
    * must not match "hash table").
    *
    * Scale shape: the positional relation is filtered to the phrase's
    * terms BEFORE any join, so join inputs are term-sparse slices of the
    * corpus, and each successive term binds by (doc, pos+i) key equi-join
    * — |phrase|−1 keyed joins, no window, no corpus² stage. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String], k: Int,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    require(phrase.nonEmpty && k > 0, "need phrase terms and k > 0")
    val words = phrase.map(_.toLowerCase)
    val pos = docs.select(col(idCol).as("doc_id"),
        posexplode(tokens(lower(col(textCol)))).as(Seq("pos", "tok")))
      .filter(col("tok").isin(words.distinct: _*))
      .cut(false)
    val base = pos.filter(col("tok") === words.head)
      .select(col("doc_id"), col("pos"))
    val matched = words.zipWithIndex.tail.foldLeft(base) {
      case (acc, (w, i)) =>
        acc.join(pos.filter(col("tok") === w)
            .select(col("doc_id").as("d2"), col("pos").as("p2")),
          col("doc_id") === col("d2") && col("p2") === col("pos") + i)
          .drop("d2", "p2")
    }
    matched.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("doc_id"))
      .limit(k)
  }

  def bm25Search(docs: DataFrame, queryTerms: Seq[String], k: Int,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty && k > 0, "need query terms and k > 0")
    val terms = queryTerms.map(_.toLowerCase).distinct
    // not persisted: the cheap (id, token-count) projection feeds exactly
    // two consumers, and a persist here would leak one cached
    // corpus-scale relation per invocation (nothing unpersists it)
    val lens = docs.select(col(idCol).as("doc_id"),
      tokenCount(col(textCol)).cast("long").as("dl"))
    val corpus = lens.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("corpus_len"))
    val occ = docs.select(col(idCol).as("doc_id"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .filter(col("term").isin(terms: _*))
    val tf = occ.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    bm25ScoreTopK(
      tf.join(broadcast(dfreq), "term")
        .crossJoin(broadcast(corpus))
        .join(lens, "doc_id"),
      k)
  }

  /** The SHARED integer BM25 scoring stage: input must carry
    * `doc_id, tf, df, n_docs, corpus_len, dl`; output is the
    * `(doc_id, score_ppm, n_terms_hit)` top-k. Both [[bm25Search]] and
    * the streaming index's query path end here, so the rational
    * reduction lives in exactly one place and "digit-identical" holds
    * by construction. */
  private[graft] def bm25ScoreTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .withColumn("idf_bits",
        length(bin(expr("n_docs div df"))).cast("long"))
      .withColumn("term_score_ppm", expr(
        """(cast(1000000 as decimal(38,0)) * idf_bits * 44 * tf * corpus_len)
           div
           (cast(20 as decimal(38,0)) * corpus_len * tf
             + cast(6 as decimal(38,0)) * corpus_len
             + cast(18 as decimal(38,0)) * dl * n_docs)"""))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_score_ppm")).as("score_ppm"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score_ppm").desc, col("doc_id").asc)
      .limit(k)

  /** Canonical URL for web-corpus dedup: the same page crawled as
    * `HTTPS://WWW.Site.com:443/a/?utm_source=feed#top` and
    * `https://site.com/a` must collapse to one key before URL-keyed
    * dedup. Normalisations, in order: fragment off; scheme/host/port
    * lowercased (path case PRESERVED — it is significant per RFC 3986);
    * `www.` and explicit default ports (:80/:443) dropped; tracking
    * params (`utm_*`, `gclid`, `fbclid`) stripped with separator repair;
    * trailing slash dropped. A pure codegen'd regexp chain — zero
    * shuffle, and every step has an exact DuckDB mirror (RE2-safe
    * patterns, no lookarounds; only the replacement backref syntax
    * differs, `$1` vs `\1`). */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // authority = scheme://host[:port], everything before the first
    // path slash; lowercased + www./default-port stripped
    val auth = regexp_extract(noFrag, "^[^/]*//[^/]*", 0)
    val authCanon = regexp_replace(
      regexp_replace(lower(auth), "^(https?://)www\\.", "$1"),
      ":(443|80)$", "")
    val rest = noFrag.substr(length(auth) + lit(1), length(noFrag))
    val noTrack = regexp_replace(rest,
      "(utm_[a-z]+|gclid|fbclid)=[^&#]*&?", "")
    // separator repair: dangling '?'/'&' when the last param was
    // stripped, '?&' when the first was
    val repaired = regexp_replace(
      regexp_replace(noTrack, "[?&]+$", ""), "\\?&", "?")
    concat(authCanon, regexp_replace(repaired, "/$", ""))
  }

  /** URL-keyed dedup: group by [[canonicalizeUrl]], keep the lowest id as
    * canonical. One projection + one shuffle on the canonical key — the
    * cheapest dedup pass a web pipeline runs, ahead of any content
    * hashing. */
  def urlDedup(docs: DataFrame, urlCol: String,
               idCol: String = "doc_id"): DataFrame =
    docs.withColumn("canonical_url", canonicalizeUrl(col(urlCol)))
      .groupBy(col("canonical_url"))
      .agg(min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_variants"))

  /** Intra-document line deduplication (C4's within-page repeated-line
    * removal — the boilerplate case [[graft.operators.Dedup.lineDedup]]'s
    * CORPUS-level frequency test can't catch: a navbar repeated ten times
    * inside ONE page): keep the FIRST occurrence of every line, preserve
    * order, report the volumes and an md5 of the rebuilt text.
    *
    * Scale shape: pure higher-order expressions over each row's own line
    * array — ZERO shuffle, embarrassingly parallel, per-row state bounded
    * by the doc's distinct-line count. The O(kept²) `array_contains` scan
    * is bounded by lines-per-doc, not corpus size. */
  def intraDocLineDedup(docs: DataFrame, linesCol: String = "lines",
                        idCol: String = "doc_id"): DataFrame = {
    val kept = aggregate(col(linesCol),
      array().cast("array<string>"),
      (acc, x) => when(array_contains(acc, x), acc)
        .otherwise(concat(acc, array(x))))
    docs
      .withColumn("kept", kept)
      .select(col(idCol),
        size(col(linesCol)).cast("long").as("n_lines"),
        size(col("kept")).cast("long").as("n_kept"),
        md5(array_join(col("kept"), "\n")).as("text_md5"))
  }

  /** Registered domain of a URL (host with scheme/userinfo/port/path and a
    * leading `www.` stripped, lowercased) — the grouping key of per-site
    * corpus policy: crawl budgets, blocklists, per-domain mixing caps.
    * Pure codegen'd regexp, zero shuffle, exact DuckDB mirror. */
  def urlDomain(url: Column): Column =
    regexp_replace(
      regexp_extract(lower(url), "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1),
      "^www\\.|:[0-9]+$", "")

  /** Per-domain corpus statistics: doc/token volume and id range per
    * registered domain — the table a crawl-curation review reads first
    * (which sites dominate, which to cap). One partial-agg shuffle on the
    * (bounded-cardinality) domain key. */
  def domainStats(docs: DataFrame, urlCol: String,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    docs
      .withColumn("domain", urlDomain(col(urlCol)))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol))).as("tok_sum"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"))

  /** Domain blocklist filter: drop every doc whose [[urlDomain]] appears
    * in the blocklist relation (column `domain`). The blocklist is
    * policy-sized (10³-10⁶ rows ≪ corpus), so it BROADCASTS and the
    * corpus streams map-only through the anti-join — never shuffled. */
  def domainBlocklistFilter(docs: DataFrame, blocklist: DataFrame,
                            urlCol: String): DataFrame =
    docs.withColumn("domain", urlDomain(col(urlCol)))
      .join(broadcast(blocklist.select(col("domain")).distinct()),
        Seq("domain"), "left_anti")

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling"): score each corpus doc
    * by how much more likely its tokens are under a TARGET distribution
    * (the domain you want more of) than under the corpus's own proposal
    * distribution — `log p_target(doc) − log p_proposal(doc)`, re-expressed
    * in exact integer bits: per token occurrence,
    * `bits_proposal − bits_target` where `bits_X = length(bin(N_X div
    * max(tf_X, 1)))` (the [[lmScore]] surprisal, unseen tokens floored at
    * the full `bin(N)` width). Positive total = target-like doc; rank
    * descending and keep the head to tilt a mixture toward the target
    * without a trained classifier.
    *
    * Scale shape: two unigram models (one partial-agg shuffle each — the
    * target is reference-sized, the proposal is the corpus's own vocab,
    * both Zipf-small); the corpus occurrence relation left-joins both on
    * the token key; masses are single-row broadcasts; one groupBy doc.
    * The corpus never joins itself. */
  def importanceWeights(corpus: DataFrame, target: DataFrame,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val occ = corpus.select(col(idCol).as("sid"),
      explode(tokens(col(textCol))).as("tok"))
    val prop = lmTrain(corpus, textCol).withColumnRenamed("tf", "tf_p")
    val targ = lmTrain(target, textCol).withColumnRenamed("tf", "tf_t")
    val massP = prop.agg(sum(col("tf_p")).as("n_prop"))
    val massT = targ.agg(sum(col("tf_t")).as("n_targ"))
    occ.join(prop, Seq("tok"), "left")
      .join(targ, Seq("tok"), "left")
      .crossJoin(broadcast(massP))
      .crossJoin(broadcast(massT))
      .withColumn("bits_p",
        length(bin(expr("n_prop div coalesce(tf_p, 1)"))).cast("long"))
      .withColumn("bits_t",
        length(bin(expr("n_targ div coalesce(tf_t, 1)"))).cast("long"))
      .groupBy(col("sid"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("bits_p") - col("bits_t")).as("weight_bits"),
        (sum(col("bits_p") - col("bits_t")).cast("double") /
          count(lit(1)).cast("double")).as("mean_weight_bits"))
      .withColumnRenamed("sid", idCol)
  }

  /** Trigram stupid-backoff surprisal (Brants et al., "Large Language
    * Models in Machine Translation"): score a held-out corpus against
    * trigram/bigram/unigram count tables from a reference corpus, backing
    * off a level whenever the higher-order count is absent. Integer-exact
    * throughout: a seen trigram costs `bits(starts3(ctx) div c3)` (the
    * proper conditional — `starts3(a b) = Σ_c count(a b c)`); an unseen
    * trigram backs off to the bigram conditional plus a 1-bit penalty
    * (backoff α = 0.5, so the penalty is EXACTLY one bit — no float α);
    * unseen bigrams back off again to the unigram floor plus 2 bits.
    * This is the full n-gram-LM quality-filter shape (CCNet uses KenLM
    * 5-grams; the ladder q95 → q109 → here climbs orders) with zero libm
    * and zero cross-engine drift.
    *
    * Scale shape: the reference builds three count tables (trigram,
    * bigram, unigram — each one partial-agg shuffle on a high-cardinality
    * key; the gram relations persist so the reference tokenises once per
    * order); the scored side explodes trigram occurrences ONCE and
    * left-joins the five lookups on their keys; the model mass is a
    * single-row broadcast; one groupBy doc. Scored corpus never joins
    * itself. */
  def backoffSurprisal(docs: DataFrame, reference: DataFrame,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    def gramRel(d: DataFrame, n: Int): DataFrame =
      d.select(explode(graft.functions.TextFunctions.wordShinglesAll(
        col(textCol), n)).as("gram"))
    // reference count tables
    val g3 = gramRel(reference, 3)
      .withColumn("ctx",
        concat_ws(" ", slice(split(col("gram"), " "), 1, 2)))
      .cut(false)
    val c3 = g3.groupBy(col("gram")).agg(count(lit(1)).as("c3"))
      .withColumnRenamed("gram", "g3")
    val c3s = g3.groupBy(col("ctx")).agg(count(lit(1)).as("c3s"))
    val g2 = gramRel(reference, 2)
      .withColumn("prev", split(col("gram"), " ").getItem(0))
      .cut(false)
    val c2 = g2.groupBy(col("gram")).agg(count(lit(1)).as("c2"))
      .withColumnRenamed("gram", "g2")
    val c2s = g2.groupBy(col("prev")).agg(count(lit(1)).as("c2s"))
    val c1 = lmTrain(reference, textCol)
    val mass = c1.agg(sum(col("tf")).as("n1"))
    // scored occurrences: one trigram explode; per-level keys are pure
    // string projections of the gram
    val parts = split(col("g3"), " ")
    val occ = docs.select(col(idCol).as("sid"),
        explode(graft.functions.TextFunctions.wordShinglesAll(
          col(textCol), 3)).as("g3"))
      .withColumn("ctx", concat_ws(" ", slice(parts, 1, 2)))
      .withColumn("g2", concat_ws(" ", slice(parts, 2, 2)))
      // partial grams (< 3 tokens) have no predicted token: guard the
      // element_at so ANSI mode can't throw (the oracle's CASE mirrors)
      .withColumn("tok", when(size(parts) >= 3, element_at(parts, 3)))
    val bits = when(col("c3").isNotNull,
        length(bin(expr("c3s div c3"))).cast("long"))
      .when(col("c2").isNotNull,
        lit(1L) + length(bin(expr("c2s div c2"))).cast("long"))
      .otherwise(
        lit(2L) + length(bin(expr("n1 div coalesce(tf, 1)"))).cast("long"))
    val level = when(col("c3").isNotNull, lit(3))
      .when(col("c2").isNotNull, lit(2)).otherwise(lit(1))
    occ.join(c3, Seq("g3"), "left")
      .join(c3s, Seq("ctx"), "left")
      .join(c2, Seq("g2"), "left")
      .join(c2s.withColumnRenamed("prev", "g2_prev"),
        col("g2_prev") === split(col("g2"), " ").getItem(0), "left")
      .join(c1, Seq("tok"), "left")
      .crossJoin(broadcast(mass))
      .withColumn("bits", bits)
      .withColumn("lvl", level)
      .groupBy(col("sid"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("lvl") === 3, 1L).otherwise(0L)).as("n_tri"),
        sum(when(col("lvl") === 2, 1L).otherwise(0L)).as("n_bi"),
        sum(when(col("lvl") === 1, 1L).otherwise(0L)).as("n_uni"),
        sum(col("bits")).as("total_bits"),
        (sum(col("bits")).cast("double") /
          count(lit(1)).cast("double")).as("mean_bits"))
      .withColumnRenamed("sid", idCol)
  }

  /** Bigram conditional surprisal: [[lexicalSurprisal]] scores a token by
    * its corpus frequency alone; this scores it IN CONTEXT — a token's
    * information is the bit-width of `starts(prev) / count(prev, cur)`,
    * the integer-exact proxy for -log2 p(cur | prev) under the corpus
    * bigram model (`starts(a) = Σ_b count(a,b)`, so the conditional is
    * proper and the ratio is always ≥ 1). Fluent text rides high-count
    * bigrams (low bits); scrambled or boilerplate-stitched text pays full
    * width — the next rung of the perplexity-filter ladder, still with no
    * libm and no cross-engine ulp drift.
    *
    * Scale shape: the exploded bigram relation feeds three consumers
    * (bigram counts, start counts, the join-back), so it is persisted and
    * the corpus is tokenised once; both count tables shuffle on
    * high-cardinality keys; the join-back is two equi-joins. Per-doc
    * aggregation is the final keyed shuffle. */
  def bigramSurprisal(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val grams = docs.select(col(idCol).as("sid"),
        explode(graft.functions.TextFunctions.wordShinglesAll(
          col(textCol), 2)).as("gram"))
      .withColumn("prev", split(col("gram"), " ").getItem(0))
      .cut(false)
    val cb = grams.groupBy(col("gram")).agg(count(lit(1)).as("cb"))
    val cu = grams.groupBy(col("prev")).agg(count(lit(1)).as("cu_starts"))
    grams.join(cb, "gram").join(cu, "prev")
      .withColumn("bits",
        length(bin(expr("cu_starts div cb"))).cast("long"))
      .groupBy(col("sid"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("bits")).as("total_bits"),
        (sum(col("bits")).cast("double") /
          count(lit(1)).cast("double")).as("mean_bits"))
      .withColumnRenamed("sid", idCol)
  }

  /** Train a unigram reference LM: the (token, tf) relation over a
    * REFERENCE corpus — persist it and score any other corpus against it
    * with [[lmScore]]. This is the operational split the in-corpus
    * surprisal queries don't cover: quality filtering à la CCNet trains
    * the model on a trusted corpus (Wikipedia) and scores the crawl, so
    * the crawl's own junk can't normalise itself. One partial-agg shuffle
    * on the token key; the model is Zipf-small relative to its corpus. */
  def lmTrain(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("tf"))

  /** Score documents against a stored reference LM: a token's surprisal
    * is the bit-width of `N / tf` (N = reference token mass) — the
    * integer-exact proxy for -log2 p(tok), properly oriented (rare = many
    * bits), with unseen tokens costing `length(bin(N))` bits via
    * `coalesce(tf, 1)` — exactly the 1/N floor a smoothed LM assigns, no
    * special case. Reports the OOV count separately: a high-OOV doc is a
    * domain mismatch, not necessarily junk.
    *
    * Scale shape: one equi-join occurrence⋈model on the token key (left,
    * to keep OOV), the reference mass is a single-row broadcast, one
    * groupBy doc — the scored corpus never joins itself. */
  def lmScore(docs: DataFrame, lm: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val occ = docs.select(col(idCol).as("sid"),
      explode(tokens(col(textCol))).as("tok"))
    val mass = lm.agg(sum(col("tf")).as("n_lm"))
    occ.join(lm, Seq("tok"), "left")
      .crossJoin(broadcast(mass))
      .withColumn("bits",
        length(bin(expr("n_lm div coalesce(tf, 1)"))).cast("long"))
      .groupBy(col("sid"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("tf").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(col("bits")).as("total_bits"),
        (sum(col("bits")).cast("double") /
          count(lit(1)).cast("double")).as("mean_bits"))
      .withColumnRenamed("sid", idCol)
  }

  /** Corpus data card: the per-(source, language) summary a dataset ships
    * with (Datasheets-for-Datasets style) — document and token volumes,
    * character mass, how much of the slice is textually unique, and the
    * id range for provenance. All metrics are exact integers, so the card
    * is bit-reproducible across engines and re-runs — a card that drifts
    * between builds is worse than no card.
    *
    * Scale shape: one groupBy on the (low-cardinality) slice key with
    * partial aggregation; the distinct-text count is exact
    * (count_distinct over the md5 key — a second partial-agg pass, not a
    * pair join). */
  def dataCard(docs: DataFrame,
               groupCols: Seq[String] = Seq("source", "lang"),
               idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    docs
      .withColumn("__ntok", tokenCount(col(textCol)))
      .withColumn("__ekey", exactKey(col(textCol)))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__ntok")).as("tok_sum"),
        sum(length(col(textCol))).as("chars_sum"),
        countDistinct(col("__ekey")).as("n_unique_texts"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"))

  /** Convenience: documents frame annotated with all text metrics. */
  def annotate(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_subwords", approxSubwordCount(t))
      .withColumn("stopword_ratio", stopwordRatio(t))
      .withColumn("punct_ratio", punctRatio(t))
      .withColumn("mean_token_len", meanTokenLength(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
