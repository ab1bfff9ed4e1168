package graft.operators

import graft.Cut.CutOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding merge training — the tokenizer-training step of a
  * training-data pipeline (Sennrich et al., "Neural Machine Translation of
  * Rare Words with Subword Units"). Each round counts adjacent symbol
  * pairs across the corpus vocabulary (weighted by word frequency), picks
  * the most frequent pair (ties to the lexicographically smallest), and
  * merges it everywhere; the learned merge list IS the tokenizer.
  *
  * Representation: a word's symbol sequence is one string with every
  * symbol wrapped in `` sentinels — `"abc"` → `␁a␁␁b␁␁c␁` — so a
  * merge is a plain non-overlapping left-to-right `replace(␁x␁␁y␁ → ␁xy␁)`
  * (each symbol carries its own delimiters, so consecutive matches never
  * share a separator) and both engines agree byte-for-byte. Whitespace
  * tokenization means symbols never contain spaces, so `"x y"` is a safe
  * pair key.
  *
  * Scale shape: the corpus is touched ONCE (the word-frequency aggregate —
  * one shuffle on the token key, Zipf-small output, persisted); every
  * round then runs on the vocabulary relation: a pair explode + partial-agg
  * shuffle on the pair key and a driver fetch of exactly ONE row (the
  * argmax — metadata-scale by construction). Merges apply map-only. Cost
  * per round is O(vocab), independent of corpus size — at 100 TB the
  * vocabulary is still millions of rows, not billions.
  *
  * Reference surface: the reference has no tokenizer trainer; this is part
  * of the LLM-pipeline extension (SURVEY §2 north star).
  */
object Bpe {

  val Delim = ""

  final case class Merge(merge_round: Int, lhs: String, rhs: String,
                         merged: String, pair_count: Long)

  /** Initial symbol representation: every character wrapped in sentinels. */
  private def initialRep(tok: Column): Column =
    regexp_replace(tok, "(.)", Delim + "$1" + Delim)

  /** Symbol array of a wrapped representation. */
  private def symbolsOf(rep: Column): Column =
    split(regexp_replace(rep, s"^$Delim|$Delim$$", ""), Delim + Delim)

  /** Adjacent symbol pairs (`"x y"`) of a wrapped representation. */
  private def pairsOf(rep: Column): Column = {
    val syms = symbolsOf(rep)
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => concat(element_at(syms, i), lit(" "), element_at(syms, i + 1))))
      .otherwise(array().cast("array<string>"))
  }

  /** Fold a merge list over a `rep` column (literal sentinel-wrapped
    * replaces, leftmost non-overlapping — the same semantics training
    * used). */
  private def applyMerges(df: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.foldLeft(df) { (v, m) =>
      v.withColumn("rep", regexp_replace(col("rep"),
        java.util.regex.Pattern.quote(
          Delim + m.lhs + Delim + Delim + m.rhs + Delim),
        java.util.regex.Matcher.quoteReplacement(
          Delim + m.merged + Delim)))
    }

  /** Vocabulary row count at or below which the merge loop runs on ONE
    * partition. The loop is 30+ sequential driver-synced rounds whose
    * per-round DATA is Zipf-small (the distinct-token vocabulary), so
    * round cost is dominated by scheduling: 32 explode tasks + a pair
    * shuffle per round to aggregate a relation one task handles in
    * milliseconds. Below this limit the vocabulary is materialised as a
    * single partition and each round is a one-task stage feeding an
    * AQE-coalesced single-reducer argmax — the same measured-cutoff
    * discipline as [[Graph.BroadcastNodeLimit]]. A 256k-type vocabulary
    * explodes to a few million pair rows, comfortably one task; a
    * 100 TB corpus with a larger vocabulary keeps the parallel path. */
  val SinglePartitionVocabLimit: Long = 262144L

  /** Train `rounds` merges over the whitespace-token vocabulary of
    * `docs(textCol)`. Tokens containing the sentinel are excluded (none
    * exist in text corpora; the filter makes the contract explicit).
    * Returns the merge list in order; stops early if the vocabulary runs
    * out of adjacent pairs. */
  def train(docs: DataFrame, rounds: Int,
            textCol: String = "text"): Seq[Merge] = {
    require(rounds > 0)
    val vocab = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .filter(!col("tok").contains(Delim))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .select(initialRep(col("tok")).as("rep"), col("n"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one count materialises the persist AND decides the loop layout
    val small = vocab.count() <= SinglePartitionVocabLimit
    // superseded checkpoints released per the two-resident rule
    // ([[Graph.iterate]]); the merge list is the output, so every
    // checkpoint is disposable once the loop ends
    var cut: Option[DataFrame] = None
    try {
      var rep: DataFrame =
        if (small) {
          val one = vocab.coalesce(1).cut(true)
          vocab.unpersist()
          cut = Some(one)
          one
        } else vocab
      val out = Seq.newBuilder[Merge]
      var r = 1
      var exhausted = false
      while (r <= rounds && !exhausted) {
        val top = rep
          .select(explode(pairsOf(col("rep"))).as("pair"), col("n"))
          .groupBy(col("pair")).agg(sum(col("n")).as("cnt"))
          .orderBy(col("cnt").desc, col("pair").asc)
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val pair = top(0).getString(0)
          val cnt = top(0).getLong(1)
          val Array(x, y) = pair.split(" ", 2)
          out += Merge(r, x, y, x + y, cnt)
          rep = rep.withColumn("rep",
            regexp_replace(col("rep"),
              java.util.regex.Pattern.quote(Delim + x + Delim + Delim + y + Delim),
              java.util.regex.Matcher.quoteReplacement(Delim + x + y + Delim)))
          // The replace chain grows one regexp per round; checkpoint every
          // 8 rounds so plan size (and re-execution from the corpus scan)
          // stays bounded when callers train real vocab sizes. The
          // vocabulary relation is Zipf-small, so the materialisation is
          // metadata-scale; the superseded snapshot is released at once.
          if (r % 8 == 0) {
            val next = rep.cut(true)
            cut.foreach(Graph.release)
            cut = Some(next)
            rep = next
          }
          r += 1
        }
      }
      out.result()
    } finally {
      cut.foreach(Graph.release)
      vocab.unpersist()
    }
  }

  /** [[train]] as a DataFrame (the q119 query surface). */
  def merges(spark: SparkSession, docs: DataFrame, rounds: Int,
             textCol: String = "text"): DataFrame = {
    import spark.implicits._
    train(docs, rounds, textCol)
      .toDF("merge_round", "lhs", "rhs", "merged", "pair_count")
  }

  /** Apply a learned merge list: per document, the whitespace token count
    * and the SUBWORD count after the merges — the number a token-budget
    * or sequence-packing pass actually needs once the tokenizer is real.
    *
    * Scale shape: merges apply to word TYPES, so the replace chain runs
    * map-only over the distinct-token vocabulary (Zipf-small), never the
    * corpus; the corpus-scale work is one distinct and one equi-join on
    * the token key plus a per-doc partial agg. */
  def encode(docs: DataFrame, merges: Seq[Merge],
             idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    val occ = docs.select(col(idCol),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .filter(!col("tok").contains(Delim))
    val vocab = applyMerges(
      occ.select(col("tok")).distinct()
        .withColumn("rep", initialRep(col("tok"))), merges)
      .withColumn("n_sym", size(symbolsOf(col("rep"))).cast("long"))
    occ.join(vocab.select(col("tok"), col("n_sym")), "tok")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("ws_tokens"),
        sum(col("n_sym")).as("subword_tokens"))
  }

  /** Per-token subword segmentation after `merges`: (tok, symbols).
    * Concatenating the symbols MUST reproduce the token — BPE merging
    * is lossless by construction (a merge only fuses adjacent symbols,
    * never rewrites characters); the round-trip spec pins this, which
    * is the detokenization guarantee a serving pipeline relies on. */
  def segmentation(docs: DataFrame, merges: Seq[Merge],
                   textCol: String = "text"): DataFrame = {
    val vocabToks = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .filter(!col("tok").contains(Delim)).distinct()
    applyMerges(vocabToks.withColumn("rep", initialRep(col("tok"))),
        merges)
      .select(col("tok"), symbolsOf(col("rep")).as("symbols"))
  }

  /** DuckDB oracle: the same `rounds` merges as an unrolled CTE chain —
    * per round, the pair count, the argmax (same `cnt DESC, pair ASC`
    * tie-break), and the sentinel-wrapped replace. Callers prepend the
    * tokenized-corpus CTE providing `tok` rows. */
  def oracleSql(rounds: Int): String = {
    val rows = (1 to rounds).map { r =>
      s"""SELECT $r AS merge_round, split_part(pair, ' ', 1) AS lhs,
           split_part(pair, ' ', 2) AS rhs,
           replace(pair, ' ', '') AS merged,
           CAST(cnt AS BIGINT) AS pair_count FROM t$r"""
    }.mkString(" UNION ALL ")
    s"${chainCtes(rounds)},\n merges AS ($rows)\n" +
      "SELECT * FROM merges ORDER BY merge_round"
  }

  /** The shared merge-chain CTEs (`c0..c$rounds`, `t1..t$rounds`) over a
    * caller-provided `toks(tok)` CTE. */
  private def chainCtes(rounds: Int): String = {
    val base =
      """c0 AS (SELECT tok,
           regexp_replace(tok, '(.)', chr(1)||'\1'||chr(1), 'g') AS rep,
           COUNT(*) AS n
         FROM toks WHERE NOT contains(tok, chr(1)) GROUP BY tok)"""
    val perRound = (1 to rounds).map { r =>
      s"""s$r AS (SELECT string_split(trim(rep, chr(1)), chr(1)||chr(1))
             AS sy, n, rep FROM c${r - 1}),
         p$r AS (SELECT sy[i] || ' ' || sy[i+1] AS pair, SUM(n) AS cnt
           FROM (SELECT sy, n, unnest(range(1, len(sy))) AS i FROM s$r)
           GROUP BY pair),
         t$r AS (SELECT pair, cnt FROM p$r ORDER BY cnt DESC, pair LIMIT 1),
         c$r AS (SELECT tok, replace(rep,
             chr(1) || split_part(pair, ' ', 1) || chr(1) ||
               chr(1) || split_part(pair, ' ', 2) || chr(1),
             chr(1) || split_part(pair, ' ', 1) ||
               split_part(pair, ' ', 2) || chr(1)) AS rep, n
           FROM c${r - 1}, t$r)"""
    }.mkString(",\n")
    s"$base,\n$perRound"
  }

  /** The vocabulary after the merges: every distinct symbol with its
    * weighted corpus occurrence count — the artifact a tokenizer ships
    * alongside the merge list (symbols absorbed entirely into larger
    * merges drop out; single chars that still occur stand-alone stay).
    * Same scale shape as [[train]]: vocabulary-relation work only. */
  def vocabulary(docs: DataFrame, merges: Seq[Merge],
                 textCol: String = "text"): DataFrame = {
    val wf = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .filter(!col("tok").contains(Delim))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .withColumn("rep", initialRep(col("tok")))
    applyMerges(wf, merges)
      .select(explode(symbolsOf(col("rep"))).as("symbol"), col("n"))
      .groupBy(col("symbol")).agg(sum(col("n")).as("occurrences"))
  }

  /** DuckDB oracle for [[vocabulary]]: the merge chain, then exploded
    * symbol counts. Caller prepends `toks(tok)`. */
  def vocabOracleSql(rounds: Int): String =
    s"""${chainCtes(rounds)},
       sy AS (SELECT unnest(string_split(trim(rep, chr(1)),
           chr(1)||chr(1))) AS symbol, n
         FROM c$rounds)
       SELECT symbol, CAST(SUM(n) AS BIGINT) AS occurrences
       FROM sy GROUP BY symbol ORDER BY symbol"""

  /** DuckDB oracle for [[encode]]: the same merge chain, then symbol
    * counts joined back to per-document token occurrences. Callers
    * prepend CTEs `toks(tok)` (the vocabulary source) and
    * `occ(doc_id, tok)` (per-doc occurrences, sentinel-filtered). */
  def encodeOracleSql(rounds: Int): String = {
    s"""${chainCtes(rounds)},
       enc AS (SELECT tok,
           len(string_split(trim(rep, chr(1)), chr(1)||chr(1))) AS n_sym
         FROM c$rounds)
       SELECT occ.doc_id, COUNT(*) AS ws_tokens,
         CAST(SUM(n_sym) AS BIGINT) AS subword_tokens
       FROM occ JOIN enc USING (tok)
       GROUP BY occ.doc_id ORDER BY occ.doc_id"""
  }

  /** DuckDB CTEs through `perdoc(doc_id, ws_tokens, subword_tokens)` —
    * the composable form of [[encodeOracleSql]] for queries that
    * aggregate the per-document encode further (fertility by source).
    * Same prepended-CTE contract as [[encodeOracleSql]]. */
  def encodePerDocCtes(rounds: Int): String =
    s"""${chainCtes(rounds)},
       enc AS (SELECT tok,
           len(string_split(trim(rep, chr(1)), chr(1)||chr(1))) AS n_sym
         FROM c$rounds),
       perdoc AS (SELECT occ.doc_id, COUNT(*) AS ws_tokens,
           CAST(SUM(n_sym) AS BIGINT) AS subword_tokens
         FROM occ JOIN enc USING (tok)
         GROUP BY occ.doc_id)"""
}
