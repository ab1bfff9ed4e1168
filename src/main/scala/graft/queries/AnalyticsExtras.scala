package graft.queries

import graft.Cut.CutOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Similarity}

/** Round-nine analytics wave: corpus-quality gating (Gopher-style rules),
  * Kneser–Ney continuation counts, a Markov stationary distribution by
  * integer power iteration, hard-negative mining for contrastive training,
  * Unicode script-mix profiling, SCD-2 run materialization, Heaps'-law
  * vocabulary growth, and histogram-exact latency quantiles.
  *
  * Every metric is integer (ppm / e2 fixed-point) or per-row-deterministic
  * double, so results are bit-identical between Spark and the DuckDB oracle
  * at any partitioning. Reference provenance: the quality-gate / curation
  * surface extends /root/reference's offload validation idea (cross-engine
  * agreement on derived relations) to corpus curation.
  */
object AnalyticsExtras {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** The (nation, day) revenue relation in exact cents — ONE
    * definition shared by the changepoint (q318) and runs-test (q323)
    * views so the pair (and their oracles, via
    * [[DailyNationRevenueSql]]) can never desynchronize on the cents
    * cast / date grain / join shape. */
  private def dailyNationRevenue(s: SparkSession,
      dir: String): DataFrame =
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nation_key"),
        to_date(col("o_orderdate")).as("d"))
      .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("decimal(38,0)")).as("rev"))

  /** [[dailyNationRevenue]]'s DuckDB face (rev as HUGEINT, named
    * `daily`). */
  private val DailyNationRevenueSql =
    """daily AS (SELECT CAST(c.c_nationkey AS BIGINT) AS nation_key,
         CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100)
           AS HUGEINT) AS rev
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       GROUP BY 1, 2)"""

  /** q219 gate thresholds (Gopher-style, Rae et al. 2021 shapes scaled to
    * the synthetic corpus): token count bounds, mean word length bounds
    * (e2 fixed point = chars×100), minimum alphabetic-token share (pct),
    * minimum distinct stopwords present. */
  val GopherMinTok = 10L
  val GopherMaxTok = 10000L
  val GopherMinMwlE2 = 300L
  val GopherMaxMwlE2 = 1000L
  val GopherMinAlphaPct = 80L
  val GopherStopwords: Seq[String] = Seq("the", "and", "of", "to", "in")
  val GopherMinStopwords = 2

  /** q220: report the top-N tokens by continuation count. */
  val ContinuationTopN = 20
  /** q221: fixed power-iteration rounds (bounded lineage, no convergence
    * loop — deterministic in both engines). */
  val MarkovRounds = 3
  /** q222: query vectors and per-query negative count. */
  val HardNegQueryIds: Seq[Long] = Seq(0L, 1L, 2L)
  val HardNegK = 3
  /** q223: a doc is "mixed-script" when non-ASCII chars exceed 5%. */
  val ScriptMixDen = 20L
  /** q224: value→tier cut points — single source of truth in
    * [[graft.operators.Scd]], shared with StreamingScd and the oracle. */
  val TierMid: Double = graft.operators.Scd.TierMid
  val TierHigh: Double = graft.operators.Scd.TierHigh
  /** q224: deterministic user slice keeping the output audit-sized. */
  val ScdUserMod = 50L
  /** q225: vocabulary-growth checkpoints (deciles of the doc_id range). */
  val HeapsBuckets = 10L

  private def toks(c: Column): Column = split(trim(c), "\\s+")

  /** q230: a sentence is "long" above this many characters. */
  val LongSentenceChars = 200L
  /** q227: winsorization percentile bounds (p10 / p90). */
  val WinsorLoPct = 10L
  val WinsorHiPct = 90L
  /** q228: sample stride and neighbor rank for distance calibration. */
  val KnnSampleMod = 29L
  val KnnRank = 5
  /** q229: path prefix length and report size. */
  val PathLen = 3
  val PathTopN = 15

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Gopher-style quality gate: every rule is computed per-row with
    // higher-order array functions (transform/filter/aggregate) — a
    // map-only pass with NO explode and no shuffle until the per-source
    // report aggregate. At 100 TB that is the difference between one
    // narrow scan and a token-level shuffle 100× the corpus.
    "q219_gopher_rules" -> { (s, dir) =>
      val d = t(s, dir, "documents")
        .withColumn("toks", toks(col("text")))
        .withColumn("n_tok", size(col("toks")).cast("long"))
        .withColumn("mwl_e2",
          expr("(aggregate(toks, 0L, (a, x) -> a + length(x)) * 100)" +
            " div n_tok"))
        .withColumn("n_alpha",
          expr("size(filter(toks, x -> x rlike '[A-Za-z]'))").cast("long"))
        .withColumn("n_stop",
          size(array_intersect(
            expr("transform(toks, x -> lower(x))"),
            array(GopherStopwords.map(lit): _*))).cast("long"))
        .withColumn("pass_len",
          (col("n_tok") >= GopherMinTok && col("n_tok") <= GopherMaxTok)
            .cast("long"))
        .withColumn("pass_mwl",
          (col("mwl_e2") >= GopherMinMwlE2 && col("mwl_e2") <= GopherMaxMwlE2)
            .cast("long"))
        .withColumn("pass_alpha",
          (col("n_alpha") * 100 >= col("n_tok") * GopherMinAlphaPct)
            .cast("long"))
        .withColumn("pass_stop",
          (col("n_stop") >= GopherMinStopwords).cast("long"))
        .withColumn("pass_all",
          (col("pass_len") * col("pass_mwl") * col("pass_alpha") *
            col("pass_stop")).cast("long"))
      d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("pass_len")).as("n_pass_len"),
          sum(col("pass_mwl")).as("n_pass_mwl"),
          sum(col("pass_alpha")).as("n_pass_alpha"),
          sum(col("pass_stop")).as("n_pass_stop"),
          sum(col("pass_all")).as("n_pass_all"))
        .withColumn("pass_ppm",
          expr("n_pass_all * 1000000 div n_docs"))
        .orderBy(col("source"))
    },

    // Kneser–Ney continuation counts: how many DISTINCT left contexts a
    // token appears after — the KN ingredient that separates "Francisco"
    // (frequent, one context) from genuinely productive tokens. The only
    // corpus-scale stage is the distinct over bigram TYPES; everything
    // after runs on the (Zipf-small) type relation.
    "q220_continuation_prob" -> { (s, dir) =>
      val bi = t(s, dir, "documents")
        .withColumn("toks", toks(col("text")))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> struct(toks[i - 1] AS prev, toks[i] AS nxt))")).as("b"))
        .select(col("b.prev").as("prev"), col("b.nxt").as("nxt"))
        .distinct()
      val total = bi.agg(count(lit(1)).as("n_bigram_types"))
      bi.groupBy(col("nxt").as("token"))
        .agg(count(lit(1)).as("n_contexts"))
        .crossJoin(broadcast(total))
        .select(col("token"), col("n_contexts"), col("n_bigram_types"),
          expr("n_contexts * 1000000 div n_bigram_types")
            .as("continuation_ppm"))
        .orderBy(col("n_contexts").desc, col("token"))
        .limit(ContinuationTopN)
    },

    // Markov stationary distribution: integer ppm power iteration over the
    // per-user event-type transition matrix (the q158 relation). The
    // matrix and the mass vector are both types-sized aggregates, so every
    // iteration is a broadcast-scale join — the corpus is read once to
    // count transitions. Mass at states with no outgoing edges drains
    // (documented absorbing loss; identical in both engines).
    "q221_markov_stationary" -> { (s, dir) =>
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"), col("event_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val tr = ev
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("a"), col("nxt").as("b"))
        .agg(count(lit(1)).as("cnt"))
      val outTot = tr.groupBy(col("a"))
        .agg(sum(col("cnt")).as("out_cnt"))
      val tppm = tr.join(outTot, "a")
        .select(col("a"), col("b"),
          expr("cnt * 1000000 div out_cnt").as("t_ppm"))
      val states = ev.select(col("event_type").as("state")).distinct()
      val n = states.count()
      var p = states.select(col("state"),
        lit(1000000L / n).as("p_ppm"))
      for (_ <- 1 to MarkovRounds) {
        p = p.join(tppm, col("state") === col("a"))
          .groupBy(col("b"))
          .agg(sum(col("p_ppm") * col("t_ppm")).as("mass"))
          .select(col("b").as("state"),
            expr("mass div 1000000").as("p_ppm"))
      }
      states.join(p, Seq("state"), "left")
        .select(col("state").as("event_type"),
          coalesce(col("p_ppm"), lit(0L)).as("stationary_ppm"))
        .orderBy(col("event_type"))
    },

    // Hard-negative mining: for each anchor vector, the top-k most-similar
    // embeddings with a DIFFERENT label — the contrastive-training batch
    // builder. Anchors broadcast (a handful of rows); at 100 TB the
    // candidate side swaps to the IVF shortlist (q110 precedent) with the
    // same scoring expression.
    "q222_hard_negatives" -> { (s, dir) =>
      val dim = PipelineQueries.Dim
      val withNorm = t(s, dir, "embeddings")
        .withColumn("nrm", Similarity.norm(col("embedding"), dim))
      val anchors = withNorm
        .filter(col("vec_id").isin(HardNegQueryIds: _*))
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("embedding").as("q_vec"), col("nrm").as("q_nrm"))
      val scored = withNorm.crossJoin(broadcast(anchors))
        .filter(col("label") =!= col("q_label"))
        .withColumn("score",
          Similarity.dot(col("embedding"), col("q_vec"), dim) /
            (col("nrm") * col("q_nrm")))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("score").desc, col("vec_id"))
      scored
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= HardNegK)
        .select(col("q_id"), col("rk"), col("vec_id"),
          col("label"), col("score"))
        .orderBy(col("q_id"), col("rk"))
    },

    // Unicode script-mix profile: per language, how much of the text is
    // non-ASCII / digits / uppercase, and how many docs exceed the 5%
    // non-ASCII line. Regex counts run per-row (codegen'd), one aggregate
    // per lang — the langid sanity check that catches mislabeled or
    // transliterated slices.
    "q223_script_mix" -> { (s, dir) =>
      val d = t(s, dir, "documents")
        .withColumn("n_chars_l", length(col("text")).cast("long"))
        .withColumn("n_nonascii",
          (length(col("text")) -
            length(regexp_replace(col("text"), "[\\x00-\\x7F]", "")))
            .cast("long"))
        .withColumn("n_digit",
          length(regexp_replace(col("text"), "[^0-9]", "")).cast("long"))
        .withColumn("n_upper",
          length(regexp_replace(col("text"), "[^A-Z]", "")).cast("long"))
        .withColumn("is_mixed",
          (col("n_nonascii") * ScriptMixDen > col("n_chars_l")).cast("long"))
      d.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("is_mixed")).as("n_mixed_docs"),
          sum(col("n_nonascii")).as("nonascii_chars"),
          sum(col("n_chars_l")).as("chars_sum"),
          sum(col("n_digit")).as("digit_sum"),
          sum(col("n_upper")).as("upper_sum"))
        .select(col("lang"), col("n_docs"), col("n_mixed_docs"),
          col("nonascii_chars"),
          expr("nonascii_chars * 1000000 div chars_sum")
            .as("nonascii_ppm"),
          expr("digit_sum * 1000000 div chars_sum").as("digit_ppm"),
          expr("upper_sum * 1000000 div chars_sum").as("upper_ppm"))
        .orderBy(col("lang"))
    },

    // SCD Type-2 materialization: collapse each user's event stream into
    // value-tier runs with [eff_from, eff_to) validity — the
    // change-data-capture → versioned-dimension build (delegates to
    // operators.Scd; streaming.StreamingScd maintains the same relation
    // incrementally). Windows are partitioned per user, bounded by one
    // key's history; a deterministic user_id slice keeps the dump
    // audit-sized without changing the plan shape.
    "q224_scd2_tiers" -> { (s, dir) =>
      val ev = t(s, dir, "events")
        .filter(col("user_id") % ScdUserMod === 0)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"),
          graft.operators.Scd.tierOf(col("value"), TierMid, TierHigh)
            .as("tier"))
      graft.operators.Scd.runs(ev)
        .select(col("user_id"), col("run_id"), col("tier"),
          col("eff_from_us"), col("eff_to_us"), col("n_events"),
          col("is_current"))
        .orderBy(col("user_id"), col("run_id"))
    },

    // Heaps'-law vocabulary growth: cumulative vocabulary size vs
    // cumulative token count at doc_id-decile checkpoints. One token pass
    // builds (first_doc per type, tf per decile); the cumulative curve is
    // a 10-row window over the decile AGGREGATE — no corpus re-scan per
    // checkpoint, no order-dependent running distinct.
    "q225_heaps_law" -> { (s, dir) =>
      val occ = t(s, dir, "documents")
        .select(col("doc_id"), explode(toks(col("text"))).as("token"))
      val maxId = occ.agg(max(col("doc_id")).as("max_id"))
      val bucketed = occ.crossJoin(broadcast(maxId))
        .withColumn("bucket",
          expr(s"(doc_id * $HeapsBuckets + max_id - 1) div max_id"))
      val tokensPerBucket = bucketed.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_tokens"))
      val firstBucket = bucketed.groupBy(col("token"))
        .agg(min(col("bucket")).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_new_types"))
      val w = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tokensPerBucket
        .join(firstBucket, Seq("bucket"), "full_outer")
        .select(col("bucket"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("n_new_types"), lit(0L)).as("n_new_types"))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .withColumn("vocab", sum(col("n_new_types")).over(w))
        .withColumn("heaps_ppm",
          expr("vocab * 1000000 div cum_tokens"))
        .select(col("bucket"), col("cum_tokens"), col("vocab"),
          col("heaps_ppm"))
        .orderBy(col("bucket"))
    },

    // Winsorized robust mean: per-source doc-length mean with the tails
    // clamped at histogram-exact p10/p90 — the outlier-resistant length
    // signal beside q208's MAD. BOTH the thresholds and the clamped mean
    // come from the (source × length) HISTOGRAM, so the corpus is scanned
    // once and every window runs over a relation bounded by value
    // cardinality, not row count.
    "q227_winsorized_lengths" -> { (s, dir) =>
      import graft.operators.Quantiles
      val d = t(s, dir, "documents").select(col("source"), col("n_chars"))
      // Thresholds come from the SHARED two-phase exact-quantile operator
      // (same rank semantics as the oracle's cumulative-histogram cut:
      // value at rank ceil(n·pct/100)); the winsorized mean then runs
      // over the (source × length) histogram.
      val cuts = Quantiles.exactGroupQuantiles(d, "source", "n_chars",
          Seq(WinsorLoPct.toInt, WinsorHiPct.toInt), bucketWidth = 64L)
        .groupBy(col("source"))
        .agg(max(when(col("pct") === WinsorLoPct, col("value")))
            .as("p10_chars"),
          max(when(col("pct") === WinsorHiPct, col("value")))
            .as("p90_chars"))
      val hist = d.groupBy(col("source"), col("n_chars"))
        .agg(count(lit(1)).as("cnt"))
      hist.join(cuts, "source")
        .withColumn("clamped",
          greatest(least(col("n_chars"), col("p90_chars")),
            col("p10_chars")))
        .groupBy(col("source"))
        .agg(sum(col("cnt")).as("n_docs"),
          max(col("p10_chars")).as("p10_chars"),
          max(col("p90_chars")).as("p90_chars"),
          expr("sum(n_chars * cnt) * 100 div sum(cnt)").as("mean_e2"),
          expr("sum(clamped * cnt) * 100 div sum(cnt)")
            .as("winsor_mean_e2"))
        .orderBy(col("source"))
    },

    // k-NN distance calibration: the 5th-neighbor cosine similarity for a
    // deterministic vector sample — the curve that picks a near-dup /
    // DBSCAN threshold empirically instead of by folklore. Sample
    // broadcasts; the rank filter lowers to WindowGroupLimit (map-side
    // per-anchor top-k); at corpus scale the candidate side swaps to the
    // IVF shortlist like q222.
    "q228_knn_calibration" -> { (s, dir) =>
      val dim = PipelineQueries.Dim
      val withNorm = t(s, dir, "embeddings")
        .withColumn("nrm", Similarity.norm(col("embedding"), dim))
      val sample = withNorm.filter(col("vec_id") % KnnSampleMod === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          col("nrm").as("q_nrm"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("score").desc, col("vec_id"))
      withNorm.crossJoin(broadcast(sample))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("score",
          Similarity.dot(col("embedding"), col("q_vec"), dim) /
            (col("nrm") * col("q_nrm")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === KnnRank)
        .select(col("q_id"),
          expr("CAST(FLOOR(score * 1000000) AS BIGINT)")
            .as(s"knn${KnnRank}_sim_e6"))
        .orderBy(col("q_id"))
    },

    // Contrastive pair mining (training-data op): for each sampled
    // anchor vector, its nearest SAME-label neighbor (positive) and its
    // nearest OTHER-label neighbor (hard negative) with the cosine
    // margin between them — the batch that trains a contrastive
    // embedding model. Same plan as q228's calibration: anchors are a
    // broadcast sample, the corpus scans once, the top-1-per-class
    // window is per (anchor, class-flag). At 100 TB the brute-force
    // scan swaps for the IVF probe (q86) — the mining logic on top is
    // unchanged.
    "q246_hard_negatives" -> { (s, dir) =>
      val dim = PipelineQueries.Dim
      val withNorm = t(s, dir, "embeddings")
        .withColumn("nrm", Similarity.norm(col("embedding"), dim))
      val sample = withNorm.filter(col("vec_id") % KnnSampleMod === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          col("nrm").as("q_nrm"), col("label").as("q_label"))
      val w = Window.partitionBy(col("q_id"), col("same"))
        .orderBy(col("score").desc, col("vec_id"))
      withNorm.crossJoin(broadcast(sample))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("score",
          Similarity.dot(col("embedding"), col("q_vec"), dim) /
            (col("nrm") * col("q_nrm")))
        .withColumn("same", col("label") === col("q_label"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .withColumn("sim_e6",
          expr("CAST(FLOOR(score * 1000000) AS BIGINT)"))
        .groupBy(col("q_id"))
        .agg(
          max(when(col("same"), col("vec_id"))).as("positive_id"),
          max(when(col("same"), col("sim_e6"))).as("pos_sim_e6"),
          max(when(!col("same"), col("vec_id"))).as("negative_id"),
          max(when(!col("same"), col("sim_e6"))).as("neg_sim_e6"))
        .select(col("q_id"), col("positive_id"), col("pos_sim_e6"),
          col("negative_id"), col("neg_sim_e6"),
          (col("pos_sim_e6") - col("neg_sim_e6")).as("margin_e6"))
        .orderBy(col("q_id"))
    },

    // Top session paths: the first-3-event-type signature per session,
    // ranked by frequency — the macroscopic "how do sessions start"
    // companion to q142's fixed funnel. Windows are per session (bounded);
    // the path aggregate is signature-cardinality-scale.
    "q229_session_paths" -> { (s, dir) =>
      val se = graft.streaming.Events
        .assignSessions(t(s, dir, "events"))
        .select(col("user_id"), col("session_idx"), col("event_type"),
          unix_micros(col("ts")).as("us"), col("event_id"))
      val w = Window.partitionBy(col("user_id"), col("session_idx"))
        .orderBy(col("us"), col("event_id"))
      val total = se.select(col("user_id"), col("session_idx")).distinct()
        .agg(count(lit(1)).as("n_sessions_total"))
      se.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= PathLen)
        .groupBy(col("user_id"), col("session_idx"))
        .agg(array_join(expr(
          "transform(array_sort(collect_list(struct(rk, event_type)))," +
            " x -> x.event_type)"), ">").as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_sessions"))
        .crossJoin(broadcast(total))
        .select(col("path"), col("n_sessions"),
          expr("n_sessions * 1000000 div n_sessions_total")
            .as("share_ppm"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(PathTopN)
    },

    // Sentence segmentation stats: per-source sentence counts, mean
    // sentence length and long-sentence share — the segmentation-level
    // quality profile beside the token-level q30/q219 gates. All per-row
    // higher-order array work (split on terminal punctuation, trim,
    // filter blanks) — no explode, one per-source aggregate.
    "q230_sentence_stats" -> { (s, dir) =>
      val d = t(s, dir, "documents")
        .withColumn("sent", split(col("text"), "[.!?]+"))
        .withColumn("n_sent",
          expr("size(filter(sent, x -> length(trim(x)) > 0))")
            .cast("long"))
        .withColumn("sent_chars",
          expr("aggregate(sent, 0L, (a, x) -> a + length(trim(x)))"))
        .withColumn("n_long",
          expr(s"size(filter(sent, x -> length(trim(x)) > " +
            s"$LongSentenceChars))").cast("long"))
      d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_sent")).as("n_sentences"),
          sum(col("sent_chars")).as("sent_chars"),
          sum(col("n_long")).as("n_long"))
        .select(col("source"), col("n_docs"), col("n_sentences"),
          expr("sent_chars * 100 div greatest(n_sentences, 1)")
            .as("mean_sent_chars_e2"),
          expr("n_long * 1000000 div greatest(n_sentences, 1)")
            .as("long_ppm"))
        .orderBy(col("source"))
    },

    // LSH pair budget: predicted candidate-pair volume per band from the
    // band-key histogram (Σ c·(c−1)/2) BEFORE running the self-join — the
    // pre-flight cost probe for dedup, the q167/advise-join idea applied
    // to the LSH self-join. Hot keys surface as max_key_docs; everything
    // is aggregate-scale.
    "q231_lsh_pair_budget" -> { (s, dir) =>
      val band = Dedup.bandRelation(
        PipelineQueries.CcArtifact.sigs(s, dir),
        PipelineQueries.NumHashes, PipelineQueries.Bands)
      band.groupBy(col("band"), col("band_key"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_keys"),
          expr("sum(c * (c - 1) div 2)").as("n_pairs"),
          max(col("c")).as("max_key_docs"))
        .select(col("band").cast("long").as("band"), col("n_keys"),
          col("n_pairs"), col("max_key_docs"))
        .orderBy(col("band"))
    },

    // Dedup-cluster purity: for every multi-doc near-dup cluster, how
    // concentrated its members are in one source (and how many langs it
    // spans) — the audit that distinguishes template boilerplate
    // (cross-source clusters) from same-source re-posts before choosing a
    // survivorship policy. Cluster relation from the standard LSH → CC
    // path; everything after is cluster-keyed aggregates.
    "q232_cluster_purity" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val clusters = PipelineQueries.CcArtifact.pairsAndCc(s, dir)._2
      val joined = clusters.join(docs.select(col("doc_id"), col("source"),
        col("lang")), "doc_id")
      val perSrc = joined.groupBy(col("cluster_id"), col("source"))
        .agg(count(lit(1)).as("c"))
      val agg = perSrc.groupBy(col("cluster_id"))
        .agg(sum(col("c")).as("n_docs"),
          count(lit(1)).as("n_sources"),
          max(col("c")).as("max_src_docs"))
      val langs = joined.groupBy(col("cluster_id"))
        .agg(countDistinct(col("lang")).as("n_langs"))
      agg.join(langs, "cluster_id")
        .filter(col("n_docs") >= 2)
        .select(col("cluster_id"), col("n_docs"), col("n_sources"),
          col("n_langs"),
          expr("max_src_docs * 1000000 div n_docs").as("purity_ppm"))
        .orderBy(col("cluster_id"))
    },

    // Semi-structured props extraction: parse the JSON `props` column and
    // profile the extracted field per event type — the metadata-parsing
    // step every event pipeline runs before anything else. get_json_object
    // is a per-row codegen'd path expression (no shuffle until the
    // aggregate); rows with missing/corrupt JSON surface as n_missing_k
    // instead of silently vanishing.
    "q233_props_extraction" -> { (s, dir) =>
      val d = t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      d.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("k").isNull.cast("long")).as("n_missing_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"),
          sum(col("k")).as("sum_k"),
          countDistinct(col("k")).as("n_distinct_k"))
        .orderBy(col("event_type"))
    },

    // Error share by hour of day: the ops-dashboard heat strip (UTC hour
    // is deterministic under the pinned session TZ). One keyed aggregate.
    "q234_error_rate_by_hour" -> { (s, dir) =>
      t(s, dir, "events")
        .select(hour(col("ts")).cast("long").as("hour_utc"),
          (col("event_type") === "error").cast("long").as("is_err"))
        .groupBy(col("hour_utc"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("is_err")).as("n_errors"))
        .select(col("hour_utc"), col("n_events"), col("n_errors"),
          expr("n_errors * 1000000 div n_events").as("error_ppm"))
        .orderBy(col("hour_utc"))
    },

    // Brand price spread: exact p25/p75/IQR of retail price (integer
    // cents) per brand — the shared no-sort quantile operator applied to
    // the catalog dimension.
    "q235_brand_price_spread" -> { (s, dir) =>
      import graft.operators.Quantiles
      val prices = t(s, dir, "part")
        .select(col("p_brand"),
          (col("p_retailprice").cast("decimal(12,2)") * 100)
            .cast("long").as("price_e2"))
      val cuts = Quantiles.exactGroupQuantiles(prices, "p_brand",
          "price_e2", Seq(25, 75), bucketWidth = 1000L)
        .groupBy(col("p_brand"))
        .agg(max(when(col("pct") === 25, col("value"))).as("p25_e2"),
          max(when(col("pct") === 75, col("value"))).as("p75_e2"))
      prices.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_parts"))
        .join(cuts, "p_brand")
        .select(col("p_brand"), col("n_parts"), col("p25_e2"),
          col("p75_e2"), (col("p75_e2") - col("p25_e2")).as("iqr_e2"))
        .orderBy(col("p_brand"))
    },

    // Integer-exact covariance: does discount move with quantity, per
    // return flag — the cross-moment statistic (n·Σxy − Σx·Σy) from ONE
    // aggregate pass, no mean-centering second pass, exact at any
    // partitioning. Fixed-point units: discount e4, quantity e2; the
    // cross terms (n·Σxy, Σx·Σy) are computed in DECIMAL(38,0) — Long
    // would wrap silently (non-ANSI) around sf1-2 — then the numerator
    // and the n²-normalized covariance are cast back to BIGINT (the
    // quotient always fits; the oracle's HUGEINT path is identical).
    "q236_discount_quantity_cov" -> { (s, dir) =>
      val dec = "decimal(38,0)"
      val d = t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          (col("l_discount").cast("decimal(12,4)") * 10000)
            .cast("long").as("x_e4"),
          (col("l_quantity").cast("decimal(12,2)") * 100)
            .cast("long").as("y_e2"))
      d.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("x_e4")).cast(dec).as("sx"),
          sum(col("y_e2")).cast(dec).as("sy"),
          sum(col("x_e4") * col("y_e2")).cast(dec).as("sxy"))
        .withColumn("num",
          col("n_lines").cast(dec) * col("sxy") - col("sx") * col("sy"))
        .select(col("l_returnflag"), col("n_lines"),
          col("num").cast("long").as("cov_num_e6"),
          // div (IntegralDivide) truncates toward zero over decimals and
          // returns BIGINT — same semantics as the oracle's HUGEINT `//`
          expr("num div (CAST(n_lines AS DECIMAL(38,0)) * n_lines)")
            .as("cov_e6"))
        .orderBy(col("l_returnflag"))
    },

    // Product stickiness (DAU/WAU): each active (user, day) contributes
    // to the 7 report days it covers — one bounded 7× expansion of the
    // DISTINCT activity relation, never a per-day re-scan; exact counts,
    // ppm ratio. Report days are the observed active days.
    "q237_stickiness" -> { (s, dir) =>
      val du = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
        .cut(true) // feeds DAU, the 7-day expansion, and the day filter
      val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      val wau = du
        .select(col("user_id"),
          explode(expr("sequence(day, date_add(day, 6))")).as("day"))
        .distinct()
        .groupBy(col("day")).agg(count(lit(1)).as("wau"))
      dau.join(wau, "day") // only observed days report
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("dau"), col("wau"),
          expr("dau * 1000000 div wau").as("stickiness_ppm"))
        .orderBy(col("day"))
    },

    // Column null/blank profile: the first-look data-quality audit —
    // per-column missing-value accounting for the documents table, one
    // conditional aggregate pass (the structural companion to q201/q202).
    "q238_null_profile" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      d.select(
          count(lit(1)).as("n_rows"),
          sum((col("text").isNull || length(trim(col("text"))) === 0)
            .cast("long")).as("blank_text"),
          sum(col("lang").isNull.cast("long")).as("null_lang"),
          sum(col("source").isNull.cast("long")).as("null_source"),
          sum((col("n_chars").isNull || col("n_chars") < 0).cast("long"))
            .as("bad_n_chars"),
          sum((length(col("text")) =!= col("n_chars")).cast("long"))
            .as("n_chars_mismatch"))
    },

    // Histogram-exact latency quantiles: order→ship delay p50/p90 per
    // order priority WITHOUT sorting the fact — delays are small integers,
    // so the exact quantile comes from a cumulative window over the
    // (priority × delay) histogram, which is bounded by construction. The
    // same shape gives exact quantiles over any low-cardinality measure at
    // any corpus size.
    "q226_ship_delay_quantiles" -> { (s, dir) =>
      import graft.operators.Quantiles
      val delays = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
            .as("delay_days"))
      // Delegates to the shared two-phase exact-quantile operator (rank
      // ceil(n·pct/100) — identical to the oracle's cumulative-histogram
      // cut) instead of a third hand-rolled histogram window.
      val cuts = Quantiles.exactGroupQuantiles(delays, "o_orderpriority",
          "delay_days", Seq(50, 90), bucketWidth = 8L)
        .groupBy(col("o_orderpriority"))
        .agg(max(when(col("pct") === 50, col("value"))).as("p50_days"),
          max(when(col("pct") === 90, col("value"))).as("p90_days"))
      delays.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"))
        .join(cuts, "o_orderpriority")
        .select(col("o_orderpriority"), col("n_items"), col("p50_days"),
          col("p90_days"))
        .orderBy(col("o_orderpriority"))
    },

    // Advisor-driven enrich: events joined to their per-type totals
    // through JoinAdvisor.adviseAndJoin — the pre-flight diagnostics
    // (sizes, CMS join bound, hottest-key share) pick the physical
    // strategy, HERE the salted sort-merge (event_type carries ~20% hot
    // keys and the broadcast fence is forced shut), and the salted
    // rewrite is row-identical to the plain join the oracle runs. The
    // executed-not-just-reported advisor is the point: at 100 TB the
    // probe is two map passes, the join it reshapes is hours.
    "q239_advised_type_enrich" -> { (s, dir) =>
      import graft.plan.JoinAdvisor
      val ev = t(s, dir, "events")
        .select(col("event_type"), col("user_id"))
      val dim = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("type_total"))
      val (joined, _) = JoinAdvisor.adviseAndJoin(ev, dim, "event_type",
        broadcastRowLimit = 0L)
      joined.groupBy(col("event_type"), col("type_total"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    },

    // Trailing 7-DAY revenue per channel via a RANGE window — the
    // value-based frame the ROWS windows elsewhere cannot express: on
    // a sparse daily series a missing day still ages out of the frame
    // (rowsBetween(-6,0) would silently cover more than a week). The
    // window runs per channel over the bounded (channel × day)
    // aggregate; n_days_7 exposes the actual frame width so the
    // sparse-vs-dense distinction is oracle-checked.
    "q262_trailing_range_window" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, dir, "orders")
        .groupBy(DsShapes.channelCol.as("channel"),
          to_date(col("o_orderdate")).as("day"))
        .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("decimal(38,0)")).cast("long").as("d_e2"),
          count(lit(1)).as("n_orders"))
        .withColumn("day_ord",
          datediff(col("day"), lit("1992-01-01").cast("date")))
      val w = Window.partitionBy(col("channel"))
        .orderBy(col("day_ord")).rangeBetween(-6, 0)
      daily
        .select(col("channel"), col("day"), col("d_e2"),
          col("n_orders"),
          sum(col("d_e2")).over(w).as("trailing7_e2"),
          count(lit(1)).over(w).as("n_days_7"))
        .orderBy(col("channel"), col("day"))
    },

    // Distinctive keywords per sampled doc: full-vocabulary tf × the
    // integer idf (bit-length of n_docs div df — exact, no logs), top 3
    // per doc. Document frequencies come from the WHOLE corpus (one
    // distinct + aggregate); the per-doc tf is computed only for the
    // deterministic doc_id%50 sample, so the scored relation is
    // sample-scale. No broadcast hint on the vocab join — at 100 TB the
    // term relation outgrows a broadcast; AQE picks the strategy.
    "q263_doc_keywords" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import graft.operators.TextAnalysis
      val docs = t(s, dir, "documents")
      val toks = docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
      val dfreq = toks.distinct()
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
      val tf = toks.filter(pmod(col("doc_id"), lit(50)) === 0)
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val corpus = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      tf.join(dfreq, "term")
        .crossJoin(broadcast(corpus))
        .withColumn("idf_bits",
          length(bin(expr("n_docs div df"))).cast("long"))
        .withColumn("score", col("tf") * col("idf_bits"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("term"), col("tf"),
          col("df"), col("score"))
        .orderBy(col("doc_id"), col("rk"))
    },

    // Price position within brand — the rank-function surface the
    // suite's row_number windows don't exercise: dense_rank (ties
    // share a rank with no gap), percent_rank and cume_dist (exact
    // integer ratios evaluated in float64 — both engines compute the
    // same (rank−1)/(n−1) and peers/n divisions), and
    // first/nth_value over the full-partition frame (the default
    // RANGE frame would make nth_value(2) NULL on the first row).
    // All windows run per brand over the part DIMENSION.
    "q265_price_position" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val parts = t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"),
          (col("p_retailprice").cast("decimal(12,2)") * 100)
            .cast("long").as("price_e2"))
      val byPrice = Window.partitionBy(col("p_brand"))
        .orderBy(col("price_e2"))
      val full = Window.partitionBy(col("p_brand"))
        .orderBy(col("price_e2"), col("p_partkey"))
        .rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
      parts
        .select(col("p_partkey"), col("p_brand"), col("price_e2"),
          dense_rank().over(byPrice).as("price_dense_rank"),
          percent_rank().over(byPrice).as("pct_rank"),
          cume_dist().over(byPrice).as("cume"),
          first_value(col("price_e2")).over(full).as("cheapest_e2"),
          nth_value(col("price_e2"), 2).over(full)
            .as("second_cheapest_e2"))
        .orderBy(col("p_partkey"))
    },

    // AR(1) persistence of the daily order series: the OLS slope of
    // count(t+1) on count(t) over consecutive-day pairs — positive =
    // momentum (busy days cluster), negative = mean reversion, the
    // lag-1 structure q191's overdispersion and q193's fences don't
    // see. The slope needs NO square root (unlike the correlation):
    // (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) from ONE aggregate over the
    // BOUNDED day relation (the q236 one-pass cross-moment
    // discipline); the lag pairing is a day-scale self-join on d+1.
    // The numerator is signed, so the ppm quotient is SIGN-DECOMPOSED
    // (Spark div truncates, DuckDB // floors — divide the absolute
    // value, re-apply the sign); DECIMAL(38,0) moments are the 100 TB
    // range headroom.
    "q305_daily_ar1" -> { (s, dir) =>
      val day = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("c"))
      val pairs = day.select(col("d"), col("c").as("x"))
        .join(day.select(date_sub(col("d"), 1).as("d"),
          col("c").as("y")), "d")
        .select(col("x").cast("decimal(38,0)").as("x"),
          col("y").cast("decimal(38,0)").as("y"))
      pairs
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
        .select(col("n").cast("long").as("n_pairs"),
          expr("CAST(n * sxy - sx * sy AS DECIMAL(38,0))").as("num"),
          expr("CAST(n * sxx - sx * sx AS DECIMAL(38,0))").as("den"))
        .select(col("n_pairs"),
          expr("""CASE WHEN num >= 0
                  THEN CAST(num * 1000000 div greatest(den, 1) AS BIGINT)
                  ELSE -CAST((-num) * 1000000 div greatest(den, 1)
                    AS BIGINT) END""").as("ar1_slope_ppm"))
    },

    // Pareto frontier of the part catalog (the SKYLINE operator,
    // Börzsönyi et al. 2001): parts where no other part is both
    // cheaper-or-equal AND larger-or-equal with at least one strict —
    // the price/size efficient set. The naive formulation is an O(n²)
    // dominance anti-join; over a sorted axis it collapses to ONE
    // running max — and the only unpartitioned window runs over the
    // PRICE-GRAIN AGGREGATE (one row per distinct price with its max
    // size — an Aggregate child, ExplainAudit-bounded; the r15 review
    // caught the row-relation variant failing that gate), never the
    // row relation: a part is on the frontier iff it carries its
    // price's max size AND that max strictly exceeds the running max
    // over strictly cheaper prices. A fact-scale skyline
    // grid-partitions one axis (boundaries from the no-sort quantile
    // operator), takes per-cell frontiers with the same kernel, and
    // merges the bounded per-cell candidates.
    "q308_part_skyline" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val parts = t(s, dir, "part")
        .select(col("p_partkey").cast("long").as("part_key"),
          col("p_brand"),
          (col("p_retailprice").cast("decimal(12,2)") * 100)
            .cast("long").as("price_e2"),
          col("p_size").cast("long").as("p_size"))
      val strictCheaper = Window.orderBy(col("price_e2"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val frontier = parts.groupBy(col("price_e2"))
        .agg(max(col("p_size")).as("same_max"))
        .withColumn("cheaper_max",
          max(col("same_max")).over(strictCheaper))
        .filter(col("cheaper_max").isNull ||
          col("cheaper_max") < col("same_max"))
        .select(col("price_e2"), col("same_max"))
      parts
        .join(broadcast(frontier), "price_e2")
        .filter(col("p_size") === col("same_max"))
        .select(col("part_key"), col("p_brand"), col("price_e2"),
          col("p_size"))
        .orderBy(col("price_e2"), col("part_key"))
    },

    // Inter-order gap quantiles per market segment: exact p50/p90 days
    // between a customer's consecutive orders — the repeat-purchase
    // cadence (q226's quantile discipline pointed at retention instead
    // of fulfilment). Gaps come from a per-CUSTOMER lag window
    // (partitioned, full (date, key) tie-break so the pairing is
    // deterministic); the quantiles ride the shared no-global-sort
    // two-phase selection ([[graft.operators.Quantiles]]) over the
    // (segment, gap) space — the only data-sized sort is within the
    // target buckets, never the order history.
    "q310_interorder_gap" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val byCust = Window.partitionBy(col("o_custkey"))
        .orderBy(col("d"), col("o_orderkey"))
      val gaps = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("d"))
        .withColumn("gap",
          datediff(col("d"), lag(col("d"), 1).over(byCust))
            .cast("long"))
        .filter(col("gap").isNotNull)
        .join(broadcast(t(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"), col("gap"))
        .cut(true) // quantile passes + the count both read it
      try {
        val q = graft.operators.Quantiles
          .exactGroupQuantiles(gaps, "segment", "gap", Seq(50, 90), 1L)
          .groupBy(col("segment"))
          .agg(max(when(col("pct") === 50, col("value")))
              .as("p50_gap_days"),
            max(when(col("pct") === 90, col("value")))
              .as("p90_gap_days"))
        val n = gaps.groupBy(col("segment"))
          .agg(count(lit(1)).as("n_gaps"))
        // audited BEFORE the eager cut (the cut collapses the plan to a
        // LogicalRDD leaf and would vacate the CI gate), cut BEFORE the
        // backing artifact is released below
        graft.tools.ExplainAudit.auditedCut(
          q.join(n, "segment").orderBy(col("segment")),
          "q310_interorder_gap")
      } finally graft.operators.Graph.release(gaps)
    },

    // Churn risk by segment: repeat customers (≥ 3 orders) whose OPEN
    // gap — days from their last order to the corpus max date — now
    // exceeds 2× their PERSONAL upper-median inter-order gap: "overdue
    // by their own rhythm", the per-customer-calibrated churn flag a
    // global-threshold recency cut (q309's R axis) can't express. Every
    // step is per-customer windows (gap lag, median-rank selection) or
    // keyed aggregates; the ×2 predicate stays in exact integer days
    // (no division anywhere until the final ppm share).
    "q312_churn_risk" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val o = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("d"))
      val byCust = Window.partitionBy(col("o_custkey"))
        .orderBy(col("d"), col("o_orderkey"))
      val gaps = o
        .withColumn("gap",
          datediff(col("d"), lag(col("d"), 1).over(byCust))
            .cast("long"))
        .filter(col("gap").isNotNull)
      // upper median (rk = n div 2 + 1): an element of the data, the
      // q290 median discipline — deterministic under the full tie-break
      val med = gaps
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("gap"), col("d"), col("o_orderkey"))))
        .withColumn("ng", count(lit(1)).over(
          Window.partitionBy(col("o_custkey"))))
        .filter(col("ng") >= 2 && col("rk") === expr("ng div 2 + 1"))
        .select(col("o_custkey"), col("gap").as("med_gap"))
      val last = o.groupBy(col("o_custkey"))
        .agg(max(col("d")).as("last_d"))
      med.join(last, "o_custkey")
        .crossJoin(broadcast(last.agg(max(col("last_d")).as("mxd"))))
        .select(col("o_custkey"), col("med_gap"),
          datediff(col("mxd"), col("last_d")).cast("long")
            .as("open_gap"))
        .join(broadcast(t(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_eligible"),
          sum(when(col("open_gap") > col("med_gap") * 2, 1L)
            .otherwise(0L)).as("n_at_risk"))
        .select(col("segment"), col("n_eligible"), col("n_at_risk"),
          expr("n_at_risk * 1000000 div n_eligible").as("at_risk_ppm"))
        .orderBy(col("segment"))
    },

    // Per-supplier fulfilment-delay trend: OLS slope of the QUARTERLY
    // mean order→ship delay over 1996–1997, top-25 fastest-worsening
    // suppliers — vendor management's "who is degrading", the
    // per-entity OLS companion to q290's global robust slope. Quarterly
    // means land in exact e6 fixed point (Σdelay·1e6 div n, DECIMAL
    // lift for the 100 TB numerator); the slope's cross-moments
    // aggregate ≤8 (t, y) points per supplier (the fact is touched
    // once, everything after is supplier×quarter-scale); the signed
    // numerator divides SIGN-DECOMPOSED (Spark div truncates, DuckDB //
    // floors). Suppliers with one active quarter carry no trend and are
    // excluded.
    "q314_supplier_delay_trend" -> { (s, dir) =>
      val d = t(s, dir, "lineitem")
        .join(t(s, dir, "orders")
            .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .filter(year(col("o_orderdate")).isin(1996, 1997))
        .select(col("l_suppkey"),
          ((year(col("o_orderdate")) - 1996) * 4 +
            quarter(col("o_orderdate"))).as("t"),
          datediff(to_date(col("l_shipdate")),
            to_date(col("o_orderdate"))).cast("long").as("delay"))
      // the synthetic data ships some lines BEFORE the order date, so a
      // quarter's delay sum can be negative — the mean divides
      // sign-decomposed like every signed quotient in this file
      val q = d.groupBy(col("l_suppkey"), col("t"))
        .agg(expr("""CASE WHEN SUM(delay) >= 0
                     THEN CAST(CAST(SUM(delay) AS DECIMAL(38,0)) * 1000000
                       div COUNT(1) AS BIGINT)
                     ELSE -CAST(CAST(-SUM(delay) AS DECIMAL(38,0)) * 1000000
                       div COUNT(1) AS BIGINT) END""").as("y"))
      q.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_quarters"),
          sum(col("t")).as("st"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum(expr("CAST(t AS DECIMAL(38,0)) * y")).as("sty"),
          sum(expr("t * t")).as("stt"))
        .filter(col("n_quarters") >= 2)
        .select(col("l_suppkey").cast("long").as("supp_key"),
          col("n_quarters"),
          expr("CAST(n_quarters * sty - st * sy AS DECIMAL(38,0))")
            .as("num"),
          expr("CAST(n_quarters * stt - st * st AS DECIMAL(38,0))")
            .as("den"))
        .select(col("supp_key"), col("n_quarters"),
          expr("""CASE WHEN num >= 0
                  THEN CAST(num div greatest(den, 1) AS BIGINT)
                  ELSE -CAST((-num) div greatest(den, 1) AS BIGINT)
                  END""").as("trend_e6_per_quarter"))
        .orderBy(col("trend_e6_per_quarter").desc, col("supp_key"))
        .limit(25)
    },

    // Spend inequality per market segment: the GINI COEFFICIENT in
    // exact ppm — the scalar the Lorenz curve (q216 family) plots.
    // Rank-block formula over the VALUE-GRAIN aggregate: customers
    // collapse to (segment, spend) rows with multiplicity c first, and
    // a tied block starting after m predecessors contributes
    // x·(c·m + c(c+1)/2) to Σ rank·x — exact because c(c+1) is always
    // even, and invariant to any intra-tie order. The only window runs
    // per segment over that Aggregate child (distinct spend values, not
    // customers); at 100 TB the same kernel holds — the value-grain
    // relation is the shuffle unit and no row-scale sort exists. Gini
    // numerator 2Σi·x − (n+1)Σx is ≥ 0 for an ascending ranking, so
    // one truncating division serves both engines.
    "q316_spend_gini" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val spend = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("decimal(38,0)")).cast("long").as("spend_e2"))
        .join(broadcast(t(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"), col("spend_e2"))
      val vals = spend.groupBy(col("segment"), col("spend_e2"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("segment")).orderBy(col("spend_e2"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      vals
        .withColumn("cum", sum(col("c")).over(w))
        .select(col("segment"),
          col("spend_e2").cast("decimal(38,0)").as("x"),
          col("c").cast("decimal(38,0)").as("c"),
          (col("cum") - col("c")).cast("decimal(38,0)").as("m"))
        .groupBy(col("segment"))
        .agg(sum(col("c")).as("n"),
          sum(expr("x * c")).as("sx"),
          sum(expr("x * (c * m + (c * (c + 1)) div 2)")).as("sixi"))
        .select(col("segment"),
          col("n").cast("long").as("n_customers"),
          col("sx").cast("long").as("spend_total_e2"),
          expr("""CAST((2 * sixi - (n + 1) * sx) * 1000000
                  div greatest(n * sx, 1) AS BIGINT)""").as("gini_ppm"))
        .orderBy(col("segment"))
    },

    // Mean-shift changepoint per nation (CUSUM / Page 1954): the day
    // k maximising |S_k − (k/n)·S_n| over the cumulative daily-revenue
    // series — where the revenue path deviates most from the uniform
    // pace, i.e. the single strongest level-shift candidate. Scaled to
    // integers as |n·S_k − k·S_n| (no division until the final ppm), so
    // the argmax is exact; ties resolve to the earliest day. Both
    // windows (cumulative sum, argmax pick) partition by nation over
    // the DAY-GRAIN aggregate — the fact is touched once, everything
    // after is day-scale.
    "q318_revenue_changepoint" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val daily = dailyNationRevenue(s, dir)
      val wCum = Window.partitionBy(col("nation_key")).orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wK = Window.partitionBy(col("nation_key")).orderBy(col("d"))
      val cum = daily
        .withColumn("sk", sum(col("rev")).over(wCum))
        .withColumn("k",
          row_number().over(wK).cast("decimal(38,0)"))
      val tot = daily.groupBy(col("nation_key"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("rev")).as("sn"))
      val wPick = Window.partitionBy(col("nation_key"))
        .orderBy(col("dev").desc, col("d"))
      cum.join(tot, "nation_key")
        .withColumn("dev",
          expr("""CASE WHEN n * sk - k * sn >= 0
                  THEN CAST(n * sk - k * sn AS DECIMAL(38,0))
                  ELSE CAST(-(n * sk - k * sn) AS DECIMAL(38,0))
                  END"""))
        .withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("nation_key"),
          col("n").cast("long").as("n_days"),
          col("d").as("change_day"),
          expr("CAST(dev * 1000000 div greatest(n * sn, 1) AS BIGINT)")
            .as("dev_ppm"))
        .orderBy(col("nation_key"))
    },

    // Wald–Wolfowitz RUNS TEST on daily revenue direction per nation:
    // sign-persistence the magnitude-blind complement to q305's AR(1)
    // slope (a series can have zero linear momentum yet strongly
    // streaky signs). Moves are consecutive-OBSERVED-day revenue
    // deltas with zero deltas dropped; R = number of sign runs;
    // E[R] = 1 + 2·n₊·n₋/n, and the reported ratio R/E[R] in exact
    // ppm is R·n·1e6 div (n + 2·n₊·n₋) — one truncating division of
    // non-negative integers. Below 1e6 = streaky (momentum), above =
    // alternating (mean reversion). Both lag windows partition by
    // nation over the DAY-GRAIN aggregate; the fact is touched once.
    "q323_runs_test" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val daily = dailyNationRevenue(s, dir)
      val wd = Window.partitionBy(col("nation_key")).orderBy(col("d"))
      val moves = daily
        .withColumn("prev", lag(col("rev"), 1).over(wd))
        .filter(col("prev").isNotNull && col("rev") =!= col("prev"))
        .withColumn("sgn",
          when(col("rev") > col("prev"), 1L).otherwise(-1L))
      moves
        .withColumn("psgn", lag(col("sgn"), 1).over(wd))
        .groupBy(col("nation_key"))
        .agg(count(lit(1)).as("n_moves"),
          sum(when(col("sgn") === 1L, 1L).otherwise(0L)).as("n_up"),
          sum(when(col("sgn") === -1L, 1L).otherwise(0L))
            .as("n_down"),
          sum(when(col("psgn").isNull || col("sgn") =!= col("psgn"),
            1L).otherwise(0L)).as("n_runs"))
        .select(col("nation_key"), col("n_moves"), col("n_up"),
          col("n_down"), col("n_runs"),
          expr("""CAST(CAST(n_runs AS DECIMAL(38,0)) * n_moves
                  * 1000000 div (n_moves + 2 * n_up * n_down)
                  AS BIGINT)""").as("vs_random_ppm"))
        .orderBy(col("nation_key"))
    },

    // Goodman–Kruskal GAMMA between price and size per brand: does
    // paying more buy a bigger part within the brand's catalog? Rank
    // correlation with NO square root (unlike Kendall's τ-b), so it
    // stays exactly rational: γ = (C − D)/(C + D) over concordant /
    // discordant part pairs, ties contributing to neither. NO pair
    // materialization (the r15 all-pairs self-join was quadratic in
    // the brand's catalog slice — the one plan the 100 TB bar
    // rejects). Two exact moves replace the pair space:
    //   1. C by a BANDED PREFIX WINDOW over the bounded size domain
    //      (p_size ∈ 1..50 by the TPC-H data contract; the band
    //      ceiling is still measured via a broadcast 1-row max, so
    //      out-of-contract sizes stay correct): fold parts to
    //      (price, size) CELLS, deposit each cell's mass into every
    //      band ≥ its size, and one window — partitioned by
    //      (brand, band), RANGE frame ending at price − 1, so price
    //      ties are structurally excluded — reads back, at each
    //      cell's zero-mass probe row at band = sz − 1, the count of
    //      earlier-priced strictly-smaller-size parts; every
    //      concordant pair is counted exactly once, at its
    //      higher-priced cell, weighted by the cell-mass product.
    //   2. D by the TIE-COUNT IDENTITY, all linear aggregates:
    //      C + D = C(n,2) − Tx − Ty + Txy (pairs differing in BOTH
    //      coordinates; Tx/Ty/Txy = pairs tied on price / size /
    //      both), so D needs only per-(brand,price), per-(brand,size)
    //      and per-cell tallies — never a second band space.
    // O(n·|size domain|) work, no join whose both sides descend from
    // part (the cell relation is checkpointed once and the 1-row
    // ceiling is a broadcast). Brands need ≥ 2 parts to emit (the
    // pair grain's natural support, matching the oracle's join). The
    // single signed division is SIGN-DECOMPOSED (Spark div truncates,
    // DuckDB // floors).
    "q329_price_size_gamma" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val cells = t(s, dir, "part")
        .select(col("p_brand"),
          (col("p_retailprice").cast("decimal(12,2)") * 100)
            .cast("long").as("price_e2"),
          col("p_size").cast("long").as("sz"))
        .groupBy(col("p_brand"), col("price_e2"), col("sz"))
        .agg(count(lit(1)).as("m"))
        .cut(true) // ceiling + ties + band space read it
      try {
        val withCeil = cells.crossJoin(broadcast(
          cells.agg(greatest(max(col("sz")), lit(50L)).as("dmax"))))
        // deposits carry mass; probes carry the cell payload (pm)
        // with zero mass, so they never perturb anyone else's prefix
        val deposits = withCeil.select(col("p_brand"),
          explode(expr("sequence(sz, dmax)")).as("band"),
          col("price_e2"), col("m").as("mb"),
          lit(null).cast("long").as("pm"))
        val probes = cells.select(col("p_brand"),
          (col("sz") - 1).as("band"), col("price_e2"), lit(0L).as("mb"),
          col("m").as("pm"))
        val wBand = Window.partitionBy(col("p_brand"), col("band"))
          .orderBy(col("price_e2"))
          .rangeBetween(Window.unboundedPreceding, -1)
        val conc = deposits.unionByName(probes)
          .withColumn("cum", coalesce(sum(col("mb")).over(wBand),
            lit(0L)))
          .filter(col("pm").isNotNull)
          .groupBy(col("p_brand"))
          .agg(sum(col("pm") * col("cum")).as("concordant"))
        // the tie tallies (C(k,2) per tied group, summed) + n per brand
        val txy = cells.groupBy(col("p_brand"))
          .agg(sum(col("m")).as("n"),
            sum(expr("m * (m - 1) div 2")).as("txy"))
        val tx = cells.groupBy(col("p_brand"), col("price_e2"))
          .agg(sum(col("m")).as("np")).groupBy(col("p_brand"))
          .agg(sum(expr("np * (np - 1) div 2")).as("tx"))
        val ty = cells.groupBy(col("p_brand"), col("sz"))
          .agg(sum(col("m")).as("ns")).groupBy(col("p_brand"))
          .agg(sum(expr("ns * (ns - 1) div 2")).as("ty"))
        val out = txy.join(broadcast(tx), "p_brand")
          .join(broadcast(ty), "p_brand")
          .join(broadcast(conc), "p_brand")
          .filter(col("n") >= 2)
          .select(col("p_brand"),
            expr("CAST(n * (n - 1) div 2 AS BIGINT)").as("n_pairs"),
            col("concordant"),
            (expr("n * (n - 1) div 2 - tx - ty + txy")
              - col("concordant")).as("discordant"))
          .select(col("p_brand"), col("n_pairs"), col("concordant"),
            col("discordant"),
            expr("""CASE WHEN concordant >= discordant
                    THEN CAST((concordant - discordant) * 1000000
                      div greatest(concordant + discordant, 1) AS BIGINT)
                    ELSE -CAST((discordant - concordant) * 1000000
                      div greatest(concordant + discordant, 1) AS BIGINT)
                    END""").as("gamma_ppm"))
          .orderBy(col("p_brand"))
        graft.tools.ExplainAudit
          .auditedCut(out, "q329_price_size_gamma")
      } finally graft.operators.Graph.release(cells)
    },

    // Price-ladder holes per brand: the largest adjacent gap in the
    // brand's sorted DISTINCT price ladder — where the assortment has
    // no offering (the merchandising complement to q308's frontier).
    // The lag window runs over the PRICE-GRAIN aggregate partitioned
    // by brand (distinct prices, never parts); the mean gap is exact
    // e2 via one truncating division of non-negative integers
    // ((max − min) div (n_prices − 1) — telescoping, so it needs no
    // per-gap sum); argmax ties to the LOWEST gap floor.
    "q331_price_ladder_gap" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val prices = t(s, dir, "part")
        .select(col("p_brand"),
          (col("p_retailprice").cast("decimal(12,2)") * 100)
            .cast("long").as("price_e2"))
        .distinct()
      val wb = Window.partitionBy(col("p_brand"))
        .orderBy(col("price_e2"))
      val gaps = prices
        .withColumn("prev", lag(col("price_e2"), 1).over(wb))
        .filter(col("prev").isNotNull)
        .select(col("p_brand"),
          (col("price_e2") - col("prev")).as("gap_e2"),
          col("prev").as("gap_floor_e2"))
      val wPick = Window.partitionBy(col("p_brand"))
        .orderBy(col("gap_e2").desc, col("gap_floor_e2"))
      gaps
        .withColumn("rk", row_number().over(wPick))
        .groupBy(col("p_brand"))
        .agg((count(lit(1)) + lit(1L)).as("n_prices"),
          max(when(col("rk") === 1, col("gap_e2"))).as("max_gap_e2"),
          max(when(col("rk") === 1, col("gap_floor_e2")))
            .as("max_gap_floor_e2"),
          min(col("gap_floor_e2")).as("min_price_e2"),
          max(col("gap_floor_e2") + col("gap_e2")).as("max_price_e2"))
        .select(col("p_brand"), col("n_prices"), col("max_gap_e2"),
          col("max_gap_floor_e2"),
          expr("""CAST((max_price_e2 - min_price_e2)
                  div greatest(n_prices - 1, 1) AS BIGINT)""")
            .as("mean_gap_e2"))
        .orderBy(col("p_brand"))
    },

    // PERSISTENCE PROFILE: the lag-k OLS slope of daily order counts
    // for k ∈ {1, 2, 3, 7} — q305's lag-1 momentum extended to a
    // profile (does persistence decay by day 3? is there a weekly
    // echo at lag 7?). One day-grain aggregate, one explode over the
    // 4-lag literal, ONE equi-join pairs each (day, lag) with its
    // offset twin, cross-moments per lag, SIGN-DECOMPOSED ppm — the
    // q305 integer-slope machinery pointed at four horizons at once.
    "q333_persistence_profile" -> { (s, dir) =>
      val day = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("c"))
      val lagged = day
        .select(col("d"), col("c").as("x"), explode(array(
          lit(1), lit(2), lit(3), lit(7))).as("lag"))
        .select(expr("date_add(d, lag)").as("d"), col("lag"),
          col("x"))
        .join(day.select(col("d"), col("c").as("y")), "d")
        .select(col("lag").cast("long").as("lag"),
          col("x").cast("decimal(38,0)").as("x"),
          col("y").cast("decimal(38,0)").as("y"))
      lagged.groupBy(col("lag"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
        .select(col("lag"), col("n").cast("long").as("n_pairs"),
          expr("CAST(n * sxy - sx * sy AS DECIMAL(38,0))").as("num"),
          expr("CAST(n * sxx - sx * sx AS DECIMAL(38,0))").as("den"))
        .select(col("lag"), col("n_pairs"),
          expr("""CASE WHEN num >= 0
                  THEN CAST(num * 1000000 div greatest(den, 1)
                    AS BIGINT)
                  ELSE -CAST((-num) * 1000000 div greatest(den, 1)
                    AS BIGINT) END""").as("slope_ppm"))
        .orderBy(col("lag"))
    },

    // PEAK CONCURRENT SESSIONS per day — the sweep-line interval
    // pattern: each 30-minute session becomes a (+1 at start, −1 at
    // end) endpoint pair, a per-day running sum walks the tagged
    // endpoints, and the day's max is its peak concurrency — the
    // capacity-planning number a per-bucket distinct count
    // structurally cannot produce (intervals overlap across bucket
    // edges). Endpoint ordering (ts, delta DESC, user, session) makes
    // touching intervals count as concurrent and the walk
    // deterministic in both engines; sessions are attributed to their
    // START day (the tail past midnight stays with the start —
    // documented grain, mirrored by the oracle). Windows are per-day
    // partitions; the output is the bounded day relation.
    "q369_peak_concurrency" -> { (s, dir) =>
      val sess = graft.streaming.Events
        .assignSessions(t(s, dir, "events"))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(min(col("ts")).as("st"), max(col("ts")).as("en"))
      val pts = sess.select(to_date(col("st")).as("day"),
          col("st").as("pt"), lit(1L).as("delta"),
          col("user_id"), col("session_idx"))
        .unionByName(sess.select(to_date(col("st")).as("day"),
          col("en").as("pt"), lit(-1L).as("delta"),
          col("user_id"), col("session_idx")))
      val w = Window.partitionBy(col("day"))
        .orderBy(col("pt"), col("delta").desc, col("user_id"),
          col("session_idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      pts.withColumn("run", sum(col("delta")).over(w))
        .groupBy(col("day"))
        .agg(max(col("run")).as("peak_concurrent"),
          sum(when(col("delta") === 1L, 1L).otherwise(0L))
            .as("n_sessions"))
        .orderBy(col("day"))
    },

    // CHURN HAZARD CURVE: the discrete survival view of user
    // lifetimes — for tenure week w, the share of still-active users
    // whose LAST event fell in that week of their life (hazard =
    // churned-at-w / at-risk-at-w) — the retention statistic q344's
    // calendar cohorts can't express (it is lifetime-aligned, not
    // calendar-aligned). One per-user min/max aggregate, then
    // everything lives on the bounded tenure-week relation; the
    // at-risk denominator is a reverse cumulative sum over it. The
    // corpus's right-censoring (users still active at data end) is
    // deliberately included — documented, and identical in the oracle.
    "q370_churn_hazard" -> { (s, dir) =>
      val u = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("d0"),
          max(to_date(col("ts"))).as("d1"))
        .select(expr("CAST(datediff(d1, d0) div 7 AS BIGINT)")
          .as("week"))
      val wRev = Window.partitionBy(lit(0)).orderBy(col("week").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      u.groupBy(col("week")).agg(count(lit(1)).as("n_churned"))
        .withColumn("n_at_risk", sum(col("n_churned")).over(wRev))
        .select(col("week"), col("n_at_risk"), col("n_churned"),
          expr("CAST(n_churned * 1000000 div n_at_risk AS BIGINT)")
            .as("hazard_ppm"))
        .orderBy(col("week"))
    },

    // TRANSITION DWELL-TIME MATRIX: median and p90 seconds spent
    // between ADJACENT event types within a session — q158's adjacency
    // counts with the TIMING dimension attached (a view>purchase
    // median of 3 s vs 300 s are different products). Gaps quantize to
    // whole seconds (≤ 1800 by the session gap bound), so the exact
    // quantiles ride the shared histogram operator over the bounded
    // (transition × second) grain — per-user windows and
    // vocabulary-scale aggregates only, no fact sort at any size.
    "q372_transition_dwell" -> { (s, dir) =>
      import graft.operators.Quantiles
      val w = Window.partitionBy(col("user_id"), col("session_idx"))
        .orderBy(col("ts"), col("event_id"))
      val gaps = graft.streaming.Events
        .assignSessions(t(s, dir, "events"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .withColumn("prev_us", lag(expr("unix_micros(ts)"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .select(concat(col("prev_type"), lit(">"), col("event_type"))
          .as("transition"),
          expr("(unix_micros(ts) - prev_us) div 1000000").as("gap_s"))
        .cut(true) // histogram quantiles + counts read it
      try {
        val cuts = Quantiles.exactGroupQuantiles(gaps, "transition",
            "gap_s", Seq(50, 90), bucketWidth = 8L)
          .groupBy(col("transition"))
          .agg(max(when(col("pct") === 50, col("value"))).as("p50_s"),
            max(when(col("pct") === 90, col("value"))).as("p90_s"))
        graft.tools.ExplainAudit.auditedCut(
          gaps.groupBy(col("transition"))
            .agg(count(lit(1)).as("n_transitions"))
            .join(cuts, "transition")
            .orderBy(col("transition")),
          "q372_transition_dwell")
      } finally graft.operators.Graph.release(gaps)
    },

    // JOIN FAN-OUT PROFILE: the 1:N cardinality distribution of the
    // star schema's two FK relationships (lines per order, orders per
    // customer) — exact p50/p90/max from the bounded (relationship ×
    // fanout) histogram, mean in e3 fixed-point. This is the statistic
    // the JoinAdvisor's hottest-key probe summarizes into one number,
    // materialized as the full planning relation: a p90 fan-out of 5
    // broadcast-joins fine at any scale, a max of 10⁶ is the skew that
    // needs salting.
    "q373_fanout_profile" -> { (s, dir) =>
      import graft.operators.Quantiles
      def fan(child: DataFrame, key: String, rel: String): DataFrame =
        child.groupBy(col(key)).agg(count(lit(1)).as("fanout"))
          .select(lit(rel).as("rel"), col("fanout"))
      val f = fan(t(s, dir, "lineitem"), "l_orderkey",
          "orders>lineitem")
        .unionByName(fan(t(s, dir, "orders"), "o_custkey",
          "customer>orders"))
        .cut(true) // quantiles + moments both read it
      try {
        val cuts = Quantiles.exactGroupQuantiles(f, "rel", "fanout",
            Seq(50, 90, 100), bucketWidth = 8L)
          .groupBy(col("rel"))
          .agg(max(when(col("pct") === 50, col("value"))).as("p50"),
            max(when(col("pct") === 90, col("value"))).as("p90"),
            max(when(col("pct") === 100, col("value")))
              .as("max_fanout"))
        graft.tools.ExplainAudit.auditedCut(
          f.groupBy(col("rel"))
            .agg(count(lit(1)).as("n_keys"),
              sum(col("fanout")).as("n_rows"),
              expr("CAST(sum(fanout) * 1000 div count(1) AS BIGINT)")
                .as("mean_fanout_e3"))
            .join(cuts, "rel")
            .orderBy(col("rel")),
          "q373_fanout_profile")
      } finally graft.operators.Graph.release(f)
    },

    // MARKOV NEXT-STEP PREDICTION ACCURACY: the majority-class
    // baseline of the session transition matrix — per current event
    // type, the argmax next type and how often it is right — the eval
    // companion to q221's stationary distribution and q229's paths
    // (a recommender or prefetcher beats THIS number or it ships
    // nothing). Both the prediction and its accuracy read off the
    // types² transition-count relation alone: one corpus pass, then
    // windows over a bounded grid.
    "q375_markov_prediction" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"), col("session_idx"))
        .orderBy(col("ts"), col("event_id"))
      val counts = graft.streaming.Events
        .assignSessions(t(s, dir, "events"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
      val wP = Window.partitionBy(col("prev_type"))
      counts
        .withColumn("rk", row_number().over(
          wP.orderBy(col("n").desc, col("next_type"))))
        .withColumn("total", sum(col("n")).over(wP))
        .filter(col("rk") === 1)
        .select(col("prev_type"), col("next_type").as("predicted"),
          col("total").as("n_transitions"), col("n").as("n_correct"),
          expr("CAST(n * 1000000 div total AS BIGINT)")
            .as("accuracy_ppm"))
        .orderBy(col("prev_type"))
    },

    // TRAILING-QUANTILE INTERVAL COVERAGE (conformal-style backtest):
    // each day's order count gets a predicted [p10, p90] interval from
    // the previous 28 OBSERVED order-days' counts (exact order
    // statistics at ranks ceil(m·p/100)); the query scores the
    // predictor per year — empirical coverage in ppm (a well-
    // calibrated 10/90 interval covers ≈ 800000) and mean interval
    // width. The window is INDEX-based (previous 28 order-days, not
    // calendar days) so sparse calendars never starve it — the first
    // 28 observed days are the only exclusion. The day relation is
    // bounded by the date domain, so both the day index (a global
    // window over the bounded aggregate) and the 28-way fan-out
    // equi-join stay metadata-scale — after ONE keyed aggregate over
    // orders, nothing touches fact scale.
    "q377_interval_coverage" -> { (s, dir) =>
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n_orders"))
      val idxd = daily.withColumn("idx",
        row_number().over(Window.orderBy(col("day"))))
      val hist = idxd
        .select(col("day"), col("idx"),
          explode(sequence(lit(1), lit(28))).as("off"))
        .withColumn("h_idx", col("idx") - col("off"))
        .join(idxd.select(col("idx").as("h_idx"),
          col("n_orders").as("h_n"), col("day").as("h_day")), "h_idx")
      val wDay = Window.partitionBy(col("day"))
      val ranked = hist
        .withColumn("rk", row_number().over(
          wDay.orderBy(col("h_n"), col("h_day"))))
        .withColumn("m", count(lit(1)).over(wDay))
      val bounds = ranked
        .groupBy(col("day"), col("m"))
        .agg(min(when(col("rk") === expr("(m * 10 + 99) div 100"),
          col("h_n"))).as("lo"),
          min(when(col("rk") === expr("(m * 90 + 99) div 100"),
            col("h_n"))).as("hi"))
        .filter(col("m") === 28)
      bounds.join(daily, "day")
        .select(year(col("day")).cast("long").as("year"),
          when(col("n_orders").between(col("lo"), col("hi")), 1L)
            .otherwise(0L).as("covered"),
          (col("hi") - col("lo")).as("width"))
        .groupBy(col("year"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("covered")).as("n_covered"),
          expr("CAST(sum(covered) * 1000000 div count(1) AS BIGINT)")
            .as("coverage_ppm"),
          expr("CAST(sum(width) * 1000 div count(1) AS BIGINT)")
            .as("mean_width_e3"))
        .orderBy(col("year"))
    },

    // SESSION-GAP SENSITIVITY: the sessionizer's one free parameter
    // swept over {10, 30, 60} minutes — session count, mean events
    // per session, and bounce share at each gap. Every downstream
    // session statistic (q24, q161, q206, q360...) inherits the 30-min
    // choice; this is the curve that justifies it (a cliff between two
    // gaps means the metric is an artifact of the knob, a plateau
    // means it is behavior). Three window passes over events — one per
    // gap, each the standard per-user sessionization — then
    // session-scale aggregates only.
    "q383_gap_sensitivity" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      Seq(10, 30, 60).map { g =>
        graft.streaming.Events.assignSessions(ev, gapMinutes = g)
          .groupBy(col("user_id"), col("session_idx"))
          .agg(count(lit(1)).as("n_events"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(col("n_events")).as("n_events_total"),
            sum(when(col("n_events") === 1, 1L).otherwise(0L))
              .as("n_bounce"))
          .select(lit(g.toLong).as("gap_min"), col("n_sessions"),
            expr("CAST(n_events_total * 1000 div n_sessions AS BIGINT)")
              .as("mean_events_e3"),
            expr("CAST(n_bounce * 1000000 div n_sessions AS BIGINT)")
              .as("bounce_ppm"))
      }.reduce(_ unionByName _).orderBy(col("gap_min"))
    },

    // ORDER BACKLOG SWEEP: work-in-progress over the order lifecycle —
    // +1 on the order day, −1 the day after the LAST line ships, then
    // a running sum over the bounded day relation = open orders per
    // day; reported per month as (peak, month-end) backlog — the
    // fulfillment-capacity read (q369's sweep-line idea pointed at the
    // order lifecycle instead of sessions). Two keyed aggregates over
    // the facts, then day-relation windows only; month-end picks the
    // backlog at the month's last delta day via max_by (deterministic:
    // days are unique after the delta aggregate).
    "q385_order_backlog" -> { (s, dir) =>
      val placed = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("delta"))
      val closed = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(max(to_date(col("l_shipdate"))).as("close_day"))
        .groupBy(expr("date_add(close_day, 1)").as("day"))
        .agg((count(lit(1)) * -1).as("delta"))
      val deltas = placed.unionByName(closed)
        .groupBy(col("day")).agg(sum(col("delta")).as("d"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deltas.withColumn("backlog", sum(col("d")).over(w))
        .groupBy((year(col("day")) * 100 + month(col("day")))
          .cast("long").as("ym"))
        .agg(max(col("backlog")).as("peak_backlog"),
          expr("max_by(backlog, day)").as("end_backlog"))
        .orderBy(col("ym"))
    },

    // BACKLOG AGING: q385's open-order count decomposed by AGE at each
    // month end — 0-30 / 31-90 / 90+ days since placement — the WIP
    // aging report that separates a healthy rolling backlog from
    // stuck orders quietly accumulating in the tail. The month-end
    // relation is a bounded aggregate (~80 rows), so the open-interval
    // range join is a broadcast of the month ends against the order
    // lifecycle relation: each order meets only the month ends it
    // spans (days-open / 30 of them) — bounded fan-out, fact touched
    // once to derive the lifecycle.
    "q391_backlog_aging" -> { (s, dir) =>
      val life = t(s, dir, "orders")
        .select(col("o_orderkey"),
          to_date(col("o_orderdate")).as("oday"))
        .join(t(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(max(to_date(col("l_shipdate"))).as("close_day")),
          col("o_orderkey") === col("l_orderkey"))
      val monthEnds = t(s, dir, "orders")
        .groupBy(last_day(to_date(col("o_orderdate"))).as("m"))
        .agg(count(lit(1)).as("ignore")).select(col("m"))
      life.join(broadcast(monthEnds),
          col("oday") <= col("m") && col("close_day") > col("m"))
        .withColumn("age", datediff(col("m"), col("oday")))
        .withColumn("band",
          when(col("age") <= 30, "a_0_30")
            .when(col("age") <= 90, "b_31_90")
            .otherwise("c_90_plus"))
        .groupBy((year(col("m")) * 100 + month(col("m")))
          .cast("long").as("ym"), col("band"))
        .agg(count(lit(1)).as("n_open"))
        .orderBy(col("ym"), col("band"))
    })

  private val stopList = GopherStopwords.map(sw => s"'$sw'").mkString(", ")

  def oracles: Map[String, String] = Map(

    "q219_gopher_rules" ->
      s"""WITH d AS (SELECT source,
           string_split_regex(trim(text), '\\s+') AS toks
         FROM documents),
         m AS (SELECT source, len(toks) AS n_tok,
             list_sum(list_transform(toks, x -> length(x))) * 100
               // len(toks) AS mwl_e2,
             len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
               AS n_alpha,
             len(list_intersect(list_transform(toks, x -> lower(x)),
               [$stopList])) AS n_stop
           FROM d),
         f AS (SELECT source,
             CASE WHEN n_tok >= $GopherMinTok AND n_tok <= $GopherMaxTok
               THEN 1 ELSE 0 END AS pass_len,
             CASE WHEN mwl_e2 >= $GopherMinMwlE2
               AND mwl_e2 <= $GopherMaxMwlE2 THEN 1 ELSE 0 END AS pass_mwl,
             CASE WHEN n_alpha * 100 >= n_tok * $GopherMinAlphaPct
               THEN 1 ELSE 0 END AS pass_alpha,
             CASE WHEN n_stop >= $GopherMinStopwords THEN 1 ELSE 0 END
               AS pass_stop
           FROM m)
         SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(pass_len) AS BIGINT) AS n_pass_len,
           CAST(SUM(pass_mwl) AS BIGINT) AS n_pass_mwl,
           CAST(SUM(pass_alpha) AS BIGINT) AS n_pass_alpha,
           CAST(SUM(pass_stop) AS BIGINT) AS n_pass_stop,
           CAST(SUM(pass_len * pass_mwl * pass_alpha * pass_stop) AS BIGINT)
             AS n_pass_all,
           CAST(SUM(pass_len * pass_mwl * pass_alpha * pass_stop)
             * 1000000 // COUNT(*) AS BIGINT) AS pass_ppm
         FROM f GROUP BY source ORDER BY source""",

    "q220_continuation_prob" ->
      s"""WITH d AS (SELECT string_split_regex(trim(text), '\\s+') AS toks
           FROM documents),
         bi AS (SELECT DISTINCT toks[i] AS prev, toks[i + 1] AS nxt
           FROM d, unnest(range(1, len(toks))) t(i)
           WHERE len(toks) >= 2),
         tot AS (SELECT COUNT(*) AS n_bigram_types FROM bi),
         c AS (SELECT nxt AS token, COUNT(*) AS n_contexts FROM bi
           GROUP BY 1)
         SELECT c.token, c.n_contexts, tot.n_bigram_types,
           CAST(c.n_contexts * 1000000 // tot.n_bigram_types AS BIGINT)
             AS continuation_ppm
         FROM c, tot
         ORDER BY c.n_contexts DESC, c.token LIMIT $ContinuationTopN""",

    "q221_markov_stationary" ->
      s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us,
           event_id FROM events),
         tr0 AS (SELECT event_type AS a,
             LEAD(event_type) OVER (PARTITION BY user_id
               ORDER BY us, event_id) AS b
           FROM ev),
         tr AS (SELECT a, b, COUNT(*) AS cnt FROM tr0
           WHERE b IS NOT NULL GROUP BY 1, 2),
         ot AS (SELECT a, SUM(cnt) AS out_cnt FROM tr GROUP BY 1),
         tp AS (SELECT tr.a, tr.b,
             CAST(tr.cnt * 1000000 // ot.out_cnt AS BIGINT) AS t_ppm
           FROM tr JOIN ot USING (a)),
         st AS (SELECT DISTINCT event_type AS state FROM ev),
         n AS (SELECT COUNT(*) AS n FROM st),
         p0 AS (SELECT st.state, CAST(1000000 // n.n AS BIGINT) AS p_ppm
           FROM st, n),
         p1 AS (SELECT tp.b AS state,
             CAST(SUM(p0.p_ppm * tp.t_ppm) // 1000000 AS BIGINT) AS p_ppm
           FROM p0 JOIN tp ON p0.state = tp.a GROUP BY 1),
         p2 AS (SELECT tp.b AS state,
             CAST(SUM(p1.p_ppm * tp.t_ppm) // 1000000 AS BIGINT) AS p_ppm
           FROM p1 JOIN tp ON p1.state = tp.a GROUP BY 1),
         p3 AS (SELECT tp.b AS state,
             CAST(SUM(p2.p_ppm * tp.t_ppm) // 1000000 AS BIGINT) AS p_ppm
           FROM p2 JOIN tp ON p2.state = tp.a GROUP BY 1)
         SELECT st.state AS event_type,
           CAST(COALESCE(p3.p_ppm, 0) AS BIGINT) AS stationary_ppm
         FROM st LEFT JOIN p3 USING (state)
         ORDER BY event_type""",

    "q222_hard_negatives" -> {
      val dim = PipelineQueries.Dim
      val ids = HardNegQueryIds.mkString(", ")
      s"""WITH nrm AS (SELECT vec_id, label, embedding,
           sqrt(${Similarity.Sql.normSq("embedding", dim)}) AS nrm
           FROM embeddings),
         q AS (SELECT vec_id AS q_id, label AS q_label,
             embedding AS q_vec, nrm AS q_nrm
           FROM nrm WHERE vec_id IN ($ids)),
         sc AS (SELECT q.q_id, e.vec_id, e.label,
             (${Similarity.Sql.dot("e.embedding", "q.q_vec", dim)})
               / (e.nrm * q.q_nrm) AS score
           FROM nrm e CROSS JOIN q
           WHERE e.label <> q.q_label),
         rk AS (SELECT q_id, vec_id, label, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY score DESC, vec_id) AS BIGINT) AS rk
           FROM sc)
         SELECT q_id, rk, vec_id, label, score FROM rk
         WHERE rk <= $HardNegK ORDER BY q_id, rk"""
    },

    "q223_script_mix" ->
      s"""WITH d AS (SELECT lang, length(text) AS n_chars_l,
           length(text) - length(regexp_replace(text,
             '[\\x00-\\x7F]', '', 'g')) AS n_nonascii,
           length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
           length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper
         FROM documents)
         SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_nonascii * $ScriptMixDen > n_chars_l
             THEN 1 ELSE 0 END) AS BIGINT) AS n_mixed_docs,
           CAST(SUM(n_nonascii) AS BIGINT) AS nonascii_chars,
           CAST(SUM(n_nonascii) * 1000000 // SUM(n_chars_l) AS BIGINT)
             AS nonascii_ppm,
           CAST(SUM(n_digit) * 1000000 // SUM(n_chars_l) AS BIGINT)
             AS digit_ppm,
           CAST(SUM(n_upper) * 1000000 // SUM(n_chars_l) AS BIGINT)
             AS upper_ppm
         FROM d GROUP BY lang ORDER BY lang""",

    "q224_scd2_tiers" ->
      s"""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us,
           CASE WHEN value < $TierMid THEN 'low'
             WHEN value < $TierHigh THEN 'mid' ELSE 'high' END AS tier
         FROM events WHERE user_id % $ScdUserMod = 0),
         chg AS (SELECT user_id, us, event_id, tier,
             CASE WHEN LAG(tier) OVER (PARTITION BY user_id
                 ORDER BY us, event_id) IS DISTINCT FROM tier
               THEN 1 ELSE 0 END AS chg
           FROM ev),
         runs0 AS (SELECT user_id, us, tier,
             CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS run_id
           FROM chg),
         runs AS (SELECT user_id, run_id, MIN(tier) AS tier,
             MIN(us) AS eff_from_us, COUNT(*) AS n_events
           FROM runs0 GROUP BY 1, 2)
         SELECT user_id, run_id, tier,
           CAST(eff_from_us AS BIGINT) AS eff_from_us,
           CAST(LEAD(eff_from_us) OVER (PARTITION BY user_id
             ORDER BY run_id) AS BIGINT) AS eff_to_us,
           CAST(n_events AS BIGINT) AS n_events,
           CASE WHEN LEAD(eff_from_us) OVER (PARTITION BY user_id
             ORDER BY run_id) IS NULL THEN 1 ELSE 0 END AS is_current
         FROM runs ORDER BY user_id, run_id""",

    "q225_heaps_law" ->
      s"""WITH occ AS (SELECT doc_id,
           unnest(string_split_regex(trim(text), '\\s+')) AS token
         FROM documents),
         mx AS (SELECT MAX(doc_id) AS max_id FROM occ),
         b AS (SELECT (occ.doc_id * $HeapsBuckets + mx.max_id - 1)
             // mx.max_id AS bucket, occ.token
           FROM occ, mx),
         tpb AS (SELECT bucket, COUNT(*) AS n_tokens FROM b GROUP BY 1),
         fb AS (SELECT bucket, COUNT(*) AS n_new_types FROM
           (SELECT token, MIN(bucket) AS bucket FROM b GROUP BY 1) x
           GROUP BY 1),
         j AS (SELECT COALESCE(tpb.bucket, fb.bucket) AS bucket,
             COALESCE(tpb.n_tokens, 0) AS n_tokens,
             COALESCE(fb.n_new_types, 0) AS n_new_types
           FROM tpb FULL OUTER JOIN fb ON tpb.bucket = fb.bucket),
         c AS (SELECT bucket,
             CAST(SUM(n_tokens) OVER (ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_tokens,
             CAST(SUM(n_new_types) OVER (ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS vocab
           FROM j)
         SELECT bucket, cum_tokens, vocab,
           CAST(vocab * 1000000 // cum_tokens AS BIGINT) AS heaps_ppm
         FROM c ORDER BY bucket""",

    "q237_stickiness" ->
      """WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
           FROM events),
         dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY 1),
         ex AS (SELECT DISTINCT du.user_id,
             du.day + CAST(x.i AS INTEGER) AS day
           FROM du, (SELECT unnest(range(0, 7)) AS i) x),
         wau AS (SELECT day, COUNT(*) AS wau FROM ex GROUP BY 1)
         SELECT strftime(dau.day, '%Y-%m-%d') AS day,
           dau.dau, wau.wau,
           CAST(dau.dau * 1000000 // wau.wau AS BIGINT)
             AS stickiness_ppm
         FROM dau JOIN wau USING (day) ORDER BY day""",

    "q238_null_profile" ->
      """SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN text IS NULL OR length(trim(text)) = 0
             THEN 1 ELSE 0 END) AS BIGINT) AS blank_text,
           CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_lang,
           CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS null_source,
           CAST(SUM(CASE WHEN n_chars IS NULL OR n_chars < 0
             THEN 1 ELSE 0 END) AS BIGINT) AS bad_n_chars,
           CAST(SUM(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END)
             AS BIGINT) AS n_chars_mismatch
         FROM documents""",

    "q236_discount_quantity_cov" ->
      """WITH d AS (SELECT l_returnflag,
           CAST(CAST(l_discount AS DECIMAL(12,4)) * 10000 AS BIGINT)
             AS x_e4,
           CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS y_e2
         FROM lineitem),
         a AS (SELECT l_returnflag, COUNT(*) AS n,
             SUM(x_e4) AS sx, SUM(y_e2) AS sy,
             SUM(CAST(x_e4 AS HUGEINT) * y_e2) AS sxy
           FROM d GROUP BY 1)
         SELECT l_returnflag, n AS n_lines,
           CAST(n * sxy - sx * sy AS BIGINT) AS cov_num_e6,
           CAST((n * sxy - sx * sy) // (CAST(n AS HUGEINT) * n)
             AS BIGINT) AS cov_e6
         FROM a ORDER BY l_returnflag""",

    "q233_props_extraction" ->
      """WITH d AS (SELECT event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
         SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_missing_k,
           MIN(k) AS min_k, MAX(k) AS max_k,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           COUNT(DISTINCT k) AS n_distinct_k
         FROM d GROUP BY event_type ORDER BY event_type""",

    "q234_error_rate_by_hour" ->
      """WITH d AS (SELECT CAST(hour(ts) AS BIGINT) AS hour_utc,
           CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
         FROM events)
         SELECT hour_utc, COUNT(*) AS n_events,
           CAST(SUM(is_err) AS BIGINT) AS n_errors,
           CAST(SUM(is_err) * 1000000 // COUNT(*) AS BIGINT)
             AS error_ppm
         FROM d GROUP BY hour_utc ORDER BY hour_utc""",

    "q235_brand_price_spread" ->
      """WITH p AS (SELECT p_brand,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS price_e2
         FROM part),
         t AS (SELECT p_brand, COUNT(*) AS n FROM p GROUP BY 1),
         r AS (SELECT p_brand, price_e2,
             ROW_NUMBER() OVER (PARTITION BY p_brand
               ORDER BY price_e2) AS rn
           FROM p),
         cuts AS (SELECT t.p_brand,
             MAX(CASE WHEN r.rn = (t.n * 25 + 99) // 100
               THEN r.price_e2 END) AS p25_e2,
             MAX(CASE WHEN r.rn = (t.n * 75 + 99) // 100
               THEN r.price_e2 END) AS p75_e2
           FROM t JOIN r USING (p_brand) GROUP BY 1)
         SELECT t.p_brand, t.n AS n_parts, c.p25_e2, c.p75_e2,
           c.p75_e2 - c.p25_e2 AS iqr_e2
         FROM t JOIN cuts c USING (p_brand) ORDER BY t.p_brand""",

    "q232_cluster_purity" ->
      s"""WITH RECURSIVE ${PipelineQueries.shingleCte},
         ${PipelineQueries.minhashSigSql},
         ${PipelineQueries.bandSql},
         pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           FROM bands a JOIN bands b USING (band, band_key)
           WHERE a.doc_id < b.doc_id),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         reach(id, label) AS (
           SELECT DISTINCT src, src FROM edges
           UNION
           SELECT e.dst, r.label FROM reach r JOIN edges e
             ON e.src = r.id),
         clusters AS (SELECT id AS doc_id, MIN(label) AS cluster_id
           FROM reach GROUP BY id),
         j AS (SELECT c.cluster_id, d.source, d.lang
           FROM clusters c JOIN documents d USING (doc_id)),
         ps AS (SELECT cluster_id, source, COUNT(*) AS c FROM j
           GROUP BY 1, 2),
         a AS (SELECT cluster_id, SUM(c) AS n_docs,
             COUNT(*) AS n_sources, MAX(c) AS max_src_docs
           FROM ps GROUP BY 1),
         lg AS (SELECT cluster_id, COUNT(DISTINCT lang) AS n_langs
           FROM j GROUP BY 1)
         SELECT a.cluster_id, CAST(a.n_docs AS BIGINT) AS n_docs,
           a.n_sources, lg.n_langs,
           CAST(a.max_src_docs * 1000000 // a.n_docs AS BIGINT)
             AS purity_ppm
         FROM a JOIN lg USING (cluster_id)
         WHERE a.n_docs >= 2 ORDER BY a.cluster_id""",

    "q230_sentence_stats" ->
      s"""WITH d AS (SELECT source,
           string_split_regex(text, '[.!?]+') AS sent FROM documents),
         m AS (SELECT source,
             len(list_filter(sent, x -> length(trim(x)) > 0)) AS n_sent,
             list_sum(list_transform(sent, x -> length(trim(x))))
               AS sent_chars,
             len(list_filter(sent,
               x -> length(trim(x)) > $LongSentenceChars)) AS n_long
           FROM d)
         SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_sent) AS BIGINT) AS n_sentences,
           CAST(SUM(sent_chars) * 100
             // GREATEST(SUM(n_sent), 1) AS BIGINT) AS mean_sent_chars_e2,
           CAST(SUM(n_long) * 1000000
             // GREATEST(SUM(n_sent), 1) AS BIGINT) AS long_ppm
         FROM m GROUP BY source ORDER BY source""",

    "q231_lsh_pair_budget" ->
      s"""WITH ${PipelineQueries.shingleCte},
         ${PipelineQueries.minhashSigSql},
         ${PipelineQueries.bandSql},
         kc AS (SELECT band, band_key, COUNT(*) AS c FROM bands
           GROUP BY 1, 2)
         SELECT CAST(band AS BIGINT) AS band, COUNT(*) AS n_keys,
           CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS n_pairs,
           CAST(MAX(c) AS BIGINT) AS max_key_docs
         FROM kc GROUP BY band ORDER BY band""",

    "q227_winsorized_lengths" ->
      s"""WITH h AS (SELECT source, n_chars, COUNT(*) AS cnt
           FROM documents GROUP BY 1, 2),
         t AS (SELECT source, SUM(cnt) AS n FROM h GROUP BY 1),
         c AS (SELECT h.source, h.n_chars, h.cnt, t.n,
             SUM(h.cnt) OVER (PARTITION BY h.source ORDER BY h.n_chars
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM h JOIN t USING (source)),
         cuts AS (SELECT source, MAX(n) AS n_docs,
             MIN(CASE WHEN cum * 100 >= n * $WinsorLoPct
               THEN n_chars END) AS p10_chars,
             MIN(CASE WHEN cum * 100 >= n * $WinsorHiPct
               THEN n_chars END) AS p90_chars
           FROM c GROUP BY 1)
         SELECT h.source, CAST(MAX(cuts.n_docs) AS BIGINT) AS n_docs,
           MAX(cuts.p10_chars) AS p10_chars,
           MAX(cuts.p90_chars) AS p90_chars,
           CAST(SUM(h.n_chars * h.cnt) * 100 // SUM(h.cnt) AS BIGINT)
             AS mean_e2,
           CAST(SUM(GREATEST(LEAST(h.n_chars, cuts.p90_chars),
               cuts.p10_chars) * h.cnt) * 100 // SUM(h.cnt) AS BIGINT)
             AS winsor_mean_e2
         FROM h JOIN cuts USING (source)
         GROUP BY h.source ORDER BY h.source""",

    "q228_knn_calibration" -> {
      val dim = PipelineQueries.Dim
      s"""WITH nrm AS (SELECT vec_id, embedding,
           sqrt(${Similarity.Sql.normSq("embedding", dim)}) AS nrm
           FROM embeddings),
         q AS (SELECT vec_id AS q_id, embedding AS q_vec, nrm AS q_nrm
           FROM nrm WHERE vec_id % $KnnSampleMod = 0),
         sc AS (SELECT q.q_id, e.vec_id,
             (${Similarity.Sql.dot("e.embedding", "q.q_vec", dim)})
               / (e.nrm * q.q_nrm) AS score
           FROM nrm e CROSS JOIN q
           WHERE e.vec_id <> q.q_id),
         rk AS (SELECT q_id, score,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY score DESC, vec_id) AS rk
           FROM sc)
         SELECT q_id, CAST(FLOOR(score * 1000000) AS BIGINT)
           AS knn${KnnRank}_sim_e6
         FROM rk WHERE rk = $KnnRank ORDER BY q_id"""
    },

    "q246_hard_negatives" -> {
      val dim = PipelineQueries.Dim
      s"""WITH nrm AS (SELECT vec_id, embedding, label,
           sqrt(${Similarity.Sql.normSq("embedding", dim)}) AS nrm
           FROM embeddings),
         q AS (SELECT vec_id AS q_id, embedding AS q_vec, nrm AS q_nrm,
             label AS q_label
           FROM nrm WHERE vec_id % $KnnSampleMod = 0),
         sc AS (SELECT q.q_id, e.vec_id, e.label = q.q_label AS same,
             (${Similarity.Sql.dot("e.embedding", "q.q_vec", dim)})
               / (e.nrm * q.q_nrm) AS score
           FROM nrm e CROSS JOIN q
           WHERE e.vec_id <> q.q_id),
         rk AS (SELECT q_id, vec_id, same,
             CAST(FLOOR(score * 1000000) AS BIGINT) AS sim_e6,
             ROW_NUMBER() OVER (PARTITION BY q_id, same
               ORDER BY score DESC, vec_id) AS rk
           FROM sc)
         SELECT q_id,
           MAX(CASE WHEN same THEN vec_id END) AS positive_id,
           MAX(CASE WHEN same THEN sim_e6 END) AS pos_sim_e6,
           MAX(CASE WHEN NOT same THEN vec_id END) AS negative_id,
           MAX(CASE WHEN NOT same THEN sim_e6 END) AS neg_sim_e6,
           MAX(CASE WHEN same THEN sim_e6 END) -
             MAX(CASE WHEN NOT same THEN sim_e6 END) AS margin_e6
         FROM rk WHERE rk = 1 GROUP BY q_id ORDER BY q_id"""
    },

    "q229_session_paths" ->
      s"""WITH ${SessionSql.cte("se",
          Seq("event_type", "epoch_us(ts) AS us", "event_id"))},
         rk AS (SELECT user_id, session_idx, event_type, us, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id, session_idx
               ORDER BY us, event_id) AS rk
           FROM se),
         paths AS (SELECT user_id, session_idx,
             string_agg(event_type, '>' ORDER BY rk) AS path
           FROM rk WHERE rk <= $PathLen GROUP BY 1, 2),
         tot AS (SELECT COUNT(*) AS n_sessions_total FROM
           (SELECT DISTINCT user_id, session_idx FROM se) x),
         pc AS (SELECT path, COUNT(*) AS n_sessions FROM paths
           GROUP BY 1)
         SELECT pc.path, pc.n_sessions,
           CAST(pc.n_sessions * 1000000 // tot.n_sessions_total AS BIGINT)
             AS share_ppm
         FROM pc, tot
         ORDER BY pc.n_sessions DESC, pc.path LIMIT $PathTopN""",

    "q226_ship_delay_quantiles" ->
      """WITH d AS (SELECT o.o_orderpriority,
           date_diff('day', CAST(o.o_orderdate AS DATE),
             CAST(l.l_shipdate AS DATE)) AS delay_days
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         h AS (SELECT o_orderpriority, delay_days, COUNT(*) AS cnt
           FROM d GROUP BY 1, 2),
         tt AS (SELECT o_orderpriority, SUM(cnt) AS total FROM h
           GROUP BY 1),
         c AS (SELECT h.o_orderpriority, h.delay_days, tt.total,
             SUM(h.cnt) OVER (PARTITION BY h.o_orderpriority
               ORDER BY h.delay_days
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM h JOIN tt USING (o_orderpriority))
         SELECT o_orderpriority, CAST(MAX(total) AS BIGINT) AS n_items,
           CAST(MIN(CASE WHEN cum * 2 >= total THEN delay_days END)
             AS BIGINT) AS p50_days,
           CAST(MIN(CASE WHEN cum * 10 >= total * 9 THEN delay_days END)
             AS BIGINT) AS p90_days
         FROM c GROUP BY 1 ORDER BY o_orderpriority""",

    "q239_advised_type_enrich" ->
      """WITH dim AS (SELECT event_type, COUNT(*) AS type_total
           FROM events GROUP BY 1)
         SELECT e.event_type, dim.type_total,
           COUNT(*) AS n_events,
           COUNT(DISTINCT e.user_id) AS n_users
         FROM events e JOIN dim USING (event_type)
         GROUP BY 1, 2 ORDER BY e.event_type""",

    "q262_trailing_range_window" ->
      s"""WITH daily AS (SELECT
           ${DsShapes.ChannelSql} AS channel,
           CAST(o_orderdate AS DATE) AS day,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100)
             AS BIGINT) AS d_e2,
           COUNT(*) AS n_orders
         FROM orders GROUP BY 1, 2)
         SELECT channel, day, d_e2, n_orders,
           CAST(SUM(d_e2) OVER w AS BIGINT) AS trailing7_e2,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_days_7
         FROM daily
         WINDOW w AS (PARTITION BY channel
           ORDER BY date_diff('day', DATE '1992-01-01', day)
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
         ORDER BY channel, day""",

    "q263_doc_keywords" ->
      """WITH toks AS (SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
         FROM documents),
         dfreq AS (SELECT term, COUNT(*) AS df FROM
           (SELECT DISTINCT doc_id, term FROM toks) GROUP BY 1),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
           WHERE doc_id % 50 = 0 GROUP BY 1, 2),
         n AS (SELECT COUNT(*) AS n_docs FROM documents),
         scored AS (SELECT t.doc_id, t.term, t.tf, d.df,
             t.tf * length(bin(n.n_docs // d.df)) AS score
           FROM tf t JOIN dfreq d USING (term) CROSS JOIN n),
         rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
             ORDER BY score DESC, term) AS rk FROM scored)
         SELECT doc_id, CAST(rk AS INT) AS rk, term, tf,
           CAST(df AS BIGINT) AS df, CAST(score AS BIGINT) AS score
         FROM rk WHERE rk <= 3 ORDER BY doc_id, rk""",

    "q265_price_position" ->
      """WITH p AS (SELECT p_partkey, p_brand,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS price_e2
         FROM part)
         SELECT p_partkey, p_brand, price_e2,
           CAST(DENSE_RANK() OVER br AS INT) AS price_dense_rank,
           PERCENT_RANK() OVER br AS pct_rank,
           CUME_DIST() OVER br AS cume,
           FIRST_VALUE(price_e2) OVER fr AS cheapest_e2,
           NTH_VALUE(price_e2, 2) OVER fr AS second_cheapest_e2
         FROM p
         WINDOW br AS (PARTITION BY p_brand ORDER BY price_e2),
           fr AS (PARTITION BY p_brand
             ORDER BY price_e2, p_partkey
             ROWS BETWEEN UNBOUNDED PRECEDING
               AND UNBOUNDED FOLLOWING)
         ORDER BY p_partkey""",

    "q305_daily_ar1" ->
      """WITH day AS (SELECT CAST(o_orderdate AS DATE) AS d,
           COUNT(*) AS c
         FROM orders GROUP BY 1),
         pr AS (SELECT CAST(a.c AS HUGEINT) AS x,
             CAST(b.c AS HUGEINT) AS y
           FROM day a JOIN day b ON b.d = a.d + INTERVAL 1 DAY),
         m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx,
             SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
           FROM pr),
         nd AS (SELECT CAST(n AS BIGINT) AS n_pairs,
             n * sxy - sx * sy AS num, n * sxx - sx * sx AS den
           FROM m)
         SELECT n_pairs,
           CASE WHEN num >= 0
             THEN CAST(num * 1000000 // GREATEST(den, 1) AS BIGINT)
             ELSE -CAST((-num) * 1000000 // GREATEST(den, 1) AS BIGINT)
           END AS ar1_slope_ppm
         FROM nd""",

    "q308_part_skyline" ->
      """WITH p AS (SELECT CAST(p_partkey AS BIGINT) AS part_key,
           p_brand,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS price_e2,
           CAST(p_size AS BIGINT) AS p_size
         FROM part),
         m AS (SELECT *,
             MAX(p_size) OVER (ORDER BY price_e2
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS cheaper_max,
             MAX(p_size) OVER (PARTITION BY price_e2) AS same_max
           FROM p)
         SELECT part_key, p_brand, price_e2, p_size
         FROM m
         WHERE (cheaper_max IS NULL OR cheaper_max < p_size)
           AND same_max = p_size
         ORDER BY price_e2, part_key""",

    "q310_interorder_gap" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS d
         FROM orders),
         g AS (SELECT o_custkey,
             CAST(date_diff('day',
               LAG(d) OVER (PARTITION BY o_custkey
                 ORDER BY d, o_orderkey), d) AS BIGINT) AS gap
           FROM o),
         gs AS (SELECT c.c_mktsegment AS segment, g.gap
           FROM g JOIN customer c ON g.o_custkey = c.c_custkey
           WHERE g.gap IS NOT NULL),
         n AS (SELECT segment, COUNT(*) AS n_gaps FROM gs GROUP BY 1),
         tr AS (SELECT segment, p, (n.n_gaps * p + 99) // 100 AS t
           FROM n, (VALUES (50), (90)) v(p)),
         r AS (SELECT segment, gap, ROW_NUMBER() OVER
             (PARTITION BY segment ORDER BY gap) AS rn
           FROM gs),
         q AS (SELECT tr.segment, tr.p, r.gap
           FROM tr JOIN r ON r.segment = tr.segment AND r.rn = tr.t)
         SELECT q.segment,
           CAST(MAX(CASE WHEN p = 50 THEN gap END) AS BIGINT)
             AS p50_gap_days,
           CAST(MAX(CASE WHEN p = 90 THEN gap END) AS BIGINT)
             AS p90_gap_days,
           CAST(MAX(n.n_gaps) AS BIGINT) AS n_gaps
         FROM q JOIN n USING (segment)
         GROUP BY 1 ORDER BY segment""",

    "q312_churn_risk" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS d
         FROM orders),
         g AS (SELECT o_custkey, d, o_orderkey,
             CAST(date_diff('day', LAG(d) OVER (PARTITION BY o_custkey
               ORDER BY d, o_orderkey), d) AS BIGINT) AS gap
           FROM o),
         g2 AS (SELECT * FROM g WHERE gap IS NOT NULL),
         med AS (SELECT o_custkey, gap AS med_gap FROM (
             SELECT o_custkey, gap,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                 ORDER BY gap, d, o_orderkey) AS rk,
               COUNT(*) OVER (PARTITION BY o_custkey) AS ng
             FROM g2)
           WHERE ng >= 2 AND rk = ng // 2 + 1),
         lst AS (SELECT o_custkey, MAX(d) AS last_d FROM o GROUP BY 1),
         mx AS (SELECT MAX(last_d) AS mxd FROM lst),
         r AS (SELECT m.o_custkey, m.med_gap,
             CAST(date_diff('day', l.last_d, mx.mxd) AS BIGINT)
               AS open_gap
           FROM med m JOIN lst l USING (o_custkey), mx),
         j AS (SELECT c.c_mktsegment AS segment, r.med_gap, r.open_gap
           FROM r JOIN customer c ON r.o_custkey = c.c_custkey)
         SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_eligible,
           CAST(SUM(CASE WHEN open_gap > 2 * med_gap THEN 1 ELSE 0 END)
             AS BIGINT) AS n_at_risk,
           CAST(SUM(CASE WHEN open_gap > 2 * med_gap THEN 1 ELSE 0 END)
             * 1000000 // COUNT(*) AS BIGINT) AS at_risk_ppm
         FROM j GROUP BY 1 ORDER BY segment""",

    "q314_supplier_delay_trend" ->
      """WITH d AS (SELECT l_suppkey,
           (year(o_orderdate) - 1996) * 4 + quarter(o_orderdate) AS t,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
             CAST(l_shipdate AS DATE)) AS BIGINT) AS delay
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE year(o_orderdate) IN (1996, 1997)),
         q AS (SELECT l_suppkey, t,
             CASE WHEN SUM(delay) >= 0
               THEN CAST(CAST(SUM(delay) AS HUGEINT) * 1000000
                 // COUNT(*) AS BIGINT)
               ELSE -CAST(CAST(-SUM(delay) AS HUGEINT) * 1000000
                 // COUNT(*) AS BIGINT) END AS y
           FROM d GROUP BY 1, 2),
         m AS (SELECT l_suppkey, COUNT(*) AS n_quarters,
             SUM(t) AS st, SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(t AS HUGEINT) * y) AS sty, SUM(t * t) AS stt
           FROM q GROUP BY 1 HAVING COUNT(*) >= 2),
         sl AS (SELECT l_suppkey, n_quarters,
             n_quarters * sty - st * sy AS num,
             n_quarters * stt - st * st AS den
           FROM m)
         SELECT CAST(l_suppkey AS BIGINT) AS supp_key,
           CAST(n_quarters AS BIGINT) AS n_quarters,
           CASE WHEN num >= 0
             THEN CAST(num // GREATEST(den, 1) AS BIGINT)
             ELSE -CAST((-num) // GREATEST(den, 1) AS BIGINT)
           END AS trend_e6_per_quarter
         FROM sl
         ORDER BY trend_e6_per_quarter DESC, supp_key LIMIT 25""",

    "q316_spend_gini" ->
      """WITH sp AS (SELECT c.c_mktsegment AS segment,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100)
             AS BIGINT) AS spend_e2
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY 1, o.o_custkey),
         v AS (SELECT segment, spend_e2 AS x,
             CAST(COUNT(*) AS HUGEINT) AS c
           FROM sp GROUP BY 1, 2),
         b AS (SELECT segment, CAST(x AS HUGEINT) AS x, c,
             SUM(c) OVER (PARTITION BY segment ORDER BY x
               ROWS UNBOUNDED PRECEDING) - c AS m
           FROM v),
         g AS (SELECT segment, SUM(c) AS n, SUM(x * c) AS sx,
             SUM(x * (c * m + (c * (c + 1)) // 2)) AS sixi
           FROM b GROUP BY 1)
         SELECT segment, CAST(n AS BIGINT) AS n_customers,
           CAST(sx AS BIGINT) AS spend_total_e2,
           CAST((2 * sixi - (n + 1) * sx) * 1000000
             // GREATEST(n * sx, 1) AS BIGINT) AS gini_ppm
         FROM g ORDER BY segment""",

    "q318_revenue_changepoint" ->
      s"""WITH $DailyNationRevenueSql,
         cum AS (SELECT nation_key, d,
             SUM(rev) OVER (PARTITION BY nation_key ORDER BY d
               ROWS UNBOUNDED PRECEDING) AS sk,
             CAST(ROW_NUMBER() OVER (PARTITION BY nation_key
               ORDER BY d) AS HUGEINT) AS k
           FROM daily),
         tot AS (SELECT nation_key, CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(rev) AS sn
           FROM daily GROUP BY 1),
         dv AS (SELECT cum.nation_key, cum.d,
             CASE WHEN n * sk - k * sn >= 0 THEN n * sk - k * sn
               ELSE -(n * sk - k * sn) END AS dev, n, sn
           FROM cum JOIN tot USING (nation_key)),
         pick AS (SELECT nation_key, d, dev, n, sn,
             ROW_NUMBER() OVER (PARTITION BY nation_key
               ORDER BY dev DESC, d) AS rn
           FROM dv)
         SELECT nation_key, CAST(n AS BIGINT) AS n_days,
           d AS change_day,
           CAST(dev * 1000000 // GREATEST(n * sn, 1) AS BIGINT)
             AS dev_ppm
         FROM pick WHERE rn = 1 ORDER BY nation_key""",

    "q323_runs_test" ->
      s"""WITH $DailyNationRevenueSql,
         mv AS (SELECT nation_key, d, rev,
             LAG(rev) OVER (PARTITION BY nation_key ORDER BY d)
               AS prev
           FROM daily),
         sg AS (SELECT nation_key, d,
             CASE WHEN rev > prev THEN 1 ELSE -1 END AS sgn
           FROM mv WHERE prev IS NOT NULL AND rev <> prev),
         rn AS (SELECT nation_key, sgn,
             LAG(sgn) OVER (PARTITION BY nation_key ORDER BY d)
               AS psgn
           FROM sg)
         SELECT nation_key, CAST(COUNT(*) AS BIGINT) AS n_moves,
           CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_up,
           CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_down,
           CAST(SUM(CASE WHEN psgn IS NULL OR sgn <> psgn
             THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
           CAST(CAST(SUM(CASE WHEN psgn IS NULL OR sgn <> psgn
               THEN 1 ELSE 0 END) AS HUGEINT) * COUNT(*) * 1000000
             // (COUNT(*)
               + 2 * SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)
                   * SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END))
             AS BIGINT) AS vs_random_ppm
         FROM rn GROUP BY 1 ORDER BY nation_key""",

    "q329_price_size_gamma" ->
      """WITH p AS (SELECT p_brand, p_partkey,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS pr,
           CAST(p_size AS BIGINT) AS sz
         FROM part),
         pr AS (SELECT a.p_brand,
             SUM(CASE WHEN (a.pr < b.pr AND a.sz < b.sz)
               OR (a.pr > b.pr AND a.sz > b.sz) THEN 1 ELSE 0 END)
               AS concordant,
             SUM(CASE WHEN (a.pr < b.pr AND a.sz > b.sz)
               OR (a.pr > b.pr AND a.sz < b.sz) THEN 1 ELSE 0 END)
               AS discordant,
             COUNT(*) AS n_pairs
           FROM p a JOIN p b
             ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
           GROUP BY 1)
         SELECT p_brand, CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(concordant AS BIGINT) AS concordant,
           CAST(discordant AS BIGINT) AS discordant,
           CASE WHEN concordant >= discordant
             THEN CAST((concordant - discordant) * 1000000
               // GREATEST(concordant + discordant, 1) AS BIGINT)
             ELSE -CAST((discordant - concordant) * 1000000
               // GREATEST(concordant + discordant, 1) AS BIGINT)
           END AS gamma_ppm
         FROM pr ORDER BY p_brand""",

    "q331_price_ladder_gap" ->
      """WITH prices AS (SELECT p_brand,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS price_e2
         FROM part GROUP BY 1, 2),
         gaps AS (SELECT p_brand,
             price_e2 - LAG(price_e2) OVER (PARTITION BY p_brand
               ORDER BY price_e2) AS gap_e2,
             LAG(price_e2) OVER (PARTITION BY p_brand
               ORDER BY price_e2) AS gap_floor_e2
           FROM prices),
         g AS (SELECT * FROM gaps WHERE gap_floor_e2 IS NOT NULL),
         rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY p_brand
             ORDER BY gap_e2 DESC, gap_floor_e2) AS rn
           FROM g)
         SELECT p_brand, CAST(COUNT(*) + 1 AS BIGINT) AS n_prices,
           MAX(CASE WHEN rn = 1 THEN gap_e2 END) AS max_gap_e2,
           MAX(CASE WHEN rn = 1 THEN gap_floor_e2 END)
             AS max_gap_floor_e2,
           CAST((MAX(gap_floor_e2 + gap_e2) - MIN(gap_floor_e2))
             // GREATEST(COUNT(*), 1) AS BIGINT) AS mean_gap_e2
         FROM rk GROUP BY 1 ORDER BY p_brand""",

    "q333_persistence_profile" ->
      """WITH day AS (SELECT CAST(o_orderdate AS DATE) AS d,
           COUNT(*) AS c
         FROM orders GROUP BY 1),
         lg AS (SELECT CAST(t AS BIGINT) AS lag
           FROM (VALUES (1), (2), (3), (7)) v(t)),
         pr AS (SELECT lg.lag, CAST(a.c AS HUGEINT) AS x,
             CAST(b.c AS HUGEINT) AS y
           FROM day a CROSS JOIN lg
           JOIN day b ON b.d = a.d + to_days(CAST(lg.lag AS INTEGER))),
         m AS (SELECT lag, CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx
           FROM pr GROUP BY 1),
         nd AS (SELECT lag, CAST(n AS BIGINT) AS n_pairs,
             n * sxy - sx * sy AS num, n * sxx - sx * sx AS den
           FROM m)
         SELECT lag, n_pairs,
           CASE WHEN num >= 0
             THEN CAST(num * 1000000 // GREATEST(den, 1) AS BIGINT)
             ELSE -CAST((-num) * 1000000 // GREATEST(den, 1)
               AS BIGINT)
           END AS slope_ppm
         FROM nd ORDER BY lag""",

    "q369_peak_concurrency" ->
      s"""WITH ${SessionSql.cte("sx", Seq("ts"))},
         sess AS (SELECT user_id, session_idx,
             MIN(ts) AS st, MAX(ts) AS en
           FROM sx GROUP BY 1, 2),
         pts AS (SELECT CAST(st AS DATE) AS day, st AS pt, 1 AS delta,
             user_id, session_idx FROM sess
           UNION ALL
           SELECT CAST(st AS DATE), en, -1, user_id, session_idx
           FROM sess),
         r AS (SELECT day, delta,
             SUM(delta) OVER (PARTITION BY day
               ORDER BY pt, delta DESC, user_id, session_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
           FROM pts)
         SELECT day, CAST(MAX(run) AS BIGINT) AS peak_concurrent,
           CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sessions
         FROM r GROUP BY day ORDER BY day""",

    "q370_churn_hazard" ->
      """WITH u AS (SELECT user_id,
           CAST((MAX(CAST(ts AS DATE)) - MIN(CAST(ts AS DATE))) // 7
             AS BIGINT) AS week
         FROM events GROUP BY 1),
         b AS (SELECT week, COUNT(*) AS n_churned FROM u GROUP BY 1),
         c AS (SELECT week, n_churned,
             SUM(n_churned) OVER (ORDER BY week DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS n_at_risk
           FROM b)
         SELECT week, CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(n_churned AS BIGINT) AS n_churned,
           CAST(n_churned * 1000000 // n_at_risk AS BIGINT)
             AS hazard_ppm
         FROM c ORDER BY week""",

    "q372_transition_dwell" ->
      s"""WITH ${SessionSql.cte("sx", Seq("ts", "event_id", "event_type"))},
         lg AS (SELECT event_type, ts,
             LAG(event_type) OVER ws AS prev_type,
             LAG(epoch_us(ts)) OVER ws AS prev_us
           FROM sx
           WINDOW ws AS (PARTITION BY user_id, session_idx
             ORDER BY ts, event_id)),
         g AS (SELECT prev_type || '>' || event_type AS transition,
             (epoch_us(ts) - prev_us) // 1000000 AS gap_s
           FROM lg WHERE prev_type IS NOT NULL),
         h AS (SELECT transition, gap_s, COUNT(*) AS cnt
           FROM g GROUP BY 1, 2),
         tt AS (SELECT transition, SUM(cnt) AS total FROM h GROUP BY 1),
         c AS (SELECT h.transition, h.gap_s, tt.total,
             SUM(h.cnt) OVER (PARTITION BY h.transition
               ORDER BY h.gap_s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM h JOIN tt USING (transition))
         SELECT transition,
           CAST(MAX(total) AS BIGINT) AS n_transitions,
           CAST(MIN(CASE WHEN cum * 2 >= total THEN gap_s END)
             AS BIGINT) AS p50_s,
           CAST(MIN(CASE WHEN cum * 10 >= total * 9 THEN gap_s END)
             AS BIGINT) AS p90_s
         FROM c GROUP BY 1 ORDER BY transition""",

    "q373_fanout_profile" ->
      """WITH f AS (SELECT 'orders>lineitem' AS rel,
             COUNT(*) AS fanout
           FROM lineitem GROUP BY l_orderkey
           UNION ALL
           SELECT 'customer>orders', COUNT(*)
           FROM orders GROUP BY o_custkey),
         h AS (SELECT rel, fanout, COUNT(*) AS cnt FROM f GROUP BY 1, 2),
         tt AS (SELECT rel, SUM(cnt) AS n_keys,
             SUM(fanout * cnt) AS n_rows
           FROM h GROUP BY 1),
         c AS (SELECT h.rel, h.fanout, tt.n_keys, tt.n_rows,
             SUM(h.cnt) OVER (PARTITION BY h.rel ORDER BY h.fanout
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM h JOIN tt USING (rel))
         SELECT rel, CAST(MAX(n_keys) AS BIGINT) AS n_keys,
           CAST(MAX(n_rows) AS BIGINT) AS n_rows,
           CAST(MAX(n_rows) * 1000 // MAX(n_keys) AS BIGINT)
             AS mean_fanout_e3,
           CAST(MIN(CASE WHEN cum * 2 >= n_keys THEN fanout END)
             AS BIGINT) AS p50,
           CAST(MIN(CASE WHEN cum * 10 >= n_keys * 9 THEN fanout END)
             AS BIGINT) AS p90,
           CAST(MAX(fanout) AS BIGINT) AS max_fanout
         FROM c GROUP BY rel ORDER BY rel""",

    "q375_markov_prediction" ->
      s"""WITH ${SessionSql.cte("sx", Seq("ts", "event_id", "event_type"))},
         lg AS (SELECT event_type AS next_type,
             LAG(event_type) OVER (PARTITION BY user_id, session_idx
               ORDER BY ts, event_id) AS prev_type
           FROM sx),
         cnt AS (SELECT prev_type, next_type, COUNT(*) AS n
           FROM lg WHERE prev_type IS NOT NULL GROUP BY 1, 2),
         rk AS (SELECT prev_type, next_type, n,
             ROW_NUMBER() OVER (PARTITION BY prev_type
               ORDER BY n DESC, next_type) AS rk,
             SUM(n) OVER (PARTITION BY prev_type) AS total
           FROM cnt)
         SELECT prev_type, next_type AS predicted,
           CAST(total AS BIGINT) AS n_transitions,
           CAST(n AS BIGINT) AS n_correct,
           CAST(n * 1000000 // total AS BIGINT) AS accuracy_ppm
         FROM rk WHERE rk = 1 ORDER BY prev_type""",

    "q377_interval_coverage" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
           COUNT(*) AS n_orders FROM orders GROUP BY 1),
         idxd AS (SELECT day, n_orders,
           ROW_NUMBER() OVER (ORDER BY day) AS idx FROM daily),
         offs AS (SELECT day, idx,
           CAST(UNNEST(range(1, 29)) AS BIGINT) AS off FROM idxd),
         hist AS (SELECT o.day, d2.n_orders AS h_n, d2.day AS h_day
           FROM offs o JOIN idxd d2 ON d2.idx = o.idx - o.off),
         ranked AS (SELECT day, h_n, h_day,
             ROW_NUMBER() OVER (PARTITION BY day
               ORDER BY h_n, h_day) AS rk,
             COUNT(*) OVER (PARTITION BY day) AS m
           FROM hist),
         bounds AS (SELECT day, m,
             MIN(CASE WHEN rk = (m * 10 + 99) // 100 THEN h_n END)
               AS lo,
             MIN(CASE WHEN rk = (m * 90 + 99) // 100 THEN h_n END)
               AS hi
           FROM ranked GROUP BY day, m)
         SELECT CAST(EXTRACT(year FROM b.day) AS BIGINT) AS year,
           COUNT(*) AS n_days,
           CAST(SUM(CASE WHEN d.n_orders BETWEEN lo AND hi
             THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
           CAST(SUM(CASE WHEN d.n_orders BETWEEN lo AND hi
             THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
             AS coverage_ppm,
           CAST(SUM(hi - lo) * 1000 // COUNT(*) AS BIGINT)
             AS mean_width_e3
         FROM bounds b JOIN daily d USING (day)
         WHERE m = 28 GROUP BY 1 ORDER BY year""",

    "q383_gap_sensitivity" -> {
      def arm(g: Int): String =
        s"""g$g AS (SELECT user_id, session_idx, COUNT(*) AS n
             FROM se$g GROUP BY 1, 2),
           r$g AS (SELECT $g AS gap_min, COUNT(*) AS n_sessions,
             SUM(n) AS tot,
             SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS nb FROM g$g)"""
      s"""WITH ${SessionSql.cte("se10", Seq("event_id"), 600L)},
         ${SessionSql.cte("se30", Seq("event_id"), 1800L)},
         ${SessionSql.cte("se60", Seq("event_id"), 3600L)},
         ${arm(10)}, ${arm(30)}, ${arm(60)}
         SELECT CAST(gap_min AS BIGINT) AS gap_min,
           CAST(n_sessions AS BIGINT) AS n_sessions,
           CAST(tot * 1000 // n_sessions AS BIGINT) AS mean_events_e3,
           CAST(nb * 1000000 // n_sessions AS BIGINT) AS bounce_ppm
         FROM (SELECT * FROM r10 UNION ALL SELECT * FROM r30
           UNION ALL SELECT * FROM r60) u
         ORDER BY gap_min"""
    },

    "q385_order_backlog" ->
      """WITH placed AS (SELECT CAST(o_orderdate AS DATE) AS day,
           COUNT(*) AS delta FROM orders GROUP BY 1),
         closed AS (SELECT day, -COUNT(*) AS delta FROM (
             SELECT l_orderkey,
               MAX(CAST(l_shipdate AS DATE)) + 1 AS day
             FROM lineitem GROUP BY 1) c GROUP BY day),
         d AS (SELECT day, SUM(delta) AS d FROM
           (SELECT * FROM placed UNION ALL SELECT * FROM closed) u
           GROUP BY 1),
         b AS (SELECT day, SUM(d) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS backlog FROM d)
         SELECT CAST(EXTRACT(year FROM day) * 100
             + EXTRACT(month FROM day) AS BIGINT) AS ym,
           CAST(MAX(backlog) AS BIGINT) AS peak_backlog,
           CAST(max_by(backlog, day) AS BIGINT) AS end_backlog
         FROM b GROUP BY 1 ORDER BY ym""",

    "q391_backlog_aging" ->
      """WITH life AS (SELECT o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS oday, c.close_day
         FROM orders o JOIN (
           SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS close_day
           FROM lineitem GROUP BY 1) c
           ON o.o_orderkey = c.l_orderkey),
         me AS (SELECT DISTINCT last_day(CAST(o_orderdate AS DATE)) AS m
           FROM orders),
         open_at AS (SELECT l.o_orderkey, me.m,
             me.m - l.oday AS age
           FROM life l JOIN me ON l.oday <= me.m
             AND l.close_day > me.m),
         banded AS (SELECT m,
             CASE WHEN age <= 30 THEN 'a_0_30'
               WHEN age <= 90 THEN 'b_31_90'
               ELSE 'c_90_plus' END AS band
           FROM open_at)
         SELECT CAST(EXTRACT(year FROM m) * 100
             + EXTRACT(month FROM m) AS BIGINT) AS ym,
           band, COUNT(*) AS n_open
         FROM banded GROUP BY 1, 2 ORDER BY ym, band""")
}
