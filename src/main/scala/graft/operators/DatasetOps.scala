package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-preparation operators: deterministic splits and sequence
  * packing — the last mile between a curated corpus and a training run.
  */
object DatasetOps {

  /** Deterministic hash split (train/val/test): a doc's fate is a pure
    * function of (salt, id) — stable across runs, machines and engines, so
    * a re-run never leaks validation docs into training. The uniform draw
    * is the first 8 md5 hex digits compared AS A STRING against hex
    * thresholds (lowercase hex orders lexicographically = numerically —
    * no integer parsing, so any SQL engine reproduces it). Fractions must
    * sum to 1; labels assign in the given order. Zero shuffle. */
  def hashSplit(docs: DataFrame,
                fractions: Seq[(String, Double)] =
                  Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
                salt: String = "split",
                idCol: String = "doc_id"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0) &&
      math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must be positive and sum to 1")
    val draw = substring(md5(concat(lit(salt + "|"),
      col(idCol).cast("string"))), 1, 8)
    // cumulative thresholds as 8-digit hex strings
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    val thresholds = cum.init.map(f => // last bucket takes the remainder
      f"${math.floor(f * (1L << 32)).toLong}%08x")
    val labeled = fractions.init.zip(thresholds)
      .foldRight(lit(fractions.last._1): Column) {
        case (((label, _), th), rest) => when(draw < lit(th), label)
          .otherwise(rest)
      }
    docs.withColumn("split", labeled)
  }

  /** Exact-proportion stratified split: [[hashSplit]]'s thresholds give
    * each doc an independent draw, so a small stratum (a rare language, a
    * tiny domain) can land entirely in `train` by chance — a 5% val
    * fraction means val is EMPTY for any stratum under ~20 docs half the
    * time. This variant ranks docs WITHIN each stratum by the same
    * deterministic md5 draw and cuts at floor(cumFraction × n), so every
    * stratum honours the requested proportions to ±1 doc, and membership
    * is still a pure function of (salt, ids in the stratum) — engines and
    * re-runs agree exactly. The cut itself is EXACT INTEGER arithmetic:
    * fractions become parts-per-million on the driver and the comparison
    * is `rank × 1e6 ≤ n × ppm` — no floating floor whose last ulp could
    * disagree between an IEEE engine and a decimal one.
    *
    * Scale shape: one shuffle on the stratum key; rank + count are two
    * window frames over the SAME partitioning (one exchange). A
    * mega-stratum serialises its rank into one task — same hazard and
    * same remedy as `mixtureSample` (pre-split giant strata on a salted
    * subkey, or fall back to [[hashSplit]] for strata above a count
    * threshold, where the law of large numbers already guarantees the
    * proportions the ranking buys). */
  def stratifiedSplit(docs: DataFrame, strataCol: String,
                      fractions: Seq[(String, Double)] =
                        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
                      salt: String = "strat",
                      idCol: String = "doc_id"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0) &&
      math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must be positive and sum to 1")
    val draw = md5(concat(lit(salt + "|"), col(idCol).cast("string")))
    val byStratum = Window.partitionBy(col(strataCol))
    val rank = row_number().over(byStratum.orderBy(draw.asc, col(idCol).asc))
    val n = count(lit(1)).over(byStratum)
    val labeled = fractions.init.zip(stratifiedCutpointsPpm(fractions))
      .foldRight(lit(fractions.last._1): Column) {
        case (((label, _), (_, ppm)), rest) =>
          when(col("strat_rank") * lit(1000000L) <=
            col("strat_n") * lit(ppm), label).otherwise(rest)
      }
    docs.withColumn("strat_rank", rank).withColumn("strat_n", n)
      .withColumn("split", labeled)
      .drop("strat_rank", "strat_n")
  }

  /** Cumulative cut fractions as exact parts-per-million (one per label
    * except the last, which takes the remainder) — the single source of
    * truth for [[stratifiedSplit]] and its cross-engine oracle SQL. */
  def stratifiedCutpointsPpm(fractions: Seq[(String, Double)]): Seq[(String, Long)] = {
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    fractions.init.zip(cum.init).map { case ((label, _), c) =>
      (label, math.round(c * 1e6))
    }
  }

  /** Balanced subsample: cap every group (language, domain, source) at
    * `perGroupQuota` documents, selected by a DETERMINISTIC hash rank —
    * the data-mixing primitive that stops one over-represented domain from
    * dominating a training mix. Selection is a pure function of
    * (salt, id): re-runs, engines and resumed jobs agree on the kept set.
    * One window rank per group — parallel across groups, no global sort. */
  def balancedSample(docs: DataFrame, groupCol: String, perGroupQuota: Long,
                     salt: String = "balance",
                     idCol: String = "doc_id"): DataFrame = {
    require(perGroupQuota > 0)
    val draw = md5(concat(lit(salt + "|"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(draw.asc, col(idCol).asc)
    docs
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= perGroupQuota)
      .drop("sample_rank")
  }

  /** Mixture sampling: downsample each group (language, domain, source) to
    * a TARGET RATE — the data-mixing primitive for hitting a training-mix
    * recipe ("60% en, 30% de, 15% everything else") rather than a fixed
    * per-group quota ([[balancedSample]]). Selection is a deterministic
    * hash rank: a doc is kept iff its rank within its group (ordered by
    * `md5(salt|id)`) is ≤ `ceil(rate × group_size)`, so re-runs, engines
    * and resumed jobs agree on the kept set, and the kept subset of a
    * group is a prefix of the same permutation [[balancedSample]] uses —
    * recipes compose.
    *
    * Scale shape: one shuffle on the group key; the rank window and the
    * group-count window share that partitioning (groups are domains /
    * languages — bounded cardinality, each group parallel). A single
    * mega-group is the known hazard: at 100 TB, pre-split a dominant
    * group with a salted sub-key, sample each sub-group at the same rate,
    * and the union still hits the target rate in expectation. */
  def mixtureSample(docs: DataFrame, groupCol: String,
                    rates: Map[String, Double], defaultRate: Double,
                    salt: String = "mix",
                    idCol: String = "doc_id"): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r > 0 && r <= 1),
      "rates must be in (0, 1]")
    val draw = md5(concat(lit(salt + "|"), col(idCol).cast("string")))
    val rate = rates.foldLeft(lit(defaultRate): Column) {
      case (acc, (g, r)) => when(col(groupCol) === g, lit(r)).otherwise(acc)
    }
    val wRank = Window.partitionBy(col(groupCol))
      .orderBy(draw.asc, col(idCol).asc)
    val wCount = Window.partitionBy(col(groupCol))
    docs
      .withColumn("grp_n", count(lit(1)).over(wCount))
      .withColumn("mix_rank", row_number().over(wRank))
      .filter(col("mix_rank") <= ceil(col("grp_n") * rate))
      .drop("grp_n", "mix_rank")
  }

  /** Epoch upsampling: the REPEAT side of data mixing ([[mixtureSample]]
    * downsamples; DoReMi/Pile-style recipes also repeat scarce sources
    * for multiple epochs). Rates are parts-per-million and may exceed
    * 10⁶: a doc in group g with rate `ppm` appears `ppm div 10⁶` times,
    * plus once more if its deterministic rank falls inside the
    * fractional remainder — so the group's total kept volume is EXACTLY
    * `round-down(n_g · ppm / 10⁶)` docs (±0, integer arithmetic), and
    * the fractional slice is the same md5 rank prefix the other
    * samplers use. Each copy carries `epoch` (0-based) so a training
    * loader can interleave epochs rather than replay them back-to-back.
    *
    * Scale shape: one shuffle on the group key for the rank/count
    * windows, then a map-only `explode(sequence(...))` — output size is
    * the recipe's, no join, no driver loop. Mega-group hazard and
    * salted-subkey remedy as [[mixtureSample]]. */
  def upsampleMixture(docs: DataFrame, groupCol: String,
                      ratesPpm: Map[String, Long], defaultPpm: Long,
                      salt: String = "epoch",
                      idCol: String = "doc_id"): DataFrame = {
    require((ratesPpm.values ++ Seq(defaultPpm)).forall(_ > 0),
      "ppm rates must be positive")
    val draw = md5(concat(lit(salt + "|"), col(idCol).cast("string")))
    val ppm = ratesPpm.foldLeft(lit(defaultPpm): Column) {
      case (acc, (g, r)) => when(col(groupCol) === g, lit(r)).otherwise(acc)
    }
    val wRank = Window.partitionBy(col(groupCol))
      .orderBy(draw.asc, col(idCol).asc)
    val wCount = Window.partitionBy(col(groupCol))
    docs
      .withColumn("grp_n", count(lit(1)).over(wCount))
      .withColumn("mix_rank", row_number().over(wRank))
      .withColumn("mix_ppm", ppm)
      .withColumn("n_copies",
        expr("mix_ppm div 1000000") +
          when(col("mix_rank") * lit(1000000L) <=
            col("grp_n") * expr("mix_ppm % 1000000"), 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .withColumn("epoch",
        explode(sequence(lit(0L), col("n_copies") - 1)))
      .drop("grp_n", "mix_rank", "mix_ppm", "n_copies")
  }

  /** Corpus snapshot diff: classify every document across two corpus
    * versions as added / removed / changed / unchanged by CONTENT HASH —
    * the dataset-versioning primitive behind reproducible training runs
    * (pin the snapshot a model trained on; audit what moved between
    * releases; drive [[graft.sink.IncrementalUpdate]]-style backfills
    * from the changed set).
    *
    * Scale shape: each side reduces to (id, md5) BEFORE the join, so the
    * one full-outer equi-join on the id key carries 32-byte hashes, never
    * document text; the classification is a pure projection. At 100 TB
    * both hash projections stream map-only out of their scans. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    oldSnap.select(col(idCol), md5(col(textCol)).as("h_old"))
      .join(newSnap.select(col(idCol), md5(col(textCol)).as("h_new")),
        Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") === col("h_new"), "unchanged")
          .otherwise("changed").as("status"))

  /** Temperature-scaled mixture sampling: downsample groups so kept
    * volumes follow `n_g^α` with α = 0.5 (temperature 2 — the flattening
    * exponent multilingual mixes use, cf. the XLM-R sampling scheme)
    * instead of the raw `n_g`. The smallest group keeps EVERYTHING and
    * every larger group keeps `k_g = floor(sqrt(n_min · n_g))` docs —
    * `n_min ≤ k_g ≤ n_g`, and kept counts are proportional to `sqrt(n_g)`
    * up to the integer floor, so a 100× larger group contributes only 10×
    * the docs. Selection is the same deterministic `md5(salt|id)` rank
    * permutation as [[balancedSample]]/[[mixtureSample]] — recipes
    * compose, and the kept set is a pure function of (salt, ids).
    * `sqrt` over a BIGINT product is IEEE-exact in every engine while
    * `n_min · n_g < 2^52` (per-group counts to ~10⁷ × 10⁸); past that,
    * compute `k_g` in DECIMAL — documented bound, not a silent error.
    *
    * Scale shape: one shuffle on the group key; the count and rank
    * windows share that partitioning; `n_min` is a one-row broadcast.
    * Mega-group hazard and salted-subkey remedy as [[mixtureSample]]. */
  def temperatureSample(docs: DataFrame, groupCol: String,
                        salt: String = "temp",
                        idCol: String = "doc_id"): DataFrame = {
    val draw = md5(concat(lit(salt + "|"), col(idCol).cast("string")))
    val wCount = Window.partitionBy(col(groupCol))
    val wRank = Window.partitionBy(col(groupCol))
      .orderBy(draw.asc, col(idCol).asc)
    val counts = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("grp_n"))
    val nMin = counts.agg(min(col("grp_n")).as("n_min"))
    docs
      .withColumn("grp_n", count(lit(1)).over(wCount))
      .withColumn("temp_rank", row_number().over(wRank))
      .crossJoin(broadcast(nMin))
      .filter(col("temp_rank") <=
        floor(sqrt((col("n_min") * col("grp_n")).cast("double"))))
      .drop("grp_n", "temp_rank", "n_min")
  }

  /** Sequence packing: group consecutive documents into bins of at most
    * `tokenBudget` tokens (greedy first-fit in id order WITHIN each
    * `packKey` group). The bin id is a closed form over the running token
    * total — `floor((cumsum - n_tokens) / budget)` — so packing is one
    * window pass, no iterative loop. Scale shape: the window partitions by
    * `packKey` (e.g. language), so packing parallelises across groups and
    * no single sort sees the whole corpus; a doc longer than the budget
    * occupies its own bin(s) boundary-aligned. */
  def packSequences(docs: DataFrame, tokenBudget: Long,
                    packKey: String, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(tokenBudget > 0)
    val w = Window.partitionBy(col(packKey)).orderBy(col(idCol))
    docs
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol))
        .cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("bin",
        floor((col("cum_tokens") - col("n_tokens")) / tokenBudget)
          .cast("long"))
      .select(col(packKey), col(idCol), col("n_tokens"), col("cum_tokens"),
        col("bin"))
  }

  /** Document chunking: split each document into overlapping token
    * windows of `chunkTokens` tokens with `overlap` tokens shared between
    * consecutive chunks — the prep step before embedding (models have a
    * context limit; overlap keeps boundary-spanning passages retrievable).
    * Chunk count is pure integer arithmetic
    * (`ceil(max(n−overlap,1)/stride)`, stride = chunkTokens−overlap), so
    * chunk ids and boundaries are engine-exact. Map-only: one explode per
    * doc, fan-out ≈ n/stride rows — no shuffle, embarrassingly parallel,
    * and the chunk relation partitions however the corpus did. */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int, overlap: Int,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val toks = TextAnalysis.tokens(col(textCol))
    val n = size(toks)
    // integer ceil: (max(n - overlap, 1) + stride - 1) / stride — Spark's
    // `/` is double division, so divide then truncate (positive ⇒ floor)
    val nChunks = ((greatest(n - overlap, lit(1)) + lit(stride - 1))
      / lit(stride)).cast("int")
    docs
      .select(col(idCol), toks.as("toks"), n.as("n_toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        array_join(slice(col("toks"), col("chunk_id") * stride + 1,
          lit(chunkTokens)), " ").as("chunk_text"),
        least(col("n_toks") - col("chunk_id") * stride, lit(chunkTokens))
          .as("n_chunk_tokens"))
  }

  /** Token-budget selection: keep the highest-quality documents until a
    * token budget is exhausted — the "best N tokens" data-selection step
    * of a training run. Quality is bucketed (`floor(q × buckets)`, best
    * bucket first), so selection needs NO global sort: per-bucket token
    * totals are `buckets` rows (metadata scale — the bounded running-sum
    * window over them is the q81 offset scheme), and within a bucket docs
    * fill greedily by deterministic hash order. A doc is kept iff the
    * tokens of all better buckets plus its own bucket's running prefix
    * fit the budget — a pure function of (salt, corpus), reproducible on
    * any engine or partition layout.
    *
    * Scale shape: one shuffle on the bucket key for the within-bucket
    * prefix sums; buckets bound the quality resolution AND the per-task
    * serial work — raise `buckets` if one quality band dominates. */
  /** Largest-remainder (Hamilton) apportionment of a token budget over
    * per-group weights — the step that TURNS corpus statistics INTO the
    * ppm recipe the samplers ([[mixtureSample]], [[upsampleMixture]])
    * consume. Exact: allocations sum to `budget` precisely, each group
    * gets `floor(budget·w_g / W)` plus one of the `budget − Σfloor`
    * leftover seats in largest-remainder order (ties to the smaller
    * group name) — all 64-bit integer arithmetic, bit-identical on any
    * engine. Documented bound: `budget · max(weight) < 2^63` — pre-scale
    * weights (divide by a common factor) when budgets and corpus sizes
    * both exceed ~10⁹.
    *
    * Scale shape: `stats` is a per-group aggregate (bounded cardinality
    * by construction); the total is a one-row cross join and the seat
    * rank a window over the group relation — metadata-scale end to end. */
  def allocateBudget(stats: DataFrame, budget: Long,
                     groupCol: String = "source",
                     weightCol: String = "n_tokens"): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val tot = stats.agg(sum(col(weightCol)).as("w_total"),
      count(lit(1)).as("n_groups"))
    val base = stats.crossJoin(broadcast(tot))
      .withColumn("q", expr(s"$budget * $weightCol div w_total"))
      .withColumn("r", expr(s"$budget * $weightCol % w_total"))
    val wSeat = Window.orderBy(col("r").desc, col(groupCol).asc)
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    base
      .withColumn("leftover", lit(budget) - sum(col("q")).over(wAll))
      .withColumn("seat", row_number().over(wSeat))
      .withColumn("alloc",
        col("q") + when(col("seat") <= col("leftover"), 1L).otherwise(0L))
      .select(col(groupCol), col(weightCol), col("alloc"))
  }

  def tokenBudgetSelect(docs: DataFrame, tokenBudget: Long,
                        buckets: Int = 1024, salt: String = "sel",
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    require(tokenBudget > 0 && buckets > 0)
    val q = TextAnalysis.qualityScore(col(textCol))
    val scored = docs
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol))
        .cast("long"))
      .withColumn("q_bucket",
        least(floor(q * lit(buckets.toDouble)).cast("int"),
          lit(buckets - 1)))
    val wOff = Window.orderBy(col("q_bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // `buckets` rows — the unpartitioned window is bounded by construction
    val offsets = scored.groupBy(col("q_bucket"))
      .agg(sum(col("n_tokens")).as("btoks"))
      .withColumn("before_toks", sum(col("btoks")).over(wOff) - col("btoks"))
      .select(col("q_bucket"), col("before_toks"))
    val draw = md5(concat(lit(salt + "|"), col(idCol).cast("string")))
    val wIn = Window.partitionBy(col("q_bucket"))
      .orderBy(draw.asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("bucket_cum", sum(col("n_tokens")).over(wIn))
      .join(broadcast(offsets), "q_bucket")
      .filter(col("before_toks") + col("bucket_cum") <= tokenBudget)
      .drop("bucket_cum", "before_toks")
  }

  /** Deterministic corpus shuffle + batch assignment: global training
    * order = rank by `md5(salt|id)` (a seeded permutation that every
    * engine, run and resumed job agrees on), batch = rank / batchSize.
    * This is how a training run fixes its data order WITHOUT a
    * nondeterministic `ORDER BY rand()`: change the salt to get an
    * independent epoch order.
    *
    * Scale shape: the global rank is computed WITHOUT a global sort or an
    * unpartitioned window (either would serialize the corpus through one
    * task). The first 8 hex digits of the draw split the hash space into
    * `shuffleBuckets` ordered, uniformly-filled ranges (lowercase hex
    * orders lexicographically = numerically, so bucket boundaries respect
    * draw order). Rank = per-bucket `row_number` (parallel across
    * buckets) + the running offset of earlier buckets' counts — the
    * offset table is `shuffleBuckets` rows, broadcast back. The result is
    * identical to `row_number() OVER (ORDER BY draw, id)` on any engine
    * and any partition layout. At 100 TB, write
    * `partitionBy(epoch_batch)` and readers stream batches in file order
    * without re-sorting. */
  /** Shard-manifest export: assign the corpus (in a deterministic seeded
    * order — the [[deterministicShuffle]] permutation) to fixed-size
    * output shards of ~`shardTokens` tokens each, and emit the manifest a
    * training loader consumes: per shard, the doc/token volume, the
    * global-order range it covers, and an md5 checksum over the ordered
    * id list — the integrity record that catches a dropped or re-ordered
    * shard before a training run does. Shard id is the closed form
    * `floor((cum_tokens − n_tokens) / shardTokens)` over the global
    * running token total, so a doc straddling a boundary starts the next
    * shard (same convention as [[packSequences]] bins).
    *
    * Scale shape: the global token cumsum is computed WITHOUT a global
    * sort — the md5 draw's leading 8 hex digits split the hash space into
    * `shuffleBuckets` ordered ranges; per-bucket token prefix sums run in
    * parallel and a `shuffleBuckets`-row broadcast offset table makes
    * them global (the q81 scheme, summing tokens instead of counting
    * rows). The manifest aggregation shuffles once on the shard id;
    * per-shard state is the shard's own id list (bounded by
    * shardTokens / min-doc-tokens). At 100 TB, write the assignment
    * `partitionBy(shard_id)` and shards land as contiguous files. */
  def shardManifest(docs: DataFrame, shardTokens: Long,
                    salt: String = "shard0", idCol: String = "doc_id",
                    textCol: String = "text",
                    shuffleBuckets: Int = 256): DataFrame = {
    require(shardTokens > 0 && shuffleBuckets > 0)
    val draw = md5(concat(lit(salt + "|"), col(idCol).cast("string")))
    val keyed = docs.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"),
        draw.as("draw"))
      .withColumn("bucket",
        (conv(substring(col("draw"), 1, 8), 16, 10).cast("long")
          * shuffleBuckets / 4294967296L).cast("int"))
    val wOff = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // `shuffleBuckets` rows — bounded by construction (ExplainAudit-safe)
    val offsets = keyed.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("btoks"))
      .withColumn("tok_offset", sum(col("btoks")).over(wOff) - col("btoks"))
      .select(col("bucket"), col("tok_offset"))
    val wIn = Window.partitionBy(col("bucket"))
      .orderBy(col("draw"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed
      .withColumn("bucket_cum", sum(col("n_tokens")).over(wIn))
      .join(broadcast(offsets), "bucket")
      .withColumn("cum_tokens", col("tok_offset") + col("bucket_cum"))
      .withColumn("shard_id",
        expr(s"(cum_tokens - n_tokens) div $shardTokens"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tok_sum"),
        min(col("cum_tokens") - col("n_tokens")).as("start_tokens"),
        max(col("cum_tokens")).as("end_tokens"),
        md5(concat_ws(",",
          transform(
            array_sort(collect_list(struct(col("cum_tokens"), col(idCol)))),
            s => s.getField(idCol).cast("string")))).as("id_checksum"))
  }

  def deterministicShuffle(docs: DataFrame, batchSize: Long,
                           salt: String = "epoch0",
                           idCol: String = "doc_id",
                           shuffleBuckets: Int = 256): DataFrame = {
    require(batchSize > 0 && shuffleBuckets > 0)
    val draw = md5(concat(lit(salt + "|"), col(idCol).cast("string")))
    // bucket = floor(prefix32 / 2^32 * buckets): a pure function of the
    // draw, monotone in draw order — never of the physical partitioning
    val keyed = docs.select(col(idCol), draw.as("draw"))
      .withColumn("bucket",
        (conv(substring(col("draw"), 1, 8), 16, 10).cast("long")
          * shuffleBuckets / 4294967296L).cast("int"))
    val wOff = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // counts is `shuffleBuckets` rows (metadata scale) — the unpartitioned
    // running-sum window over it is bounded by construction
    val offsets = keyed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bucket_offset", sum(col("n")).over(wOff) - col("n"))
      .select(col("bucket"), col("bucket_offset"))
    val wIn = Window.partitionBy(col("bucket"))
      .orderBy(col("draw"), col(idCol))
    keyed
      .withColumn("bucket_rank", row_number().over(wIn).cast("long"))
      .join(broadcast(offsets), "bucket")
      .withColumn("shuffle_rank", col("bucket_offset") + col("bucket_rank"))
      .withColumn("epoch_batch",
        ((col("shuffle_rank") - 1) / batchSize).cast("long"))
      .select(col(idCol), col("draw"), col("shuffle_rank"), col("epoch_batch"))
  }

  /** Deterministic stratified hash sample: the k rows per stratum whose
    * salted md5 ranks lowest — the same rows every run, every engine, any
    * partitioning (the reproducible replacement for rand() sampling;
    * changing the salt redraws). Per-stratum top-k windows, so at scale
    * this is a partial top-k per group, never a global sort. */
  def hashSample(docs: DataFrame, k: Int, salt: String = "smp",
                 strataCol: String = "source",
                 idCol: String = "doc_id"): DataFrame = {
    require(k > 0, "need k > 0")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("h"), col(idCol))
    docs.select(col(idCol), col(strataCol))
      .withColumn("h",
        md5(concat(lit(salt + "|"), col(idCol).cast("string"))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(strataCol), col(idCol), col("rk").cast("long").as("rk"))
  }
}
