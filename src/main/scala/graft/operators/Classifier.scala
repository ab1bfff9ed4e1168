package graft.operators

import graft.Cut.CutOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes document classification in integer-exact bit
  * arithmetic — the quality/domain classifier step of a training-data
  * pipeline (CCNet's fastText filter, GPT-3's WebText-vs-crawl logistic
  * classifier serve this role). A trained classifier scores each document
  * against each class; the argmin-cost class is the prediction.
  *
  * Arithmetic: instead of summing float log-probabilities (whose rounding
  * would diverge between engines), every per-token cost is the BIT WIDTH
  * of an integer ratio — `length(bin((N_c + V) div (tf + 1)))`, the same
  * integer-exact `-log2 p` proxy the surprisal operators use
  * ([[TextAnalysis.lmScore]]). Laplace add-one smoothing falls out of the
  * `tf + 1` denominator (an unseen token costs the full `bin(N_c + V)`
  * width), and the class prior enters as `length(bin(N_docs div N_docs_c))`
  * — every quantity a 64-bit integer, so Spark and any ANSI engine agree
  * bit-for-bit. Ties break to the lexicographically smallest class.
  *
  * Scale shape: the model is a (class, token) relation — Zipf-small
  * relative to its corpus — built with one partial-agg shuffle; per-class
  * totals and priors are a handful of rows, broadcast. Scoring fans the
  * scored corpus's occurrence relation out by the class count (a small
  * constant), left-joins the model on the (token, class) key, and
  * aggregates per (doc, class); the argmin is a window over exactly
  * `n_classes` rows per document. No corpus-side self-join anywhere.
  *
  * Reference surface: none (the reference has no classifier); part of the
  * LLM-pipeline extension (SURVEY §2 north star).
  */
object Classifier {

  /** Train: the (label, tok, tf) multinomial model relation over
    * whitespace tokens. Persist it and score any corpus with
    * [[nbScore]] — the train-on-trusted / score-the-crawl split. */
  def nbTrain(docs: DataFrame, labelCol: String = "source",
              textCol: String = "text"): DataFrame =
    docs.select(col(labelCol).as("label"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col("label"), col("tok"))
      .agg(count(lit(1)).as("tf"))

  /** Per-class document counts — the prior relation ([[nbScore]] takes it
    * separately so a model trained once can be re-weighted). */
  def nbPriors(docs: DataFrame, labelCol: String = "source"): DataFrame =
    docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs_c"))

  /** The full per-(document, class) cost relation — [[nbScore]]'s argmin
    * input, exposed so confidence diagnostics (q367's reliability
    * diagram needs the best-vs-runner-up margin) read the same costs
    * the prediction used. One row per document per class. */
  /** Model-relation row count up to which the scoring join broadcasts
    * the model instead of shuffling the class-fanned occurrence
    * relation — the [[graft.plan.JoinAdvisor]] broadcastRowLimit
    * default applied to this fixed-shape join. The gate is MEASURED per
    * call (one count over the already-checkpointed model): a trusted
    * curated model is vocab-scale and broadcasts; an open-crawl vocab
    * with junk tokens can exceed any broadcast budget and falls back to
    * the shuffle join. */
  val ModelBroadcastRowLimit: Long = 500000L

  def nbCosts(docs: DataFrame, model: DataFrame, priors: DataFrame,
              idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    // THREE consumers read the model (class mass, vocabulary size, the
    // scoring join) — without the lazy checkpoint the train-side
    // tokenize + shuffle runs three times per invocation.
    val m = model.cut(false)
    // class-level constants: token mass per class, vocabulary size, doc
    // totals — all metadata-scale, broadcast into the scoring join
    val classMass = m.groupBy(col("label"))
      .agg(sum(col("tf")).as("n_c"))
    val vocab = m.select(col("tok")).distinct()
      .agg(count(lit(1)).as("v"))
    val docTotal = priors.agg(sum(col("n_docs_c")).as("n_docs"))
    val classes = classMass.join(priors, "label")
      .crossJoin(vocab).crossJoin(docTotal)
      .withColumn("prior_bits",
        length(bin(expr("n_docs div n_docs_c"))).cast("long"))
      .select(col("label"), col("n_c"), col("v"), col("prior_bits"))

    val occ = docs.select(col(idCol).as("sid"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    // measured broadcast gate: the scoring join's left side is the
    // occurrence relation fanned out by the class count (corpus-scale ×
    // n_classes) — broadcasting the vocab-scale model removes BOTH
    // exchanges of that fanned relation (2 Exchange → 0 on the fact
    // side; q128 3.2 s → 2.0 s, q367 3.5 s → 2.2 s at sf0.1 together
    // with the shared-costs artifact). Above the row gate the original
    // shuffle join stays — the only scale-safe default for an unbounded
    // vocabulary.
    val modelSide =
      if (m.count() <= ModelBroadcastRowLimit) broadcast(m) else m
    occ
      .crossJoin(broadcast(classes))
      .join(modelSide, Seq("tok", "label"), "left")
      .withColumn("bits",
        length(bin(expr("(n_c + v) div (coalesce(tf, 0L) + 1)")))
          .cast("long"))
      .groupBy(col("sid"), col("label"))
      .agg((first(col("prior_bits")) + sum(col("bits"))).as("cost_bits"))
  }

  /** Score `docs` against a trained model: one row per document with the
    * argmin-cost `predicted` label and its total `cost_bits`.
    *
    * `model` is [[nbTrain]]'s output; `priors` is [[nbPriors]]'s. */
  def nbScore(docs: DataFrame, model: DataFrame, priors: DataFrame,
              idCol: String = "doc_id", textCol: String = "text")
      : DataFrame =
    predictFromCosts(nbCosts(docs, model, priors, idCol, textCol), idCol)

  /** The argmin step alone, over an ALREADY-COMPUTED cost relation —
    * exposed so consumers sharing one costs artifact (q128's confusion
    * matrix and q367's reliability diagram read the same costs) don't
    * re-derive the scoring join per query. */
  def predictFromCosts(costs: DataFrame,
                       idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col("sid"))
      .orderBy(col("cost_bits").asc, col("label").asc)
    costs.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("sid").as(idCol), col("label").as("predicted"),
        col("cost_bits"))
  }

  /** Self-classification with the CONFIDENCE MARGIN: best-vs-runner-up
    * cost gap in bits per document (0 = a coin flip between two
    * classes) — the raw material of a reliability diagram (does a wide
    * margin actually mean a correct prediction). The rank window is
    * per-document over exactly `n_classes` rows; requires ≥ 2 classes
    * (the margin is undefined otherwise, and the inner join makes that
    * loud — an empty result, never a fabricated margin). */
  def nbSelfClassifyMargin(docs: DataFrame, labelCol: String = "source",
                           idCol: String = "doc_id",
                           textCol: String = "text"): DataFrame =
    marginFromCosts(nbCosts(docs, nbTrain(docs, labelCol, textCol),
      nbPriors(docs, labelCol), idCol, textCol), idCol)

  /** The margin step alone over an already-computed cost relation (see
    * [[predictFromCosts]] — the shared-artifact entry). */
  def marginFromCosts(costs: DataFrame,
                      idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col("sid"))
      .orderBy(col("cost_bits").asc, col("label").asc)
    val ranked = costs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
    ranked.filter(col("rk") === 1)
      .select(col("sid"), col("label").as("predicted"),
        col("cost_bits").as("best_bits"))
      .join(ranked.filter(col("rk") === 2)
        .select(col("sid"), col("cost_bits").as("second_bits")), "sid")
      .select(col("sid").as(idCol), col("predicted"),
        (col("second_bits") - col("best_bits")).as("margin_bits"))
  }

  /** Self-classification convenience: train on `docs`, score `docs` —
    * the confusion-matrix diagnostic a pipeline runs to check whether its
    * source labels are even learnable. */
  def nbSelfClassify(docs: DataFrame, labelCol: String = "source",
                     idCol: String = "doc_id", textCol: String = "text")
      : DataFrame =
    nbScore(docs, nbTrain(docs, labelCol, textCol),
      nbPriors(docs, labelCol), idCol, textCol)

  /** DuckDB oracle for [[nbSelfClassify]] composed into a per-(actual,
    * predicted) confusion matrix — CTEs through `pred(doc_id, predicted,
    * cost_bits)`; the caller appends the final SELECT. Assumes the corpus
    * table is `documents` with `source` labels. */
  def selfClassifyOracleCtes: String =
    """tocc AS (SELECT source AS label,
           unnest(string_split_regex(trim(text), '\s+')) AS tok
         FROM documents),
       model AS (SELECT label, tok, COUNT(*) AS tf
         FROM tocc GROUP BY label, tok),
       cls AS (SELECT label, COUNT(*) AS n_c FROM tocc GROUP BY label),
       nd AS (SELECT source AS label, COUNT(*) AS n_docs_c
         FROM documents GROUP BY source),
       tot AS (SELECT COUNT(*) AS n_docs FROM documents),
       vv AS (SELECT COUNT(DISTINCT tok) AS v FROM tocc),
       pc AS (SELECT nd.label,
           length(bin(t.n_docs // nd.n_docs_c)) AS prior_bits
         FROM nd CROSS JOIN tot t),
       socc AS (SELECT doc_id,
           unnest(string_split_regex(trim(text), '\s+')) AS tok
         FROM documents),
       x AS (SELECT s.doc_id, c.label,
           length(bin((c.n_c + vv.v) // (COALESCE(m.tf, 0) + 1))) AS bits
         FROM socc s CROSS JOIN cls c CROSS JOIN vv
         LEFT JOIN model m ON m.tok = s.tok AND m.label = c.label),
       cost AS (SELECT x.doc_id, x.label,
           pc.prior_bits + SUM(x.bits) AS cost_bits
         FROM x JOIN pc USING (label)
         GROUP BY x.doc_id, x.label, pc.prior_bits),
       ranked AS (SELECT doc_id, label, cost_bits,
           ROW_NUMBER() OVER (PARTITION BY doc_id
             ORDER BY cost_bits, label) AS rk
         FROM cost),
       pred AS (SELECT doc_id, label AS predicted,
           CAST(cost_bits AS BIGINT) AS cost_bits
         FROM ranked WHERE rk = 1)"""
}
