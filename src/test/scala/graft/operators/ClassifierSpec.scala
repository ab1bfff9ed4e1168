package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "a", "alpha alpha beta"),
    (2L, "a", "alpha beta beta"),
    (3L, "a", "alpha alpha alpha"),
    (4L, "b", "gamma delta gamma"),
    (5L, "b", "delta delta gamma"),
    (6L, "b", "gamma gamma delta")
  ).toDF("doc_id", "source", "text")

  test("nbSelfClassify recovers well-separated source labels") {
    val pred = Classifier.nbSelfClassify(corpus)
      .join(corpus.select(col("doc_id"), col("source")), "doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("predicted"), r.getAs[String]("source")))
    assert(pred.length == 6)
    assert(pred.forall { case (_, p, actual) => p == actual })
  }

  test("nbScore costs are exact integer bits, one row per doc") {
    val model = Classifier.nbTrain(corpus)
    val priors = Classifier.nbPriors(corpus)
    val out = Classifier.nbScore(corpus, model, priors).collect()
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == 6)
    // hand-check doc 3 ("alpha alpha alpha") against class a:
    // n_a = 9 tokens, V = 4, tf(alpha|a) = 6 → per-token bits =
    // bin((9+4) div 7) = bin(1) = 1 bit ×3; prior bin(6 div 3)=bin(2)=2
    val d3 = out.find(_.getAs[Long]("doc_id") == 3L).get
    assert(d3.getAs[String]("predicted") == "a")
    assert(d3.getAs[Long]("cost_bits") == 2L + 3L)
  }

  test("nbScore smooths unseen tokens and breaks ties to smallest label") {
    // a doc of only OOV tokens: every class costs the same token bits
    // (bin((n_c + V) div 1) identical when classes are symmetric), so the
    // prediction falls to the prior + label tie-break: "a"
    val oov = Seq((9L, "zzz yyy")).toDF("doc_id", "text")
    val out = Classifier.nbScore(oov, Classifier.nbTrain(corpus),
      Classifier.nbPriors(corpus)).head()
    assert(out.getAs[String]("predicted") == "a")
    // n_c = 9, V = 4 → bin(13 div 1) = 4 bits ×2 tokens; prior 2 bits
    assert(out.getAs[Long]("cost_bits") == 2L + 8L)
  }

  test("nbSelfClassifyMargin: margin = runner-up minus best cost, " +
      "non-negative, prediction agrees with nbScore") {
    val margins = Classifier.nbSelfClassifyMargin(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("predicted"), r.getAs[Long]("margin_bits")))
      .toMap
    assert(margins.size == 6)
    assert(margins.values.forall(_._2 >= 0L))
    val pred = Classifier.nbSelfClassify(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted"))
      .toMap
    assert(margins.view.mapValues(_._1).toMap === pred)
    // brute-force doc 3's margin from the full cost relation
    val costs = Classifier.nbCosts(corpus, Classifier.nbTrain(corpus),
        Classifier.nbPriors(corpus)).collect()
      .filter(_.getAs[Long]("sid") == 3L)
      .map(_.getAs[Long]("cost_bits")).sorted
    assert(margins(3L)._2 === costs(1) - costs(0))
  }

  test("q367 reliability diagram: bands conserve the corpus, accuracy " +
      "in [0, 1e6], bands within [0, 8]") {
    val dir = sf("sf0.001")
    val rows = graft.queries.PipelineQueries.defs("q367_nb_reliability")(
      spark, dir).collect()
    val docs = graft.Tables.load(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs)
    assert(rows.forall { r =>
      val b = r.getAs[Long]("band"); b >= 0L && b <= 8L
    })
    assert(rows.forall { r =>
      val a = r.getAs[Long]("accuracy_ppm"); a >= 0L && a <= 1000000L
    })
    assert(rows.forall(r =>
      r.getAs[Long]("n_correct") <= r.getAs[Long]("n_docs")))
  }

  test("priors shift predictions when token evidence is balanced") {
    // identical token distributions, skewed doc counts: the prior decides
    val docs = (Seq((1L, "x", "tok tok")) ++
      (2L to 5L).map(i => (i, "y", "tok tok"))).toDF("doc_id", "source", "text")
    val scored = Classifier.nbScore(Seq((7L, "tok")).toDF("doc_id", "text"),
      Classifier.nbTrain(docs), Classifier.nbPriors(docs)).head()
    // class y: prior bin(5 div 4) = 1 bit beats x's bin(5 div 1) = 3 bits;
    // token bits equal? x: bin((2+1) div 3)=1, y: bin((8+1) div 9)=1 → y
    assert(scored.getAs[String]("predicted") == "y")
  }
}
