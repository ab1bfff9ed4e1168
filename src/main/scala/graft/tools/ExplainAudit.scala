package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected queries so
  * pushdown / broadcast / partition-count properties can be reviewed (and
  * regressions spotted) without a cluster run. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q01_pricing_summary", "q02_predicate_dsl",
                         "q04_multi_join", "q27_dedup_jaccard",
                         "q33_cosine_topk", "q53_simhash_pigeonhole",
                         "q55_ivf_batch_probe", "q59_asof_join",
                         "q60_range_join", "q65_dedup_clusters",
                         "q67_dedup_canonical", "q68_interval_join",
                         "q69_zorder", "q70_token_vocab",
                         "q71_quantile_stats")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
