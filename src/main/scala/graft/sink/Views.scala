package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.types.CanonicalColumn

/** Auxiliary backend objects: conversion views and result-cache views
  * (reference `backend_table.py:402-411, 1775-1792`). Under Spark both are
  * temp views over DataFrames — a conversion view presents the staged table
  * through the final cast projection; a result-cache view pins a computed
  * result for reuse within the session. */
object Views {

  /** View of `df` with the canonical cast projection applied — what the
    * final table WILL look like, queryable before the load runs. */
  def conversionView(spark: SparkSession, df: DataFrame,
                     schema: Seq[CanonicalColumn], name: String): DataFrame = {
    val converted = df.select(StagedLoad.castProjection(schema): _*)
    converted.createOrReplaceTempView(name)
    spark.table(name)
  }

  /** Cache a result and expose it as a view (the result-cache object). */
  def resultCacheView(spark: SparkSession, df: DataFrame, name: String)
      : DataFrame = {
    val cached = df.cache()
    cached.createOrReplaceTempView(name)
    spark.table(name)
  }

  /** Drop a view, releasing the cache entry a [[resultCacheView]] pinned
    * — without the uncache a dropped result-cache view would leak its
    * cached relation for the life of the session. */
  def drop(spark: SparkSession, name: String): Unit = {
    scala.util.Try(spark.catalog.uncacheTable(name))
    spark.catalog.dropTempView(name): Unit
  }
}
