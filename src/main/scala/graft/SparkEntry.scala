package graft

import graft.queries.{Domain, Relational, TextPipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY §2 + training-data
  * pipeline ops); `oracleSql` holds the DuckDB-equivalent SQL for each
  * (omitted only for ops not expressible in portable SQL — those get a
  * rows-only check and a ScalaTest spec instead).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.starJoin(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextPipeline.queries ++ Domain.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextPipeline.oracles ++ Domain.oracles
}
