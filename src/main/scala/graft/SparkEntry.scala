package graft

import graft.queries.{Domain, MediaPipeline, Relational, Retrieval, TextPipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY §2 + training-data
  * pipeline ops); `oracleSql` holds the DuckDB-equivalent SQL for each
  * (omitted only for ops not expressible in portable SQL — those get a
  * rows-only check and a ScalaTest spec instead).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The domain Top-100 refine is the reference's signature
    * computation (E2): latest-bucket join → exact uint256 ranking →
    * rnk ≤ 100, per token. Uses only built-in expressions, so it runs
    * under any session config.
    */
  def entry(spark: SparkSession): DataFrame =
    Domain.top100Domain(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextPipeline.queries ++ Domain.queries ++
      MediaPipeline.queries ++ Retrieval.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextPipeline.oracles ++ Domain.oracles ++
      MediaPipeline.oracles ++ Retrieval.oracles
}
