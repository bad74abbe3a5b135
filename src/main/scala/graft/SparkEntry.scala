package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's operator inventory: one entry per implemented
  * operator from SURVEY.md §2 plus the training-data-pipeline extensions
  * (§7.7), each paired with DuckDB oracle SQL in `oracleSql` (column names
  * aligned between both sides; the driver sorts columns by name and hashes
  * values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full CDC comparison engine (synthesized sides → normalize →
    * full-outer compare → status counts). */
  def entry(spark: SparkSession): DataFrame =
    CdcQueries.cdc01StatusCounts(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ AnalyticQueries.queries ++
      TextQueries.queries ++ DedupQueries.queries ++ SimilarityQueries.queries ++
      PqQueries.queries ++ GraphAnnQueries.queries ++ StreamSearchQueries.queries ++
      CdcQueries.queries ++ LifecycleQueries.queries ++
      MultimodalQueries.queries ++
      PipelineQueries.queries ++ GraphQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ AnalyticQueries.oracles ++
      TextQueries.oracles ++ DedupQueries.oracles ++ SimilarityQueries.oracles ++
      PqQueries.oracles ++ GraphAnnQueries.oracles ++ StreamSearchQueries.oracles ++
      CdcQueries.oracles ++ LifecycleQueries.oracles ++
      MultimodalQueries.oracles ++
      PipelineQueries.oracles ++ GraphQueries.oracles
}
