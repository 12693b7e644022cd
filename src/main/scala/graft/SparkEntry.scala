package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §7 and Queries for the catalog. */
object SparkEntry {

  /** Flagship query: the full record-linkage pipeline (synthesize pages →
    * extract → normalize → block → score → cluster → parse) at sf0.001 scale. */
  def entry(spark: SparkSession): DataFrame =
    operators.Linkage.entities(
      sources.Pages.synthesize(spark, 1800L).toDF(),
      operators.StaticParser.broadcastIndex(spark))

  /** One entry per implemented operator family from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.impls

  /** DuckDB-equivalent SQL for the SQL-expressible subset; kernels and
    * synthesized-input pipelines are rows-only checked. */
  def oracleSql: Map[String, String] = Queries.oracles
}
