package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed, sorted table layout for co-located joins — the 100-TB posture
  * for the pipeline's REPEATED equi-joins (blocking key, entity id, orderkey
  * shapes): pay the partitioning shuffle ONCE at write time, then every
  * downstream join and aggregation on the bucket key plans with NO Exchange
  * on either side (Spark's bucket-join: matching bucket counts + sorted
  * buckets → SortMergeJoin reads buckets pairwise, no shuffle, no re-sort).
  *
  * At 10^12 rows the blocking join shuffles ~the whole table per run; a
  * pipeline that re-joins the same keyed relation more than once (incremental
  * linkage re-scoring, repeated dedup sweeps, entity-id joins against new
  * batches) amortizes that shuffle away by bucketing the stored table. The
  * same layout co-locates the per-block union-find groups
  * ([[graft.operators.ConnectedComponents.runGrouped]]) with zero exchanges.
  *
  * Tables are written through the session catalog (`saveAsTable` — the
  * in-memory catalog works; a real deployment's Hive/Glue/Iceberg catalog
  * records the same bucket spec) with an explicit `path`, so the data lands
  * under the caller's root, not a `spark-warehouse` in the cwd.
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted parquet table. Replaces any existing
    * table/files of the same name (idempotent re-runs). */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    nBuckets: Int, keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "bucketed write needs at least one key column")
    val spark = df.sparkSession
    // saveAsTable(Overwrite) on an existing external table keeps the OLD
    // bucket spec's metadata in some catalogs — drop first for a clean spec
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write.format("parquet").mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** The bucketed table as a DataFrame (bucket metadata attached — joins and
    * aggregations on the bucket keys plan without an Exchange). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
