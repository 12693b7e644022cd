package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact baseline — broadcast the (small) query set
  *    against the full corpus; one shuffle for the per-query top-k. Correct at
  *    any corpus size as long as the QUERY set is broadcast-sized.
  *  - [[ivfTopK]]: the scale path — an IVF-style coarse quantizer: corpus
  *    vectors are assigned to the nearest of k deterministic centroids
  *    (sampled from the corpus by hash), queries probe only their `nprobe`
  *    nearest cells. Search cost drops from O(n) to O(n·nprobe/k) per query
  *    and the join is an equi-join on cell id (hash-partitioned, AQE-skew
  *    splittable) instead of a full cross product.
  */
object Similarity {

  import Dedup.cosine

  /** Exact top-k cosine neighbors for each query id (queries must be a small,
    * broadcastable subset). Output: (query_id, neighbor_id, cos, rank). */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     queryIds: Seq[Long], k: Int = 5): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"))
    val q = corpus.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scoredAll = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qvec"), col("vec")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scoredAll.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** Deterministic centroid sample: the `k` corpus rows with smallest
    * xxhash64(id) (uniform, seedable, no RNG state). The top-k runs
    * distributed (TakeOrderedAndProject); cell numbering happens on the
    * DRIVER over exactly k rows — k is broadcast-sized by definition, and a
    * global `Window.orderBy` here would emit the single-partition WindowExec
    * warning on every bench run for no benefit. */
  def centroids(corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    val vecType = corpus.schema(corpus.schema.fieldIndex(vecCol)).dataType
    val top = corpus
      .select(col(vecCol).as("cvec"), xxhash64(col(idCol)).as("h"))
      .orderBy("h").limit(k).collect()
    val rows = top.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row(i, r.get(0))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("cvec", vecType)))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** IVF-style ANN: assign corpus to nearest centroid cell, probe `nprobe`
    * cells per query. Output schema matches [[bruteForceTopK]]. */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queryIds: Seq[Long], k: Int = 5, nCells: Int = 16, nprobe: Int = 4): DataFrame = {
    val cents = centroids(corpus, idCol, vecCol, nCells)

    // assign each corpus vector to its nearest cell (broadcast centroid join)
    val scoredCells = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"))
      .crossJoin(broadcast(cents))
      .withColumn("d", cosine(col("vec"), col("cvec")))
    val wAssign = Window.partitionBy("neighbor_id").orderBy(col("d").desc, col("cell"))
    val assigned = scoredCells.withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("neighbor_id"), col("vec"), col("cell"))

    // queries probe their nprobe nearest cells
    val q = corpus.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .crossJoin(broadcast(cents))
      .withColumn("d", cosine(col("qvec"), col("cvec")))
    val wProbe = Window.partitionBy("query_id").orderBy(col("d").desc, col("cell"))
    val probes = q.withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qvec"), col("cell"))

    // equi-join on cell: each query scans only its probed cells
    val cand = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qvec"), col("vec")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** All-pairs above a similarity threshold for a broadcastable query set —
    * the filter form of brute force (used by the DuckDB-oracle query, where
    * a threshold is more stable than a rank cut). */
  def thresholdPairs(corpus: DataFrame, idCol: String, vecCol: String,
                     queryIds: Seq[Long], minCos: Double): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"))
    val q = corpus.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qvec"), col("vec")))
      .filter(col("cos") >= minCos)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"))
  }
}
