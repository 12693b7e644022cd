package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication operators for large-scale training-data pipelines: exact,
  * bag-of-words, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.
  *
  * Scale posture: every variant is blocking-based — candidate pairs only ever
  * form inside hash buckets (LSH bands, SimHash prefixes, cosine LSH bits), so
  * cost is Σ block² not n², and each groupBy/join shuffles on a well-spread
  * key. Signatures are pure Catalyst columns (codegen'd); nothing collects to
  * the driver.
  */
object Dedup {

  /** Heavy per-row signature work must not inherit a single-file scan's
    * partitioning (one parquet file = one partition = one core). Spread to
    * the cluster's default parallelism before computing signatures; the
    * shuffle moves only (id, text) and is trivially repaid. */
  private def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  // ------------------------------ exact ------------------------------------

  /** Exact dedup: hash-groupBy on the raw text. Output: one row per input row
    * with its cluster representative (min id). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = md5(col(textCol))
    val withH = df.select(col(idCol), h.as("content_hash"))
    val reps = withH.groupBy("content_hash").agg(min(col(idCol)).as("rep_id"))
    withH.join(reps, "content_hash").select(col(idCol), col("content_hash"), col("rep_id"))
  }

  /** Bag-of-words dedup: identical sorted-distinct token multiset ⇒ duplicate
    * (whitespace/ordering-insensitive exact dedup). */
  def bagOfWords(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val key = md5(array_join(array_sort(array_distinct(TextFunctions.tokens(col(textCol)))), " "))
    val withH = df.select(col(idCol), key.as("bow_hash"))
    val reps = withH.groupBy("bow_hash").agg(min(col(idCol)).as("rep_id"))
    withH.join(reps, "bow_hash").select(col(idCol), col("bow_hash"), col("rep_id"))
  }

  // ------------------------------ MinHash ----------------------------------

  /** MinHash signature from an ALREADY MATERIALIZED shingle-array column:
    * `numHashes` permutations approximated by seeded murmur3 (standard
    * one-hash-function-per-permutation construction).
    *
    * Taking the shingle column (an attribute reference) instead of the text
    * matters: embedding the shingle-construction subtree here would
    * re-evaluate it once per hash function per row (64× the tokenize/slice
    * work — measured 140 s vs ~4 s on the sf0.1 corpus). */
  def minhashSignature(shingleCol: Column, numHashes: Int = 64): Column = {
    val safe = when(size(shingleCol) === 0, array(lit(""))).otherwise(shingleCol)
    array((0 until numHashes).map { i =>
      array_min(transform(safe, s => hash(s, lit(i)).cast("long")))
    }: _*)
  }

  /** MinHash + LSH banding: signatures split into `bands` bands of
    * `numHashes/bands` rows; docs sharing any band bucket become candidate
    * pairs; candidates are verified with exact shingle-set Jaccard and kept
    * at `threshold`. Returns verified near-duplicate pairs
    * (id_a < id_b, jaccard). */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
                   threshold: Double = 0.7): DataFrame = {
    val rowsPerBand = numHashes / bands
    val withSig = spread(df.select(col(idCol).as("id"), col(textCol).as("text")))
      .withColumn("sh", array_distinct(TextFunctions.shingles(col("text"), shingleN)))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

    // one row per (band, bucket): bucket = hash of the band's slice
    val banded = withSig.select(
      col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")

    val pairs = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.sh").as("sh_a"), col("r.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b") // same pair may collide in several bands

    pairs
      .withColumn("jaccard",
        when(size(col("sh_a")) === 0 && size(col("sh_b")) === 0, 1.0)
          .otherwise(size(array_intersect(col("sh_a"), col("sh_b"))) * lit(1.0)
            / size(array_union(col("sh_a"), col("sh_b")))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash dedup to clusters: LSH pairs → connected components → rep ids. */
  def minhashClusters(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.7): DataFrame = {
    val pairs = minhashPairs(df, idCol, textCol, threshold = threshold)
    val comps = ConnectedComponents.run(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
    df.select(col(idCol).as("id"))
      .join(comps, Seq("id"), "left")
      .withColumn("cluster", coalesce(col("component"), col("id")))
      .select("id", "cluster")
  }

  // ------------------------------ SimHash ----------------------------------

  /** 64-bit SimHash of the distinct token set: per-bit weighted vote of
    * token xxhash64 values, as the native codegen'd expression
    * [[graft.functions.SimHash64]] (the pure-Column HOF formulation runs
    * interpreted and was ~40× slower). */
  def simhash(textCol: Column): Column =
    graft.functions.SimHashUtil.simhash64(textCol)

  /** SimHash near-dup pairs: block on 16-bit prefix bands (4 bands ⇒ any pair
    * within Hamming distance 3 shares at least one identical band), verify
    * exact Hamming distance ≤ maxHamming. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val withSim = spread(df.select(col(idCol).as("id"), col(textCol).as("text")))
      .select(col("id"), simhash(col("text")).as("sim"))
    val banded = withSim.select(col("id"), col("sim"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("sim"), b * 16).bitwiseAND(0xffffL))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val hamming = bit_count(col("l.sim").bitwiseXOR(col("r.sim")))
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        hamming.as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  // --------------------------- n-gram Jaccard ------------------------------

  /** Exact n-gram Jaccard similarity join via PREFIX FILTERING (PPJoin-style;
    * see the set-similarity-join literature in PAPERS.md).
    *
    * A pair with Jaccard ≥ t must share at least one shingle among either
    * side's prefix of size `|x| - ceil(t·|x|) + 1` when shingles are sorted
    * in a global order. Ordering by ascending corpus frequency makes prefixes
    * the RAREST shingles, so candidate buckets stay tiny even when every
    * document has the same length (a length-bucket scheme degenerates to
    * all-pairs there). Cost: one frequency aggregate + an equi-join on
    * prefix-shingle — no quadratic block anywhere. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val withSh = spread(df.select(col(idCol).as("id"), col(textCol).as("text")))
      .select(col("id"), array_distinct(TextFunctions.shingles(col("text"), n)).as("sh"))
      .withColumn("nsh", size(col("sh")))
      .filter(col("nsh") > 0)

    // global shingle frequency → total order (freq asc, shingle asc)
    val exploded = withSh.select(col("id"), col("nsh"), explode(col("sh")).as("shingle"))
    val freq = exploded.groupBy("shingle").agg(count(lit(1)).as("f"))

    // rank shingles within each doc by (f, shingle); keep the prefix
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("f"), col("shingle"))
    val prefix = exploded.join(freq, "shingle")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("nsh") - ceil(col("nsh") * threshold) + 1)
      .select(col("shingle"), col("id"))

    // candidates: docs sharing any prefix shingle (+ size-ratio prefilter)
    val cand = prefix.as("l").join(prefix.as("r"),
        col("l.shingle") === col("r.shingle") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    val sets = withSh.select(col("id"), col("sh"), col("nsh"))
    cand
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a"), col("nsh").as("nsh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b"), col("nsh").as("nsh_b")), "id_b")
      .filter(least(col("nsh_a"), col("nsh_b")) * lit(1.0)
        / greatest(col("nsh_a"), col("nsh_b")) >= threshold)
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))) * lit(1.0)
          / size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ------------------------- embedding cosine ------------------------------

  /** Cosine similarity of two float-array columns, computed in Catalyst
    * (zip_with multiply + aggregate sum — codegen'd, no UDF). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (u, v) => u * v), lit(0.0d), (acc, p) => acc + p)
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))
  }

  /** Embedding near-dup pairs via random-hyperplane LSH blocking + exact
    * cosine verification. Hyperplanes are derived deterministically from the
    * dimension index (no random state): plane p weight for dim d =
    * sign pattern of a hash. */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
                     planes: Int = 12, threshold: Double = 0.95): DataFrame = {
    val v = col("vec")
    // bit p = (Σ_d sign(hash(p,d)) * v[d]) > 0  — deterministic hyperplane
    val sig = aggregate(
      sequence(lit(0), lit(planes - 1)), lit(0L),
      (acc, p) => {
        val proj = aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1),
            (x, d) => x * when(hash(p, d).bitwiseAND(1) === 1, 1.0).otherwise(-1.0)),
          lit(0.0d), (a2, x) => a2 + x)
        acc.bitwiseOR(when(proj > 0, call_function("shiftleft", lit(1L), p)).otherwise(0L))
      })
    val withSig = spread(df.select(col(idCol).as("id"), col(vecCol).as("vec")))
      .select(col("id"), col("vec"), sig.as("bucket"))
    withSig.as("l").join(withSig.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        cosine(col("l.vec"), col("r.vec")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }
}
