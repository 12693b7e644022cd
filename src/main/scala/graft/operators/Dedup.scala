package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions

/** Deduplication operators for large-scale training-data pipelines: exact,
  * bag-of-words, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.
  *
  * Scale posture: every variant is blocking-based — candidate pairs only ever
  * form inside hash buckets (LSH bands, SimHash prefixes, cosine LSH bands),
  * so cost is Σ block² not n², and each groupBy/join shuffles on a well-spread
  * key. Every candidate self-join routes through
  * [[Blocking.saltedSelfJoin]], so a hot bucket's quadratic fan-out is capped
  * at O(maxBucket²) per task and the join partitioning is pinned against
  * AQE's amplification-blind coalescing. Candidate JOINS carry only (id, band, bucket) — never the shingle
  * sets or embedding vectors themselves (payload through the banded shuffle
  * is what kills these at 100 TB); verification re-attaches per-id state via
  * skinny equi-joins, and set overlap is counted from the EXPLODED shingle
  * relation (`groupBy(id_a,id_b).count()`), not `array_intersect` on carried
  * arrays. Signatures are pure Catalyst columns (codegen'd); nothing collects
  * to the driver.
  */
object Dedup {

  // Per-id state (shingle sets, signatures) is persisted inside the pair
  // operators because three plan branches read it; the operators return lazy
  // DataFrames, so they cannot know when the caller is done. Persists are
  // therefore TRACKED per session and released by [[releaseCaches]] — the
  // caller-driven cleanup hook (Bench calls it between queries; Verify after
  // each write). Without it, repeated invocations in one long-lived session
  // accumulate cache blocks until LRU eviction. Weak keys would NOT work
  // here: the tracked DataFrames strongly reference their own SparkSession,
  // so a WeakHashMap entry would pin its key forever. Instead, entries whose
  // context has stopped are purged on every touch (a stopped context has
  // already dropped its cache blocks — only the bookkeeping needs freeing).
  private val tracked =
    new java.util.HashMap[org.apache.spark.sql.SparkSession,
      java.util.ArrayDeque[DataFrame]]()

  private def purgeStopped(): Unit =
    tracked.keySet().removeIf(s => s.sparkContext.isStopped)

  private[graft] def trackPersist(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked.synchronized {
      purgeStopped()
      tracked.computeIfAbsent(df.sparkSession,
        _ => new java.util.ArrayDeque[DataFrame]()).add(p)
    }
    p
  }

  /** Unpersist every intermediate this session's dedup calls pinned. Safe to
    * call once the returned DataFrames have been materialized (a later action
    * would recompute, not fail). */
  def releaseCaches(spark: org.apache.spark.sql.SparkSession): Unit = {
    val q = tracked.synchronized { purgeStopped(); Option(tracked.remove(spark)) }
    q.foreach(_.forEach(df => df.unpersist(false)))
  }

  /** Heavy per-row signature work must not inherit a single-file scan's
    * partitioning (one parquet file = one partition = one core). Spread to
    * the cluster's default parallelism before computing signatures; the
    * shuffle moves only (id, text) and is trivially repaid. (Unconditional —
    * checking `rdd.getNumPartitions` first would instantiate the physical
    * plan twice.)
    *
    * HASH partitioning on the unique id, not keyless round-robin: a keyless
    * `repartition(n)` first locally SORTS its input rows so retried map
    * tasks reproduce the same row-to-partition assignment
    * (`spark.sql.execution.sortBeforeRepartition`, SPARK-23207) — a
    * payload-row sort per task that at corpus scale is pure overhead.
    * Hashing the id is deterministic without any sort, and ids are unique
    * by contract, so the spread is collision-uniform. Every caller
    * pre-projects to (`id`, payload). */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col("id"))

  // ------------------------------ exact ------------------------------------

  /** Exact dedup: representative = min id per content hash, as ONE window
    * pass (`min over (partition by hash)` — the same shape as the DuckDB
    * oracle). The former groupBy+self-join formulation scanned the input
    * twice and paid an aggregate exchange PLUS a join; at corpus scale the
    * reps relation is itself corpus-sized (one row per distinct hash), so
    * the join was a second full shuffle, not a broadcast. One hash exchange
    * + sort replaces both. Output: one row per input row with its cluster
    * representative (min id). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = md5(col(textCol))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("content_hash"))
    df.select(col(idCol), h.as("content_hash"))
      .select(col(idCol), col("content_hash"), min(col(idCol)).over(w).as("rep_id"))
  }

  /** Bag-of-words dedup: identical sorted-distinct token set ⇒ duplicate
    * (whitespace/ordering-insensitive exact dedup). Key built by the native
    * one-scan [[graft.functions.BowKeyExpr]] (the array_sort∘array_distinct∘
    * filter∘split chain ran interpreted, and the join formulation evaluated
    * it up to four times per row — plans/r07/q_dedup_bow_before.txt); same
    * single-window shape as [[exact]]. */
  def bagOfWords(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val key = md5(graft.functions.TextNativeUtil.bowKeyCol(col(textCol)))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("bow_hash"))
    df.select(col(idCol), key.as("bow_hash"))
      .select(col(idCol), col("bow_hash"), min(col(idCol)).over(w).as("rep_id"))
  }

  /** The join formulation [[bagOfWords]] replaced — equality witness only
    * (also witnesses the HOF bow key against [[graft.functions.BowKeyExpr]]). */
  private[graft] def bagOfWordsColumns(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val key = md5(array_join(array_sort(array_distinct(TextFunctions.tokens(col(textCol)))), " "))
    val withH = df.select(col(idCol), key.as("bow_hash"))
    val reps = withH.groupBy("bow_hash").agg(min(col(idCol)).as("rep_id"))
    withH.join(reps, "bow_hash").select(col(idCol), col("bow_hash"), col("rep_id"))
  }

  // --------------------- shared Jaccard verification -----------------------

  /** [[verifiedJaccard]] for candidates that ALREADY carry (nsh_a, nsh_b) and
    * a threshold known to be > 0: the intersection count groups by the pair
    * WITH its sizes, so jaccard falls out of the aggregate directly — no
    * size re-joins and no LeftOuter attach of the intersection back onto the
    * candidates (three joins fewer than [[verifiedJaccard]]; at corpus scale
    * the LeftOuter was a second candidate-set-sized sort-merge). Zero-overlap
    * pairs simply don't reach the aggregate — under `threshold > 0` they
    * could never pass the filter, EXCEPT the both-empty pair (jaccard 1.0 by
    * the both-empty rule), which is re-added from the size columns alone.
    * Callers must filter `jaccard >= threshold` with threshold > 0 (the pair
    * operators' contract; a 0 threshold would need every candidate row).
    *
    * `includeBothEmpty = false` additionally asserts the caller feeds only
    * non-empty sets (the PPJoin path filters `nsh > 0` upstream): the
    * both-empty union branch would re-execute the candidate subtree just to
    * produce zero rows. When true, the two branches reference the candidate
    * frame twice — their common exchange subtrees are deduplicated by
    * ReuseExchange (same two-reference shape as the join formulation). */
  private[graft] def verifiedJaccardSized(candWithSizes: DataFrame, sets: DataFrame,
                                          includeBothEmpty: Boolean): DataFrame = {
    val expl = sets.select(col("id"), explode(col("sh")).as("shingle"))
    val base = candWithSizes.select("id_a", "id_b", "nsh_a", "nsh_b")
    val inter = base
      .join(expl.select(col("id").as("id_a"), col("shingle")), Seq("id_a"))
      .join(expl.select(col("id").as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b", "nsh_a", "nsh_b").agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter") * lit(1.0) / (col("nsh_a") + col("nsh_b") - col("inter")))
    if (!includeBothEmpty) inter
    else inter.unionByName(
      base.filter(col("nsh_a") + col("nsh_b") === 0)
        .withColumn("inter", lit(0L)).withColumn("jaccard", lit(1.0)))
  }

  /** Exact Jaccard for candidate pairs WITHOUT carrying shingle arrays:
    * |a∩b| is counted from the exploded (id, shingle) relation — candidates
    * fan out to their left-side shingles, an equi-join on (id_b, shingle)
    * keeps the shared ones, and `groupBy(id_a,id_b).count()` is the exact
    * intersection size (arrays are distinct). Jaccard follows from scalars:
    * inter / (nsh_a + nsh_b − inter). Used by the incremental steps (their
    * candidate frames are id-only); the full pair operators use
    * [[verifiedJaccardSized]].
    *
    * @param cand candidate pairs (id_a, id_b), already deduplicated
    * @param sets per-id state (id, sh: array<string>, nsh: int) */
  private[graft] def verifiedJaccard(cand: DataFrame, sets: DataFrame): DataFrame = {
    val expl = sets.select(col("id"), explode(col("sh")).as("shingle"))
    val inter = cand.select("id_a", "id_b")
      .join(expl.select(col("id").as("id_a"), col("shingle")), Seq("id_a"))
      .join(expl.select(col("id").as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    val sizes = sets.select(col("id"), col("nsh"))
    cand
      .join(sizes.select(col("id").as("id_a"), col("nsh").as("nsh_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("nsh").as("nsh_b")), "id_b")
      .join(inter, Seq("id_a", "id_b"), "left")
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .withColumn("jaccard",
        when(col("nsh_a") + col("nsh_b") === 0, 1.0) // both empty ⇒ identical
          .otherwise(col("inter") * lit(1.0)
            / (col("nsh_a") + col("nsh_b") - col("inter"))))
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
    graft.functions.MinHashUtil.minhashSig(safe, numHashes)
  }

  /** The pure-Column formulation [[minhashSignature]] replaced: 64 interpreted
    * higher-order `transform` traversals per row, each re-hashing every
    * shingle's bytes. Kept ONLY as the independent witness for the native
    * expression's equality property test (DedupSpec) — never call it in a
    * pipeline. */
  private[graft] def minhashSignatureColumns(shingleCol: Column, numHashes: Int): Column = {
    val safe = when(size(shingleCol) === 0, array(lit(""))).otherwise(shingleCol)
    array((0 until numHashes).map { i =>
      array_min(transform(safe, s => hash(s, lit(i)).cast("long")))
    }: _*)
  }

  /** Per-id shingle state (id, sh: array<string>, nsh: int) — the shared
    * input of the MinHash signature branch, the size branch, and the exploded
    * verification branch. Exposed package-private so the incremental dedup
    * operator builds byte-identical state for its equality guarantee. */
  private[graft] def shingleSets(df: DataFrame, idCol: String, textCol: String,
                                 shingleN: Int): DataFrame =
    spread(df.select(col(idCol).as("id"), col(textCol).as("text")))
      .select(col("id"), array_distinct(TextFunctions.shingles(col("text"), shingleN)).as("sh"))
      .withColumn("nsh", size(col("sh")))

  /** LSH band relation (id, band, bucket) from shingle state: bucket = hash
    * of the band's signature slice. ONLY these three scalar columns ever
    * enter a self-join — no array payload. Shared with the incremental
    * operator (same expressions ⇒ same buckets ⇒ equality by construction). */
  private[graft] def minhashBanded(sets: DataFrame, numHashes: Int,
                                   bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    sets
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
  }

  /** MinHash + LSH banding: signatures split into `bands` bands of
    * `numHashes/bands` rows; docs sharing any band bucket become candidate
    * pairs; candidates are verified with exact shingle-set Jaccard
    * (co-occurrence counted, arrays never shuffled) and kept at `threshold`.
    * Returns verified near-duplicate pairs (id_a < id_b, jaccard).
    *
    * The banded self-join runs through [[Blocking.saltedSelfJoin]]: a hot
    * band bucket (a boilerplate duplicate family sharing one signature slice)
    * otherwise concentrates its quadratic candidate fan-out in ONE task —
    * `maxBucket` bounds every task at O(maxBucket²) pairs. */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
                   threshold: Double = 0.7, maxBucket: Int = 1000): DataFrame = {
    // per-id shingle state, computed once and reused by three branches
    val sets = trackPersist(shingleSets(df, idCol, textCol, shingleN))

    // PERSISTED (skinny: 16 × (id, int, int) rows/doc) because the salted
    // self-join's driver-side hot-key probe plus its two join sides would
    // otherwise re-run the signature computation per consumer.
    val banded = trackPersist(minhashBanded(sets, numHashes, bands))

    val cand = Blocking.saltedSelfJoin(banded, Seq("band", "bucket"), "id",
        Seq.empty, maxBucket)
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b") // same pair may collide in several bands

    // sizes attach once here; the verification aggregate then carries them
    // (verifiedJaccardSized needs threshold > 0 — see its scaladoc)
    require(threshold > 0, "minhashPairs: threshold must be > 0")
    val sizes = sets.select(col("id"), col("nsh"))
    // NOT persisted: the intersection and both-empty branches reference this
    // frame twice, but their common exchange subtrees are deduplicated by
    // ReuseExchange (the old join formulation had the same two-reference
    // shape), and a persist here would hide the banded join behind an
    // InMemoryRelation (breaking the PlanSpec payload audit) for no win
    val candSized = cand
      .join(sizes.select(col("id").as("id_a"), col("nsh").as("nsh_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("nsh").as("nsh_b")), "id_b")
    verifiedJaccardSized(candSized, sets, includeBothEmpty = true)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Near-dup pairs → connected components → one (id, cluster) row per input
    * row; singletons cluster with themselves. Shared tail of every
    * `*Clusters` operator. */
  private def clustersFromPairs(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comps = ConnectedComponents.run(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
    df.select(col(idCol).as("id"))
      .join(comps, Seq("id"), "left")
      .withColumn("cluster", coalesce(col("component"), col("id")))
      .select("id", "cluster")
  }

  /** MinHash dedup to clusters: LSH pairs → connected components → rep ids. */
  def minhashClusters(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.7): DataFrame =
    clustersFromPairs(df, idCol, minhashPairs(df, idCol, textCol, threshold = threshold))

  /** SimHash dedup to clusters (pairs within `maxHamming` merge). */
  def simhashClusters(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame =
    clustersFromPairs(df, idCol, simhashPairs(df, idCol, textCol, maxHamming))

  /** n-gram Jaccard dedup to clusters. */
  def ngramJaccardClusters(df: DataFrame, idCol: String, textCol: String,
                           n: Int = 3, threshold: Double = 0.5): DataFrame =
    clustersFromPairs(df, idCol, ngramJaccardPairs(df, idCol, textCol, n, threshold))

  /** Embedding-cosine dedup to clusters. */
  def embeddingClusters(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double = 0.95): DataFrame =
    clustersFromPairs(df, idCol, embeddingPairs(df, idCol, vecCol, threshold = threshold))

  // ------------------------------ SimHash ----------------------------------

  /** 64-bit SimHash of the distinct token set: per-bit weighted vote of
    * token xxhash64 values, as the native codegen'd expression
    * [[graft.functions.SimHash64]] (the pure-Column HOF formulation runs
    * interpreted and was ~40× slower). */
  def simhash(textCol: Column): Column =
    graft.functions.SimHashUtil.simhash64(textCol)

  /** SimHash band rows (id, sim, band, bucket) — 4×16-bit bands of the 64-bit
    * signature; the 8-byte `sim` rides along so verification needs no re-join.
    * Shared by [[simhashPairs]] and the incremental form
    * ([[graft.streaming.IncrementalDedup.simhashStep]]) so the two can never
    * band differently. */
  private[graft] def simhashBanded(df: DataFrame, idCol: String,
                                   textCol: String): DataFrame = {
    val withSim = spread(df.select(col(idCol).as("id"), col(textCol).as("text")))
      .select(col("id"), simhash(col("text")).as("sim"))
    withSim.select(col("id"), col("sim"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("sim"), b * 16).bitwiseAND(0xffffL))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
  }

  /** Candidate generation + Hamming verification over prepared band rows
    * (the shared tail of the full and incremental SimHash operators).
    *
    * The Hamming filter runs BEFORE the pair dropDuplicates: hamming is a
    * pure function of the pair (every band collision of (id_a, id_b) carries
    * the same two sim values), so the two orders are row-identical — and
    * filtering first means the dedup exchange shuffles only the matching
    * pairs instead of every banded collision (at corpus scale the collision
    * set is the dominant relation here; measured 1.19 → 0.93 s at sf0.1). */
  private[graft] def simhashPairsFromBanded(banded: DataFrame, maxHamming: Int,
                                            maxBucket: Int): DataFrame =
    Blocking.saltedSelfJoin(banded, Seq("band", "bucket"), "id", Seq("sim"), maxBucket)
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")

  /** SimHash near-dup pairs: block on 16-bit prefix bands (4 bands ⇒ any pair
    * within Hamming distance 3 shares at least one identical band), verify
    * exact Hamming distance ≤ maxHamming. The banded self-join is skew-salted
    * ([[Blocking.saltedSelfJoin]]); the 8-byte `sim` rides as payload —
    * verification is a per-row xor/popcount, no re-join needed. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    // persisted: the salted join's hot probe + both sides would otherwise
    // re-hash every document per consumer (skinny 4-rows/doc relation)
    val banded = trackPersist(simhashBanded(df, idCol, textCol))
    simhashPairsFromBanded(banded, maxHamming, maxBucket)
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
    * all-pairs there).
    *
    * Beyond the prefix filter this applies the two standard PPJoin prunes
    * BEFORE verification: the size filter (min/max ≥ t) and the POSITIONAL
    * filter — for the first shared prefix shingle at in-doc ranks (ra, rb),
    * overlap ≤ 1 + min(nsh_a − ra, nsh_b − rb), which must reach
    * α = ⌈t/(1+t)·(nsh_a+nsh_b)⌉ (the overlap equivalent of Jaccard ≥ t);
    * ranks follow one global order, so the globally-first shared shingle
    * minimizes BOTH ranks — min(ra)/min(rb) come from the same row and the
    * bound is sound. Verification then counts the exact intersection from
    * the exploded relation (no arrays through any shuffle — round-1's
    * carry-both-arrays + array_intersect plan was 35% of the whole bench). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.5,
                        maxBucket: Int = 1000): DataFrame = {
    val sets = trackPersist(
      shingleSets(df, idCol, textCol, n).filter(col("nsh") > 0))

    // global shingle frequency → total order (freq asc, shingle asc)
    val exploded = sets.select(col("id"), col("nsh"), explode(col("sh")).as("shingle"))
    val freq = exploded.groupBy("shingle").agg(count(lit(1)).as("f"))

    // rank shingles within each doc by (f, shingle); keep the prefix.
    // PERSISTED: the prefix relation (freq join + rank window) is the most
    // expensive subtree here and feeds the salted join's hot probe plus both
    // join sides — recomputing it per consumer tripled the query.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("f"), col("shingle"))
    val prefix = trackPersist(exploded.join(freq, "shingle")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("nsh") - ceil(col("nsh") * threshold) + 1)
      .select(col("shingle"), col("id"), col("nsh"), col("rk")))

    // candidates keep (nsh_a, nsh_b) — already grouped by them for the size/
    // positional prunes — so verification needs no size re-join at all
    require(threshold > 0, "ngramJaccardPairs: threshold must be > 0")
    val cand = ppjoinCandidates(prefix, threshold, maxBucket, keepSizes = true)

    // includeBothEmpty = false: sets is filtered to nsh > 0 above
    verifiedJaccardSized(cand, sets, includeBothEmpty = false)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** PPJoin candidate tail shared by the frequency-ordered full operator and
    * the hash-ordered incremental one: docs sharing any prefix shingle, with
    * the size + positional prunes applied before verification. Both prunes
    * are sound under ANY fixed total order — ranks follow one global order,
    * so the globally-first shared prefix shingle minimizes BOTH ranks and
    * min(ra)/min(rb) come from the same row.
    *
    * The prefix self-join is skew-salted ([[Blocking.saltedSelfJoin]]):
    * frequency-ordered prefixes are the RAREST shingles so hot keys are
    * unlikely by design (hash-ordered prefixes lack even that bias), but an
    * adversarial corpus (one boilerplate phrase in every document's prefix)
    * would otherwise put that shingle's whole quadratic fan-out in one task —
    * and the explicit repartition pin inside saltedSelfJoin also protects
    * this join from AQE's amplification-blind coalescing (the documented
    * 207-s-on-1-task failure mode).
    *
    * @param prefix prefix rows (shingle, id, nsh, rk) ranked under ONE fixed
    *               global shingle order */
  private[graft] def ppjoinCandidates(prefix: DataFrame, threshold: Double,
                                      maxBucket: Int,
                                      keepSizes: Boolean = false): DataFrame = {
    val alpha = ceil(lit(threshold) / (1 + threshold) * (col("nsh_a") + col("nsh_b")))
    val pruned = Blocking.saltedSelfJoin(prefix, Seq("shingle"), "id",
        Seq("nsh", "rk"), maxBucket)
      .groupBy(col("id_a"), col("id_b"), col("nsh_a"), col("nsh_b"))
      .agg(min(col("rk_a")).as("ra"), min(col("rk_b")).as("rb"))
      .filter(least(col("nsh_a"), col("nsh_b")) * lit(1.0)
        / greatest(col("nsh_a"), col("nsh_b")) >= threshold)
      .filter(lit(1) + least(col("nsh_a") - col("ra"), col("nsh_b") - col("rb")) >= alpha)
    // keepSizes feeds [[verifiedJaccardSized]] (no size re-join); the
    // id-only shape stays the incremental operator's interface
    if (keepSizes) pruned.select("id_a", "id_b", "nsh_a", "nsh_b")
    else pruned.select("id_a", "id_b")
  }

  /** Prefix rows under the CONTENT-HASH total order (xxhash64 asc, shingle
    * asc as the collision tie-break): each document's ranked shingle list —
    * hence its prefix — is a pure function of the document alone, never of
    * the corpus. That order stability is what makes an EXACT incremental
    * PPJoin possible ([[graft.streaming.IncrementalDedup.ngramStep]]): the
    * prefix-filter completeness lemma holds for ANY fixed total order;
    * frequency ordering is only the pruning heuristic that makes prefixes
    * the rarest shingles. The price is pruning quality — hash order scatters
    * prefixes uniformly instead of picking rare shingles, so candidate
    * volume rises on skew-frequency corpora; the skew-salted self-join still
    * bounds every task at O(maxBucket²), and exact verification keeps the
    * output identical either way.
    *
    * Unlike the frequency path this needs NO corpus aggregate, NO join and
    * NO rank window: the order is computed inside the row (sort the shingle
    * array by hash, slice the prefix, posexplode) — the whole relation is a
    * shuffle-free projection of the sets state. */
  private[graft] def hashOrderedPrefix(sets: DataFrame, threshold: Double): DataFrame = {
    val sorted = transform(
      array_sort(transform(col("sh"), s => struct(xxhash64(s).as("h"), s.as("s")))),
      x => x.getField("s"))
    val plen = (col("nsh") - ceil(col("nsh") * threshold) + 1).cast("int")
    sets.select(col("id"), col("nsh"), posexplode(slice(sorted, lit(1), plen)))
      .select(col("col").as("shingle"), col("id"), col("nsh"),
        (col("pos") + 1).cast("int").as("rk"))
  }

  // ------------------------- embedding cosine ------------------------------

  /** Cosine similarity of two float-array columns — native codegen'd
    * expression ([[graft.functions.CosineSim]]): one fused loop per pair
    * instead of three interpreted zip_with/aggregate folds. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSim.cosineSim(a, b)

  /** The HOF formulation [[cosine]] replaced — kept ONLY as the independent
    * witness for the native expression's equality property test
    * (PipelineOpsSpec); never call it in a pipeline. */
  private[graft] def cosineColumns(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (u, v) => u * v), lit(0.0d), (acc, p) => acc + p)
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))
  }

  /** Random-hyperplane signature: bit p of the result is the sign of the
    * projection of `v` onto deterministic hyperplane p (plane weights are
    * ±1 from a hash of (plane, dim) — no RNG state, reproducible anywhere).
    * Native codegen'd expression; see [[graft.functions.HyperplaneSig]]. */
  def hyperplaneSignature(v: Column, planes: Int): Column =
    graft.functions.HyperplaneUtil.hyperplaneSig(v, planes)

  /** The nested-HOF formulation [[hyperplaneSignature]] replaced — kept ONLY
    * as the independent witness for the native expression's equality property
    * test (PipelineOpsSpec); never call it in a pipeline. */
  private[graft] def hyperplaneSignatureColumns(v: Column, planes: Int): Column =
    aggregate(
      sequence(lit(0), lit(planes - 1)), lit(0L),
      (acc, p) => {
        val proj = aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1),
            (x, d) => x * when(hash(p, d).bitwiseAND(1) === 1, 1.0).otherwise(-1.0)),
          lit(0.0d), (a2, x) => a2 + x)
        acc.bitwiseOR(when(proj > 0, call_function("shiftleft", lit(1L), p)).otherwise(0L))
      })

  /** Embedding near-dup pairs via BANDED random-hyperplane LSH + exact cosine
    * verification.
    *
    * Banding matters for recall: requiring all `planes` bits equal (round-1
    * design) has collision probability (1−θ/π)^planes — ≈0.58 at cos 0.99 and
    * ≈0.28 at cos 0.95 with 12 planes. With `bands` independent bands of
    * `planes/bands` bits, a pair is a candidate when ANY band matches:
    * 1−(1−p^6)^4 ≈ 0.997 at cos 0.99 and ≈0.95 at cos 0.95 (24 planes,
    * 4×6 default). Exact cosine on the candidates keeps precision exact.
    * The banded self-join carries only (id, band, bucket); vectors are
    * re-attached to the deduplicated pairs by id. */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
                     planes: Int = 24, bands: Int = 4,
                     threshold: Double = 0.95, maxBucket: Int = 1000): DataFrame = {
    val withSig = trackPersist(embedSigs(df, idCol, vecCol, planes))

    // Banded is persisted for the same probe/branch-reuse reason as the
    // MinHash path (withSig is already cached; this additionally skips
    // re-exploding).
    val banded = trackPersist(embedBanded(withSig, planes, bands))
    val cand = embedCandidates(banded, maxBucket)
    embedVerify(cand, withSig.select(col("id"), col("vec")), threshold)
  }

  /** Per-doc embedding state (id, vec, sig) — the hyperplane signature input
    * to banding. Shared with the incremental form so signatures can never
    * diverge. */
  private[graft] def embedSigs(df: DataFrame, idCol: String, vecCol: String,
                               planes: Int): DataFrame =
    spread(df.select(col(idCol).as("id"), col(vecCol).as("vec")))
      .select(col("id"), col("vec"), hyperplaneSignature(col("vec"), planes).as("sig"))

  /** Hyperplane-LSH band rows (id, band, bucket) from signed projections. */
  private[graft] def embedBanded(withSig: DataFrame, planes: Int,
                                 bands: Int): DataFrame = {
    require(planes % bands == 0, "planes must be divisible by bands")
    val bits = planes / bands
    val mask = (1L << bits) - 1
    withSig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => call_function("shiftright", col("sig"), b * bits).bitwiseAND(mask))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
  }

  /** Skew-salted banded self-join → deduplicated candidate id pairs: an
    * embedding duplicate family shares all band buckets, so without salting
    * one bucket would hold the family's entire quadratic candidate fan-out
    * in a single task. */
  private[graft] def embedCandidates(banded: DataFrame, maxBucket: Int): DataFrame =
    Blocking.saltedSelfJoin(banded, Seq("band", "bucket"), "id", Seq.empty, maxBucket)
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")

  /** Exact-cosine verification: vectors re-attach to the deduplicated pairs
    * by skinny equi-joins (never through the banded shuffle). */
  private[graft] def embedVerify(cand: DataFrame, vecs: DataFrame,
                                 threshold: Double): DataFrame =
    cand
      .join(vecs.select(col("id").as("id_a"), col("vec").as("vec_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vec_b")), "id_b")
      .select(col("id_a"), col("id_b"), cosine(col("vec_a"), col("vec_b")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
}
