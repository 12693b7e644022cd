package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Blocking, Dedup}
import graft.plans.StateFs

/** Incremental MinHash near-duplicate detection over batches of documents:
  * each batch computes band signatures for the NEW documents only and forms
  * candidate pairs only inside the buckets the batch touches — the operator a
  * continuously-fed training-data pipeline needs, where re-pairing the full
  * corpus's bands every batch is O(corpus) work for an O(batch) change.
  *
  * Scale rationale (the [[IncrementalLinkage]] touched-block pattern applied
  * to banded LSH state): per-batch COMPUTE is bounded by Σ(touched bucket)²
  * — via [[Blocking.saltedSelfJoin]] each task further capped at
  * O(maxBucket²) — independent of the accumulated corpus size; untouched
  * buckets cost one left-semi key probe, no payload ever re-shuffles.
  * Unlike linkage blocks (re-SCORED on every touch, needing a last-touch
  * merge), dedup state is APPEND-ONLY: documents are immutable, so a pair's
  * jaccard never changes and each unordered pair is emitted exactly once —
  * by the batch that brings the LATER of its two documents. Persisting this
  * state with the IncrementalLinkage delta layout is therefore strictly
  * simpler: per batch write only (new sets, new banded, fresh pairs) deltas
  * and reconstruct by plain union — no supersede logic needed.
  *
  * Equality guarantee (IncrementalDedupSpec): after any batch split of a
  * corpus, `state.pairs` is row-identical to [[Dedup.minhashPairs]] on the
  * full corpus — signatures/buckets come from the same shared expressions
  * ([[Dedup.shingleSets]]/[[Dedup.minhashBanded]]), candidates inside a
  * touched bucket see every accumulated member, and verification reads the
  * same per-doc shingle state.
  *
  * Precondition: batches carry DISJOINT document ids (append-only corpus; a
  * re-delivered id would duplicate its band rows and re-emit its pairs).
  */
object IncrementalDedup {

  /** Accumulated dedup state:
    *  - `sets`   (id, sh: array&lt;string&gt;, nsh: int) — per-doc shingle
    *    state, the verification input;
    *  - `banded` (id, band: int, bucket: int) — LSH band membership, the
    *    candidate generator;
    *  - `pairs`  (id_a, id_b, jaccard) — verified near-dup pairs, append-only.
    */
  case class State(sets: DataFrame, banded: DataFrame, pairs: DataFrame)

  case class Step(state: State, touchedBuckets: Long, pairsAdded: Long)

  /** One batch's increment alone (what the streaming driver persists):
    * the batch's shingle sets, band rows, and freshly verified pairs. */
  case class Delta(sets: DataFrame, banded: DataFrame, pairs: DataFrame,
                   touchedBuckets: Long, pairsAdded: Long)

  /** Empty state with schemas derived from `like` (any frame with the id and
    * text columns — typically the first batch). */
  def empty(like: DataFrame, idCol: String, textCol: String,
            shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16): State = {
    val sets = Dedup.shingleSets(like.limit(0), idCol, textCol, shingleN)
    val banded = Dedup.minhashBanded(sets, numHashes, bands)
    val pairs = sets.select(col("id").as("id_a"), col("id").as("id_b"),
      lit(0.0d).as("jaccard")).limit(0)
    State(sets, banded, pairs)
  }

  /** One incremental step: near-dup pairs involving at least one `batch`
    * document are found, verified, and appended. Parameters must match
    * across every step of a state (and match [[Dedup.minhashPairs]] for the
    * equality guarantee). Intermediates are persisted via Dedup's tracked
    * cache — release with [[Dedup.releaseCaches]] once outputs are
    * materialized. */
  def step(prev: State, batch: DataFrame, idCol: String, textCol: String,
           shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
           threshold: Double = 0.7, maxBucket: Int = 1000): Step = {
    val d = delta(prev, batch, idCol, textCol, shingleN, numHashes, bands,
      threshold, maxBucket)
    Step(State(prev.sets.unionByName(d.sets),
        prev.banded.unionByName(d.banded),
        prev.pairs.unionByName(d.pairs)),
      d.touchedBuckets, d.pairsAdded)
  }

  /** The batch increment against accumulated state (see [[step]]). */
  def delta(prev: State, batch: DataFrame, idCol: String, textCol: String,
            shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
            threshold: Double = 0.7, maxBucket: Int = 1000): Delta = {
    // batch-local state from the SAME expressions as the full operator;
    // persisted: each feeds the probe + both sides of the salted join, the
    // verification branches, and the returned accumulated state
    val newSets = Dedup.trackPersist(
      Dedup.shingleSets(batch, idCol, textCol, shingleN))
    val newBanded = Dedup.trackPersist(
      Dedup.minhashBanded(newSets, numHashes, bands))

    // buckets the batch touches — no other bucket can produce a new pair
    val touched = newBanded.select("band", "bucket").distinct()

    // candidate generation only inside touched buckets: existing members of
    // touched buckets (left-semi: key-colocated probe, no payload) plus the
    // batch's rows; the salted self-join bounds any hot bucket's fan-out
    val affected = Dedup.trackPersist(
      prev.banded.join(touched, Seq("band", "bucket"), "left_semi")
        .unionByName(newBanded))
    val cand0 = Blocking.saltedSelfJoin(affected, Seq("band", "bucket"), "id",
        Seq.empty, maxBucket)
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    // keep pairs with ≥1 batch member: an old×old pair inside a touched
    // bucket was already emitted by the batch that brought its later doc
    // (pairs are append-only — see class doc). Two skinny equi-joins, no
    // driver work.
    val cand = cand0
      .join(newSets.select(col("id").as("id_a"), lit(1).as("__new_a")), Seq("id_a"), "left")
      .join(newSets.select(col("id").as("id_b"), lit(1).as("__new_b")), Seq("id_b"), "left")
      .filter(col("__new_a").isNotNull || col("__new_b").isNotNull)
      .select("id_a", "id_b")

    val allSets = prev.sets.unionByName(newSets)
    val fresh = Dedup.trackPersist(Dedup.verifiedJaccard(cand, allSets)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard")))

    // bookkeeping counts folded into ONE action (the IncrementalLinkage
    // cross-join pattern); this also materializes `fresh`'s persist
    val stats = touched.agg(count(lit(1)).as("tb"))
      .crossJoin(fresh.agg(count(lit(1)).as("np"))).head()

    Delta(newSets, newBanded, fresh, stats.getLong(0), stats.getLong(1))
  }

  // ------------------------- persisted state layout -------------------------
  // Per-batch APPEND-ONLY deltas: `sets_delta_N` / `banded_delta_N` /
  // `pairs_delta_N` parquet dirs (committed = all three carry _SUCCESS);
  // state before batch B = plain union of live deltas < B. Compaction every
  // `compactEvery` batches folds all live deltas into batch B's own delta
  // and then publishes the `compacted_B` marker (marker LAST — a crash
  // before it leaves an oversized but CORRECT state, the IncrementalLinkage
  // argument without its supersede logic: pairs never change, so no
  // last-touch merge exists to get wrong). Superseded deltas are GC'd at
  // the start of the next batch, never in the batch that wrote the marker
  // (foreachBatch re-delivers a batch whose commit crashed).

  def committedBatches(stateDir: String): Seq[Long] =
    StateFs.listNames(stateDir)
      .flatMap(n => StateFs.numericSuffix(n, "sets_delta_"))
      .filter(b => Seq("sets_delta_", "banded_delta_", "pairs_delta_")
        .forall(p => StateFs.exists(stateDir, s"$p$b/_SUCCESS")))
      .distinct.sorted

  def compactions(stateDir: String): Seq[Long] =
    StateFs.listNames(stateDir)
      .flatMap(n => StateFs.numericSuffix(n, "compacted_")).sorted

  private def liveBatches(stateDir: String, beforeBatch: Long): Seq[Long] = {
    val committed = committedBatches(stateDir).filter(_ < beforeBatch)
    compactions(stateDir).filter(_ < beforeBatch).lastOption match {
      case Some(base) => committed.filter(_ >= base)
      case None       => committed
    }
  }

  private def gcSuperseded(stateDir: String, currentBatch: Long): Unit =
    compactions(stateDir).filter(_ < currentBatch).lastOption.foreach { base =>
      committedBatches(stateDir).filter(_ < base).foreach { b =>
        Seq("sets_delta_", "banded_delta_", "pairs_delta_")
          .foreach(p => StateFs.deleteRecursive(stateDir, s"$p$b"))
      }
    }

  /** Accumulated state before `beforeBatch`, reconstructed by plain union of
    * the live committed deltas (empty-state schemas when none exist). */
  def loadState(spark: SparkSession, stateDir: String, beforeBatch: Long,
                idCol: String, textCol: String,
                shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16): State = {
    val live = liveBatches(stateDir, beforeBatch)
    if (live.isEmpty)
      empty(emptyDocs(spark, idCol, textCol), idCol, textCol,
        shingleN, numHashes, bands)
    else {
      def union(prefix: String): DataFrame = live
        .map(b => spark.read.parquet(s"$stateDir/$prefix$b"))
        .reduce(_ unionByName _)
      State(union("sets_delta_"), union("banded_delta_"), union("pairs_delta_"))
    }
  }

  private def emptyDocs(spark: SparkSession, idCol: String, textCol: String): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(idCol, org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField(textCol, org.apache.spark.sql.types.StringType))))

  /** Streaming driver: file-source document stream → foreachBatch
    * incremental delta (the [[IncrementalLinkage.run]] shape for dedup
    * state). Per-batch state I/O is O(delta) + one O(state) union read;
    * restart resumes from the checkpoint's consumed-file ledger —
    * exactly-once per batch. */
  def run(spark: SparkSession, inDir: String, stateDir: String,
          checkpoint: String, idCol: String = "doc_id", textCol: String = "text",
          shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
          threshold: Double = 0.7, maxBucket: Int = 1000,
          compactEvery: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    StreamingIngest.readDocs(spark, inDir).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val sp = batch.sparkSession
        gcSuperseded(stateDir, batchId)
        val prev = loadState(sp, stateDir, batchId, idCol, textCol,
          shingleN, numHashes, bands)
        val d = delta(prev, batch.toDF().select(idCol, textCol), idCol, textCol,
          shingleN, numHashes, bands, threshold, maxBucket)
        val live = liveBatches(stateDir, batchId)
        val base = compactions(stateDir).filter(_ < batchId).lastOption
        val doCompact = compactEvery > 0 &&
          live.count(b => !base.contains(b)) + 1 >= compactEvery
        if (!doCompact) {
          d.sets.write.mode("overwrite").parquet(s"$stateDir/sets_delta_$batchId")
          d.banded.write.mode("overwrite").parquet(s"$stateDir/banded_delta_$batchId")
          d.pairs.write.mode("overwrite").parquet(s"$stateDir/pairs_delta_$batchId")
        } else {
          // compaction batch: this delta IS the full state (plain union —
          // append-only state has no supersede cases)
          prev.sets.unionByName(d.sets).write.mode("overwrite")
            .parquet(s"$stateDir/sets_delta_$batchId")
          prev.banded.unionByName(d.banded).write.mode("overwrite")
            .parquet(s"$stateDir/banded_delta_$batchId")
          prev.pairs.unionByName(d.pairs).write.mode("overwrite")
            .parquet(s"$stateDir/pairs_delta_$batchId")
          StateFs.publish(stateDir, s"compacted_$batchId", Array.empty[Byte])
        }
        graft.operators.Dedup.releaseCaches(sp)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
