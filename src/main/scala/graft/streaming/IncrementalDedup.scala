package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Blocking, Dedup}

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

    Step(State(allSets, prev.banded.unionByName(newBanded),
        prev.pairs.unionByName(fresh)),
      stats.getLong(0), stats.getLong(1))
  }
}
