package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Gazetteer

/** End-to-end record-linkage pipeline over the pages table
  * (BASELINE.json north_star): extract → normalize → parse → block →
  * score → cluster → entity ids.
  *
  * Stage layout and scale posture:
  *  - extract/normalize/block-key: pure Catalyst projections (codegen'd, no
  *    shuffle, predicate/column pruning reach the scan);
  *  - candidate pairs: one key-partitioned self-join, skew-salted ([[Blocking]]);
  *  - scoring: mapPartitions kernel, linear in pairs ([[Scoring]]);
  *  - clustering: O(log n) alternating-star rounds ([[ConnectedComponents]]);
  *  - parse enrichment: broadcast-index kernel ([[StaticParser]]), no shuffle.
  */
object Linkage {

  case class Config(
      threshold: Double = 0.85,
      maxBlock: Int = 1000,
      extractPattern: String = "(?i)adres\\s*:\\s*(.*?)(?=\\s+tel\\s*:|$)",
      phonetic: String = "soundex") // or "metaphone" (north star names both)

  /** Deterministic extraction of the address-bearing span from page text.
    * Per-row invariant (BASELINE.json input_hint): byte-identical extracted
    * text per url across runs — guaranteed because this is a pure projection
    * of `text`. */
  def extract(pages: DataFrame, cfg: Config = Config()): DataFrame =
    pages.select(
      col("url"),
      col("warc_ts"),
      regexp_extract(col("text"), cfg.extractPattern, 1).as("extracted"))

  /** Canonical normalized text + blocking key. `canon` (sorted signature
    * tokens) is computed here, once per record — the scorer's per-pair work
    * is then pure string metrics. The node identity throughout the pipeline
    * is the url ITSELF: a 64-bit hash id silently merges ~2.7×10⁴ unrelated
    * entities at the north rule's 10^12 pages (n²/2⁶⁵ birthday collisions),
    * so no hash-derived id ever reaches the clustering. */
  def prepare(pages: DataFrame, cfg: Config = Config()): DataFrame =
    extract(pages, cfg)
      .withColumn("norm", Blocking.blockNorm(col("extracted")))
      .withColumn("block_key", Blocking.blockKey(col("norm"), cfg.phonetic))
      // native one-scan canon (the filter/rlike HOF chain ran interpreted on
      // the cold-pipeline hot path; value-identical — TextNativeSpec)
      .withColumn("canon", graft.functions.TextNativeUtil.canonSigCol(col("norm")))

  /** The HOF canon formulation [[prepare]] replaced — equality witness only. */
  private[graft] def canonColumns(norm: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_join(array_sort(
      filter(split(norm, " "), t => t.rlike("[\\p{L}\\p{N}]"))), " ")

  /** Candidate pairs at shared blocking keys (skew-salted self-join). */
  def candidates(prepared: DataFrame, cfg: Config = Config()): DataFrame =
    Blocking.candidatePairs(prepared, "block_key", "url",
      payloadCols = Seq("canon"), maxBlock = cfg.maxBlock)

  /** Scored candidate pairs. */
  def scored(prepared: DataFrame, cfg: Config = Config()): DataFrame =
    Scoring.scoreDF(candidates(prepared, cfg), cfg.threshold)

  /** Full pipeline → one row per url with its entity id and parsed admin
    * hierarchy. The entity id is the MINIMUM URL of the cluster (collision-
    * free by construction — urls are unique); unmatched urls become
    * singleton entities (their own url). */
  def entities(pages: DataFrame, bIdx: Broadcast[Gazetteer.Index],
               cfg: Config = Config()): DataFrame = {
    // NOTE: `prepared` stays persisted — the returned DataFrame still reads
    // it (eager unpersist here would silently recompute the whole synthesis/
    // extract branch at the caller's first action). Spark evicts LRU.
    val prepared = prepare(pages, cfg).persist()
    entitiesFrom(prepared, scored(prepared, cfg), bIdx)
  }

  /** [[entities]] from pre-materialized stages — callers that already hold
    * the prepared records and scored pairs (the query catalog shares one
    * persisted pipeline across q_scored_pairs/q_entities/q_linkage_f1;
    * ResumableLinkage holds committed snapshots) skip recomputing them.
    *
    * Clustering default: the match graph is block-partitioned BY CONSTRUCTION
    * (one block key per record, pairs form only inside a block), so
    * [[ConnectedComponents.runGrouped]] — one hash exchange + per-block
    * union-find — computes the provably-identical components in one pass
    * (measured 13.6 s → 0.77 s at 960k pages / 959k edges; LinkageSpec
    * asserts equality). Per-task memory is O(largest block), the same order
    * the pair join already pays. `groupedCC = false` selects the general
    * alternating-star iteration ([[ConnectedComponents.runOnStrings]]) —
    * required for graphs without the partition property and kept as the
    * equality oracle. */
  def entitiesFrom(prepared: DataFrame, scoredPairs: DataFrame,
                   bIdx: Broadcast[Gazetteer.Index],
                   groupedCC: Boolean = true): DataFrame = {
    val matched = scoredPairs.filter(col("is_match"))
    val comps =
      if (groupedCC)
        ConnectedComponents.runGrouped(
          matched.select(col("block_key"), col("url_a").as("src"), col("url_b").as("dst")),
          "block_key")
      else
        ConnectedComponents.runOnStrings(
          matched.select(col("url_a").as("src"), col("url_b").as("dst")))

    val withEntity = prepared
      .join(comps.withColumnRenamed("id", "url"), Seq("url"), "left")
      .withColumn("entity_id", coalesce(col("component"), col("url")))
      .select("url", "extracted", "entity_id")

    val parsed = StaticParser.parse(withEntity, "extracted", bIdx)
    parsed.select("url", "entity_id", "province", "district", "neighbourhood")
  }
}
