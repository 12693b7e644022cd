package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{ConnectedComponents, Linkage, Scoring, StaticParser}
import graft.sources.Gazetteer

/** The linkage pipeline with per-stage snapshot commits: each heavy stage
  * (prepare, score, cluster, entities) publishes a versioned snapshot and a
  * metrics row; a rerun with the same input fingerprint resumes from the
  * last committed stage instead of recomputing (north-rule resumability). */
object ResumableLinkage {

  /** Input fingerprint: identifies (pages source, config, code version) —
    * stages re-run iff any of these change. EVERY Config field participates:
    * a resume under a different phonetic family or extraction pattern must
    * invalidate committed stages, because block keys / candidate pairs /
    * extracted spans were all computed under the old value (round-3 ADVICE —
    * the phonetic field silently matched the old fingerprint). The free-text
    * regex is md5'd so the fingerprint stays a clean one-liner in manifests. */
  def fingerprint(pagesId: String, cfg: Linkage.Config): String = {
    val patHash = java.security.MessageDigest.getInstance("MD5")
      .digest(cfg.extractPattern.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(12)
    s"$pagesId|t=${cfg.threshold}|mb=${cfg.maxBlock}|ph=${cfg.phonetic}" +
      s"|re=$patHash|${Snapshots.CodeVersion}"
  }

  def run(spark: SparkSession, pages: DataFrame, pagesId: String, root: String,
          bIdx: Broadcast[Gazetteer.Index],
          cfg: Linkage.Config = Linkage.Config()): DataFrame = {
    val fp = fingerprint(pagesId, cfg)

    val prepared = Resumable.stage(spark, root, "prepared", fp) {
      Linkage.prepare(pages, cfg)
    }
    val scored = Resumable.stage(spark, root, "scored", fp) {
      Linkage.scored(prepared, cfg)
    }
    val comps = Resumable.stage(spark, root, "components", fp) {
      // cluster on the url strings (collision-free; a 64-bit hash node id
      // silently merges entities at 10^12 pages) — the iteration itself runs
      // on dense dictionary longs, see ConnectedComponents.runOnStrings
      ConnectedComponents.runOnStrings(
        scored.filter(col("is_match"))
          .select(col("url_a").as("src"), col("url_b").as("dst")))
    }
    Resumable.stage(spark, root, "entities", fp) {
      val withEntity = prepared
        .join(comps.withColumnRenamed("id", "url"), Seq("url"), "left")
        .withColumn("entity_id", coalesce(col("component"), col("url")))
        .select("url", "extracted", "entity_id")
      StaticParser.parse(withEntity, "extracted", bIdx)
        .select("url", "entity_id", "province", "district", "neighbourhood")
    }
  }
}
