package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Linkage, Scoring}

/** Incremental linkage over a stream of page micro-batches: each batch
  * re-pairs and re-scores ONLY the blocks it touches (the block keys the
  * batch's [[StreamingIngest.blockStats]] rows report), carrying every other
  * block's scored pairs forward untouched.
  *
  * Scale rationale: a naive streaming design re-runs the full pair join per
  * batch — O(total²/blocks) work for a batch that touched 0.01% of blocks.
  * Here the per-batch cost is bounded by Σ(touched block)², independent of
  * the accumulated corpus size; untouched blocks cost one anti-join probe.
  * Within a touched block old×old pairs are re-scored along with new pairs —
  * redundant but bounded (the scorer is linear in pairs) and it keeps the
  * state model trivial: `scored` is always exactly "every block scored as of
  * its last touch".
  */
object IncrementalLinkage {

  case class Step(prepared: DataFrame, scored: DataFrame,
                  changedBlocks: Long, pairsRescored: Long)

  /** One incremental step.
    *
    * @param prevPrepared accumulated prepared records (empty on first batch)
    * @param prevScored   accumulated scored pairs (empty on first batch)
    * @param batch        the new micro-batch of raw pages
    */
  def step(prevPrepared: DataFrame, prevScored: DataFrame, batch: DataFrame,
           cfg: Linkage.Config = Linkage.Config()): Step = {
    val bPrep = Linkage.prepare(batch, cfg)
    val changed = bPrep.select("block_key").distinct()

    // records that participate in re-pairing: the batch + every existing
    // record in a touched block (left-semi: key-colocated probe, no payload)
    val affected = prevPrepared
      .join(changed, Seq("block_key"), "left_semi")
      .unionByName(bPrep)
    val rescored = Scoring.scoreDF(
      graft.operators.Blocking.candidatePairs(
        affected, "block_key", "url", payloadCols = Seq("canon"), cfg.maxBlock),
      cfg.threshold)

    // untouched blocks keep their pairs verbatim (anti-join on the key)
    val kept = prevScored.join(changed, Seq("block_key"), "left_anti")

    Step(prevPrepared.unionByName(bPrep), kept.unionByName(rescored),
      changed.count(), rescored.count())
  }

  private def emptyPages(spark: SparkSession): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StreamingIngest.pageSchema)

  private def emptyScored(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[graft.operators.ScoredPair].toDF()
  }

  private def loadLatest(spark: SparkSession, stateDir: String, name: String,
                         beforeBatch: Long, empty: => DataFrame): DataFrame = {
    val dirs = (0L until beforeBatch).map(b => s"$stateDir/${name}_$b")
      .filter(d => new java.io.File(d, "_SUCCESS").exists())
    if (dirs.isEmpty) empty else spark.read.parquet(dirs.last)
  }

  /** Streaming driver: file-source pages stream → foreachBatch incremental
    * step; state (prepared + scored) is versioned parquet per batch id, so a
    * restart resumes from the last committed batch (checkpoint tracks which
    * input files are consumed — exactly-once per batch). */
  def run(spark: SparkSession, inDir: String, stateDir: String,
          checkpoint: String, cfg: Linkage.Config = Linkage.Config()): StreamingQuery = {
    StreamingIngest.readPages(spark, inDir).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val sp = batch.sparkSession
        val prevP = loadLatest(sp, stateDir, "prepared", batchId,
          Linkage.prepare(emptyPages(sp), cfg))
        val prevS = loadLatest(sp, stateDir, "scored", batchId, emptyScored(sp))
        val r = step(prevP, prevS, batch.toDF(), cfg)
        r.prepared.write.mode("overwrite").parquet(s"$stateDir/prepared_$batchId")
        r.scored.write.mode("overwrite").parquet(s"$stateDir/scored_$batchId")
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
