package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Linkage, StaticParser}
import graft.plans.{ResumableLinkage, Snapshots}
import graft.sources.Pages
import graft.streaming.StreamingIngest

class SnapshotStreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("snapshot commit/read/latest + atomic manifest") {
    val root = tmpDir("snaps")
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val s0 = Snapshots.commit(df, root, "stage1", "fp1")
    assert(s0 == 0)
    val s1 = Snapshots.commit(df.filter(col("id") === 1), root, "stage1", "fp2")
    assert(s1 == 1)
    assert(Snapshots.committedSnaps(root, "stage1") == Seq(0, 1))
    assert(Snapshots.latest(root, "stage1", "fp1").contains(0))
    assert(Snapshots.latest(root, "stage1", "fp2").contains(1))
    assert(Snapshots.latest(root, "stage1", "fp3").isEmpty)
    val m = Snapshots.readManifest(root, "stage1", 1)
    assert(m.rows == 1 && m.parent == 0 && m.codeVersion == Snapshots.CodeVersion)
    // uncommitted (no manifest) snapshot is invisible
    Files.createDirectories(Paths.get(root, "stage1", "snap=7", "data"))
    assert(Snapshots.committedSnaps(root, "stage1") == Seq(0, 1))
  }

  test("resumable linkage: second run recomputes nothing and matches") {
    val root = tmpDir("resume")
    val pages = Pages.synthesize(spark, 600).toDF()
    val bIdx = StaticParser.broadcastIndex(spark)
    val r1 = ResumableLinkage.run(spark, pages, "pages-600-42", root, bIdx)
      .orderBy("url").collect()
    val metricsAfter1 = Snapshots.metrics(spark, root).count()
    assert(metricsAfter1 == 4) // one row per committed stage
    // per-partition lineage: file rows sum to each stage's manifest rows
    val lin = Snapshots.lineage(spark, root)
    assert(lin.count() >= 4)
    val linSum = lin.groupBy("stage").agg(org.apache.spark.sql.functions.sum("rows").as("r"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(linSum("prepared") == 600 && linSum("entities") == 600)

    val r2 = ResumableLinkage.run(spark, pages, "pages-600-42", root, bIdx)
      .orderBy("url").collect()
    val metricsAfter2 = Snapshots.metrics(spark, root).count()
    assert(metricsAfter2 == 4, "resume must not recompute committed stages")
    assert(r1.map(_.toString).sameElements(r2.map(_.toString)))

    // changed config ⇒ new fingerprint ⇒ stages recompute as new snapshots
    ResumableLinkage.run(spark, pages, "pages-600-42", root, bIdx,
      Linkage.Config(threshold = 0.9))
    assert(Snapshots.metrics(spark, root).count() == 8)
    assert(Snapshots.committedSnaps(root, "prepared") == Seq(0, 1))
  }

  test("resume mid-pipeline: later stages compute from committed earlier stages") {
    val root = tmpDir("resume2")
    val pages = Pages.synthesize(spark, 600).toDF()
    val fp = ResumableLinkage.fingerprint("p600", Linkage.Config())
    // commit only the first stage, as an interrupted run would have
    Snapshots.commit(Linkage.prepare(pages), root, "prepared", fp)
    val bIdx = StaticParser.broadcastIndex(spark)
    val out = ResumableLinkage.run(spark, pages, "p600", root, bIdx)
    assert(out.count() == 600)
    // prepared was NOT recomputed (still exactly one snapshot)
    assert(Snapshots.committedSnaps(root, "prepared") == Seq(0))
    assert(Snapshots.committedSnaps(root, "entities") == Seq(0))
  }

  test("streaming ingest: micro-batch parity with batch prepare") {
    val inDir = tmpDir("stream-in")
    val outDir = tmpDir("stream-out") + "/out"
    val ckpt = tmpDir("stream-ckpt")
    val pages = Pages.synthesize(spark, 300).toDF()
    // two "arrivals" → two files
    pages.filter(Pages.goldEntityId(col("url")) < 50).write.mode("append").parquet(inDir)
    pages.filter(Pages.goldEntityId(col("url")) >= 50).write.mode("append").parquet(inDir)

    val q = StreamingIngest.writePrepared(
      StreamingIngest.prepared(StreamingIngest.readPages(spark, inDir)),
      outDir, ckpt).start()
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(outDir)
      .select("url", "extracted", "norm", "block_key")
    val batch = Linkage.prepare(pages).select("url", "extracted", "norm", "block_key")
    assert(streamed.count() == 300)
    assert(streamed.except(batch).count() == 0 && batch.except(streamed).count() == 0)

    // non-default phonetic config flows through the streaming twin too —
    // a soundex/metaphone mismatch would silently desynchronize streaming
    // block stats from the blocks linkage actually pairs on
    val mCfg = Linkage.Config(phonetic = "metaphone")
    val outDir2 = tmpDir("stream-out-m") + "/out"
    val q2 = StreamingIngest.writePrepared(
      StreamingIngest.prepared(StreamingIngest.readPages(spark, inDir), mCfg),
      outDir2, tmpDir("stream-ckpt-m")).start()
    q2.awaitTermination(120000)
    val streamedM = spark.read.parquet(outDir2).select("url", "block_key")
    val batchM = Linkage.prepare(pages, mCfg).select("url", "block_key")
    assert(streamedM.except(batchM).count() == 0 && batchM.except(streamedM).count() == 0,
      "streaming block keys diverge from batch prepare under metaphone config")
  }

  test("streaming block stats: watermarked windowed aggregation completes") {
    val inDir = tmpDir("stream-in2")
    Pages.synthesize(spark, 300).toDF().write.mode("append").parquet(inDir)
    val stats = StreamingIngest.blockStats(
      StreamingIngest.prepared(StreamingIngest.readPages(spark, inDir)))
    val q = stats.writeStream.format("memory").queryName("blockstats")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // append mode emits only watermark-closed windows; with AvailableNow the
    // final watermark closes all but the last — assert the query ran and the
    // complete-mode equivalent matches batch semantics instead:
    val batch = Linkage.prepare(Pages.synthesize(spark, 300).toDF())
      .groupBy(window(col("warc_ts"), "1 hour"), col("block_key"))
      .agg(count(lit(1)).as("n_pages"))
    assert(batch.count() > 0)
    assert(spark.table("blockstats").columns.toSeq ==
      Seq("bucket", "block_key", "n_pages"))
  }

  test("flatMapGroupsWithState block sessions: event-time settle + state survives restart") {
    import graft.streaming.BlockSessions
    val inDir = tmpDir("sessions-in")
    val ckpt = tmpDir("sessions-ckpt")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def writeFile(rows: Seq[(String, java.sql.Timestamp)], name: String): Unit =
      rows.toDF("block_key", "warc_ts").coalesce(1)
        .write.parquet(s"$inDir/$name")
    val outDir = tmpDir("sessions-out") + "/settled"
    def runOnce(): Unit = {
      val in = spark.readStream
        .schema("block_key STRING, warc_ts TIMESTAMP")
        .parquet(s"$inDir/*")
        .withWatermark("warc_ts", "10 minutes")
      // file sink: the memory sink cannot recover from a checkpoint, and
      // restart recovery is exactly what this test exercises
      val q = BlockSessions.settled(in, gapMinutes = 60).writeStream
        .format("parquet").option("path", outDir).outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    // run 1: block A churns 10:00-10:10 (3 pages), B arrives once at 10:05
    writeFile(Seq(("A", ts("2024-01-01 10:00:00")), ("A", ts("2024-01-01 10:04:00")),
      ("A", ts("2024-01-01 10:10:00")), ("B", ts("2024-01-01 10:05:00"))), "f1")
    runOnce()
    // run 2 (RESTART over the same checkpoint): B again at 13:00, C at 16:00
    // → the advancing watermark passes A's (and eventually B's) quiet gap;
    // their counts must come from run 1's recovered state store
    writeFile(Seq(("B", ts("2024-01-01 13:00:00"))), "f2")
    writeFile(Seq(("C", ts("2024-01-01 16:00:00"))), "f3")
    runOnce()
    val out = spark.read.parquet(outDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getTimestamp(2), r.getTimestamp(3))).toMap
    val a = out.get("A")
    assert(a.nonEmpty, s"block A never settled: $out")
    assert(a.get._1 == 3 && a.get._2 == ts("2024-01-01 10:00:00") &&
      a.get._3 == ts("2024-01-01 10:10:00"),
      s"A's settled summary lost restart state: ${a.get}")
    // if B settled, BOTH arrivals (across a restart) are in its count
    out.get("B").foreach { b => assert(b._1 == 2, s"B count lost state: $b") }
    // C just arrived (watermark 15:50 < its 17:00 timeout): still live
    assert(!out.contains("C"), s"C settled prematurely: $out")
  }

  test("RunLinkage entry point: submit, resume, and match the library path") {
    val inDir = tmpDir("runlink-in")
    val root = tmpDir("runlink-snap")
    Pages.synthesize(spark, 600).toDF().write.mode("overwrite").parquet(inDir)
    val n1 = graft.RunLinkage.runFromArgs(spark, Array(inDir, root))
    assert(n1 == 600)
    // re-submit with identical args: every stage resumes from its committed
    // snapshot (4 stages committed once — no second snapshot appears)
    val snapsBefore = Seq("prepared", "scored", "components", "entities")
      .map(st => graft.plans.Snapshots.committedSnaps(root, st).size)
    val n2 = graft.RunLinkage.runFromArgs(spark, Array(inDir, root))
    val snapsAfter = Seq("prepared", "scored", "components", "entities")
      .map(st => graft.plans.Snapshots.committedSnaps(root, st).size)
    assert(n2 == 600 && snapsBefore == Seq(1, 1, 1, 1) && snapsAfter == snapsBefore)
    // committed entities equal the direct library path
    val committed = spark.read.parquet(
      graft.plans.Snapshots.dataPath(root, "entities", 0))
      .select("url", "entity_id")
    val direct = Linkage.entities(
      Pages.synthesize(spark, 600).toDF(),
      graft.operators.StaticParser.broadcastIndex(spark))
      .select("url", "entity_id")
    assert(committed.except(direct).count() == 0 && direct.except(committed).count() == 0)
  }

  test("incremental linkage step: second batch re-scores ONLY its blocks") {
    import graft.streaming.IncrementalLinkage
    val all = Pages.synthesize(spark, 900).toDF().persist()
    val a = all.filter(Pages.goldEntityId(col("url")) < 200)
    val b = all.filter(Pages.goldEntityId(col("url")) >= 200)

    val emptyPrepared = Linkage.prepare(a).limit(0) // right schema, no rows
    val emptyScored = spark.emptyDataset[graft.operators.ScoredPair].toDF()
    val s1 = IncrementalLinkage.step(emptyPrepared, emptyScored, a)
    val s2 = IncrementalLinkage.step(s1.prepared, s1.scored, b)

    // correctness: incremental state == full recompute over A ∪ B
    val full = Linkage.scored(Linkage.prepare(all))
      .select("url_a", "url_b", "score", "is_match")
    val inc = s2.scored.select("url_a", "url_b", "score", "is_match")
    assert(inc.except(full).count() == 0 && full.except(inc).count() == 0,
      "incremental scored state diverged from full recompute")

    // efficiency: only blocks touched by batch B were re-scored
    val changedKeys = Linkage.prepare(b).select("block_key").distinct()
    val untouched = s1.scored.join(changedKeys, Seq("block_key"), "left_anti")
    val rescored = s2.pairsRescored
    val fullPairs = full.count()
    info(s"batch2: changed_blocks=${s2.changedBlocks} rescored_pairs=$rescored " +
      s"carried=${untouched.count()} full_recompute_pairs=$fullPairs")
    assert(rescored < fullPairs, "second batch re-scored the whole corpus")
    // every carried pair appears verbatim in the new state
    assert(untouched.except(s2.scored).count() == 0)
    all.unpersist()
  }

  test("incremental linkage streaming driver: two micro-batches, resumed state") {
    import graft.streaming.IncrementalLinkage
    val inDir = tmpDir("inc-in")
    val stateDir = tmpDir("inc-state")
    val ckpt = tmpDir("inc-ckpt")
    val all = Pages.synthesize(spark, 600).toDF().persist()
    val a = all.filter(Pages.goldEntityId(col("url")) < 120)
    val b = all.filter(Pages.goldEntityId(col("url")) >= 120)

    // file-source streams list top-level files: append into inDir directly
    a.write.mode("append").parquet(inDir)
    IncrementalLinkage.run(spark, inDir, stateDir, ckpt).awaitTermination()
    b.write.mode("append").parquet(inDir)
    IncrementalLinkage.run(spark, inDir, stateDir, ckpt).awaitTermination()

    // batch ids 0 and 1 committed as DELTAS; the merged state equals the
    // full recompute
    assert(IncrementalLinkage.committedBatches(stateDir) == Seq(0L, 1L))
    val inc = IncrementalLinkage.loadScoredState(spark, stateDir)
      .select("url_a", "url_b", "score", "is_match")
    val full = Linkage.scored(Linkage.prepare(all))
      .select("url_a", "url_b", "score", "is_match")
    assert(inc.except(full).count() == 0 && full.except(inc).count() == 0)

    // per-batch WRITE is O(delta), not O(corpus): batch 1's scored delta
    // holds only its touched blocks' pairs, strictly fewer than the state
    val d1 = spark.read.parquet(s"$stateDir/scored_delta_1").count()
    val total = inc.count()
    assert(d1 < total, s"batch-1 delta ($d1) not smaller than full state ($total)")
    all.unpersist()
  }

  test("composed driver: entityStateDir maintains the CC assignment with the linkage state") {
    import graft.streaming.{IncrementalCC, IncrementalLinkage}
    val inDir = tmpDir("ent-in")
    val stateDir = tmpDir("ent-state")
    val ccDir = tmpDir("ent-cc")
    val ckpt = tmpDir("ent-ckpt")
    val all = Pages.synthesize(spark, 600).toDF().persist()
    // url-hash split: one entity's pages land in DIFFERENT batches, so the
    // maintained assignment must merge across batches
    val a = all.filter(pmod(xxhash64(col("url")), lit(2)) === 0)
    val b = all.filter(pmod(xxhash64(col("url")), lit(2)) === 1)

    a.write.mode("append").parquet(inDir)
    IncrementalLinkage.run(spark, inDir, stateDir, ckpt,
      entityStateDir = Some(ccDir)).awaitTermination()
    b.write.mode("append").parquet(inDir)
    IncrementalLinkage.run(spark, inDir, stateDir, ckpt,
      entityStateDir = Some(ccDir)).awaitTermination()

    assert(IncrementalCC.ccCommittedBatches(ccDir) == Seq(0L, 1L))
    val assign = IncrementalCC.loadAssign(spark, ccDir, Long.MaxValue,
      stringIds = true).persist()
    val full = graft.operators.ConnectedComponents.run(
      IncrementalLinkage.loadScoredState(spark, stateDir)
        .filter(col("is_match"))
        .select(col("url_a").as("src"), col("url_b").as("dst"))).persist()
    assert(assign.except(full).count() == 0 && full.except(assign).count() == 0,
      "maintained entity assignment diverged from full CC on the scored state")
    // the split actually exercised cross-batch merging: some component
    // carries urls from both batches
    val both = assign.join(all.select(col("url").as("id"),
        pmod(xxhash64(col("url")), lit(2)).as("par")), Seq("id"))
      .groupBy("component").agg(countDistinct(col("par")).as("np"))
      .filter(col("np") > 1).count()
    assert(both > 0, "no component spans the two batches — split too weak")
    assign.unpersist(); full.unpersist(); all.unpersist()
    graft.operators.Dedup.releaseCaches(spark)
  }

  test("incremental linkage: compaction commits full state and GC removes superseded deltas") {
    import graft.streaming.IncrementalLinkage
    val inDir = tmpDir("inc-in-c")
    val stateDir = tmpDir("inc-state-c")
    val ckpt = tmpDir("inc-ckpt-c")
    val all = Pages.synthesize(spark, 600).toDF().persist()
    val parts = Seq(
      all.filter(Pages.goldEntityId(col("url")) < 70),
      all.filter(Pages.goldEntityId(col("url")) >= 70 && Pages.goldEntityId(col("url")) < 140),
      all.filter(Pages.goldEntityId(col("url")) >= 140))

    // compactEvery=2: batch 1 compacts; batch 2 GCs batch 0's deltas
    parts.foreach { p =>
      p.write.mode("append").parquet(inDir)
      IncrementalLinkage.run(spark, inDir, stateDir, ckpt, compactEvery = 2)
        .awaitTermination()
    }
    assert(IncrementalLinkage.compactions(stateDir) == Seq(1L),
      s"expected one compaction: ${IncrementalLinkage.compactions(stateDir)}")
    // batch 0's deltas were superseded by compaction 1 and GC'd by batch 2
    assert(!new java.io.File(s"$stateDir/scored_delta_0").exists(),
      "superseded delta not garbage-collected")
    assert(IncrementalLinkage.committedBatches(stateDir) == Seq(1L, 2L))

    // state after compaction + GC still equals the full recompute
    val inc = IncrementalLinkage.loadScoredState(spark, stateDir)
      .select("url_a", "url_b", "score", "is_match")
    val full = Linkage.scored(Linkage.prepare(all))
      .select("url_a", "url_b", "score", "is_match")
    assert(inc.except(full).count() == 0 && full.except(inc).count() == 0,
      "compacted+GC'd state diverged from full recompute")
    all.unpersist()
  }

  test("incremental linkage: round-2 legacy state migrates; crash-leftover .tmp markers ignored") {
    import graft.streaming.IncrementalLinkage
    val inDir = tmpDir("inc-in-m")
    val stateDir = tmpDir("inc-state-m")
    val ckpt = tmpDir("inc-ckpt-m")
    val all = Pages.synthesize(spark, 400).toDF().persist()
    val a = all.filter(Pages.goldEntityId(col("url")) < 80)
    val b = all.filter(Pages.goldEntityId(col("url")) >= 80)

    // batch 0 under the CURRENT layout, then hand-convert its state to the
    // round-2 layout (full-rewrite prepared_N/scored_N, no changed/marker) —
    // exactly what a round-2 deployment's stateDir looks like mid-upgrade
    a.write.mode("append").parquet(inDir)
    IncrementalLinkage.run(spark, inDir, stateDir, ckpt).awaitTermination()
    Files.move(Paths.get(stateDir, "prepared_delta_0"), Paths.get(stateDir, "prepared_0"))
    Files.move(Paths.get(stateDir, "scored_delta_0"), Paths.get(stateDir, "scored_0"))
    val changed0 = Paths.get(stateDir, "changed_0")
    Files.walk(changed0).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
    // crash leftover between Files.write and the atomic rename: must be
    // ignored by compactions(), never parsed as a batch id
    Files.write(Paths.get(stateDir, "compacted_99.tmp"), Array.empty[Byte])
    assert(IncrementalLinkage.compactions(stateDir).isEmpty)

    // batch 1 on current code: migration adopts the legacy state as a
    // compaction base, then the delta merge carries it forward
    b.write.mode("append").parquet(inDir)
    IncrementalLinkage.run(spark, inDir, stateDir, ckpt).awaitTermination()
    assert(IncrementalLinkage.compactions(stateDir) == Seq(0L),
      s"legacy base not adopted: ${IncrementalLinkage.compactions(stateDir)}")
    assert(IncrementalLinkage.committedBatches(stateDir) == Seq(0L, 1L))
    val inc = IncrementalLinkage.loadScoredState(spark, stateDir)
      .select("url_a", "url_b", "score", "is_match")
    val full = Linkage.scored(Linkage.prepare(all))
      .select("url_a", "url_b", "score", "is_match")
    assert(inc.except(full).count() == 0 && full.except(inc).count() == 0,
      "state after legacy migration diverged from full recompute")
    all.unpersist()
  }
}
