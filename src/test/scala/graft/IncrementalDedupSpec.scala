package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.streaming.IncrementalDedup

/** Incremental MinHash dedup: touched-bucket increments must accumulate to
  * EXACTLY the full-corpus [[Dedup.minhashPairs]] result (the
  * IncrementalLinkage equality pattern applied to banded LSH state). */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // sf0.001 documents + planted exact duplicates whose ids land in a
  // DIFFERENT (%3) batch than their originals ((id+100000) % 3 == (id+1) % 3),
  // so cross-batch pairing is actually exercised
  lazy val docs = {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    base.union(base.filter(col("doc_id") < 12)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))).persist()
  }

  test("3-batch incremental state == full-corpus minhashPairs (row-identical)") {
    val batches = (0 to 2).map(r => docs.filter(col("doc_id") % 3 === r))
    var st = IncrementalDedup.empty(docs, "doc_id", "text")
    var added = 0L
    batches.foreach { b =>
      val s = IncrementalDedup.step(st, b, "doc_id", "text", threshold = 0.5)
      st = s.state
      added += s.pairsAdded
      assert(s.touchedBuckets > 0)
    }
    val inc = st.pairs.persist()
    val full = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5).persist()
    assert(inc.except(full).count() == 0 && full.except(inc).count() == 0,
      "incremental pair state diverged from full recompute")
    // each pair emitted exactly once (by the batch of its later member):
    // the running pairsAdded total IS the full pair count, no dedup needed
    assert(added == full.count(), s"pairsAdded sum $added != full ${full.count()}")
    // the planted cross-batch duplicates were all found at jaccard 1
    assert(inc.filter(col("id_b") >= 100000L && col("id_a") < 100000L &&
      col("jaccard") === 1.0).count() >= 12)
    inc.unpersist(); full.unpersist()
    Dedup.releaseCaches(spark)
  }

  test("streaming drive: persisted deltas + restart resume == full recompute") {
    val root = java.nio.file.Files.createTempDirectory("inc_dedup_stream").toString
    val inDir = s"$root/in"; val stateDir = s"$root/state"; val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    def docsFull(r: Int) = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") % 3 === r)
    // write each batch as ONE parquet file directly in the stream dir
    def writeBatch(r: Int): Unit = {
      val tmp = s"$root/tmp_$r"
      docsFull(r).coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.move(part,
        java.nio.file.Paths.get(s"$inDir/docs_$r.parquet"))
    }
    // run 1: two input files (one micro-batch under AvailableNow)
    writeBatch(0); writeBatch(1)
    IncrementalDedup.run(spark, inDir, stateDir, ckpt,
      threshold = 0.5, compactEvery = 2).awaitTermination()
    val afterRun1 = IncrementalDedup.committedBatches(stateDir)
    assert(afterRun1.nonEmpty, "no committed deltas after run 1")
    // restart with one NEW file: the checkpoint's ledger skips the consumed
    // ones; this batch crosses the compactEvery threshold and compacts
    writeBatch(2)
    IncrementalDedup.run(spark, inDir, stateDir, ckpt,
      threshold = 0.5, compactEvery = 2).awaitTermination()
    val st = IncrementalDedup.loadState(spark, stateDir, Long.MaxValue,
      "doc_id", "text")
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val full = Dedup.minhashPairs(all, "doc_id", "text", threshold = 0.5).persist()
    val inc = st.pairs.persist()
    assert(inc.except(full).count() == 0 && full.except(inc).count() == 0,
      "persisted streaming state diverged from full recompute")
    assert(st.sets.count() == all.count(), "sets state incomplete after resume")
    assert(IncrementalDedup.compactions(stateDir).nonEmpty, "no compaction marker")
    // crash-window correctness (r7: marker-gated compaction base): the
    // compaction batch writes its PLAIN delta into the delta dirs and the
    // fold into cbase_ dirs, marker last. A reader in the window between the
    // delta _SUCCESS and the marker (simulated by deleting the marker) must
    // see the identical, duplication-free state from base+plain deltas.
    val marker = IncrementalDedup.compactions(stateDir).last
    val markerPath = java.nio.file.Paths.get(stateDir, s"compacted_$marker")
    java.nio.file.Files.delete(markerPath)
    val stNoMarker = IncrementalDedup.loadState(spark, stateDir, Long.MaxValue,
      "doc_id", "text")
    assert(stNoMarker.pairs.except(full).count() == 0 &&
      full.except(stNoMarker.pairs).count() == 0,
      "pre-marker crash window state diverged (plain-union duplication?)")
    assert(stNoMarker.sets.count() == all.count(),
      "pre-marker crash window sets state duplicated or incomplete")
    java.nio.file.Files.write(markerPath, Array.empty[Byte])
    inc.unpersist(); full.unpersist()
    Dedup.releaseCaches(spark)
  }

  test("3-batch incremental simhash state == full-corpus simhashPairs") {
    val batches = (0 to 2).map(r => docs.filter(col("doc_id") % 3 === r))
    var st = IncrementalDedup.simhashEmpty(docs, "doc_id", "text")
    var added = 0L
    batches.foreach { b =>
      val s = IncrementalDedup.simhashStep(st, b, "doc_id", "text")
      st = s.state
      added += s.pairsAdded
    }
    val inc = st.pairs.persist()
    val full = Dedup.simhashPairs(docs, "doc_id", "text").persist()
    assert(inc.except(full).count() == 0 && full.except(inc).count() == 0,
      "incremental simhash pairs diverged from full recompute")
    assert(added == full.count(), s"pairsAdded sum $added != full ${full.count()}")
    // planted cross-batch duplicates found at hamming 0
    assert(inc.filter(col("id_b") >= 100000L && col("id_a") < 100000L &&
      col("hamming") === 0).count() >= 12)
    inc.unpersist(); full.unpersist()
    Dedup.releaseCaches(spark)
  }

  test("3-batch incremental embed state == full-corpus embeddingPairs") {
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // planted identical vectors land in a different (%3) batch than their
    // originals, so cross-batch pairing is exercised (natural corpus has no
    // pair at cos >= 0.99 — the q_embed_dedup margin property)
    val vecs = base.union(base.filter(col("vec_id") < 20)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))).persist()
    val batches = (0 to 2).map(r => vecs.filter(col("vec_id") % 3 === r))
    var st = IncrementalDedup.embedEmpty(vecs, "vec_id", "embedding")
    var added = 0L
    batches.foreach { b =>
      val s = IncrementalDedup.embedStep(st, b, "vec_id", "embedding",
        threshold = 0.99)
      st = s.state
      added += s.pairsAdded
    }
    val inc = st.pairs.persist()
    val full = Dedup.embeddingPairs(vecs, "vec_id", "embedding",
      threshold = 0.99).persist()
    assert(inc.except(full).count() == 0 && full.except(inc).count() == 0,
      "incremental embed pairs diverged from full recompute")
    assert(added == full.count(), s"pairsAdded sum $added != full ${full.count()}")
    assert(inc.filter(col("id_b") >= 1000000L && col("id_a") < 1000000L).count() >= 20)
    vecs.unpersist()
    inc.unpersist(); full.unpersist()
    Dedup.releaseCaches(spark)
  }

  test("3-batch incremental ngram state == full-corpus ngramJaccardPairs") {
    // the full operator ranks prefixes by ADAPTIVE corpus frequency; the
    // incremental one by the content-hash order — the prefix filter is
    // complete under any fixed total order and verification is exact, so
    // the outputs must be row-identical despite different candidate sets
    val batches = (0 to 2).map(r => docs.filter(col("doc_id") % 3 === r))
    var st = IncrementalDedup.ngramEmpty(docs, "doc_id", "text")
    var added = 0L
    batches.foreach { b =>
      val s = IncrementalDedup.ngramStep(st, b, "doc_id", "text", threshold = 0.5)
      st = s.state
      added += s.pairsAdded
      assert(s.touchedBuckets > 0)
    }
    val inc = st.pairs.persist()
    val full = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5).persist()
    assert(inc.except(full).count() == 0 && full.except(inc).count() == 0,
      "incremental ngram pairs diverged from frequency-ordered full recompute")
    assert(added == full.count(), s"pairsAdded sum $added != full ${full.count()}")
    // planted cross-batch duplicates found at jaccard 1
    assert(inc.filter(col("id_b") >= 100000L && col("id_a") < 100000L &&
      col("jaccard") === 1.0).count() >= 12)
    inc.unpersist(); full.unpersist()
    Dedup.releaseCaches(spark)
  }

  test("simhash/embed streaming drives: persisted deltas + restart == full recompute") {
    val root = java.nio.file.Files.createTempDirectory("inc_fam_stream").toString
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    def writeBatch(dir: String, df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$root/tmp_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      java.nio.file.Files.move(part, java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }

    // --- simhash driver: run 1 (two files), restart with a third (compacts)
    val sIn = s"$root/s_in"; val sState = s"$root/s_state"; val sCkpt = s"$root/s_ckpt"
    (0 to 1).foreach(r => writeBatch(sIn, all.filter(col("doc_id") % 3 === r), s"d$r"))
    IncrementalDedup.simhashRun(spark, sIn, sState, sCkpt, compactEvery = 2)
      .awaitTermination()
    writeBatch(sIn, all.filter(col("doc_id") % 3 === 2), "d2")
    IncrementalDedup.simhashRun(spark, sIn, sState, sCkpt, compactEvery = 2)
      .awaitTermination()
    val sState2 = IncrementalDedup.loadSimhashState(spark, sState, Long.MaxValue,
      "doc_id", "text")
    val sFull = Dedup.simhashPairs(all, "doc_id", "text").persist()
    val sInc = sState2.pairs.persist()
    assert(sInc.except(sFull).count() == 0 && sFull.except(sInc).count() == 0,
      "persisted simhash streaming state diverged from full recompute")
    assert(sState2.banded.select("id").distinct().count() == all.count())
    assert(IncrementalDedup.compactions(sState).nonEmpty, "no simhash compaction")
    sInc.unpersist(); sFull.unpersist()

    // --- embed driver over the embeddings stream (planted duplicates)
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val vecs = base.union(base.filter(col("vec_id") < 20)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))).persist()
    val eIn = s"$root/e_in"; val eState = s"$root/e_state"; val eCkpt = s"$root/e_ckpt"
    (0 to 1).foreach(r => writeBatch(eIn, vecs.filter(col("vec_id") % 3 === r), s"v$r"))
    IncrementalDedup.embedRun(spark, eIn, eState, eCkpt, threshold = 0.99)
      .awaitTermination()
    writeBatch(eIn, vecs.filter(col("vec_id") % 3 === 2), "v2")
    IncrementalDedup.embedRun(spark, eIn, eState, eCkpt, threshold = 0.99)
      .awaitTermination()
    val eState2 = IncrementalDedup.loadEmbedState(spark, eState, Long.MaxValue,
      "vec_id", "embedding")
    val eFull = Dedup.embeddingPairs(vecs, "vec_id", "embedding",
      threshold = 0.99).persist()
    val eInc = eState2.pairs.persist()
    assert(eInc.except(eFull).count() == 0 && eFull.except(eInc).count() == 0,
      "persisted embed streaming state diverged from full recompute")
    assert(eInc.count() >= 20, "planted duplicates not all found")
    vecs.unpersist(); eInc.unpersist(); eFull.unpersist()

    // --- ngram driver: run 1 (two files), restart with a third (compacts)
    val nIn = s"$root/n_in"; val nState = s"$root/n_state"; val nCkpt = s"$root/n_ckpt"
    (0 to 1).foreach(r => writeBatch(nIn, all.filter(col("doc_id") % 3 === r), s"n$r"))
    IncrementalDedup.ngramRun(spark, nIn, nState, nCkpt, threshold = 0.5,
      compactEvery = 2).awaitTermination()
    writeBatch(nIn, all.filter(col("doc_id") % 3 === 2), "n2")
    IncrementalDedup.ngramRun(spark, nIn, nState, nCkpt, threshold = 0.5,
      compactEvery = 2).awaitTermination()
    val nState2 = IncrementalDedup.loadNgramState(spark, nState, Long.MaxValue,
      "doc_id", "text")
    val nFull = Dedup.ngramJaccardPairs(all, "doc_id", "text", threshold = 0.5).persist()
    val nInc = nState2.pairs.persist()
    assert(nInc.except(nFull).count() == 0 && nFull.except(nInc).count() == 0,
      "persisted ngram streaming state diverged from full recompute")
    // sets state carries every doc with a non-empty shingle set (the same
    // nsh > 0 domain the full operator works over)
    assert(nState2.sets.count() ==
      Dedup.shingleSets(all, "doc_id", "text", 3).filter(col("nsh") > 0).count(),
      "ngram sets state incomplete")
    assert(IncrementalDedup.ngramCommittedBatches(nState).nonEmpty)
    assert(IncrementalDedup.compactions(nState).nonEmpty, "no ngram compaction")
    nInc.unpersist(); nFull.unpersist()
    Dedup.releaseCaches(spark)
  }

  test("adversarial split shapes: empty and all-duplicate batches == full recompute") {
    // the split shapes a production stream actually produces: an EMPTY
    // micro-batch (quiet source interval — drives the salted join's probes
    // over a 0-row relation), a batch that is ONLY duplicates of accumulated
    // docs, and a tail batch with everything else. Equality must hold and
    // per-pair emission stay exactly-once across all of them.
    val empty = docs.filter(lit(false))
    val dupsOnly = docs.filter(col("doc_id") >= 100000L)
    val bulk = docs.filter(col("doc_id") < 100000L && col("doc_id") % 2 === 0)
    val rest = docs.filter(col("doc_id") < 100000L && col("doc_id") % 2 =!= 0)

    var st = IncrementalDedup.empty(docs, "doc_id", "text")
    var added = 0L
    Seq(bulk, empty, rest, dupsOnly).foreach { b =>
      val s = IncrementalDedup.step(st, b, "doc_id", "text", threshold = 0.5)
      st = s.state
      added += s.pairsAdded
    }
    val inc = st.pairs.persist()
    val full = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5).persist()
    assert(inc.except(full).count() == 0 && full.except(inc).count() == 0,
      "adversarial-split incremental state diverged from full recompute")
    assert(added == full.count(), s"pairsAdded sum $added != full ${full.count()}")
    inc.unpersist(); full.unpersist()

    // same shapes through the simhash family (signature-in-band state)
    var sst = IncrementalDedup.simhashEmpty(docs, "doc_id", "text")
    var sAdded = 0L
    Seq(dupsOnly, empty, bulk, rest).foreach { b =>
      val s = IncrementalDedup.simhashStep(sst, b, "doc_id", "text")
      sst = s.state
      sAdded += s.pairsAdded
    }
    val sInc = sst.pairs.persist()
    val sFull = Dedup.simhashPairs(docs, "doc_id", "text").persist()
    assert(sInc.except(sFull).count() == 0 && sFull.except(sInc).count() == 0,
      "adversarial-split simhash state diverged from full recompute")
    assert(sAdded == sFull.count(), s"simhash pairsAdded $sAdded != ${sFull.count()}")
    sInc.unpersist(); sFull.unpersist()

    // same shapes through the PPJoin family (prefix-shingle buckets)
    var nst = IncrementalDedup.ngramEmpty(docs, "doc_id", "text")
    var nAdded = 0L
    Seq(empty, rest, dupsOnly, bulk).foreach { b =>
      val s = IncrementalDedup.ngramStep(nst, b, "doc_id", "text", threshold = 0.5)
      nst = s.state
      nAdded += s.pairsAdded
    }
    val nInc = nst.pairs.persist()
    val nFull = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5).persist()
    assert(nInc.except(nFull).count() == 0 && nFull.except(nInc).count() == 0,
      "adversarial-split ngram state diverged from full recompute")
    assert(nAdded == nFull.count(), s"ngram pairsAdded $nAdded != ${nFull.count()}")
    nInc.unpersist(); nFull.unpersist()
    Dedup.releaseCaches(spark)
  }

  test("retraction: filtered state == accumulation without the retracted docs") {
    // accumulate everything, retract the planted duplicates — state must be
    // row-identical to the full operator over the surviving corpus, and a
    // LATER step against the retracted state must stay exact
    val survivors = docs.filter(col("doc_id") < 100000L)
    val planted = docs.filter(col("doc_id") >= 100000L)
      .select(col("doc_id").as("id"))

    var st = IncrementalDedup.empty(docs, "doc_id", "text")
    (0 to 1).foreach { r =>
      st = IncrementalDedup.step(st, docs.filter(col("doc_id") % 2 === r),
        "doc_id", "text", threshold = 0.5).state
    }
    val cut = IncrementalDedup.retract(st, planted)
    val inc = cut.pairs.persist()
    val full = Dedup.minhashPairs(survivors, "doc_id", "text", threshold = 0.5).persist()
    assert(inc.except(full).count() == 0 && full.except(inc).count() == 0,
      "retracted minhash state diverged from full recompute on survivors")
    assert(cut.sets.join(planted, Seq("id"), "left_semi").count() == 0)
    inc.unpersist(); full.unpersist()

    // re-ingest the SAME ids after retraction (the precondition is restored):
    // accumulated pairs equal the full run on the original planted corpus
    val s2 = IncrementalDedup.step(cut,
      docs.filter(col("doc_id") >= 100000L), "doc_id", "text", threshold = 0.5)
    val inc2 = s2.state.pairs.persist()
    val full2 = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5).persist()
    assert(inc2.except(full2).count() == 0 && full2.except(inc2).count() == 0,
      "post-retraction step diverged")
    inc2.unpersist(); full2.unpersist()

    // the ngram twin: same filter argument over per-doc-pure prefixes
    var nst = IncrementalDedup.ngramEmpty(docs, "doc_id", "text")
    (0 to 1).foreach { r =>
      nst = IncrementalDedup.ngramStep(nst, docs.filter(col("doc_id") % 2 === r),
        "doc_id", "text", threshold = 0.5).state
    }
    val nInc = IncrementalDedup.ngramRetract(nst, planted).pairs.persist()
    val nFull = Dedup.ngramJaccardPairs(survivors, "doc_id", "text",
      threshold = 0.5).persist()
    assert(nInc.except(nFull).count() == 0 && nFull.except(nInc).count() == 0,
      "retracted ngram state diverged from full recompute on survivors")
    nInc.unpersist(); nFull.unpersist()
    Dedup.releaseCaches(spark)
  }

  test("a small batch touches few buckets and re-pairs only those") {
    // batches 1+2 = the accumulated corpus; batch 3 = 4 fresh planted docs
    val first = docs.filter(col("doc_id") < 100000L)
    val tiny = docs.filter(col("doc_id") < 4)
      .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
    val s1 = IncrementalDedup.step(
      IncrementalDedup.empty(docs, "doc_id", "text"), first, "doc_id", "text",
      threshold = 0.5)
    val totalBuckets = s1.state.banded.select("band", "bucket").distinct().count()
    val s2 = IncrementalDedup.step(s1.state, tiny, "doc_id", "text", threshold = 0.5)
    // per-batch work is bounded by the batch's bucket footprint (≤ docs ×
    // bands), independent of the accumulated corpus's bucket count
    assert(s2.touchedBuckets <= 4 * 16,
      s"tiny batch touched ${s2.touchedBuckets} buckets")
    assert(s2.touchedBuckets < totalBuckets,
      "touched-bucket footprint not smaller than the accumulated state")
    // each planted doc pairs with (at least) its identical original
    assert(s2.pairsAdded >= 4)
    val fresh = s2.state.pairs.filter(col("id_b") >= 200000L)
    assert(fresh.filter(col("jaccard") === 1.0).count() >= 4)
    Dedup.releaseCaches(spark)
  }
}
