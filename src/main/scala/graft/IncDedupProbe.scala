package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.IncrementalDedup

/** Micro-benchmark for the incremental dedup economics (BENCH.md evidence;
  * not part of the driver contract). Two questions:
  *
  *  1. Full-operator prefix ORDER: frequency-ordered (adaptive, needs a
  *     corpus aggregate + join + rank window; rarest-first pruning) vs
  *     content-hash-ordered (in-row, shuffle-free; no pruning bias). Same
  *     verified output by construction — this times the trade.
  *  2. Incremental step cost: accumulate state on ~99% of the corpus, then
  *     time ONE step over the remaining ~1% batch, vs the full recompute on
  *     100% — the asymmetry a continuously-fed pipeline actually buys.
  *
  * Usage: sbt "runMain graft.IncDedupProbe [sfDir] [reps]"
  */
object IncDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Sessions.local("graft-incprobe", "32")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).repartition(32).persist()
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).repartition(32).persist()
    val nDocs = docs.count(); vecs.count()
    println(s"PROBE corpus docs=$nDocs")

    def time(name: String)(body: => Long): Unit = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val rows = body
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      println(f"PROBE $name best=${runs.map(_._1).min}%.3f " +
        f"secs=${runs.map(r => f"${r._1}%.3f").mkString(",")} rows=${runs.head._2}")
    }

    // ---- 1. full-operator prefix order: frequency vs content hash --------
    time("ngram_full_freq_order") {
      val n = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.8).count()
      Dedup.releaseCaches(spark); n
    }
    // freq order again, but the per-doc rank window replaced by a hash agg
    // + in-row sort of (f, shingle) structs — same total order, same rk,
    // byte-identical output; times the exchange+sort vs hash-agg trade
    time("ngram_full_freq_agg_order") {
      val sets = Dedup.trackPersist(
        Dedup.shingleSets(docs, "doc_id", "text", 3).filter(col("nsh") > 0))
      val exploded = sets.select(col("id"), col("nsh"), explode(col("sh")).as("shingle"))
      val freq = exploded.groupBy("shingle").agg(count(lit(1)).as("f"))
      val plen = (col("nsh") - ceil(col("nsh") * 0.8) + 1).cast("int")
      val prefix = Dedup.trackPersist(exploded.join(freq, "shingle")
        .groupBy(col("id"), col("nsh"))
        .agg(array_sort(collect_list(struct(col("f"), col("shingle")))).as("fs"))
        .select(col("id"), col("nsh"), posexplode(slice(col("fs"), lit(1), plen)))
        .select(col("col.shingle").as("shingle"), col("id"), col("nsh"),
          (col("pos") + 1).cast("int").as("rk")))
      val cand = Dedup.ppjoinCandidates(prefix, 0.8, 1000)
      val n = Dedup.verifiedJaccard(cand, sets)
        .filter(col("jaccard") >= 0.8).count()
      Dedup.releaseCaches(spark); n
    }
    time("ngram_full_hash_order") {
      val sets = Dedup.trackPersist(
        Dedup.shingleSets(docs, "doc_id", "text", 3).filter(col("nsh") > 0))
      val prefix = Dedup.trackPersist(Dedup.hashOrderedPrefix(sets, 0.8))
      val cand = Dedup.ppjoinCandidates(prefix, 0.8, 1000)
      val n = Dedup.verifiedJaccard(cand, sets)
        .filter(col("jaccard") >= 0.8).count()
      Dedup.releaseCaches(spark); n
    }

    // ---- 1b. candidate volume per order: natural vs boilerplate corpus ---
    // The scale-deciding quantity is candidate VOLUME, not local wall-clock:
    // frequency order excludes corpus-hot shingles from every prefix by
    // construction; hash order samples prefixes blindly, so one boilerplate
    // phrase shared by all documents floods its shingles' buckets.
    def candCounts(corpus: DataFrame, label: String): Unit = {
      val sets = Dedup.trackPersist(
        Dedup.shingleSets(corpus, "doc_id", "text", 3).filter(col("nsh") > 0))
      val exploded = sets.select(col("id"), col("nsh"), explode(col("sh")).as("shingle"))
      val freqTab = exploded.groupBy("shingle").agg(count(lit(1)).as("f"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col("f"), col("shingle"))
      val freqPrefix = Dedup.trackPersist(exploded.join(freqTab, "shingle")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= col("nsh") - ceil(col("nsh") * 0.8) + 1)
        .select(col("shingle"), col("id"), col("nsh"), col("rk")))
      val hashPrefix = Dedup.trackPersist(Dedup.hashOrderedPrefix(sets, 0.8))
      val cf = Dedup.ppjoinCandidates(freqPrefix, 0.8, 1000).count()
      val ch = Dedup.ppjoinCandidates(hashPrefix, 0.8, 1000).count()
      println(s"PROBE candidates[$label] freq_order=$cf hash_order=$ch")
      Dedup.releaseCaches(spark)
    }
    candCounts(docs, "natural")
    // every doc shares one 12-token boilerplate header (the Zipfian shape of
    // webtext: navigation chrome, legal footers, templated intros)
    val boiler = docs.withColumn("text",
      concat(lit("copyright acme corp all rights reserved terms of use privacy policy page "),
        col("text")))
    candCounts(boiler, "boilerplate")

    // ---- 2. one ~1% batch step vs full recompute, per family -------------
    // State accumulated on the big part OUTSIDE the timed region and pinned
    // with explicit persists (releaseCaches between reps would otherwise
    // drop the accumulated state and charge its recompute to the step).
    val big = docs.filter(col("doc_id") % 100 =!= 0)
    val batch = docs.filter(col("doc_id") % 100 === 0).persist()
    val nBatch = batch.count()
    println(s"PROBE batch docs=$nBatch")
    def pin(df: DataFrame): DataFrame = { val p = df.persist(); p.count(); p }

    {
      val st = IncrementalDedup.step(IncrementalDedup.empty(docs, "doc_id", "text"),
        big, "doc_id", "text", threshold = 0.5).state
      val pinned = IncrementalDedup.State(pin(st.sets), pin(st.banded), pin(st.pairs))
      time("minhash_incremental_step")(
        IncrementalDedup.delta(pinned, batch, "doc_id", "text", threshold = 0.5).pairs.count())
      Dedup.releaseCaches(spark)
      time("minhash_full_recompute") {
        val n = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5).count()
        Dedup.releaseCaches(spark); n
      }
    }
    {
      val st = IncrementalDedup.simhashStep(
        IncrementalDedup.simhashEmpty(docs, "doc_id", "text"),
        big, "doc_id", "text").state
      val pinned = IncrementalDedup.SimhashState(pin(st.banded), pin(st.pairs))
      time("simhash_incremental_step")(
        IncrementalDedup.simhashDelta(pinned, batch, "doc_id", "text").pairs.count())
      Dedup.releaseCaches(spark)
      time("simhash_full_recompute") {
        val n = Dedup.simhashPairs(docs, "doc_id", "text").count()
        Dedup.releaseCaches(spark); n
      }
    }
    {
      val st = IncrementalDedup.ngramStep(
        IncrementalDedup.ngramEmpty(docs, "doc_id", "text", threshold = 0.8),
        big, "doc_id", "text", threshold = 0.8).state
      val pinned = IncrementalDedup.NgramState(pin(st.sets), pin(st.prefix), pin(st.pairs))
      time("ngram_incremental_step")(
        IncrementalDedup.ngramDelta(pinned, batch, "doc_id", "text",
          threshold = 0.8).pairs.count())
      Dedup.releaseCaches(spark)
      // full-recompute twin already timed above (ngram_full_freq_order)
    }
    {
      val vBig = vecs.filter(col("vec_id") % 100 =!= 0)
      val vBatch = vecs.filter(col("vec_id") % 100 === 0).persist()
      vBatch.count()
      val st = IncrementalDedup.embedStep(
        IncrementalDedup.embedEmpty(vecs, "vec_id", "embedding"),
        vBig, "vec_id", "embedding", threshold = 0.95).state
      val pinned = IncrementalDedup.EmbedState(pin(st.vecs), pin(st.banded), pin(st.pairs))
      time("embed_incremental_step")(
        IncrementalDedup.embedDelta(pinned, vBatch, "vec_id", "embedding",
          threshold = 0.95).pairs.count())
      Dedup.releaseCaches(spark)
      time("embed_full_recompute") {
        val n = Dedup.embeddingPairs(vecs, "vec_id", "embedding", threshold = 0.95).count()
        Dedup.releaseCaches(spark); n
      }
    }

    // ---- 3. incremental CC at 1M nodes: 1k-edge batch vs full recompute ---
    // 100k path components of 10 nodes each; the batch merges 1k random
    // component pairs. The step's work is the batch contraction + a star
    // iteration over ≤2k labels + one broadcast substitution — independent
    // of the 1M-node assignment; the full operator pays O(log n) rounds of
    // edge-set shuffles every time.
    {
      import graft.operators.ConnectedComponents
      import graft.streaming.IncrementalCC
      val n = 1000000L
      val pathEdges = spark.range(n - 1).filter(pmod(col("id"), lit(10)) =!= 9)
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
        .repartition(32).persist()
      val batch = spark.range(1000)
        .select(pmod(col("id") * 7919, lit(n)).as("src"),
          pmod(col("id") * 104729 + 13, lit(n)).as("dst"))
        .filter(col("src") =!= col("dst")).persist()
      batch.count()
      var full: DataFrame = null
      time("cc_full_recompute_900k_edges") {
        full = ConnectedComponents.run(pathEdges)
        full.count()
      }
      val assign = pin(full)
      time("cc_incremental_step_1k_batch")(
        IncrementalCC.step(assign, batch).assign.count())
      Dedup.releaseCaches(spark)
    }
    spark.stop()
  }
}
