package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs the headline queries on
  * `SPARK_GRAFT_SF_DIR` at `local[SPARK_GRAFT_CPUS]`, prints ONE JSON line.
  *
  * Robustness (round-2/4/5 verdict items — the record must SHED host
  * contention, not merely flag it):
  *  - per-query samples come from INTERLEAVED suite passes (pass 1 runs every
  *    query, then pass 2, …) — the first pass absorbs JVM/JIT/page-cache
  *    warm-up, and a query's samples land minutes apart so one sustained
  *    contended host window can't poison all of them;
  *  - the official per-query time is the MIN over all of a query's samples:
  *    contention can only ever slow a sample down, so the minimum is the
  *    least-contaminated observation, and interleaving makes the samples
  *    land in different windows (a mid-pass spike measured 34 s for a 3 s
  *    query INSIDE a pass whose probe brackets were quiet — pass-level
  *    acceptance alone cannot see it, per-query minima shed it);
  *  - every pass is BRACKETED by a fixed-work calibration probe (pure-CPU
  *    xxhash64 fold, deterministic plan). A pass is CLEAN iff both bracketing
  *    probes are within `CleanRatio` (1.3×) of the session-best probe; when
  *    no pass is clean after the minimum `runs` passes, EXTRA passes run
  *    (cap `SPARK_GRAFT_BENCH_MAX_RUNS`, default 6) until one is — so a
  *    contended window costs extra passes (more minima to choose from), not
  *    the record. For the RECORD, cleanliness is recomputed against the
  *    final session-best probe (early probes can themselves be contended —
  *    measured 0.46 s early vs a 0.13 s same-session floor — which would
  *    make a running baseline too lax): `official_window:"flagged"` means
  *    no pass was bracket-clean against the true session floor;
  *  - the cold-pipeline throughput samples are individually probe-bracketed
  *    (probe immediately before and after each ~2 s sample, so bracket
  *    cleanliness IS reliable there): official cold = min over probe-clean
  *    samples, with extra cold runs until one is clean;
  *  - a DISCARDED warm-up (one full pipeline run + probe) precedes all
  *    measurement: it absorbs JVM/JIT/page-cache warm-up and seeds the
  *    probe floor, so pass acceptance runs against a realistic session
  *    floor (round-6 records were retro-flagged when acceptance used a
  *    stale, still-warming floor that later probes undercut);
  *  - everything stays in the JSON: all per-query samples, all probe times,
  *    `contention_ratio` (max/min probe), `clean_passes`, `cold_clean`;
  *  - failures are RECORDED, not swallowed: a crashing query lands in
  *    `failed` with its message and is excluded from `total`/`pages_per_sec`;
  *  - the JSON line is also written to `SPARK_GRAFT_BENCH_OUT` (default
  *    `BENCH_LOCAL.json` in the cwd) so the official record survives sbt log
  *    noise (`"parsed": null` in BENCH_r01).
  *
  * Extra keys beyond the required contract: `pages_per_sec` (pages pushed
  * through the full linkage pipeline per second — the north-rule throughput
  * metric) and `n_pages`.
  */
object Bench {

  /** Headline subset: one per operator family, weighted toward the flagship
    * linkage pipeline. (Full catalog correctness runs under Verify.) */
  val headline: Seq[String] = Seq(
    "q_norm_punct", "q_levenshtein", "q_token_jaccard", "q_jaro_winkler",
    "q_agg_lineitem", "q_join_agg", "q_topk_window", "q_events_window",
    "q_token_count", "q_lang_id", "q_quality",
    "q_dedup_exact", "q_dedup_bow", "q_minhash_pairs", "q_simhash_pairs",
    "q_ngram_jaccard", "q_ann_topk", "q_ann_ivf",
    "q_pages_extract", "q_parse_full_gaz", "q_ner_outputs", "q_scored_pairs",
    "q_entities", "q_linkage_f1")

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"; case '\r' => "\\r"
    case '\t' => "\\t"; case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  }

  /** A pass/sample is clean iff its bracketing probes are within this factor
    * of the session-best probe time. */
  val CleanRatio = 1.3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val maxRuns = math.max(runs,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_RUNS", "6").toInt)
    val spark = Sessions.local("graft-bench", cpus)

    // Fixed-work calibration probe (bit_xor of xxhash64 over a fixed range —
    // pure CPU, no I/O, deterministic plan). Probe times bracket every
    // measurement window; a window whose brackets run slow was contended and
    // its samples are excluded from the official numbers (see class doc).
    def probe(): Double = {
      val t0 = System.nanoTime()
      // bit_xor, not sum: a sum of 1.2B xxhash64 longs overflows under ANSI
      // mode (same reason the CC fingerprint folds with bit_xor). 1.2B ops
      // ≈ 0.4 s quiet at 32 cores — long enough that the probe's own
      // variance doesn't dominate the bracket test (400M was ~0.13 s and
      // scheduler jitter alone spanned 2×)
      spark.range(0L, 1200000000L, 1, cpus.toInt)
        .selectExpr("bit_xor(xxhash64(id)) AS s").collect()
      (System.nanoTime() - t0) / 1e9
    }
    probe() // JIT warm-up for the probe plan itself; discarded
    val calib = scala.collection.mutable.ArrayBuffer[Double]()

    val names = headline.filter(SparkEntry.queries.contains)
    val samples = scala.collection.mutable.LinkedHashMap(
      names.map(n => n -> scala.collection.mutable.ArrayBuffer[Double]()): _*)
    val errs = scala.collection.mutable.LinkedHashMap[String, String]()

    // ---- warm-up (discarded) ----
    // One full cold-pipeline run + probes, counted NOWHERE: it absorbs the
    // JVM/JIT/page-cache warm-up the first measured window otherwise pays,
    // and seeds `calib` with post-warm-up probes so the pass loop accepts
    // itself against a realistic session floor (round-6 records were
    // retro-flagged because acceptance ran on a stale, still-warming floor
    // that later probes undercut; running the COLD section first instead
    // was measured to cost the cold metric its JVM-warm comparability —
    // best cold 1.41 s warm vs 1.99 s cold-JVM).
    val nPages = Queries.pagesFor(sfDir)
    SparkEntry.queries.get("q_scored_pairs").foreach { fn =>
      Queries.resetPipelineCache(spark)
      graft.operators.Dedup.releaseCaches(spark)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up run failed: ${e.getMessage}") }
      Queries.resetPipelineCache(spark)
      graft.operators.Dedup.releaseCaches(spark)
    }
    calib += probe()

    // ---- per-query pass loop ----
    // pass brackets tracked explicitly as (before, after) probe PAIRS — the
    // cold section above contributes probes to `calib`, so positional
    // indexing would mis-associate probes with passes
    val passBrackets = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    var passBefore = probe(); calib += passBefore
    var pass = 0
    var done = false
    while (!done) {
      pass += 1
      for (name <- names) {
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          samples(name) += (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            errs(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        }
        // dedup intermediates are per-invocation: release between queries so
        // the suite doesn't accumulate cache blocks across passes (the
        // shared linkage-pipeline cache in Queries is deliberately kept)
        graft.operators.Dedup.releaseCaches(spark)
      }
      val passAfter = probe(); calib += passAfter
      passBrackets += ((passBefore, passAfter)); passBefore = passAfter
      // adaptive: past the minimum pass count, keep going only while NO pass
      // is probe-clean (cap maxRuns — a genuinely unusable host stays
      // flagged). The floor already includes the cold section's probes, so
      // acceptance here is against the real session floor, not a warming one.
      val anyClean = passBrackets.exists { case (b, a) =>
        b <= CleanRatio * calib.min && a <= CleanRatio * calib.min }
      done = (pass >= runs && anyClean) || pass >= maxRuns
      if (!done)
        System.err.println(f"[bench] pass $pass noisy (probes ${calib.map(c => f"$c%.2f").mkString(",")}) — running extra pass")
    }
    // Official per-query time: min over ALL samples (see class doc — the min
    // is the least-contaminated observation; extra passes exist to supply
    // more minima when the probes say the window was dirty). A query is
    // failed only if NO pass succeeded — a valid measurement from pass 1 is
    // not discarded by a transient failure on pass 2 (round-2 ADVICE); the
    // error is still reported alongside.
    val ok = names.collect { case n if samples(n).nonEmpty => n -> samples(n).min }
    val failed = names.collect { case n if samples(n).isEmpty && errs.contains(n) => n -> errs(n) }
    val flaky = names.collect { case n if samples(n).nonEmpty && errs.contains(n) => n -> errs(n) }

    // ---- cold-pipeline throughput ----
    // North-rule metric: pages through the FULL cold scored pipeline
    // (synthesize→extract→normalize→block→pair→score) per second — pipeline
    // memo + dedup caches dropped before each sample, JVM warm (the
    // comparable configuration; see warm-up note above). Each ~2 s sample
    // is bracketed IMMEDIATELY by probes; official = min over probe-clean
    // samples, extra runs until one is clean; everything stays in the JSON.
    val coldRunsN = sys.env.getOrElse("SPARK_GRAFT_COLD_RUNS", "3").toInt
    val coldMax = math.max(coldRunsN,
      sys.env.getOrElse("SPARK_GRAFT_COLD_MAX_RUNS", "6").toInt)
    val coldSamples = scala.collection.mutable.ArrayBuffer[Double]()
    val coldBrackets = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    SparkEntry.queries.get("q_scored_pairs").foreach { fn =>
      var before = probe(); calib += before
      var i = 0
      var coldDone = false
      while (!coldDone) {
        i += 1
        Queries.resetPipelineCache(spark)
        graft.operators.Dedup.releaseCaches(spark)
        val t0 = System.nanoTime()
        val sample = try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] cold run $i failed: ${e.getMessage}")
            None
        }
        val after = probe(); calib += after
        sample.foreach { s => coldSamples += s; coldBrackets += ((before, after)) }
        before = after
        val anyCleanSoFar = coldBrackets.exists { case (b, a) =>
          b <= CleanRatio * calib.min && a <= CleanRatio * calib.min }
        coldDone = (i >= coldRunsN && anyCleanSoFar) || i >= coldMax
      }
    }

    // RECORD-level cleanliness against the FINAL session-best probe (early
    // probes can themselves be contended; a running baseline is too lax)
    val floor = calib.min
    val coldClean = coldBrackets.map { case (b, a) =>
      b <= CleanRatio * floor && a <= CleanRatio * floor }
    val cleanPasses = passBrackets.zipWithIndex.collect {
      case ((b, a), i) if b <= CleanRatio * floor && a <= CleanRatio * floor => i + 1
    }.toSeq
    val officialClean = cleanPasses.nonEmpty
    val coldOfficial = coldSamples.indices.collect {
      case i if coldClean(i) => coldSamples(i)
    }
    val coldBest =
      if (coldOfficial.nonEmpty) Some(coldOfficial.min)
      else if (coldSamples.nonEmpty) Some(coldSamples.min)
      else None
    val pagesPerSec = coldBest.map(nPages / _).getOrElse(0.0)
    val coldJson = coldSamples.map(s => f"$s%.3f").mkString("[", ",", "]")
    val coldCleanJson = coldClean.map(_.toString).mkString("[", ",", "]")

    val qs = ok.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val fs = failed.map { case (k, m) => "\"" + k + "\":\"" + jsonEscape(m) + "\"" }
      .mkString("{", ",", "}")
    val fl = flaky.map { case (k, m) => "\"" + k + "\":\"" + jsonEscape(m) + "\"" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val sampJson = names.map { n =>
      "\"" + n + "\":" + samples(n).map(s => f"$s%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val calibJson = calib.map(s => f"$s%.3f").mkString("[", ",", "]")
    val contention = if (calib.nonEmpty) calib.max / calib.min else 1.0
    val cleanPassesJson = cleanPasses.mkString("[", ",", "]")
    val officialWindow =
      if (officialClean && (coldSamples.isEmpty || coldOfficial.nonEmpty)) "clean"
      else "flagged"
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"samples":$sampJson,"failed":$fs,"flaky":$fl,"sf":"$sfDir","n_pages":$nPages,"pages_per_sec":$pagesPerSec%.1f,"cold_pipeline_secs":$coldJson,"cold_clean":$coldCleanJson,"calibration_secs":$calibJson,"contention_ratio":$contention%.2f,"clean_passes":$cleanPassesJson,"official_window":"$officialWindow","runs_per_query":$pass}"""
    println(json)
    // sentinel line so the driver's parser finds the record in sbt log noise
    // ("parsed": null in BENCH_r01/r02) regardless of surrounding output
    println("GRAFT_BENCH_JSON: " + json)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try Files.writeString(Paths.get(outFile), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outFile failed: ${e.getMessage}") }
    spark.stop()
  }
}
