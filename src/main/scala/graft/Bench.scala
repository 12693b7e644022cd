package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs the headline queries on
  * `SPARK_GRAFT_SF_DIR` at `local[SPARK_GRAFT_CPUS]`, prints ONE JSON line.
  *
  * Robustness (round-2 verdict items):
  *  - best-of-2 per query — the first pass absorbs JVM/JIT/page-cache warm-up
  *    and host contention spikes (the round-1 official record was 3.7× the
  *    reproducible number on a single cold run);
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

    // (name, best-time-or-None, errorMessage)
    val results: Seq[(String, Option[Double], Option[String])] =
      headline.flatMap { name =>
        SparkEntry.queries.get(name).map { fn =>
          var best = Double.MaxValue
          var err: Option[String] = None
          var r = 0
          while (r < runs) {
            val t0 = System.nanoTime()
            try {
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              val sec = (System.nanoTime() - t0) / 1e9
              best = math.min(best, sec)
            } catch {
              case e: Throwable =>
                System.err.println(s"[bench] $name run ${r + 1} failed: ${e.getMessage}")
                err = Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
            }
            r += 1
          }
          // dedup intermediates are per-invocation: release between queries
          // so best-of-N doesn't accumulate cache blocks across the suite
          // (the shared linkage-pipeline cache in Queries is deliberately kept)
          graft.operators.Dedup.releaseCaches(spark)
          // a query is failed only if NO run succeeded — a valid measurement
          // from run 1 is not discarded by a transient failure on run 2
          // (round-2 ADVICE); the error is still reported alongside.
          (name, if (best < Double.MaxValue) Some(best) else None, err)
        }
      }

    val ok = results.collect { case (n, Some(t), _) => n -> t }
    val failed = results.collect { case (n, None, Some(m)) => n -> m }
    // succeeded at least once but also had a failing run — timing kept
    val flaky = results.collect { case (n, Some(_), Some(m)) => n -> m }

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
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$fs,"flaky":$fl,"sf":"$sfDir","n_pages":$nPages,"pages_per_sec":$pagesPerSec%.1f,"cold_pipeline_secs":$coldJson,"runs_per_query":$runs}"""
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
