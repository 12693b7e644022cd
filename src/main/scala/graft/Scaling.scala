package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-efficiency evidence for the north rule (N → 4N cores ≥ 0.8).
  *
  * No multi-node cluster exists in this sandbox, so the same job runs at two
  * `local[k]` parallelism levels (default 8 and 32) on the SAME input, and we
  * report throughput at both plus efficiency = T(N·cores) / (4 · T(N)) …
  * i.e. throughput ratio divided by the core ratio.
  *
  * The measured job is the full linkage pipeline: synthesize → extract →
  * normalize → block → salted pair join → score → match-edge count (the
  * clustering loop is excluded here because its round count is data- not
  * core-bound; Bench reports it separately).
  *
  * Usage: sbt "runMain graft.Scaling [nPages] [lowCores] [highCores]"
  */
object Scaling {

  def runOnce(cores: Int, nPages: Long): (Double, Long) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // warm-up: JIT + codegen caches, tiny slice
      val warm = operators.Linkage.scored(
        operators.Linkage.prepare(sources.Pages.synthesize(spark, 2000).toDF()))
      warm.filter(col("is_match")).count()

      val t0 = System.nanoTime()
      val scored = operators.Linkage.scored(
        operators.Linkage.prepare(sources.Pages.synthesize(spark, nPages).toDF()))
      val matches = scored.filter(col("is_match")).count()
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, matches)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nPages = args.lift(0).map(_.toLong).getOrElse(120000L)
    val low = args.lift(1).map(_.toInt).getOrElse(8)
    val high = args.lift(2).map(_.toInt).getOrElse(32)

    val (secLow, mLow) = runOnce(low, nPages)
    val (secHigh, mHigh) = runOnce(high, nPages)
    require(mLow == mHigh, s"match counts diverged: $mLow vs $mHigh")

    val thrLow = nPages / secLow
    val thrHigh = nPages / secHigh
    val eff = (thrHigh / thrLow) / (high.toDouble / low)
    println(
      f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","n_pages":$nPages,"matches":$mLow,"cores_low":$low,"sec_low":$secLow%.2f,"pages_per_sec_low":$thrLow%.1f,"cores_high":$high,"sec_high":$secHigh%.2f,"pages_per_sec_high":$thrHigh%.1f}""")
  }
}
