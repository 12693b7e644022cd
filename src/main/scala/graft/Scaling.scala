package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-efficiency evidence for the north rule (N → 4N cores ≥ 0.8).
  *
  * No multi-node cluster exists in this sandbox, so the same job runs at two
  * `local[k]` parallelism levels on the SAME input, each level in its own
  * fresh JVM (same-JVM back-to-back runs share JIT state and skew the
  * comparison), with repeated measurements after a warm-up; the steady-state
  * (minimum) time per level feeds efficiency = (thr_high / thr_low) / (4N/N).
  *
  * The measured job is the full linkage hot path: synthesize → extract →
  * normalize → block → salted pair join → score → match-edge count. The
  * clustering loop is excluded (round count is data- not core-bound; Bench
  * reports it separately).
  *
  * Usage: sbt "runMain graft.Scaling <nPages> <cores> [reps]"   (one level)
  * Efficiency across levels is assembled in BENCH/BASELINE.md.
  */
object Scaling {

  def main(args: Array[String]): Unit = {
    val nPages = args.lift(0).map(_.toLong).getOrElse(120000L)
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)

    val spark = Sessions.local(s"graft-scaling-$cores", cores.toString)

    def once(): (Double, Long) = {
      val t0 = System.nanoTime()
      val prepared = operators.Linkage.prepare(
        sources.Pages.synthesize(spark, nPages).toDF())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val matches = operators.Linkage.scored(prepared)
        .filter(col("is_match")).count()
      prepared.unpersist(blocking = true)
      ((System.nanoTime() - t0) / 1e9, matches)
    }

    once() // warm-up: JIT + codegen + shuffle services at full size
    val runs = (1 to reps).map(_ => once())
    require(runs.map(_._2).distinct.size == 1, s"match counts diverged: $runs")
    val secs = runs.map(_._1)
    val best = secs.min
    val secsJson = secs.map(s => f"$s%.2f").mkString("[", ",", "]")
    println(
      f"""{"metric":"scaling_level","cores":$cores,"n_pages":$nPages,"matches":${runs.head._2},"secs":$secsJson,"best_sec":$best%.2f,"pages_per_sec":${nPages / best}%.1f}""")
    spark.stop()
  }
}
