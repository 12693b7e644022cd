package graft

import java.nio.file.{Files, Paths}

/** Optimization-round tooling: writes `.explain("formatted")` for declared
  * queries to a directory (default `plans/r07`), one `<query>_<tag>.txt` per
  * query. Not part of the bench/verify measurement contract.
  *
  * Usage: runMain graft.PlanDump <tag> [query...]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_PLAN_DIR
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "before"
    val wanted = args.drop(1).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = Paths.get(sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r07"))
    Files.createDirectories(outDir)
    val spark = Sessions.local("graft-plandump", cpus)
    val names =
      if (wanted.nonEmpty) SparkEntry.queries.keys.filter(wanted).toSeq.sorted
      else SparkEntry.queries.keys.toSeq.sorted
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(outDir.resolve(s"${name}_$tag.txt"), plan)
        System.err.println(s"[plandump] $name OK (${plan.length} chars)")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
          Files.writeString(outDir.resolve(s"${name}_$tag.txt"),
            s"FAILED: ${e.getMessage}\n")
      }
      graft.operators.Dedup.releaseCaches(spark)
    }
    spark.stop()
  }
}
