package graft

import org.apache.spark.sql.functions._

/** Micro-benchmark for the native-vs-Column signature expressions
  * (BENCH.md evidence; not part of the driver contract).
  *
  * Usage: sbt "runMain graft.PerfProbe [sfDir] [reps]" — times, per rep,
  * a full materialization (noop write) of each signature over the documents /
  * embeddings tables, native and Column formulations side by side.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Sessions.local("graft-perfprobe", "32")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        array_distinct(graft.functions.TextFunctions.shingles(col("text"), 3)).as("sh"))
      .repartition(32).persist()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).repartition(32).persist()
    docs.count(); emb.count() // materialize inputs outside the timed region

    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PERFPROBE $name best=${secs.min}%.3f secs=${secs.map(s => f"$s%.3f").mkString(",")}")
    }

    time("minhash_native")(docs.select(operators.Dedup.minhashSignature(col("sh"), 64)))
    time("minhash_column")(docs.select(operators.Dedup.minhashSignatureColumns(col("sh"), 64)))
    time("hyperplane_native")(emb.select(operators.Dedup.hyperplaneSignature(col("embedding"), 24)))
    time("hyperplane_column")(emb.select(operators.Dedup.hyperplaneSignatureColumns(col("embedding"), 24)))
    spark.stop()
  }
}
