package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot scale proofs beyond the per-level Scaling bench:
  *
  *  - `full`: the COMPLETE pipeline (synthesize → … → connected components →
  *    entity ids) at a large page count, reporting cluster statistics — the
  *    clustering loop is the only stage Scaling excludes;
  *  - `skew`: a pathological world where a huge slice of pages lands in ONE
  *    blocking key, demonstrating that salted pair generation bounds task
  *    size (this is the case where a naive self-join dies at web scale).
  *
  * Usage: sbt "runMain graft.ScaleProof full 960000"
  *        sbt "runMain graft.ScaleProof skew 20000"
  */
object ScaleProof {

  def main(args: Array[String]): Unit = {
    val mode = args.lift(0).getOrElse("full")
    val n = args.lift(1).map(_.toLong).getOrElse(960000L)
    var b = SparkSession.builder().appName(s"graft-scaleproof-$mode")
      .config("spark.eventLog.enabled", sys.env.getOrElse("SPARK_GRAFT_EVENTLOG", "false"))
      .config("spark.eventLog.dir", "/tmp/spark-events")
    b = Sessions.masterIfUnset(b, "local[32]")
    b = Sessions.configIfUnset(b, "spark.sql.shuffle.partitions", "32")
    b = Sessions.configIfUnset(b, "spark.sql.adaptive.enabled", "true")
    b = Sessions.configIfUnset(b, "spark.sql.session.timeZone", "UTC")
    b = Sessions.configIfUnset(b, "spark.ui.enabled", "false")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    mode match {
      case "full" =>
        val t0 = System.nanoTime()
        val ents = operators.Linkage.entities(
          sources.Pages.synthesize(spark, n).toDF(),
          operators.StaticParser.broadcastIndex(spark))
        val agg = ents.agg(
          count(lit(1)).as("rows"),
          countDistinct(col("entity_id")).as("clusters"),
          sum(when(col("province").isNotNull, 1).otherwise(0)).as("parsed_province")).head()
        val sec = (System.nanoTime() - t0) / 1e9
        val nEnt = n / sources.Pages.VariantsPerEntity
        println(f"""{"metric":"full_pipeline","n_pages":$n,"sec":$sec%.2f,"pages_per_sec":${n / sec}%.1f,"rows":${agg.getLong(0)},"clusters":${agg.getLong(1)},"gold_entities":$nEnt,"parsed_province":${agg.getLong(2)}}""")

      case "skew" =>
        // all pages share one entity's block key but differ in bina → one
        // giant block; maxBlock=1000 splits it into s=ceil(n/1000) buckets
        val t0 = System.nanoTime()
        val one = sources.Pages.entityOf(42L, 1L)
        import spark.implicits._
        val pages = spark.range(n).map { id =>
          val bina = 1 + (id % 150).toInt
          (s"https://skew.test/p$id",
            s"Adres: ${one.rawNbhd} mah ${one.street} sk No:$bina ${one.rawDistrict} ${one.rawProvince} ${one.gaz.postcode} Tel: 05551112233")
        }.toDF("url", "text")
          .withColumn("warc_ts", lit(java.sql.Timestamp.valueOf("2026-01-15 00:00:00")))
          .withColumn("html", lit(Array.empty[Byte])).withColumn("lang", lit("tr"))
        val prep = operators.Linkage.prepare(pages)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nKeys = prep.select("block_key").distinct().count()
        val cands = operators.Linkage.candidates(prep)
        val nPairs = cands.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val expected = n * (n - 1) / 2
        println(f"""{"metric":"skew_block","n_pages":$n,"distinct_keys":$nKeys,"pairs":$nPairs,"expected_pairs":$expected,"sec":$sec%.2f,"salt_buckets":${math.ceil(n / 1000.0).toInt}}""")
    }
    spark.stop()
  }
}
