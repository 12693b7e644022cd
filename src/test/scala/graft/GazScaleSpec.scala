package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Linkage, StaticParser}
import graft.sources.{Gazetteer, Pages}

/** Reference-scale gazetteer gates: the real PTT table is 73,305 rows
  * (map.py:82-88); parser candidate density, index size, and first-token
  * bucket collisions must be exercised at that scale, and the reference
  * parser cases must resolve identically against the merged full index. */
class GazScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val cases: Seq[(String, String, String, String)] = Seq(
    ("Caferağa Mah., Kadıköy / İstanbul No:12 D:5", "istanbul", "kadikoy", "caferaga"),
    ("Etiler mahallesi Beşiktaş İstanbul sk. 14", "istanbul", "besiktas", "etiler"),
    ("Kızılay Çankaya / Ankara cd:5 sk:9", "ankara", "cankaya", "kizilay"),
    ("Acıbadem Mah Kadıköy İstanbul 3blok", "istanbul", "kadikoy", "acibadem"),
    ("Levent mah. Besiktas / Istanbul", "istanbul", "besiktas", "levent"),
    ("Etlik mh keçiören ankara no:10", "ankara", "kecioren", "etlik"),
  )

  test("73k gazetteer: exact PTT row count; dense index; cases unchanged") {
    val t0 = System.nanoTime()
    val full = Gazetteer.rowsFull
    val t1 = System.nanoTime()
    assert(full.size == 73305, s"got ${full.size}")
    assert(full.map(_.province).distinct.size == 81)
    val idxFull = Gazetteer.buildIndex(full)
    val t2 = System.nanoTime()
    info(f"rows gen ${(t1 - t0) / 1e9}%.2f s; index build ${(t2 - t1) / 1e9}%.2f s")

    // first-token bucket density: the two-token name families must land in
    // shared buckets (the collision behavior the 41-row pool cannot show)
    val maxBucket = idxFull.nbhdIndex.values.map(_.length).max
    info(s"nbhd index: buckets=${idxFull.nbhdIndex.size} max_bucket=$maxBucket")
    assert(maxBucket >= 500, s"max bucket $maxBucket — no realistic density")

    // reference parser cases resolve identically against the merged index
    for ((in, p, d, n) <- cases) {
      val (gp, gd, gn) = StaticParser.parseOne(in, idxFull)
      assert(gp.contains(p) && gd.contains(d) && gn.contains(n),
        s"\n inp: $in\n got: ($gp, $gd, $gn)\n exp: ($p, $d, $n) [73k index]")
    }
    // pool hierarchy restriction sets are untouched by the expansion
    val small = Gazetteer.buildIndex()
    assert(idxFull.pairToNbhds(("izmir", "bornova")) == small.pairToNbhds(("izmir", "bornova")))
    assert(idxFull.distToFirstProv("kadikoy") == "istanbul")
  }

  test("distributed parse throughput against the 73k broadcast index") {
    val bIdx = StaticParser.broadcastIndex(spark, Gazetteer.rowsFull)
    val prep = Linkage.extract(Pages.synthesize(spark, 6000).toDF())
      .select("url", "extracted")
    val t0 = System.nanoTime()
    val n = StaticParser.parse(prep, "extracted", bIdx)
      .filter(col("province").isNotNull).count()
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"parsed 6000 pages @73k gazetteer in $sec%.2f s (${6000 / sec}%.0f pages/s); $n resolved")
    assert(n >= 5000, s"only $n of 6000 resolved a province")
  }
}
