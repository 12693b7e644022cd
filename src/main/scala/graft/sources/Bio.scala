package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TrText

/** One BIO training sample (ref group_A2E_BIO_synth.py:313,424:
  * raw + parallel token/tag arrays). */
case class BioSample(raw: String, tokens: Array[String], tags: Array[String],
                     sample_id: Long, group: String)

/** Seeded BIO-corpus synthesis + CoNLL sink/reader + distribution stats —
  * the Spark-native re-expression of the reference's synthetic-data pipeline
  * (SURVEY.md §2.5 S1–S9, §2.7 V1).
  *
  * Samples are composed from tagged segments exactly like the reference's
  * generators (admin units from the gazetteer pools, keyword variants,
  * probabilistic segment composition), driven by the same counter-based
  * hash RNG as [[Pages]] — `spark.range(n)` → kernel, deterministic at any
  * partitioning.
  */
object Bio {

  /** Tagged segment: tokens + entity type (O for noise). */
  private def seg(tpe: String, toks: String*): Seq[(String, String)] = {
    toks.zipWithIndex.map { case (t, i) =>
      (t, if (tpe == "O") "O" else (if (i == 0) "B-" else "I-") + tpe)
    }
  }

  def sampleOf(seed: Long, id: Long): BioSample = {
    import Pages._
    val ent = entityOf(seed, id)
    val r = rng(seed, id, 60)

    val nbhdKw = pick(IndexedSeq("mahallesi", "mah", "mh"), seed, id, 61)
    val streetKw = if (ent.isAvenue) pick(IndexedSeq("caddesi", "cad", "cd"), seed, id, 62)
                   else pick(IndexedSeq("sokak", "sk", "sok"), seed, id, 63)
    val streetType = if (ent.isAvenue) "CADDE" else "SOKAK"

    var segments = Seq(
      seg("MAHALLE", (ent.rawNbhd.split(" ") :+ nbhdKw): _*),
      seg(streetType, (ent.street.split(" ") :+ streetKw): _*),
      seg("BINA_NO", "no", ":", ent.bina.toString))
    // optional floor/flat (ref S2 KAT/DAIRE_NO emitters)
    if ((r & 3) == 0)
      segments :+= seg("KAT", "kat", ":", (1 + ((rng(seed, id, 64) >>> 1) % 9)).toString)
    if ((r & 7) == 1)
      segments :+= seg("DAIRE_NO", "daire", ":", (1 + ((rng(seed, id, 65) >>> 1) % 40)).toString)
    // admin block: district / province + postcode (ref S3 admin pair)
    val admin = (rng(seed, id, 66) & 3) match {
      case 0 => seg("ILCE", ent.rawDistrict.split(" "): _*) ++ seg("O", "/") ++
                seg("IL", ent.rawProvince.split(" "): _*) ++
                seg("POSTA_KODU", ent.gaz.postcode)
      case 1 => seg("POSTA_KODU", ent.gaz.postcode) ++
                seg("ILCE", ent.rawDistrict.split(" "): _*) ++
                seg("IL", ent.rawProvince.split(" "): _*)
      case _ => seg("IL", ent.rawProvince.split(" "): _*) ++
                seg("ILCE", ent.rawDistrict.split(" "): _*) ++
                seg("POSTA_KODU", ent.gaz.postcode)
    }
    var flat = segments.flatten ++ admin
    // trailing country token tagged O (ref noise injector :263-310)
    if ((rng(seed, id, 67) & 7) == 0)
      flat = flat ++ seg("O", pick(IndexedSeq("tr", "TR", "Türkiye", "TÜRKİYE"), seed, id, 68))

    val tokens = flat.map(_._1).toArray
    val tags = flat.map(_._2).toArray
    // raw header is the punct-only-normalized join (ref S3 line 422-424)
    BioSample(TrText.normalizePunctOnlyS(tokens.mkString(" ")), tokens, tags, id, "A2E")
  }

  def synthesize(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[BioSample] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map(id => sampleOf(seed, id)))
  }

  /** S7 `to_conll` sink: `raw, id, group` header + `token\ttag` lines + blank
    * line per sample (ref group_A2E_BIO_synth.py:430-439). */
  def writeConll(ds: Dataset[BioSample], outDir: String): Unit = {
    val block = concat(
      col("raw"), lit(", "), col("sample_id"), lit(", "), col("group"), lit("\n"),
      array_join(zip_with(col("tokens"), col("tags"),
        (t, g) => concat(t, lit("\t"), g)), "\n"),
      lit("\n"))
    ds.toDF().select(block.as("value")).write.mode("overwrite").text(outDir)
  }

  /** V1 `read_conll_blocks`: CoNLL text → samples. Reads whole files (one row
    * per file) so blocks never straddle split boundaries, then fans blocks
    * out in parallel. */
  def readConll(spark: SparkSession, dir: String): Dataset[BioSample] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(dir).as[String]
      .flatMap { content =>
        content.split("\n\\s*\n").iterator.filter(_.trim.nonEmpty).map { blk =>
          val lines = blk.split("\n").filter(_.nonEmpty)
          val header = lines.head.split(", ")
          val pairs = lines.tail.map { l =>
            val Array(t, g) = l.split("\t", 2); (t, g)
          }
          BioSample(header(0),
            pairs.map(_._1), pairs.map(_._2),
            header.lift(1).flatMap(_.toLongOption).getOrElse(-1L),
            header.lift(2).getOrElse(""))
        }
      }
  }

  /** S8 distribution sanity stats (ref generate_A2E_BIO_synth.py:67-274),
    * as one aggregation pass. */
  def stats(ds: Dataset[BioSample]): DataFrame = {
    val df = ds.toDF()
    df.select(
      count(lit(1)).as("n"),
      sum(when(array_contains(col("tags"), "B-KAT"), 1).otherwise(0)).as("n_kat"),
      sum(when(array_contains(col("tags"), "B-DAIRE_NO"), 1).otherwise(0)).as("n_daire"),
      sum(when(array_contains(col("tags"), "B-CADDE"), 1).otherwise(0)).as("n_cadde"),
      sum(when(array_contains(col("tags"), "B-SOKAK"), 1).otherwise(0)).as("n_sokak"),
      sum(when(array_contains(col("tags"), "B-POSTA_KODU"), 1).otherwise(0)).as("n_postcode"),
      round(avg(size(col("tokens"))), 4).as("avg_tokens"))
  }
}
