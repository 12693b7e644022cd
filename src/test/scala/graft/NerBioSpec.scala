package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TrText
import graft.operators.{Eval, Goldset, Linkage, NerOutputs, StaticParser}
import graft.sources.{Bio, Gazetteer, Pages}

class NerBioSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val idx = Gazetteer.buildIndex()

  test("NER spans + BIO + entities on a known address") {
    val norm = TrText.normalizeStaticS("Caferağa Mah. Kadıköy İstanbul No:12 34710")
    val tokens = norm.split(" ")
    val sps = NerOutputs.spans(tokens, idx)
    val byType = sps.map { case (t, s, e) => t -> tokens.slice(s, e).mkString(" ") }.toMap
    assert(byType("IL") == "istanbul")
    assert(byType("ILCE") == "kadikoy")
    assert(byType("MAHALLE") == "caferaga")
    assert(byType("POSTA_KODU") == "34710")
    assert(byType("BINA_NO") == "12")

    val tags = NerOutputs.spansToBio(tokens.length, sps)
    assert(tags.length == tokens.length)
    assert(tags(tokens.indexOf("caferaga")) == "B-MAHALLE")
    assert(tags(tokens.indexOf("istanbul")) == "B-IL")

    val ents = NerOutputs.aggregateEntities(tokens, sps)
    // char offsets slice back to the entity text
    ents.foreach(e => assert(norm.substring(e.start, e.end) == e.text))
    // entities sorted by start
    assert(ents.map(_.start) == ents.map(_.start).sorted)

    val flat = NerOutputs.joinEntitiesFlat(ents)
    assert(flat.contains("MAHALLE=caferaga") && flat.contains("|"))
    assert(NerOutputs.entitiesJson(ents).startsWith("[{\"type\""))
  }

  test("NER batch operator over pages + CSV roundtrip") {
    val pages = Pages.synthesize(spark, 120).toDF()
    val prep = Linkage.extract(pages)
      .withColumn("norm", TrText.normalizeStatic(col("extracted")))
    val bIdx = StaticParser.broadcastIndex(spark)
    val out = NerOutputs.process(prep, "url", "norm", bIdx).persist()
    assert(out.count() == 120)
    assert(out.filter(length(col("pred_tags")) > 0).count() == 120)
    // every page embeds a gazetteer neighbourhood → MAHALLE should be common
    assert(out.filter(col("entities_flat").contains("MAHALLE=")).count() >= 100)
    out.unpersist()

    // CSV in → CSV out (E7/E8 shape)
    val inCsv = Files.createTempDirectory("nercsv-in").toString
    val outCsv = Files.createTempDirectory("nercsv-out").toString + "/out"
    prep.select(col("url"), col("extracted").as("address"))
      .write.option("header", "true").mode("overwrite").csv(inCsv)
    NerOutputs.runCsv(spark, inCsv, outCsv, "address", bIdx)
    val back = spark.read.option("header", "true").csv(outCsv)
    assert(back.count() == 120)
    assert(back.columns.toSet == Set("url", "address", "pred_tags", "entities_json", "entities_flat"))
  }

  test("BIO synthesis: deterministic, tag-consistent, CoNLL roundtrip") {
    val ds = Bio.synthesize(spark, 200).persist()
    val rows = ds.collect()
    assert(rows.length == 200)
    rows.foreach { s =>
      assert(s.tokens.length == s.tags.length)
      assert(s.tags.forall(t => t == "O" || t.startsWith("B-") || t.startsWith("I-")))
      // I- never follows O or start
      s.tags.zipWithIndex.foreach { case (t, i) =>
        if (t.startsWith("I-"))
          assert(i > 0 && (s.tags(i - 1).endsWith(t.drop(2)) && s.tags(i - 1) != "O"),
            s"dangling $t in ${s.tags.mkString(",")}")
      }
      assert(s.tags.contains("B-MAHALLE") && s.tags.contains("B-POSTA_KODU"))
    }
    // determinism
    val again = Bio.synthesize(spark, 200).collect()
    assert(rows.map(_.raw).sameElements(again.map(_.raw)))

    val dir = Files.createTempDirectory("conll").toString + "/corpus"
    Bio.writeConll(ds, dir)
    val back = Bio.readConll(spark, dir).collect().sortBy(_.sample_id)
    assert(back.length == 200)
    back.zip(rows.sortBy(_.sample_id)).foreach { case (b, o) =>
      assert(b.tokens.sameElements(o.tokens) && b.tags.sameElements(o.tags))
      assert(b.group == "A2E")
    }
    // S8 stats
    val st = Bio.stats(ds).collect()(0)
    assert(st.getLong(0) == 200 && st.getLong(5) == 200) // n, n_postcode
    ds.unpersist()
  }

  test("entity-level PRF (V2): self-eval is perfect; perturbed eval degrades") {
    val gold = Bio.synthesize(spark, 100).flatMap { s =>
      // gold spans from BIO tags
      val out = scala.collection.mutable.ArrayBuffer[(Long, String, Int, Int)]()
      var i = 0
      while (i < s.tags.length) {
        if (s.tags(i).startsWith("B-")) {
          val t = s.tags(i).drop(2)
          var j = i + 1
          while (j < s.tags.length && s.tags(j) == s"I-$t") j += 1
          out += ((s.sample_id, t, i, j)); i = j
        } else i += 1
      }
      out
    }.toDF("sent_id", "entity_type", "start", "end").persist()

    val perfect = Eval.entityPRF(gold, gold)
    assert(perfect.filter(col("f1") =!= 1.0).count() == 0)

    val shifted = gold.withColumn("start",
      when(col("entity_type") === "MAHALLE", col("start") + 1).otherwise(col("start")))
    val degraded = Eval.entityPRF(shifted, gold)
    val mahF1 = degraded.filter(col("entity_type") === "MAHALLE").select("f1").as[Double].head()
    val microF1 = degraded.filter(col("entity_type") === "__micro__").select("f1").as[Double].head()
    assert(mahF1 == 0.0 && microF1 < 1.0 && microF1 > 0.0)
    gold.unpersist()
  }

  test("confusion matrix (V3) shape") {
    val toks = Seq((1L, 0, "IL", "IL"), (1L, 1, "IL", "ILCE"), (1L, 2, "O", "O"))
      .toDF("sent_id", "pos", "gold_type", "pred_type")
    val cm = Eval.confusionMatrix(toks).collect()
    assert(cm.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet ==
      Set(("IL", "IL", 1L), ("IL", "ILCE", 1L), ("O", "O", 1L)))
  }

  test("goldset classification (Q1-Q3): deterministic priority classes") {
    val df = Seq(
      "Erzene mahallesi 123 sokak Gazi caddesi no:4",  // nbhd+street+avenue → A
      "Erzene mah 123 sk no:4",                        // nbhd+street+no → B
      "Erzene mahalle Gazi cadde 5",                   // nbhd+avenue → C
      "Okul yanı Erzene mah",                          // tarif → I
      "Folkart sitesi B blok daire 3",                 // site+flat → G
      "hiçbir şey yok burada").toDF("address")         // → J
    val got = Goldset.classify(df, "address").select("gold_class").as[String].collect()
    assert(got.sameElements(Array("A", "B", "C", "I", "G", "J")), got.mkString(","))
    val st = Goldset.tokenStats(Goldset.classify(df, "address"), "address")
    assert(st.count() == 6)
  }
}
