package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TrText
import graft.sources.Gazetteer

/** One extracted entity span over the normalized text (char offsets),
  * matching the reference's NER entity dict shape
  * (ner_address_parser.py:86: {type, text, start, end, score}). */
case class NerEntity(entity_type: String, text: String, start: Int, end: Int, score: Double)

/** The NER batch output row shape (ner_address_parser.py:120-127,199-202):
  * input text + BIO tags + JSON entities + flat "TYPE=text | ..." form. */
case class NerRow(url: String, norm: String, pred_tags: String,
                  entities_json: String, entities_flat: String)

/** Rule-based entity extraction with the reference's NER output surface.
  *
  * The BERT forward pass is out of scope (model binary absent; SURVEY.md
  * §2.4); every deterministic operator around it is reproduced here with the
  * gazetteer-constrained parser as the span source:
  *  - spans: parser matches (IL/ILCE/MAHALLE via [[StaticParser.bestMatch]]
  *    token windows), postcode regex (POSTA_KODU), indicator-anchored street/
  *    avenue names (SOKAK/CADDE) and building numbers (BINA_NO);
  *  - E2 `spans_to_bio`: first overlapping token B-, rest I-, else O;
  *  - E3 `aggregate_entities`: spans sorted by start, text sliced from the
  *    normalized string;
  *  - E4 `join_entities_flat`: `TYPE=text | TYPE=text` grouped by type in
  *    first-appearance order;
  *  - E6 batch kernel: one mapPartitions pass with an explicit micro-batch
  *    loop (the reference's chunk/batch shape, ner_address_parser.py:115-128).
  */
object NerOutputs {

  // Keyword anchors in their STATIC-NORMALIZED surface form (ascii-folded
  // lowercase — "bulvarı"→"bulvari", "bloğu"→"blogu"); sources: the F2J
  // generator's SITE/BLOK/APARTMAN/BULVAR keyword families
  // (general_config.py:322-331) and the TARIF landmark categories (:388-452).
  val SiteKw: Set[String] = Set(
    "evleri", "sitesi", "rezidans", "residence", "tower", "plaza", "konutlari")
  val BinaAdiKw: Set[String] = Set(
    "blok", "blogu", "apartmani", "apartman", "apt", "apart")
  val BulvarKw: Set[String] = Set("bulvari", "bulvar", "bulv", "blv")
  val TarifKw: Set[String] = Set(
    "hastanesi", "universitesi", "bakkali", "oteli", "avm",
    "karsisi", "yani", "ustu", "girisi", "arkasi")

  /** Token spans (start token, end token exclusive, type) for one token array. */
  def spans(tokens: Array[String], idx: Gazetteer.Index): Seq[(String, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, Int, Int)]()

    val prov = StaticParser.bestMatch(tokens, idx.provIndex, None)
    prov.foreach { case (_, s, e) => out += (("IL", s, e)) }
    val allowedD = prov.map(p => idx.provToDistricts.getOrElse(p._1, Set.empty[String]))
    val dist = StaticParser.bestMatch(tokens, idx.distIndex, allowedD)
    dist.foreach { case (_, s, e) => out += (("ILCE", s, e)) }
    val provName = prov.map(_._1).orElse(dist.flatMap(d => idx.distToFirstProv.get(d._1)))
    val allowedN = dist.map { d =>
      provName match {
        case Some(p) => idx.pairToNbhds.getOrElse((p, d._1), Set.empty[String])
        case None    => idx.distToNbhdUnion.getOrElse(d._1, Set.empty[String])
      }
    }
    // gold annotation convention (goldset_1k_yegeb.conll): the keyword token
    // belongs to the span — "Foça mahallesi" is B-MAHALLE I-MAHALLE. Extend
    // the gazetteer name match over a following canonical "mah".
    StaticParser.bestMatch(tokens, idx.nbhdIndex, allowedN)
      .foreach { case (_, s, e) =>
        val e2 = if (e < tokens.length && tokens(e) == "mah") e + 1 else e
        out += (("MAHALLE", s, e2))
      }

    def covered(k: Int): Boolean = out.exists { case (_, s, e) => s <= k && k < e }
    def digits(s: String): Boolean = s.nonEmpty && s.forall(_.isDigit)

    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      // postcode: standalone 5-digit token
      if (t.length == 5 && digits(t)) out += (("POSTA_KODU", i, i + 1))
      // street/avenue: name + canonical indicator (the keyword is part of
      // the span in the reference's annotation — "1004 sokak" is B-/I-SOKAK)
      if ((t == "sk" || t == "cad") && i > 0) {
        val tag = if (t == "sk") "SOKAK" else "CADDE"
        if (!covered(i - 1)) out += ((tag, i - 1, i + 1))
      }
      // boulevard: name + keyword (static-normalized surface forms)
      if (NerOutputs.BulvarKw(t) && i > 0 && !covered(i - 1))
        out += (("BULVAR", i - 1, i + 1))
      // site/residence: name + keyword (F2J SITE_ADI family)
      if (NerOutputs.SiteKw(t) && i > 0 && !covered(i - 1))
        out += (("SITE_ADI", i - 1, i + 1))
      // building name: blok/apartman keywords; "blok : A" keyword-first form
      if (NerOutputs.BinaAdiKw(t)) {
        if (t == "blok" && i + 2 < tokens.length && tokens(i + 1) == ":") {
          // "blok : A94" normalizes to "blok : a 94" (N4 splits letter-digit
          // boundaries) — absorb the trailing digit run into the label span
          val end = if (i + 3 < tokens.length && digits(tokens(i + 3))) i + 4 else i + 3
          out += (("BINA_ADI", i, end))
        } else if (i > 0 && !covered(i - 1))
          out += (("BINA_ADI", i - 1, i + 1))
      }
      // landmark/directions anchor (TARIF): name + anchor keyword
      if (NerOutputs.TarifKw(t) && i > 0 && !covered(i - 1))
        out += (("TARIF", i - 1, i + 1))
      // floor: "kat : 3" / "kat 3"
      if (t == "kat" && i + 1 < tokens.length) {
        val j = if (tokens(i + 1) == ":" && i + 2 < tokens.length) i + 2 else i + 1
        if (j < tokens.length && digits(tokens(j)) && tokens(j).length <= 3)
          out += (("KAT", i, j + 1))
      }
      // flat: "daire[:] 5" / "d : 5"
      if ((t == "daire" || (t == "d" && i + 1 < tokens.length && tokens(i + 1) == ":"))
          && i + 1 < tokens.length) {
        val j = if (tokens(i + 1) == ":" && i + 2 < tokens.length) i + 2 else i + 1
        if (j < tokens.length && digits(tokens(j)) && tokens(j).length <= 3)
          out += (("DAIRE_NO", i, j + 1))
      }
      // building number: "no[:] 12" — keyword + digits, like the annotation
      if (t == "no" && i + 1 < tokens.length && !covered(i)) {
        val j = if (tokens(i + 1) == ":" && i + 2 < tokens.length) i + 2 else i + 1
        if (j < tokens.length && digits(tokens(j)) && tokens(j).length <= 4)
          out += (("BINA_NO", i, j + 1))
      }
      i += 1
    }
    out.toSeq.sortBy(_._2)
  }

  /** E2: project token spans onto BIO tags. */
  def spansToBio(nTokens: Int, sps: Seq[(String, Int, Int)]): Array[String] = {
    val tags = Array.fill(nTokens)("O")
    sps.sortBy(_._2).foreach { case (tpe, s, e) =>
      var k = s
      while (k < e && k < nTokens) {
        if (tags(k) == "O") tags(k) = (if (k == s) "B-" else "I-") + tpe
        k += 1
      }
    }
    tags
  }

  /** E3: spans → entities with char offsets into the space-joined text. */
  def aggregateEntities(tokens: Array[String], sps: Seq[(String, Int, Int)]): Seq[NerEntity] = {
    // char offset of token k in "t0 t1 t2 ..." = sum(len+1) of preceding
    val starts = new Array[Int](tokens.length + 1)
    var k = 0
    while (k < tokens.length) { starts(k + 1) = starts(k) + tokens(k).length + 1; k += 1 }
    sps.sortBy(_._2).map { case (tpe, s, e) =>
      val cs = starts(s)
      val ce = starts(e) - 1
      NerEntity(tpe, tokens.slice(s, e).mkString(" "), cs, ce, 1.0)
    }
  }

  /** E4: `TYPE=text | TYPE=text`, types grouped in first-appearance order
    * (ref ner_address_parser.py:89-98 buckets by type, insertion-ordered). */
  def joinEntitiesFlat(ents: Seq[NerEntity]): String = {
    val order = scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.ArrayBuffer[String]]()
    ents.foreach(e => order.getOrElseUpdate(e.entity_type, scala.collection.mutable.ArrayBuffer()) += e.text)
    order.flatMap { case (t, xs) => xs.map(x => s"$t=$x") }.mkString(" | ")
  }

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  }

  def entitiesJson(ents: Seq[NerEntity]): String =
    ents.map(e =>
      s"""{"type": "${e.entity_type}", "text": "${jsonEscape(e.text)}", "start": ${e.start}, "end": ${e.end}, "score": ${e.score}}""")
      .mkString("[", ", ", "]")

  /** E6: the batched extraction kernel over (url, normalized text). */
  def process(df: DataFrame, urlCol: String, normCol: String,
              bIdx: Broadcast[Gazetteer.Index], batchSize: Int = 32): Dataset[NerRow] = {
    import df.sparkSession.implicits._
    df.select(col(urlCol), col(normCol)).as[(String, String)].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val idx = bIdx.value
        batch.map { case (url, norm) =>
          val tokens = if (norm == null) Array.empty[String]
                       else norm.split(" ").filter(_.nonEmpty)
          val sps = spans(tokens, idx)
          val ents = aggregateEntities(tokens, sps)
          NerRow(url, norm,
            spansToBio(tokens.length, sps).mkString(" "),
            entitiesJson(ents),
            joinEntitiesFlat(ents))
        }
      }
    }
  }

  /** E7/E8: the reference's batch-CLI shape — CSV in, predictions appended as
    * new columns, CSV out (chunked read → partitions; incremental append →
    * distributed write). */
  def runCsv(spark: SparkSession, inCsv: String, outCsv: String, textCol: String,
             bIdx: Broadcast[Gazetteer.Index]): Unit = {
    val in = spark.read.option("header", "true").csv(inCsv)
      .withColumn("__url", monotonically_increasing_id().cast("string"))
      .withColumn("__norm", graft.functions.TrNormalize.static(col(textCol)))
    val preds = process(in, "__url", "__norm", bIdx).toDF()
      .withColumnRenamed("url", "__url").drop("norm")
    in.join(preds, "__url").drop("__url", "__norm")
      .write.option("header", "true").mode("overwrite").csv(outCsv)
  }
}
