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
    StaticParser.bestMatch(tokens, idx.nbhdIndex, allowedN)
      .foreach { case (_, s, e) => out += (("MAHALLE", s, e)) }

    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      // postcode: standalone 5-digit token
      if (t.length == 5 && t.forall(_.isDigit)) out += (("POSTA_KODU", i, i + 1))
      // street/avenue name: token before the canonical indicator
      if ((t == "sk" || t == "cad") && i > 0) {
        val tag = if (t == "sk") "SOKAK" else "CADDE"
        val covered = out.exists { case (_, s, e) => s <= i - 1 && i - 1 < e }
        if (!covered) out += ((tag, i - 1, i))
      }
      // building number: digits after "no" (possibly "no : 12")
      if (t == "no" && i + 1 < tokens.length) {
        val j = if (tokens(i + 1) == ":" && i + 2 < tokens.length) i + 2 else i + 1
        if (j < tokens.length && tokens(j).forall(_.isDigit) && tokens(j).length <= 4)
          out += (("BINA_NO", j, j + 1))
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
