package graft

/** Diagnostic main: per-type gold-corpus PRF of the rule extractor
  * (the q_gold_eval surface as a CLI — dev aid for extraction tuning).
  *
  * `GoldDump miss TYPE` lists the false negatives and false positives for
  * one entity type under the same leave-one-corpus-out protocol — the raw
  * material for closing a recall tail (each line shows the gold span text
  * in its sentence context, so the missing evidence pattern is readable).
  */
object GoldDump {
  def main(args: Array[String]): Unit = {
    if (args.length >= 2 && args(0) == "miss") { missReport(args(1)); return }
    if (args.length >= 2 && args(0) == "sent") { sentReport(args.drop(1).mkString(" ")); return }
    val spark = Sessions.local("graft-golddump", "8")
    graft.operators.GoldEval.evaluate(spark).orderBy("entity_type")
      .collect().foreach(r => println("GOLDPRF " + r.mkString(" | ")))
    graft.operators.GoldEval.evaluateByCorpus(spark)
      .collect().foreach(r => println("GOLDCORPUS " + r.mkString(" | ")))
    spark.stop()
  }

  /** Driver-side FN/FP listing for one type (corpora are 3 tiny files). */
  private def missReport(tpe: String): Unit = {
    import graft.operators.{GoldEval, NerOutputs}
    import graft.sources.Gazetteer
    val paths = GoldEval.DefaultPaths
    val byCorpus = paths.zipWithIndex.map { case (p, i) => (p, GoldEval.readGold(p, i)) }
    var fn = 0; var fp = 0; var tp = 0
    byCorpus.foreach { case (path, sents) =>
      val (rows, anchors) = GoldEval.minedFor(byCorpus, path)
      val idx = Gazetteer.buildIndex(rows)
      sents.foreach { case (sid, toks, tags) =>
        val canon = toks.map(GoldEval.canonToken)
        val pred = NerOutputs.spans(canon, idx, tarifAnchors = anchors,
            aux = GoldEval.realIndex)
          .filter(_._1 == tpe).map { case (_, s, e) => (s, e) }.toSet
        val gold = GoldEval.tagsToSpans(tags)
          .filter(_._1 == tpe).map { case (_, s, e) => (s, e) }.toSet
        def show(kind: String, s: Int, e: Int): Unit =
          println(f"$kind $sid%7d [${canon.slice(s, e).mkString(" ")}]  ctx: " +
            canon.slice(math.max(0, s - 3), math.min(toks.length, e + 3)).mkString(" "))
        (gold -- pred).foreach { case (s, e) => fn += 1; show("MISS ", s, e) }
        (pred -- gold).foreach { case (s, e) => fp += 1; show("FALSE", s, e) }
        tp += (gold & pred).size
      }
    }
    println(s"SUMMARY $tpe tp=$tp fn=$fn fp=$fp")
  }

  /** Full pred-vs-gold span listing for sentences whose canonical text
    * contains `needle` — the single-sentence drill-down behind a `miss`
    * line. */
  private def sentReport(needle: String): Unit = {
    import graft.operators.{GoldEval, NerOutputs}
    import graft.sources.Gazetteer
    val byCorpus = GoldEval.DefaultPaths.zipWithIndex
      .map { case (p, i) => (p, GoldEval.readGold(p, i)) }
    byCorpus.foreach { case (path, sents) =>
      // filter FIRST: mining + index build are the expensive part and most
      // corpora contain no match for a single-sentence drill-down
      val hits = sents.filter { case (_, toks, _) =>
        toks.map(GoldEval.canonToken).mkString(" ").contains(needle) }
      if (hits.nonEmpty) {
        val (rows, anchors) = GoldEval.minedFor(byCorpus, path)
        val idx = Gazetteer.buildIndex(rows)
        hits.foreach { case (sid, toks, tags) =>
          val canon = toks.map(GoldEval.canonToken)
          println(s"SENT $sid: ${canon.mkString(" ")}")
          val pred = NerOutputs.spans(canon, idx, tarifAnchors = anchors,
            aux = GoldEval.realIndex)
          GoldEval.tagsToSpans(tags).sortBy(_._2).foreach { case (t, s, e) =>
            println(s"  GOLD $t [${canon.slice(s, e).mkString(" ")}]") }
          pred.sortBy(_._2).foreach { case (t, s, e) =>
            println(s"  PRED $t [${canon.slice(s, e).mkString(" ")}]") }
        }
      }
    }
  }
}
