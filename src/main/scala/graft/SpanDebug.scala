package graft

/** Diagnostic main: print the extracted spans for ad-hoc sentences under the
  * gold-eval protocol's mined index (corpus 0 held out) — the single-case
  * companion to `GoldDump miss TYPE`.
  *
  * Usage: `sbt "runMain graft.SpanDebug '16 eylul mah inkilap cad 3'"`
  */
object SpanDebug {
  def main(args: Array[String]): Unit = {
    val paths = graft.operators.GoldEval.DefaultPaths
    val byCorpus = paths.zipWithIndex.map { case (p, i) =>
      (p, graft.operators.GoldEval.readGold(p, i)) }
    val (rows, anchors) = graft.operators.GoldEval.minedFor(byCorpus, paths.head)
    val idx = graft.sources.Gazetteer.buildIndex(rows)
    args.foreach { s =>
      val toks = s.split(" ")
      val sps = graft.operators.NerOutputs.spans(
        toks.map(graft.operators.GoldEval.canonToken), idx, tarifAnchors = anchors,
        aux = graft.operators.GoldEval.realIndex)
      println(s"<$s> -> " + sps.map { case (t, a, b) =>
        s"$t=[${toks.slice(a, b).mkString(" ")}]" }.mkString(" | "))
    }
  }
}
