package graft

/** Diagnostic main: per-type gold-corpus PRF of the rule extractor
  * (the q_gold_eval surface as a CLI — dev aid for extraction tuning). */
object GoldDump {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-golddump", "8")
    graft.operators.GoldEval.evaluate(spark).orderBy("entity_type")
      .collect().foreach(r => println("GOLDPRF " + r.mkString(" | ")))
    spark.stop()
  }
}
