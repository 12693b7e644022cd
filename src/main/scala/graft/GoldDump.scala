package graft

/** Scratch diagnostic main: per-type gold-eval PRF to stdout (dev aid). */
object GoldDump {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-golddump", "8")
    graft.operators.GoldEval.evaluate(spark).orderBy("entity_type")
      .collect().foreach(r => println("GOLDPRF " + r.mkString(" | ")))
    spark.stop()
  }
}
