package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Goldset-preparation operators (SURVEY.md §2.6, ref
  * data/goldset/prepare_goldset.ipynb): regex feature masks (Q1),
  * priority-ordered mutually-exclusive class assignment A–J (Q2), and
  * per-class token stats (Q3) — regex masks + chained when/otherwise. */
object Goldset {

  /** Q1 feature masks (case-insensitive, reference cells 1–7). */
  def masks(text: Column): Map[String, Column] = Map(
    "has_nbhd" -> text.rlike("(?i)\\bmah(alle(si)?)?\\b|\\bmh\\b"),
    "has_street" -> text.rlike("(?i)\\bsok(ak|ağı)?\\b|\\bsk\\b"),
    "has_avenue" -> text.rlike("(?i)\\bcad(de(si)?)?\\b|\\bcd\\b"),
    "has_boulevard" -> text.rlike("(?i)\\bbulvar(ı)?\\b|\\bblv\\b"),
    "has_site_building" -> text.rlike("(?i)\\bsite(si)?\\b|\\bblok\\b|\\bapartman(ı)?\\b|\\bplaza\\b"),
    "has_building_no" -> text.rlike("(?i)\\bno\\s*[:.]?\\s*\\d+"),
    "has_flat_no" -> text.rlike("(?i)\\bdaire\\b|\\bd\\s*[:.]\\s*\\d+|\\bkat\\b"),
    "has_postcode" -> text.rlike("(?<!\\d)\\d{5}(?!\\d)"),
    "has_tarif" -> text.rlike("(?i)\\bkarşısı\\b|\\byanı\\b|\\barkası\\b|\\byakın(ı)?\\b"))

  /** Q2: priority-ordered class A–J from mask algebra (first match wins,
    * mirroring the notebook's mutually-exclusive bucket assignment). */
  def classify(df: DataFrame, textCol: String): DataFrame = {
    val m = masks(col(textCol))
    val cls =
      when(m("has_tarif"), "I")
        .when(m("has_site_building") && m("has_flat_no"), "G")
        .when(m("has_site_building"), "F")
        .when(m("has_nbhd") && m("has_avenue") && m("has_street"), "A")
        .when(m("has_nbhd") && m("has_street") && m("has_building_no"), "B")
        .when(m("has_nbhd") && m("has_avenue"), "C")
        .when(m("has_nbhd") && m("has_street"), "D")
        .when(m("has_nbhd"), "E")
        .when(m("has_street") || m("has_avenue") || m("has_boulevard"), "H")
        .otherwise("J")
    df.withColumn("gold_class", cls)
  }

  /** Q3: tokens-per-sentence stats by class. */
  def tokenStats(classified: DataFrame, textCol: String): DataFrame =
    classified.groupBy("gold_class").agg(
      count(lit(1)).as("n"),
      round(avg(size(graft.functions.TextFunctions.tokens(col(textCol)))), 4).as("avg_tokens"),
      max(size(graft.functions.TextFunctions.tokens(col(textCol)))).as("max_tokens"))
      .orderBy("gold_class")
}
