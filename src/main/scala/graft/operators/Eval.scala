package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Evaluation operators (SURVEY.md §2.7): pairwise linkage metrics (the
  * north-rule F1 gate), entity-level precision/recall/F1 in the seqeval
  * style (V2), and the TYPE-only token confusion matrix (V3) — all as plain
  * DataFrame aggregations.
  */
object Eval {

  /** Pairwise P/R/F1 over labeled candidate pairs: `pred` has
    * (url_a, url_b, is_match); `gold` has (url_a, url_b, is_pos). Restricted
    * to the pairs present in `pred` (i.e. pairs at shared blocking keys —
    * BASELINE.json metric). Returns one row (tp, fp, fn, precision, recall, f1). */
  def pairwiseMetrics(pred: DataFrame, gold: DataFrame): DataFrame =
    pairwiseMetricsLabeled(pred.join(gold, Seq("url_a", "url_b"), "left")
      .withColumn("is_pos", coalesce(col("is_pos"), lit(false))))

  /** [[pairwiseMetrics]] over an ALREADY-LABELED frame (is_match, is_pos) —
    * the one-pass form for callers whose gold label is a pure function of the
    * prediction row itself (e.g. synthesized-url pairs): labeling is then a
    * projection, and the (url_a, url_b) join of [[pairwiseMetrics]] would be
    * an identity attach costing a full shuffle join and a second scan. */
  def pairwiseMetricsLabeled(j: DataFrame): DataFrame = {
    j.agg(
      sum(when(col("is_pos") && col("is_match"), 1L).otherwise(0L)).as("tp"),
      sum(when(!col("is_pos") && col("is_match"), 1L).otherwise(0L)).as("fp"),
      sum(when(col("is_pos") && !col("is_match"), 1L).otherwise(0L)).as("fn"))
      // f1 from the RAW counts (2tp / (2tp+fp+fn)) — not from the rounded
      // p/r, which compounds rounding error; zero denominators → 0.0, not null
      .withColumn("precision", round(coalesce(
        col("tp") / (col("tp") + col("fp")), lit(0.0)), 6))
      .withColumn("recall", round(coalesce(
        col("tp") / (col("tp") + col("fn")), lit(0.0)), 6))
      .withColumn("f1", round(coalesce(
        lit(2) * col("tp") / (lit(2) * col("tp") + col("fp") + col("fn")), lit(0.0)), 6))
  }

  /** V2: entity-level P/R/F1 per type + micro row. Both inputs have
    * (sent_id, entity_type, start, end); an entity counts as correct only on
    * exact (sent, type, span) match — the seqeval convention. */
  def entityPRF(pred: DataFrame, gold: DataFrame): DataFrame = {
    val keys = Seq("sent_id", "entity_type", "start", "end")
    val tp = pred.join(gold, keys, "left_semi").groupBy("entity_type").agg(count(lit(1)).as("tp"))
    val np = pred.groupBy("entity_type").agg(count(lit(1)).as("n_pred"))
    val ng = gold.groupBy("entity_type").agg(count(lit(1)).as("n_gold"))
    val perType = np.join(ng, Seq("entity_type"), "full")
      .join(tp, Seq("entity_type"), "left")
      .na.fill(0L, Seq("tp", "n_pred", "n_gold"))
    val micro = perType.agg(
      lit("__micro__").as("entity_type"),
      sum("n_pred").as("n_pred"), sum("n_gold").as("n_gold"), sum("tp").as("tp"))
      .select("entity_type", "n_pred", "n_gold", "tp")
    perType.select("entity_type", "n_pred", "n_gold", "tp").union(micro)
      .withColumn("precision", round(col("tp") / greatest(col("n_pred"), lit(1L)), 6))
      .withColumn("recall", round(col("tp") / greatest(col("n_gold"), lit(1L)), 6))
      .withColumn("f1", round(when(col("precision") + col("recall") > 0,
        lit(2) * col("precision") * col("recall") / (col("precision") + col("recall")))
        .otherwise(0.0), 6))
      .orderBy("entity_type")
  }

  /** V3: TYPE-only token-level confusion matrix: inputs have
    * (sent_id, pos, gold_type, pred_type) with B-/I- collapsed upstream. */
  def confusionMatrix(tokens: DataFrame): DataFrame =
    tokens.groupBy("gold_type", "pred_type").agg(count(lit(1)).as("n"))
      .orderBy("gold_type", "pred_type")
}
