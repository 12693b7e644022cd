package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One candidate pair entering the scorer. `canon_*` is the per-ROW
  * pre-sorted signature-token string (see [[Linkage.prepare]]) — sorting and
  * punctuation-stripping happen once per record, not once per pair. */
case class CandPair(block_key: String, url_a: String, url_b: String, canon_a: String, canon_b: String)

/** A scored pair; `is_match` is the thresholded decision. */
case class ScoredPair(block_key: String, url_a: String, url_b: String,
                      jw: Double, lev_sim: Double, jaccard: Double, num_sim: Double,
                      score: Double, is_match: Boolean)

/** Batched pairwise scoring kernel (north-rule operator; the reference's
  * closest analogue is the batched `process_batch` kernel shape of its NER CLI,
  * ner_address_parser.py:115-128, per SURVEY.md §3.2).
  *
  * Runs as one `mapPartitions` pass over the candidate-pair Dataset: for each
  * pair it computes Jaro-Winkler + Levenshtein similarity on the
  * token-sorted canonical string (sorting makes the metrics order-invariant —
  * surface realizations reorder admin segments freely) and token-set Jaccard
  * on the raw token sets, then a convex combination. Pure CPU per row, no
  * per-row allocation beyond the token arrays, no shuffle: scoring scales
  * linearly with candidate pairs and parallelizes perfectly.
  *
  * Jaro-Winkler is implemented as a plain Scala function (not a UDF) — it is
  * not a Spark built-in; Levenshtein is in-kernel too so the three metrics
  * share one tokenization pass.
  */
object Scoring {

  /** Standard Jaro similarity. */
  def jaro(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val matchDist = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - matchDist)
      val hi = math.min(l2 - 1, i + matchDist)
      var j = lo
      var done = false
      while (!done && j <= hi) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var k = 0
    var transpositions = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // transpositions = floor(mismatched-position count / 2) — the convention
    // used by Apache Commons Text and DuckDB (not the fractional-half variant)
    (m / l1 + m / l2 + (m - transpositions / 2) / m) / 3.0
  }

  /** Jaro-Winkler with the standard 0.1 prefix scale, max prefix 4,
    * boost threshold 0.7. */
  def jaroWinkler(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j <= 0.7) return j
    var p = 0
    val maxP = math.min(4, math.min(s1.length, s2.length))
    while (p < maxP && s1.charAt(p) == s2.charAt(p)) p += 1
    j + p * 0.1 * (1.0 - j)
  }

  /** Levenshtein distance, two-row DP. */
  def levenshtein(s1: String, s2: String): Int = {
    if (s1 == s2) return 0
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0) return l2
    if (l2 == 0) return l1
    var prev = Array.tabulate(l2 + 1)(identity)
    var cur = new Array[Int](l2 + 1)
    var i = 1
    while (i <= l1) {
      cur(0) = i
      var j = 1
      while (j <= l2) {
        val cost = if (s1.charAt(i - 1) == s2.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(l2)
  }

  def levSim(s1: String, s2: String): Double = {
    val ml = math.max(s1.length, s2.length)
    if (ml == 0) 1.0 else 1.0 - levenshtein(s1, s2).toDouble / ml
  }

  /** Token-set Jaccard over whitespace tokens. */
  def tokenJaccard(a: Array[String], b: Array[String]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val sa = a.toSet
    val sb = b.toSet
    val inter = sa.intersect(sb).size
    val union = sa.size + sb.size - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** Alphanumeric tokens only (punctuation tokens like `:` `/` carry no
    * identity signal and differ freely across surface forms). */
  def sigTokens(norm: String): Array[String] =
    norm.split(" ").filter(t => t.nonEmpty && t.exists(_.isLetterOrDigit))

  /** Per-row canonical form: sorted signature tokens, space-joined. Sorting
    * makes the character metrics order-invariant (surface realizations
    * reorder admin segments freely) and is done ONCE per record here rather
    * than once per candidate pair in the kernel. */
  def canonical(norm: String): String = sigTokens(norm).sorted.mkString(" ")

  /** Score a pair of pre-canonicalized strings (null-safe: external inputs
    * may carry null text through extraction). */
  def scoreCanon(canonA0: String, canonB0: String): (Double, Double, Double, Double, Double) = {
    val canonA = if (canonA0 == null) "" else canonA0
    val canonB = if (canonB0 == null) "" else canonB0
    val ta = if (canonA.isEmpty) Array.empty[String] else canonA.split(" ")
    val tb = if (canonB.isEmpty) Array.empty[String] else canonB.split(" ")
    val jw = jaroWinkler(canonA, canonB)
    val lv = levSim(canonA, canonB)
    val jc = tokenJaccard(ta, tb)
    // Numeric tokens (building no, postcode, numeric street names) are strong
    // identity evidence: "no 12" vs "no 47" at the same street is a different
    // entity even though the character metrics barely move. Weighting their
    // agreement separately is what keeps precision high inside dense blocks.
    val ns = tokenJaccard(ta.filter(_.forall(_.isDigit)), tb.filter(_.forall(_.isDigit)))
    val score = 0.3 * jw + 0.2 * lv + 0.2 * jc + 0.3 * ns
    (jw, lv, jc, ns, score)
  }

  /** Convenience: score two raw normalized strings (tests, ad-hoc use). */
  def scorePair(normA: String, normB: String): (Double, Double, Double, Double, Double) =
    scoreCanon(canonical(normA), canonical(normB))

  /** The scoring operator: candidate pairs → scored pairs. */
  def score(pairs: Dataset[CandPair], threshold: Double = 0.85): Dataset[ScoredPair] = {
    import pairs.sparkSession.implicits._
    pairs.mapPartitions(_.map { p =>
      val (jw, lv, jc, ns, s) = scoreCanon(p.canon_a, p.canon_b)
      ScoredPair(p.block_key, p.url_a, p.url_b, jw, lv, jc, ns, s, s >= threshold)
    })
  }

  /** DataFrame adapter around [[score]]. */
  def scoreDF(pairs: DataFrame, threshold: Double = 0.85): DataFrame = {
    import pairs.sparkSession.implicits._
    score(pairs.select("block_key", "url_a", "url_b", "canon_a", "canon_b").as[CandPair], threshold).toDF()
  }
}
