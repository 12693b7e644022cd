package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Turkish address-text normalization as pure Catalyst Column functions.
  *
  * Re-expresses the reference's `AddressNormalizer`
  * (src/address_matching/normalization/normalize_address.py) Spark-first:
  * everything except NFKC (see [[Nfkc]]) is composed from built-in,
  * whole-stage-codegen'd functions (`regexp_replace`, `translate`, `lower`),
  * so Catalyst constant-folds the patterns and fuses the whole chain into one
  * codegen stage — no UDFs, no per-row interpretation.
  *
  * All three pipelines are idempotent by construction (ref
  * normalize_address.py:9,255,282) — asserted by ScalaCheck properties in the
  * test suite.
  *
  * Regex-dialect notes (Python `re` → `java.util.regex`):
  *  - the reference's `re.VERBOSE` patterns (normalize_address.py:55-104) are
  *    flattened here;
  *  - Java `\b` is ASCII-only by default while Python's is Unicode-aware, so
  *    every canonicalization pattern carries `(?U)` (UNICODE_CHARACTER_CLASS);
  *  - `(?<![A-Za-zÇĞİÖŞÜçğıöşü0-9])` lookbehind works unchanged in Java.
  */
object TrText {

  /** Turkish alphanumeric class for boundary checks (ref normalize_address.py:34). */
  val TrAlnum = "A-Za-zÇĞİÖŞÜçğıöşü0-9"
  /** Turkish alphabetic class for number-boundary splits (ref normalize_address.py:37). */
  val TrAlpha = "A-Za-zÇĞİÖŞÜçğıöşü"

  private def collapseWs(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  /** N1 `pre_normalize`: NFKC + soft spacing around `[,;:/\-._]`
    * (ref normalize_address.py:117-136). */
  def preNormalize(c: Column): Column = {
    val s0 = Nfkc.nfkc(c)
    val s1 = regexp_replace(s0, "\\s+", " ")
    val s2 = regexp_replace(s1, "\\s*([,;:/\\-\\._])\\s*", " $1 ")
    collapseWs(s2)
  }

  /** N2 `normalize_punctuation`: drop `.` and `,`; isolate every other Unicode
    * punctuation (category P*) as its own token (ref normalize_address.py:139-173).
    * Note `№` (So) and `⁄` (Sm) are NOT punctuation and pass through untouched. */
  def punctNormalize(c: Column): Column = {
    val s1 = regexp_replace(c, "[.,]", " ")
    val s2 = regexp_replace(s1, "(\\p{P})", " $1 ")
    collapseWs(s2)
  }

  /** N3 `tr_lower`: Turkish-aware lowercase — `İ→i`, `I→ı`, then Unicode lowercase
    * (ref normalize_address.py:112-115). Never JVM default-locale `toLowerCase`. */
  def trLower(c: Column): Column = lower(translate(c, "İI", "iı"))

  /** N4 `normalize_numbers`: split letter↔digit boundaries, e.g. `B3Blok → B 3 Blok`
    * (ref normalize_address.py:107-108,176-187). Lookaheads keep the split
    * non-consuming, exactly as the Python patterns do. */
  def numberSplit(c: Column): Column = {
    val s1 = regexp_replace(c, s"([$TrAlpha])(?=\\d)", "$1 ")
    val s2 = regexp_replace(s1, s"(\\d)(?=[$TrAlpha])", "$1 ")
    collapseWs(s2)
  }

  /** N5 pattern: every `mahalle/mahallesi/mah./mh/mhl/mahal/…` variant
    * (ref normalize_address.py:55-70, flattened from re.VERBOSE). */
  val NbhdPattern: String =
    s"(?iU)(?<![$TrAlnum])(" +
      "mahal{1,3}e[\\s\\._\\-]*s{1,2}[iı](?=$|[\\s,;:/\\-\\._])|" +
      "mahal{1,3}es{1,2}[iı](?=$|[\\s,;:/\\-\\._])|" +
      "mahal{1,3}e(?=$|[\\s,;:/\\-\\._])|" +
      "mah(?=\\.|\\b|[:/.\\-_])|" +
      "mh(?=\\.|\\b|[:/.\\-_])|" +
      "mhl(?=\\.|\\b|[:/.\\-_])|" +
      "mahl(?=\\.|\\b|[:/.\\-_])|" +
      "mahal(?=$|[\\s,;:/\\-\\._])" +
      ")"

  /** N6 pattern: `cadde/caddesi/cad./cd/…` (ref normalize_address.py:73-87). */
  val AvenuePattern: String =
    s"(?iU)(?<![$TrAlnum])(" +
      "cad{1,3}e[\\s\\._\\-]*s{1,2}[iı](?=$|[\\s,;:/\\-\\._])|" +
      "cad{1,3}es{1,2}[iı](?=$|[\\s,;:/\\-\\._])|" +
      "cad{1,3}e(?=$|[\\s,;:/\\-\\._])|" +
      "cad(?=\\.|\\b|[:/.\\-_])|" +
      "cd(?=\\.|\\b|[:/.\\-_])|" +
      "cadd(?=\\.|\\b|[:/.\\-_])|" +
      "cadde(?=$|[\\s,;:/\\-\\._])" +
      ")"

  /** N7 pattern: `sokak/sokağı/sk./sok/…` (ref normalize_address.py:90-104). */
  val StreetPattern: String =
    s"(?iU)(?<![$TrAlnum])(" +
      "sokağı(?:n|nın|nda|na)?(?=$|[\\s,;:/\\-\\._])|" +
      "soka[ğg][aeıiuüi](?=$|[\\s,;:/\\-\\._])|" +
      "soka[ğg](?=$|[\\s,;:/\\-\\._])|" +
      "sok{1,2}ak(?=$|[\\s,;:/\\-\\._])|" +
      "sokak(?:lar[ıi]?)?(?=$|[\\s,;:/\\-\\._])|" +
      "sk(?=\\.|\\b|[:/.\\-_])|" +
      "sok(?=\\.|\\b|[:/.\\-_])" +
      ")"

  /** N5 apply: canonicalize neighbourhood indicator → `mah`. */
  def canonNbhd(c: Column): Column = regexp_replace(c, NbhdPattern, "mah")
  /** N6 apply: avenue indicator → `cad`. */
  def canonAvenue(c: Column): Column = regexp_replace(c, AvenuePattern, "cad")
  /** N7 apply: street indicator → `sk`. */
  def canonStreet(c: Column): Column = regexp_replace(c, StreetPattern, "sk")

  /** N8: fold user-supplied (pattern, replacement) rules in order
    * (ref normalize_address.py:49,234-235). */
  def extraRules(c: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(c) { case (acc, (p, r)) => regexp_replace(acc, p, r) }

  /** N9 full pipeline `normalize` (ref normalize_address.py:212-238):
    * NFKC → punct → tr_lower → numbers → mah → cad → sk → extra → collapse. */
  def normalizeFull(c: Column, rules: Seq[(String, String)] = Nil): Column = {
    val s = canonStreet(canonAvenue(canonNbhd(numberSplit(trLower(punctNormalize(preNormalize(c)))))))
    collapseWs(extraRules(s, rules))
  }

  /** N10 `normalize_static_parser` (ref normalize_address.py:241-268):
    * NFKC → punct → tr_lower → numbers → ASCII fold; *no* mah/cad/sk canon.
    * Used for gazetteer keys and parser input. */
  def normalizeStatic(c: Column): Column =
    collapseWs(translate(numberSplit(trLower(punctNormalize(preNormalize(c)))), "ıöüğşç", "iougsc"))

  /** N11 `normalize_punctuation_only` (ref normalize_address.py:270-288):
    * NFKC → punct → numbers; case-preserving. */
  def normalizePunctOnly(c: Column): Column =
    collapseWs(numberSplit(punctNormalize(preNormalize(c))))

  // --------------------------------------------------------------------------
  // Plain-Scala twins of the three pipelines, for use inside mapPartitions
  // kernels (parser, scorer, synthesizers) where a Column is not available.
  // Kept in lockstep with the Column versions; the test suite asserts
  // Column-vs-Scala equality on the golden corpus and random inputs.
  // --------------------------------------------------------------------------

  private val ReWs = "\\s+".r
  private def jCollapse(s: String): String = ReWs.replaceAllIn(s, " ").trim

  private val RePreSoften = java.util.regex.Pattern.compile("\\s*([,;:/\\-\\._])\\s*")
  private val RePunctDrop = java.util.regex.Pattern.compile("[.,]")
  private val RePunctSpace = java.util.regex.Pattern.compile("(\\p{P})")
  private val ReNumLd = java.util.regex.Pattern.compile(s"([$TrAlpha])(?=\\d)")
  private val ReNumDl = java.util.regex.Pattern.compile(s"(\\d)(?=[$TrAlpha])")
  private val ReNbhd = java.util.regex.Pattern.compile(NbhdPattern)
  private val ReAvenue = java.util.regex.Pattern.compile(AvenuePattern)
  private val ReStreet = java.util.regex.Pattern.compile(StreetPattern)

  def preNormalizeS(s: String): String =
    jCollapse(RePreSoften.matcher(jCollapse(NfkcUtil.normalize(s))).replaceAll(" $1 "))

  def punctNormalizeS(s: String): String =
    jCollapse(RePunctSpace.matcher(RePunctDrop.matcher(s).replaceAll(" ")).replaceAll(" $1 "))

  def trLowerS(s: String): String = s.replace('İ', 'i').replace('I', 'ı').toLowerCase(java.util.Locale.ROOT)

  def numberSplitS(s: String): String =
    jCollapse(ReNumDl.matcher(ReNumLd.matcher(s).replaceAll("$1 ")).replaceAll("$1 "))

  def normalizeFullS(s: String): String = {
    var x = preNormalizeS(s)
    x = punctNormalizeS(x)
    x = trLowerS(x)
    x = numberSplitS(x)
    x = ReNbhd.matcher(x).replaceAll("mah")
    x = ReAvenue.matcher(x).replaceAll("cad")
    x = ReStreet.matcher(x).replaceAll("sk")
    jCollapse(x)
  }

  private def asciiFoldS(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      sb.append(s.charAt(i) match {
        case 'ı' => 'i'; case 'ö' => 'o'; case 'ü' => 'u'
        case 'ğ' => 'g'; case 'ş' => 's'; case 'ç' => 'c'
        case ch => ch
      })
      i += 1
    }
    sb.toString
  }

  def normalizeStaticS(s: String): String =
    jCollapse(asciiFoldS(numberSplitS(trLowerS(punctNormalizeS(preNormalizeS(s))))))

  def normalizePunctOnlyS(s: String): String =
    jCollapse(numberSplitS(punctNormalizeS(preNormalizeS(s))))
}
