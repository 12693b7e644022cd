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
    "evleri", "sitesi", "rezidans", "residence", "tower", "plaza", "konutlari",
    // gold-corpus surface variants: abbreviated "sit", bare "site", plural
    // "siteleri", villa complexes. NOT "siteler": that surface is
    // predominantly a NEIGHBOURHOOD name in the corpora ("siteler mah",
    // 7 of 10 gold occurrences are MAHALLE) — as a keyword it would both
    // claim wrong SITE spans and block the mah-anchored walk
    "sit", "site", "siteleri", "villalari")
  val BinaAdiKw: Set[String] = Set(
    "blok", "blogu", "apartmani", "apartman", "apt", "apart")
  val BulvarKw: Set[String] = Set("bulvari", "bulvar", "bulv", "blv")
  val TarifKw: Set[String] = Set(
    "hastanesi", "universitesi", "bakkali", "oteli", "avm",
    "karsisi", "yani", "ustu", "girisi", "arkasi",
    // landmark-category head nouns from the reference's own TARIF config
    // (data/synth/config/general_config.py:388-452: market/bakkal,
    // üniversitesi, hastanesi, osb, otel, avm, banka categories) plus the
    // institution heads those templates inflect (müdürlüğü, eczane, kampüs)
    "market", "lisesi", "mudurlugu", "eczanesi", "lokantasi",
    "kampusu", "ishani", "bankasi", "osb")

  /** Keyword canonicals that can never be part of an entity NAME (stop the
    * left-walk that attaches name tokens to a keyword anchor). */
  private val StopKw: Set[String] =
    Set("mah", "cad", "sk", "no", "kat", "daire", "d", ":", "/") ++
      SiteKw ++ BinaAdiKw ++ BulvarKw ++ TarifKw

  /** The real-table district name an ILCE span denotes, if any: the
    * space-joined surface form, or — for a span the 3.4 split-typo fuse
    * claimed ("sefe rihisar") — the CONCATENATION the table actually holds
    * ("seferihisar"). Every closed-class lookup keyed by a district span
    * must go through this, or fused spans silently miss. */
  private def realDistName(ax: graft.sources.Gazetteer.Index,
                           tokens: Array[String], s: Int, e: Int): Option[String] = {
    val spaced = tokens.slice(s, e).mkString(" ")
    if (ax.distToNbhdUnion.contains(spaced)) Some(spaced)
    else {
      val fused = tokens.slice(s, e).mkString("")
      if (e - s > 1 && ax.distToNbhdUnion.contains(fused)) Some(fused) else None
    }
  }

  /** Generic tokens that precede a district in business addresses but are
    * never a neighbourhood name (country, "center", "branch") — excluded
    * from the positional bare-MAHALLE/ILCE claims. */
  private[operators] val NotNbhd: Set[String] =
    Set("turkiye", "merkez", "sube", "subesi",
      // closed-class organizational nouns (unit, group, office, branch,
      // department, directorate, bank, clinic) — an address ending
      // "<org-noun> <district>" names a business, not a neighbourhood
      "birimi", "grubu", "amirligi", "poliklinigi", "bankasi", "ofisi",
      "bolumu", "mudurlugu", "sti", "ltd", "dairesi")

  /** Turkish word numbers one..five — floors and flats are occasionally
    * written out ("kat bir", "daire bir"). */
  private[operators] val WordNum: Set[String] = Set("bir", "iki", "uc", "dort", "bes")

  /** Edit-distance-1 match against the LONG apartman keyword forms — the
    * gold corpora's BINA_ADI typo tail ("aprtmani", "apat"). The length gap
    * is bounded first, and the token must keep the leading "a" — without
    * that anchor, plain words one deletion away ("part") would be claimed
    * as building keywords. */
  private val FuzzyBinaTargets = Seq("apartmani", "apartman", "apart")
  private[operators] def binaFuzzy(t: String): Boolean =
    t.length >= 4 && t.startsWith("a") && t.forall(_.isLetter) &&
      !BinaAdiKw(t) &&
      FuzzyBinaTargets.exists(k => math.abs(k.length - t.length) <= 1 &&
        Scoring.levenshtein(k, t) <= 1)

  /** Token spans (start token, end token exclusive, type) for one token array.
    *
    * Evidence order (round-3, tuned on the pooled gold corpora with the
    * leave-one-corpus-out protocol of [[GoldEval]]):
    *  1. gazetteer probes for IL/ILCE are TENTATIVE;
    *  2. the keyword pass claims anchors and walks LEFT over up to `nameWalk`
    *     name tokens ("adnan menderes cad" is one CADDE span) — the adjacent
    *     name token is claimed even if a tentative gazetteer span covers it
    *     (keyword evidence wins: "ataturk cad" is an avenue, not the
    *     gazetteer neighbourhood "ataturk"), while the walk beyond it stops
    *     at covered/stop tokens so "izmir bornova kazimdirik mah" keeps its
    *     IL/ILCE spans;
    *  3. tentative IL/ILCE spans that overlap a keyword span are dropped;
    *  4. the gazetteer MAHALLE probe runs last and only fills sentences where
    *     no keyword-anchored MAHALLE exists (bare names like "mavisehir").
    */
  def spans(tokens: Array[String], idx: Gazetteer.Index,
            nameWalk: Int = 4,
            tarifAnchors: Set[String] = TarifKw,
            aux: Option[Gazetteer.Index] = None): Seq[(String, Int, Int)] = {
    val T = tokens.length
    def digits(s: String): Boolean = s.nonEmpty && s.forall(_.isDigit)
    def nameLike(s: String): Boolean =
      s.nonEmpty && s.forall(_.isLetter) && !StopKw(s)

    // --- 1. tentative admin probes (NER surface: hierarchy-restricted probe
    // first, unrestricted retry on miss — real-world corpora name admin units
    // whose (province, district) edge the gazetteer doesn't know, and for
    // span EXTRACTION a type-correct span beats a hierarchy-consistent miss.
    // The parser surface (StaticParser.parse) keeps the reference's strict
    // restriction semantics.)
    val prov = StaticParser.bestMatch(tokens, idx.provIndex, None)
    val allowedD = prov.map(p => idx.provToDistricts.getOrElse(p._1, Set.empty[String]))
    val dist = StaticParser.bestMatch(tokens, idx.distIndex, allowedD)
      .orElse(if (allowedD.isDefined)
        StaticParser.bestMatch(tokens, idx.distIndex, None) else None)
    // gold tags EVERY mention (duplicated admin blocks are a standard
    // surface form); bestMatch picks the name, then every window where that
    // name recurs becomes a span
    def occurrences(name: String): Seq[(Int, Int)] = {
      val nt = name.split(" ")
      val L = nt.length
      (0 to T - L).collect {
        case i if (0 until L).forall(k => tokens(i + k) == nt(k)) => (i, i + L)
      }
    }
    val admin = scala.collection.mutable.ArrayBuffer[(String, Int, Int)]()
    prov.foreach { case (n, _, _) =>
      occurrences(n).foreach { case (s, e) => admin += (("IL", s, e)) } }
    dist.foreach { case (n, _, _) =>
      occurrences(n).foreach { case (s, e) => admin += (("ILCE", s, e)) } }
    def adminCovered(k: Int): Boolean =
      admin.exists { case (_, s, e) => s <= k && k < e }

    // --- 2. keyword pass ---
    val out = scala.collection.mutable.ArrayBuffer[(String, Int, Int)]()
    // bare defective markers ("no"/"daire"/"kat" with the number dropped)
    // are a gold-corpus convention for ADDRESS text; tracked so a sentence
    // whose ONLY spans are bare markers (generic prose: "no parking
    // available") yields nothing instead of tagging every stray keyword
    val bare = scala.collection.mutable.Set[(String, Int, Int)]()
    def covered(k: Int): Boolean = out.exists { case (_, s, e) => s <= k && k < e }
    // left boundary of a keyword-anchored name: claim the adjacent token when
    // it is a name or (for street-family anchors) a number ("1004 sokak");
    // extend over further NAME tokens while they are not claimed by anything
    def nameStart(i: Int, digitFirst: Boolean, cap: Int,
                  digitsInWalk: Boolean = false,
                  walkStop: String => Boolean = _ => false): Int = {
      if (i == 0) return i
      val adj = tokens(i - 1)
      val adjOk = !covered(i - 1) &&
        (nameLike(adj) || (digitFirst && digits(adj)))
      if (!adjOk) return i
      var j = i - 1
      var steps = 1
      // digitsInWalk: date-named neighbourhoods lead with a number ("16
      // eylul mah", "15 mayis mah") — the walk may cross a short digit run
      def walkable(k: Int): Boolean = (nameLike(tokens(k)) ||
        (digitsInWalk && digits(tokens(k)) && tokens(k).length <= 2)) &&
        !walkStop(tokens(k))
      while (steps < cap && j > 0 && walkable(j - 1) &&
          !covered(j - 1) && !adminCovered(j - 1)) {
        j -= 1; steps += 1
      }
      j
    }

    var i = 0
    while (i < T) {
      val t = tokens(i)
      // postcode: standalone 5-digit token — but NOT a numeric street name
      // ("10158 sk" is SOKAK; izmir street names are 5-digit)
      if (t.length == 5 && digits(t) && !covered(i) &&
          !(i + 1 < T && (tokens(i + 1) == "sk" || tokens(i + 1) == "cad")))
        out += (("POSTA_KODU", i, i + 1))
      // neighbourhood: name + canonical keyword — the dominant gold surface
      // form ("kazimdirik mah"); bare names are the gazetteer probe's job
      if (t == "mah") {
        // the walk's EXTENSION (beyond the adjacent token) stops at known
        // district names and stray single letters: "manisa alasehir fatih
        // mah" keeps "alasehir" as its own ILCE span — but the ADJACENT
        // token is still claimed even when it names a district, because
        // districts and neighbourhoods share names ("yunusemre mah")
        val j = nameStart(i, digitFirst = true, nameWalk, digitsInWalk = true,
          walkStop = w => w.length == 1 || idx.distIndex.contains(w) ||
            aux.exists(_.distIndex.contains(w)))
        if (j < i) out += (("MAHALLE", j, i + 1))
      }
      // street/avenue: name + canonical indicator (the keyword is part of
      // the span in the reference's annotation — "1004 sokak" is B-/I-SOKAK).
      // A numeric street name is complete in itself — never walk past the
      // number into unrelated names ("girne 2103 sk" keeps "girne" free for
      // the neighbourhood probe) — but named streets may carry a leading
      // number ("30 agustos sk", "16 nci sk": digitsInWalk), and slashed
      // numeric names are ONE span ("367 / 2 sk")
      if (t == "sk" || t == "cad") {
        var j =
          if (i > 0 && !covered(i - 1) && digits(tokens(i - 1))) i - 1
          else nameStart(i, digitFirst = true, nameWalk, digitsInWalk = true)
        while (j >= 2 && digits(tokens(j)) && tokens(j - 1) == "/" &&
            digits(tokens(j - 2)) && !covered(j - 1) && !covered(j - 2))
          j -= 2
        if (j < i) out += ((if (t == "sk") "SOKAK" else "CADDE", j, i + 1))
      }
      // boulevard: name + keyword (static-normalized surface forms)
      if (NerOutputs.BulvarKw(t)) {
        val j = nameStart(i, digitFirst = false, nameWalk)
        if (j < i) out += (("BULVAR", j, i + 1))
      }
      // site/residence: name + keyword (F2J SITE_ADI family). Adjacent
      // keywords chain into ONE span ("koyici evleri sitesi"); names may
      // carry digits ("oguzhan 1 sitesi", "4 etap sitesi"); the walk stops
      // at road-context words ("yolu uzeri alp sahil evleri" starts at
      // "alp"); a bare defective "sitesi" with no claimable name stands
      if (NerOutputs.SiteKw(t)) {
        val adjacent = out.indexWhere { case (tp, _, e) => tp == "SITE_ADI" && e == i }
        if (adjacent >= 0) {
          val (tp, s0, _) = out(adjacent)
          out(adjacent) = (tp, s0, i + 1)
        } else {
          // the extension (beyond the adjacent token) also stops at closed-
          // class ADMIN names — a province or real district before the
          // site-name run is its own span ("mugla platin residance sit"),
          // not part of the site name. Real NEIGHBOURHOOD names deliberately
          // do NOT stop the walk: 50k nbhd names cover so much ordinary
          // Turkish vocabulary ("gunes", "yildiz") that stopping on them
          // was measured to shred genuine site names (SITE tp 79 -> 65)
          val j = nameStart(i, digitFirst = true, nameWalk, digitsInWalk = true,
            walkStop = w => w == "yolu" || w == "uzeri" ||
              Gazetteer.AllProvinceSet(w) ||
              aux.exists(_.distIndex.contains(w)))
          if (j < i) out += (("SITE_ADI", j, i + 1))
          else if (t == "sitesi" && !covered(i)) out += (("SITE_ADI", i, i + 1))
        }
      }
      // building name: blok/apartman keywords (exact, or edit-distance-1 for
      // the long apartman forms — "aprtmani", "apat" are the gold corpora's
      // typo tail); "blok : A" keyword-first form
      if (NerOutputs.BinaAdiKw(t) || binaFuzzy(t)) {
        if (t == "blok" && i + 2 < T && tokens(i + 1) == ":") {
          // "blok : A94" normalizes to "blok : a 94" (N4 splits letter-digit
          // boundaries) — absorb the trailing digit run into the label span
          val end = if (i + 3 < T && digits(tokens(i + 3))) i + 4 else i + 3
          out += (("BINA_ADI", i, end))
        } else if (i > 0 && !covered(i - 1) && tokens(i - 1).length == 1 &&
            tokens(i - 1).charAt(0).isLetterOrDigit) {
          // single-char blok label: gold tags EXACTLY "<x> blok" — the site
          // name to its left is its own (SITE_ADI/BINA_ADI) span, so no left
          // walk ("gultekin best a blok" is [a blok], not the whole phrase);
          // a small trailing digit joins ("d blok 2")
          val end = if (i + 1 < T && digits(tokens(i + 1)) &&
            tokens(i + 1).length <= 2 && !covered(i + 1)) i + 2 else i + 1
          out += (("BINA_ADI", i - 1, end))
        } else {
          // blok labels are letters OR digits ("27 blok", "yildiz apartmani")
          val j = nameStart(i, digitFirst = true, nameWalk)
          if (j < i) out += (("BINA_ADI", j, i + 1))
          // bare keyword: gold tags a lone "apartman" with no label ("no : 4
          // apartman") as its own span — blok stays label-anchored (a bare
          // "blok" is usually mid-phrase noise)
          else if (t != "blok" && !covered(i)) out += (("BINA_ADI", i, i + 1))
        }
      }
      // parenthetical free-text note: "( ... )" is a TARIF span in 16 of the
      // gold corpora's 17 parentheticals — tag the whole group
      if (t == "(") {
        val close = tokens.indexOf(")", i + 1)
        if (close > i && close - i <= 12 &&
            (i + 1 until close).exists(k => tokens(k).exists(_.isLetter)) &&
            !(i to close).exists(covered))
          out += (("TARIF", i, close + 1))
      }
      // landmark/directions anchor (TARIF): harvested head nouns + the
      // builtin keyword family; landmark phrases run long ("cevat aksit
      // erkek ogrenci yurdu"), so the walk cap is 5, not nameWalk. Adjacent
      // anchors extend the same span ("olgun market karsisi" is ONE TARIF).
      if (tarifAnchors(t)) {
        // landmark names run past their head noun ("devlet hastanesi evde
        // bakim birimi", "universitesi rektorlugu") — extend RIGHT over free
        // name tokens, but never absorb a token that belongs to the NEXT
        // keyword-anchored name ("hastanesi istiklal mah" keeps "istiklal")
        def extendRight(e0: Int): Int = {
          var e = e0
          var steps = 0
          def nextIsAnchor(k: Int): Boolean = k + 1 < T &&
            (tokens(k + 1) == "mah" || tokens(k + 1) == "sk" ||
              tokens(k + 1) == "cad" || NerOutputs.BulvarKw(tokens(k + 1)) ||
              NerOutputs.SiteKw(tokens(k + 1)) || NerOutputs.BinaAdiKw(tokens(k + 1)))
          // dictionary stop: a token the held-out gazetteer knows as a
          // district/province is admin evidence even when bestMatch picked a
          // different name — absorbing it would make the later ILCE sweep
          // skip it (2.6 only fills uncovered windows) and phase 3 drop the
          // tentative span ("lisesi turgutlu", "osb turgutlu manisa")
          def dictAdmin(k: Int): Boolean =
            idx.distIndex.contains(tokens(k)) || idx.provIndex.contains(tokens(k))
          // positional-ILCE guard: the single name just before a recognized
          // province is the district (rule 3.4 — "osb turgutlu manisa",
          // "mudurlugu soke aydin"); absorbing it would cover the token and
          // disable that rule, which is the only source for districts the
          // leave-one-out dictionary cannot know
          def preProvince(k: Int): Boolean = {
            var n = k + 1
            if (n < T && (tokens(n) == "/" || tokens(n) == "-")) n += 1
            n < T && idx.provIndex.contains(tokens(n))
          }
          while (steps < 4 && e < T && nameLike(tokens(e)) && !covered(e) &&
              !adminCovered(e) && !dictAdmin(e) && !preProvince(e) &&
              !nextIsAnchor(e)) {
            e += 1; steps += 1
          }
          e
        }
        val adjacent = out.indexWhere { case (tp, _, e) => tp == "TARIF" && e == i }
        if (adjacent >= 0) {
          val (tp, s0, _) = out(adjacent)
          out(adjacent) = (tp, s0, extendRight(i + 1))
        } else {
          // same dictionary stop on the left walk ("mudurlugu" must not
          // claim the "soke" of "soke ilce milli egitim mudurlugu")
          val j = nameStart(i, digitFirst = false, cap = 5,
            walkStop = w => idx.distIndex.contains(w) || idx.provIndex.contains(w))
          if (j < i) out += (("TARIF", j, extendRight(i + 1)))
        }
      }
      // floor: "3 kat" / "zemin kat" / "giris kat" / "en ust kat"
      // (number/word-first, the reference's floor template 0) and "kat : 3"
      // / "kat 3" / "k : 3" / "k 6" / "kat / 2" / "kat - 1" (keyword-first,
      // with word numbers "kat bir"); a dangling "kat" or "kat :" with the
      // number dropped is still tagged, as is the "k" of a bare "k d" pair
      if (t == "kat" && i > 0 && !covered(i) && !covered(i - 1) &&
          ((digits(tokens(i - 1)) && tokens(i - 1).length <= 2) ||
            tokens(i - 1) == "zemin" || tokens(i - 1) == "giris" ||
            tokens(i - 1) == "ust")) {
        val s0 = if (tokens(i - 1) == "ust" && i > 1 && tokens(i - 2) == "en" &&
          !covered(i - 2)) i - 2 else i - 1
        out += (("KAT", s0, i + 1))
      } else if ((t == "kat" || t == "k") && !covered(i)) {
        val j = if (i + 1 < T && (tokens(i + 1) == ":" || tokens(i + 1) == "/" ||
          tokens(i + 1) == "-") && i + 2 < T) i + 2 else i + 1
        if (j < T && ((digits(tokens(j)) && tokens(j).length <= 3) ||
            NerOutputs.WordNum(tokens(j))))
          out += (("KAT", i, j + 1))
        else if (t == "kat") {
          // dangling form, sentence-final included ("... apartmani kat")
          val sp = ("KAT", i,
            if (i + 1 < T && tokens(i + 1) == ":") i + 2 else i + 1)
          out += sp; bare += sp
        } else if (i + 1 < T && tokens(i + 1) == "d") {
          val sp = ("KAT", i, i + 1)
          out += sp; bare += sp
        }
      }
      // flat: "daire [no] [:|/] 5" / "d : 5" / "d 7" / "oda 401"; a trailing
      // single letter joins ("daire 9 c"); a bare defective "daire"/"d" with
      // no number is still tagged (gold convention for dropped numbers)
      if ((t == "daire" || t == "oda" || (t == "d" && i + 1 < T &&
          (tokens(i + 1) == ":" || digits(tokens(i + 1))))) && !covered(i)) {
        var j = i + 1
        if (t == "daire" && j < T && tokens(j) == "no") j += 1
        if (j < T && (tokens(j) == ":" || tokens(j) == "/")) j += 1
        // value: digits, a word number, or a single letter that is not a
        // blok label ("daire a", "daire no : z")
        def letterValue(k: Int): Boolean = tokens(k).length == 1 &&
          tokens(k).charAt(0).isLetter &&
          !(k + 1 < T && tokens(k + 1) == "blok")
        if (j < T && ((digits(tokens(j)) && tokens(j).length <= 3) ||
            NerOutputs.WordNum(tokens(j)) ||
            (t == "daire" && letterValue(j)))) {
          val e = if (j + 1 < T && tokens(j + 1).length == 1 &&
            tokens(j + 1).charAt(0).isLetter && !covered(j + 1) &&
            (j + 2 >= T || (tokens(j + 2) != ":" && tokens(j + 2) != "blok" &&
              !digits(tokens(j + 2))))) j + 2 else j + 1
          out += (("DAIRE_NO", i, e))
        } else if (t == "daire" &&
            (j >= T || (!digits(tokens(j)) && tokens(j) != "blok"))) {
          val sp = ("DAIRE_NO", i, i + 1)
          out += sp; bare += sp
        }
      }
      // bare dangling "d" (defective flat marker: "kat 1 d gulkent") — not
      // a blok label, not a keyword form, nothing to attach to
      if (t == "d" && !covered(i) &&
          (i + 1 >= T || (!digits(tokens(i + 1)) && tokens(i + 1) != ":" &&
            tokens(i + 1) != "blok"))) {
        val sp = ("DAIRE_NO", i, i + 1)
        out += sp; bare += sp
      }
      // flat, slash form: "12 / 3" — gold tags "/ 3" as the DAIRE_NO span.
      // NOT when the slashed pair is a street name ("367 / 2 sk"); and when
      // the left digits were claimed by a KEYWORD building number, the
      // suffix belongs to it instead ("no 9 / d", "no 43 / 9" are one span)
      if (t == "/" && i > 0 && i + 1 < T && digits(tokens(i - 1)) &&
          (tokens(i - 1).length <= 3 || covered(i - 1)) &&
          !covered(i) && !covered(i + 1)) {
        // an UNCOVERED 4-digit left side is a slashed street NAME
        // ("7303 / 42"), the izmir numbering family — never a building/flat
        // pair; covered left digits are a keyword-claimed building number
        // ("no 1234 / 5") whose suffix keeps its usual reading
        val nxt = tokens(i + 1)
        val ok = (digits(nxt) && nxt.length <= 3) ||
          (nxt.length == 1 && nxt.charAt(0).isLetter)
        val streetName = i + 2 < T && digits(nxt) &&
          (tokens(i + 2) == "sk" || tokens(i + 2) == "cad")
        if (ok && !streetName) {
          // letter suffix only: "no 9 / d" is one building span (the
          // generator's own "12 / A" form), but "no : 6 / 3" keeps its
          // digit suffix as the flat number
          val bIdx = if (digits(nxt)) -1 else out.indexWhere { case (tp, s0, e) =>
            tp == "BINA_NO" && e == i && !digits(tokens(s0)) }
          if (bIdx >= 0) {
            val (tp, s0, _) = out(bIdx)
            out(bIdx) = (tp, s0, i + 2)
          } else out += (("DAIRE_NO", i, i + 2))
        }
      }
      // the official e-government door-number phrases: "dis kapi no [:] N"
      // is the OUTER door (building number), "ic kapi no [:] [N]" the INNER
      // door (flat number) — gold tags the full phrase incl. the dis/ic
      // qualifier, and a dangling "ic kapi no :" with the value dropped (or
      // followed by a 5-digit postcode, which is NOT the value) is still a
      // span; bare "kapi 6" (no "no") is a flat number
      if (t == "no" && i > 0 && tokens(i - 1) == "kapi" && !covered(i) &&
          !covered(i - 1)) {
        val qual = i > 1 && (tokens(i - 2) == "dis" || tokens(i - 2) == "ic") &&
          !covered(i - 2)
        val s0 = if (qual) i - 2 else i - 1
        val tpe = if (qual && tokens(i - 2) == "ic") "DAIRE_NO" else "BINA_NO"
        val j = if (i + 1 < T && tokens(i + 1) == ":" && i + 2 < T) i + 2 else i + 1
        val e =
          if (j < T && digits(tokens(j)) && tokens(j).length <= 4) {
            if (j + 1 < T && tokens(j + 1).length == 1 &&
              tokens(j + 1).charAt(0).isLetter && !covered(j + 1) &&
              (j + 2 >= T || (tokens(j + 2) != ":" && tokens(j + 2) != "blok" &&
                !digits(tokens(j + 2))))) j + 2 else j + 1
          } else if (i + 1 < T && tokens(i + 1) == ":") i + 2 else i + 1
        out += ((tpe, s0, e))
      } else if (t == "kapi" && !covered(i) && i + 1 < T &&
          tokens(i + 1) != "no" && digits(tokens(i + 1)) &&
          tokens(i + 1).length <= 4 && !covered(i + 1)) {
        out += (("DAIRE_NO", i, i + 2))
      }
      // building number: "[bina] no|numara|n [:] 12 [x]" — keyword + digits
      // (+ trailing single letter: "no 85 a"); "bina : 7 [/ 12]"; a bare
      // defective "no" is tagged alone or with its slashed number ("no / 5")
      if ((t == "no" || t == "numara" ||
          (t == "n" && i + 1 < T && tokens(i + 1) == ":")) && !covered(i) &&
          !(i > 0 && tokens(i - 1) == "kapi" && !covered(i - 1))) {
        val s0 = if (i > 0 && tokens(i - 1) == "bina" && !covered(i - 1)) i - 1 else i
        val j = if (i + 1 < T && tokens(i + 1) == ":" && i + 2 < T) i + 2 else i + 1
        if (j < T && digits(tokens(j)) && tokens(j).length <= 4) {
          val e = if (j + 1 < T && tokens(j + 1).length == 1 &&
            tokens(j + 1).charAt(0).isLetter && !covered(j + 1) &&
            (j + 2 >= T || (tokens(j + 2) != ":" && tokens(j + 2) != "blok" &&
              !digits(tokens(j + 2))))) j + 2 else j + 1
          out += (("BINA_NO", s0, e))
        } else if (t == "no") {
          if (i + 1 < T && (tokens(i + 1) == "/" || tokens(i + 1) == "-") &&
              i + 2 < T && ((digits(tokens(i + 2)) && tokens(i + 2).length <= 4) ||
                tokens(i + 2).length == 1))
            out += (("BINA_NO", i, i + 3))
          else if (i + 1 >= T || tokens(i + 1) != ":") {
            val sp = ("BINA_NO", i, i + 1)
            out += sp; bare += sp
          }
        }
      }
      // keyword-first "bina : 7 [/ 12]" (no "no"): the whole run is the span
      if (t == "bina" && !covered(i) && i + 1 < T && tokens(i + 1) == ":" &&
          i + 2 < T && digits(tokens(i + 2)) && tokens(i + 2).length <= 4) {
        val e = if (i + 4 < T && tokens(i + 3) == "/" &&
          digits(tokens(i + 4)) && tokens(i + 4).length <= 3) i + 5 else i + 3
        out += (("BINA_NO", i, e))
      }
      // naked street-number: "<sk|sitesi|blok> 10 / 3" — the number after a
      // structural keyword is the building number (its "/ 3" flat suffix is
      // the slash rule's), unless the slashed pair is itself a street name
      if (digits(t) && t.length <= 3 && !covered(i) && i > 0 &&
          (covered(i - 1) || NerOutputs.StopKw(tokens(i - 1))) &&
          i + 2 < T && tokens(i + 1) == "/" &&
          (digits(tokens(i + 2)) || tokens(i + 2).length == 1) &&
          !(i + 3 < T && (tokens(i + 3) == "sk" || tokens(i + 3) == "cad")))
        out += (("BINA_NO", i, i + 1))
      i += 1
    }

    // --- 2.6 dictionary ILCE sweep: every uncovered window matching a KNOWN
    // district name is an ILCE span. bestMatch (above) picks ONE name per
    // sentence — real addresses mix and repeat districts ("sirinyer / buca /
    // izmir", "... soke ilce milli egitim mudurlugu soke aydin"), and the
    // leave-one-corpus-out mined gazetteer makes the dictionary precise.
    {
      var k = 0
      while (k < T) {
        val hit = idx.distIndex.getOrElse(tokens(k), Array.empty[(Array[String], String)])
          .find { case (toks2, _) =>
            toks2.length <= T - k &&
              (0 until toks2.length).forall(x => tokens(k + x) == toks2(x)) &&
              !(k until k + toks2.length).exists(covered)
          }
        hit match {
          case Some((toks2, _)) =>
            out += (("ILCE", k, k + toks2.length)); k += toks2.length
          case None => k += 1
        }
      }
    }

    // --- 3. keyword evidence wins over tentative admin point matches
    out ++= admin.filterNot { case (_, s, e) =>
      out.exists { case (_, s2, e2) => s < e2 && s2 < e }
    }

    // --- 3.2 closed-class IL sweep: the 81 provinces are reference-table
    // data (the full PTT gazetteer's `il` column — every real deployment
    // loads it), so any still-uncovered token naming one is an IL span.
    // This only ADDS spans the bestMatch probe missed — bestMatch picks ONE
    // name per sentence, so "yalikavak bodrum mugla" with a mined index
    // that doesn't know mugla previously dropped every mugla mention.
    // Running AFTER phase 3 keeps keyword evidence and the probe's choices
    // untouched; running BEFORE 3.4 lets the positional-district rule key
    // off the new IL spans ("bodrum mugla" → bodrum becomes ILCE).
    //
    // Homonym guard: several province names are common nouns (ordu=army,
    // agri=pain, van, mus, kars), so the sweep only fires in sentences with
    // STRUCTURAL address evidence — some non-landmark span already present
    // (admin probe, mah/sk/cad/no/kat family, postcode). A lone TARIF
    // phrase ("ordu evi karsisi") or plain prose mentioning a province-named
    // noun stays untouched.
    {
      val addressy = out.exists { case (tp, _, _) => tp != "TARIF" }
      var k = 0
      while (addressy && k < T) {
        if (graft.sources.Gazetteer.AllProvinceSet(tokens(k)) && !covered(k))
          out += (("IL", k, k + 1))
        k += 1
      }
    }

    // --- 3.4 positional ILCE: the name run immediately before a recognized
    // province is the district ("koycegiz mugla", "soke / aydin") — the
    // leave-one-out mined dictionary cannot know districts that only appear
    // in the held-out corpus, but the positional convention identifies them;
    // a slash after the province flags the reversed form ("izmir / torbali")
    out.collect { case ("IL", s, _) => s }.foreach { s0 =>
      var k = s0 - 1
      if (k >= 0 && (tokens(k) == "/" || tokens(k) == "-")) k -= 1
      // single token only — districts are one token in the corpora, and a
      // longer uncovered run before the province is "<mah-name> <district>"
      // ("emecik datca mugla"): extending would swallow the neighbourhood
      // the 3.5 rule claims next
      if (k >= 0 && nameLike(tokens(k)) && !covered(k) &&
          !NerOutputs.NotNbhd(tokens(k))) {
        // split-typo fuse: when the CONCATENATION of this token and the one
        // before it is a real-table district name ("sefe rihisar" →
        // seferihisar, "k arsiyaka" → karsiyaka), the district was typed
        // with a stray space — gold tags both tokens; exact closed-class
        // concatenation match keeps this safe
        val fused = aux.exists { ax =>
          k > 0 && nameLike(tokens(k - 1)) && !covered(k - 1) &&
            ax.distToNbhdUnion.contains(tokens(k - 1) + tokens(k))
        }
        out += (("ILCE", if (fused) k - 1 else k, k + 1))
      }
    }
    out.collect { case ("IL", _, e) => e }.foreach { e0 =>
      if (e0 < T && tokens(e0) == "/" && e0 + 1 < T && nameLike(tokens(e0 + 1)) &&
          !covered(e0 + 1) && !NerOutputs.NotNbhd(tokens(e0 + 1)))
        out += (("ILCE", e0 + 1, e0 + 2))
    }

    // --- 3.45 a bare name immediately before a NUMERIC-named street or
    // site span is a place name ("girne 2103 sk", "camikebir 1 gunes
    // sitesi") — numeric names never take a left walk, so the token is
    // free, and the corpora tag it MAHALLE
    out.toSeq.collect {
      case (tp, s, _) if (tp == "SOKAK" || tp == "CADDE" || tp == "SITE_ADI") &&
        digits(tokens(s)) => s
    }.foreach { s0 =>
      if (s0 > 0 && nameLike(tokens(s0 - 1)) && !covered(s0 - 1) &&
          !NerOutputs.NotNbhd(tokens(s0 - 1)))
        out += (("MAHALLE", s0 - 1, s0))
    }

    // --- 3.5 positional bare-MAHALLE: in the Turkish address tail the name
    // run immediately before a recognized district is the neighbourhood
    // ("... kuspinar pamukkale denizli"), optionally across one separator
    // ("turgutreis - bodrum"). Claimed only when name-like and uncovered;
    // extends over ONE more name token ("mustafa kemal buca"), guarded
    // against stutter typos ("mavis mavisehir" claims only "mavisehir").
    out.toSeq.collect { case ("ILCE", s, e) => (s, e) }.foreach { case (s0, e0) =>
      var k = s0 - 1
      if (k >= 0 && (tokens(k) == "/" || tokens(k) == "-")) k -= 1
      if (k >= 0 && nameLike(tokens(k)) && !covered(k) &&
          !NerOutputs.NotNbhd(tokens(k))) {
        var j = k
        // closed-class longest-name extension first: walk left up to 2 more
        // tokens and keep the LONGEST run the real table confirms as a
        // neighbourhood of THIS district ("ziebart yunus emre karabaglar" →
        // "yunus emre"; "gazi mustafa kemal menemen" → the full 3-token
        // name). The hierarchy gate is what makes a multi-token walk safe
        // here — an unconfirmed longer run is a business name whose tail is
        // the neighbourhood, exactly as before.
        val confirmed = aux.flatMap { ax =>
          val allowed = realDistName(ax, tokens, s0, e0)
            .flatMap(ax.distToNbhdUnion.get).getOrElse(Set.empty[String])
          (2 to 0 by -1).collectFirst {
            case back if k - back >= 0 &&
              (k - back to k).forall(t => nameLike(tokens(t)) && !covered(t)) &&
              allowed(tokens.slice(k - back, k + 1).mkString(" ")) => k - back
          }
        }
        confirmed match {
          case Some(j2) => j = j2
          case None =>
            // extend over ONE more name token, only when that makes the
            // COMPLETE uncovered name run ("6 mustafa kemal buca" →
            // "mustafa kemal") — a longer run is a business/organization
            // name whose tail is not a neighbourhood ("proje ofisi
            // muradiye" → just "muradiye"); stutter typos never join
            // ("mavis mavisehir" claims only "mavisehir")
            if (j > 0 && nameLike(tokens(j - 1)) && !covered(j - 1) &&
                !tokens(j).startsWith(tokens(j - 1)) &&
                (j - 1 == 0 || !nameLike(tokens(j - 2))))
              j -= 1
        }
        out += (("MAHALLE", j, k + 1))
      }
    }

    // --- 3.6 closed-class admin-tail retype: the Turkish address tail runs
    // "<mahalle> <ilçe> <il>", so when two admin spans sit adjacent (at most
    // one / or - between) and the real table knows the LEFT one as a
    // neighbourhood of the RIGHT one's district, the left span is the
    // MAHALLE — even when its surface form names some other admin unit
    // elsewhere ("cankaya konak izmir": Çankaya is an Ankara district AND a
    // Konak neighbourhood; the occurrence sweep typed it ILCE).
    aux.foreach { ax =>
      val adminIdx = out.zipWithIndex.collect {
        case ((t, s, e), oi) if t == "IL" || t == "ILCE" => (t, s, e, oi)
      }.sortBy(_._2)
      for (k <- 0 until adminIdx.length - 1) {
        val (_, sx, ex, oi) = adminIdx(k)
        val (td, sd, ed, _) = adminIdx(k + 1)
        val gap = (ex until sd).map(tokens)
        val adjacent = gap.isEmpty ||
          (gap.length == 1 && (gap(0) == "/" || gap(0) == "-"))
        val xName = tokens.slice(sx, ex).mkString(" ")
        val dNbhds = realDistName(ax, tokens, sd, ed)
          .flatMap(ax.distToNbhdUnion.get).getOrElse(Set.empty[String])
        if (adjacent && td == "ILCE" &&
            xName != tokens.slice(sd, ed).mkString(" ") && dNbhds(xName))
          out(oi) = (("MAHALLE", sx, ex))
      }
    }

    // --- 3.65 closed-class district-after-province: Turkish addresses also
    // run top-down ("manisa alasehir fatih mah"); an uncovered token right
    // after an IL span (optionally across / or -) that the real table lists
    // as a district OF THAT VERY PROVINCE is its ILCE. The hierarchy gate is
    // what keeps this safe where the blanket district sweep was measured
    // net-negative: a road named after some other province's district
    // ("akhisar caddesi") fails the gate or is already keyword-covered.
    // (3.65 spans are ILCE CLAIMS only — they are kept out of the step-4
    // probe's district-context lookup below: feeding them in was measured
    // to mint wrong bare-MAHALLE claims off the newly typed district)
    // lateIlce holds the 3.65-claimed SPANS (values, not indices — later
    // phases remove/replace spans, which would shift positional bookkeeping)
    val lateIlce = scala.collection.mutable.Set[(String, Int, Int)]()
    aux.foreach { ax =>
      out.toSeq.collect { case ("IL", s, e) => (s, e) }.foreach { case (s0, e0) =>
        val ilName = tokens.slice(s0, e0).mkString(" ")
        var k = e0
        if (k < T && (tokens(k) == "/" || tokens(k) == "-")) k += 1
        if (k < T && nameLike(tokens(k)) && !covered(k) &&
            ax.provToDistricts.getOrElse(ilName, Set.empty[String])(tokens(k))) {
          lateIlce += (("ILCE", k, k + 1))
          out += (("ILCE", k, k + 1))
        }
      }
    }

    // --- 3.7 a claimed ILCE the real table does NOT know as a district
    // ("yalikavak" — a belde the gold corpora tag ILCE sentence-finally but
    // fold into the neighbourhood span elsewhere) that sits immediately
    // before a MAHALLE span is that span's leading name: gold tags
    // "yalikavak dirmil mah" / "yalikavak geris mahallesi" as ONE MAHALLE.
    // Real districts never merge — the closed-class gate keeps the top-down
    // "manisa alasehir fatih mah" ILCE intact. Merges are decided on an
    // immutable snapshot and applied by VALUE afterwards (an indexed write
    // into a buffer being removed from walks onto the wrong span).
    aux.foreach { ax =>
      val snapshot = out.toList
      val mahByStart = snapshot.collect { case ("MAHALLE", s, e) => (s, e) }.toMap
      snapshot.foreach { case sp @ (t, s, e) =>
        if (t == "ILCE" && realDistName(ax, tokens, s, e).isEmpty &&
            mahByStart.contains(e)) {
          val merged = ("MAHALLE", s, mahByStart(e))
          Seq(sp, ("MAHALLE", e, mahByStart(e))).foreach { victim =>
            val i = out.indexOf(victim)
            if (i >= 0) out.remove(i)
          }
          out += merged
        }
      }
    }

    // --- 4. gazetteer MAHALLE probe for bare (keyword-less) names ---
    // auxiliary closed-class probe: hierarchy-restricted ONLY — a real
    // neighbourhood of the sentence's recognized district (mined bestMatch
    // or a positional-ILCE span the real table knows). No unrestricted
    // fallback: 50k real names matching any stray token would be FP fuel.
    def auxProbe: Option[(String, Int, Int)] = aux.flatMap { ax =>
      // every recognized district is a candidate context, probed in span
      // order until one yields a hit — a sentence can carry a spurious
      // district homonym BEFORE the real one ("adnan menderes efeler
      // aydin": İzmir's menderes is typed ILCE but has no matching
      // neighbourhood; efeler does)
      val distNames = (dist.map(_._1).toSeq.filter(ax.distToNbhdUnion.contains) ++
        out.toSeq.collect {
          case sp @ ("ILCE", s, e) if !lateIlce(sp) => realDistName(ax, tokens, s, e)
        }.flatten).distinct
      distNames.iterator.map { d =>
        val p2 = prov.map(_._1).orElse(ax.distToFirstProv.get(d))
        val allowed = p2.flatMap(p => ax.pairToNbhds.get((p, d)))
          .getOrElse(ax.distToNbhdUnion.getOrElse(d, Set.empty[String]))
        StaticParser.bestMatch(tokens, ax.nbhdIndex, Some(allowed))
      }.collectFirst { case Some(h) => h }
    }
    // gold tags EVERY mention, so the (restricted) probe hit is projected
    // onto all its occurrences; overlap with existing spans is checked per
    // occurrence. The MINED probe still fires only in MAHALLE-less
    // sentences (its unrestricted fallback over-fires in prose); the aux
    // probe's hierarchy restriction makes it safe alongside keyword spans.
    lazy val auxHit = auxProbe // lazy: the mined probe short-circuits it
    val probeHit: Option[(String, Int, Int)] =
      if (!out.exists(_._1 == "MAHALLE")) {
        val provName = prov.map(_._1).orElse(dist.flatMap(d => idx.distToFirstProv.get(d._1)))
        val allowedN = dist.map { d =>
          provName match {
            case Some(p) => idx.pairToNbhds.getOrElse((p, d._1), Set.empty[String])
            case None    => idx.distToNbhdUnion.getOrElse(d._1, Set.empty[String])
          }
        }
        // precedence: mined-restricted, then the aux closed-class probe
        // (hierarchy-restricted — strictly more trustworthy than an
        // unrestricted guess), then the mined unrestricted fallback
        StaticParser.bestMatch(tokens, idx.nbhdIndex, allowedN)
          .orElse(auxHit)
          .orElse(if (allowedN.isDefined)
            StaticParser.bestMatch(tokens, idx.nbhdIndex, None) else None)
      } else auxHit
    probeHit.foreach { case (n, _, _) =>
      lazy val auxConfirmed = auxHit.exists(_._1 == n)
      occurrences(n).foreach { case (s, e) =>
        // gold annotation convention (goldset_1k_yegeb.conll): the keyword
        // token belongs to the span — extend over a following canonical "mah"
        val e2 = if (e < T && tokens(e) == "mah") e + 1 else e
        val overlapped = out.zipWithIndex.toSeq.filter {
          case ((_, s2, e2b), _) => s < e2b && s2 < e2 }
        if (overlapped.isEmpty) out += (("MAHALLE", s, e2))
        else if (auxConfirmed && overlapped.forall { case ((t2, s2, e2b), _) =>
            (t2 == "ILCE" || t2 == "IL") && s2 >= s && e2b <= e2 &&
              (e2b - s2) < (e2 - s) }) {
          // the real table confirms the LONGER name as this district's
          // neighbourhood, and every claim in the way is an admin span
          // strictly inside it — a district name embedded in a longer
          // neighbourhood name ("adnan menderes" ⊃ İzmir's "menderes"):
          // the closed-class containment wins
          overlapped.map(_._2).sortBy(i => -i).foreach(out.remove)
          out += (("MAHALLE", s, e2))
        }
      }
    }
    if (out.forall(bare)) out.clear() // bare markers need address context
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

  /** The per-row E6/E7 prediction kernel — ONE implementation shared by
    * [[process]] and [[runCsv]] so the batch and CSV surfaces can never
    * fork: norm text → (pred_tags, entities_json, entities_flat). */
  private def predictRow(norm: String, idx: Gazetteer.Index,
                         aux: Option[Gazetteer.Index] = None): (String, String, String) = {
    val tokens = if (norm == null) Array.empty[String]
                 else norm.split(" ").filter(_.nonEmpty)
    val sps = spans(tokens, idx, aux = aux)
    val ents = aggregateEntities(tokens, sps)
    (spansToBio(tokens.length, sps).mkString(" "),
      entitiesJson(ents), joinEntitiesFlat(ents))
  }

  /** E6: the batched extraction kernel over (url, normalized text).
    *
    * @param bAux optional broadcast of a second, closed-class gazetteer index
    *             (the real PTT table — [[GoldEval.realIndex]]) consulted by
    *             [[spans]] for walk stops, hierarchy-restricted probes and
    *             admin-tail retypes. Pass it when `bIdx` holds a PARTIAL
    *             index (a subset view or a mined working set); callers whose
    *             `bIdx` is already the full gazetteer gain nothing.
    */
  def process(df: DataFrame, urlCol: String, normCol: String,
              bIdx: Broadcast[Gazetteer.Index], batchSize: Int = 32,
              bAux: Option[Broadcast[Gazetteer.Index]] = None): Dataset[NerRow] = {
    import df.sparkSession.implicits._
    df.select(col(urlCol), col(normCol)).as[(String, String)].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val idx = bIdx.value
        val aux = bAux.map(_.value)
        batch.map { case (url, norm) =>
          val (bio, json, flat) = predictRow(norm, idx, aux)
          NerRow(url, norm, bio, json, flat)
        }
      }
    }
  }

  /** E7/E8: the reference's batch-CLI shape — CSV in, predictions appended as
    * new columns, CSV out (chunked read → partitions; incremental append →
    * distributed write).
    *
    * Single-pass kernel: each row carries its own prediction columns out of
    * the same `mapPartitions` call that computed them, so row↔prediction
    * alignment is structural. The previous shape joined two plan branches on
    * `monotonically_increasing_id`, whose values only coincided because
    * file-scan partition layout is deterministic — speculative execution or
    * an AQE re-plan could renumber one side and silently mis-join (round-3
    * verdict item 3). CSV rows have no natural key, so no join key is safe;
    * not joining is. */
  def runCsv(spark: SparkSession, inCsv: String, outCsv: String, textCol: String,
             bIdx: Broadcast[Gazetteer.Index], batchSize: Int = 32,
             bAux: Option[Broadcast[Gazetteer.Index]] = None): Unit = {
    val in = spark.read.option("header", "true").csv(inCsv)
    // collision-proof working column: withColumn REPLACES an existing column
    // in place, so a fixed "__norm" on a CSV that already has that header
    // would both clobber user data and shift the positional drop below
    val normName = Iterator.from(0)
      .map(i => if (i == 0) "__norm" else s"__norm_$i")
      .find(n => !in.columns.contains(n)).get
    val withNorm = in.withColumn(normName, graft.functions.TrNormalize.static(col(textCol)))
    val normIdx = withNorm.schema.fieldIndex(normName)
    val outSchema = org.apache.spark.sql.types.StructType(
      in.schema.fields ++ Seq("pred_tags", "entities_json", "entities_flat")
        .map(org.apache.spark.sql.types.StructField(_,
          org.apache.spark.sql.types.StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    withNorm.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val idx = bIdx.value
        val aux = bAux.map(_.value)
        batch.map { r =>
          val (bio, json, flat) = predictRow(r.getString(normIdx), idx, aux)
          org.apache.spark.sql.Row.fromSeq(
            r.toSeq.patch(normIdx, Nil, 1) ++ Seq(bio, json, flat))
        }
      }
    }(enc).write.option("header", "true").mode("overwrite").csv(outCsv)
  }
}
