package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TrText

/** One BIO training sample (ref group_A2E_BIO_synth.py:313,424:
  * raw + parallel token/tag arrays). */
case class BioSample(raw: String, tokens: Array[String], tags: Array[String],
                     sample_id: Long, group: String)

/** Seeded BIO-corpus synthesis + CoNLL sink/reader + distribution stats —
  * the Spark-native re-expression of the reference's synthetic-data pipeline
  * (SURVEY.md §2.5 S1–S9, §2.7 V1).
  *
  * Samples are composed from tagged segments exactly like the reference's
  * generators (admin units from the gazetteer pools, keyword variants,
  * probabilistic segment composition), driven by the same counter-based
  * hash RNG as [[Pages]] — `spark.range(n)` → kernel, deterministic at any
  * partitioning.
  *
  * Two generator families, mixed 88/12 like the reference's training corpus
  * (132k A2E + 18k F2J, BERTurk notebook cell 11):
  *  - A2E ([[sampleOf]]): mahalle/cadde-sokak/bina/kat/daire + admin triple
  *    (ref group_A2E_BIO_synth.py);
  *  - F2J ([[sampleF2J]]): SITE_ADI / BINA_ADI / BULVAR / DAIRE_NO bodies and
  *    the category-aware TARIF landmark branch (ref group_F2J_BIO_synth.py:
  *    198-276,329-414) — together the full 13-type / 24-label space of
  *    models/BERTurk_stage1_out/config.json.
  */
object Bio {

  /** The complete entity-type space (13 types; BIO = 26 labels + O, of which
    * the reference's config lists the 24 that occur). */
  val EntityTypes: Seq[String] = Seq(
    "BINA_ADI", "BINA_NO", "BULVAR", "CADDE", "DAIRE_NO", "IL", "ILCE", "KAT",
    "MAHALLE", "POSTA_KODU", "SITE_ADI", "SOKAK", "TARIF")

  /** Tagged segment: tokens + entity type (O for noise). */
  private def seg(tpe: String, toks: String*): Seq[(String, String)] = {
    toks.zipWithIndex.map { case (t, i) =>
      (t, if (tpe == "O") "O" else (if (i == 0) "B-" else "I-") + tpe)
    }
  }

  import Pages.{pick, rng}

  /** Deterministic percent-chance from the counter-hash RNG. */
  private def chance(seed: Long, id: Long, tag: Long, pct: Int): Boolean =
    ((rng(seed, id, tag) >>> 1) % 100) < pct

  // ------------------- F2J pools (representative subsets of the reference's
  // public config pools: general_config.py:215-331, groupF2J_config.py:5-13;
  // the full pools are hundreds of names — the engine keeps the same
  // structure with enough variety for distribution tests) -------------------

  val SiteNames: IndexedSeq[String] = IndexedSeq(
    "Ege Perla", "Folkart Towers", "Mistral İzmir", "Acropol Canyon",
    "Elysium Ada", "Royal Panorama", "AquaCity", "Sümerpark", "Modern Nest",
    "Panorama Loft", "Nidapark Çamlık", "Zen Suites")
  val SiteKw: IndexedSeq[String] = IndexedSeq(
    "evleri", "sitesi", "site", "rezidans", "residence", "tower", "plaza", "konutları")
  val BlokLabels: IndexedSeq[String] = IndexedSeq(
    "A", "B", "C", "D", "E", "F", "1", "3", "A94", "C3", "E59")
  val ApartmanNames: IndexedSeq[String] = IndexedSeq(
    "Yıldız", "Gül", "Defne", "Papatya", "Zeytin", "Manolya", "Çınar", "Huzur",
    "Deniz", "Poyraz", "Mehmet", "Ayşe", "Zeynep", "Elif", "Lavanta", "Sedir")
  val ApartmanKw: IndexedSeq[String] = IndexedSeq("apartmanı", "apt", "apart", "apartman")
  val BulvarNames: IndexedSeq[String] = IndexedSeq(
    "Adnan Menderes", "Atatürk", "Cumhuriyet", "İnönü", "Mustafa Kemal",
    "Turgut Özal", "Zübeyde Hanım", "19 Mayıs", "Dumlupınar", "Mimar Sinan")
  val BulvarKw: IndexedSeq[String] = IndexedSeq("bulvarı", "bulv", "bulvar")

  /** TARIF categories: (names, phrase templates with {name}), weighted like
    * _DEFAULT_TARIF_CAT_WEIGHTS (group_F2J_BIO_synth.py:152-161) via
    * repetition counts in [[TarifWeighted]]. */
  val TarifCats: IndexedSeq[(String, IndexedSeq[String], IndexedSeq[String])] = IndexedSeq(
    ("market_chain",
      IndexedSeq("Migros", "Şok", "A101", "BİM", "CarrefourSA", "File"),
      IndexedSeq("{name} market güvenliğe bırakınız",
        "{name} market ana giriş danışma",
        "{name} market kargo teslim alanı 2",
        "{name} market kasalar yanı müşteri hizmetleri")),
    ("local_shop",
      IndexedSeq("Köşe", "Merkez", "Bereket", "Güven", "Çınar"),
      IndexedSeq("{name} bakkalı üstü teslim alınacaktır",
        "{name} bakkalı karşısı apartman girişi",
        "{name} bakkalı yanında kargo noktası")),
    ("university",
      IndexedSeq("Ege", "Dokuz Eylül", "Hacettepe", "Bilkent"),
      IndexedSeq("{name} üniversitesi kütüphane giriş bankosu",
        "{name} üniversitesi kampüsü güvenlik noktası 1",
        "{name} üniversitesi öğrenci işleri dairesi")),
    ("hospital",
      IndexedSeq("Devlet", "Şehir", "Memorial", "Acıbadem"),
      IndexedSeq("{name} hastanesi ana bina danışma",
        "{name} hastanesi acil servisi triyaj alanı",
        "{name} hastanesi kan alma birimi")),
    ("avm",
      IndexedSeq("Forum Bornova", "Optimum", "MaviBahçe", "Kanyon"),
      IndexedSeq("{name} avm ana giriş danışma",
        "{name} avm otopark kapı 2")),
    ("hotel",
      IndexedSeq("Hilton", "Divan", "Dedeman", "Rixos"),
      IndexedSeq("{name} oteli resepsiyona bırakınız",
        "{name} oteli lobi danışma")))

  /** Weighted category index: market .35, local .15, avm .12, univ .10,
    * hospital .10, hotel .08 (approximated in twentieths). */
  private val TarifWeighted: IndexedSeq[Int] =
    IndexedSeq(0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 0, 1)

  private val CountryTokens = IndexedSeq("tr", "TR", "Türkiye", "TÜRKİYE")

  // ------------------------- noise injection (S4) ---------------------------

  /** ≥`minSeps`-separator O-noise + trailing country token (ref
    * group_A2E_BIO_synth.py:263-310 / group_F2J_BIO_synth.py:278-326):
    * separators are inserted before B- boundaries (up to `minSeps` distinct
    * ones, deterministically sampled), topped up at safe interior positions,
    * and one country token is always appended tagged O.
    *
    * Deviation from the reference, on purpose: the reference's top-up step
    * inserts at ANY non-separator position, which can split a B-X/I-X chain
    * and emit dangling I- tags; this injector only inserts before B- or O
    * tokens, so every sample stays BIO-well-formed. */
  def injectNoise(flat: Seq[(String, String)], seed: Long, id: Long,
                  minSeps: Int, seps: IndexedSeq[String]): Seq[(String, String)] = {
    val bPoints = flat.zipWithIndex.collect {
      case ((_, y), i) if i > 0 && y.startsWith("B-") => i
    }
    val chosen: Set[Int] =
      if (bPoints.length > minSeps)
        bPoints.sortBy(i => rng(seed, id, 300 + i)).take(minSeps).toSet
      else bPoints.toSet
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var added = 0
    flat.zipWithIndex.foreach { case (p, i) =>
      if (chosen(i)) { out += ((pick(seps, seed, id, 400 + i), "O")); added += 1 }
      out += p
    }
    var guard = 0
    while (added < minSeps && out.length > 2 && guard < 24) {
      val j = 1 + ((rng(seed, id, 500 + guard) >>> 1) % (out.length - 1)).toInt
      val (tk, tg) = out(j)
      if (!seps.contains(tk) && (tg == "O" || tg.startsWith("B-"))) {
        out.insert(j, (pick(seps, seed, id, 600 + guard), "O"))
        added += 1
      }
      guard += 1
    }
    out += ((pick(CountryTokens, seed, id, 99), "O"))
    out.toSeq
  }

  // ------------------------------ A2E generator -----------------------------

  /** Avenue-name pool (representative subset of COMMON_AVENUE_NAMES,
    * general_config.py:63-105 — the S8 top-10 tally runs over these). */
  val AvenueNames: IndexedSeq[String] = IndexedSeq(
    "Mustafa Kemal Sahil", "Mithatpaşa", "Kıbrıs Şehitleri", "Gazi",
    "Fevzi Paşa", "Şair Eşref", "Ankara", "Anadolu", "Yeşildere",
    "Cumhuriyet", "Girne", "Cemal Gürsel", "Homeros", "Mimar Sinan",
    "Atatürk", "Aziziye", "Fatih", "İstasyon", "Hükümet", "Poligon")

  // keyword variant pools after the reference's _sanitize_kw dot-strip
  // (general_config.py:47-52)
  private val NbhdKwPool = IndexedSeq("mahallesi", "mah", "mh")
  private val AvenueKwPool = IndexedSeq("caddesi", "cadde", "cad", "cd")
  private val StreetKwPool = IndexedSeq("sokak", "sk", "sok")
  private val BinaNoKwPool = IndexedSeq("no", "bina no")
  private val FlatNoKwPool = IndexedSeq("daire", "d", "daire no")
  private val FloorKwPool = IndexedSeq("kat", "k")

  /** A2E `generate_one` (ref group_A2E_BIO_synth.py:313-427) with the
    * reference's structural probabilities (groupA2E_config.py): neighbourhood
    * bare-form .25 (bare-uppercase .65), repeat-neighbourhood .15,
    * avenue+street .45 / only-avenue .20 / only-street .35, segment shuffle
    * .20, building/flat both .30 / building .35 / flat .35 (the CODE branch —
    * the config's unused p_only_flat notwithstanding), flat-before-building
    * swap .15, floor .25 (4 templates), colon-after-keyword .55, postcode
    * ONLY before the admin pair at .10, admin slash .45 / district-first .65,
    * prepend-admin-again .20 (with neighbourhood .40), all-uppercase .05,
    * noise .05 with ≥3 separators from ("-","/"). */
  def sampleOf(seed: Long, id: Long): BioSample = {
    import Pages._
    val ent = entityOf(seed, id)
    val nbhdDisp = if (chance(seed, id, 40, 5)) trUpper(ent.rawNbhd) else ent.rawNbhd
    val provDisp = if (chance(seed, id, 41, 15)) trUpper(ent.rawProvince) else ent.rawProvince
    val distDisp = if (chance(seed, id, 42, 15)) trUpper(ent.rawDistrict) else ent.rawDistrict

    def nbhdSeg(t: Long): Seq[(String, String)] =
      if (chance(seed, id, t, 25)) { // p_neighborhood_bare
        val nm = if (chance(seed, id, t + 1, 65)) trUpper(nbhdDisp) else nbhdDisp
        seg("MAHALLE", nm.split(" "): _*)
      } else
        seg("MAHALLE", (nbhdDisp.split(" ") :+ pick(NbhdKwPool, seed, id, t + 2)): _*)

    // --- core body: nbhd [+ repeat] + avenue/street, optionally shuffled ---
    var body = Seq(nbhdSeg(43))
    if (chance(seed, id, 46, 15)) body :+= nbhdSeg(47) // p_repeat_neighborhood
    val rAS = (rng(seed, id, 50) >>> 1) % 100
    if (rAS < 65) // both (.45) or only-avenue (.20): named avenue + keyword
      body :+= seg("CADDE",
        (pick(AvenueNames, seed, id, 51).split(" ") :+ pick(AvenueKwPool, seed, id, 52)): _*)
    if (rAS < 45 || rAS >= 65) { // both or only-street: numeric street name
      val n = (1 + ((rng(seed, id, 53) >>> 1) % 4000)).toString
      val toks = if (chance(seed, id, 54, 35))
        Seq(n, "/", (1 + ((rng(seed, id, 55) >>> 1) % 9)).toString)
      else Seq(n)
      body :+= seg("SOKAK", (toks :+ pick(StreetKwPool, seed, id, 56)): _*)
    }
    if (body.length > 1 && chance(seed, id, 57, 20)) // p_shuffle_segments
      // sort-key tags live in their own 130+ range: 58+i would collide with
      // the rBF stream (60) and BINA_NO's 61..65, correlating segment order
      // with building/flat structure instead of shuffling independently
      body = body.zipWithIndex.sortBy { case (_, i) => rng(seed, id, 130L + i) }.map(_._1)

    var flat = body.flatten

    // --- building / flat / floor ---
    def numKwSeg(tpe: String, kwPool: IndexedSeq[String], t: Long, maxN: Int,
                 slashLetter: Boolean): Seq[(String, String)] = {
      val kw = pick(kwPool, seed, id, t).split(" ").toSeq
      val kws = if (chance(seed, id, t + 1, 55)) kw :+ ":" else kw // p_colon .55
      var toks = kws :+ (1 + ((rng(seed, id, t + 2) >>> 1) % maxN)).toString
      if (slashLetter && chance(seed, id, t + 3, 35)) // "12 / A" building form
        toks = toks ++ Seq("/",
          "ABCDEFGH".charAt(((rng(seed, id, t + 4) >>> 1) % 8).toInt).toString)
      seg(tpe, toks: _*)
    }
    def floorSeg(t: Long): Seq[(String, String)] = {
      val num = (1 + ((rng(seed, id, t) >>> 1) % 20)).toString
      ((rng(seed, id, t + 1) >>> 1) % 4) match { // the 4 reference templates
        case 0 => seg("KAT", num, "kat")
        case 1 => seg("KAT", pick(FloorKwPool, seed, id, t + 2), ":", num)
        case 2 => seg("KAT", "k", ":", num)
        case _ => seg("KAT", pick(FloorKwPool, seed, id, t + 3), num)
      }
    }
    val rBF = (rng(seed, id, 60) >>> 1) % 100
    val segBina =
      if (rBF < 65) Some(numKwSeg("BINA_NO", BinaNoKwPool, 61, 300, slashLetter = true))
      else None
    val segFlat =
      if (rBF < 30 || rBF >= 65) Some(numKwSeg("DAIRE_NO", FlatNoKwPool, 66, 120, slashLetter = false))
      else None
    val segFloor = if (chance(seed, id, 70, 25)) Some(floorSeg(71)) else None
    val ordered =
      if (segBina.isDefined && segFlat.isDefined && chance(seed, id, 75, 15))
        Seq(segFlat, segBina, segFloor) // p_swap_flat_before_building
      else Seq(segBina, segFlat, segFloor)
    flat ++= ordered.flatten.flatten

    // --- POSTA_KODU before admin (.10) — the ONLY postcode emission ---
    if (chance(seed, id, 76, 10)) flat ++= seg("POSTA_KODU", ent.gaz.postcode)

    // --- admin pair at end (slash .45, district-first .65) ---
    val useSlash = chance(seed, id, 77, 45)
    val distFirst = chance(seed, id, 78, 65)
    def adminPair: Seq[(String, String)] = {
      val sl = if (useSlash) seg("O", "/") else Nil
      if (distFirst)
        seg("ILCE", distDisp.split(" "): _*) ++ sl ++ seg("IL", provDisp.split(" "): _*)
      else
        seg("IL", provDisp.split(" "): _*) ++ sl ++ seg("ILCE", distDisp.split(" "): _*)
    }
    flat ++= adminPair

    // --- optional prepend admin again (.20; with neighbourhood .40) ---
    if (chance(seed, id, 80, 20)) {
      var pre = Seq.empty[(String, String)]
      if (chance(seed, id, 81, 40)) {
        pre ++= seg("MAHALLE", nbhdDisp.split(" "): _*)
        if (useSlash) pre ++= seg("O", "/")
      }
      flat = pre ++ adminPair ++ flat
    }

    // --- all-uppercase cosmetics (.05) ---
    if (chance(seed, id, 82, 5)) flat = flat.map { case (t, y) => (trUpper(t), y) }

    // --- ≥3-separator O-noise + country tail (.05, seps ("-","/")) ---
    // tag 120, NOT 67: chance(67,5) is a strict subset of DAIRE_NO's colon
    // stream chance(66+1,55), which made every noisy sample with a DAIRE_NO
    // segment carry the colon form with probability 1.0
    if (chance(seed, id, 120, 5))
      flat = injectNoise(flat, seed, id, minSeps = 3, seps = IndexedSeq("-", "/"))

    val tokens = flat.map(_._1).toArray
    val tags = flat.map(_._2).toArray
    // raw header is the punct-only-normalized join (ref S3 line 422-424)
    BioSample(TrText.normalizePunctOnlyS(tokens.mkString(" ")), tokens, tags, id, "A2E")
  }

  // ------------------------------ F2J generator -----------------------------

  private def daireSeg(seed: Long, id: Long): Seq[(String, String)] = {
    val no = (1 + ((rng(seed, id, 110) >>> 1) % 120)).toString
    ((rng(seed, id, 111) >>> 1) % 5) match { // DAIRE_NO_TEMPLATES, groupF2J_config.py:13
      case 0 => seg("DAIRE_NO", "daire", no)
      case 1 => seg("DAIRE_NO", "daire", ":", no)
      case 2 => seg("DAIRE_NO", "d", ":", no)
      case 3 => seg("DAIRE_NO", "no", ":", no)
      case _ => seg("DAIRE_NO", "no", no)
    }
  }

  private def trUpper(s: String): String =
    s.toUpperCase(java.util.Locale.forLanguageTag("tr"))

  /** Admin block MAHALLE [/] ILCE [/] IL (ref _segment_admin_ndp :261-276). */
  private def adminNdp(ent: Pages.Entity, slash: Boolean, upper: Boolean): Seq[(String, String)] = {
    def t(s: String) = if (upper) trUpper(s) else s
    val sl = if (slash) seg("O", "/") else Nil
    seg("MAHALLE", ent.rawNbhd.split(" ").map(t): _*) ++ sl ++
      seg("ILCE", ent.rawDistrict.split(" ").map(t): _*) ++ sl ++
      seg("IL", ent.rawProvince.split(" ").map(t): _*)
  }

  /** Admin block ILCE , IL (ref _segment_admin_pd :247-252). */
  private def adminPd(ent: Pages.Entity): Seq[(String, String)] =
    seg("ILCE", ent.rawDistrict.split(" "): _*) ++ seg("O", ",") ++
      seg("IL", ent.rawProvince.split(" "): _*)

  /** F2J sample: TARIF branch (p=.5) or site/bina/bulvar body + admin
    * diversity (probabilities from groupF2J_config.py defaults). */
  def sampleF2J(seed: Long, id: Long): BioSample = {
    import Pages._
    val ent = entityOf(seed, id)
    var flat = Seq.empty[(String, String)]

    if (chance(seed, id, 70, 50)) {
      // ---------------- TARIF branch (ref :329-380) ----------------
      val (_, names, temps) = TarifCats(pick(TarifWeighted, seed, id, 71))
      val name = pick(names, seed, id, 72)
      val phrase = pick(temps, seed, id, 73).replace("{name}", name)
      flat = seg("TARIF", phrase.split(" ").toIndexedSeq: _*)
      if (chance(seed, id, 74, 80)) { // p_tarif_has_pd
        val admin =
          if (chance(seed, id, 75, 90)) // p_tarif_ndp_given_pd
            adminNdp(ent, slash = chance(seed, id, 76, 70), upper = false)
          else adminPd(ent)
        if (chance(seed, id, 77, 50)) flat = admin ++ seg("O", ",") ++ flat
        else flat = flat ++ seg("O", ",") ++ admin
        if (chance(seed, id, 78, 55)) { // p_tarif_admin_duplicate
          if (chance(seed, id, 79, 50)) flat = admin ++ seg("O", ",") ++ flat
          else flat = flat ++ seg("O", ",") ++ admin
        }
      }
      if (chance(seed, id, 101, 2)) flat = flat ++ flat // p_tarif_duplicate_whole
    } else {
      // ---------------- non-TARIF body (ref :381-414) ----------------
      if (chance(seed, id, 80, 75)) { // p_has_site
        val nm = pick(SiteNames, seed, id, 81)
        val kw = pick(SiteKw, seed, id, 82)
        flat ++= seg("SITE_ADI", (nm.split(" ") :+ kw): _*)
        if (chance(seed, id, 83, 85)) { // p_bina_blok_given_site
          val lbl = pick(BlokLabels, seed, id, 84)
          flat ++= (((rng(seed, id, 85) >>> 1) % 3) match { // BLOK_TEMPLATES
            case 0 => seg("BINA_ADI", lbl, "blok")
            case 1 => seg("BINA_ADI", lbl, "bloğu")
            case _ => seg("BINA_ADI", "blok", ":", lbl)
          })
          if (chance(seed, id, 86, 90)) flat ++= daireSeg(seed, id)
        }
      } else {
        if (chance(seed, id, 87, 15)) { // p_has_bulvar_given_no_site
          val nm = pick(BulvarNames, seed, id, 88)
          flat ++= seg("BULVAR", (nm.split(" ") :+ pick(BulvarKw, seed, id, 89)): _*)
        }
        if (chance(seed, id, 90, 95)) { // p_bina_apartman_given_no_site
          flat ++= seg("BINA_ADI",
            pick(ApartmanNames, seed, id, 91), pick(ApartmanKw, seed, id, 92))
          if (chance(seed, id, 93, 90)) flat ++= daireSeg(seed, id)
        }
      }
      // admin diversity: NDP .75 / PD .20 / only-one .05 (ref :400-414)
      val r = (rng(seed, id, 94) >>> 1) % 100
      val admin =
        if (r < 75) {
          val upper = chance(seed, id, 96, 50)
          adminNdp(ent, slash = !upper && chance(seed, id, 95, 50), upper = upper)
        } else if (r < 95) {
          val pd = adminPd(ent)
          if (chance(seed, id, 102, 70)) pd ++ seg("O", ",") ++ pd else pd // p_admin_pd_duplicate
        } else if (chance(seed, id, 97, 50)) seg("ILCE", ent.rawDistrict.split(" "): _*)
        else seg("IL", ent.rawProvince.split(" "): _*)
      flat = if (flat.nonEmpty) flat ++ seg("O", ",") ++ admin else admin
    }

    // F2J noise rate .20, ≥4 separators from ("-","/") (groupF2J_config.py:66-72)
    if (chance(seed, id, 98, 20))
      flat = injectNoise(flat, seed, id, minSeps = 4, seps = IndexedSeq("-", "/"))

    val raw = TrText.normalizePunctOnlyS(flat.map(_._1).mkString(" "))
    // strip , and . tokens from the tagged sequence (ref _normalize_and_strip_commas)
    val kept = flat.filter(p => p._1 != "," && p._1 != ".")
    BioSample(raw, kept.map(_._1).toArray, kept.map(_._2).toArray, id, "F2J")
  }

  /** Mixed corpus at the reference's training blend: 12% F2J, 88% A2E. */
  def synthesize(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[BioSample] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { id =>
      if (id % 25 < 3) sampleF2J(seed, id) else sampleOf(seed, id)
    })
  }

  /** S7 `to_conll` sink: `raw, id, group` header + `token\ttag` lines + blank
    * line per sample (ref group_A2E_BIO_synth.py:430-439). */
  def writeConll(ds: Dataset[BioSample], outDir: String): Unit = {
    val block = concat(
      col("raw"), lit(", "), col("sample_id"), lit(", "), col("group"), lit("\n"),
      array_join(zip_with(col("tokens"), col("tags"),
        (t, g) => concat(t, lit("\t"), g)), "\n"),
      lit("\n"))
    ds.toDF().select(block.as("value")).write.mode("overwrite").text(outDir)
  }

  /** V1 `read_conll_blocks`: CoNLL text → samples. Reads whole files (one row
    * per file) so blocks never straddle split boundaries, then fans blocks
    * out in parallel. */
  def readConll(spark: SparkSession, dir: String): Dataset[BioSample] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(dir).as[String]
      .flatMap { content =>
        content.split("\n\\s*\n").iterator.filter(_.trim.nonEmpty).map { blk =>
          val lines = blk.split("\n").filter(_.nonEmpty)
          val header = lines.head.split(", ")
          val pairs = lines.tail.map { l =>
            val Array(t, g) = l.split("\t", 2); (t, g)
          }
          BioSample(header(0),
            pairs.map(_._1), pairs.map(_._2),
            header.lift(1).flatMap(_.toLongOption).getOrElse(-1L),
            header.lift(2).getOrElse(""))
        }
      }
  }

  // ------------------------------ S8 stats ----------------------------------

  /** S8 distribution sanity stats — the reference's full battery
    * (generate_A2E_BIO_synth.py:67-274: cadde/sokak mix, bina/daire mix and
    * order, floor presence, bare-vs-keyword neighbourhood (+uppercase), admin
    * slash usage, district↔province order, duplicated admin, postcode
    * placement, noise tail) as ONE aggregation pass over the token/tag
    * arrays, plus per-type presence counts for all 13 entity types. */
  def stats(ds: Dataset[BioSample]): DataFrame = {
    val df = ds.toDF()

    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    def has(t: String): Column = array_contains(col("tags"), "B-" + t)
    // first B- position, or a sentinel beyond any array when absent
    def pos(t: String): Column = {
      val p = array_position(col("tags"), "B-" + t)
      when(p === 0, lit(Long.MaxValue)).otherwise(p)
    }
    val z = arrays_zip(col("tokens"), col("tags"))
    val nbhdKws = array(Seq("mah.", "mh.", "mahallesi", "mah", "mh").map(lit): _*)
    val nbhdWithKw = exists(z, p =>
      p.getField("tags").endsWith("MAHALLE") &&
        array_contains(nbhdKws, lower(p.getField("tokens"))))
    val adminSlash = exists(z, p =>
      p.getField("tags") === "O" && p.getField("tokens") === "/")
    val nbhdBare = has("MAHALLE") && !nbhdWithKw
    val nbhdBareUpper = nbhdBare && exists(z, p =>
      p.getField("tags") === "B-MAHALLE" &&
        p.getField("tokens") === upper(p.getField("tokens")) &&
        p.getField("tokens") =!= lower(p.getField("tokens")))
    val dupAdmin = size(filter(col("tags"), y => y === "B-IL")) +
      size(filter(col("tags"), y => y === "B-ILCE")) >= 4
    // match the country surface forms directly: lower("TÜRKİYE") in Spark is
    // "türki̇ye" (combining dot from İ) and would miss the uppercase variant
    val lastTok = element_at(col("tokens"), -1)
    val noiseTail = element_at(col("tags"), -1) === "O" &&
      lastTok.isin(CountryTokens: _*)
    val adminPos = least(pos("IL"), pos("ILCE"))
    // segment-shuffle detection, the reference's observational rule
    // (generate_A2E_BIO_synth.py:187-204): CADDE/SOKAK before MAHALLE, or
    // SOKAK before CADDE when both exist
    val shuffled =
      (has("CADDE") && has("MAHALLE") && pos("CADDE") < pos("MAHALLE")) ||
      (has("SOKAK") && has("MAHALLE") && pos("SOKAK") < pos("MAHALLE")) ||
      (has("CADDE") && has("SOKAK") && pos("SOKAK") < pos("CADDE"))
    val nbhdRepeated = size(filter(col("tags"), y => y === "B-MAHALLE")) >= 2

    val typeCounts = EntityTypes.map(t => cnt(has(t)).as("n_" + t.toLowerCase))
    df.select(Seq(
      count(lit(1)).as("n"),
      cnt(col("group") === "A2E").as("n_a2e"),
      cnt(col("group") === "F2J").as("n_f2j")) ++ typeCounts ++ Seq(
      cnt(has("CADDE") && has("SOKAK")).as("cad_and_sk"),
      cnt(has("CADDE") && !has("SOKAK")).as("cad_only"),
      cnt(has("SOKAK") && !has("CADDE")).as("sk_only"),
      cnt(has("BINA_NO") && has("DAIRE_NO")).as("bina_and_daire"),
      cnt(has("BINA_NO") && has("DAIRE_NO") &&
        pos("DAIRE_NO") < pos("BINA_NO")).as("flat_before_building"),
      cnt(has("KAT")).as("has_floor"),
      cnt(nbhdBare).as("nbhd_bare"),
      cnt(nbhdBareUpper).as("nbhd_bare_upper"),
      cnt(has("MAHALLE") && nbhdWithKw).as("nbhd_with_kw"),
      cnt(adminSlash).as("admin_slash"),
      cnt(has("IL") && has("ILCE") && pos("ILCE") < pos("IL")).as("district_first"),
      cnt(has("IL") && has("ILCE") && pos("IL") < pos("ILCE")).as("province_first"),
      cnt(dupAdmin).as("dup_admin"),
      cnt(shuffled).as("segments_shuffled"),
      cnt(nbhdRepeated).as("nbhd_repeated"),
      cnt(has("POSTA_KODU")).as("has_postcode"),
      cnt(has("POSTA_KODU") && (has("IL") || has("ILCE")) &&
        pos("POSTA_KODU") < adminPos).as("postcode_before_admin"),
      cnt(has("POSTA_KODU") && (has("IL") || has("ILCE")) &&
        pos("POSTA_KODU") > adminPos).as("postcode_after_admin"),
      cnt(noiseTail).as("noise_tail"),
      round(avg(size(col("tokens"))), 4).as("avg_tokens")): _*)
  }

  /** S8 top-10 avenue tally (ref generate_A2E_BIO_synth.py:270-274): the
    * token at the first B-CADDE position, counted, descending. */
  def topAvenues(ds: Dataset[BioSample], k: Int = 10): DataFrame = {
    ds.toDF()
      .select(col("tokens"),
        array_position(col("tags"), "B-CADDE").cast("int").as("p"))
      .filter(col("p") > 0) // array_position is 1-based; 0 = absent
      .select(element_at(col("tokens"), col("p")).as("avenue"))
      .groupBy("avenue").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("avenue")).limit(k)
  }
}
