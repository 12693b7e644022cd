package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One Common-Crawl-style page, schema per BASELINE.json `input_hint`:
  * `(url string, warc_ts timestamp, html binary, text string, lang string)`. */
case class Page(url: String, warc_ts: Timestamp, html: Array[Byte], text: String, lang: String)

/** Deterministic synthesis of the engine's input pages table, in the style of
  * the reference's seeded BIO generators (data/synth/group_A2E_BIO_synth.py:313-424:
  * seeded RNG + probability-configured segment composition). No wall clock, no
  * `Math.random` — every choice is a pure function of (seed, id) via a
  * splitmix64 mix, so any row can be regenerated independently on any
  * executor: `spark.range(n)` → per-row kernel, embarrassingly parallel,
  * shuffle-free, and identical at any partitioning or cluster size.
  *
  * Each entity (a postal address) gets `variantsPerEntity` pages whose texts
  * embed different surface realizations of the same address — these are the
  * gold same-entity labels for the pairwise-F1 gate. Entities sharing a
  * postcode prefix and street name give hard negatives inside blocks.
  */
object Pages {

  val VariantsPerEntity = 3

  /** splitmix64 — public-domain mixing constants (Steele et al.). */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d9eaa1b6b5d4e9L
    z ^ (z >>> 31)
  }
  def rng(seed: Long, id: Long, tag: Long): Long = mix(mix(seed ^ mix(tag)) ^ id)
  def pick[T](xs: IndexedSeq[T], seed: Long, id: Long, tag: Long): T =
    xs(((rng(seed, id, tag) >>> 1) % xs.length).toInt)

  /** Street-name pool: subset of the reference's public avenue-name pool
    * (data/synth/config/general_config.py COMMON_AVENUE_NAMES) + numeric
    * street names in the reference's style (group_A2E_BIO_synth.py:199-209). */
  val StreetNames: IndexedSeq[String] = IndexedSeq(
    "Mithatpaşa", "Gazi", "Fevzi Paşa", "Cumhuriyet", "Girne", "Homeros",
    "Mimar Sinan", "Atatürk", "Fatih", "İstasyon", "Hükümet", "İnönü",
    "İstiklal", "Hürriyet", "Zafer", "Kurtuluş", "Mevlana", "Plevne",
    "Bağdat", "Barbaros", "Cinnah", "Lozan", "Selanik", "Lise",
    "1445", "2040", "853", "67", "1203", "504")

  val NbhdKw: IndexedSeq[String] = IndexedSeq("Mahallesi", "Mah.", "mah", "MAHALLESİ", "mh.")
  val StreetKw: IndexedSeq[String] = IndexedSeq("Sokak", "Sk.", "sok.", "SOKAK")
  val AvenueKw: IndexedSeq[String] = IndexedSeq("Caddesi", "Cad.", "cd.", "CADDESİ")
  val BinaKw: IndexedSeq[String] = IndexedSeq("No:", "No ", "no:", "Bina No:")

  val FillerWords: IndexedSeq[String] = IndexedSeq(
    "iletişim", "sayfa", "hakkında", "ürünler", "mağaza", "şube", "bilgi",
    "detay", "harita", "yol", "tarifi", "müşteri", "hizmetleri", "kampanya",
    "web", "sitesi", "online", "satış", "destek", "merkez")

  /** The canonical (entity-level) address parts for entity `e`. */
  case class Entity(gaz: GazRow, rawNbhd: String, rawDistrict: String, rawProvince: String,
                    street: String, isAvenue: Boolean, bina: Int)

  /** The street-name space grows with the entity count (a larger crawl covers
    * more places): a FIXED pool would make block density — and thus candidate
    * pairs — grow quadratically with input size, which is a property of the
    * synthetic world, not of a real corpus. ~100 entities per street keeps
    * mean block size constant at any scale. Deterministic in n, so two runs
    * over the same input (e.g. the two scaling levels) see the same world. */
  def streetPoolSize(nEntities: Long): Int =
    math.max(StreetNames.size, (nEntities / 100L).toInt)

  /** Street `idx` from the virtual pool: named streets first, then numeric
    * street names in the reference's style (`1445 sokak`). */
  def streetOf(idx: Int): String =
    if (idx < StreetNames.size) StreetNames(idx) else s"${1000 + idx}"

  def entityOf(seed: Long, e: Long): Entity = entityOf(seed, e, StreetNames.size)

  def entityOf(seed: Long, e: Long, poolSize: Int): Entity = {
    // Entities must be pairwise-distinct addresses (two gold-different
    // entities with identical text would be an unresolvable label error, not
    // a matcher test). A bijective multiplicative permutation of the entity
    // id over the (gazetteer × street × bina × type) space guarantees zero
    // collisions up to `cap` entities while still looking well-mixed.
    val nGaz = Gazetteer.rows.size
    val nStreet = poolSize
    val nBina = 199
    val cap = nGaz.toLong * nStreet * nBina * 2
    val x = ((e + (seed & 0xffff)) * 1000003L) % cap // 1000003 prime, coprime to cap
    val gi = (x % nGaz).toInt
    val x2 = x / nGaz
    val street = streetOf((x2 % nStreet).toInt)
    val x3 = x2 / nStreet
    val bina = 1 + (x3 % nBina).toInt
    val isAvenue = (x3 / nBina) % 2 == 0
    // locate raw (province, district, nbhd) by flat index, in pool order
    var acc = 0
    var found: (String, String, String) = null
    Gazetteer.RawPools.foreach { case (p, d, ns) =>
      ns.foreach { n => if (found == null && acc == gi) found = (p, d, n); acc += 1 }
    }
    val (p, d, n) = found
    Entity(Gazetteer.rows(gi), n, d, p, street, isAvenue, bina)
  }

  /** Adjacent-char swap at a deterministic interior position — the classic
    * web-text typo; keeps first chars intact so phonetic blocking holds. */
  def typo(s: String, r: Long): String =
    if (s.length < 4) s
    else {
      val i = 1 + ((r >>> 1) % (s.length - 2)).toInt
      s.substring(0, i) + s.charAt(i + 1) + s.charAt(i) + s.substring(i + 2)
    }

  /** One surface realization of the entity's address (variant `v` of page `id`). */
  def addressVariant(seed: Long, id: Long, ent: Entity): String = {
    // 1/8 of pages carry a typo in the neighbourhood name (noise in the style
    // of the reference's noise injector, group_A2E_BIO_synth.py:263-310) —
    // this is what forces the scorer to be genuinely fuzzy.
    val nbhd = if ((rng(seed, id, 16) & 7) == 0) typo(ent.rawNbhd, rng(seed, id, 17)) else ent.rawNbhd
    val nk = pick(NbhdKw, seed, id, 10)
    val sk = if (ent.isAvenue) pick(AvenueKw, seed, id, 11) else pick(StreetKw, seed, id, 11)
    val bk = pick(BinaKw, seed, id, 12)
    val pc = ent.gaz.postcode
    val core = s"$nbhd $nk ${ent.street} $sk $bk${ent.bina}"
    val admin = (rng(seed, id, 13) & 3) match {
      case 0 => s"${ent.rawDistrict} / ${ent.rawProvince} $pc"
      case 1 => s"$pc ${ent.rawDistrict} ${ent.rawProvince}"
      case 2 => s"${ent.rawDistrict}, ${ent.rawProvince} $pc"
      case _ => s"${ent.rawProvince} ${ent.rawDistrict} $pc"
    }
    val addr = (rng(seed, id, 14) & 7) match {
      case 0 => s"$admin $core" // admin-prepend, ref group_A2E_BIO_synth.py:398-408
      case _ => s"$core $admin"
    }
    (rng(seed, id, 15) & 15) match {
      case 0 => addr.toUpperCase(java.util.Locale.forLanguageTag("tr")) // 1/16 all-uppercase (ref :409-415 p=.05)
      case _ => addr
    }
  }

  def fillerText(seed: Long, id: Long, tag: Long, n: Int): String =
    (0 until n).map(i => pick(FillerWords, seed, id, tag * 100 + i)).mkString(" ")

  def pageOf(seed: Long, id: Long): Page = pageOf(seed, id, StreetNames.size)

  def pageOf(seed: Long, id: Long, poolSize: Int): Page = {
    val e = id / VariantsPerEntity
    val ent = entityOf(seed, e, poolSize)
    val addr = addressVariant(seed, id, ent)
    val pre = fillerText(seed, id, 20, 3 + ((rng(seed, id, 21) >>> 1) % 5).toInt)
    val post = fillerText(seed, id, 22, 3 + ((rng(seed, id, 23) >>> 1) % 5).toInt)
    val text = s"$pre Adres: $addr Tel: 0${(rng(seed, id, 24) >>> 1) % 1000000000L} $post"
    val url = f"https://example.test/e$e%07d/v${id % VariantsPerEntity}"
    val ts = new Timestamp(1768435200000L + (id % 86400L) * 1000L) // 2026-01-15 + id sec, deterministic
    Page(url, ts, s"<html><body><p>$text</p></body></html>".getBytes("UTF-8"), text, "tr")
  }

  /** The pages table: `spark.range(n)` → deterministic per-row kernel. */
  def synthesize(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[Page] = {
    import spark.implicits._
    val pool = streetPoolSize(n / VariantsPerEntity)
    spark.range(n).mapPartitions(_.map(id => pageOf(seed, id, pool)))
  }

  /** Gold entity id is a pure function of the url (synthesis embeds it);
    * used ONLY by tests/benchmarks to label pairs, never by the pipeline. */
  def goldEntityId(urlCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract(urlCol, "/e(\\d+)/v", 1).cast("long")
}
