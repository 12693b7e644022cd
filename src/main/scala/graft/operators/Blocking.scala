package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocking-key derivation + skew-salted candidate-pair self-join.
  *
  * North-rule operator (BASELINE.json north_star): block on composite keys
  * (postcode prefix + phonetic street token via Soundex), with salted keys for
  * skewed blocks. Absent in the reference — designed from the meta-blocking /
  * set-similarity-join literature (see PAPERS.md: SparkER EDBT'19) — but its
  * hand-built analogue is the reference's first-token inverted index
  * (static_parser.py:149-162), which is exactly a blocking structure.
  *
  * Scale design: a plain self-join on `block_key` dies at web scale the moment
  * one block is pathological (a common postcode+street ⇒ quadratic pairs in
  * ONE task; AQE can split skewed join partitions but not the quadratic
  * growth inside a single key). The salted triangle join below splits each
  * oversized block of size c into s = ceil(c/maxBlock) buckets and fans its
  * pair space over the s·(s+1)/2 (i,j) bucket-pair tasks, so the largest task
  * is O(maxBlock²) regardless of skew. Normal-sized blocks keep s = 1 and pay
  * nothing extra.
  */
object Blocking {

  /** Canonical scoring/blocking text: full canon pipeline + ASCII fold, so
    * every keyword-variant surface form collapses to the same tokens. Uses
    * the compact [[graft.functions.TrNormalize]] expression — the composed
    * builtin chain overflows the 64 KB method limit inside fused stages and
    * silently de-optimizes the whole stage to interpreted eval. */
  def blockNorm(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    translate(graft.functions.TrNormalize.full(c), "ıöüğşç", "iougsc")

  /** 5-digit postcode token (not part of a longer digit run). */
  def postcode(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract(c, "(?<!\\d)(\\d{5})(?!\\d)", 1)

  /** Street-name token: the token immediately before the canonical `sk`/`cad`
    * indicator in the canon-normalized text (empty when absent). */
  def streetToken(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val toks = split(c, " ")
    val posSk = array_position(toks, "sk")
    val posCad = array_position(toks, "cad")
    val pos = when(posSk > 0 && (posCad === 0 || posSk < posCad), posSk)
      .when(posCad > 0, posCad).otherwise(lit(0))
    when(pos > 1, element_at(toks, (pos - 1).cast("int"))).otherwise(lit(""))
  }

  /** Neighbourhood-name token: the token immediately before canonical `mah`. */
  def nbhdToken(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val toks = split(c, " ")
    val pos = array_position(toks, "mah")
    when(pos > 1, element_at(toks, (pos - 1).cast("int"))).otherwise(lit(""))
  }

  /** Composite block key: postcode prefix (3 digits) + a phonetic key of the
    * street token, falling back to the neighbourhood token when no street
    * exists. `phonetic` selects the key family the north star names:
    * "soundex" (Spark built-in) or "metaphone" (the native codegen'd
    * [[graft.functions.MetaphoneExpr]]); both are codegen'd column chains. */
  def blockKey(normCol: org.apache.spark.sql.Column,
               phonetic: String = "soundex"): org.apache.spark.sql.Column = {
    def phonOf(c: org.apache.spark.sql.Column) = phonetic match {
      case "metaphone" => graft.functions.MetaphoneUtil.metaphoneCol(c)
      case _           => soundex(c)
    }
    val phon = when(streetToken(normCol) =!= "", phonOf(streetToken(normCol)))
      .otherwise(phonOf(nbhdToken(normCol)))
    concat_ws("_", substring(postcode(normCol), 1, 3), phon)
  }

  /** Generic skew-salted self-join: every candidate-pair generator in the
    * engine (blocking keys, MinHash/SimHash/hyperplane band buckets, PPJoin
    * prefix shingles) routes through this ONE fan-out so the bounded-task
    * property is proved once and inherited everywhere. A plain self-join on
    * the key concentrates a hot key's entire quadratic pair fan-out in ONE
    * task (a boilerplate duplicate family in a crawl, a high-frequency
    * shingle); AQE can split skewed input partitions but not the quadratic
    * growth inside a single key (round-4 verdict item 1).
    *
    * Each key group of size c is split into s = ceil(c/maxBlock) salt buckets
    * and its pair space fans over the s·(s+1)/2 (i,j) bucket-pair tasks, so
    * the largest task is O(maxBlock²) regardless of skew; normal-sized groups
    * keep s = 1 and pay nothing extra.
    *
    * Output orientation is NORMALIZED: `<id>_a < <id>_b` always (payloads
    * swap with their ids), so the result is deterministic and independent of
    * which triangle side a row landed on.
    *
    * @param df          one row per (key, record) — a record may appear under
    *                    several keys (LSH bands); the same unordered pair then
    *                    appears once PER shared key, exactly like the plain
    *                    self-join (callers dedup/aggregate downstream)
    * @param keyCols     join-key column names (rows with a null key never
    *                    match in a plain inner self-join and are dropped here)
    * @param idCol       unique record id column (orders pairs; any orderable type)
    * @param payloadCols extra columns carried to both sides (suffixed _a/_b)
    * @param maxBlock    target max records per salt bucket
    * @return one row per (key, unordered pair): keyCols, <id>_a, <id>_b, payloads
    */
  def saltedSelfJoin(df: DataFrame, keyCols: Seq[String], idCol: String,
                     payloadCols: Seq[String], maxBlock: Int = 1000): DataFrame = {
    val rows = df.filter(keyCols.map(col(_).isNotNull).reduce(_ && _))

    // Per-key salt-bucket count s = ceil(count / maxBlock), as a WINDOW over
    // the key: one exchange of the rows (plus a local sort for WindowExec)
    // instead of the round-2 groupBy + join-back, which shuffled the rows
    // relation twice on the same key — measured as the bulk of the 8→32 plan
    // overhead.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keyCols.map(col): _*)
    val salted = rows
      .withColumn("__s",
        ceil(count(lit(1)).over(w).cast("double") / maxBlock).cast("int"))
      .withColumn("__salt", pmod(xxhash64(col(idCol)), col("__s")).cast("int"))

    // Triangle fan-out: left emits (i=salt, j) for j in [salt, s); right emits
    // (i, j=salt) for i in [0, salt]. Each unordered pair meets in exactly one
    // (key, i, j) task; equal-salt duplicates are removed by the id order test.
    val left = salted
      .withColumn("__i", col("__salt"))
      .withColumn("__j", explode(sequence(col("__salt"), col("__s") - 1)))
      .drop("__s", "__salt")
    val right = salted
      .withColumn("__j", col("__salt"))
      .withColumn("__i", explode(sequence(lit(0), col("__salt"))))
      .drop("__s", "__salt")

    // AQE coalescing is BLIND to join-output amplification: the map-side
    // bytes of these inputs are tiny relative to the quadratic pair fan-out
    // inside each (key,i,j) task, so AQE would happily coalesce the exchange
    // to one partition and run the whole pair space single-threaded
    // (observed: 207 s on 1 task vs 15 s on 32). Explicit repartition on the
    // join keys pins the partition count — user repartitions are never
    // coalesced — and the join reuses it with no extra exchange.
    val numParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val joinKeys = keyCols ++ Seq("__i", "__j")
    val lRen = left.select(joinKeys.map(col) ++ Seq(col(idCol).as("__id_l")) ++
      payloadCols.map(p => col(p).as(s"__${p}_l")): _*)
      .repartition(numParts, joinKeys.map(col): _*)
    val rRen = right.select(joinKeys.map(col) ++ Seq(col(idCol).as("__id_r")) ++
      payloadCols.map(p => col(p).as(s"__${p}_r")): _*)
      .repartition(numParts, joinKeys.map(col): _*)

    val joined = lRen.join(rRen, joinKeys)
      .filter(col("__i") =!= col("__j") || col("__id_l") < col("__id_r"))

    // orientation normalization: which triangle side a record fans to is a
    // function of its salt, so without this the a/b order of cross-bucket
    // pairs would depend on maxBlock — `fwd` re-orders each pair (and its
    // payloads) by id so salted ≡ unsalted holds ROW-identically.
    val fwd = col("__id_l") < col("__id_r")
    def pick(lc: String, rc: String) = when(fwd, col(lc)).otherwise(col(rc))
    joined.select(keyCols.map(col) ++ Seq(
      pick("__id_l", "__id_r").as(s"${idCol}_a"),
      pick("__id_r", "__id_l").as(s"${idCol}_b")) ++
      payloadCols.flatMap(p => Seq(
        pick(s"__${p}_l", s"__${p}_r").as(s"${p}_a"),
        pick(s"__${p}_r", s"__${p}_l").as(s"${p}_b"))): _*)
  }

  /** Skew-salted candidate-pair self-join on a single blocking key — the
    * linkage-pipeline entry point over [[saltedSelfJoin]]. Drops empty-string
    * keys (records with no postcode/street evidence would otherwise form one
    * junk mega-block).
    *
    * @param df          input with one row per record
    * @param keyCol      blocking-key column name
    * @param idCol       unique record id column name (orders pairs)
    * @param payloadCols extra columns carried to both sides (suffixed _a/_b)
    * @param maxBlock    target max records per salt bucket
    * @return one row per unordered candidate pair: (block_key, <id>_a, <id>_b, payloads)
    */
  def candidatePairs(df: DataFrame, keyCol: String, idCol: String,
                     payloadCols: Seq[String], maxBlock: Int = 1000): DataFrame = {
    val cols = Seq(col(keyCol).as("bk"), col(idCol).as(idCol)) ++ payloadCols.map(col)
    val rows = df.select(cols: _*).filter(col("bk") =!= "")
    saltedSelfJoin(rows, Seq("bk"), idCol, payloadCols, maxBlock)
      .withColumnRenamed("bk", "block_key")
  }
}
