package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Pages

/** One media asset: opaque bytes + typed metadata (multimodal columns are
  * binary + metadata; decode stays at the edges). */
case class MediaAsset(media_id: Long, kind: String, media: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

/** Decoded/extracted features for one asset. */
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                         width: Int, height: Int, frames: Int,
                         feature: Array[Float])

/** Multimodal-column plumbing for a training-data pipeline: image/audio/video
  * as opaque `binary` columns with typed metadata, and a batched
  * decode/feature-extract kernel.
  *
  * The Spark-side shape is the real thing — schema, partitioning, batched
  * mapPartitions kernel (the Scala twin of a `mapInPandas` batch UDF) — while
  * the codec itself is a STUB: this container has no image/audio libraries,
  * so `decodeStub` parses a deterministic 16-byte fake header and synthesizes
  * features from the payload bytes. Swapping in a real decoder changes ONE
  * function; nothing in the plan shape moves.
  */
object Multimodal {

  val Kinds = IndexedSeq("image", "audio", "video")

  /** Deterministic fake asset: 16-byte header (magic, kind, w, h, rate) +
    * hash-generated payload. */
  def assetOf(seed: Long, id: Long): MediaAsset = {
    val kind = Kinds(((Pages.rng(seed, id, 40) >>> 1) % Kinds.length).toInt)
    val w = 16 + ((Pages.rng(seed, id, 41) >>> 1) % 240).toInt
    val h = 16 + ((Pages.rng(seed, id, 42) >>> 1) % 240).toInt
    val rate = if (kind == "audio") 8000 + ((Pages.rng(seed, id, 43) >>> 1) % 40000).toInt else 0
    val payloadLen = 64 + ((Pages.rng(seed, id, 44) >>> 1) % 192).toInt
    val bytes = new Array[Byte](16 + payloadLen)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.putInt(0x47524654) // "GRFT"
    bb.put(Kinds.indexOf(kind).toByte)
    bb.put(0.toByte)
    bb.putShort(w.toShort)
    bb.putShort(h.toShort)
    bb.putInt(rate)
    bb.putShort(0.toShort)
    var i = 0
    while (i < payloadLen) { bytes(16 + i) = (Pages.rng(seed, id, 45 + i / 8) >>> ((i % 8) * 8)).toByte; i += 1 }
    MediaAsset(id, kind, bytes, w, h, rate)
  }

  /** Media table synthesis (seeded range kernel, like [[Pages]]). */
  def synthesize(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaAsset] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map(id => assetOf(seed, id)))
  }

  /** STUB decoder — deterministic stand-in for the real codec. Parses the
    * fake header and derives an 8-dim feature from payload byte statistics. */
  def decodeStub(media: Array[Byte]): (Int, Int, Int, Int, Array[Float]) = {
    val bb = java.nio.ByteBuffer.wrap(media)
    require(bb.getInt() == 0x47524654, "bad magic")
    val kindIdx = bb.get(); bb.get()
    val w = bb.getShort().toInt
    val h = bb.getShort().toInt
    val rate = bb.getInt(); bb.getShort()
    val frames = if (kindIdx == 2) 1 + (media.length - 16) / 32 else 1
    val feat = new Array[Float](8)
    var i = 16
    while (i < media.length) { feat((i - 16) % 8) += (media(i) & 0xff) / 255.0f; i += 1 }
    val n = (media.length - 16).max(1)
    var j = 0
    while (j < 8) { feat(j) = feat(j) * 8.0f / n; j += 1 }
    (w, h, rate, frames, feat)
  }

  /** Batched decode/feature-extract operator: one mapPartitions pass, with an
    * explicit micro-batch loop inside the partition (the reference's
    * chunk-5000/batch-32 shape, ner_address_parser.py:161-195) so a real
    * vectorized codec can amortize per-call cost. */
  def extractFeatures(assets: Dataset[MediaAsset], batchSize: Int = 32): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { a =>
          val (w, h, _, frames, feat) = decodeStub(a.media)
          MediaFeatures(a.media_id, a.kind, a.media.length, w, h, frames, feat)
        }
      }
    }
  }

  /** Frame-sample operator for `video` assets: every k-th 32-byte payload
    * window becomes one frame row (Generator-style fan-out via flatMap). */
  def sampleFrames(assets: Dataset[MediaAsset], everyK: Int = 2): DataFrame = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      val nFrames = 1 + (a.media.length - 16) / 32
      (0 until nFrames by everyK).map(f => (a.media_id, f, a.width, a.height))
    }.toDF("media_id", "frame", "width", "height")
  }
}
