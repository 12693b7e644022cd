package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ImageCodec
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
  * IMAGE and AUDIO assets are REAL files: synthesis writes spec-valid
  * PNG/BMP bytes ([[graft.functions.ImageCodec]] — zlib IDAT, CRC32 chunks,
  * padded BMP rows) and 16-bit PCM WAV ([[graft.functions.WavCodec]]);
  * extraction parses the genuine headers (PNG/BMP/GIF/JPEG dims, RIFF
  * fmt/data — validated against a real-world PNG in tests). Only the VIDEO
  * codec remains a declared stub (deterministic 16-byte GRFT header) — the
  * container ships no video libraries — and the Spark-side shape (schema,
  * partitioning, batched kernel) is identical for all paths, so swapping a
  * real video codec changes one function.
  */
object Multimodal {

  val Kinds = IndexedSeq("image", "audio", "video")

  /** Deterministic asset: images are real PNG/BMP files, audio is real PCM
    * WAV; video carries the GRFT stub header + hash payload. */
  def assetOf(seed: Long, id: Long): MediaAsset = {
    val kind = Kinds(((Pages.rng(seed, id, 40) >>> 1) % Kinds.length).toInt)
    if (kind == "image") {
      val w = 8 + ((Pages.rng(seed, id, 41) >>> 1) % 32).toInt
      val h = 8 + ((Pages.rng(seed, id, 42) >>> 1) % 32).toInt
      val base = (Pages.rng(seed, id, 46) >>> 1).toInt
      def pixel(x: Int, y: Int): Int = {
        val v = (base + x * 13 + y * 7) & 0xff
        (v << 16) | (((v + 85) & 0xff) << 8) | ((v + 170) & 0xff)
      }
      val bytes =
        if ((Pages.rng(seed, id, 47) & 1) == 0) ImageCodec.encodePng(w, h, pixel)
        else ImageCodec.encodeBmp(w, h, pixel)
      MediaAsset(id, kind, bytes, w, h, 0)
    } else if (kind == "audio") {
      // real 16-bit mono PCM WAV (deterministic hash waveform)
      val rate = 8000 + ((Pages.rng(seed, id, 43) >>> 1) % 40000).toInt
      val n = 64 + ((Pages.rng(seed, id, 44) >>> 1) % 192).toInt
      val samples = Array.tabulate(n)(i =>
        ((Pages.rng(seed, id, 48 + i / 4) >>> ((i % 4) * 16)) & 0xffff).toShort)
      MediaAsset(id, kind, graft.functions.WavCodec.encodeWav(rate, samples), 0, 0, rate)
    } else {
      val w = 16 + ((Pages.rng(seed, id, 41) >>> 1) % 240).toInt
      val h = 16 + ((Pages.rng(seed, id, 42) >>> 1) % 240).toInt
      val rate = 0
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
  }

  /** Media table synthesis (seeded range kernel, like [[Pages]]). */
  def synthesize(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaAsset] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map(id => assetOf(seed, id)))
  }

  /** Decode: REAL header parse for image bytes (PNG/BMP/GIF/JPEG); stub GRFT
    * header for audio/video. Returns (w, h, rate, frames, feature8). */
  def decode(media: Array[Byte]): (Int, Int, Int, Int, Array[Float]) = {
    def byteFeatures(from: Int): Array[Float] = {
      val feat = new Array[Float](8)
      var i = from
      while (i < media.length) { feat((i - from) % 8) += (media(i) & 0xff) / 255.0f; i += 1 }
      val n = (media.length - from).max(1)
      var j = 0
      while (j < 8) { feat(j) = feat(j) * 8.0f / n; j += 1 }
      feat
    }
    ImageCodec.decodeDims(media) match {
      case Some((_, w, h)) => (w, h, 0, 1, byteFeatures(0))
      case None if graft.functions.WavCodec.decodeHeader(media).isDefined =>
        val (rate, _, _, _) = graft.functions.WavCodec.decodeHeader(media).get
        (0, 0, rate, 1, byteFeatures(44))
      case None =>
        val bb = java.nio.ByteBuffer.wrap(media)
        require(bb.getInt() == 0x47524654, "bad magic")
        val kindIdx = bb.get(); bb.get()
        val w = bb.getShort().toInt
        val h = bb.getShort().toInt
        val rate = bb.getInt(); bb.getShort()
        val frames = if (kindIdx == 2) 1 + (media.length - 16) / 32 else 1
        (w, h, rate, frames, byteFeatures(16))
    }
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
          val (w, h, _, frames, feat) = decode(a.media)
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
