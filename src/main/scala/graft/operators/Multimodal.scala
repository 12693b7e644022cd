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
  * ALL THREE kinds are REAL files now: synthesis writes spec-valid PNG/BMP
  * bytes ([[graft.functions.ImageCodec]] — zlib IDAT, CRC32 chunks, padded
  * BMP rows), 16-bit PCM WAV ([[graft.functions.WavCodec]]), and — since
  * round 3 — multi-frame animated GIF89a video ([[graft.functions.GifCodec]]:
  * LZW-compressed frames, graphics-control blocks, NETSCAPE2.0 loop
  * extension, round-trip-verified by an independent in-repo LZW decoder).
  * Extraction parses the genuine structures (PNG/BMP/GIF/JPEG dims, RIFF
  * fmt/data, GIF frame walk); [[sampleFrames]] reads REAL frame boundaries
  * from the block structure. The Spark-side shape (schema, partitioning,
  * batched kernel) is identical for all paths.
  */
object Multimodal {

  val Kinds = IndexedSeq("image", "audio", "video")

  /** Deterministic asset: images are real PNG/BMP files, audio is real PCM
    * WAV, video is a real animated GIF89a. */
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
      // real animated GIF89a: 2-12 frames of a deterministic drifting pattern
      val w = 8 + ((Pages.rng(seed, id, 41) >>> 1) % 24).toInt
      val h = 8 + ((Pages.rng(seed, id, 42) >>> 1) % 24).toInt
      val nFrames = 2 + ((Pages.rng(seed, id, 44) >>> 1) % 11).toInt
      val base = (Pages.rng(seed, id, 45) >>> 1).toInt
      val bytes = graft.functions.GifCodec.encodeGif(w, h, nFrames, delayCs = 10,
        (f, x, y) => (base + f * 3 + x + y * 2) & 0x0f)
      MediaAsset(id, kind, bytes, w, h, 0)
    }
  }

  /** Media table synthesis (seeded range kernel, like [[Pages]]). */
  def synthesize(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaAsset] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map(id => assetOf(seed, id)))
  }

  /** Decode: REAL structure parse for every kind — PNG/BMP/JPEG dims, GIF
    * frame walk (animated GIF = the video container), RIFF fmt/data.
    * Returns (w, h, rate, frames, feature8). */
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
      case Some(("gif", w, h)) =>
        // animated GIF: frame count from the real block walk
        val frames = graft.functions.GifCodec.decodeMeta(media).map(_._3).getOrElse(1)
        (w, h, 0, frames, byteFeatures(0))
      case Some((_, w, h)) => (w, h, 0, 1, byteFeatures(0))
      case None =>
        graft.functions.WavCodec.decodeHeader(media) match {
          case Some((rate, _, _, _)) => (0, 0, rate, 1, byteFeatures(44))
          case None => (0, 0, 0, 0, byteFeatures(0)) // unknown container
        }
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

  /** Frame-sample operator for `video` assets: every k-th REAL frame (byte
    * offsets from the GIF block walk) becomes one row — (media_id, frame,
    * byte_offset, width, height), Generator-style fan-out via flatMap. */
  def sampleFrames(assets: Dataset[MediaAsset], everyK: Int = 2): DataFrame = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      val offs = graft.functions.GifCodec.frameOffsets(a.media)
      (0 until offs.length by everyK).map(f =>
        (a.media_id, f, offs(f), a.width, a.height))
    }.toDF("media_id", "frame", "byte_offset", "width", "height")
  }
}
