package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{CRC32, Deflater}

/** REAL image encode/parse — no external libraries, pure format plumbing.
  *
  * The container has no image codec libraries, but a PNG or BMP file is just
  * bytes: [[encodePng]] emits spec-valid PNG (zlib IDAT via `java.util.zip`,
  * CRC32 chunk checksums) and [[encodeBmp]] spec-valid 24-bit BMP, so the
  * multimodal pipeline carries GENUINE image files, not fake headers; and
  * [[decodeDims]] parses dimensions from real PNG / BMP / GIF / JPEG headers
  * (validated in tests against a known real-world PNG). Pixel-level decode of
  * compressed formats stays out of scope — that is the single seam where a
  * real raster codec would plug in.
  */
object ImageCodec {

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def chunk(out: ByteArrayOutputStream, tpe: String, data: Array[Byte]): Unit = {
    val len = ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len)
    val tb = tpe.getBytes("US-ASCII")
    out.write(tb)
    out.write(data)
    val crc = new CRC32()
    crc.update(tb); crc.update(data)
    out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
  }

  /** Spec-valid 8-bit RGB PNG. `pixel(x, y)` returns 0xRRGGBB. */
  def encodePng(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(PngSig)
    val ihdr = ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte) // bit depth 8, RGB
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    chunk(out, "IHDR", ihdr)
    // raw scanlines: filter byte 0 + w*3 RGB bytes, zlib-deflated
    val raw = new Array[Byte](h * (1 + w * 3))
    var y = 0
    while (y < h) {
      val base = y * (1 + w * 3) + 1
      var x = 0
      while (x < w) {
        val p = pixel(x, y)
        raw(base + x * 3) = ((p >> 16) & 0xff).toByte
        raw(base + x * 3 + 1) = ((p >> 8) & 0xff).toByte
        raw(base + x * 3 + 2) = (p & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val idat = new ByteArrayOutputStream()
    while (!deflater.finished()) idat.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk(out, "IDAT", idat.toByteArray)
    chunk(out, "IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** Spec-valid 24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up rows). */
  def encodeBmp(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val rowSize = (w * 3 + 3) / 4 * 4
    val imgSize = rowSize * h
    val bb = ByteBuffer.allocate(54 + imgSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + imgSize)
      .putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(imgSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1 // bottom-up
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val p = pixel(x, y)
        bb.put((p & 0xff).toByte).put(((p >> 8) & 0xff).toByte).put(((p >> 16) & 0xff).toByte)
        x += 1
      }
      var pad = w * 3
      while (pad < rowSize) { bb.put(0.toByte); pad += 1 }
      y -= 1
    }
    bb.array()
  }

  private def beInt(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def leInt(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def beShort(b: Array[Byte], i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def leShort(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Parse (format, width, height) from real image bytes:
    * PNG (IHDR), BMP (BITMAPINFOHEADER), GIF (logical screen), JPEG (first
    * SOF0/1/2 frame marker). None for anything unrecognized. */
  def decodeDims(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b.length >= 24 && PngSig.indices.forall(i => b(i) == PngSig(i)))
      Some(("png", beInt(b, 16), beInt(b, 20)))
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      Some(("bmp", leInt(b, 18), math.abs(leInt(b, 22))))
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')
      Some(("gif", leShort(b, 6), leShort(b, 8)))
    else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // walk JPEG segments to the first start-of-frame
      var i = 2
      while (i + 9 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None
        val m = b(i + 1) & 0xff
        if (m == 0xff) { i += 1 } // fill byte
        else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
          return Some(("jpeg", beShort(b, i + 7), beShort(b, i + 5)))
        else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) i += 2 // no payload
        else i += 2 + beShort(b, i + 2)
      }
      None
    } else None
  }
}

/** REAL PCM WAV encode/parse (RIFF is byte plumbing like BMP — no library
  * needed): [[encodeWav]] writes a spec-valid 16-bit mono PCM file;
  * [[decodeHeader]] walks RIFF chunks to the fmt/data pair. */
object WavCodec {

  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** (sampleRate, channels, bitsPerSample, nSamples) from a real WAV. */
  def decodeHeader(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    def ascii(i: Int, n: Int) = new String(b, i, n, "US-ASCII")
    if (b.length < 44 || ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var dataLen = -1
    while (i + 8 <= b.length && (fmt.isEmpty || dataLen < 0)) {
      val id = ascii(i, 4)
      val len = ByteBuffer.wrap(b, i + 4, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      if (id == "fmt " && i + 8 + 16 <= b.length) {
        val fb = ByteBuffer.wrap(b, i + 8, 16).order(ByteOrder.LITTLE_ENDIAN)
        fb.getShort() // audio format
        val ch = fb.getShort().toInt
        val rate = fb.getInt()
        fb.getInt(); fb.getShort()
        val bits = fb.getShort().toInt
        fmt = Some((ch, rate, bits))
      } else if (id == "data") dataLen = len
      // corrupt-chunk guard: a negative/overflowing len would stop `i`
      // advancing and spin this walker forever on one bad record
      if (len < 0 || 8 + len + (len & 1) <= 0) return None
      i += 8 + len + (len & 1) // chunks are word-aligned
    }
    // bits >= 8 also guards the frame-size divide: 1..7-bit (sub-byte) fmt
    // chunks would make ch*bits/8 == 0 for mono — corrupt header, reject
    fmt.collect { case (ch, rate, bits) if dataLen >= 0 && ch > 0 && bits >= 8 =>
      (rate, ch, bits, dataLen / (ch * bits / 8))
    }
  }
}
