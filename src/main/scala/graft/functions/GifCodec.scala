package graft.functions

import java.io.ByteArrayOutputStream

/** REAL animated GIF89a encode/parse — pure byte plumbing from the public
  * GIF89a specification, no libraries (the same discipline as
  * [[ImageCodec]]'s PNG/BMP and [[WavCodec]]'s RIFF).
  *
  * [[encodeGif]] writes a spec-valid multi-frame file: header + logical
  * screen descriptor, global 16-color palette, NETSCAPE2.0 looping
  * application extension, and per frame a Graphic Control Extension block
  * (delay, disposal) + image descriptor + LZW-compressed index stream in
  * ≤255-byte sub-blocks. [[decodeMeta]]/[[frameOffsets]] walk the real block
  * structure; [[decodeFrameIndices]] is a full LZW decoder — the round-trip
  * (encode → decode == input indices) is what the tests assert, so the
  * bitstream is verified by an INDEPENDENT decoder, not by construction.
  */
object GifCodec {

  private val Header = "GIF89a".getBytes("US-ASCII")

  // ------------------------------- LZW ---------------------------------

  /** LSB-first bit packer feeding 255-byte data sub-blocks. */
  private final class BitPacker(out: ByteArrayOutputStream) {
    private var cur = 0
    private var nBits = 0
    private val block = new Array[Byte](255)
    private var blockLen = 0
    private def flushByte(b: Int): Unit = {
      block(blockLen) = b.toByte
      blockLen += 1
      if (blockLen == 255) { out.write(255); out.write(block, 0, 255); blockLen = 0 }
    }
    def put(code: Int, width: Int): Unit = {
      cur |= code << nBits
      nBits += width
      while (nBits >= 8) { flushByte(cur & 0xff); cur >>>= 8; nBits -= 8 }
    }
    def finish(): Unit = {
      if (nBits > 0) flushByte(cur & 0xff)
      if (blockLen > 0) { out.write(blockLen); out.write(block, 0, blockLen) }
      out.write(0) // block terminator
    }
  }

  /** GIF-variant LZW over `indices` (values < 2^minCodeSize), emitted as
    * sub-blocked bytes including the terminator.
    *
    * Code-width schedule follows giflib's convention so the stream interops
    * with standard readers: every emit writes with the CURRENT width, then
    * bumps the width if the next-code-to-assign has reached capacity —
    * i.e. the check runs per code written, BEFORE the dictionary assign
    * that follows a miss. The decoder mirrors this per code read. */
  private def lzwEncode(out: ByteArrayOutputStream, minCodeSize: Int,
                        indices: Array[Byte]): Unit = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    var codeSize = minCodeSize + 1
    var next = eoi + 1
    // dictionary key = (prefixCode << 8) | nextIndex; codes < 4096 ⇒ key < 2^20
    var dict = new java.util.HashMap[Integer, Integer]()
    val bits = new BitPacker(out)
    def emit(c: Int): Unit = {
      bits.put(c, codeSize)
      if (next >= (1 << codeSize) && codeSize < 12) codeSize += 1
    }
    emit(clear)
    var prefix = indices(0) & 0xff
    var i = 1
    while (i < indices.length) {
      val k = indices(i) & 0xff
      val key = (prefix << 8) | k
      val hit = dict.get(key)
      if (hit != null) prefix = hit.intValue()
      else {
        emit(prefix)
        if (next < 4096) {
          dict.put(key, next)
          next += 1
        } else { // dictionary full: clear and restart (decoder mirrors)
          emit(clear)
          dict = new java.util.HashMap[Integer, Integer]()
          codeSize = minCodeSize + 1
          next = eoi + 1
        }
        prefix = k
      }
      i += 1
    }
    emit(prefix)
    emit(eoi)
    bits.finish()
  }

  /** Independent GIF-LZW decoder for one image's sub-blocked data, starting
    * at the min-code-size byte. Returns (indices, offset just past the data
    * terminator). */
  private def lzwDecode(b: Array[Byte], start: Int, nPixels: Int): (Array[Byte], Int) = {
    // truncated blob: decode nothing rather than index past the array
    if (start >= b.length) return (Array.empty[Byte], b.length)
    val minCodeSize = b(start) & 0xff
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    // collect the sub-blocked bytes (bounded — sub-block lengths in corrupt
    // data may point past the end)
    val data = new ByteArrayOutputStream()
    var i = start + 1
    while (i < b.length && (b(i) & 0xff) != 0) {
      val len = b(i) & 0xff
      val avail = math.min(len, b.length - (i + 1))
      if (avail > 0) data.write(b, i + 1, avail)
      i += 1 + len
    }
    val end = math.min(i + 1, b.length)
    val bytes = data.toByteArray
    var codeSize = minCodeSize + 1
    // width counter: runs per code READ (the giflib schedule) — the entry
    // table below lags one code behind it by construction
    var widthRun = eoi + 1
    var bitPos = 0
    def read(): Int = {
      var v = 0
      var got = 0
      while (got < codeSize) {
        val byteI = bitPos >> 3
        if (byteI >= bytes.length) return eoi
        val avail = 8 - (bitPos & 7)
        val take = math.min(avail, codeSize - got)
        v |= (((bytes(byteI) & 0xff) >> (bitPos & 7)) & ((1 << take) - 1)) << got
        got += take
        bitPos += take
      }
      widthRun += 1
      if (widthRun > (1 << codeSize) && codeSize < 12) codeSize += 1
      v
    }
    val out = new ByteArrayOutputStream(nPixels)
    var dict = new Array[Array[Byte]](4096)
    var next = 0
    def reset(): Unit = {
      dict = new Array[Array[Byte]](4096)
      var c = 0
      while (c < clear) { dict(c) = Array(c.toByte); c += 1 }
      next = eoi + 1
      widthRun = eoi + 1
      codeSize = minCodeSize + 1
    }
    reset()
    var prev: Array[Byte] = null
    var done = false
    while (!done) {
      val c = read()
      if (c == eoi) done = true
      else if (c == clear) { reset(); prev = null }
      else if (dict(c) == null && prev == null) {
        // undefined code with no previous entry: only reachable on corrupt
        // streams (first code after a clear must be a literal) — the KwKwK
        // branch below would dereference prev. Treat as end-of-stream.
        done = true
      } else {
        val entry: Array[Byte] =
          if (dict(c) != null) dict(c)
          else prev :+ prev(0) // the KwKwK case
        out.write(entry, 0, entry.length)
        if (prev != null && next < 4096) {
          dict(next) = prev :+ entry(0)
          next += 1
        }
        prev = entry
      }
    }
    (out.toByteArray, end)
  }

  // ------------------------------ encode --------------------------------

  /** Fixed 16-color palette (4-bit indices; deterministic ramp). */
  private def palette(out: ByteArrayOutputStream): Unit = {
    var i = 0
    while (i < 16) {
      out.write(i * 17); out.write(255 - i * 17); out.write((i * 37) & 0xff)
      i += 1
    }
  }

  /** Spec-valid animated GIF89a. `pixel(frame, x, y)` returns a palette
    * index 0–15; `delayCs` is the per-frame delay in centiseconds. */
  def encodeGif(w: Int, h: Int, nFrames: Int, delayCs: Int,
                pixel: (Int, Int, Int) => Int): Array[Byte] = {
    require(nFrames >= 1 && w > 0 && h > 0)
    val out = new ByteArrayOutputStream()
    out.write(Header)
    // logical screen descriptor: global table, 4-bit color resolution, 16 entries
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0x80 | (3 << 4) | 3) // GCT flag | color-res 4-bit | table size 2^(3+1)=16
    out.write(0); out.write(0)     // background index, aspect
    palette(out)
    // NETSCAPE2.0 application extension: loop forever
    out.write(0x21); out.write(0xff); out.write(11)
    out.write("NETSCAPE2.0".getBytes("US-ASCII"))
    out.write(3); out.write(1); out.write(0); out.write(0); out.write(0)
    var f = 0
    while (f < nFrames) {
      // graphic control extension: disposal 1 (leave), delay, no transparency
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(1 << 2)
      out.write(delayCs & 0xff); out.write(delayCs >> 8)
      out.write(0); out.write(0)
      // image descriptor: full frame, no local table
      out.write(0x2c)
      out.write(0); out.write(0); out.write(0); out.write(0)
      out.write(w & 0xff); out.write(w >> 8)
      out.write(h & 0xff); out.write(h >> 8)
      out.write(0)
      // LZW data, min code size 4 (16-color indices)
      val indices = new Array[Byte]((w * h).toInt)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { indices(y * w + x) = (pixel(f, x, y) & 0x0f).toByte; x += 1 }
        y += 1
      }
      out.write(4)
      lzwEncode(out, 4, indices)
      f += 1
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // ------------------------------- parse --------------------------------

  private def leShort(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Byte offsets of each image descriptor (0x2C), by walking the REAL block
    * structure (extensions skipped sub-block by sub-block). Nil if not GIF. */
  def frameOffsets(b: Array[Byte]): Seq[Int] = {
    if (b.length < 13 || b(0) != 'G' || b(1) != 'I' || b(2) != 'F') return Nil
    val gctFlag = (b(10) & 0x80) != 0
    val gctSize = if (gctFlag) 3 * (2 << (b(10) & 7)) else 0
    var i = 13 + gctSize
    val out = scala.collection.mutable.ArrayBuffer[Int]()
    while (i < b.length && (b(i) & 0xff) != 0x3b) {
      (b(i) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          i += 2
          while (i < b.length && (b(i) & 0xff) != 0) i += 1 + (b(i) & 0xff)
          i += 1
        case 0x2c =>
          // a descriptor truncated mid-stream (corrupt blob) is not a frame —
          // stop at what we parsed rather than index past the array
          if (i + 10 > b.length) return out.toSeq
          out += i
          val lctFlag = (b(i + 9) & 0x80) != 0
          val lctSize = if (lctFlag) 3 * (2 << (b(i + 9) & 7)) else 0
          i += 10 + lctSize + 1 // descriptor + local table + min-code-size
          while (i < b.length && (b(i) & 0xff) != 0) i += 1 + (b(i) & 0xff)
          i += 1
        case _ => return out.toSeq // corrupt: stop at what we parsed
      }
    }
    out.toSeq
  }

  /** (width, height, nFrames) from real GIF bytes. */
  def decodeMeta(b: Array[Byte]): Option[(Int, Int, Int)] = {
    val frames = frameOffsets(b)
    if (frames.isEmpty) None
    else Some((leShort(b, 6), leShort(b, 8), frames.length))
  }

  /** Fully LZW-decode frame `frame`'s pixel indices. */
  def decodeFrameIndices(b: Array[Byte], frame: Int): Option[Array[Byte]] = {
    val offs = frameOffsets(b)
    if (frame < 0 || frame >= offs.length) return None
    val o = offs(frame)
    val fw = leShort(b, o + 5)
    val fh = leShort(b, o + 7)
    val lctFlag = (b(o + 9) & 0x80) != 0
    val lctSize = if (lctFlag) 3 * (2 << (b(o + 9) & 7)) else 0
    Some(lzwDecode(b, o + 10 + lctSize, fw * fh)._1)
  }
}
