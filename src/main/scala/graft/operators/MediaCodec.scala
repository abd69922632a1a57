package graft.operators

/** One decoded raster image, reduced to the channel statistics the pipeline
  * extracts: dimensions, per-channel sums, and a position-weighted checksum
  * (`Σ (k+1)·(r_k + 2·g_k + 3·b_k)` over logical top-down row-major pixel
  * index k) — the checksum pins pixel ORDER, so a decoder that mishandles
  * BMP's bottom-up rows or BGR byte order cannot pass by luck of
  * order-insensitive sums. */
final case class DecodedImage(
    format: String,
    width: Int,
    height: Int,
    sumR: Long,
    sumG: Long,
    sumB: Long,
    posHash: Long)

/** One decoded PCM audio clip, reduced to the statistics the pipeline
  * extracts: rate, length, duration, absolute-amplitude sum, and a
  * position-weighted checksum (`Σ (k+1)·s_k` over SIGNED samples) — the
  * checksum pins sample order and two's-complement handling, so a decoder
  * that misreads endianness or sign cannot pass on magnitude sums alone. */
final case class DecodedAudio(
    sampleRate: Int,
    nSamples: Int,
    durationMicros: Long,
    sumAbs: Long,
    posHash: Long)

/** Pure-JVM image codecs for the two classic uncompressed raster formats —
  * BMP (24-bit BI_RGB, both bottom-up and top-down row order, 4-byte row
  * padding) and binary PPM (P6, comment-tolerant header). No native
  * libraries, no ImageIO: the container ships no codecs, and these formats
  * are fully specified by public documentation (Windows BITMAPINFOHEADER
  * layout; the netpbm P6 format), so a header-true parser is ~100 lines.
  *
  * [[decode]] is the production path (used by
  * [[Multimodal.imageFeatures]]); the `encode*` functions are deterministic
  * FIXTURE generators for tests and the oracle-checked query — a real
  * pipeline reads its bytes from object storage instead. */
object MediaCodec {

  // ---- little-endian helpers over raw byte arrays ----
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def i16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def i32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def putI16(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
  }
  private def putI32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
    b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
  }

  private def bmpRowStride(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Encode `rgb` (top-down row-major R,G,B triplets) as a 24-bit BI_RGB
    * BMP. `topDown = true` writes a negative-height header (rows stored
    * top-down) — the variant spec tests use to pin row-order handling. */
  def encodeBmp(width: Int, height: Int, rgb: Array[Byte],
      topDown: Boolean = false): Array[Byte] = {
    require(rgb.length == 3 * width * height, "rgb must be 3*w*h bytes")
    val stride = bmpRowStride(width)
    val dataOffset = 14 + 40
    val out = new Array[Byte](dataOffset + stride * height)
    out(0) = 'B'; out(1) = 'M'
    putI32(out, 2, out.length)
    putI32(out, 10, dataOffset)
    putI32(out, 14, 40) // BITMAPINFOHEADER
    putI32(out, 18, width)
    putI32(out, 22, if (topDown) -height else height)
    putI16(out, 26, 1) // planes
    putI16(out, 28, 24) // bpp
    putI32(out, 30, 0) // BI_RGB
    putI32(out, 34, stride * height)
    var y = 0
    while (y < height) {
      val fileRow = if (topDown) y else height - 1 - y
      var x = 0
      while (x < width) {
        val src = 3 * (y * width + x)
        val dst = dataOffset + fileRow * stride + 3 * x
        out(dst) = rgb(src + 2) // B
        out(dst + 1) = rgb(src + 1) // G
        out(dst + 2) = rgb(src) // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Encode `rgb` (top-down row-major R,G,B) as binary PPM (P6). */
  def encodePpm(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * width * height, "rgb must be 3*w*h bytes")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    header ++ rgb
  }

  /** Decode a BMP, PPM, or PNG payload to channel statistics; `None` for
    * unrecognized magic or a malformed/truncated body (callers fall back to
    * the opaque-payload stub, [[Multimodal.decodeStub]]). */
  def decode(bytes: Array[Byte]): Option[DecodedImage] =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
    else if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G') decodePng(bytes)
    else None

  /** Accumulate stats over logical top-down row-major pixels via a
    * per-pixel RGB lookup. */
  private def accumulate(format: String, width: Int, height: Int)(
      pixel: (Int, Int) => (Int, Int, Int)): DecodedImage = {
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var posHash = 0L
    var k = 0
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        sumR += r; sumG += g; sumB += b
        posHash += (k + 1).toLong * (r + 2L * g + 3L * b)
        k += 1
        x += 1
      }
      y += 1
    }
    DecodedImage(format, width, height, sumR, sumG, sumB, posHash)
  }

  /** Encode mono 16-bit PCM as a canonical 44-byte-header WAV. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = 2 * samples.length
    val out = new Array[Byte](44 + dataLen)
    "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
    putI32(out, 4, 36 + dataLen)
    "WAVE".getBytes("US-ASCII").copyToArray(out, 8)
    "fmt ".getBytes("US-ASCII").copyToArray(out, 12)
    putI32(out, 16, 16) // PCM fmt chunk size
    putI16(out, 20, 1) // audio format: PCM
    putI16(out, 22, 1) // mono
    putI32(out, 24, sampleRate)
    putI32(out, 28, sampleRate * 2) // byte rate
    putI16(out, 32, 2) // block align
    putI16(out, 34, 16) // bits per sample
    "data".getBytes("US-ASCII").copyToArray(out, 36)
    putI32(out, 40, dataLen)
    var k = 0
    while (k < samples.length) {
      putI16(out, 44 + 2 * k, samples(k) & 0xffff)
      k += 1
    }
    out
  }

  /** Decode a RIFF/WAVE payload (16-bit PCM mono) to amplitude statistics;
    * `None` for other magic, other codecs (non-PCM, non-mono, non-16-bit),
    * or a truncated body. Walks the chunk list properly — `fmt ` and `data`
    * may be separated by LIST/fact/cue chunks, and odd-sized chunks carry a
    * pad byte (RIFF spec), so a header-offset-44 shortcut would misread
    * real-world files. */
  def decodeAudio(b: Array[Byte]): Option[DecodedAudio] = {
    if (b.length < 12) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var pos = 12
    var rate = -1
    var ok = false
    while (pos + 8 <= b.length) {
      val id = new String(b, pos, 4, "US-ASCII")
      val sz = i32(b, pos + 4)
      val body = pos + 8
      if (sz < 0 || body + sz > b.length) return None
      id match {
        case "fmt " =>
          if (sz < 16) return None
          ok = i16(b, body) == 1 && i16(b, body + 2) == 1 && i16(b, body + 14) == 16
          rate = i32(b, body + 4)
        case "data" if ok && rate > 0 =>
          val n = sz / 2
          var sumAbs = 0L
          var posHash = 0L
          var k = 0
          while (k < n) {
            val s = i16(b, body + 2 * k).toShort.toInt // sign-extend
            sumAbs += math.abs(s)
            posHash += (k + 1).toLong * s
            k += 1
          }
          return Some(DecodedAudio(rate, n, n * 1000000L / rate, sumAbs, posHash))
        case _ => ()
      }
      pos = body + sz + (sz & 1) // odd chunks are padded
    }
    None
  }

  // ---- PNG (public spec: RFC 2083 / W3C PNG): 8-bit truecolor (color
  // type 2), non-interlaced — the subset the fixture pipeline produces.
  // zlib inflate via java.util.zip.Inflater; per-scanline unfiltering of
  // all five standard filter types; chunk CRCs verified. ----

  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def putBE32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
    b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
  }

  /** Paeth predictor (PNG spec §6.6): nearest of a (left), b (above),
    * c (above-left) to a+b−c, ties a then b then c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode `rgb` (top-down row-major R,G,B) as an 8-bit truecolor PNG.
    * Each scanline is filtered with type `y % 5` — all five standard
    * filters appear in any image ≥ 5 rows, so a decoder that fakes any
    * unfilter path cannot round-trip the fixture. */
  def encodePng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * width * height, "rgb must be 3*w*h bytes")
    val stride = 3 * width
    val raw = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      val ft = y % 5
      val off = y * (1 + stride)
      raw(off) = ft.toByte
      var i = 0
      while (i < stride) {
        val x = rgb(y * stride + i) & 0xff
        val a = if (i >= 3) rgb(y * stride + i - 3) & 0xff else 0
        val b = if (y > 0) rgb((y - 1) * stride + i) & 0xff else 0
        val c = if (y > 0 && i >= 3) rgb((y - 1) * stride + i - 3) & 0xff else 0
        val filtered = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => x - paeth(a, b, c)
        }
        raw(off + 1 + i) = (filtered & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    def chunk(typ: String, body: Array[Byte]): Unit = {
      val len = new Array[Byte](4); putBE32(len, 0, body.length)
      bos.write(len, 0, 4)
      val tb = typ.getBytes("US-ASCII")
      bos.write(tb, 0, 4)
      bos.write(body, 0, body.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(body)
      val cb = new Array[Byte](4); putBE32(cb, 0, crc.getValue.toInt)
      bos.write(cb, 0, 4)
    }
    val ihdr = new Array[Byte](13)
    putBE32(ihdr, 0, width); putBE32(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor RGB
    // bytes 10-12: compression 0, filter 0, interlace 0
    chunk("IHDR", ihdr)
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  /** Decode an 8-bit truecolor non-interlaced PNG: walk the chunk list
    * (CRC-verified), inflate the concatenated IDAT stream, unfilter each
    * scanline per its filter byte. Other color types / bit depths /
    * interlacing, a bad CRC, a corrupt zlib stream, or a short pixel
    * payload all return `None`. */
  private def decodePng(b: Array[Byte]): Option[DecodedImage] = {
    var pos = 8
    var width = -1; var height = -1; var headerOk = false
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && pos + 12 <= b.length) {
      val sz = be32(b, pos)
      val body = pos + 8
      // long arithmetic: a chunk size near Int.MaxValue overflows the int
      // form of this bound and would walk past the buffer
      if (sz < 0 || body.toLong + sz.toLong + 4L > b.length) return None
      val typ = new String(b, pos + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(b, pos + 4, 4 + sz)
      if (crc.getValue.toInt != be32(b, body + sz)) return None
      typ match {
        case "IHDR" =>
          if (sz != 13) return None
          width = be32(b, body); height = be32(b, body + 4)
          headerOk = u8(b, body + 8) == 8 && u8(b, body + 9) == 2 &&
            u8(b, body + 10) == 0 && u8(b, body + 11) == 0 && u8(b, body + 12) == 0
        case "IDAT" => idat.write(b, body, sz)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped
      }
      pos = body + sz + 4
    }
    if (!headerOk || !sawEnd || width <= 0 || height <= 0) return None
    // dimension guards in LONG arithmetic (same posture as decodeBmp /
    // decodePpm): a hostile IHDR can declare dimensions whose raster size
    // overflows int (NegativeArraySizeException) or demands a multi-GB
    // allocation from a tiny file (PNG is compressed, so unlike BMP/PPM
    // the payload length does not bound the raster — cap it explicitly)
    val rawLenL = height.toLong * (1L + 3L * width.toLong)
    if (rawLenL > (64L << 20)) return None // 64 MiB raster cap
    val stride = 3 * width
    val raw = new Array[Byte](rawLenL.toInt)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var filled = 0
      while (filled < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, filled, raw.length - filled)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        filled += n
      }
      if (filled < raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    // unfilter in place into a top-down RGB buffer
    val px = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val ft = u8(raw, y * (1 + stride))
      if (ft > 4) return None
      var i = 0
      while (i < stride) {
        val f = u8(raw, y * (1 + stride) + 1 + i)
        val a = if (i >= 3) px(y * stride + i - 3) & 0xff else 0
        val bUp = if (y > 0) px((y - 1) * stride + i) & 0xff else 0
        val c = if (y > 0 && i >= 3) px((y - 1) * stride + i - 3) & 0xff else 0
        val v = ft match {
          case 0 => f
          case 1 => f + a
          case 2 => f + bUp
          case 3 => f + (a + bUp) / 2
          case 4 => f + paeth(a, bUp, c)
        }
        px(y * stride + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    Some(accumulate("png", width, height) { (x, y2) =>
      val off = 3 * (y2 * width + x)
      (u8(px, off), u8(px, off + 1), u8(px, off + 2))
    })
  }

  private def decodeBmp(b: Array[Byte]): Option[DecodedImage] = {
    if (b.length < 54) return None
    val dataOffset = i32(b, 10)
    val headerSize = i32(b, 14)
    val width = i32(b, 18)
    val rawHeight = i32(b, 22)
    val bpp = i16(b, 28)
    val compression = i32(b, 30)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    // only the layout this codec understands: uncompressed 24-bit
    if (headerSize < 40 || bpp != 24 || compression != 0) return None
    if (width <= 0 || height <= 0) return None
    val stride = bmpRowStride(width)
    if (dataOffset.toLong + stride.toLong * height > b.length) return None
    Some(accumulate("bmp", width, height) { (x, y) =>
      val fileRow = if (topDown) y else height - 1 - y
      val off = dataOffset + fileRow * stride + 3 * x
      (u8(b, off + 2), u8(b, off + 1), u8(b, off)) // stored B,G,R
    })
  }

  /** P6 header: three ASCII ints (width, height, maxval) separated by
    * whitespace, `#`-to-EOL comments allowed anywhere whitespace is, then
    * ONE whitespace byte, then 3·w·h binary RGB bytes. */
  private def decodePpm(b: Array[Byte]): Option[DecodedImage] = {
    var pos = 2
    def nextInt(): Option[Int] = {
      // skip whitespace and comments
      var inComment = false
      while (pos < b.length &&
          (inComment || b(pos).toChar.isWhitespace || b(pos) == '#')) {
        if (b(pos) == '#') inComment = true
        else if (b(pos) == '\n') inComment = false
        pos += 1
      }
      var v = -1
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = (if (v < 0) 0 else v) * 10 + (b(pos) - '0')
        pos += 1
      }
      Option.when(v >= 0)(v)
    }
    for {
      width <- nextInt()
      height <- nextInt()
      maxval <- nextInt()
      if width > 0 && height > 0 && maxval > 0 && maxval < 256
      if pos < b.length && b(pos).toChar.isWhitespace // single post-header byte
      data = pos + 1
      if data.toLong + 3L * width * height <= b.length
    } yield accumulate("ppm", width, height) { (x, y) =>
      val off = data + 3 * (y * width + x)
      (u8(b, off), u8(b, off + 1), u8(b, off + 2))
    }
  }
}
