package graft.media

import java.nio.{ByteBuffer, ByteOrder}

/** Image codecs with no library dependencies — REAL decoders (not
  * stubs), same philosophy as [[WavCodec]]: deterministic pure
  * functions on byte arrays that run executor-side inside
  * `mapPartitions`, so payload bytes never cross a shuffle.
  *
  * Two formats, both fully specified by public documentation and
  * parseable with a plain byte walk:
  *
  *  - '''BMP''' — 24-bit uncompressed (`BI_RGB`) Windows bitmaps:
  *    14-byte file header, ≥40-byte `BITMAPINFOHEADER`, BGR pixel
  *    rows padded to 4 bytes, stored bottom-up (or top-down when the
  *    height field is negative). The padding + row-flip + BGR swap
  *    are exactly the bugs a fake decoder can't catch.
  *  - '''PPM (P6)''' — binary NetPBM: ASCII header (`P6`, width,
  *    height, maxval, `#` comments) then raw RGB bytes, top-down,
  *    unpadded.
  *
  * A concatenated sequence of P6 frames is also a real container: it
  * is byte-for-byte what `ffmpeg -f image2pipe -vcodec ppm` emits, so
  * [[decodePpmStream]] is a genuine video demuxer for that stream
  * format, not a synthetic invention.
  *
  * Decoded pixels are normalized to row-major top-down RGB triples so
  * every downstream feature is format-independent.
  */
object ImageCodec {

  /** Row-major, top-down, 3 bytes/pixel RGB. */
  final case class Image(width: Int, height: Int, rgb: Array[Byte]) {
    require(width > 0 && height > 0, s"empty image ${width}x$height")
    require(rgb.length.toLong == width.toLong * height * 3, // Long: 65536² wraps in Int
      s"pixel buffer ${rgb.length} != ${width}x$height x3")
    /** Channel value in [0,255] at (x, y): c = 0 red, 1 green, 2 blue. */
    def at(x: Int, y: Int, c: Int): Int = rgb((y * width + x) * 3 + c) & 0xff
  }

  // ---------------------------------------------------------------- BMP

  private val FileHeaderLen = 14
  private val InfoHeaderLen = 40

  /** Canonical 24-bit bottom-up `BI_RGB` BMP. */
  def encodeBmp(img: Image): Array[Byte] = {
    val stride = (img.width * 3 + 3) / 4 * 4 // rows pad to 4-byte boundary
    val dataLen = stride * img.height
    val buf = ByteBuffer.allocate(FileHeaderLen + InfoHeaderLen + dataLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(FileHeaderLen + InfoHeaderLen + dataLen) // file size
    buf.putInt(0)                                       // reserved
    buf.putInt(FileHeaderLen + InfoHeaderLen)           // pixel data offset
    buf.putInt(InfoHeaderLen)
    buf.putInt(img.width)
    buf.putInt(img.height)                              // positive → bottom-up
    buf.putShort(1)                                     // planes
    buf.putShort(24)                                    // bits per pixel
    buf.putInt(0)                                       // BI_RGB
    buf.putInt(dataLen)
    buf.putInt(2835).putInt(2835)                       // 72 DPI in px/metre
    buf.putInt(0).putInt(0)                             // palette sizes
    var y = img.height - 1                              // bottom row first
    while (y >= 0) {
      var x = 0
      while (x < img.width) {
        buf.put(img.rgb((y * img.width + x) * 3 + 2))   // B
        buf.put(img.rgb((y * img.width + x) * 3 + 1))   // G
        buf.put(img.rgb((y * img.width + x) * 3))       // R
        x += 1
      }
      var p = img.width * 3
      while (p < stride) { buf.put(0: Byte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Decode a 24-bit uncompressed BMP (bottom-up or top-down). Fails
    * loudly on palette/compressed/other-depth bitmaps — a decode
    * stage must reject what it can't faithfully parse, not guess. */
  def decodeBmp(bytes: Array[Byte]): Image = {
    require(bytes.length >= FileHeaderLen + InfoHeaderLen,
      s"not a BMP: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'B'.toByte && buf.get() == 'M'.toByte, "missing BM magic")
    buf.getInt; buf.getInt                      // file size + reserved: files lie, walk the headers
    val dataOffset = buf.getInt
    val infoLen = buf.getInt
    require(infoLen >= InfoHeaderLen, s"ancient BITMAPCOREHEADER ($infoLen bytes) unsupported")
    val width = buf.getInt
    val rawHeight = buf.getInt
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    buf.getShort                                // planes
    val bpp = buf.getShort
    val compression = buf.getInt
    require(bpp == 24, s"expected 24-bit pixels, got $bpp")
    require(compression == 0, s"compressed BMP (method $compression) unsupported")
    require(width > 0 && height > 0, s"degenerate dimensions ${width}x$rawHeight")
    // all size arithmetic in Long FIRST: width*3 wraps for widths
    // past ~716M and a wrapped stride would pass the truncation check
    // then crash mid-decode with AIOOBE instead of the promised IAE
    val strideL = (width.toLong * 3 + 3) / 4 * 4
    val rgbLenL = width.toLong * height * 3
    require(rgbLenL <= Int.MaxValue - 16, s"image too large: ${width}x$height")
    require(dataOffset >= FileHeaderLen + InfoHeaderLen &&
      dataOffset.toLong + strideL * height <= bytes.length,
      s"truncated pixel array (need ${strideL * height} bytes at $dataOffset)")
    val stride = strideL.toInt
    val rgb = new Array[Byte](rgbLenL.toInt)
    var row = 0
    while (row < height) {
      val y = if (topDown) row else height - 1 - row // normalize to top-down
      val src = dataOffset + row * stride
      var x = 0
      while (x < width) {
        rgb((y * width + x) * 3) = bytes(src + x * 3 + 2)     // R ← BGR
        rgb((y * width + x) * 3 + 1) = bytes(src + x * 3 + 1) // G
        rgb((y * width + x) * 3 + 2) = bytes(src + x * 3)     // B
        x += 1
      }
      row += 1
    }
    Image(width, height, rgb)
  }

  // ---------------------------------------------------------------- PPM

  /** Canonical binary PPM: `P6\n<w> <h>\n255\n` + raw RGB. */
  def encodePpm(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** Header walk of one P6 frame starting at `from`: returns
    * (width, height, rasterStart, frameEnd) WITHOUT copying any
    * pixel bytes — the shared primitive of [[decodePpmAt]] (which
    * copies), [[decodePpmStream]] (one copy per kept frame) and
    * [[countPpmFrames]] (no copies at all). Handles `#` comments and
    * any whitespace runs in the header, per the NetPBM spec. */
  private def ppmBounds(bytes: Array[Byte], from: Int): (Int, Int, Int, Int) = {
    require(from + 2 <= bytes.length && bytes(from) == 'P'.toByte && bytes(from + 1) == '6'.toByte,
      s"missing P6 magic at offset $from")
    var pos = from + 2
    def skipSeparators(): Unit = {
      var moved = true
      while (moved) {
        moved = false
        while (pos < bytes.length && Character.isWhitespace(bytes(pos).toChar)) { pos += 1; moved = true }
        if (pos < bytes.length && bytes(pos) == '#'.toByte) { // comment runs to end of line
          while (pos < bytes.length && bytes(pos) != '\n'.toByte) pos += 1
          moved = true
        }
      }
    }
    def readInt(field: String): Int = {
      skipSeparators()
      val start = pos
      // accumulate in Long with an explicit bound: String.toInt on an
      // over-long digit run throws NumberFormatException ("For input
      // string ...") — technically still an IllegalArgumentException,
      // but without the offset/field context every other failure here
      // reports, and the explicit bound documents WHERE oversized
      // values are rejected instead of leaving it to parse mechanics
      var v = 0L
      while (pos < bytes.length && bytes(pos) >= '0'.toByte && bytes(pos) <= '9'.toByte) {
        v = v * 10 + (bytes(pos) - '0'.toByte)
        require(v <= Int.MaxValue, s"PPM header: $field value overflows at offset $start")
        pos += 1
      }
      require(pos > start, s"PPM header: expected $field digits at offset $start")
      v.toInt
    }
    val width = readInt("width")
    val height = readInt("height")
    val maxval = readInt("maxval")
    require(maxval == 255, s"expected 8-bit maxval 255, got $maxval")
    require(width > 0 && height > 0, s"degenerate dimensions ${width}x$height")
    // exactly ONE whitespace byte separates maxval from the raster
    require(pos < bytes.length && Character.isWhitespace(bytes(pos).toChar),
      "PPM header: missing raster separator")
    pos += 1
    // Long: 65536 x 65536 wraps Int to 0 and would "decode" a
    // crafted header into a bogus empty image instead of failing
    val len = width.toLong * height * 3
    require(pos + len <= bytes.length,
      s"truncated raster (need $len bytes at $pos of ${bytes.length})")
    (width, height, pos, pos + len.toInt)
  }

  /** Decode one P6 image starting at `from`; returns the image and
    * the offset one past its raster. */
  private def decodePpmAt(bytes: Array[Byte], from: Int): (Image, Int) = {
    val (w, h, rasterStart, end) = ppmBounds(bytes, from)
    (Image(w, h, java.util.Arrays.copyOfRange(bytes, rasterStart, end)), end)
  }

  def decodePpm(bytes: Array[Byte]): Image = {
    val (img, end) = decodePpmAt(bytes, 0)
    require(end == bytes.length, s"${bytes.length - end} trailing bytes after raster")
    img
  }

  /** Format sniff on magic bytes: `BM` → BMP, `P6` → PPM. */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 2, s"not an image: ${bytes.length} bytes")
    (bytes(0).toChar, bytes(1).toChar) match {
      case ('B', 'M') => decodeBmp(bytes)
      case ('P', '6') => decodePpm(bytes)
      case (a, b) => throw new IllegalArgumentException(s"unknown image magic '$a$b'")
    }
  }

  /** Demux a concatenated-P6 stream (`ffmpeg -f image2pipe -vcodec
    * ppm` output): each element is the complete byte slice of one
    * frame, individually decodable. Fails loudly mid-stream rather
    * than returning a truncated frame list. */
  def decodePpmStream(bytes: Array[Byte]): IndexedSeq[Array[Byte]] = {
    val frames = IndexedSeq.newBuilder[Array[Byte]]
    var pos = 0
    while (pos < bytes.length) {
      // bounds walk + ONE copy (the kept frame slice) — decodePpmAt
      // here would have allocated a second, immediately-discarded
      // pixel buffer per frame
      val (_, _, _, end) = ppmBounds(bytes, pos)
      frames += java.util.Arrays.copyOfRange(bytes, pos, end)
      pos = end
    }
    frames.result()
  }

  /** Frame count without materializing frame copies — header walk only. */
  def countPpmFrames(bytes: Array[Byte]): Int = {
    var n = 0
    var pos = 0
    while (pos < bytes.length) { pos = ppmBounds(bytes, pos)._4; n += 1 }
    n
  }

  /** The ONE format sniff (magic bytes): "bmp", "ppm", or None —
    * shared with feature extractors that label rows by format, so
    * the label and the decoder can never drift. */
  def formatOf(bytes: Array[Byte]): Option[String] =
    if (bytes.length < 2) None
    else (bytes(0).toChar, bytes(1).toChar) match {
      case ('B', 'M') => Some("bmp")
      case ('P', '6') => Some("ppm")
      case _ => None
    }
}
