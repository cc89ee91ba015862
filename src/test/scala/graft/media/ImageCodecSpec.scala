package graft.media

import graft.SparkSpec
import ImageCodec._
import scala.util.Random

/** Real-codec contract for the image side, mirroring WavCodecSpec:
  * roundtrip identity across both formats (including the BMP row-pad
  * residues), bottom-up vs top-down normalization, header tolerance,
  * loud failure on malformed streams, and end-to-end decoded features
  * matching the synthesis formula. */
class ImageCodecSpec extends SparkSpec {
  import spark.implicits._

  private def randomImage(rnd: Random, w: Int, h: Int): Image =
    Image(w, h, Array.fill(w * h * 3)(rnd.nextInt(256).toByte))

  test("BMP encode/decode roundtrip across every row-padding residue") {
    val rnd = new Random(7)
    for (w <- 5 to 12; h <- Seq(1, 3, 7)) { // w*3 mod 4 sweeps 3,2,1,0
      val img = randomImage(rnd, w, h)
      val back = decodeBmp(encodeBmp(img))
      assert(back.width == w && back.height == h)
      assert(back.rgb.toSeq == img.rgb.toSeq, s"pixel mismatch at ${w}x$h")
    }
  }

  test("PPM encode/decode roundtrip, with comments and flexible whitespace") {
    val rnd = new Random(8)
    val img = randomImage(rnd, 9, 4)
    assert(decodePpm(encodePpm(img)).rgb.toSeq == img.rgb.toSeq)
    // a header a real tool could emit: comment lines + mixed separators
    val hairy = ("P6 # created by graft\n# another comment\n 9\t4 \n255\n"
      .getBytes("US-ASCII")) ++ img.rgb
    val back = decodePpm(hairy)
    assert(back.width == 9 && back.height == 4 && back.rgb.toSeq == img.rgb.toSeq)
  }

  test("decode() sniffs the container from magic bytes") {
    val img = randomImage(new Random(9), 6, 5)
    assert(decode(encodeBmp(img)).rgb.toSeq == img.rgb.toSeq)
    assert(decode(encodePpm(img)).rgb.toSeq == img.rgb.toSeq)
    intercept[IllegalArgumentException](decode("GIF89a....".getBytes))
  }

  test("top-down BMP (negative height) normalizes to the same raster") {
    val img = randomImage(new Random(10), 7, 3)
    val bytes = encodeBmp(img)
    // flip to top-down: negate height and reverse the stored row order
    val stride = (7 * 3 + 3) / 4 * 4
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -3)
    val off = 54
    val rows = (0 until 3).map(r => bytes.slice(off + r * stride, off + (r + 1) * stride))
    rows.reverse.zipWithIndex.foreach { case (row, r) =>
      System.arraycopy(row, 0, bytes, off + r * stride, stride)
    }
    assert(decodeBmp(bytes).rgb.toSeq == img.rgb.toSeq)
  }

  test("decoders fail loudly on truncation, wrong depth, and compression") {
    val img = randomImage(new Random(11), 8, 8)
    val bmp = encodeBmp(img)
    intercept[IllegalArgumentException](decodeBmp(bmp.dropRight(5)))
    val deep = bmp.clone(); deep(28) = 32 // bits-per-pixel field
    intercept[IllegalArgumentException](decodeBmp(deep))
    val rle = bmp.clone(); rle(30) = 1 // compression field
    intercept[IllegalArgumentException](decodeBmp(rle))
    val ppm = encodePpm(img)
    intercept[IllegalArgumentException](decodePpm(ppm.dropRight(1)))
    intercept[IllegalArgumentException](decodePpm(ppm ++ Array(1.toByte))) // trailing garbage
    intercept[IllegalArgumentException](
      decodePpm("P6\n4 4\n65535\n".getBytes ++ Array.fill(48)(0.toByte))) // 16-bit maxval
  }

  test("crafted overflow headers fail loudly instead of wrapping Int arithmetic") {
    // 65536 x 65536 x 3 wraps a 32-bit length to 0: a header with no
    // raster bytes would have "decoded" into a bogus empty image
    intercept[IllegalArgumentException](
      decodePpm("P6\n65536 65536\n255\n".getBytes))
    // BMP with width 1431655768: width*3 wraps to 8 in Int — a
    // wrapped stride passed the truncation check and crashed
    // mid-decode with ArrayIndexOutOfBounds instead of the clean IAE
    val b = java.nio.ByteBuffer.allocate(62).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(62).putInt(0).putInt(54)
    b.putInt(40).putInt(1431655768).putInt(1).putShort(1).putShort(24).putInt(0)
    intercept[IllegalArgumentException](decodeBmp(b.array()))
  }

  test("P6 stream demux walks exact frame boundaries and rejects mid-stream corruption") {
    val rnd = new Random(12)
    val frames = (0 until 4).map(_ => randomImage(rnd, 5 + rnd.nextInt(6), 3 + rnd.nextInt(4)))
    val stream = frames.toArray.flatMap(encodePpm)
    val slices = decodePpmStream(stream)
    assert(slices.length == 4 && countPpmFrames(stream) == 4)
    slices.zip(frames).foreach { case (s, f) =>
      assert(decodePpm(s).rgb.toSeq == f.rgb.toSeq)
    }
    intercept[IllegalArgumentException](decodePpmStream(stream.dropRight(3)))
  }

  test("imageFeatures over real BMP/PPM bytes match the synthesis formula") {
    val docs = Seq((2L, "a"), (7L, "b"), (140L, "c")).toDF("doc_id", "text")
    val got = MediaOps.imageFeatures(MediaOps.synthImageCorpus(docs)).collect()
      .map(f => f.media_id -> f).toMap
    Seq(2L, 7L, 140L).foreach { id =>
      val w = 5 + (id % 8).toInt; val h = 3 + (id % 5).toInt
      val px = for (y <- 0 until h; x <- 0 until w) yield MediaOps.synthPixel(id, 0, x, y)
      val f = got(id)
      assert(f.fmt == (if (id % 2 == 0) "bmp" else "ppm"))
      assert(f.width == w && f.height == h && f.n_px == w * h)
      assert(f.mean_r == px.map(_._1).sum.toDouble / (w * h))
      assert(f.mean_g == px.map(_._2).sum.toDouble / (w * h))
      assert(f.mean_b == px.map(_._3).sum.toDouble / (w * h))
      assert(f.peak_r == px.map(_._1).max)
      assert(f.wsum == px.zipWithIndex.map { case ((r, g, b), i) =>
        i.toLong * (r + 2L * g + 3L * b) }.sum)
    }
  }

  test("frameFeatures: per-frame stats depend on the frame index (demux alignment)") {
    val docs = Seq((5L, "a")).toDF("doc_id", "text") // 3 frames, 10x3 px
    val got = MediaOps.frameFeatures(MediaOps.videoFrames(MediaOps.synthVideoCorpus(docs)))
      .collect().sortBy(_.frame_idx)
    assert(got.length == 3)
    got.zipWithIndex.foreach { case (f, t) =>
      val w = 10; val h = 3
      val px = for (y <- 0 until h; x <- 0 until w) yield MediaOps.synthPixel(5L, t, x, y)
      assert(f.frame_idx == t && f.frame_ts_ms == t * 40L && f.n_px == w * h)
      assert(f.mean_r == px.map(_._1).sum.toDouble / (w * h))
      assert(f.wsum == px.zipWithIndex.map { case ((r, g, b), i) =>
        i.toLong * (r + 2L * g + 3L * b) }.sum)
    }
  }
}
