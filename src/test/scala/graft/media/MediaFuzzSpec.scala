package graft.media

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Deterministic fuzz sweep over the byte-parsing codecs: ANY input —
  * truncated, bit-flipped, magic-prefixed garbage, or pure noise —
  * must either decode successfully or throw the documented
  * `IllegalArgumentException`. Any other throwable (AIOOBE,
  * NegativeArraySizeException, BufferUnderflowException,
  * NumberFormatException, ...) is an escape from the codecs'
  * fail-loudly contract: a `mapPartitions` decode stage whose
  * quarantine policy catches the promised IAE would instead die on
  * the escaped type and take the whole job with it.
  * (NumberFormatException is an IAE SUBCLASS, so it satisfies the
  * contract — the readInt rework this spec pins was a diagnosability
  * fix, bounded parsing with positional messages, not an escape.)
  */
class MediaFuzzSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String =
    b.take(48).map(x => f"$x%02x").mkString(" ")

  private def contract[A](label: String, input: Array[Byte])(body: => A): Unit =
    try { body; () } catch {
      case _: IllegalArgumentException => () // the documented failure type
      case e: Throwable =>
        fail(s"$label escaped the IAE contract with ${e.getClass.getName}: " +
          s"${e.getMessage} on ${input.length} bytes [${hex(input)}]")
    }

  private def image(rnd: Random, w: Int, h: Int): ImageCodec.Image =
    ImageCodec.Image(w, h, Array.fill(w * h * 3)(rnd.nextInt().toByte))

  private def wav(rnd: Random, n: Int): Array[Byte] =
    WavCodec.encode(Array.fill(n)(rnd.nextInt().toShort), 8000)

  /** Truncations, 1–4-byte mutations, and magic-preserving mutations
    * of a valid artifact, all fed through `decode` under the
    * contract checker. */
  private def fuzzArtifact(label: String, valid: Array[Byte], seed: Long)
                          (decode: Array[Byte] => Any): Unit = {
    val rnd = new Random(seed)
    // every truncation point: header-boundary off-by-ones live here
    (0 until valid.length).foreach { n =>
      contract(s"$label/trunc$n", valid.take(n))(decode(valid.take(n)))
    }
    // seeded point mutations (headers are at the front, so bias there)
    (1 to 2000).foreach { i =>
      val m = valid.clone()
      val nFlips = 1 + rnd.nextInt(4)
      (1 to nFlips).foreach { _ =>
        val p = if (rnd.nextBoolean()) rnd.nextInt(math.min(64, m.length))
                else rnd.nextInt(m.length)
        m(p) = rnd.nextInt().toByte
      }
      contract(s"$label/mut$i", m)(decode(m))
    }
    // pure noise and magic-prefixed noise: drives the deep parse paths
    (1 to 500).foreach { i =>
      val body = Array.fill(rnd.nextInt(300))(rnd.nextInt().toByte)
      contract(s"$label/noise$i", body)(decode(body))
      val withMagic = valid.take(2 + rnd.nextInt(math.min(16, valid.length - 2))) ++ body
      contract(s"$label/magic$i", withMagic)(decode(withMagic))
    }
  }

  test("ImageCodec.decode: all fuzzed BMP/PPM inputs decode or throw IAE") {
    val rnd = new Random(4242)
    fuzzArtifact("bmp", ImageCodec.encodeBmp(image(rnd, 9, 7)), 1L)(ImageCodec.decode)
    fuzzArtifact("ppm", ImageCodec.encodePpm(image(rnd, 6, 5)), 2L)(ImageCodec.decode)
  }

  test("PPM stream demux + frame count: fuzzed streams decode or throw IAE") {
    val rnd = new Random(77)
    val stream = (1 to 3).flatMap(i => ImageCodec.encodePpm(image(rnd, 3 + i, 2 + i))).toArray
    fuzzArtifact("ppm-stream", stream, 3L)(ImageCodec.decodePpmStream)
    fuzzArtifact("ppm-count", stream, 4L)(ImageCodec.countPpmFrames)
  }

  test("WavCodec.decode: all fuzzed WAV inputs decode or throw IAE") {
    val rnd = new Random(99)
    fuzzArtifact("wav", wav(rnd, 120), 5L)(WavCodec.decode)
  }

  test("over-long PPM digit runs fail with the positional overflow message") {
    // 11 digits overflow Int: the pre-fix readInt went through
    // String.toInt, whose NumberFormatException (an IAE subclass)
    // carried no offset/field context — pin the bounded-parse message
    val e1 = intercept[IllegalArgumentException](
      ImageCodec.decodePpm("P6\n99999999999 1\n255\n".getBytes ++ Array.fill(3)(0.toByte)))
    assert(e1.getMessage.contains("width value overflows"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      ImageCodec.decodePpm("P6\n1 99999999999\n255\n".getBytes ++ Array.fill(3)(0.toByte)))
    assert(e2.getMessage.contains("height value overflows"), e2.getMessage)
  }
}
