package graft.media

import graft.SparkSpec
import java.nio.{ByteBuffer, ByteOrder}
import scala.util.Random

/** Real-codec contract: roundtrip identity, foreign-chunk tolerance,
  * loud failure on malformed/unsupported streams, and end-to-end
  * decoded features matching a driver-side reference. */
class WavCodecSpec extends SparkSpec {
  import spark.implicits._

  test("encode/decode roundtrip preserves samples and rate") {
    val rnd = new Random(11)
    for (_ <- 1 to 20) {
      val n = rnd.nextInt(2000)
      val rate = 8000 + rnd.nextInt(40000)
      val samples = Array.fill(n)(rnd.nextInt(65536).toShort)
      val wav = WavCodec.decode(WavCodec.encode(samples, rate))
      assert(wav.sampleRate == rate)
      assert(wav.samples.toSeq == samples.toSeq)
    }
  }

  test("decoder skips foreign chunks (LIST before data)") {
    val samples = Array.tabulate(100)(i => (i * 3 - 150).toShort)
    val plain = WavCodec.encode(samples, 16000)
    // splice a LIST chunk between fmt and data (odd size → padded)
    val listBody = "INFOsoftware graft".getBytes("US-ASCII") // 18 bytes
    val spliced = ByteBuffer.allocate(plain.length + 8 + listBody.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    spliced.put(plain, 0, 36)                        // RIFF…fmt chunk end
    spliced.put("LIST".getBytes("US-ASCII")).putInt(listBody.length).put(listBody)
    spliced.put(plain, 36, plain.length - 36)        // data chunk
    val wav = WavCodec.decode(spliced.array())
    assert(wav.sampleRate == 16000 && wav.samples.toSeq == samples.toSeq)
  }

  test("decoder walks past an odd-sized fmt chunk via the RIFF pad byte") {
    val samples = Array.tabulate(40)(i => (i * 7 - 140).toShort)
    val plain = WavCodec.encode(samples, 8000)
    // rebuild with fmt size 17 (spec-legal): the 16 canonical bytes +
    // 1 extension byte counted in the size + 1 alignment pad NOT
    // counted — a skip of exactly `size` desyncs every later chunk
    val out = ByteBuffer.allocate(plain.length + 2).order(ByteOrder.LITTLE_ENDIAN)
    out.put(plain, 0, 16)                 // RIFF hdr + WAVE + "fmt "
    out.putInt(17)                        // odd declared fmt size
    out.put(plain, 20, 16)                // the 16 canonical fmt fields
    out.put(0x7f.toByte)                  // extension byte (in size)
    out.put(0.toByte)                     // word-alignment pad (not in size)
    out.put(plain, 36, plain.length - 36) // data chunk onward
    val wav = WavCodec.decode(out.array())
    assert(wav.sampleRate == 8000 && wav.samples.toSeq == samples.toSeq)
  }

  test("decoder fails loudly on garbage, truncation, stereo, and odd data chunks") {
    intercept[IllegalArgumentException](WavCodec.decode("not a wav at all".getBytes))
    val ok = WavCodec.encode(Array.tabulate(50)(_.toShort), 8000)
    intercept[IllegalArgumentException](WavCodec.decode(ok.dropRight(7)))
    val stereo = ok.clone()
    stereo(22) = 2 // channels field
    intercept[IllegalArgumentException](WavCodec.decode(stereo))
    // odd-sized 16-bit data chunk = corrupt; must not silently floor
    val odd = ByteBuffer.allocate(44 + 101).order(ByteOrder.LITTLE_ENDIAN)
      .put(ok, 0, 40).putInt(101).put(ok, 44, 100).put(0.toByte).array()
    val ex = intercept[IllegalArgumentException](WavCodec.decode(odd))
    assert(ex.getMessage.contains("odd 16-bit data chunk"))
  }

  test("decoder rejects data-before-fmt and duplicate data chunks with clear messages") {
    val ok = WavCodec.encode(Array.tabulate(8)(_.toShort), 8000)
    // move the data chunk ahead of fmt: RIFF/WAVE header + data + fmt
    val reordered = ByteBuffer.allocate(ok.length).order(ByteOrder.LITTLE_ENDIAN)
      .put(ok, 0, 12).put(ok, 36, ok.length - 36).put(ok, 12, 24).array()
    val ex1 = intercept[IllegalArgumentException](WavCodec.decode(reordered))
    assert(ex1.getMessage.contains("data chunk before fmt"))
    // duplicate data chunk: last-one-wins would silently mask corruption
    val doubled = ByteBuffer.allocate(ok.length + (ok.length - 36))
      .order(ByteOrder.LITTLE_ENDIAN)
      .put(ok).put(ok, 36, ok.length - 36).array()
    val ex2 = intercept[IllegalArgumentException](WavCodec.decode(doubled))
    assert(ex2.getMessage.contains("second data chunk"))
  }

  test("audioSegments: integer activity gate + island collapse match a driver reference") {
    val docs = Seq((3L, "x"), (10L, "y"), (131L, "z"), (77L, "w")).toDF("doc_id", "text")
    val got = MediaOps.audioSegments(MediaOps.synthWavCorpus(docs), frameLen = 64)
      .collect().groupBy(_.media_id)
    Seq(3L, 10L, 77L, 131L).foreach { id =>
      val n = 256 + (id % 128).toInt
      val amps = (0 until n).map(i => (i.toLong * (id + 7)) % 2048 - 1024)
      val energies = amps.grouped(64).map(_.map(a => a * a).sum).toVector
      val nf = energies.size
      val total = energies.sum
      // driver-side reference: gate then collapse runs of active frames
      val active = energies.zipWithIndex.filter { case (e, _) => nf * e >= total }.map(_._2)
      val runs = active.foldLeft(Vector.empty[Vector[Int]]) {
        case (acc, f) if acc.nonEmpty && acc.last.last == f - 1 => acc.init :+ (acc.last :+ f)
        case (acc, f) => acc :+ Vector(f)
      }
      val expect = runs.zipWithIndex.map { case (r, i) =>
        (i.toLong, r.head.toLong, r.last.toLong, r.size.toLong, r.map(energies(_)).sum)
      }
      val have = got.getOrElse(id, Array.empty).sortBy(_.seg_id)
        .map(s => (s.seg_id, s.f_start, s.f_end, s.n_frames, s.energy)).toSeq
      assert(have == expect, s"id=$id energies=$energies")
      assert(have.nonEmpty, s"id=$id produced no segments")
    }
  }

  test("audioSegments rejects a non-positive frame length") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      MediaOps.audioSegments(MediaOps.synthWavCorpus(docs), frameLen = 0))
  }

  test("audioSegments: digital silence yields ZERO segments, not 100% activity") {
    // all-zero samples made every frame pass the 0 >= 0 gate — a
    // silent recording reported as fully voice-active (r13 review)
    import MediaOps.{MediaMeta, MediaRow}
    val silent = Seq(MediaRow(1L, MediaMeta("audio", 0, 0, 0L),
      WavCodec.encode(Array.fill(300)(0.toShort), 8000))).toDS()
    assert(MediaOps.audioSegments(silent, frameLen = 64).collect().isEmpty)
  }

  test("a present-but-invalid fmt chunk (sample rate 0) fails with the RATE message, not 'no fmt chunk'") {
    val good = WavCodec.encode(Array.fill(16)(5.toShort), 8000)
    // sampleRate is the int at offset 12 (RIFF) + 8 (fmt hdr) + 4 = 24
    val bad = good.clone()
    val bb = java.nio.ByteBuffer.wrap(bad).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(24, 0)
    val e = intercept[IllegalArgumentException](WavCodec.decode(bad))
    assert(e.getMessage.contains("sample rate"),
      s"triage must name the invalid field, got: ${e.getMessage}")
  }

  test("audioFeatures over real WAV bytes match the synthesis formula") {
    val docs = Seq((3L, "x"), (10L, "y"), (131L, "z")).toDF("doc_id", "text")
    val got = MediaOps.audioFeatures(MediaOps.synthWavCorpus(docs)).collect()
      .map(f => f.media_id -> f).toMap
    Seq(3L, 10L, 131L).foreach { id =>
      val n = 256 + (id % 128).toInt
      val amps = (0 until n).map(i => (i.toLong * (id + 7)) % 2048 - 1024)
      val f = got(id)
      assert(f.sample_rate == 8000 + (id % 5) * 1000)
      assert(f.n_samples == n)
      assert(f.mean_amp == amps.sum.toDouble / n)
      assert(f.rms == math.sqrt(amps.map(a => a * a).sum.toDouble / n))
      assert(f.peak == amps.map(math.abs).max)
      assert(f.n_zero_cross ==
        amps.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0)))
    }
  }
}
