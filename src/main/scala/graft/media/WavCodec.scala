package graft.media

import java.nio.{ByteBuffer, ByteOrder}

/** RIFF/WAVE PCM-16 mono codec — a REAL media decoder (not a stub):
  * canonical 44-byte header writer and a chunk-walking reader that
  * tolerates extra chunks (LIST/fact) the way real-world WAV files
  * carry them. Pure JVM byte twiddling, no codec libraries — which is
  * exactly why this format gets the real treatment while image/video
  * stay behind the [[MediaOps.Decoder]] seam.
  *
  * The executor-side contract mirrors every other codec in the repo
  * (POSCAR, JDFTx): encode/decode are deterministic pure functions on
  * byte arrays, so they run inside `mapPartitions` with no driver
  * involvement and no shuffle of payload bytes.
  */
object WavCodec {

  final case class Wav(sampleRate: Int, samples: Array[Short])

  /** Canonical 44-byte-header PCM-16LE mono WAV. */
  def encode(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    require(sampleRate > 0, s"sampleRate must be positive, got $sampleRate")
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1)                       // PCM
    buf.putShort(1)                       // mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2)            // byte rate
    buf.putShort(2)                       // block align
    buf.putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Chunk-walking decode. Throws IllegalArgumentException on
    * non-WAV bytes, compressed/stereo/non-16-bit streams, or a
    * truncated data chunk — a decode stage must fail loudly, not
    * fabricate samples. */
  def decode(bytes: Array[Byte]): Wav = {
    require(bytes.length >= 12, s"not a RIFF file: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    buf.get(magic)
    require(new String(magic, "US-ASCII") == "RIFF", "missing RIFF magic")
    buf.getInt // declared riff size; real files lie, walk chunks instead
    buf.get(magic)
    require(new String(magic, "US-ASCII") == "WAVE", "missing WAVE form type")

    var sampleRate = -1
    var bitsPerSample = -1
    var channels = -1
    var audioFormat = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8) {
      buf.get(magic)
      val id = new String(magic, "US-ASCII")
      val size = buf.getInt
      require(size >= 0 && size <= buf.remaining(), s"truncated chunk $id ($size bytes)")
      id match {
        case "fmt " =>
          // the 16 format-field bytes below must actually BELONG to
          // this chunk: an undersized declared size would read past
          // the chunk boundary into the next chunk's header (garbage
          // misparse) or off the buffer (BufferUnderflowException
          // instead of the documented IllegalArgumentException)
          require(size >= 16, s"fmt chunk too small ($size bytes, need 16)")
          val fmtStart = buf.position()
          audioFormat = buf.getShort
          channels = buf.getShort
          sampleRate = buf.getInt
          // validated HERE, where the field is parsed: deferring to
          // the post-loop "no fmt chunk before data" require would
          // misdiagnose a PRESENT-but-invalid fmt chunk as missing —
          // wrong triage signal for a quarantine feed (r13 review)
          require(sampleRate > 0, s"fmt chunk declares sample rate $sampleRate")
          buf.getInt; buf.getShort // byte rate, block align
          bitsPerSample = buf.getShort
          // word-alignment pad EXACTLY like the generic skip below: an
          // odd-sized fmt chunk (spec-legal) carries a pad byte, and
          // skipping to fmtStart + size alone would desync the walk by
          // one byte — every later chunk id/size read becomes garbage
          skipPadded(buf, fmtStart, size)
        case "data" =>
          require(audioFormat != -1, "data chunk before fmt chunk")
          require(samples == null, "second data chunk (multi-data WAV is malformed)")
          require(audioFormat == 1, s"not PCM (format $audioFormat)")
          require(channels == 1, s"expected mono, got $channels channels")
          require(bitsPerSample == 16, s"expected 16-bit, got $bitsPerSample")
          // a valid 16-bit PCM data chunk is always even; odd means
          // corrupt — fail loudly rather than silently dropping the
          // trailing byte and desyncing the chunk walk
          require(size % 2 == 0, s"odd 16-bit data chunk ($size bytes)")
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort; i += 1 }
        case _ => // LIST, fact, cue … skip
          skipPadded(buf, buf.position(), size)
      }
    }
    require(samples != null, "no data chunk")
    require(sampleRate > 0, "no fmt chunk before data")
    Wav(sampleRate, samples)
  }

  /** Advance past a chunk of `size` bytes starting at `start`,
    * including the RIFF word-alignment pad byte after an odd size.
    * Clamped to the buffer end: a valid file whose LAST chunk is
    * odd-sized may legally omit the trailing pad. */
  private def skipPadded(buf: ByteBuffer, start: Int, size: Int): Unit =
    buf.position(math.min(start + size + (size & 1), buf.limit()))
}
