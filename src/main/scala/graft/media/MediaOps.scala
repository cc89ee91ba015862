package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side contract (schema, partition-parallel batch shape,
  * stage signatures) is real and tested; the *codec* itself is a
  * pluggable [[Decoder]] — this container ships no image/audio libs,
  * so the default is [[StubDecoder]], a clearly-marked deterministic
  * fake that derives "pixels" from the byte stream. Swapping in a
  * real JNI/javacv decoder changes one constructor argument and no
  * plan shape.
  *
  * Scale notes: media bytes never pass through a shuffle — decode /
  * featurize are narrow `mapPartitions` stages; only the (tiny)
  * feature vectors and metadata flow onward to joins/aggregations.
  * Read with `spark.read.format("binaryFile")` at ingest, or as a
  * parquet `binary` column as here.
  */
object MediaOps {

  /** Typed metadata carried beside the payload. */
  case class MediaMeta(kind: String, width: Int, height: Int, durationMs: Long)
  case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           mean_byte: Double, features: Seq[Double])
  case class Frame(media_id: Long, frame_idx: Int, frame_ts_ms: Long, payload: Array[Byte])

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("durationMs", LongType))), nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Decode + featurize one payload. Real implementations wrap an
    * image/audio library; must be deterministic for a given byte
    * stream. */
  trait Decoder extends Serializable {
    def features(meta: MediaMeta, payload: Array[Byte], dim: Int): Seq[Double]
  }

  /** STUB: deterministic fake decode — banded byte means standing in
    * for pixel statistics. Replace with a real codec in production;
    * everything downstream (schema, partitioning, batch shape) is
    * identical. */
  case object StubDecoder extends Decoder {
    def features(meta: MediaMeta, payload: Array[Byte], dim: Int): Seq[Double] = {
      val n = payload.length
      (0 until dim).map { d =>
        val from = n.toLong * d / dim
        val until = n.toLong * (d + 1) / dim
        if (until == from) 0.0
        else {
          var s = 0.0
          var i = from.toInt
          while (i < until) { s += (payload(i) & 0xff); i += 1 }
          s / (until - from)
        }
      }
    }
  }

  /** Deterministic media corpus derived from a text table: payload =
    * UTF-8 bytes of `text`, keyed by `doc_id`. This is the
    * oracle-checkable test harness for the media pipeline — the
    * features any engine computes over the same bytes must agree, so
    * the driver's DuckDB compare can vouch for the plumbing
    * (`q_media_features`) even while the production decoder is
    * stubbed. */
  def mediaFromDocuments(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        MediaRow(id, MediaMeta("text", 0, 0, 0L),
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
  }

  /** Partition-parallel feature extraction: the media analogue of a
    * vectorized batch UDF — rows stream through each partition once,
    * payloads are dropped on the way out. */
  def featurize(media: Dataset[MediaRow], decoder: Decoder = StubDecoder,
                dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val f = decoder.features(m.meta, m.payload, dim)
      val mean = if (m.payload.isEmpty) 0.0
                 else m.payload.map(b => (b & 0xff).toDouble).sum / m.payload.length
      MediaFeatures(m.media_id, m.meta.kind, m.payload.length.toLong, mean, f)
    })
  }

  /** Decoded-audio features. All fields are closed-form functions of
    * the PCM samples, so an oracle that knows the synthesis formula
    * can check the WHOLE decode path (header walk, LE sample parse,
    * feature math) end to end. `rms` stays unrounded: integer sums,
    * one division, and an IEEE-correctly-rounded sqrt are
    * bit-identical on any conforming engine. */
  case class AudioFeatures(media_id: Long, sample_rate: Long, n_samples: Long,
                           mean_amp: Double, rms: Double, peak: Long,
                           n_zero_cross: Long)

  /** Deterministic audio corpus: per document, a sawtooth-ish PCM-16
    * signal `amp_i = (i·(doc_id+7)) mod 2048 − 1024` of
    * `256 + doc_id mod 128` samples at `8000 + (doc_id mod 5)·1000`
    * Hz, ENCODED TO REAL WAV BYTES. Downstream stages see only the
    * binary payload — they must actually parse it. */
  def synthWavCorpus(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].map { id =>
      val n = 256 + (id % 128).toInt
      val rate = 8000 + (id % 5).toInt * 1000
      val samples = Array.tabulate(n)(i => ((i.toLong * (id + 7)) % 2048 - 1024).toShort)
      MediaRow(id, MediaMeta("audio", 0, 0, n * 1000L / rate),
        WavCodec.encode(samples, rate))
    }
  }

  /** Real audio decode + feature extraction: RIFF/WAVE parse per row
    * inside `mapPartitions` (payloads never shuffle), emitting the
    * narrow feature row. This is the non-stub media path — the same
    * stage shape [[featurize]] uses, with [[WavCodec]] in place of
    * the pluggable pixel decoder. */
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val wav = WavCodec.decode(m.payload)
      val s = wav.samples
      val n = s.length
      var sum = 0L; var sumSq = 0L; var peak = 0L; var zc = 0L
      var i = 0
      while (i < n) {
        val v = s(i).toLong
        sum += v; sumSq += v * v
        if (math.abs(v) > peak) peak = math.abs(v)
        if (i > 0 && ((v >= 0) != (s(i - 1) >= 0))) zc += 1
        i += 1
      }
      AudioFeatures(m.media_id, wav.sampleRate.toLong, n.toLong,
        if (n == 0) 0.0 else sum.toDouble / n,
        if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n),
        peak, zc)
    })
  }

  /** Video frame sampling: 1 row → N frame rows at a fixed stride.
    * The per-frame payload slice is a stub (real impl: demux +
    * decode); cardinality, ordinals, and timestamps are the real
    * contract. */
  def sampleFrames(media: Dataset[MediaRow], strideMs: Long): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val n = math.max(1L, m.meta.durationMs / strideMs).toInt
      (0 until n).map { i =>
        val ts = i * strideMs
        // STUB frame payload: deterministic slice standing in for a decoded frame
        val sliceLen = math.max(1, m.payload.length / n)
        val from = math.min(i * sliceLen, math.max(0, m.payload.length - 1))
        val until = math.min(from + sliceLen, m.payload.length)
        Frame(m.media_id, i, ts, m.payload.slice(from, until))
      }
    }
  }

  /** "Resize": re-bucket the stub feature vector to a new dimension —
    * exercises the downstream reshape contract without a pixel codec. */
  def resizeFeatures(features: Dataset[MediaFeatures], newDim: Int): Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    features.map { f =>
      val src = f.features
      val out = (0 until newDim).map { d =>
        val from = src.size * d / newDim
        val until = math.max(from + 1, src.size * (d + 1) / newDim)
        src.slice(from, until).sum / (until - from)
      }
      f.copy(features = out)
    }
  }
}
