package graft.media

import graft.SparkSpec
import MediaOps._

/** Multimodal plumbing: schema, deterministic stub decode, frame
  * fan-out cardinality, resize reshape.
  */
class MediaSpec extends SparkSpec {
  import spark.implicits._

  private def row(id: Long, kind: String, nBytes: Int, durMs: Long) =
    MediaRow(id, MediaMeta(kind, 64, 48, durMs),
      Array.tabulate(nBytes)(i => ((i * 31 + id) % 251).toByte))

  test("featurize: partition-parallel stub decode is deterministic") {
    val media = Seq(row(1, "image", 4096, 0), row(2, "audio", 1024, 5000)).toDS()
    val f1 = featurize(media).collect().sortBy(_.media_id)
    val f2 = featurize(media).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(_.features.size == 8))
    assert(f1.head.n_bytes == 4096L)
    assert(f1.forall(f => f.mean_byte >= 0 && f.mean_byte <= 255))
  }

  test("sampleFrames: 1 video -> N frames at stride") {
    val media = Seq(row(5, "video", 10000, 10000)).toDS()
    val frames = sampleFrames(media, strideMs = 1000).collect().sortBy(_.frame_idx)
    assert(frames.length == 10)
    assert(frames.map(_.frame_idx).toSeq == (0 until 10))
    assert(frames.map(_.frame_ts_ms).toSeq == (0 until 10).map(_ * 1000L))
    assert(frames.forall(_.payload.nonEmpty))
  }

  test("resizeFeatures reshapes to the requested dimension") {
    val media = Seq(row(1, "image", 4096, 0)).toDS()
    val resized = resizeFeatures(featurize(media, dim = 8), newDim = 4).collect().head
    assert(resized.features.size == 4)
  }

  test("MediaSchema round-trips through a DataFrame") {
    val media = Seq(row(7, "image", 128, 0)).toDS().toDF()
    assert(media.schema("payload").dataType.typeName == "binary")
    val back = media.as[MediaRow].collect().head
    assert(back.media_id == 7L && back.payload.length == 128)
  }
}
