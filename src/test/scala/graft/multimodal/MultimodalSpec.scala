package graft.multimodal

import graft.SparkSpec

/** The multimodal plumbing must be real even though the codec is faked:
  * schema/encoders round-trip, batch shapes hold, outputs deterministic.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaTable(spark, sfDir)

  test("media table carries binary payloads with typed metadata") {
    val row = media.filter(_.doc_id == 0L).head()
    assert(row.kind == "image" && row.format == "png")
    assert(row.payload.nonEmpty)
    assert(new String(row.payload, "UTF-8").nonEmpty) // round-trips
  }

  test("feature extraction is deterministic and fixed-dimension") {
    val a = Multimodal.extractFeatures(media).collect()
      .map(f => f.doc_id -> f.features.toSeq).toMap
    val b = Multimodal.extractFeatures(media).collect()
      .map(f => f.doc_id -> f.features.toSeq).toMap
    assert(a == b)
    assert(a.values.forall(_.length == 16))
    // histogram is a probability vector
    a.values.foreach(f => assert(math.abs(f.sum - 1.0f) < 1e-3))
  }

  test("feature extraction is a narrow map: partitioning preserved") {
    val parts = media.repartition(5)
    val out = Multimodal.extractFeatures(parts)
    assert(out.rdd.getNumPartitions == 5)
    assert(out.count() == media.count())
  }

  test("frame sampling fans one video row out to its stride count") {
    val videos = media.filter(_.kind == "video").collect()
    val frames = Multimodal.sampleVideoFrames(media, every = 64,
      frameLen = 16).collect()
    val expected = videos.map(v =>
      (v.payload.length + 63) / 64).sum
    assert(frames.length == expected)
    assert(frames.forall(_.frame_bytes.length <= 16))
    // offsets are the stride grid
    frames.groupBy(_.doc_id).values.foreach { fs =>
      assert(fs.sortBy(_.frame_no).zipWithIndex.forall {
        case (f, i) => f.frame_no == i && f.offset_bytes == i * 64L
      })
    }
  }

  test("feature summary aggregates without re-reading payloads") {
    val sum = Multimodal.featureSummary(spark, sfDir).collect()
    assert(sum.map(_.getString(0)).toSet == Set("image", "audio", "video"))
    assert(sum.map(_.getLong(1)).sum == media.count())
  }
}
