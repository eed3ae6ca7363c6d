package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (builder prompt: image/audio/video as opaque
  * binary columns with typed metadata; decode/feature-extract/frame-sample
  * as partition-wise operators).
  *
  * The image/audio codecs are NOT in this container, so the decode step is
  * a clearly-marked deterministic FAKE (byte histogram over the payload) —
  * but everything Spark-side is real: the binary+metadata schema, the
  * `Dataset[T]` encoders, the mapPartitions batch shape (one decoder
  * instantiation per partition, streaming iterator, no per-row setup), and
  * the partition-preserving narrow execution. Swapping [[FakeCodec]] for a
  * JNI/codec-backed implementation changes no plan shape.
  *
  * Scale posture: decode is a narrow per-partition map — no shuffle; the
  * expensive payload column is projected away immediately after feature
  * extraction so downstream stages never carry the bytes.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata, the schema a 100 TB
    * multimodal lake would carry (payload in parquet binary / out-of-line
    * object store, metadata queryable). */
  case class MediaRow(
      doc_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, format: String)

  case class MediaFeatures(
      doc_id: Long, kind: String, n_bytes: Long, features: Array[Float])

  case class Frame(doc_id: Long, frame_no: Int, offset_bytes: Long,
      frame_bytes: Array[Byte])

  /** Deterministic stand-in for the real decoder. REAL decode would parse
    * payload with an image/audio library; this fake is stable,
    * content-sensitive, and cheap — good enough to drive the plumbing and
    * its tests. */
  private[multimodal] object FakeCodec {
    val FeatureDim = 16

    /** "Decode" = normalized 16-bucket byte histogram. */
    def features(payload: Array[Byte]): Array[Float] = {
      val counts = new Array[Int](FeatureDim)
      var i = 0
      while (i < payload.length) {
        counts((payload(i) & 0xff) % FeatureDim) += 1
        i += 1
      }
      val n = math.max(payload.length, 1).toFloat
      counts.map(_ / n)
    }

    /** "Resize" = stride-decimate the payload bytes by the scale factor
      * (a real image library would resample pixels; the contract — payload
      * in, smaller payload + updated dimensions out — is identical). */
    def resize(payload: Array[Byte], scale: Int): Array[Byte] = {
      val out = new Array[Byte]((payload.length + scale - 1) / scale)
      var i = 0
      while (i < out.length) { out(i) = payload(i * scale); i += 1 }
      out
    }

    /** "Frame-sample" = fixed-stride byte windows (a video decoder would
      * seek to keyframes; the batch shape — one row in, k rows out — is
      * identical). */
    def sampleFrames(doc: Long, payload: Array[Byte], every: Int,
        frameLen: Int): Iterator[Frame] =
      Iterator.range(0, payload.length, every).zipWithIndex.map {
        case (off, no) =>
          Frame(doc, no, off.toLong,
            payload.slice(off, math.min(off + frameLen, payload.length)))
      }
  }

  /** Derive a deterministic media table from `documents`: the UTF-8 text
    * bytes stand in for an encoded payload; kind/format/dimensions are
    * metadata derived from doc attributes. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "wav")
          .otherwise("mp4").as("format"))
      .as[MediaRow]
  }

  /** Decode + feature-extract, partition-wise. The iterator is streamed —
    * constant memory per partition regardless of partition size. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup would construct the real codec here, once
      rows.map { r =>
        MediaFeatures(r.doc_id, r.kind, r.payload.length.toLong,
          FakeCodec.features(r.payload))
      }
    }
  }

  /** Resize the image rows by an integer scale factor, partition-wise:
    * payload shrinks, width/height metadata update together — the
    * payload-in/payload-out narrow-map shape a real resampler plugs into.
    * Non-image rows pass through untouched. */
  def resizeImages(media: Dataset[MediaRow], scale: Int = 2): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(scale >= 1, s"scale must be >= 1, got $scale")
    media.mapPartitions { rows =>
      // per-partition setup would construct the real resampler here, once
      rows.map { r =>
        if (r.kind != "image") r
        else r.copy(
          payload = FakeCodec.resize(r.payload, scale),
          width = (r.width + scale - 1) / scale,
          height = (r.height + scale - 1) / scale)
      }
    }
  }

  /** Frame-sample the video rows: 1 row → k frame rows (flatMap batch
    * shape), payload column dropped from the output rows' parents. */
  def sampleVideoFrames(media: Dataset[MediaRow], every: Int = 64,
      frameLen: Int = 16): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { rows =>
      rows.flatMap(r => FakeCodec.sampleFrames(r.doc_id, r.payload,
        every, frameLen))
    }
  }

  /** Queryable feature summary (what a downstream training pipeline would
    * read): per kind, asset counts, payload volume, total histogram-
    * bucket-0 bytes. Demonstrates metadata-only pruning: the summary never
    * re-reads payloads once features exist.
    *
    * `bucket0_bytes` recovers the exact integer byte count from the
    * float32 feature: f = c/n with c ≤ payload length ≪ 2²³, so
    * round(f·n) is exactly c — integer output is comparator-stable where
    * a float mean is ulp-fragile between engines. */
  def featureSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaTable(spark, dir)).toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(round(element_at(col("features"), 1) * col("n_bytes"))
          .cast("long")).as("bucket0_bytes"))
      .orderBy(col("kind"))
  }

  /** DuckDB oracle for [[featureSummary]]. The fake decode buckets PAYLOAD
    * BYTES by value % 16; the corpus is ASCII (verified: a–z + space at
    * every sf), so byte counts equal character counts and bucket 0 is the
    * occurrence total of the ASCII chars whose code ≡ 0 (mod 16) — listed
    * exhaustively below so digits/uppercase would still be counted. A
    * non-ASCII corpus would need a byte-level oracle instead. */
  val oracle: Map[String, String] = Map(
    "q72_media_feature_summary" -> {
      val bucket0Chars = Seq(" ", "0", "@", "P", "`", "p")
      val b0 = bucket0Chars
        .map(c => s"(length(text) - length(replace(text, '$c', '')))")
        .mkString(" + ")
      s"""WITH f AS (
         |  SELECT
         |    CASE WHEN doc_id % 3 = 0 THEN 'image'
         |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
         |    length(text) AS n_bytes,
         |    $b0 AS b0
         |  FROM documents)
         |SELECT kind, count(*) AS n_assets,
         |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
         |  CAST(sum(b0) AS BIGINT) AS bucket0_bytes
         |FROM f GROUP BY kind ORDER BY kind""".stripMargin
    })
}
