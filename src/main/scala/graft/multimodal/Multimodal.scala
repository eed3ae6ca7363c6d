package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (builder prompt: image/audio/video as opaque
  * binary columns with typed metadata; decode/feature-extract/frame-sample
  * as partition-wise operators).
  *
  * The decode step runs behind the [[Multimodal.SignalDecoder]] trait
  * (payload → raw signal): the shipped queries use [[Multimodal.FakeDecoder]]
  * (identity — the container has no codec libraries and the DuckDB oracle
  * must be able to recompute every hash), while [[Multimodal.PpmDecoder]]
  * (binary P6 PPM → Rec.601 luminance) and [[Multimodal.WavPcmDecoder]]
  * (RIFF/WAVE 16-bit PCM → 8-bit samples) are REAL zero-dependency
  * public-format parsers proving the boundary: MultimodalSpec drives the
  * same hash/fingerprint pipeline through both and round-trips crafted
  * assets. Everything Spark-side is real either way: the binary+metadata
  * schema, the `Dataset[T]` encoders, the mapPartitions batch shape (one
  * decoder instantiation per partition, streaming iterator, no per-row
  * setup), and the partition-preserving narrow execution. Swapping in a
  * JNI/codec-backed decoder changes no plan shape.
  *
  * Scale posture: decode is a narrow per-partition map — no shuffle; the
  * expensive payload column is projected away immediately after feature
  * extraction so downstream stages never carry the bytes.
  */
// Serializable: the mapPartitions closures now live in the family
// traits, where the compiler lifts them to instance methods invoked
// through the module's `this` — the closure ships a reference to this
// (stateless, constants-only) singleton, restored by readResolve.
object Multimodal extends MediaBands
    with MediaDedup
    with MediaFingerprints
    with MediaIngest
    with Serializable {

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

  /** THE DECODE BOUNDARY (VERDICT r9 "Next round" #3): payload bytes →
    * the modality's raw SIGNAL — row-major luminance samples for an
    * image, PCM sample bytes for audio, the demuxed byte stream frames
    * are sliced from for video. Everything downstream (dHash windows,
    * band-energy fingerprints, frame slicing, banding, containment) is
    * pure integer arithmetic over the signal and NEVER sees the encoded
    * payload, so swapping decoders is compiler-checked to change only
    * the decode step.
    *
    * Contract: a malformed payload returns an EMPTY signal — a corrupt
    * asset must degrade to a null hash / no fingerprints, never kill a
    * 100 TB job (dHash of empty = 0, fingerprints of empty = none —
    * both deterministic).
    *
    * Instances: [[FakeDecoder]] (identity — the deterministic stand-in
    * the oracle reproduces; the container ships no codec libraries),
    * [[PpmDecoder]] (a REAL public-format image parser: binary P6 PPM →
    * integer Rec.601 luminance), [[WavPcmDecoder]] (a REAL RIFF/WAVE
    * PCM parser: 16-bit little-endian samples → unsigned bytes). Both
    * real parsers are header-parse-only, zero dependencies, and
    * round-trip-tested on crafted assets in MultimodalSpec. */
  trait SignalDecoder extends Serializable {
    def decode(payload: Array[Byte]): Array[Byte]
  }

  /** Identity decode: the payload bytes ARE the signal. This is the
    * deterministic fake the shipped queries (q109/q111/q118/q126/q128/
    * q130) run with so the DuckDB oracle can recompute every hash from
    * the text the payload encodes. */
  object FakeDecoder extends SignalDecoder {
    override def decode(payload: Array[Byte]): Array[Byte] = payload
  }

  /** Binary PPM (P6) image decode — netpbm's uncompressed public format:
    * `P6 <whitespace/comments> width height maxval` then width×height
    * RGB byte triplets. Signal = per-pixel integer Rec.601 luminance
    * (299·R + 587·G + 114·B) / 1000 — exactly the 8×8-grid input a real
    * dHash takes. Maxval > 255 (2-byte samples) and malformed headers
    * return the empty signal. */
  object PpmDecoder extends SignalDecoder {
    override def decode(payload: Array[Byte]): Array[Byte] = {
      var i = 0
      val n = payload.length
      def skipWs(): Unit = {
        var go = true
        while (go && i < n) {
          val c = payload(i)
          if (c == '#') { while (i < n && payload(i) != '\n') i += 1 }
          else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
          else go = false
        }
      }
      def int(): Int = {
        skipWs()
        var v = 0
        var any = false
        while (i < n && payload(i) >= '0' && payload(i) <= '9') {
          v = v * 10 + (payload(i) - '0'); i += 1; any = true
        }
        if (!any) -1 else v
      }
      if (n < 2 || payload(0) != 'P' || payload(1) != '6')
        return Array.empty
      i = 2
      val w = int(); val h = int(); val maxv = int()
      if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255 || i >= n)
        return Array.empty
      i += 1 // exactly ONE whitespace byte separates header and raster
      val pixels = w.toLong * h
      if (pixels > Int.MaxValue / 4 || n - i < pixels * 3) return Array.empty
      val out = new Array[Byte](pixels.toInt)
      var p = 0
      while (p < out.length) {
        val r = payload(i) & 0xff
        val g = payload(i + 1) & 0xff
        val b = payload(i + 2) & 0xff
        out(p) = ((299 * r + 587 * g + 114 * b) / 1000).toByte
        p += 1; i += 3
      }
      out
    }
  }

  /** RIFF/WAVE PCM audio decode — the canonical public wave format:
    * `RIFF <size> WAVE` then chunks; requires an `fmt ` chunk with
    * audio format 1 (integer PCM) and 16 bits per sample, then reads
    * the `data` chunk's little-endian int16 frames (first channel of
    * interleaved multi-channel audio). Signal = one unsigned byte per
    * frame, (sample >> 8) + 128 — the 8-bit downmix whose windows the
    * band-energy fingerprints aggregate. Malformed/compressed files
    * return the empty signal. */
  object WavPcmDecoder extends SignalDecoder {
    override def decode(payload: Array[Byte]): Array[Byte] = {
      val n = payload.length
      def tag(off: Int, s: String): Boolean =
        off + s.length <= n && s.indices.forall(k =>
          payload(off + k) == s.charAt(k).toByte)
      def le16(off: Int): Int =
        (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8)
      def le32(off: Int): Long =
        (payload(off) & 0xffL) | ((payload(off + 1) & 0xffL) << 8) |
          ((payload(off + 2) & 0xffL) << 16) |
          ((payload(off + 3) & 0xffL) << 24)
      if (n < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return Array.empty
      // Offset tracked as a Long: a corrupt/crafted chunk size near 2^31
      // (or the full unsigned 2^32-1) must advance past end-of-payload and
      // end the scan, never wrap negative into payload(negativeIndex).
      var i = 12L
      var channels = -1
      var dataOff = -1
      var dataLen = -1L
      while (i + 8 <= n && (channels < 0 || dataOff < 0)) {
        val io = i.toInt // safe: i + 8 <= n <= Int.MaxValue
        val sz = le32(io + 4)
        if (tag(io, "fmt ") && i + 8 + 16 <= n) {
          val fmt = le16(io + 8)
          channels = le16(io + 10)
          val bits = le16(io + 22)
          if (fmt != 1 || bits != 16 || channels < 1) return Array.empty
        } else if (tag(io, "data")) {
          dataOff = io + 8
          dataLen = math.min(sz, (n - dataOff).toLong)
        }
        i += 8L + sz + (sz & 1L) // word-aligned chunks; Long math, no wrap
      }
      if (channels < 1 || dataOff < 0) return Array.empty
      val frameBytes = 2 * channels
      val frames = (dataLen / frameBytes).toInt
      val out = new Array[Byte](frames)
      var f = 0
      while (f < frames) {
        val s = (le16(dataOff + f * frameBytes) << 16) >> 16 // sign-extend
        out(f) = ((s >> 8) + 128).toByte
        f += 1
      }
      out
    }
  }

  /** Deterministic stand-in for the real decoder. REAL decode would parse
    * payload with an image/audio library; this fake is stable,
    * content-sensitive, and cheap — good enough to drive the plumbing and
    * its tests. */
  private[graft] object FakeCodec {
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

    /** Perceptual hash, dHash-style (public: difference hash over a
      * resampled grayscale grid): the REAL pipeline decodes the payload
      * and compares adjacent cells of an 8×8 luminance grid; the fake
      * "decode" is 64 equal byte windows of the payload, bit i set iff
      * window i's mean byte value exceeds window i+1's. Comparisons are
      * cross-multiplied (sum_i·cnt_j > sum_j·cnt_i) so the hash is pure
      * integer arithmetic — bit-identical in the DuckDB oracle, which
      * recomputes it from the ASCII text the payload encodes. 63 bits
      * (64 windows → 63 adjacent comparisons) keep the hash positive in
      * a signed BIGINT in both engines. Empty windows (payload shorter
      * than 64 bytes) sum to 0 and compare false, deterministically. */
    def dHash(payload: Array[Byte]): Long = {
      val L = payload.length
      val sums = new Array[Long](64)
      val cnts = new Array[Long](64)
      var k = 0
      while (k < 64) {
        val start = k.toLong * L / 64
        val end = (k + 1).toLong * L / 64
        var i = start
        while (i < end) { sums(k) += payload(i.toInt) & 0xff; i += 1 }
        cnts(k) = end - start
        k += 1
      }
      var hash = 0L
      var b = 0
      while (b < 63) {
        if (sums(b) * cnts(b + 1) > sums(b + 1) * cnts(b))
          hash |= 1L << b
        b += 1
      }
      hash
    }

    /** Chromaprint-style audio sub-fingerprints (public: Chromaprint /
      * AcoustID's band-energy double-delta bits): the REAL pipeline
      * decodes PCM, windows it, and compares band-energy deltas across
      * adjacent windows; the fake "decode" reads the payload bytes as
      * samples. Per full 64-byte window at 32-byte stride: 16 exact
      * 4-byte band energies E[b]; bit b of the window's 15-bit
      * sub-fingerprint is set iff (E[b]−E[b+1]) rose versus the SAME
      * delta in the previous window (0 before the first) — time-delta of
      * band-delta, the shift-robust trick. Pure integer arithmetic,
      * bit-identical in the DuckDB oracle. Payloads under one window
      * yield no fingerprints (shortest corpus doc is 2 windows). */
    def audioFingerprints(payload: Array[Byte]): Array[Long] = {
      val L = payload.length
      if (L < 64) return Array.empty
      val n = (L - 64) / 32 + 1
      val out = new Array[Long](n)
      var prev: Array[Long] = null
      var t = 0
      while (t < n) {
        val e = new Array[Long](16)
        var b = 0
        while (b < 16) {
          var s = 0L
          var i = 0
          while (i < 4) { s += payload(t * 32 + b * 4 + i) & 0xff; i += 1 }
          e(b) = s
          b += 1
        }
        val dv = new Array[Long](15)
        var k = 0
        while (k < 15) { dv(k) = e(k) - e(k + 1); k += 1 }
        var fp = 0L
        k = 0
        while (k < 15) {
          if (dv(k) > (if (prev == null) 0L else prev(k))) fp |= 1L << k
          k += 1
        }
        out(t) = fp
        prev = dv
        t += 1
      }
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
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] =
    mediaTableOf(spark, Tables(spark, dir, "documents"))

  private[multimodal] def mediaTableOf(spark: SparkSession,
      docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs
      .select(col("doc_id"),
        kindExpr(col("doc_id")).as("kind"),
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
  def extractFeatures(media: Dataset[MediaRow],
      dec: SignalDecoder = FakeDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // the decoder instance is constructed once per partition here
      rows.map { r =>
        MediaFeatures(r.doc_id, r.kind, r.payload.length.toLong,
          FakeCodec.features(dec.decode(r.payload)))
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

  case class MediaHash(doc_id: Long, kind: String, phash: Long)

  /** The slim row the DECODE BOUNDARY actually consumes — id, kind, and
    * the opaque payload, nothing else. Streaming arrivals construct
    * this directly (they carry no decoded metadata); batch flows
    * project [[MediaRow]] down to it. */
  case class MediaPayload(doc_id: Long, kind: String,
      payload: Array[Byte])

  /** Asset-id offset for the deterministic re-encode variants below. */
  private[multimodal] val VariantIdOffset = 1000000000L

  /** The catalog's asset-KIND convention — doc_id mod 3 → image/audio/
    * video — as ONE definition with a Column and a SQL rendering, shared
    * by the media-table metadata, the paired-curation classifier, and
    * every oracle that states the rule (ADVICE r14: the rule was inlined
    * at three sites and a change would have drifted q195 silently). */
  private[graft] def kindExpr(id: Column): Column =
    when(id % 3 === 0, "image")
      .when(id % 3 === 1, "audio")
      .otherwise("video")

  private[graft] def kindSql(id: String): String =
    s"CASE WHEN $id % 3 = 0 THEN 'image' " +
      s"WHEN $id % 3 = 1 THEN 'audio' ELSE 'video' END"

  /** The q109 asset universe: every document's asset PLUS, for doc_id %
    * 5 = 0, a "re-encoded variant" whose payload differs in exactly its
    * first byte (+1) — the controlled stand-in for the crop/re-encode/
    * resize copies perceptual dedup exists to catch (the raw corpus has
    * no byte-identical assets at test SFs, so without variants the pair
    * query would be vacuous). A first-byte bump only perturbs window 0's
    * sum, so the variant's dHash differs in AT MOST bit 0 — every
    * variant is a guaranteed Hamming ≤ 1 near-dup of its original,
    * which the spec asserts. Text length is unchanged, so all metadata
    * carries over. */
  private[multimodal] def assetTable(spark: SparkSession,
      dir: String): Dataset[MediaRow] =
    mediaTableOf(spark, assetDocs(spark, dir))

  /** The q109 asset universe as a DOCUMENT frame (doc_id, text, lang,
    * source, n_chars) — originals plus the first-byte-bumped re-encode
    * variants. [[assetTable]] wraps it in media metadata; q130 scores
    * caption quality straight off the text. */
  private[graft] def assetDocs(spark: SparkSession, dir: String): DataFrame =
    assetDocsOf(Tables(spark, dir, "documents"))

  /** [[assetDocs]] over an EXPLICIT document universe — the release
    * flow's entry (ReleaseBuild derives the asset universe from its own
    * train-side docs, the kept_docs convention). */
  private[graft] def assetDocsOf(d: DataFrame): DataFrame = {
    val variants = d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + VariantIdOffset).as("doc_id"),
        concat(expr("char(ascii(substring(text, 1, 1)) + 1)"),
          expr("substring(text, 2)")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    d.select(variants.columns.map(col): _*).unionByName(variants)
  }

  /** Per-asset perceptual hashes, partition-wise (the decode step —
    * narrow map, payload dropped immediately after hashing). The
    * [[SignalDecoder]] turns the payload into luminance samples; dHash's
    * 64-window comparison runs over the SIGNAL, identical for the fake
    * and the real [[PpmDecoder]] (MultimodalSpec drives both). */
  def perceptualHashes(media: Dataset[MediaRow],
      dec: SignalDecoder = FakeDecoder): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    perceptualHashesOf(media.map(r =>
      MediaPayload(r.doc_id, r.kind, r.payload)), dec)
  }

  /** The payload-only decode core — [[MediaPayload]] is the WHOLE input
    * contract, so a future decoder cannot silently start reading
    * metadata a streaming row never carried (ADVICE r14: the continuous
    * asset cadence fabricated zeroed width/height/format; parity with
    * the nightly run held only because this boundary ignored them —
    * now that is structural, not incidental). */
  def perceptualHashesOf(media: Dataset[MediaPayload],
      dec: SignalDecoder = FakeDecoder): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // the decoder instance is constructed once per partition here
      rows.map(r =>
        MediaHash(r.doc_id, r.kind, FakeCodec.dHash(dec.decode(r.payload))))
    }
  }


  case class FrameHash(doc_id: Long, frame_no: Int, fhash: Long)

  case class AudioFp(doc_id: Long, win_no: Int, fp: Long)

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
  /** q109/q111 shared oracle: recomputes the byte-window dHash from the
    * ASCII text (byte k = char k+1 — same ASCII argument as q72) and
    * verifies via the full quadratic Hamming scan; banding is
    * pigeonhole-exact at MediaHammingMax < NumBands, so engine == scan
    * provably, and the incremental flow == the scan restricted to pairs
    * touching a batch asset. */
  private def mediaHashCtes: String =
    s"""t AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + $VariantIdOffset,
       |    chr(ascii(substr(text, 1, 1)) + 1) || substr(text, 2)
       |  FROM documents WHERE doc_id % 5 = 0),
       |codes AS (
       |  SELECT doc_id, length(text) AS L,
       |    list_transform(range(1, length(text) + 1),
       |      i -> ascii(substr(text, i, 1))) AS cs
       |  FROM t),
       |w AS (
       |  SELECT doc_id,
       |    list_transform(range(0, 64), k ->
       |      coalesce(list_sum(cs[(k * L // 64 + 1):(((k + 1) * L) // 64)]),
       |        0)) AS ws,
       |    list_transform(range(0, 64),
       |      k -> ((k + 1) * L) // 64 - (k * L) // 64) AS wc
       |  FROM codes),
       |h AS (
       |  SELECT doc_id, CAST(coalesce(list_sum(list_transform(range(0, 63),
       |    b -> CASE WHEN ws[b + 1] * wc[b + 2] > ws[b + 2] * wc[b + 1]
       |              THEN (CAST(1 AS BIGINT) << b)
       |              ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT) AS phash
       |  FROM w)""".stripMargin

  private def mediaPhashPairsSql(restrict: String): String =
    s"""WITH $mediaHashCtes
       |SELECT doc_a, doc_b, hamming FROM (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
       |  FROM h a, h b WHERE a.doc_id < b.doc_id)
       |WHERE hamming <= $MediaHammingMax
       |$restrict ORDER BY doc_a, doc_b""".stripMargin

  /** q130 oracle: the q109 hash CTEs, the q77/q88 recursive transitive
    * closure over the Hamming-pair graph, caption quality recomputed
    * over the asset universe's text (variants included), q88's
    * row_number election. */
  private def mediaClusterSurvivorsSql: String =
    mediaClusterSurvivorsSqlOf("")

  /** The q130 closure CHAIN (hash CTEs → pair graph → recursive reach
    * → comp → labels → caption quality → ranked election) as
    * composable CTEs — shared by q130/q180's survivor election and the
    * q195 paired-curation report's asset keep-list so all three price
    * one closure. */
  private def mediaClusterCtes: String =
    s"""$mediaHashCtes,
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM h a, h b WHERE a.doc_id < b.doc_id
       |    AND bit_count(xor(a.phash, b.phash)) <= $MediaHammingMax),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |comp AS (
       |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
       |  FROM reach GROUP BY src),
       |labels AS (
       |  SELECT doc_id, cluster_id,
       |    count(*) OVER (PARTITION BY cluster_id) AS cluster_size
       |  FROM comp),
       |quality AS (
       |  SELECT doc_id,
       |    round(least(1.0, CAST(len(w) AS DOUBLE) / 120.0) *
       |          (CAST(len(list_distinct(w)) AS DOUBLE) / len(w)), 6)
       |      AS quality
       |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS w
       |        FROM t)),
       |ranked AS (
       |  SELECT cluster_id, doc_id, quality, cluster_size,
       |    row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY quality DESC, doc_id) AS rn
       |  FROM labels JOIN quality USING (doc_id))""".stripMargin

  /** The q130 recursive-closure election with an optional restriction on
    * the final SELECT — shared by q130 (no restriction) and q180
    * (clusters holding a batch member) so the full pass and the
    * incremental maintenance oracle can never drift apart. */
  private def mediaClusterSurvivorsSqlOf(restrict: String): String =
    s"""WITH RECURSIVE $mediaClusterCtes
       |SELECT cluster_id, doc_id AS kept_id, quality, cluster_size
       |FROM ranked WHERE rn = 1
       |$restrict ORDER BY kept_id""".stripMargin

  /** The asset keep-list as SQL — [[keptAssetsOf]]'s rule over the
    * same closure chain: unclustered assets ∪ each cluster's elected
    * survivor. Nested by the q195 oracle. */
  private def keptAssetsSql: String =
    s"""WITH RECURSIVE $mediaClusterCtes
       |SELECT h.doc_id FROM h
       |WHERE h.doc_id NOT IN (SELECT doc_id FROM comp)
       |   OR h.doc_id IN (SELECT doc_id FROM ranked WHERE rn = 1)"""
      .stripMargin

  /** q118 oracle: recompute the frame slices and per-frame window dHash
    * from the ASCII text (frame k = [[FrameLen]] chars at offset
    * [[FrameEvery]]·k — byte j of a frame is its char j+1, the q109
    * argument), then the direct
    * containment-pair query with the same stop-frame cap. */
  private def frameNearDupsSql: String = frameNearDupsSqlOf("")

  private def frameNearDupsSqlOf(restrict: String): String =
    s"""WITH t AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + $VariantIdOffset,
       |    chr(ascii(substr(text, 1, 1)) + 1) || substr(text, 2)
       |  FROM documents WHERE doc_id % 5 = 0),
       |codes AS (
       |  SELECT doc_id, length(text) AS L,
       |    list_transform(range(1, length(text) + 1),
       |      i -> ascii(substr(text, i, 1))) AS cs
       |  FROM t),
       |frames AS (
       |  SELECT doc_id, k,
       |    cs[(k * $FrameEvery + 1):
       |       least(k * $FrameEvery + $FrameLen, L)] AS fc
       |  FROM codes, LATERAL unnest(
       |    range(0, (L + $FrameEvery - 1) // $FrameEvery)) AS u(k)),
       |fw AS (
       |  SELECT doc_id, k, len(fc) AS fl,
       |    list_transform(range(0, 64), w ->
       |      coalesce(list_sum(
       |        fc[(w * len(fc) // 64 + 1):(((w + 1) * len(fc)) // 64)]),
       |        0)) AS ws,
       |    list_transform(range(0, 64),
       |      w -> ((w + 1) * len(fc)) // 64 - (w * len(fc)) // 64) AS wc
       |  FROM frames),
       |fh AS (
       |  SELECT doc_id, CAST(coalesce(list_sum(list_transform(range(0, 63),
       |    b -> CASE WHEN ws[b + 1] * wc[b + 2] > ws[b + 2] * wc[b + 1]
       |              THEN (CAST(1 AS BIGINT) << b)
       |              ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT) AS fhash
       |  FROM fw),
       |dist AS (SELECT DISTINCT doc_id, fhash FROM fh),
       |freq AS (SELECT fhash, count(*) AS ndocs FROM dist GROUP BY fhash),
       |keep AS (
       |  SELECT dist.doc_id, dist.fhash FROM dist
       |  JOIN freq USING (fhash) WHERE ndocs <= $FrameDocCap),
       |nf AS (SELECT doc_id, count(*) AS nfr FROM keep GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
       |  FROM keep a JOIN keep b
       |    ON a.fhash = b.fhash AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |o AS (
       |  SELECT doc_a, doc_b, n_shared,
       |    n_shared * 1000000 // least(na.nfr, nb.nfr) AS overlap_micro
       |  FROM pairs
       |  JOIN nf na ON na.doc_id = doc_a
       |  JOIN nf nb ON nb.doc_id = doc_b)
       |SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared,
       |  CAST(overlap_micro AS BIGINT) AS overlap_micro
       |FROM o WHERE overlap_micro >= $FrameOverlapMicro
       |$restrict ORDER BY doc_a, doc_b""".stripMargin

  /** q126 oracle: recompute the windowed band-energy double-delta
    * fingerprints from the ASCII text (byte k = char k+1, the q109
    * argument; previous-window deltas via lag over a list column), then
    * the same containment-pair query as q118's with the audio cap. */
  private def audioNearDupsSql: String = audioNearDupsSqlOf("")

  private def audioNearDupsSqlOf(restrict: String): String =
    s"""WITH t AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1
       |  UNION ALL
       |  SELECT doc_id + $AudioVariantIdOffset,
       |    chr(ascii(substr(text, 1, 1)) + 1) || substr(text, 2)
       |  FROM documents WHERE doc_id % 5 = 0 AND doc_id % 3 = 1),
       |codes AS (
       |  SELECT doc_id, length(text) AS L,
       |    list_transform(range(1, length(text) + 1),
       |      i -> ascii(substr(text, i, 1))) AS cs
       |  FROM t),
       |wins AS (
       |  SELECT doc_id, t,
       |    list_transform(range(0, 16), b ->
       |      list_sum(cs[(t * 32 + b * 4 + 1):(t * 32 + b * 4 + 4)])) AS e
       |  FROM codes, LATERAL unnest(range(0,
       |    CASE WHEN L >= 64 THEN (L - 64) // 32 + 1 ELSE 0 END)) AS u(t)),
       |d AS (
       |  SELECT doc_id, t,
       |    list_transform(range(0, 15), b -> e[b + 1] - e[b + 2]) AS dv
       |  FROM wins),
       |fpt AS (
       |  SELECT doc_id, t,
       |    CAST(coalesce(list_sum(list_transform(range(0, 15), b ->
       |      CASE WHEN dv[b + 1] > coalesce(pv[b + 1], 0)
       |           THEN (CAST(1 AS BIGINT) << b)
       |           ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT) AS fp
       |  FROM (SELECT doc_id, t, dv,
       |          lag(dv) OVER (PARTITION BY doc_id ORDER BY t) AS pv
       |        FROM d)),
       |dist AS (SELECT DISTINCT doc_id, fp FROM fpt),
       |freq AS (SELECT fp, count(*) AS ndocs FROM dist GROUP BY fp),
       |keep AS (
       |  SELECT dist.doc_id, dist.fp FROM dist
       |  JOIN freq USING (fp) WHERE ndocs <= $AudioDocCap),
       |nf AS (SELECT doc_id, count(*) AS nfp FROM keep GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
       |  FROM keep a JOIN keep b
       |    ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |o AS (
       |  SELECT doc_a, doc_b, n_shared,
       |    n_shared * 1000000 // least(na.nfp, nb.nfp) AS overlap_micro
       |  FROM pairs
       |  JOIN nf na ON na.doc_id = doc_a
       |  JOIN nf nb ON nb.doc_id = doc_b)
       |SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared,
       |  CAST(overlap_micro AS BIGINT) AS overlap_micro
       |FROM o WHERE overlap_micro >= $AudioOverlapMicro
       |$restrict ORDER BY doc_a, doc_b""".stripMargin

  // DEF, not a val: CurationQueries' own init reaches this object (its
  // q189/q191 oracles call bandOccupancySql), so a val nesting
  // CurationQueries.oracle("q157...") here put the two <clinit>s in a
  // cycle (round 13: an ExceptionInInitializerError from ReleaseBuild;
  // the round-14 lazy val still left a two-thread first-touch hazard —
  // ADVICE r14). As a def, this object's initializer has NO outgoing
  // edge to CurationQueries at all — the init graph is acyclic
  // (CurationQueries → Multimodal → ∅) under any interleaving, and the
  // map is only assembled at call time (SparkEntry.oracleSql, a def).
  def oracle: Map[String, String] = Map(
    // q195: the q157 funnel oracle and the q130-chain keep-list nested
    // verbatim (the q115/q193 composition rule), classified by the
    // engine's 4-way pair rule over the original-doc id space
    "q195_cross_modal_disposition" ->
      s"""WITH dd AS (SELECT * FROM (
         |${graft.operators.CurationQueries.oracle(
              "q157_funnel_disposition")})),
         |ka AS (SELECT * FROM (
         |$keptAssetsSql))
         |SELECT d.doc_id,
         |  ${kindSql("d.doc_id")} AS kind,
         |  dd.disposition AS text_disposition,
         |  CASE WHEN d.doc_id IN (SELECT doc_id FROM ka)
         |       THEN 'kept' ELSE 'dropped' END AS asset_status,
         |  CASE
         |    WHEN dd.disposition = 'kept'
         |     AND d.doc_id IN (SELECT doc_id FROM ka) THEN 'kept_kept'
         |    WHEN dd.disposition = 'kept' THEN 'asset_dropped_text_kept'
         |    WHEN d.doc_id IN (SELECT doc_id FROM ka)
         |      THEN 'text_dropped_asset_kept'
         |    ELSE 'both_dropped' END AS pair_status
         |FROM documents d JOIN dd ON dd.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "q109_media_phash_dups" -> mediaPhashPairsSql(""),
    "q130_media_cluster_survivors" -> mediaClusterSurvivorsSql,
    "q118_frame_near_dups" -> frameNearDupsSql,
    "q126_audio_fp_dups" -> audioNearDupsSql,
    "q128_incremental_audio_fp" -> audioNearDupsSqlOf(
      "  AND (doc_a % 10 = 0 OR doc_b % 10 = 0)\n"),
    // q183: the SAME frame-containment query restricted to pairs
    // touching a batch asset — the incremental flow must reproduce it
    "q183_incremental_frame_dups" -> frameNearDupsSqlOf(
      "  AND (doc_a % 10 = 0 OR doc_b % 10 = 0)\n"),
    // q184: band keys recomputed from the q109 hash CTEs (phash ≥ 0 —
    // dHash sets bits 0..62 — so DuckDB // and % equal Spark div/%),
    // then the same two-level occupancy rollup
    "q184_media_band_occupancy" -> bandOccupancySql(
      s"""$mediaHashCtes,
         |bands AS (
         |  SELECT doc_id, CAST(b AS INT) AS band,
         |    (phash // (CAST(1 AS BIGINT) << (b * $BandBits)))
         |      % (CAST(1 AS BIGINT) << $BandBits) AS key
         |  FROM h, LATERAL unnest(range(0, $NumBands)) AS u(b))""".stripMargin),
    "q111_incremental_media_phash" -> mediaPhashPairsSql(
      "  AND (doc_a % 10 = 0 OR doc_b % 10 = 0)\n"),
    // q193: the three modality pair oracles NESTED verbatim (restricted
    // to batch losers — only doc_b drops), the asset universe with its
    // kind rule, and the first-failing CASE in the engine's gate order
    "q193_asset_ingest_disposition" ->
      s"""WITH mp AS (SELECT * FROM (
         |${mediaPhashPairsSql("  AND doc_b % 10 = 0\n")})),
         |fp AS (SELECT * FROM (
         |${frameNearDupsSqlOf("  AND doc_b % 10 = 0\n")})),
         |ap AS (SELECT * FROM (
         |${audioNearDupsSqlOf("  AND doc_b % 10 = 0\n")})),
         |assets AS (
         |  SELECT doc_id, ${kindSql("doc_id")} AS kind
         |  FROM (SELECT doc_id FROM documents
         |        UNION ALL
         |        SELECT doc_id + $VariantIdOffset FROM documents
         |        WHERE doc_id % 5 = 0)
         |  WHERE doc_id % 10 = 0)
         |SELECT doc_id, kind,
         |  CASE
         |    WHEN doc_id IN (SELECT doc_b FROM mp WHERE hamming = 0)
         |      THEN 'dropped_exact_dup'
         |    WHEN doc_id IN (SELECT doc_b FROM mp WHERE hamming >= 1)
         |      THEN 'dropped_near_dup'
         |    WHEN kind = 'video' AND doc_id IN (SELECT doc_b FROM fp)
         |      THEN 'dropped_frame_dup'
         |    WHEN kind = 'audio' AND doc_id IN (SELECT doc_b FROM ap)
         |      THEN 'dropped_audio_dup'
         |    ELSE 'kept' END AS disposition
         |FROM assets ORDER BY doc_id""".stripMargin,
    // q190: identical-phash families (fid = min corpus member, else min
    // batch member), q184's band expressions over CANONICAL hashes
    // only, candidates need a batch-touched probe side, inline Hamming;
    // n_pairs is exact integer arithmetic over batch/corpus counts
    "q190_canonical_media_pairs" ->
      s"""WITH $mediaHashCtes,
         |fam AS (
         |  SELECT phash,
         |    coalesce(min(doc_id) FILTER (WHERE doc_id % 10 <> 0),
         |             min(doc_id)) AS fid,
         |    count(*) FILTER (WHERE doc_id % 10 = 0) AS tb,
         |    count(*) FILTER (WHERE doc_id % 10 <> 0) AS tc
         |  FROM h GROUP BY phash),
         |cb AS (SELECT fid AS doc_id, phash FROM fam),
         |bands AS (
         |  SELECT doc_id, phash, CAST(b AS INT) AS band,
         |    (phash // (CAST(1 AS BIGINT) << (b * $BandBits)))
         |      % (CAST(1 AS BIGINT) << $BandBits) AS key
         |  FROM cb, LATERAL unnest(range(0, $NumBands)) AS u(b)),
         |cands AS (
         |  SELECT DISTINCT least(a.doc_id, b.doc_id) AS fid_a,
         |    greatest(a.doc_id, b.doc_id) AS fid_b,
         |    CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.key = b.key AND a.doc_id <> b.doc_id
         |  JOIN fam t ON t.fid = b.doc_id AND t.tb > 0
         |  WHERE bit_count(xor(a.phash, b.phash)) <= $MediaHammingMax),
         |cross_rows AS (
         |  SELECT fid_a, fid_b, hamming,
         |    fa.tb * (fb.tb + fb.tc) + fa.tc * fb.tb AS n_pairs
         |  FROM cands
         |  JOIN fam fa ON fa.fid = fid_a
         |  JOIN fam fb ON fb.fid = fid_b),
         |within_rows AS (
         |  SELECT fid AS fid_a, fid AS fid_b, CAST(0 AS BIGINT) AS hamming,
         |    tb * (tb - 1) // 2 + tb * tc AS n_pairs
         |  FROM fam
         |  WHERE tb > 0 AND tb * (tb - 1) // 2 + tb * tc > 0)
         |SELECT fid_a, fid_b, hamming, CAST(n_pairs AS BIGINT) AS n_pairs
         |FROM (SELECT * FROM cross_rows UNION ALL SELECT * FROM within_rows)
         |ORDER BY fid_a, fid_b""".stripMargin,
    // q187: the q184 band CTEs with per-bucket ranks; a pair's `need` =
    // min over shared buckets of the larger rank, so one join prices
    // every cap; truth = the quadratic Hamming scan (pigeonhole-exact
    // equal to capless banding, which is the point being measured)
    "q187_media_band_cap_curve" ->
      s"""WITH $mediaHashCtes,
         |bands AS (
         |  SELECT doc_id, CAST(b AS INT) AS band,
         |    (phash // (CAST(1 AS BIGINT) << (b * $BandBits)))
         |      % (CAST(1 AS BIGINT) << $BandBits) AS key
         |  FROM h, LATERAL unnest(range(0, $NumBands)) AS u(b)),
         |${bandCapRankSql("doc_id")},
         |truth AS (
         |  SELECT a.doc_id AS ida, b.doc_id AS idb
         |  FROM h a, h b WHERE a.doc_id < b.doc_id
         |    AND bit_count(xor(a.phash, b.phash)) <= $MediaHammingMax),
         |$bandCapCurveSqlTail""".stripMargin,
    // q180: the SAME recursive closure + election restricted to clusters
    // holding a batch member — the contracted merge must reproduce it
    "q180_incremental_media_clusters" -> mediaClusterSurvivorsSqlOf(
      "  AND cluster_id IN (SELECT DISTINCT cluster_id FROM comp\n" +
        "                    WHERE doc_id % 10 = 0)\n"),
    "q72_media_feature_summary" -> {
      val bucket0Chars = Seq(" ", "0", "@", "P", "`", "p")
      val b0 = bucket0Chars
        .map(c => s"(length(text) - length(replace(text, '$c', '')))")
        .mkString(" + ")
      s"""WITH f AS (
         |  SELECT
         |    ${kindSql("doc_id")} AS kind,
         |    length(text) AS n_bytes,
         |    $b0 AS b0
         |  FROM documents)
         |SELECT kind, count(*) AS n_assets,
         |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
         |  CAST(sum(b0) AS BIGINT) AS bucket0_bytes
         |FROM f GROUP BY kind ORDER BY kind""".stripMargin
    })
}
