package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (SURVEY.md §2.11 E4): image/audio/video payloads
  * as opaque `binary` columns with typed metadata, plus the
  * decode / feature-extract / resize / frame-sample stages a training
  * -data pipeline runs over them.
  *
  * The Spark-side plumbing is real and tested: schema, Dataset lineage,
  * decode-oriented repartitioning, and the batched per-partition
  * execution shape a vectorized decoder or GPU inference server needs
  * (mapPartitions + grouped batches — the Scala analogue of a batched
  * pandas UDF). The codec itself is a STUB (this container has no image
  * /audio libraries): [[StubCodec]] is a deterministic fake keyed on the
  * payload bytes, so tests are exact and swapping in a real decoder is a
  * one-function change.
  *
  * Scale notes: payloads never shuffle in any stage here (all map-side);
  * `repartitionForDecode` exists because decode is compute-bound, so
  * partition count should track cores, not input splits; batches bound
  * peak memory per task to batchSize x payload, independent of
  * partition size.
  */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int,
      channels: Int, durationMs: Long)

  case class MediaRow(doc_id: Long, media: Array[Byte], meta: MediaMeta)

  case class MediaFeatures(doc_id: Long, n_bytes: Long, features: Array[Float])

  case class MediaFeaturesPortable(doc_id: Long, n_bytes: Long,
      features: Array[Double])

  case class MediaFrames(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("durationMs", LongType, nullable = false))),
      nullable = true)))

  /** STUB CODEC — deterministic fake in place of a real image/audio
    * decoder (none available in this environment). Every function is a
    * pure function of the payload bytes so pipelines over it are exactly
    * reproducible; replace these bodies with e.g. a JNI/ffmpeg call to
    * go real without touching any plumbing.
    */
  object StubCodec {
    val FeatureDim = 16

    /** "Decode + embed": dim-sized float vector derived from a rolling
      * hash of the payload — stands in for decode->model.forward().
      */
    def decodeToFeatures(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](FeatureDim)
      var h = 1125899906842597L // large prime seed
      var i = 0
      while (i < payload.length) {
        h = 31L * h + payload(i)
        out(i % FeatureDim) += (h & 0xffffL).toFloat / 65535.0f
        i += 1
      }
      out
    }

    /** Portable "decode + featurize" twin of [[decodeToFeatures]]:
      * feature j = first 8 hex chars of md5(HEX(payload) || ':' || j),
      * scaled to an exact 6-decimal fraction in [0, 1). Built ONLY from
      * universal primitives (uppercase hex, md5, integer mod, division)
      * so an external SQL engine recomputes every value bit-for-bit —
      * this is the feature path the DuckDB oracle checks end to end.
      */
    def decodeToFeaturesPortable(payload: Array[Byte],
        dim: Int): Array[Double] = {
      val hx = payload.map("%02X".format(_)).mkString
      Array.tabulate(dim) { j =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val h = md.digest((hx + ":" + j).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (java.lang.Long.parseLong(h.substring(0, 8), 16) % 1000000L) /
          1000000.0
      }
    }

    /** "Resize": deterministic payload shrink standing in for a pixel
      * resample — keeps every stride-th byte.
      */
    def resize(payload: Array[Byte], stride: Int): Array[Byte] =
      payload.indices.collect {
        case i if i % stride == 0 => payload(i)
      }.toArray

    /** "Frame sample": n evenly spaced fixed-width byte windows standing
      * in for video frame extraction.
      */
    def sampleFrames(payload: Array[Byte], n: Int,
        frameBytes: Int = 16): Seq[Array[Byte]] =
      if (payload.isEmpty) Seq.empty
      else (0 until n).map { i =>
        val start = (payload.length.toLong * i / n).toInt
        payload.slice(start, math.min(start + frameBytes, payload.length))
      }
  }

  /** Fixture adapter: the documents table as a media table (text bytes
    * as the opaque payload) — the driver testdata has no real media, and
    * nothing downstream cares what the bytes mean.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        lit("text/plain").as("format"),
        lit(0).as("width"), lit(0).as("height"),
        lit(1).as("channels"), lit(0L).as("durationMs")).as("meta"))
      .as[MediaRow]
  }

  /** Decode is compute-bound: partition count should track cluster cores
    * (input splits track bytes, which is wrong for 100 KB thumbnails and
    * 4 GB videos alike). Round-robin keeps payload sizes balanced.
    */
  def repartitionForDecode(media: Dataset[MediaRow], partitions: Int):
      Dataset[MediaRow] =
    media.repartition(partitions)

  /** Cluster-portable form: size the decode fan-out from the SESSION
    * (defaultParallelism = total executor cores on a real cluster), not
    * a box-sized constant — a hardcoded 32 caps a 1000-executor
    * cluster's decode at 32 tasks. Compute-bound work past that point
    * scales with CORES, not partitions: on a fixed box the per-row
    * decode cost is the floor (the measured ~0.6 100x exponent is that
    * floor emerging through fixed overhead, not a partitioning bug).
    */
  def repartitionForDecode(media: Dataset[MediaRow]): Dataset[MediaRow] =
    repartitionForDecode(media,
      media.sparkSession.sparkContext.defaultParallelism)

  /** The ONE batching seam the decode paths share: a partition's
    * non-null payload rows chunked into batchSize slices (null payloads
    * — mediaSchema declares media nullable; a null source text yields
    * one — are skipped, not NPE'd mid-job). MultimodalSpec drives this
    * exact function through mapPartitions and asserts the slice shape,
    * so a regression to whole-partition slices (unbounded peak memory)
    * fails the spec instead of only showing up as an executor OOM.
    */
  private[graft] def batches(rows: Iterator[MediaRow],
      batchSize: Int): Iterator[Seq[MediaRow]] =
    rows.filter(_.media != null).grouped(batchSize)

  /** Batched feature extraction: the per-partition iterator is chunked
    * into batchSize groups, each handed to the codec as one slice — the
    * execution shape a vectorized decoder / GPU inference batch needs.
    * Lazy iterators end-to-end: only one batch of payloads is resident
    * per task at a time.
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64):
      Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      batches(rows, batchSize).flatMap { batch =>
        // one codec call per batch (amortizes model/codec setup)
        batch.map { r =>
          MediaFeatures(r.doc_id, r.media.length.toLong,
            StubCodec.decodeToFeatures(r.media))
        }
      }
    }
  }

  /** Batched feature extraction through the PORTABLE stub codec — the
    * same mapPartitions + grouped-batch execution shape as
    * [[extractFeatures]], but with hash-derived features an external
    * SQL engine can recompute, so the whole decode path (schema, typed
    * lineage, batch shape, fan-in) is oracle-checkable, not just
    * spec-checkable.
    */
  def extractFeaturesPortable(media: Dataset[MediaRow], dim: Int,
      batchSize: Int = 64): Dataset[MediaFeaturesPortable] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      batches(rows, batchSize).flatMap { batch =>
        batch.map { r =>
          MediaFeaturesPortable(r.doc_id, r.media.length.toLong,
            StubCodec.decodeToFeaturesPortable(r.media, dim))
        }
      }
    }
  }

  /** Frame sampling as a generator: one input row fans out to n frame
    * rows (explode shape), each a decodable payload for downstream ops.
    */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[MediaFrames] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      if (r.media == null) Seq.empty
      else StubCodec.sampleFrames(r.media, n).zipWithIndex.map {
        case (frame, i) => MediaFrames(r.doc_id, i, frame)
      }
    }
  }

  case class MediaWindow(doc_id: Long, win_idx: Int, energy: Long)

  /** Audio-style overlapping framing: full windows of `frame` bytes at
    * `hop`-byte stride (the STFT / feature-extraction input shape), with
    * an integer "energy" (sum of unsigned byte values) per window — the
    * portable stand-in for RMS over PCM samples, exactly recomputable by
    * an external SQL engine from the payload hex. The ragged tail past
    * the last full window is dropped (standard framing). Map-only:
    * payloads fan out to windows without ever shuffling.
    */
  def frameWindows(media: Dataset[MediaRow], frame: Int,
      hop: Int): Dataset[MediaWindow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      if (r.media == null) Seq.empty[MediaWindow] else {
      val len = r.media.length
      val n = if (len >= frame) (len - frame) / hop + 1 else 0
      (0 until n).map { i =>
        var e = 0L
        var j = i * hop
        val end = j + frame
        while (j < end) { e += r.media(j) & 0xff; j += 1 }
        MediaWindow(r.doc_id, i, e)
      }
      }
    }
  }
}
