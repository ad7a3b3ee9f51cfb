package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `BINARY` columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The container has no image/audio codecs, so the decode kernels are
  * deterministic STUBS (clearly marked below) — but the Spark-side
  * plumbing is real and tested: schema, batch shape, partition-local
  * processing via `mapPartitions` (the Scala analogue of `mapInPandas` —
  * one iterator per partition, so a real decoder would amortize model/
  * codec init per-partition, the property that matters at 100 TB).
  */
object MultiModal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaMeta(
      media_id: Long, kind: String, n_bytes: Long, header_hex: String,
      width: Int, height: Int, features: Seq[Double])

  /** Wrap any string column as a binary payload table (the testdata has no
    * media files; documents.text bytes stand in as payloads so the
    * pipeline shape is exercised end-to-end).
    */
  def asMediaTable(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(
      col(id).as("media_id"),
      (when(col(id) % 3 === 0, "image")
        .when(col(id) % 3 === 1, "audio")
        .otherwise("video")).as("kind"),
      encode(col(text), "UTF-8").as("payload"))

  // ------------------------------------------------------------------
  // STUB DECODERS — deterministic fakes standing in for libjpeg/ffmpeg.
  // Real deployments swap these bodies; signatures and batch shape stay.
  // ------------------------------------------------------------------

  /** STUB: "decode" an image: dimensions derived from payload length,
    * features = 4 byte-histogram moments. Deterministic pure function.
    */
  private[multimodal] def stubDecode(payload: Array[Byte]): (Int, Int, Seq[Double]) = {
    val n = payload.length
    val w = math.max(1, n % 640)
    val h = math.max(1, (n / 7) % 480)
    var sum = 0L; var sumSq = 0L
    var i = 0
    while (i < n) { val b = payload(i) & 0xff; sum += b; sumSq += b.toLong * b; i += 1 }
    val mean = if (n == 0) 0.0 else sum.toDouble / n
    val varr = if (n == 0) 0.0 else sumSq.toDouble / n - mean * mean
    (w, h, Seq(n.toDouble, mean, varr, (payload.headOption.getOrElse(0: Byte) & 0xff).toDouble))
  }

  /** Decode + feature-extract over partitions. Iterator-per-partition so
    * codec/model initialization happens once per task, not per row.
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: init decoder/codec context HERE, once per partition
      rows.map { r =>
        val (w, h, feats) = stubDecode(r.payload)
        val hdr = r.payload.take(8).map(b => f"${b & 0xff}%02x").mkString
        MediaMeta(r.media_id, r.kind, r.payload.length.toLong, hdr, w, h, feats)
      }
    }
  }

  /** Declarative metadata extraction — the oracle-checkable subset
    * (byte length + header hex) as pure column expressions.
    */
  def withBinaryMeta(media: DataFrame): DataFrame =
    media
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("header_hex", lower(hex(substring(col("payload"), 1, 8))))

  /** STUB frame-sampler: pick every `stride`-th "frame" (payload chunk of
    * `frameBytes`) — the partition/batch shape of real video sampling.
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int,
                   stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val nFrames = math.max(1, r.payload.length / math.max(1, frameBytes))
      (0 until nFrames by stride).map { f =>
        (r.media_id, f,
          r.payload.slice(f * frameBytes, (f + 1) * frameBytes))
      }
    }.toDF("media_id", "frame_idx", "frame_payload")
  }
}
