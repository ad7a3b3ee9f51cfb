package graft.multimodal

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `BINARY` columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * Decode status:
  *  - image: REAL — BMP containers decoded with `javax.imageio` (pure
  *    JDK, no native codecs);
  *  - audio: REAL — WAV/PCM decoded by a hand-rolled RIFF chunk walker
  *    (pure JDK);
  *  - animated GIF: REAL — multi-frame decode via the JDK's GIF reader
  *    (frame sampling yields decoded frames re-encoded as BMP rows);
  *  - true video (mp4/mkv): STUB — no pure-JVM codec exists; the frame
  *    sampler keeps the real partition/batch shape over opaque chunks.
  *
  * Everything runs via `mapPartitions` (the Scala analogue of
  * `mapInPandas` — one iterator per partition, so codec/model
  * initialization amortizes per-task, the property that matters at
  * 100 TB).
  */
object MultiModal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded container facts. Fields are None where the modality has no
    * such notion (duration of an image) or the payload isn't decodable.
    */
  final case class DecodedMedia(
      media_id: Long, kind: String, n_bytes: Long,
      width: Option[Int], height: Option[Int], duration_ms: Option[Double])

  /** Wrap any string column as a binary payload table (payload = raw text
    * bytes; the oracle-checkable metadata surface for q_media_meta).
    */
  def asMediaTable(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(
      col(id).as("media_id"),
      (when(col(id) % 3 === 0, "image")
        .when(col(id) % 3 === 1, "audio")
        .otherwise("video")).as("kind"),
      encode(col(text), "UTF-8").as("payload"))

  // ------------------------------------------------------------------
  // Deterministic REAL-container payload builders (the test fixture;
  // the decoders below never see these internals, only the bytes).
  // ------------------------------------------------------------------

  /** Minimal 24bpp bottom-up BMP with deterministic pixel bytes. */
  private[multimodal] def buildBmp(w: Int, h: Int, seed: Long): Array[Byte] = {
    val rowSize = ((3 * w + 3) / 4) * 4
    val imageSize = rowSize * h
    val buf = ByteBuffer.allocate(54 + imageSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + imageSize)
      .putInt(0).putInt(54)                       // reserved, pixel offset
    buf.putInt(40).putInt(w).putInt(h)            // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0).putInt(imageSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var i = 0
    while (i < imageSize) {
      buf.put(((seed * 31 + i) % 256).toByte)
      i += 1
    }
    buf.array()
  }

  /** Minimal PCM16 mono WAV with deterministic samples. */
  private[multimodal] def buildWav(nSamples: Int, sampleRate: Int,
                                   seed: Long): Array[Byte] = {
    val dataSize = 2 * nSamples
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(1)                    // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)  // byte rate
      .putShort(2).putShort(16)                   // block align, bits
    buf.put("data".getBytes).putInt(dataSize)
    var i = 0
    while (i < nSamples) {
      buf.putShort((((seed * 7 + i) % 65536) - 32768).toShort)
      i += 1
    }
    buf.array()
  }

  /** Media table with REAL container payloads, deterministic per id:
    *  - image: BMP,  w = 1 + id%13, h = 1 + id%7
    *  - audio: WAV,  8 kHz PCM16 mono, n = 16 + id%33 samples
    *  - video: opaque chunk stream of 64 + id%128 bytes (stub modality)
    */
  def asRealMediaTable(docs: DataFrame, id: String): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col(id).cast("long").as("media_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { mid =>
          (mid % 3) match {
            case 0 => MediaRow(mid, "image",
              buildBmp((1 + mid % 13).toInt, (1 + mid % 7).toInt, mid))
            case 1 => MediaRow(mid, "audio",
              buildWav((16 + mid % 33).toInt, 8000, mid))
            case _ => MediaRow(mid, "video",
              Array.tabulate((64 + mid % 128).toInt)(i =>
                ((mid * 13 + i) % 256).toByte))
          }
        }
      }
  }

  // ------------------------------------------------------------------
  // REAL decoders — dispatch on container magic, not on the kind label.
  // ------------------------------------------------------------------

  /** Parse WAV: RIFF chunk walk to fmt + data → duration in ms. */
  private[multimodal] def wavDurationMs(payload: Array[Byte]): Option[Double] = {
    if (payload.length < 44) return None
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val riff = new Array[Byte](4); buf.get(riff); buf.getInt()
    val wave = new Array[Byte](4); buf.get(wave)
    if (new String(riff) != "RIFF" || new String(wave) != "WAVE") return None
    var sampleRate = 0; var blockAlign = 0; var dataSize = -1
    while (buf.remaining() >= 8 && (sampleRate == 0 || dataSize < 0)) {
      val tag = new Array[Byte](4); buf.get(tag)
      val size = buf.getInt()
      new String(tag) match {
        case "fmt " =>
          val p = buf.position()
          buf.getShort()                       // audio format
          buf.getShort()                       // channels
          sampleRate = buf.getInt()
          buf.getInt()                         // byte rate
          blockAlign = buf.getShort().toInt
          buf.position(p + size)
        case "data" =>
          dataSize = size
          buf.position(math.min(buf.position() + size, buf.limit()))
        case _ =>
          buf.position(math.min(buf.position() + size, buf.limit()))
      }
    }
    if (sampleRate <= 0 || blockAlign <= 0 || dataSize < 0) None
    else Some(dataSize.toDouble / blockAlign / sampleRate * 1000.0)
  }

  /** Decode each payload by its magic bytes: BMP/PNG → `ImageIO` (pure
    * JDK) for dimensions; RIFF/WAVE → manual PCM parse for duration;
    * anything else (the stub video chunks) → byte length only.
    */
  def decodeMedia(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition: ImageIO plugin scan happens once per JVM; a real
      // codec context (e.g. ffmpeg) would be initialized HERE, per task
      rows.map { r =>
        val p = r.payload
        val isImage = p.length >= 2 &&
          ((p(0) == 'B' && p(1) == 'M') ||
            (p.length >= 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P'))
        val dims =
          if (isImage)
            Option(ImageIO.read(new ByteArrayInputStream(p)))
              .map(img => (img.getWidth, img.getHeight))
          else None
        DecodedMedia(r.media_id, r.kind, p.length.toLong,
          dims.map(_._1), dims.map(_._2), wavDurationMs(p))
      }
    }
  }

  final case class MediaFeatures(
      media_id: Long, kind: String,
      mean_sample: Option[Double], peak_sample: Option[Int])

  /** REAL feature extraction: image → mean/max over the decoded raster
    * samples (all bands — `javax.imageio` raster access); audio → mean
    * absolute amplitude / peak of the PCM samples. Video chunks yield
    * None. Runs per-partition like decode.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val p = r.payload
        if (p.length >= 2 && p(0) == 'B' && p(1) == 'M') {
          val img = ImageIO.read(new ByteArrayInputStream(p))
          if (img == null) MediaFeatures(r.media_id, r.kind, None, None)
          else {
            val raster = img.getRaster
            val bands = raster.getNumBands
            var sum = 0L; var peak = 0; var n = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                var b = 0
                while (b < bands) {
                  val v = raster.getSample(x, y, b)
                  sum += v; if (v > peak) peak = v; n += 1
                  b += 1
                }
                x += 1
              }
              y += 1
            }
            MediaFeatures(r.media_id, r.kind,
              Some(sum.toDouble / n), Some(peak))
          }
        } else if (p.length >= 44 && p(0) == 'R' && p(1) == 'I') {
          val buf = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
          buf.position(44)
          var sum = 0L; var peak = 0; var n = 0L
          while (buf.remaining() >= 2) {
            val v = math.abs(buf.getShort().toInt)
            sum += v; if (v > peak) peak = v; n += 1
          }
          MediaFeatures(r.media_id, r.kind,
            if (n > 0) Some(sum.toDouble / n) else None,
            if (n > 0) Some(peak) else None)
        } else MediaFeatures(r.media_id, r.kind, None, None)
      }
    }
  }

  /** REAL image resize (pure JVM): decode → Graphics2D scale → BMP
    * re-encode. Non-image payloads pass through untouched.
    */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val p = r.payload
        if (p.length >= 2 && p(0) == 'B' && p(1) == 'M') {
          val img = ImageIO.read(new ByteArrayInputStream(p))
          if (img == null) r
          else {
            val out = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
            val g = out.createGraphics()
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            ImageIO.write(out, "bmp", bos)
            MediaRow(r.media_id, r.kind, bos.toByteArray)
          }
        } else r
      }
    }
  }

  /** Parse a 24bpp BMP payload down to its raster bytes — a REAL
    * header-driven decode (magic check, pixel-array offset / width /
    * height / bpp read from the BITMAPINFOHEADER), not a replay of the
    * fixture builder. Returns the non-padding pixel bytes in FILE order
    * (row-major as stored, bottom-up for positive heights, with each
    * row's 4-byte alignment padding skipped) — the deterministic sample
    * order the perceptual hash below is defined over. None for
    * non-BMP / truncated / non-24bpp payloads.
    */
  private[multimodal] def decodeBmpPixels(p: Array[Byte]): Option[Array[Int]] = {
    if (p.length < 54 || p(0) != 'B' || p(1) != 'M') return None
    val buf = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    val pixelOffset = buf.getInt(10)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    val bpp = buf.getShort(28).toInt
    if (bpp != 24 || w <= 0 || h == 0) return None
    val rows = math.abs(h)
    // size math in Long: a hostile header with a huge width must fail the
    // bounds check, not overflow Int into a "valid"-looking negative size
    val rowSizeL = ((3L * w + 3) / 4) * 4
    if (pixelOffset < 54 || 3L * w * rows > Int.MaxValue ||
      pixelOffset + rowSizeL * rows > p.length)
      return None
    val rowSize = rowSizeL.toInt
    val out = new Array[Int](3 * w * rows)
    var fr = 0
    var o = 0
    while (fr < rows) {
      var j = 0
      while (j < 3 * w) {
        out(o) = p(pixelOffset + fr * rowSize + j) & 0xff
        o += 1; j += 1
      }
      fr += 1
    }
    Some(out)
  }

  /** 60-bit average hash over a decoded sample sequence: bit k (k in
    * [0, 60)) is set iff the sample at index `k*n/60` exceeds the mean —
    * compared integer-exactly as `sample * n > sum`, so the hash is
    * bit-reproducible in any engine (no float mean). 60 bits keeps the
    * packed value positive in a signed 64-bit lane (SQL BIGINTs have no
    * unsigned variant). Index sampling is nearest-neighbor, so images
    * smaller than 60 samples hash consistently too.
    */
  private[multimodal] def aHash60(samples: Array[Int]): Long = {
    val n = samples.length
    if (n == 0) return 0L
    var sum = 0L
    var i = 0
    while (i < n) { sum += samples(i); i += 1 }
    var hash = 0L
    var k = 0
    while (k < 60) {
      if (samples((k.toLong * n / 60).toInt).toLong * n > sum) hash |= 1L << k
      k += 1
    }
    hash
  }

  /** "Logo" media fixture: every doc carries a real BMP whose content is
    * keyed by `id % 37` — a crawl where a small set of recurring images
    * (site logos, icons, tracking pixels) appears under many distinct
    * documents. This is the shape image-dedup exists for: exact/near
    * duplicate payloads vastly outnumber distinct ones.
    */
  def asLogoMediaTable(docs: DataFrame, id: String): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col(id).cast("long").as("media_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { mid =>
          val seed = mid % 37
          MediaRow(mid, "image",
            buildBmp((1 + seed % 13).toInt, (1 + seed % 7).toInt, seed))
        }
      }
  }

  /** Per-image perceptual hash: REAL BMP header-driven pixel decode →
    * 60-bit average hash. Non-decodable payloads are dropped (a real
    * pipeline routes them to a quarantine sink). One row per image,
    * computed entirely executor-side.
    */
  def imageAHash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeBmpPixels(r.payload).map(px => (r.media_id, aHash60(px)))
      }
    }.toDF("media_id", "ahash")
  }

  /** Declarative metadata extraction — the oracle-checkable subset
    * (byte length + header hex) as pure column expressions.
    */
  def withBinaryMeta(media: DataFrame): DataFrame =
    media
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("header_hex", lower(hex(substring(col("payload"), 1, 8))))

  /** Deterministic multi-frame animated GIF fixture, written with the
    * JDK's own GIF encoder (so the bytes are a REAL container, not a
    * hand-rolled approximation of one).
    */
  private[multimodal] def buildGif(w: Int, h: Int, nFrames: Int,
                                   seed: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nFrames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (((seed * 31 + f * 97 + y * w + x) % 255)
            * 0x010101).toInt)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
        null)
      f += 1
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  private def isGif(p: Array[Byte]): Boolean =
    p.length >= 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
      p(3) == '8'

  /** Frame sampler, REAL for GIF containers: every `stride`-th frame is
    * decoded with the JDK's multi-frame GIF reader and re-encoded as a
    * standalone BMP payload (decoded pixels, decoded dimensions —
    * downstream stages treat each frame as an image row). True video
    * containers (mp4/mkv — no pure-JVM codec exists) keep the opaque
    * chunk-sampling shape: every `stride`-th `frameBytes` chunk.
    * One reader per partition (the mapPartitions codec-amortization
    * pattern — a real ffmpeg context would be initialized the same way).
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int,
                   stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      lazy val reader = ImageIO.getImageReadersByFormatName("gif").next()
      def chunkFrames(r: MediaRow): Seq[(Long, Int, Array[Byte])] = {
        val nFrames =
          math.max(1, r.payload.length / math.max(1, frameBytes))
        (0 until nFrames by stride).map { f =>
          (r.media_id, f,
            r.payload.slice(f * frameBytes, (f + 1) * frameBytes))
        }
      }
      rows.flatMap { r =>
        if (isGif(r.payload)) {
          // poison-payload guard: a truncated/corrupt container must not
          // kill a 1000-executor stage — it degrades to the opaque
          // chunk path (same contract as FrameCodec's null-on-truncated)
          try {
            reader.setInput(ImageIO.createImageInputStream(
              new ByteArrayInputStream(r.payload)))
            val n = reader.getNumImages(true)
            (0 until n by stride).map { f =>
              val img = reader.read(f)
              val bgr = new java.awt.image.BufferedImage(img.getWidth,
                img.getHeight, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
              val g = bgr.createGraphics()
              g.drawImage(img, 0, 0, null)
              g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              ImageIO.write(bgr, "bmp", bos)
              (r.media_id, f, bos.toByteArray)
            }
          } catch {
            case _: Exception => chunkFrames(r)
          }
        } else chunkFrames(r)
      }
    }.toDF("media_id", "frame_idx", "frame_payload")
  }

  /** GIF media table: deterministic multi-frame animations per id
    * (w = 2 + id%5, h = 1 + id%3, frames = 2 + id%4).
    */
  def asGifMediaTable(docs: DataFrame, id: String): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col(id).cast("long").as("media_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { mid =>
          MediaRow(mid, "video",
            buildGif((2 + mid % 5).toInt, (1 + mid % 3).toInt,
              (2 + mid % 4).toInt, mid))
        }
      }
  }
}
