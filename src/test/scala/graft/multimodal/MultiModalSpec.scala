package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultiModalSpec extends SparkSpec {
  import spark.implicits._

  private def media = {
    val docs = Seq(
      (0L, "a" * 100), (1L, "b" * 50), (2L, "c" * 200)).toDF("doc_id", "text")
    MultiModal.asMediaTable(docs, "doc_id", "text")
  }

  test("asMediaTable assigns kinds round-robin and binary payloads") {
    val rows = media.select($"media_id", $"kind",
      octet_length($"payload")).as[(Long, String, Int)].collect().sorted
    assert(rows.toSeq == Seq((0L, "image", 100), (1L, "audio", 50),
      (2L, "video", 200)))
  }

  test("withBinaryMeta extracts byte length and header hex declaratively") {
    val m = MultiModal.withBinaryMeta(media)
      .select($"media_id", $"n_bytes", $"header_hex")
      .as[(Long, Long, String)].collect().sorted
    assert(m(0) == (0L, 100L, "6161616161616161")) // 'a' = 0x61
    assert(m(1) == (1L, 50L, "6262626262626262"))
  }

  test("BMP builder roundtrips through the real javax.imageio decoder") {
    for ((w, h) <- Seq((1, 1), (5, 3), (13, 7))) {
      val bytes = MultiModal.buildBmp(w, h, seed = 42L)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO failed on ${w}x$h BMP")
      assert(img.getWidth == w && img.getHeight == h)
      assert(bytes.length == 54 + h * ((3 * w + 3) / 4 * 4))
    }
  }

  test("WAV builder roundtrips through the RIFF parser") {
    val bytes = MultiModal.buildWav(nSamples = 800, sampleRate = 8000, 9L)
    assert(MultiModal.wavDurationMs(bytes).contains(100.0)) // 800/8k s
    assert(MultiModal.wavDurationMs("not a wav".getBytes).isEmpty)
  }

  test("decodeMedia: real dims/duration by magic, opaque video by length") {
    val docs = Seq((0L, ""), (1L, ""), (2L, "")).toDF("doc_id", "text")
    val out = MultiModal.decodeMedia(
        MultiModal.asRealMediaTable(docs, "doc_id"))
      .collect().sortBy(_.media_id)
    assert(out(0).kind == "image" &&
      out(0).width.contains(1) && out(0).height.contains(1) &&
      out(0).duration_ms.isEmpty)
    assert(out(1).kind == "audio" && out(1).width.isEmpty &&
      out(1).duration_ms.contains(2.0 * 17 / 2 / 8000 * 1000))
    assert(out(2).kind == "video" && out(2).width.isEmpty &&
      out(2).duration_ms.isEmpty && out(2).n_bytes == 66)
  }

  test("extractFeatures: raster/PCM stats match hand-computed values") {
    val docs = Seq((0L, ""), (1L, "")).toDF("doc_id", "text")
    val out = MultiModal.extractFeatures(
        MultiModal.asRealMediaTable(docs, "doc_id"))
      .collect().sortBy(_.media_id)
    // image id 0: 1x1 BMP, pixel bytes = (0*31 + i) % 256 for i in 0..2
    // raster samples are {0,1,2} in some band order -> mean 1, peak 2
    assert(out(0).mean_sample.contains(1.0) && out(0).peak_sample.contains(2))
    // audio id 1: 17 samples, sample(i) = ((1*7 + i) % 65536) - 32768
    val samples = (0 until 17).map(i => ((7 + i) % 65536) - 32768)
    val absVals = samples.map(math.abs)
    assert(out(1).mean_sample.contains(absVals.sum.toDouble / 17))
    assert(out(1).peak_sample.contains(absVals.max))
  }

  test("resizeImages: real rescale re-decodes at the target dims") {
    val docs = Seq((3L, "")).toDF("doc_id", "text") // id 3 -> image 4x4
    val resized = MultiModal.resizeImages(
      MultiModal.asRealMediaTable(docs, "doc_id"), 2, 2).collect().head
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized.payload))
    assert(img.getWidth == 2 && img.getHeight == 2)
    // determinism
    val again = MultiModal.resizeImages(
      MultiModal.asRealMediaTable(docs, "doc_id"), 2, 2).collect().head
    assert(resized.payload.toSeq == again.payload.toSeq)
  }

  test("frame sampling: stride over fixed-size chunks") {
    val ds = media.as[MultiModal.MediaRow]
    val frames = MultiModal.sampleFrames(ds, frameBytes = 30, stride = 2)
      .select($"media_id", $"frame_idx").as[(Long, Int)].collect().sorted
    // 100B -> 3 frames -> idx 0, 2; 50B -> 1 frame -> 0; 200B -> 6 -> 0,2,4
    assert(frames.toSeq == Seq((0L, 0), (0L, 2), (1L, 0),
      (2L, 0), (2L, 2), (2L, 4)))
  }

  test("GIF frame sampling: REAL multi-frame decode, dims + indices") {
    // hand-built 5-frame 4x3 animation; stride 2 → frames 0, 2, 4, each
    // a decoded BMP whose re-decoded dimensions must match the source
    val gif = MultiModal.buildGif(w = 4, h = 3, nFrames = 5, seed = 9L)
    assert(new String(gif.take(6)) == "GIF89a") // a real container
    val ds = Seq(MultiModal.MediaRow(42L, "video", gif)).toDS()
    val frames = MultiModal.sampleFrames(ds, frameBytes = 64, stride = 2)
      .select($"media_id", $"frame_idx", $"frame_payload")
      .as[(Long, Int, Array[Byte])].collect().sortBy(_._2)
    assert(frames.map(f => (f._1, f._2)).toSeq ==
      Seq((42L, 0), (42L, 2), (42L, 4)))
    frames.foreach { case (_, _, p) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
      assert(img.getWidth == 4 && img.getHeight == 3)
    }
    // stride 1 over a 2-frame GIF → both frames
    val gif2 = MultiModal.buildGif(2, 2, 2, 1L)
    val all = MultiModal.sampleFrames(
        Seq(MultiModal.MediaRow(7L, "video", gif2)).toDS(), 64, 1)
      .select($"frame_idx").as[Int].collect().sorted
    assert(all.toSeq == Seq(0, 1))
  }

  test("corrupt GIF payload degrades to chunk sampling, never throws") {
    // a real GIF header with a truncated body
    val poison = MultiModal.buildGif(4, 4, 3, 2L).take(20)
    val out = MultiModal.sampleFrames(
        Seq(MultiModal.MediaRow(13L, "video", poison)).toDS(),
        frameBytes = 8, stride = 1)
      .select($"media_id", $"frame_idx").as[(Long, Int)].collect()
    // 20 bytes / 8 → 2 chunk frames; the stage completes
    assert(out.map(_._1).forall(_ == 13L) && out.length == 2)
  }
}
