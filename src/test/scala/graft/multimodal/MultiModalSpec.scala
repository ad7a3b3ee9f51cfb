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

  test("stub decoder is deterministic and feature shape is stable") {
    val ds = media.as[MultiModal.MediaRow]
    val out = MultiModal.decodeFeatures(ds).collect().sortBy(_.media_id)
    assert(out.length == 3)
    val img = out(0)
    assert(img.n_bytes == 100 && img.width == 100 % 640)
    assert(img.features.length == 4)
    assert(img.features(1) == 0x61.toDouble) // mean byte of all-'a' payload
    // determinism: second run identical
    val again = MultiModal.decodeFeatures(ds).collect().sortBy(_.media_id)
    assert(out.map(_.features).toSeq == again.map(_.features).toSeq)
  }

  test("frame sampling: stride over fixed-size chunks") {
    val ds = media.as[MultiModal.MediaRow]
    val frames = MultiModal.sampleFrames(ds, frameBytes = 30, stride = 2)
      .select($"media_id", $"frame_idx").as[(Long, Int)].collect().sorted
    // 100B -> 3 frames -> idx 0, 2; 50B -> 1 frame -> 0; 200B -> 6 -> 0,2,4
    assert(frames.toSeq == Seq((0L, 0), (0L, 2), (1L, 0),
      (2L, 0), (2L, 2), (2L, 4)))
  }
}
