package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Laws for the perceptual-hash dedup path: the header-driven BMP pixel
  * decode must reproduce the fixture's raster law byte-for-byte (in
  * FILE order, padding skipped), the 60-bit average hash must follow
  * the exact integer packing the oracle SQL re-derives, and the
  * end-to-end logo-dedup rollup must cluster identical payloads.
  */
class AHashSpec extends SparkSpec {
  import spark.implicits._

  test("decodeBmpPixels: header-driven decode matches the fixture law") {
    for (seed <- Seq(0L, 1L, 5L, 12L, 36L)) {
      val w = (1 + seed % 13).toInt
      val h = (1 + seed % 7).toInt
      val rowSize = ((3 * w + 3) / 4) * 4
      val px = MultiModal.decodeBmpPixels(
        MultiModal.buildBmp(w, h, seed)).get
      assert(px.length == 3 * w * h, s"seed=$seed")
      var o = 0
      for (fr <- 0 until h; j <- 0 until 3 * w) {
        assert(px(o) == ((seed * 31 + fr * rowSize + j) % 256).toInt,
          s"seed=$seed fr=$fr j=$j")
        o += 1
      }
    }
  }

  test("decodeBmpPixels rejects non-BMP / truncated / non-24bpp input") {
    assert(MultiModal.decodeBmpPixels(Array[Byte]()).isEmpty)
    assert(MultiModal.decodeBmpPixels("RIFFxxxxWAVE".getBytes).isEmpty)
    val ok = MultiModal.buildBmp(4, 3, 9L)
    assert(MultiModal.decodeBmpPixels(ok.take(40)).isEmpty) // truncated
    val wrongBpp = ok.clone(); wrongBpp(28) = 8              // 8bpp claim
    assert(MultiModal.decodeBmpPixels(wrongBpp).isEmpty)
  }

  test("aHash60: exact integer packing, strict mean comparison") {
    // constant image: no sample exceeds the mean -> hash 0
    assert(MultiModal.aHash60(Array.fill(10)(7)) == 0L)
    assert(MultiModal.aHash60(Array[Int]()) == 0L)
    // two-valued: bits set exactly where the sampled index holds the
    // larger value (sample*n > sum is strict)
    val px = Array(0, 0, 0, 0, 255, 255, 255, 255)
    val n = px.length
    val sum = px.map(_.toLong).sum
    val expect = (0 until 60).map { k =>
      if (px(k * n / 60).toLong * n > sum) 1L << k else 0L
    }.reduce(_ | _)
    assert(MultiModal.aHash60(px) == expect)
    // 60 bits only: the packed value is always non-negative
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 200) {
      val arr = Array.fill(1 + rnd.nextInt(300))(rnd.nextInt(256))
      val hv = MultiModal.aHash60(arr)
      assert(hv >= 0L && (hv >> 60) == 0L)
    }
  }

  test("logo dedup end-to-end equals the fixture-law recomputation") {
    val docs = spark.range(0, 111).select($"id".as("doc_id"))
    val hashed = MultiModal.imageAHash(
      MultiModal.asLogoMediaTable(docs.toDF(), "doc_id"))
      .as[(Long, Long)].collect().toMap
    // every doc hashed, and the same seed always hashes identically
    // (same payload -> same decode -> same hash)
    assert(hashed.size == 111)
    assert((0L until 111L).forall(i => hashed(i) == hashed(i % 37)))
    // driver-side recomputation straight from the raster law (the
    // oracle SQL's construction) — the whole decode->hash path must
    // reproduce it exactly
    def lawHash(id: Long): Long = {
      val seed = id % 37
      val w = (1 + seed % 13).toInt
      val h = (1 + seed % 7).toInt
      val rowSize = ((3 * w + 3) / 4) * 4
      val px = (for (fr <- 0 until h; j <- 0 until 3 * w)
        yield ((seed * 31 + fr * rowSize + j) % 256).toInt).toArray
      MultiModal.aHash60(px)
    }
    assert((0L until 111L).forall(i => hashed(i) == lawHash(i)))
    // distinct seeds MAY share a hash (the fixture rasters are linear
    // ramps — structural similarity is what a perceptual hash groups),
    // but identical payloads NEVER split: cluster sizes are multiples
    // of each seed-class size
    val clusters = hashed.groupBy(_._2).map { case (_, m) => m.size }
    assert(clusters.sum == 111)
  }
}
