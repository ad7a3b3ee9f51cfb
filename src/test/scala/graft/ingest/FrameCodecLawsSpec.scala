package graft.ingest

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

/** Seeded-random round-trip laws for the three frame wire codecs over
  * the full field ranges (u16/u32 extremes, zero-port/zero-point
  * frames, serials above 2^63 wrapping two's-complement like numpy
  * int64 views) — complements FrameCodecSpec's hand-built fixtures.
  * Pure JVM byte-level calls, no Spark session.
  */
class FrameCodecLawsSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(8138102)

  private def u32() = rnd.nextLong(0x100000000L)

  test("peaks frames round-trip, incl. zero ports and count skew") {
    for (_ <- 1 to 300) {
      val nPorts = rnd.nextInt(12) // 0 is a legal header-only frame
      val counts = Array.fill(nPorts)(rnd.nextInt(8))
      val peaks = Array.fill(counts.sum)(
        math.floor(rnd.nextGaussian() * 1e4))
      val serial = rnd.nextLong() // full i64 incl. negative (u64 wrap)
      val tsInt = u32(); val tsFrac = u32()
      val bytes = FrameCodec.encodePeaksBytes(serial, tsInt, tsFrac,
        new GenericArrayData(counts), new GenericArrayData(peaks))
      val row = FrameCodec.decodePeaksBytes(bytes)
      assert(row != null)
      assert(row.getInt(0) == 24 + 2 * nPorts)
      assert(row.getLong(2) == serial)
      assert(row.getLong(3) == tsInt && row.getLong(4) == tsFrac)
      assert(row.getArray(5).toIntArray().toSeq == counts.toSeq)
      assert(row.getArray(6).toDoubleArray().toSeq == peaks.toSeq)
    }
  }

  test("sensor frames round-trip over full status/buffer ranges") {
    for (_ <- 1 to 300) {
      val values = Array.fill(rnd.nextInt(16))(rnd.nextGaussian() * 1e3)
      val status = rnd.nextInt(256); val pct = rnd.nextInt(256)
      val serial = rnd.nextLong()
      val bytes = FrameCodec.encodeSensorBytes(status, pct, serial,
        u32(), u32(), new GenericArrayData(values))
      val row = FrameCodec.decodeSensorBytes(bytes)
      assert(row != null)
      assert(row.getInt(1) == status && row.getInt(2) == pct)
      assert(row.getLong(3) == serial)
      assert(row.getArray(6).toDoubleArray().toSeq == values.toSeq)
    }
  }

  test("spectrum frames round-trip, incl. zero channels/points") {
    for (_ <- 1 to 200) {
      val nCh = rnd.nextInt(10)
      val nPts = if (nCh == 0) 0 else rnd.nextInt(24)
      val matrix = Array.tabulate(nCh)(_ =>
        new GenericArrayData(Array.fill(nPts)(rnd.nextInt(0x10000))): Any)
      val swl = 1000.0 + rnd.nextDouble() * 1000
      val wli = rnd.nextDouble() * 2
      val bits = rnd.nextInt(0x10000)
      val bytes = FrameCodec.encodeSpectrumBytes(rnd.nextLong(),
        u32(), u32(), swl, wli, bits, new GenericArrayData(matrix))
      val row = FrameCodec.decodeSpectrumBytes(bytes)
      assert(row != null)
      assert(row.getDouble(5) == swl && row.getDouble(6) == wli)
      assert(row.getInt(7) == nPts && row.getInt(8) == nCh)
      assert(row.getInt(9) == bits)
      val m = row.getArray(10)
      for (c <- 0 until nCh)
        assert(m.getArray(c).toIntArray().toSeq ==
          matrix(c).asInstanceOf[GenericArrayData].toIntArray().toSeq)
    }
  }

  test("decoders return null on truncation at every boundary") {
    val counts = new GenericArrayData(Array(1, 1))
    val peaks = new GenericArrayData(Array(1.0, 2.0))
    val full = FrameCodec.encodePeaksBytes(1L, 2L, 3L, counts, peaks)
    for (cut <- Seq(0, 7, 23, full.length - 1))
      assert(FrameCodec.decodePeaksBytes(full.take(cut)) == null ||
        cut >= 24, s"cut=$cut must not decode")
    // mid-payload truncation breaks the %8 alignment guard
    assert(FrameCodec.decodePeaksBytes(full.take(full.length - 3)) == null)
    val sp = FrameCodec.encodeSpectrumBytes(1L, 2L, 3L, 1500.0, 0.8, 3,
      new GenericArrayData(Array[Any](
        new GenericArrayData(Array(1, 2)),
        new GenericArrayData(Array(3, 4)))))
    assert(FrameCodec.decodeSpectrumBytes(sp.take(40)) == null)
    assert(FrameCodec.decodeSpectrumBytes(sp.take(sp.length - 2)) == null)
  }
}
