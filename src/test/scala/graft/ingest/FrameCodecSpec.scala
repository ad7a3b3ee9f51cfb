package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the wire layout to the reference's struct formats byte-for-byte
  * (hyperion.py:424-453 peaks `HHIQII`, 388-420 sensor `HBBIQII`,
  * 475-500 spectrum `HHIQIIddIHH` — native little-endian, no padding).
  * The fixtures are built field-by-field with ByteBuffer exactly as
  * Python's `struct.pack` would lay them out, so a codec that is
  * internally consistent but offset-wrong fails here even though the
  * round-trip queries would pass.
  */
class FrameCodecSpec extends SparkSpec {

  private def decodePeaksRow(bytes: Array[Byte]): Row = {
    import spark.implicits._
    Seq(bytes).toDF("b")
      .select(FrameCodec.decodePeaks(col("b")).as("f"))
      .select("f.*").head()
  }

  test("peaks decode: hand-built HHIQII frame") {
    // length=28 (24 hdr + 2 counts*int16), version=3, serial=0xA1B2C3D4E5L,
    // ts=(1700000000, 250000000), counts=[2,1], peaks=[1.5, -2.25, 1e9]
    val buf = ByteBuffer.allocate(28 + 3 * 8).order(ByteOrder.LITTLE_ENDIAN)
    buf.putShort(28).putShort(3).putInt(0)
    buf.putLong(0xA1B2C3D4E5L)
    buf.putInt(1700000000).putInt(250000000)
    buf.putShort(2).putShort(1)
    buf.putDouble(1.5).putDouble(-2.25).putDouble(1e9)
    val f = decodePeaksRow(buf.array())
    assert(f.getInt(0) == 28 && f.getInt(1) == 3)
    assert(f.getLong(2) == 0xA1B2C3D4E5L)
    assert(f.getLong(3) == 1700000000L && f.getLong(4) == 250000000L)
    assert(f.getSeq[Int](5) == Seq(2, 1))
    assert(f.getSeq[Double](6) == Seq(1.5, -2.25, 1e9))
  }

  test("peaks decode: u32 timestamp reads unsigned, truncated frame is null") {
    val buf = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
    buf.putShort(24).putShort(1).putInt(0).putLong(7L)
    buf.putInt(0xFFFFFFFF).putInt(0x80000000) // u32 max, u32 2^31
    val f = decodePeaksRow(buf.array())
    assert(f.getLong(3) == 4294967295L && f.getLong(4) == 2147483648L)

    import spark.implicits._
    val dec = Seq(Array[Byte](1, 2, 3)).toDF("b")
      .select(FrameCodec.decodePeaks(col("b")).as("f")).head()
    assert(dec.isNullAt(0))
  }

  test("sensor decode: hand-built HBBIQII frame") {
    // header_length=24, status=200, buffer=55, serial=99, ts=(123,456),
    // values=[0.5, 2.0]
    val buf = ByteBuffer.allocate(24 + 16).order(ByteOrder.LITTLE_ENDIAN)
    buf.putShort(24).put(200.toByte).put(55.toByte).putInt(0)
    buf.putLong(99L).putInt(123).putInt(456)
    buf.putDouble(0.5).putDouble(2.0)
    import spark.implicits._
    val f = Seq(buf.array()).toDF("b")
      .select(FrameCodec.decodeSensor(col("b")).as("f"))
      .select("f.*").head()
    assert(f.getInt(0) == 24)
    assert(f.getInt(1) == 200 && f.getInt(2) == 55) // u8 read unsigned
    assert(f.getLong(3) == 99L)
    assert(f.getLong(4) == 123L && f.getLong(5) == 456L)
    assert(f.getSeq[Double](6) == Seq(0.5, 2.0))
  }

  test("spectrum decode: hand-built HHIQIIddIHH frame with 2x3 matrix") {
    val buf = ByteBuffer.allocate(48 + 2 * 2 * 3).order(ByteOrder.LITTLE_ENDIAN)
    buf.putShort(48).putShort(2).putInt(0)
    buf.putLong(4242L).putInt(111).putInt(222)
    buf.putDouble(1510.25).putDouble(0.125)
    buf.putInt(3).putShort(2).putShort(0x0005)
    // row-major uint16, incl. a value above Short.MaxValue
    Seq(1, 2, 65535, 40000, 5, 6).foreach(v => buf.putShort(v.toShort))
    import spark.implicits._
    val f = Seq(buf.array()).toDF("b")
      .select(FrameCodec.decodeSpectrum(col("b")).as("f"))
      .select("f.*").head()
    assert(f.getInt(0) == 48 && f.getInt(1) == 2)
    assert(f.getLong(2) == 4242L)
    assert(f.getLong(3) == 111L && f.getLong(4) == 222L)
    assert(f.getDouble(5) == 1510.25 && f.getDouble(6) == 0.125)
    assert(f.getInt(7) == 3 && f.getInt(8) == 2 && f.getInt(9) == 5)
    assert(f.getSeq[Seq[Int]](10) ==
      Seq(Seq(1, 2, 65535), Seq(40000, 5, 6)))
  }

  test("decode ∘ encode = id over a DataFrame of frames") {
    import spark.implicits._
    val df = spark.range(50).select(
      col("id").as("serial"),
      (col("id") + 1700000000L).as("ts_int"),
      (col("id") * 1000).as("ts_frac"),
      array(lit(2), lit(3), lit(1)).as("counts"),
      array(col("id").cast("double") * 1.5,
        col("id").cast("double") - 0.25,
        lit(3.75), lit(-1e6), col("id").cast("double"), lit(0.0))
        .as("peaks"))
    val rt = df.select(col("serial"), col("ts_int"), col("ts_frac"),
        col("counts"), col("peaks"),
        FrameCodec.decodePeaks(FrameCodec.encodePeaks(col("serial"),
          col("ts_int"), col("ts_frac"), col("counts"), col("peaks")))
          .as("f"))
    assert(rt.filter(
      col("f.serial_number") =!= col("serial") ||
        col("f.timestamp_int") =!= col("ts_int") ||
        col("f.timestamp_frac") =!= col("ts_frac") ||
        col("f.peak_counts") =!= col("counts") ||
        col("f.peaks") =!= col("peaks")).count() == 0)
  }

  test("spectrum decode ∘ encode = id incl. uint16 wrap") {
    val df = spark.range(20).select(
      col("id").as("serial"),
      lit(1700000001L).as("ts_int"), lit(5L).as("ts_frac"),
      lit(1500.5).as("swl"), lit(0.25).as("winc"),
      (col("id") % 16).cast("int").as("bits"),
      array(
        array((col("id") % 65536).cast("int"),
          ((col("id") + 60000) % 65536).cast("int")),
        array(lit(65535), lit(0))).as("m"))
    val rt = df.select(col("*"),
      FrameCodec.decodeSpectrum(FrameCodec.encodeSpectrum(col("serial"),
        col("ts_int"), col("ts_frac"), col("swl"), col("winc"),
        col("bits"), col("m"))).as("f"))
    assert(rt.filter(
      col("f.serial_number") =!= col("serial") ||
        col("f.start_wavelength") =!= col("swl") ||
        col("f.wavelength_increment") =!= col("winc") ||
        col("f.active_channel_bits") =!= col("bits") ||
        col("f.num_channels") =!= lit(2) ||
        col("f.num_points") =!= lit(2) ||
        col("f.spectrum") =!= col("m")).count() == 0)
  }

  test("decode expressions stay inside whole-stage codegen") {
    // range source (not a foldable literal, which would constant-fold the
    // whole projection into a LocalTableScan)
    val plan = spark.range(10)
      .select(FrameCodec.decodePeaks(
        FrameCodec.encodePeaks(col("id"), col("id"), col("id"),
          array(lit(1)), array(col("id").cast("double")))).as("f"))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix is the WholeStageCodegen marker in the simple
    // plan string; a fallen-out Project would print without it
    assert(plan.linesIterator.exists(l =>
      l.trim.startsWith("*(") && l.contains("static_invoke")),
      s"decode fell out of codegen:\n$plan")
  }
}
