package graft.ingest

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.{Calibrate, Export}

/** Sensor + spectrum synthetic sources (S2/S3/S5/S6) and the CSV export
  * sink (S13). The sf0.001 testdata is the fixture — the same tables the
  * oracle gate reads.
  */
class FrameSourceSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("sensorFrames: one row per event, NumSensors integer-valued doubles") {
    val df = FrameSource.sensorFrames(spark, sf)
    val row = df.orderBy(col("frame_id")).select(col("values")).head()
    val values = row.getSeq[Double](0)
    assert(values.length == FrameSource.NumSensors)
    // integer-valued (cents + k*1000) and strictly increasing by 1000
    values.sliding(2).foreach { case Seq(a, b) => assert(b - a == 1000.0) }
    assert(values.forall(v => v == math.floor(v)))
  }

  test("spectrumFrames: channels x points uint16 matrix with header") {
    val df = FrameSource.spectrumFrames(spark, sf)
    val row = df.select(col("spectrum"), col("active_channel_bits"),
      col("num_points")).head()
    val matrix = row.getSeq[scala.collection.Seq[Int]](0)
    assert(matrix.length == FrameSource.SpectrumChannels)
    assert(matrix.forall(_.length == FrameSource.SpectrumPoints))
    assert(matrix.flatten.forall(v => v >= 0 && v < 65536))
  }

  test("spectrum calibration: active-channel filter matches the bitmap") {
    val sp = FrameSource.spectrumFrames(spark, sf).limit(64)
    val exploded = sp.select(col("frame_id"), col("active_channel_bits"),
        posexplode(col("spectrum")).as(Seq("ch", "raw")))
      .filter(col("active_channel_bits")
        .bitwiseAND(pow(lit(2), col("ch")).cast("int")) =!= 0)
    val got = exploded.select(col("frame_id"), col("ch")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val want = sp.select(col("frame_id"), col("active_channel_bits"))
      .collect().flatMap { r =>
        val bits = r.getInt(1)
        (0 until FrameSource.SpectrumChannels)
          .filter(c => (bits & (1 << c)) != 0).map(c => (r.getLong(0), c))
      }.toSet
    assert(got == want)
    // dBm conversion over one active channel's row is finite and ordered
    // by the raw counts (monotone transform)
    val db = exploded.limit(1)
      .select(Calibrate.toDb(col("raw"), lit(1.0), lit(-40.0)).as("db"))
      .head().getSeq[Double](0)
    assert(db.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("spectrumStream: streaming decode of the nested matrix end to end") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_spec_stream").toString
    FrameSource.spectrumFrames(spark, sf).limit(32)
      .write.parquet(s"$tmp/src")
    val q = FrameSource.spectrumStream(spark, s"$tmp/src")
      .select(col("frame_id"), posexplode(col("spectrum")).as(Seq("ch", "raw")))
      .select(col("frame_id"), col("ch"),
        element_at(col("raw"), 1).as("raw0"))
      .writeStream.format("memory").queryName("spec_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("spec_stream").count() ==
        32L * FrameSource.SpectrumChannels)
    } finally q.stop()
  }

  test("CSV export sink roundtrips exactly") {
    import spark.implicits._
    val src = Seq((1L, 1.25, "a"), (2L, -3.5, "b"), (3L, 0.0, "c,d"))
      .toDF("id", "v", "s")
    val path = System.getProperty("java.io.tmpdir") + "/graft_csv_spec"
    Export.toCsv(src, path)
    val back = Export.fromCsv(spark, path, "id BIGINT, v DOUBLE, s STRING")
    assert(back.orderBy("id").collect().toSeq ==
      src.orderBy("id").collect().toSeq)
  }
}
