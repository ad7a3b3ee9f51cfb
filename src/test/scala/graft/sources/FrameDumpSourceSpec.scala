package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ingest.FrameCodec

class FrameDumpSourceSpec extends SparkSpec {
  import spark.implicits._

  private def encodedPeaks(serial: Long): Array[Byte] = {
    val df = Seq(serial).toDF("s")
    df.select(FrameCodec.encodePeaks(col("s"), col("s") + 100,
        col("s") + 200, array(lit(2), lit(1)),
        array(col("s").cast("double") * 1.5, lit(2.5), lit(-3.0))))
      .as[Array[Byte]].head()
  }

  test("reads BBHI-framed dump files back to typed rows, one split per file") {
    val dir = Files.createTempDirectory("graft_dump").toString
    FrameDump.writeFile(s"$dir/part-0.bin",
      Iterator(encodedPeaks(1), encodedPeaks(2)))
    FrameDump.writeFile(s"$dir/part-1.bin", Iterator(encodedPeaks(3)))

    val df = spark.read.format("graft-frames")
      .option("kind", "peaks").load(dir)
    assert(df.rdd.getNumPartitions == 2) // file = split unit
    val rows = df.select($"serial_number", $"timestamp_int",
        element_at($"peak_counts", 1), element_at($"peaks", 1))
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(rows == Set((1L, 101L, 2, 1.5), (2L, 102L, 2, 3.0),
      (3L, 103L, 2, 4.5)))
  }

  test("poison records are skipped, valid neighbors survive") {
    val dir = Files.createTempDirectory("graft_dump_poison").toString
    val good = encodedPeaks(7)
    // record with garbage content (right length, undecodable header) +
    // a trailing truncated record
    val garbage = FrameDump.record(Array.fill[Byte](10)(0x5A))
    val truncated = FrameDump.record(good).take(12)
    val os = new java.io.FileOutputStream(s"$dir/f.bin")
    os.write(FrameDump.record(good)); os.write(garbage); os.write(truncated)
    os.close()
    val rows = spark.read.format("graft-frames")
      .option("kind", "peaks").load(dir)
      .select($"serial_number").as[Long].collect().toSeq
    assert(rows == Seq(7L))
  }

  test("DSv2 write path: df.write.format round-trips through the reader") {
    val src = Files.createTempDirectory("graft_dump_w_src").toString
    FrameDump.writeFile(s"$src/a.bin",
      Iterator(encodedPeaks(1), encodedPeaks(2), encodedPeaks(3)))
    val df = spark.read.format("graft-frames")
      .option("kind", "peaks").load(src)

    val dst = Files.createTempDirectory("graft_dump_w_dst").toString + "/out"
    df.write.format("graft-frames").option("kind", "peaks")
      .mode("append").save(dst)
    val back = spark.read.format("graft-frames")
      .option("kind", "peaks").load(dst)
      .select($"serial_number", element_at($"peaks", 1))
      .as[(Long, Double)].collect().toSet
    assert(back == Set((1L, 1.5), (2L, 3.0), (3L, 4.5)))

    // overwrite truncates the previous files
    df.filter($"serial_number" === 1).write.format("graft-frames")
      .option("kind", "peaks").mode("overwrite").save(dst)
    val after = spark.read.format("graft-frames")
      .option("kind", "peaks").load(dst)
      .select($"serial_number").as[Long].collect().toSeq
    assert(after == Seq(1L))
  }

  test("spectrum kind decodes the matrix through the same source") {
    val dir = Files.createTempDirectory("graft_dump_spec").toString
    val bin = Seq(5L).toDF("s")
      .select(FrameCodec.encodeSpectrum(col("s"), lit(1L), lit(2L),
        lit(1500.0), lit(0.5), lit(3),
        array(array(lit(10), lit(65535)), array(lit(30), lit(40)))))
      .as[Array[Byte]].head()
    FrameDump.writeFile(s"$dir/f.bin", Iterator(bin))
    val r = spark.read.format("graft-frames")
      .option("kind", "spectrum").load(dir)
      .select($"serial_number", $"num_channels", $"num_points",
        $"active_channel_bits", $"spectrum")
      .as[(Long, Int, Int, Int, Seq[Seq[Int]])].head()
    assert(r == ((5L, 2, 2, 3, Seq(Seq(10, 65535), Seq(30, 40)))))
  }
}
