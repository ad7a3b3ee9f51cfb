package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.ingest.FrameCodec

/** The micro-batch streaming form of `graft-frames`: offset semantics,
  * admission control (`maxFramesPerTrigger`), AvailableNow drains,
  * exactly-once delivery through the idempotent PeakStreaming sink
  * (crash-replay proof), and bounded per-batch intake (the reference's
  * bounded-queue backpressure, database_peak_streaming.py:109).
  */
class FrameStreamSpec extends SparkSpec {
  import spark.implicits._

  private def encodedPeaks(id: Long, tsSec: Long): Array[Byte] =
    Seq(id).toDF("s")
      .select(FrameCodec.encodePeaks(col("s"), lit(tsSec), col("s"),
        array(lit(1), lit(1)),
        array(col("s").cast("double"), col("s").cast("double") + 10)))
      .as[Array[Byte]].head()

  /** n frames across `files` dump files, frame i at t0+i seconds. */
  private def writeDump(dir: String, n: Int, files: Int,
                        t0: Long = 1700000000L): Unit = {
    val perFile = (n + files - 1) / files
    for (f <- 0 until files) {
      val ids = (f * perFile) until math.min(n, (f + 1) * perFile)
      FrameDump.writeFile(f"$dir/part-$f%03d.bin",
        ids.iterator.map(i => encodedPeaks(i.toLong, t0 + i)))
    }
  }

  private def streamDf(dir: String, maxPerTrigger: Int) =
    spark.readStream.format("graft-frames")
      .option("kind", "peaks")
      .option("maxFramesPerTrigger", maxPerTrigger.toString)
      .load(dir)

  test("offsets advance, every frame arrives exactly once, batches " +
      "respect maxFramesPerTrigger") {
    val dir = Files.createTempDirectory("graft_stream_src").toString
    writeDump(dir, n = 100, files = 4)
    val out = Files.createTempDirectory("graft_stream_out").toString

    val q = streamDf(dir, maxPerTrigger = 17)
      .select($"serial_number", $"timestamp_int")
      .writeStream
      .option("checkpointLocation", s"$out/ck")
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", s"$out/rows")
      .start()
    q.awaitTermination()

    val got = spark.read.parquet(s"$out/rows")
      .select($"serial_number").as[Long].collect().sorted.toSeq
    assert(got == (0L until 100L)) // exactly once, nothing lost
    val progress = q.recentProgress.filter(_.numInputRows > 0)
    assert(progress.length == 6) // ceil(100/17) admission-controlled batches
    assert(progress.forall(_.numInputRows <= 17),
      progress.map(_.numInputRows).mkString(","))
    // committed offsets are the frame ordinals plus the per-file index
    // snapshot (restart validation): the checkpoint's last offset must
    // read back as ordinal 100 over the 4 landing files
    val offsetsDir = new java.io.File(s"$out/ck/offsets")
    val last = offsetsDir.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toInt)
    val lastOffset = Files.readAllLines(last.toPath).toArray.mkString("\n")
      .linesIterator.toSeq.last.trim
    val parsed = FrameOffset.fromJson(lastOffset)
    assert(parsed.frame == 100L, s"checkpoint offset: $lastOffset")
    assert(parsed.files.length == 4 && parsed.files.map(_._2).sum == 100L,
      s"offset file snapshot: $lastOffset")
  }

  test("growing landing dir: new files picked up by the next trigger") {
    val dir = Files.createTempDirectory("graft_stream_grow").toString
    writeDump(dir, n = 20, files = 1)
    val out = Files.createTempDirectory("graft_stream_grow_out").toString

    def drain(): Unit = {
      val q = streamDf(dir, maxPerTrigger = 50)
        .select($"serial_number")
        .writeStream
        .option("checkpointLocation", s"$out/ck")
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", s"$out/rows")
        .start()
      q.awaitTermination()
    }
    drain()
    // append a SECOND landing file (names must sort after — the
    // producer contract) and drain again from the same checkpoint
    FrameDump.writeFile(s"$dir/part-001.bin",
      (20 until 30).iterator.map(i => encodedPeaks(i.toLong, 1700000050L)))
    drain()
    val got = spark.read.parquet(s"$out/rows")
      .select($"serial_number").as[Long].collect().sorted.toSeq
    assert(got == (0L until 30L))
  }

  test("a landing file rewritten while the stream is DOWN is detected " +
      "on restart (offset-log snapshot validation)") {
    val dir = Files.createTempDirectory("graft_stream_rewrite").toString
    writeDump(dir, n = 20, files = 1)
    val out = Files.createTempDirectory("graft_stream_rewrite_o").toString
    def drain(): Unit = {
      val q = streamDf(dir, maxPerTrigger = 50)
        .select($"serial_number")
        .writeStream
        .option("checkpointLocation", s"$out/ck")
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", s"$out/rows")
        .start()
      q.awaitTermination()
    }
    drain()
    // rewrite the SEEN file with more frames while no stream instance is
    // alive: a fresh instance re-counts it cleanly (the in-memory
    // immutability checks never saw the change), so only the offset-log
    // snapshot can catch the shifted cumulative ranges
    FrameDump.writeFile(s"$dir/part-000.bin",
      (0 until 25).iterator.map(i => encodedPeaks(100 + i.toLong,
        1700000100L + i)))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("changed across restart")),
      s"unexpected failure: $e")
  }

  test("sensor and spectrum kinds stream through the same source") {
    import graft.ingest.FrameCodec
    val t0 = 1700000000L
    // sensor dump
    val sensorDir = Files.createTempDirectory("graft_stream_sensor").toString
    val sensorBin = (0 until 25).map { i =>
      Seq(i).toDF("s").select(FrameCodec.encodeSensor(lit(0), lit(0),
        col("s").cast("long"), lit(t0 + i), col("s").cast("long"),
        array(col("s").cast("double") * 2, lit(5.0))))
        .as[Array[Byte]].head()
    }
    FrameDump.writeFile(s"$sensorDir/part-000.bin", sensorBin.iterator)
    val sOut = Files.createTempDirectory("graft_stream_sensor_o").toString
    val sq = spark.readStream.format("graft-frames")
      .option("kind", "sensor").option("maxFramesPerTrigger", "10")
      .load(sensorDir)
      .select($"serial_number", element_at($"values", 1).as("v1"))
      .writeStream.option("checkpointLocation", s"$sOut/ck")
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", s"$sOut/rows").start()
    sq.awaitTermination()
    val sGot = spark.read.parquet(s"$sOut/rows")
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(sGot == (0 until 25).map(i => (i.toLong, i * 2.0)))
    assert(sq.recentProgress.count(_.numInputRows > 0) == 3) // 25/10

    // spectrum dump
    val specDir = Files.createTempDirectory("graft_stream_spec").toString
    val specBin = (0 until 6).map { i =>
      Seq(i).toDF("s").select(FrameCodec.encodeSpectrum(
        col("s").cast("long"), lit(t0 + i), lit(0L), lit(1500.0), lit(0.5),
        lit(3), array(array(lit(i * 10), lit(20)), array(lit(30), lit(40)))))
        .as[Array[Byte]].head()
    }
    FrameDump.writeFile(s"$specDir/part-000.bin", specBin.iterator)
    val pOut = Files.createTempDirectory("graft_stream_spec_o").toString
    val pq = spark.readStream.format("graft-frames")
      .option("kind", "spectrum").option("maxFramesPerTrigger", "2")
      .load(specDir)
      .select($"serial_number", $"num_channels",
        element_at(element_at($"spectrum", 1), 1).as("m00"))
      .writeStream.option("checkpointLocation", s"$pOut/ck")
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", s"$pOut/rows").start()
    pq.awaitTermination()
    val pGot = spark.read.parquet(s"$pOut/rows")
      .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    assert(pGot == (0 until 6).map(i => (i.toLong, 2, i * 10)))
    assert(pq.recentProgress.count(_.numInputRows > 0) == 3) // 6/2
  }

  test("crash replay is idempotent: a re-run batch overwrites its own " +
      "batch_id partition, never duplicates") {
    val dir = Files.createTempDirectory("graft_replay_src").toString
    writeDump(dir, n = 120, files = 3)
    val out = Files.createTempDirectory("graft_replay_out").toString
    val st = s"$out/st"; val lt = s"$out/lt"; val ck = s"$out/ck"

    def drain(): Unit = {
      val frames = streamDf(dir, maxPerTrigger = 40)
        .select($"timestamp_frac".as("frame_id"),
          timestamp_seconds($"timestamp_int").as("ts"),
          $"serial_number", $"peak_counts", $"peaks")
      val q = graft.pipeline.PeakStreaming
        .stream(frames, st, lt, ck, windowMs = 10 * 1000)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // deregistration from the per-checkpoint active-query lock can
      // trail awaitTermination; the restart below reuses the checkpoint
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.streams.active.exists(_.id == q.id) &&
          System.nanoTime() < deadline) Thread.sleep(50)
    }
    drain()
    val stRows = spark.read.parquet(st).count()
    val ltRows = spark.read.parquet(lt).count()
    assert(stRows > 0 && ltRows > 0)

    // simulate a crash BETWEEN the sink write and the commit record:
    // delete the newest commit file; on restart Structured Streaming
    // re-runs that batch's foreachBatch against the same sinks
    val commits = new java.io.File(s"$ck/commits")
    val newest = commits.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toInt)
    assert(newest.delete())
    // the local FS keeps a sibling checksum file; a stale one blocks
    // the commit log's atomic re-write of the replayed batch
    new java.io.File(commits, s".${newest.getName}.crc").delete()
    drain()

    assert(spark.read.parquet(st).count() == stRows,
      "replayed batch duplicated short-term rows")
    assert(spark.read.parquet(lt).count() == ltRows,
      "replayed batch duplicated long-term rows")
    // batch ids are still unique partitions
    val perBatch = spark.read.parquet(st)
      .groupBy($"batch_id").count().as[(Long, Long)].collect().toMap
    assert(perBatch.keySet.size == perBatch.size)
  }

  test("restart replay: a FRESH stream instance replans a checkpointed " +
      "offset range (planInputPartitions rebuilds the file index)") {
    // On recovery Spark replays an uncommitted batch straight from the
    // offset log WITHOUT calling latestOffset first — the fresh
    // instance must rebuild its index inside planInputPartitions or the
    // replayed batch silently plans zero partitions (ADVICE r4, high).
    val dir = Files.createTempDirectory("graft_replan_src").toString
    writeDump(dir, n = 30, files = 2)
    val s = new FrameMicroBatchStream(dir, "peaks", Some(10L),
      spark.sessionState.newHadoopConf())
    val parts = s.planInputPartitions(FrameOffset(0), FrameOffset(25))
    assert(parts.map(_.asInstanceOf[FrameRangePartition].take).sum == 25L,
      s"fresh instance planned ${parts.length} partitions")
    // and a range the landing dir cannot cover is a loud failure,
    // never a silent short read
    intercept[IllegalStateException] {
      s.planInputPartitions(FrameOffset(0), FrameOffset(31))
    }
  }

  test("ProcessingTime restart: the uncommitted batch replays with its " +
      "rows, not as a silent empty batch") {
    val dir = Files.createTempDirectory("graft_pt_src").toString
    writeDump(dir, n = 90, files = 3)
    val out = Files.createTempDirectory("graft_pt_out").toString

    def run(): Unit = {
      val q = streamDf(dir, maxPerTrigger = 40)
        .select($"serial_number")
        .writeStream
        .option("checkpointLocation", s"$out/ck")
        .trigger(Trigger.ProcessingTime("25 milliseconds"))
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           id: Long) =>
            df.write.mode("overwrite").parquet(s"$out/batches/b$id")
            ()
        }
        .start()
      q.processAllAvailable()
      q.stop(); q.awaitTermination()
    }
    run()
    // crash between the sink write and the commit record of the last
    // batch: on restart the ProcessingTime path replays that batch from
    // the offset log without refreshing the (empty) index first
    val commits = new java.io.File(s"$out/ck/commits")
    val newest = commits.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toInt)
    assert(newest.delete())
    new java.io.File(commits, s".${newest.getName}.crc").delete()
    run()
    val batchDirs = new java.io.File(s"$out/batches").listFiles()
      .map(_.toString).toSeq
    val got = spark.read.parquet(batchDirs: _*)
      .select($"serial_number").distinct().as[Long].collect().sorted.toSeq
    assert(got == (0L until 90L),
      s"replayed batch lost frames: got ${got.size}/90")
  }

  test("in-place growth of a seen landing file is a loud failure") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = Files.createTempDirectory("graft_grow_src").toString
    writeDump(dir, n = 10, files = 1)
    val s = new FrameMicroBatchStream(dir, "peaks", None,
      spark.sessionState.newHadoopConf())
    assert(s.latestOffset(FrameOffset(0), ReadLimit.allAvailable())
      .asInstanceOf[FrameOffset].frame == 10L)
    // violate the immutability contract: append bytes to the seen file
    val f = new java.io.File(dir).listFiles().filter(_.isFile)
      .filterNot(_.getName.startsWith(".")).head
    Files.write(f.toPath, encodedPeaks(99L, 1700000100L),
      java.nio.file.StandardOpenOption.APPEND)
    new java.io.File(dir, s".${f.getName}.crc").delete() // local-FS checksum
    intercept[IllegalStateException] {
      s.latestOffset(FrameOffset(10), ReadLimit.allAvailable())
    }
  }

  test("FrameDumpReader skip with default take does not overflow") {
    val dir = Files.createTempDirectory("graft_skip_src").toString
    writeDump(dir, n = 12, files = 1)
    val f = new java.io.File(dir).listFiles().filter(_.isFile)
      .filterNot(_.getName.startsWith(".")).head.toString
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val r = new FrameDumpReader(f, "peaks", conf, skip = 5L)
    var n = 0
    while (r.next()) n += 1
    r.close()
    assert(n == 7, s"skip=5 over 12 records read $n rows") // 12 - 5
  }

  test("backpressure: bounded intake and bounded windowed state under " +
      "a time-ordered drain") {
    val dir = Files.createTempDirectory("graft_bp_src").toString
    // 300 frames, 1 s apart -> 30 ten-second windows, time-ordered files
    writeDump(dir, n = 300, files = 6)
    val out = Files.createTempDirectory("graft_bp_out").toString

    val frames = streamDf(dir, maxPerTrigger = 30)
      .select($"timestamp_frac".as("frame_id"),
        timestamp_seconds($"timestamp_int").as("ts"),
        $"serial_number", $"peak_counts", $"peaks")
    val q = graft.pipeline.PeakStreaming
      .stream(frames, s"$out/st", s"$out/lt", s"$out/ck",
        windowMs = 10 * 1000)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val progress = q.recentProgress.filter(_.numInputRows > 0)
    assert(progress.length >= 10) // 300/30: genuinely incremental drain
    assert(progress.forall(_.numInputRows <= 30)) // the queue bound
    // watermark eviction keeps state bounded: the snapshot plateaus at
    // ~in-flight + watermark-lag windows (observed steady 10) instead
    // of accreting all 30 windows of the run — the streaming analogue
    // of the reference's bounded queue
    val stateRows = progress.flatMap(_.stateOperators.map(_.numRowsTotal))
    assert(stateRows.nonEmpty && stateRows.max <= 12,
      s"state rows per batch: ${stateRows.mkString(",")}")
    assert(stateRows.takeRight(3).forall(_ == stateRows.last),
      s"state still growing: ${stateRows.mkString(",")}")
  }
}
