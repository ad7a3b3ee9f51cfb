package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- ChannelSlice -----------------------------------------------------

  test("sliceBoundaries = exclusive prefix sum (hand-checked cumsum)") {
    val df = Seq(Seq(2, 0, 3, 1)).toDF("counts")
    val out = df.select(ChannelSlice.sliceBoundaries($"counts")).as[Seq[Int]]
      .head()
    assert(out == Seq(0, 2, 2, 5)) // np.cumsum shifted right, ref hyperion.py:442
  }

  test("channelSlices partitions the peaks array exactly") {
    val peaks = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
    val counts = Seq(2, 0, 3, 1)
    val df = Seq((peaks, counts)).toDF("peaks", "counts")
    val slices = df.select(
      ChannelSlice.channelSlices($"peaks", $"counts")).as[Seq[Seq[Double]]]
      .head()
    assert(slices == Seq(Seq(1.0, 2.0), Seq(), Seq(3.0, 4.0, 5.0), Seq(6.0)))
    assert(slices.flatten == peaks) // partition property
    // 1-based channel access (ref hyperion.py:455-460)
    val ch3 = df.select(ChannelSlice.channel(
      ChannelSlice.channelSlices($"peaks", $"counts"), 3)).as[Seq[Double]]
      .head()
    assert(ch3 == Seq(3.0, 4.0, 5.0))
  }

  test("channelSlicesStatic ≡ channelSlices (HOF) on the same inputs") {
    val counts = Seq(2, 0, 3, 1)
    val df = (0 until 20)
      .map(i => Seq.tabulate(6)(j => (i * 10 + j).toDouble))
      .toDF("peaks")
    val dyn = df.select(ChannelSlice.channelSlices($"peaks",
        array(counts.map(lit): _*)).as("s")).as[Seq[Seq[Double]]].collect()
    val sta = df.select(ChannelSlice.channelSlicesStatic($"peaks", counts)
        .as("s")).as[Seq[Seq[Double]]].collect()
    assert(dyn.toSeq == sta.toSeq)
  }

  // ---- Downsample -------------------------------------------------------

  test("strided keeps every inc-th row in order, restarting per partition") {
    val df = (0 until 25).map(i => (i.toLong, (i % 2).toLong)).toDF("seq", "b")
    val global = Downsample.strided(df, $"seq", 10)
      .select($"seq").as[Long].collect().sorted
    assert(global.toSeq == Seq(0L, 10L, 20L))
    val perBatch = Downsample.strided(df, $"seq", 10, Seq($"b"))
      .select($"b", $"seq").as[(Long, Long)].collect().sorted
    // batch 0 holds evens 0..24 (13 rows): ranks 1,11 -> seq 0, 20
    // batch 1 holds odds (12 rows): ranks 1,11 -> seq 1, 21
    assert(perBatch.toSeq == Seq((0L, 0L), (0L, 20L), (1L, 1L), (1L, 21L)))
  }

  test("stridedByKey equals strided when the key is dense from 0") {
    val df = (0 until 50).map(_.toLong).toDF("seq")
    val a = Downsample.strided(df, $"seq", 7).select($"seq").as[Long]
      .collect().sorted.toSeq
    val b = Downsample.stridedByKey(df, $"seq", 7).select($"seq").as[Long]
      .collect().sorted.toSeq
    assert(a == b)
  }

  // ---- Retention --------------------------------------------------------

  test("surviving keeps rows within ttl of max ts; key alignment finds the rest") {
    val df = (0 until 10).map(i => (i.toLong,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1000L + i * 10))))
      .toDF("id", "ts")
    val surv = Retention.surviving(df, $"ts", 30L)
    // max ts = 1090; cutoff 1060 -> ids 6,7,8,9
    assert(surv.select($"id").as[Long].collect().sorted.toSeq ==
      Seq(6L, 7L, 8L, 9L))
    val expired = Retention.expiredByKeyAlignment(df, $"id", surv, $"id")
    assert(expired.select($"id").as[Long].collect().sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L, 4L, 5L))
  }

  test("dropExpired: partition-drop TTL equals the filter form and " +
      "never rewrites a surviving file") {
    // 51 rows, one per 6 min across 5+ epoch-hours; the LAST ts sits
    // exactly on an hour boundary, so with a ttl that is a multiple of
    // the partition width the row-filter cutoff IS a partition boundary
    // and the two TTL forms must agree exactly
    val df = (0 to 50).map { i =>
      (i.toLong, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(3600L * 1000 + i * 360)))
    }.toDF("id", "ts")
      .withColumn("epoch_hour", floor(col("ts").cast("double") / 3600))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ttl_drop").toString + "/st"
    df.write.partitionBy("epoch_hour").parquet(dir)

    // ttl = 2 h, aligned cutoff -> first surviving hour
    val maxTs = df.agg(max($"ts".cast("double"))).as[Double].head()
    val cutoffHour = (maxTs.toLong - 2 * 3600) / 3600
    val expectSurviving = Retention.surviving(df, $"ts", 2 * 3600L)
      .select($"id").as[Long].collect().sorted.toSeq

    // file inventory of the surviving partitions, before the drop
    def inventory(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> (f.lastModified(), f.length())).toMap
    }
    val survivingBefore = inventory().filter { case (p, _) =>
      "epoch_hour=(\\d+)".r.findFirstMatchIn(p)
        .exists(_.group(1).toLong >= cutoffHour)
    }

    val dropped = Retention.dropExpired(spark, dir, "epoch_hour", cutoffHour)
    assert(dropped.nonEmpty && dropped.forall(_ < cutoffHour))

    // surviving rows = the row-filter form, bit for bit
    val got = spark.read.parquet(dir)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(got == expectSurviving)
    // metadata-only: every surviving file untouched (same path, mtime,
    // size), and nothing else remains
    assert(inventory() == survivingBefore)
    // idempotent: a second pass drops nothing
    assert(Retention.dropExpired(spark, dir, "epoch_hour", cutoffHour)
      .isEmpty)
  }

  // ---- Calibrate --------------------------------------------------------

  test("dBm conversion, wavelength axis, bitmap channels") {
    val df = Seq((Seq(100, 200), 0x0B)).toDF("raw", "bits")
    val db = df.select(Calibrate.toDb($"raw", lit(2.0), lit(-40.0)))
      .as[Seq[Double]].head()
    assert(db == Seq(100 * 0.5 - 40.0, 200 * 0.5 - 40.0))
    val axis = df.select(Calibrate.wavelengthAxis(lit(1500.0), lit(0.5),
      lit(4))).as[Seq[Double]].head()
    assert(axis == Seq(1500.0, 1500.5, 1501.0, 1501.5))
    val chs = df.select(Calibrate.activeChannels($"bits")).as[Seq[Int]].head()
    assert(chs == Seq(0, 1, 3)) // 0x0B = 1011b
  }

  // ---- Export.concurrently (ADVICE r14 semantics) -----------------------

  test("concurrently: zero actions is a no-op, results complete, failure " +
    "rethrows the original exception promptly") {
    Export.concurrently() // must not throw (0-thread pool would)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    Export.concurrently(
      (() => { hits.incrementAndGet(); () }),
      (() => { hits.incrementAndGet(); () }),
      (() => { hits.incrementAndGet(); () }))
    assert(hits.get() == 3)
    // failure: the ORIGINAL exception rethrows (not the
    // ExecutionException wrapper), promptly — not after the slow
    // peers finish. (shutdownNow cancellation of queued work is
    // best-effort: a worker freed by the failing action may grab a
    // queued task before the failure propagates, so "never started"
    // is not a testable guarantee.)
    val boom = new IllegalStateException("export failed")
    val t0 = System.nanoTime()
    val thrown = intercept[IllegalStateException] {
      Export.concurrently(
        (() => throw boom),
        (() => { Thread.sleep(2000); () }),
        (() => { Thread.sleep(2000); () }),
        (() => { Thread.sleep(2000); () }))
    }
    assert(thrown eq boom)
    assert((System.nanoTime() - t0) / 1e6 < 1500,
      "failure must propagate before the slow peers complete")
  }

  // ---- Physics ----------------------------------------------------------

  test("strain / temperature / delay formulas") {
    val df = Seq((1550.5, 1550.0)).toDF("wl", "iwl")
    val strain = df.select(Physics.strain($"wl", $"iwl", 0.89)).as[Double]
      .head()
    assert(math.abs(strain - 1e6 * (0.5 / 1550.0 / 0.89)) < 1e-9)
    val delay = df.select(Physics.delayNs(lit(100.0), lit(1.468)))
      .as[Long].head()
    assert(delay == math.round(2 * 100.0 * 1.468 / 299792458.0 * 1e9))
  }
}
