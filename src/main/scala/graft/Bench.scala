package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Benchmark main — one JSON line per run, consumed by the driver.
  *
  * Protocol (steady-state, JMH-style):
  *  - one untimed warmup pass over every query: compiles the codegen
  *    classes and lets the JIT reach steady state, so the timed pass
  *    measures the query, not one-time JVM initialization;
  *  - the timed pass forces FULL plan evaluation through the noop sink
  *    (`df.write.format("noop")`) — a `.count()` would let Catalyst prune
  *    every projection down to a metadata count;
  *  - per-query failures are caught and reported in an `"errors"` field
  *    (and the query's time is still recorded), never silently swallowed.
  */
object Bench {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // r15: the r9-era parallelismFirst=false override is REMOVED —
      // back to the Spark default (true). With `false`, the 64 MB
      // advisory size coalesced every multi-MB exchange to 1-2
      // partitions, serializing compute-heavy final stages (measured:
      // q_simhash_pairs 2.2 s → 0.6 s from this alone). The default's
      // coalesce target adapts to input size / core count (floor 1 MB,
      // cap = advisory), so tiny stages still collapse to one task,
      // wide ones keep the machine busy, and at production scale the
      // targets hit the advisory size exactly as before — the
      // scale-adaptive behavior, not a local[32] constant.
      // ~70 queries × several codegen stages cycle the default 100-entry
      // generated-class cache — recompiles then dominate small queries
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // local iteration aid (the driver never sets it): restrict the
    // bench to a comma-separated name list — lets the scaled decades
    // (ScaleCorpus dirs, documents+embeddings only) time their families
    // without the full suite failing on absent tables
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty) // "" degrades to no filter, not an empty bench
    // SPARK_GRAFT_STREAM=only (local iteration aid, r12 verdict item 1):
    // skip the query passes entirely and emit ONLY the streaming figure
    // from a fresh session — isolates the streaming path from whatever
    // cached/persisted state 245 suite queries leave behind in the same
    // JVM, so a throughput slide is attributable to the path vs the
    // co-resident state vs the host.
    val streamOnly = sys.env.get("SPARK_GRAFT_STREAM").contains("only")
    // a typo'd name silently measuring nothing is worse than a crash:
    // the probe's whole point is the named queries
    only.foreach { o =>
      val unknown = o -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names unknown queries: ${unknown.mkString(",")}")
    }
    // conflicting intent must not resolve silently (ADVICE r13): in
    // stream-only mode the query filter is ignored by construction —
    // refuse the combination rather than validate-then-drop the names
    require(!(streamOnly && only.isDefined),
      "SPARK_GRAFT_STREAM=only and SPARK_GRAFT_ONLY are mutually " +
        "exclusive: stream-only mode runs no queries, so a query filter " +
        "would be silently ignored")
    val names =
      if (streamOnly) Seq.empty[String]
      else SparkEntry.queries.keys.toSeq.sorted
        .filter(n => only.forall(_.contains(n)))
    var errors = Map.empty[String, String]

    names.foreach { n =>            // warmup pass (untimed)
      try force(SparkEntry.queries(n)(spark, sfDir))
      catch { case e: Throwable =>
        errors += n -> e.toString.linesIterator.next().take(200) }
    }

    // Two timed passes + targeted re-measure, min per query: a single
    // pass is at the mercy of GC pauses and host-CPU noise (observed:
    // random 5-10 s spikes on a different query each run). Queries whose
    // two timings disagree by >50% get a third measurement — robustness
    // of min-of-3 where it matters, without a full extra pass of
    // driver wall-time.
    def time1(n: String): Double = {
      val t0 = System.nanoTime()
      try force(SparkEntry.queries(n)(spark, sfDir))
      catch { case e: Throwable =>
        errors += n -> e.toString.linesIterator.next().take(200) }
      (System.nanoTime() - t0) / 1e9
    }
    def timedPass(): Map[String, Double] = names.map(n => n -> time1(n)).toMap
    val p1 = timedPass()
    val p2 = timedPass()
    val p3 = names
      .filter(n => math.max(p1(n), p2(n)) > 1.5 * math.min(p1(n), p2(n)))
      .map(n => n -> time1(n)).toMap
    val results = names.map(n =>
      n -> (Seq(p1(n), p2(n)) ++ p3.get(n)).min)

    // Locale.ROOT explicitly: the f-interpolator formats with the JVM
    // default locale, and a comma-decimal locale (de_DE) would emit
    // "0,1237" — unparseable JSON (ADVICE r4)
    def fmt(v: Double, dec: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${dec}f", Double.box(v))
    // 0.1 ms per-query resolution: full-precision doubles made the r3
    // stdout line long enough that the driver's capture truncated it
    // mid-key ("parsed": null); the compact form parses end to end
    val qs = results.map { case (k, v) => s""""$k":${fmt(v, 4)}""" }
      .mkString("{", ",", "}")
    val errs = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"$k\":\"${v.replace("\\", "\\\\").replace("\"", "\\\"")}\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // a filtered run is a query-timing probe, not the driver contract —
    // scaled decades carry no frame files for the streaming figure
    val streaming =
      if (only.isDefined && !streamOnly) "{}"
      else streamingFigure(spark, sfDir)
    val core =
      s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"streaming":$streaming,"errors":$errs"""
    // Two stdout line shapes, disambiguated by a trailing "line" tag
    // (ADVICE r5): "summary" = headline totals only, "full" = totals +
    // the per-query map. A consumer keying on "line" (or on the
    // presence of "queries") can't double-count.
    val summaryLine = core + ""","line":"summary"}"""
    val json = core + s""","queries":$qs,"line":"full"}"""
    // The driver's stdout capture keeps only a bounded window: with ~97
    // queries the full line overflows it, leaving BENCH_r{3,4}.json
    // "parsed": null. Emit the compact summary BEFORE the full line
    // (survives a head-capture) AND after it (survives a tail-capture),
    // so the headline numbers parse whichever end gets truncated;
    // per-query detail lives in the full line and bench_out.json.
    println(summaryLine)
    println(json)
    // r15 (verdict item 2, additions only — timing untouched): the
    // driver keeps a ~2 KB tail of stdout, which can never hold the
    // ~6 KB single-line per-query map. Emit the map ALSO as short
    // chunked lines ("line":"queries", fixed part/n_parts), each a
    // complete JSON object well under the tail window, so whatever
    // suffix survives capture carries parseable per-query detail; the
    // final line stays the compact summary (the headline contract).
    val chunks = results.grouped(40).toSeq
    chunks.zipWithIndex.foreach { case (c, i) =>
      val m = c.map { case (k, v) => s""""$k":${fmt(v, 4)}""" }
        .mkString("{", ",", "}")
      println(s"""{"metric":"queries","part":${i + 1},""" +
        s""""n_parts":${chunks.size},"queries":$m,"line":"queries"}""")
    }
    println(summaryLine)
    // also persist as a file: bench_out.json survives verbatim
    try Files.writeString(
      java.nio.file.Paths.get("bench_out.json"), json + "\n")
    catch { case _: Throwable => () }
    spark.stop()
    // repeat the contract lines AFTER spark.stop(): once the session is
    // down no late task-completion log line (e.g. the benign
    // "non-existent accumulator" ERRORs from AQE-cancelled stages) can
    // interleave, so a tail capture of the merged streams still ends
    // with parseable JSON — chunked per-query lines, summary last
    chunks.zipWithIndex.foreach { case (c, i) =>
      val m = c.map { case (k, v) => s""""$k":${fmt(v, 4)}""" }
        .mkString("{", ",", "}")
      println(s"""{"metric":"queries","part":${i + 1},""" +
        s""""n_parts":${chunks.size},"queries":$m,"line":"queries"}""")
    }
    println(summaryLine)
  }

  /** End-to-end streaming throughput over the FULL custom data path:
    * every frame derived from the sf dir's events is ENCODED to the
    * reference's wire format, landed as BBHI-framed dump files
    * (time-ordered, name-sorted — the landing contract), then streamed
    * back through the `graft-frames` MicroBatchStream (real offsets +
    * `maxFramesPerTrigger` admission control, the reference's
    * rate-limited producer loop) into the PeakStreaming pipeline
    * (byte decode → watermark → hourly windows → VecMean → idempotent
    * dual st/lt sinks). ~16 admission-controlled micro-batches per
    * drain, so watermark advancement and state eviction are exercised
    * batch over batch. frames_per_sec is processing capacity — compare
    * the reference's 10 Hz live ingest loop.
    */
  private def streamingFigure(spark: SparkSession, sfDir: String): String =
    try {
      import org.apache.spark.sql.functions._
      import graft.util.Tables.epochS
      val tmp = Files.createTempDirectory("graft_stream_bench").toString
      val src = s"$tmp/src"
      val frames = graft.ingest.FrameSource.frames(spark, sfDir)
      val Array(mnMs, mxMs) = frames
        .agg(min(unix_millis(col("ts"))), max(unix_millis(col("ts"))))
        .head().toSeq.map(_.asInstanceOf[Long]).toArray
      val nSlices = 16
      val width = math.max(1L, (mxMs - mnMs) / nSlices + 1)
      // wire-encode each time slice into one landing file; file names
      // sort in time order (the producer contract)
      val sliced = frames.withColumn("__slice",
        ((unix_millis(col("ts")) - mnMs) / width).cast("int"))
      import spark.implicits._
      for (i <- 0 until nSlices) {
        val bin = sliced.filter(col("__slice") === i)
          .select(graft.ingest.FrameCodec.encodePeaks(
            col("serial_number"), floor(epochS(col("ts"))).cast("long"),
            col("frame_id") % 1000000000L,
            col("peak_counts"), col("peaks")).as("b"))
          .coalesce(1)
        bin.as[Array[Byte]].foreachPartition {
          (it: Iterator[Array[Byte]]) =>
            graft.sources.FrameDump.writeFile(f"$src/part-$i%03d.bin", it)
        }
      }
      val n = spark.read.format("graft-frames").option("kind", "peaks")
        .load(src).count()
      val perTrigger = math.max(1L, n / nSlices + 1)
      // Size the STATE partitioning to the micro-batch volume — the
      // standard Structured Streaming sizing rule the batch side
      // already follows for shuffle.partitions. A stateful operator
      // shuffles every micro-batch into shuffle.partitions state
      // stores; at ~6k frames/trigger, 32 stores mean 512
      // provider-maintenance/commit cycles per drain doing ~200 rows
      // each — pure fixed cost. Measured on this host (stream-only,
      // same hour): 32 partitions → 2,417 f/s (agg 22.9 s); 16 →
      // 3,393 (16.4 s); 8 → 4,377 (12.6 s). At production volume the
      // SAME dial turns the other way (thousands of partitions for
      // TB-scale state); the point is it is a dial. Derived, not
      // hardcoded (r13 verdict item 4): ceil(perTrigger / 800) rows
      // per state partition per trigger — reproduces 8 at the current
      // 100k-frame/16-slice drain and re-sizes itself if the drain
      // volume ever changes; floor 4 keeps a tiny drain parallel.
      val drainPartitions =
        math.max(4L, (perTrigger + 799L) / 800L).toString
      val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
      // two full drains (fresh sinks/checkpoint each), min by elapsed:
      // the 16-micro-batch drain schedules ~50 jobs and is the figure
      // most exposed to host-CPU noise — same rationale as the query
      // passes' min-of-2
      def drain(run: Int): (Double, Int, Long, Long) = {
        val st = s"$tmp/st$run"; val lt = s"$tmp/lt$run"
        val t0 = System.nanoTime()
        val decoded = spark.readStream.format("graft-frames")
          .option("kind", "peaks")
          .option("maxFramesPerTrigger", perTrigger.toString)
          .load(src)
          .select(col("timestamp_frac").as("frame_id"),
            timestamp_seconds(col("timestamp_int")).as("ts"),
            col("serial_number"), col("peak_counts"), col("peaks"))
        val query = graft.pipeline.PeakStreaming.stream(
            decoded, st, lt, s"$tmp/ck$run",
            windowMs = 3600 * 1000)
          .trigger(Trigger.AvailableNow())
          .start()
        query.awaitTermination()
        val sec = (System.nanoTime() - t0) / 1e9
        ((sec), query.recentProgress.count(_.numInputRows > 0),
          spark.read.parquet(st).count(), spark.read.parquet(lt).count())
      }
      // Component attribution (r11 verdict item 3): the end-to-end
      // figure slid 3,743→2,760 f/s across rounds 9-11 with no code
      // change on the path — time the read→decode prefix and the
      // read→agg prefix separately (noop sink, same admission control)
      // so any future movement is attributable to a stage: sink cost =
      // full − agg, agg cost = agg − read. min-of-2 each, like the
      // full drain.
      def prefixDrain(run: Int, withAgg: Boolean): Double = {
        val t0 = System.nanoTime()
        val decoded = spark.readStream.format("graft-frames")
          .option("kind", "peaks")
          .option("maxFramesPerTrigger", perTrigger.toString)
          .load(src)
          .select(col("timestamp_frac").as("frame_id"),
            timestamp_seconds(col("timestamp_int")).as("ts"),
            col("serial_number"), col("peak_counts"), col("peaks"))
        val staged =
          if (withAgg) graft.pipeline.PeakStreaming.streamAgg(
            decoded, windowMs = 3600 * 1000)
          else decoded
        val q = staged.writeStream
          .outputMode("append")
          .option("checkpointLocation",
            s"$tmp/ck_${if (withAgg) "agg" else "read"}$run")
          .format("noop")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        (System.nanoTime() - t0) / 1e9
      }
      // The drain-sized override must not outlive this section whatever
      // throws (ADVICE r13): ONE finally covers the full drains +
      // attribution span, so neither a later query pass nor the outer
      // error-JSON path ever runs under the drain partitioning.
      val (sec, nBatches, stRows, ltRows, attribution) =
        try {
          spark.conf.set("spark.sql.shuffle.partitions", drainPartitions)
          val (s, nb, st, lt) = Seq(drain(1), drain(2)).minBy(_._1)
          // attribution drains get their own try (ADVICE r12): a failure
          // here must degrade the stage split to null, not discard the
          // already-measured end-to-end figure above
          val attr =
            try {
              val readSec =
                Seq(prefixDrain(1, false), prefixDrain(2, false)).min
              val aggSec =
                Seq(prefixDrain(1, true), prefixDrain(2, true)).min
              s""","read_sec":$readSec,"agg_sec":$aggSec,""" +
                s""""sink_sec":${math.max(s - aggSec, 0.0)},""" +
                s""""read_fps":${(n / readSec).toLong},""" +
                s""""agg_fps":${(n / aggSec).toLong}"""
            } catch {
              case e: Throwable =>
                s""","attribution_error":"${e.toString.linesIterator.next()
                  .take(200).replace("\\", "\\\\").replace("\"", "\\\"")}""""
            }
          (s, nb, st, lt, attr)
        } finally {
          spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        }
      val fps = (n / sec).toLong
      // regression floor (warn-only). History: the r13 round-commit
      // bisect (PERF.md) proved the r9-r12 figure spread
      // (2,0xx-3,7xx f/s at the old 32-partition drain) was HOST
      // variance; the r13 state-partition re-size then moved the
      // figure's regime to 4,2xx-4,4xx f/s ±2% on the SLOWEST host
      // class observed so far. The floor sits ~17% under that band —
      // the same margin the old 2500 floor kept under its hosts. A
      // sub-3500 reading flags a noisy/slow host first; before calling
      // it a code regression, bisect with SPARK_GRAFT_STREAM=only
      // min-of-3 against a known-good commit on the SAME host.
      if (fps < 3500)
        System.err.println(s"[bench] WARN streaming throughput $fps f/s " +
          "below the 3500 f/s floor — host-noise flag first (r13 bisect " +
          "+ re-size, PERF.md); confirm with SPARK_GRAFT_STREAM=only " +
          "min-of-3 before suspecting the path")
      s"""{"frames":$n,"elapsed_sec":$sec,"frames_per_sec":$fps,""" +
        s""""n_batches":$nBatches,"st_rows":$stRows,"lt_rows":$ltRows""" +
        attribution + "}"
    } catch {
      case e: Throwable =>
        s"""{"error":"${e.toString.linesIterator.next().take(200)
          .replace("\\", "\\\\").replace("\"", "\\\"")}"}"""
    }
}
