package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.ingest.{FrameCodec, FrameSource}
import graft.ops._
import graft.model.InstrumentConfig
import graft.pipeline.{Analyze, PeakStreaming}

/** Oracle-checked queries covering the reference's operator inventory
  * (SURVEY.md §2): every S/P/A/F operator with a batch-expressible form.
  *
  * Each entry has a DuckDB-equivalent in [[oracle]] formulated over the
  * same parquet; float aggregates use the floor-based r() rounding
  * (Tables.r) so associativity differences can't flip the hash gate.
  */
object ReferenceQueries {
  type Q = (SparkSession, String) => DataFrame

  /** floor-based round for oracle SQL, mirroring Tables.r */
  private def rs(e: String, p: Int = 4): String = {
    val m = math.pow(10, p).toLong
    s"floor(($e)*$m + 0.5)/$m"
  }
  private val winH = "cast(floor(epoch(ts)/3600)*3600 as bigint)"

  val defs: Map[String, Q] = Map(
    // S12/P1 — full scan + projection (ref: analyze_data.py:44-51)
    "q_scan_project" -> ((s, d) =>
      events(s, d).select(col("event_id"), col("value"),
        epochS(col("ts")).as("ts_epoch"))),

    // A1 — windowed element-wise vector mean, wide st_peak projection
    // (ref: database_peak_streaming.py:38-45). Custom VecMean Aggregator.
    "q_window_mean" -> ((s, d) => {
      val cols = Seq(col("win_start").cast("long").as("win_start"),
        col("n_frames")) ++ (1 to FrameSource.NumPeaks).map(i =>
        r(element_at(col("mean_peaks"), i)).as(s"peak$i"))
      PeakStreaming
        .windowed(FrameSource.frames(s, d), windowMs = 3600 * 1000)
        .select(cols: _*)
    }),

    // A1 long form — pure built-ins (posexplode → avg), the cross-check
    // formulation of the same operator.
    "q_window_mean_long" -> ((s, d) => {
      val fr = FrameSource.frames(s, d)
      fr.select(winBucket(col("ts"), 3600).as("win_start"),
          posexplode(col("peaks")).as(Seq("pos", "v")))
        .groupBy(col("win_start"), (col("pos") + 1).as("peak_no"))
        .agg(r(avg(col("v"))).as("mean_v"))
    }),

    // A2 — per-window last frame's identity + frame count
    // (ref: database_peak_streaming.py:31-36 takes the window's last frame)
    "q_port_counts" -> ((s, d) => {
      val fr = FrameSource.frames(s, d)
      fr.groupBy(winBucket(col("ts"), 3600).as("win_start"))
        .agg(count(lit(1)).as("n_frames"),
          max_by(col("serial_number"), col("frame_id")).as("last_serial"))
    }),

    // A3 — stride downsample 1-in-10 (ref: database_peak_streaming.py:52-56).
    // event_id is dense, so the stride is a pure filter against the
    // broadcast min — no global row_number sort (Downsample scale note).
    "q_stride" -> ((s, d) => {
      val ev = events(s, d).select(col("event_id"), col("value"))
      val mn = ev.agg(min(col("event_id")).as("__mn"))
      Downsample.stridedByKey(
          ev.crossJoin(broadcast(mn)), col("event_id") - col("__mn"), 10)
        .select(col("event_id"), col("value"))
    }),

    // A4 — min-key probe (ref: database_peak_streaming.py:68)
    "q_min_key" -> ((s, d) =>
      events(s, d).agg(min(col("event_id")).as("min_id"))),

    // P4 — TTL survivors at deterministic "now" = max(ts)
    // (ref: database_peak_streaming.py:65-67, st_length TTL)
    "q_ttl_surviving" -> ((s, d) =>
      Retention.surviving(events(s, d), col("ts"), 604800L)
        .select(col("event_id"))),

    // P5 — key-range alignment delete set
    // (ref: database_peak_streaming.py:68-69)
    "q_ttl_key_align" -> ((s, d) => {
      val ev = events(s, d)
      Retention.expiredByKeyAlignment(
        ev, col("event_id"),
        Retention.surviving(ev, col("ts"), 604800L), col("event_id"))
        .select(col("event_id"))
    }),

    // Sliding windows — width 2 h, slide 1 h: every event lands in
    // exactly two overlapping windows (the third windowing family after
    // tumbling and session; in streaming the same expression runs
    // watermarked). Exact cents aggregation.
    "q_sliding_window" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("n_events"),
          sum(cents(col("value"))).as("value_cents"))
        .select(epochS(col("w.start")).as("win_start"),
          col("n_events"), col("value_cents"))),

    // Session windows — gap-based sessionization (session_window, the
    // one windowing family the tumbling/sliding pipeline didn't cover;
    // in streaming the same expression runs with a watermark and merges
    // sessions across micro-batches). 30-minute gap per user; output =
    // session start + event count + value cents (exact).
    "q_session_agg" -> ((s, d) =>
      events(s, d)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          sum(cents(col("value"))).as("value_cents"))
        .select(col("user_id"),
          epochS(col("w.start")).as("session_start"),
          col("n_events"), col("value_cents"))),

    // A5 — running sum (ref cumsum: hyperion.py:442)
    "q_cumsum" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      events(s, d).select(col("event_id"), col("user_id"),
        r(sum(col("value")).over(w)).as("running"))
    }),

    // F1 — epoch int+frac composition (ref: hyperion.py:467)
    "q_ts_compose" -> ((s, d) =>
      events(s, d).select(col("event_id"),
        (floor(epochS(col("ts"))).cast("double") +
          (col("event_id") % 1000000) * lit(1e-9)).as("ts_composed"))),

    // F4 — per-channel dBm calibration (ref: hyperion.py:533-540). The
    // per-channel offset/scale come from the power-cal dim table decoded
    // from the #GetPowerCalibrationInfo wire bytes (hyperion.py:679-697)
    // and broadcast onto the frame stream — the constants the kernel
    // sees are exactly what the command port serves.
    "q_calibrate" -> ((s, d) => {
      val fr = FrameSource.frames(s, d)
      // scalar kernel on the one needed element — converting the whole
      // vector through the transform() lambda then discarding 7/8 of it
      // pays interpreted HOF cost per row (same double either way)
      fr.select(col("frame_id").as("event_id"),
          (col("serial_number") % 8).cast("int").as("channel"),
          element_at(col("peaks"), 1).as("raw"))
        .join(broadcast(InstrumentConfig.powerCal(s)), "channel")
        .select(col("event_id"), col("channel"),
          Calibrate.toDbScalar(col("raw"), col("scale"), col("offset"))
            .as("db_first"))
    }),

    // F5 — wavelength axis start + i*inc (ref: hyperion.py:527-531)
    "q_wavelength_axis" -> ((s, d) => {
      val chs = s.range(8).select(col("id").as("channel"))
      chs.select(col("channel"),
          posexplode(Calibrate.wavelengthAxis(
            lit(1500.0) + col("channel"), lit(0.8), lit(16)))
            .as(Seq("idx", "wl")))
        .select(col("channel"), col("idx").cast("long").as("idx"), col("wl"))
    }),

    // F6/F7 — strain / temperature physics (ref: analyze_data.py:30-41,
    // constants hyperion.py:79)
    "q_physics" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val wl = lit(1550.0) + col("value") * 0.001
      val withWl = events(s, d).select(col("event_id"), col("user_id"),
        wl.as("wl"))
      val iwl = first(col("wl")).over(w)
      withWl
        .withColumn("strain", Physics.strain(col("wl"), iwl, 0.89))
        .withColumn("temp",
          Physics.temperature(col("wl"), iwl, 0.89, 0.0079, 0.0000055,
            lit(20.0)))
        .withColumn("net",
          Physics.strainNetOfThermal(col("strain"), col("temp")))
        .select(col("event_id"), r(col("strain"), 6).as("strain"),
          r(col("temp"), 6).as("temp"), r(col("net"), 6).as("net"))
    }),

    // F8 — channel bitmap → active channel list (ref: hyperion.py:495-501)
    "q_bitmap_channels" -> ((s, d) =>
      events(s, d).select(col("event_id"),
        explode(Calibrate.activeChannels(
          (col("event_id") % 65536).cast("int"))).as("channel"))),

    // EP1 + EP2 — the full pipeline: windowed means → seq numbering →
    // 1-in-10 long-term stride → per-peak time series projection
    // (ref: database_peak_streaming.py:16-58 + analyze_data.py:44-82)
    "q_lt_series" -> ((s, d) => {
      val lt = Analyze.ltTable(s, d, windowMs = 3600 * 1000, ltIncrement = 10)
      Analyze.peakSeries(lt)
        .select(col("seq").cast("long").as("seq"), col("ts_epoch"),
          (col("peak_no")).cast("int").as("peak_no"),
          r(col("peak_value")).as("peak_value"))
    }),

    // P3 — per-port split of the peak vector via cumsum slice boundaries
    // (ref: analyze_data.py:66-82, hyperion.py:440-453)
    "q_per_port" -> ((s, d) => {
      val lt = Analyze.ltTable(s, d, windowMs = 3600 * 1000, ltIncrement = 10)
      Analyze.perPortSeries(lt)
        .select(col("seq").cast("long").as("seq"), col("ts_epoch"),
          col("port_no").cast("int").as("port_no"),
          col("n_in_port").cast("int").as("n_in_port"),
          r(col("first_peak")).as("first_peak"))
    }),

    // P3/S4 with NON-UNIFORM port counts — cumsum boundaries genuinely
    // vary ([2,3,1,2] over the 8-peak vector), unlike the pipeline's
    // one-peak-per-port frames (ref: hyperion.py:440-453 slices by
    // arbitrary per-port counts).
    "q_per_port_split" -> ((s, d) => {
      val fr = FrameSource.frames(s, d)
      // static-counts slicing (the batch analyzer's semantics — counts
      // derived once, analyze_data.py:66-82): prefix sums fold at plan
      // time, every slice is a codegen'd builtin. The dynamic
      // channelSlices(HOF) form is plan-equivalent but interpreted per
      // row (profiled 4× slower at 100k frames); OpsSpec pins
      // static ≡ dynamic.
      fr.select(col("frame_id"),
          posexplode(ChannelSlice.channelSlicesStatic(col("peaks"),
            Seq(2, 3, 1, 2))).as(Seq("p", "port_peaks")))
        .select(col("frame_id"), (col("p") + 1).cast("int").as("port_no"),
          size(col("port_peaks")).cast("int").as("n_in_port"),
          element_at(col("port_peaks"), 1).as("first_peak"))
    }),

    // S2/S5 — sensor stream decode: per-sensor time series off the
    // sensor frames (ref: hyperion.py:388-420)
    "q_sensor_series" -> ((s, d) =>
      FrameSource.sensorFrames(s, d)
        .select(col("frame_id"), posexplode(col("values"))
          .as(Seq("k", "sval")))
        .select(col("frame_id"), (col("k") + 1).cast("int").as("sensor_no"),
          col("sval"))),

    // S3/S6 — spectrum decode: uint16 channels×points matrix → active
    // channels (header bitmap) → per-point dBm + wavelength axis zip
    // (ref: hyperion.py:495-501 bitmap, 527-531 axis, 533-540 cal).
    // Frames subsampled 1-in-50 to keep the oracle compare bounded; the
    // plan (scan → nested posexplode → filter → zip) is scale-invariant.
    "q_spectrum_calibrate" -> ((s, d) => {
      val sp = FrameSource.spectrumFrames(s, d)
        .filter(col("frame_id") % 50 === 0)
      // Explode channel INDICES (a constant 8-int sequence), not the
      // matrix: the bitmap filter then gates a bare int BEFORE the 8×16
      // matrix is touched, and the matrix construction lives in exactly
      // one Project. (Exploding `spectrum` directly made
      // InferFiltersFromGenerate materialize a `size(<whole matrix
      // build>) > 0` predicate below the Generate — the full 128-element
      // construction duplicated into the scan filter; 11× DuckDB in
      // BENCH_r02.) The active channel's row is then fetched with one
      // element_at and its points exploded — header columns projected
      // once, everything whole-stage codegen.
      val perCh = sp.select(col("frame_id"), col("active_channel_bits"),
          col("start_wavelength"), col("wavelength_increment"),
          col("spectrum"),
          explode(sequence(lit(0),
            lit(FrameSource.SpectrumChannels - 1))).as("ch"))
        .filter(col("active_channel_bits")
          .bitwiseAND(expr("shiftleft(1, ch)")) =!= 0)
        .select(col("frame_id"), col("ch"), col("start_wavelength"),
          col("wavelength_increment"),
          element_at(col("spectrum"), col("ch") + 1).as("raw"))
      // per-channel offset/scale broadcast from the power-cal dim table
      // (decoded #GetPowerCalibrationInfo bytes, hyperion.py:679-697)
      val cal = InstrumentConfig.powerCal(s)
        .select(col("channel").as("ch"), col("scale").as("sc"),
          col("offset").as("off"))
      // SCALAR wl/db arithmetic after the point explode — the
      // arrays_zip(wavelengthAxis, toDb) form is two interpreted
      // higher-order transforms per channel (same values: identical op
      // order, see Calibrate.toDbScalar).
      perCh.join(broadcast(cal), "ch")
        .select(col("frame_id"), col("ch").cast("int").as("channel"),
          col("start_wavelength"), col("wavelength_increment"),
          col("sc"), col("off"),
          posexplode(col("raw")).as(Seq("p", "rawv")))
        .select(col("frame_id"), col("channel"),
          col("p").cast("int").as("point_idx"),
          (col("start_wavelength") +
            col("p").cast("double") * col("wavelength_increment")).as("wl"),
          r(Calibrate.toDbScalar(col("rawv"), col("sc"), col("off")), 6)
            .as("db"))
    }),

    // F6 — fiber delay physics (ref: hyperion.py:1150-1153); the ior
    // constant is the instrument-wide one the wire-served peak-offset
    // table is built from (InstrumentConfig.IndexOfRefraction)
    "q_delay_physics" -> ((s, d) =>
      events(s, d).select(col("event_id"),
        Physics.delayNs(col("value"),
          lit(InstrumentConfig.IndexOfRefraction)).as("delay_ns"))),

    // S14 — #GetPeaks one-shot snapshot semantics (hyperion.py:1003-1010):
    // the CURRENT frame per serial — argmax by (ts, frame_id), one
    // shuffle with map-side combine — served through the same
    // encode→decode byte path the command port uses, then split into
    // HACQPeaksData channel slices (counts are 1/port, so slice i is
    // peak i). Scale: the max_by pre-aggregates per partition; no sort.
    "q_snapshot_peaks" -> ((s, d) => {
      val fr = FrameSource.frames(s, d)
      val latest = fr.groupBy(col("serial_number"))
        .agg(max_by(
          struct(col("frame_id"), col("ts"), col("peak_counts"),
            col("peaks")),
          struct(col("ts"), col("frame_id"))).as("cur"))
        .select(col("serial_number"), col("cur.*"))
      val bin = FrameCodec.encodePeaks(col("serial_number"),
        floor(epochS(col("ts"))).cast("long"),
        col("frame_id") % 1000000000L,
        col("peak_counts"), col("peaks"))
      latest.select(col("serial_number"),
          FrameCodec.decodePeaks(bin).as("f"))
        .select(col("serial_number"),
          col("f.timestamp_int").as("ts_int"),
          col("f.timestamp_frac").as("ts_frac"),
          posexplode(col("f.peaks")).as(Seq("i", "peak_value")))
        .select(col("serial_number"), col("ts_int"), col("ts_frac"),
          (col("i") + 1).cast("int").as("channel"), col("peak_value"))
    }),

    // S14 — #GetSpectrum one-shot snapshot semantics
    // (hyperion.py:1012-1019): the single current frame
    // (TakeOrderedAndProject, no global sort), through the wire byte
    // path, active channels from the header bitmap, client-side dBm
    // calibration from the decoded power-cal — exactly what
    // HACQSpectrumData(content, power_cal) computes.
    "q_snapshot_spectrum" -> ((s, d) => {
      val fr = FrameSource.spectrumFrames(s, d)
      // latest-frame pick as a broadcast max-key probe (the
      // q_stride/q_min_key pattern): the 1-row max aggregates map-side
      // over a (ts, frame_id)-pruned scan, and the equality filter
      // pushes BELOW the matrix-building Project — an orderBy.limit(1)
      // here planned a global range-sort carrying every row's
      // synthesized 8×16 matrix (caught by PlanAuditSpec)
      val mx = fr.agg(max(struct(col("ts"), col("frame_id"))).as("__mx"))
      val sp = fr.crossJoin(broadcast(mx))
        .filter(struct(col("ts"), col("frame_id")) === col("__mx"))
        .drop("__mx")
      val bin = FrameCodec.encodeSpectrum(col("frame_id"),
        floor(epochS(col("ts"))).cast("long"),
        col("frame_id") % 1000000000L,
        col("start_wavelength"), col("wavelength_increment"),
        col("active_channel_bits"), col("spectrum"))
      val dec = sp.select(FrameCodec.decodeSpectrum(bin).as("f"))
        .select(col("f.serial_number").as("frame_id"),
          col("f.active_channel_bits").as("bits"),
          col("f.start_wavelength").as("swl"),
          col("f.wavelength_increment").as("wli"),
          col("f.spectrum").as("spectrum"))
      val perCh = dec.select(col("frame_id"), col("bits"), col("swl"),
          col("wli"), col("spectrum"),
          explode(sequence(lit(0),
            lit(FrameSource.SpectrumChannels - 1))).as("ch"))
        .filter(col("bits").bitwiseAND(expr("shiftleft(1, ch)")) =!= 0)
        .select(col("frame_id"), col("ch"), col("swl"), col("wli"),
          element_at(col("spectrum"), col("ch") + 1).as("raw"))
      val cal = InstrumentConfig.powerCal(s)
        .select(col("channel").as("ch"), col("scale").as("sc"),
          col("offset").as("off"))
      perCh.join(broadcast(cal), "ch")
        // channel is 1-BASED here (bit index + 1) — the reference keys
        // HACQSpectrumData.spectra 1-based (hyperion.py:509) and
        // q_snapshot_peaks' channel is 1-based, so the two snapshot
        // dims join on the same physical channel identity.
        // (q_spectrum_calibrate keeps its historical 0-based `channel`
        // = power-cal index; its consumers pair it with that dim.)
        .select(col("frame_id"), (col("ch") + 1).cast("int").as("channel"),
          col("swl"), col("wli"), col("sc"), col("off"),
          posexplode(col("raw")).as(Seq("p", "rawv")))
        .select(col("frame_id"), col("channel"),
          col("p").cast("int").as("point_idx"),
          (col("swl") + col("p").cast("double") * col("wli")).as("wl"),
          r(Calibrate.toDbScalar(col("rawv"), col("sc"), col("off")), 6)
            .as("db"))
    }),

    // S14 — #GetSensors one-shot snapshot semantics (the engine-side
    // extension closing the third streamer port; see
    // InstrumentResponder): the single current sensor frame through the
    // same encode→decode byte path the command port serves, one value
    // per sensor slot (1-based). Latest-frame pick is the
    // q_snapshot_spectrum broadcast max-key probe — no global sort.
    "q_snapshot_sensors" -> ((s, d) => {
      val fr = FrameSource.sensorFrames(s, d)
      val mx = fr.agg(max(struct(col("ts"), col("frame_id"))).as("__mx"))
      val latest = fr.crossJoin(broadcast(mx))
        .filter(struct(col("ts"), col("frame_id")) === col("__mx"))
        .drop("__mx")
      val bin = FrameCodec.encodeSensor(lit(0), lit(0), col("frame_id"),
        floor(epochS(col("ts"))).cast("long"),
        col("frame_id") % 1000000000L, col("values"))
      latest.select(FrameCodec.decodeSensor(bin).as("f"))
        .select(col("f.serial_number").as("frame_id"),
          col("f.timestamp_int").as("ts_int"),
          col("f.timestamp_frac").as("ts_frac"),
          posexplode(col("f.values")).as(Seq("i", "value")))
        .select(col("frame_id"), col("ts_int"), col("ts_frac"),
          (col("i") + 1).cast("int").as("slot"), col("value"))
    }),

    // S14/F6 — the peak-offsets dim DECODED from the same
    // #GetPeakOffsets wire bytes the responder serves
    // (hyperion.py:1101-1126): every delay on the wire is the Physics
    // formula over the region's fiber distance at the instrument ior,
    // and each boundary converts to a wavelength through the
    // count→wavelength model (#ConvertCountToWavelength).
    "q_peak_offsets" -> ((s, _) =>
      InstrumentConfig.peakOffsets(s)
        .select(col("channel"), col("region"), col("boundary"),
          col("delay_ns"),
          (lit(InstrumentConfig.CountZeroWavelength) +
            col("boundary").cast("double") *
              lit(InstrumentConfig.WavelengthPerCount)).as("boundary_wl"))),

    // S11 — catalog scan (ref: database_peak_streaming.py:103-106 /
    // analyze_data.py:21-24 list sqlite_master): register the data-dir
    // tables as views, then enumerate them from the session catalog.
    "q_catalog_scan" -> ((s, d) => {
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
        .foreach(n => table(s, d, n).createOrReplaceTempView(s"graft_$n"))
      s.catalog.listTables()
        .filter(col("name").startsWith("graft_"))
        .select(col("name").as("table_name"),
          col("isTemporary").cast("boolean").as("is_temp"))
    }),

    // S4/S5/S6 binary path — byte-level decode of the reference's ACTUAL
    // wire formats (hyperion.py:424-453 peaks, 388-420 sensor, 475-500
    // spectrum): typed rows → encode to the little-endian frame bytes →
    // decode back through the native FrameCodec expressions → project the
    // decoded fields. The oracle recomputes every field arithmetically
    // from `events`, so a wrong offset/width/endianness in EITHER
    // direction fails the hash gate (and FrameCodecSpec pins the exact
    // layout against hand-built fixtures, so encode/decode can't be
    // mutually-inverse-but-wrong).
    "q_frame_decode" -> ((s, d) => {
      val fr = FrameSource.frames(s, d)
      val bin = FrameCodec.encodePeaks(col("serial_number"),
        floor(epochS(col("ts"))).cast("long"),
        col("frame_id") % 1000000000L,
        col("peak_counts"), col("peaks"))
      fr.select(col("frame_id"), FrameCodec.decodePeaks(bin).as("f"))
        .select(col("frame_id"),
          col("f.length").as("hdr_len"),
          col("f.serial_number").as("serial_number"),
          col("f.timestamp_int").as("ts_int"),
          col("f.timestamp_frac").as("ts_frac"),
          size(col("f.peak_counts")).as("n_ports"),
          element_at(col("f.peaks"), 1).as("peak_first"),
          element_at(col("f.peaks"), FrameSource.NumPeaks).as("peak_last"),
          // ts composition exactly as the reference (hyperion.py:452):
          // frac*1e-9 + int
          (col("f.timestamp_frac") * lit(1e-9) + col("f.timestamp_int"))
            .as("ts_composed"))
    }),

    "q_sensor_decode" -> ((s, d) => {
      val sf = FrameSource.sensorFrames(s, d)
      val bin = FrameCodec.encodeSensor(
        col("frame_id") % 256, (col("frame_id") % 100),
        col("frame_id"), floor(epochS(col("ts"))).cast("long"),
        col("frame_id") % 1000000000L, col("values"))
      sf.select(col("frame_id"), FrameCodec.decodeSensor(bin).as("f"))
        .select(col("frame_id"),
          col("f.status").as("status"),
          col("f.buffer_percentage").as("buffer_pct"),
          col("f.serial_number").as("serial_number"),
          col("f.timestamp_int").as("ts_int"),
          size(col("f.values")).as("n_sensors"),
          element_at(col("f.values"), 1).as("v_first"),
          element_at(col("f.values"), FrameSource.NumSensors).as("v_last"))
    }),

    "q_spectrum_decode" -> ((s, d) => {
      val sp = FrameSource.spectrumFrames(s, d)
        .filter(col("frame_id") % 50 === 0)
      val bin = FrameCodec.encodeSpectrum(col("frame_id"),
        floor(epochS(col("ts"))).cast("long"),
        col("frame_id") % 1000000000L,
        col("start_wavelength"), col("wavelength_increment"),
        col("active_channel_bits"), col("spectrum"))
      sp.select(col("frame_id"), FrameCodec.decodeSpectrum(bin).as("f"))
        .select(col("frame_id"),
          col("f.serial_number").as("serial_number"),
          col("f.start_wavelength").as("start_wl"),
          col("f.wavelength_increment").as("wl_inc"),
          col("f.num_points").as("num_points"),
          col("f.num_channels").as("num_channels"),
          col("f.active_channel_bits").as("active_bits"),
          element_at(element_at(col("f.spectrum"), 1), 1).as("m_first"),
          element_at(element_at(col("f.spectrum"),
            FrameSource.SpectrumChannels), FrameSource.SpectrumPoints)
            .as("m_last"))
    }),

    // S1/S7/S8 at-rest form — the full byte-faithful ingest path through
    // the CUSTOM DataSource V2 reader: frames encoded to the wire format,
    // wrapped in the BBHI transport record header, written as one dump
    // file per partition (the split unit), then read back through
    // `format("graft-frames")` which decodes straight to typed rows.
    // Oracle recomputes every decoded field arithmetically — a wrong
    // record header, wrong split, or wrong decode fails the hash gate.
    "q_frame_dump_scan" -> ((s, d) => {
      val dir = System.getProperty("java.io.tmpdir") +
        "/graft_dump_" + d.replaceAll("[^a-zA-Z0-9]", "_")
      if (!new java.io.File(dir).exists()) {
        val fr = FrameSource.frames(s, d)
        val bin = fr.select(FrameCodec.encodePeaks(col("serial_number"),
          floor(epochS(col("ts"))).cast("long"),
          col("frame_id") % 1000000000L,
          col("peak_counts"), col("peaks")).as("b"))
        import s.implicits._
        bin.as[Array[Byte]].foreachPartition {
          (it: Iterator[Array[Byte]]) =>
            val pid = org.apache.spark.TaskContext.getPartitionId()
            graft.sources.FrameDump.writeFile(
              s"$dir/part-$pid.bin", it)
        }
      }
      s.read.format("graft-frames").option("kind", "peaks").load(dir)
        .select(col("serial_number"),
          col("timestamp_int").as("ts_int"),
          col("timestamp_frac").as("ts_frac"),
          size(col("peak_counts")).as("n_ports"),
          element_at(col("peaks"), 1).as("peak_first"),
          element_at(col("peaks"), FrameSource.NumPeaks).as("peak_last"))
    }),

    // S10 — SQL DDL bootstrap (ref: database_peak_streaming.py:74-101):
    // the four generated CREATE TABLE IF NOT EXISTS statements through
    // spark.sql, then the catalog enumeration (sqlite_master equivalent)
    // with per-table column counts: id+timestamp+8 ports = 10,
    // id+8 peaks = 9.
    "q_ddl_catalog" -> ((s, d) => {
      val loc = System.getProperty("java.io.tmpdir") +
        "/graft_ddl_" + d.replaceAll("[^a-zA-Z0-9]", "_")
      graft.util.Ddl.bootstrap(s, FrameSource.NumPorts,
        FrameSource.NumPeaks, loc)
      graft.util.Ddl.catalogTables(s)
    }),

    // S13 — CSV export sink + read-back (ref: analyze_data.py:8-16): the
    // roundtrip IS the check — what the sink wrote must reproduce the
    // source exactly.
    "q_csv_roundtrip" -> ((s, d) => {
      val path = System.getProperty("java.io.tmpdir") +
        "/graft_csv_" + d.replaceAll("[^a-zA-Z0-9]", "_")
      Export.toCsv(events(s, d).select(col("event_id"), col("value")), path)
      Export.fromCsv(s, path, "event_id BIGINT, value DOUBLE")
    }),

    // JSONL sink + schema-explicit read-back — the interchange format
    // training corpora ship in; verified via md5 of the round-tripped
    // text so the full string survives JSON escaping both ways
    "q_jsonl_roundtrip" -> ((s, d) => {
      val path = System.getProperty("java.io.tmpdir") +
        "/graft_jsonl_" + d.replaceAll("[^a-zA-Z0-9]", "_")
      Export.toJsonl(documents(s, d)
        .select(col("doc_id"), col("text"), col("lang"), col("source")),
        path)
      Export.fromJsonl(s, path,
        "doc_id BIGINT, text STRING, lang STRING, source STRING")
        .select(col("doc_id"), md5(col("text")).as("text_md5"),
          col("lang"), col("source"))
    }),

    // ORC roundtrip — the third interchange format after CSV and JSONL
    // (S13 family): columnar like parquet (predicate pushdown, column
    // pruning, stripe-level zone maps at scale) but a different on-disk
    // format, exercising Spark's native `orc` source/sink. Same
    // verified read-back contract as the JSONL loop; the timestamp
    // column rides along to cover ORC's type fidelity beyond strings.
    "q_orc_roundtrip" -> ((s, d) => {
      val path = System.getProperty("java.io.tmpdir") +
        "/graft_orc_" + d.replaceAll("[^a-zA-Z0-9]", "_")
      events(s, d)
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        .write.mode("overwrite").orc(path)
      s.read.orc(path)
        .select(col("event_id"), epochS(col("ts")).as("ts_epoch"),
          col("event_type"), col("value"))
    }),

    // Schema evolution under mergeSchema — the long-lived-dataset
    // reality: generation 1 wrote (event_id, event_type), generation 2
    // added value_cents; one mergeSchema read reconciles both into a
    // union schema with nulls for the missing column, and the query
    // reports per-type row counts, missing-column counts, and the
    // exact-cents sum — so a silently dropped column or a misaligned
    // merge fails the hash. At scale this is the metadata-only path
    // (parquet footer union), not a rewrite of old generations.
    "q_schema_evolution" -> ((s, d) => {
      val path = System.getProperty("java.io.tmpdir") +
        "/graft_schevo_" + d.replaceAll("[^a-zA-Z0-9]", "_")
      val ev = events(s, d)
      // the two generation writes are independent jobs — overlap them
      // (guide §2.6, same pattern as the CSV export loop; r14)
      Export.concurrently(
        () => ev.filter(col("event_id") % 2 === 0)
          .select(col("event_id"), col("event_type"))
          .write.mode("overwrite").parquet(path + "/gen=1"),
        () => ev.filter(col("event_id") % 2 === 1)
          .select(col("event_id"), col("event_type"),
            cents(col("value")).as("value_cents"))
          .write.mode("overwrite").parquet(path + "/gen=2"))
      s.read.option("mergeSchema", "true").parquet(path)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value_cents").isNull, 1L).otherwise(0L))
            .as("n_missing"),
          sum(coalesce(col("value_cents"), lit(0L))).as("cents_sum"))
    }),

    // S13 full form — the reference's export LOOP (analyze_data.py:8-16
    // iterates EVERY table): all four dual-resolution tables (derived
    // deterministically from events in the reference's st/lt shapes) go
    // through the CSV sink and back; the verified output is each
    // table's read-back cardinality and column checksums, so a wrong
    // export of ANY table fails the gate.
    "q_csv_export_all" -> ((s, d) => {
      val dir = System.getProperty("java.io.tmpdir") +
        "/graft_csvall_" + d.replaceAll("[^a-zA-Z0-9]", "_")
      val fr = FrameSource.frames(s, d)
      val stData = fr.select(Seq(col("frame_id").as("id"),
        epochS(col("ts")).as("timestamp")) ++
        (1 to FrameSource.NumPorts).map(i =>
          element_at(col("peak_counts"), i).as(s"port$i")): _*)
      val stPeak = fr.select(col("frame_id").as("id") +:
        (1 to FrameSource.NumPeaks).map(i =>
          element_at(col("peaks"), i).as(s"peak$i")): _*)
      val tables = Seq(
        "st_data" -> stData,
        "lt_data" -> stData.filter(col("id") % 10 === 0),
        "st_peak" -> stPeak,
        "lt_peak" -> stPeak.filter(col("id") % 10 === 0))
      Export.tablesToCsv(tables, dir)
      val dataDdl = "id BIGINT, timestamp DOUBLE, " +
        (1 to FrameSource.NumPorts).map(i => s"port$i INT").mkString(", ")
      val peakDdl = "id BIGINT, " +
        (1 to FrameSource.NumPeaks).map(i => s"peak$i DOUBLE").mkString(", ")
      tables.map { case (name, _) =>
        val isData = name.endsWith("_data")
        val back = Export.fromCsv(s, s"$dir/$name",
          if (isData) dataDdl else peakDdl)
        val col1 = if (isData) col("port1").cast("double") else col("peak1")
        back.agg(count(lit(1)).as("n_rows"), sum(col("id")).as("id_sum"),
            sum(col1).as("col1_sum"))
          .select(lit(name).as("table_name"), col("n_rows"),
            col("id_sum"), col("col1_sum"))
      }.reduce(_.unionAll(_))
    }),

    // S14-lite — instrument config/metadata as a joinable surface
    // (serial/versions hyperion.py:699-740, channel_count
    // hyperion.py:765-771, max_peak_count_per_channel hyperion.py:773-780,
    // detection presets hyperion.py:552-590): per-channel observed peak
    // counts validated against the instrument's max and joined to the
    // channel's detection preset. The config sides are tiny and
    // broadcast; the frame side is one map + one narrow agg.
    "q_instrument_config" -> ((s, d) => {
      val perCh = FrameSource.frames(s, d)
        .select(posexplode(col("peak_counts")).as(Seq("p0", "cnt")))
        .groupBy((col("p0") + 1).as("channel"))
        .agg(count(lit(1)).as("n_frames"), max(col("cnt")).as("max_observed"))
      perCh
        .join(broadcast(InstrumentConfig.channelSettings(s)), "channel")
        .join(broadcast(InstrumentConfig.detectionSettings(s)), "setting_id")
        .crossJoin(broadcast(InstrumentConfig.config(s)))
        .select(col("channel"), col("n_frames"), col("max_observed"),
          col("max_peak_count_per_channel"),
          (col("max_observed") <= col("max_peak_count_per_channel"))
            .as("within_limit"),
          col("serial_number"), col("setting_id"),
          col("name").as("setting_name"), col("threshold"), col("mode"))
    }),

    // S14 breadth — sensor-management config (ref: hyperion.py:1229-1330
    // add_sensor / export_sensors): the sensor dim table decoded from
    // the #ExportSensors wire bytes, broadcast onto the per-sensor
    // stream aggregate. Calibration factors are exact binary fractions
    // and sval totals exact longs, so the calibrated total is one exact
    // long × double product in both engines.
    "q_sensor_config" -> ((s, d) =>
      FrameSource.sensorFrames(s, d)
        .select(posexplode(col("values")).as(Seq("k", "sval")))
        .groupBy((col("k") + 1).cast("int").as("sensor_no"))
        .agg(count(lit(1)).as("n_frames"),
          sum(col("sval").cast("long")).as("sval_total"))
        .join(broadcast(InstrumentConfig.sensors(s)), "sensor_no")
        .select(col("sensor_no"), col("name"), col("model"),
          col("channel"), col("wavelength"), col("calibration_factor"),
          col("n_frames"), col("sval_total"),
          (col("sval_total") * col("calibration_factor"))
            .as("calibrated_total"))))

  /** Exact-cents peak model (see FrameSource.frames): peak_i of a window
    * = avg(floor(value*100+0.5) + (i-1)*100) — integer-valued doubles, so
    * the avg is ONE exact integer sum + one division in both engines,
    * bit-identical in any aggregation order.
    */
  private val cAvg = "avg(floor(value*100 + 0.5) + (i-1)*100)"

  // rn = window-grid index relative to the first window (mirrors
  // PeakStreaming.batch's arithmetic seq; `//` = DuckDB integer division).
  private val ltCte =
    s"""WITH w AS (
       |  SELECT $winH AS win_epoch, i, $cAvg AS m_i
       |  FROM events, generate_series(1, 8) t(i)
       |  GROUP BY 1, i),
       |s AS (
       |  SELECT win_epoch, i, m_i,
       |    (win_epoch - (SELECT min(win_epoch) FROM w)) // 3600 + 1 AS rn
       |  FROM w)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_scan_project" ->
      "SELECT event_id, value, epoch(ts) AS ts_epoch FROM events",

    "q_window_mean" -> {
      val peaks = (1 to FrameSource.NumPeaks)
        .map(i => s"${rs(s"avg(floor(value*100 + 0.5) + ${(i - 1) * 100})")}" +
          s" AS peak$i").mkString(", ")
      s"SELECT $winH AS win_start, count(*) AS n_frames, $peaks " +
        "FROM events GROUP BY 1"
    },

    "q_window_mean_long" ->
      (s"SELECT $winH AS win_start, cast(i AS int) AS peak_no, " +
        s"${rs(cAvg)} AS mean_v " +
        "FROM events, generate_series(1, 8) t(i) GROUP BY 1, i"),

    "q_port_counts" ->
      (s"SELECT $winH AS win_start, count(*) AS n_frames, " +
        "max_by(user_id, event_id) AS last_serial FROM events GROUP BY 1"),

    "q_stride" ->
      ("SELECT event_id, value FROM events WHERE " +
        "(event_id - (SELECT min(event_id) FROM events)) % 10 = 0"),

    "q_min_key" -> "SELECT min(event_id) AS min_id FROM events",

    "q_ttl_surviving" ->
      ("SELECT event_id FROM events WHERE epoch(ts) >= " +
        "(SELECT max(epoch(ts)) FROM events) - 604800"),

    "q_ttl_key_align" ->
      ("SELECT event_id FROM events WHERE event_id < (SELECT min(event_id) " +
        "FROM events WHERE epoch(ts) >= " +
        "(SELECT max(epoch(ts)) FROM events) - 604800)"),

    // every event belongs to windows starting at its hour bucket and
    // one slide earlier — enumerate both, no filter needed (width =
    // 2 × slide)
    "q_sliding_window" ->
      ("""SELECT cast(floor(epoch(ts)/3600)*3600 - k*3600 AS double)
         |   AS win_start,
         | count(*) AS n_events,
         | cast(sum(cast(floor(value*100 + 0.5) AS bigint)) AS bigint)
         |   AS value_cents
         |FROM events, generate_series(0, 1) t(k)
         |GROUP BY 1""").stripMargin,

    // gaps-and-islands: a new session starts where the gap from the
    // previous event exceeds 30 min; session id = running count of
    // starts; start = min(ts) per island — exactly session_window's
    // assignment for gap-based sessions
    "q_session_agg" ->
      ("""WITH g AS (
         |  SELECT user_id, event_id, ts, value,
         |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER
         |      (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
         |      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |        IS NULL
         |      THEN 1 ELSE 0 END AS is_start
         |  FROM events),
         |s AS (
         |  SELECT user_id, ts, value,
         |    sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM g)
         |SELECT user_id, epoch(min(ts)) AS session_start,
         |  count(*) AS n_events,
         |  cast(sum(cast(floor(value*100 + 0.5) AS bigint)) AS bigint)
         |    AS value_cents
         |FROM s GROUP BY user_id, sid""").stripMargin,

    "q_cumsum" ->
      (s"SELECT event_id, user_id, ${rs(
        "sum(value) OVER (PARTITION BY user_id ORDER BY event_id)")} " +
        "AS running FROM events"),

    "q_ts_compose" ->
      ("SELECT event_id, cast(floor(epoch(ts)) AS double) + " +
        "(event_id % 1000000) * 1e-9 AS ts_composed FROM events"),

    // scale/offset mirror InstrumentConfig.PowerCalibration: offset(ch)
    // = -40-ch, scale(ch) = 100+ch (the decoded command-port constants)
    "q_calibrate" ->
      ("SELECT event_id, cast(user_id % 8 AS int) AS channel, " +
        "floor(value*100 + 0.5) * (1.0/(100.0 + (user_id % 8))) + " +
        "(-40.0 - (user_id % 8)) AS db_first FROM events"),

    // CAST literals to DOUBLE: DuckDB parses 1500.0/0.8 as DECIMAL, and
    // int + DECIMAL arithmetic stays DECIMAL (schema mismatch vs Spark).
    "q_wavelength_axis" ->
      ("SELECT ch AS channel, cast(i AS bigint) AS idx, " +
        "(CAST(1500.0 AS DOUBLE) + ch) + i * CAST(0.8 AS DOUBLE) AS wl " +
        "FROM generate_series(0, 7) t(ch), generate_series(0, 15) s(i)"),

    "q_physics" -> {
      val strain = "1e6 * (((wl - iwl) / iwl) / 0.89)"
      val temp = "(wl - iwl) / (wl * 0.89 * (0.0079 + 0.0000055)) + 20.0"
      s"""SELECT event_id, ${rs(strain, 6)} AS strain, ${rs(temp, 6)} AS temp,
         | ${rs(s"($strain) - ($temp)", 6)} AS net FROM (
         |  SELECT event_id, wl, first_value(wl) OVER
         |    (PARTITION BY user_id ORDER BY event_id) AS iwl
         |  FROM (SELECT event_id, user_id, 1550.0 + value * 0.001 AS wl
         |        FROM events))""".stripMargin
    },

    "q_bitmap_channels" ->
      ("SELECT event_id, cast(i AS int) AS channel FROM events, " +
        "generate_series(0, 15) t(i) " +
        "WHERE ((event_id % 65536) >> i) & 1 = 1"),

    "q_lt_series" ->
      (ltCte + "\n" +
        "SELECT cast(rn AS bigint) AS seq, cast(win_epoch AS double) AS " +
        s"ts_epoch, cast(i AS int) AS peak_no, ${rs("m_i")} AS " +
        "peak_value FROM s WHERE (rn-1) % 10 = 0"),

    "q_per_port" ->
      (ltCte + "\n" +
        "SELECT cast(rn AS bigint) AS seq, cast(win_epoch AS double) AS " +
        "ts_epoch, cast(i AS int) AS port_no, cast(1 AS int) AS n_in_port, " +
        s"${rs("m_i")} AS first_peak " +
        "FROM s WHERE (rn-1) % 10 = 0"),

    // cumsum boundaries of [2,3,1,2] are [0,2,5,6]
    "q_per_port_split" ->
      ("""SELECT event_id AS frame_id, cast(p+1 AS int) AS port_no,
         | cast(CASE p WHEN 0 THEN 2 WHEN 1 THEN 3 WHEN 2 THEN 1
         |      ELSE 2 END AS int) AS n_in_port,
         | floor(value*100 + 0.5) +
         |   (CASE p WHEN 0 THEN 0 WHEN 1 THEN 2 WHEN 2 THEN 5
         |    ELSE 6 END)*100 AS first_peak
         |FROM events, generate_series(0, 3) t(p)""").stripMargin,

    "q_sensor_series" ->
      ("SELECT event_id AS frame_id, cast(k+1 AS int) AS sensor_no, " +
        "floor(value*100 + 0.5) + k*1000 AS sval " +
        "FROM events, generate_series(0, 3) t(k)"),

    "q_spectrum_calibrate" -> {
      val raw = "((cast(floor(value*100 + 0.5) AS bigint) " +
        "+ ch*1000 + p*7) % 65536)"
      s"""SELECT event_id AS frame_id, cast(ch AS int) AS channel,
         | cast(p AS int) AS point_idx,
         | CAST(1500.0 AS DOUBLE) + p * CAST(0.8 AS DOUBLE) AS wl,
         | ${rs(s"$raw * (1.0/(100.0 + ch)) + (-40.0 - ch)", 6)} AS db
         |FROM events, generate_series(0, 7) c(ch),
         | generate_series(0, 15) s(p)
         |WHERE event_id % 50 = 0
         | AND ((event_id % 256) >> ch) & 1 = 1""".stripMargin
    },

    "q_delay_physics" ->
      ("SELECT event_id, cast(floor(2.0*value*1.4682/299792458.0*1e9 " +
        "+ 0.5) AS bigint) AS delay_ns FROM events"),

    // current frame per serial = argmax by (ts, event_id); peak i of the
    // FrameSource recipe lands in channel slice i+1 (counts are 1/port)
    "q_snapshot_peaks" ->
      ("""WITH latest AS (
         |  SELECT user_id, ts, event_id, value,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM events)
         |SELECT user_id AS serial_number,
         |  cast(floor(epoch(ts)) AS bigint) AS ts_int,
         |  event_id % 1000000000 AS ts_frac,
         |  cast(i+1 AS int) AS channel,
         |  floor(value*100 + 0.5) + i*100 AS peak_value
         |FROM latest, generate_series(0, 7) t(i)
         |WHERE rn = 1""").stripMargin,

    // the single latest frame, then the q_spectrum_calibrate arithmetic
    "q_snapshot_spectrum" -> {
      val raw = "((cast(floor(value*100 + 0.5) AS bigint) " +
        "+ ch*1000 + p*7) % 65536)"
      s"""WITH latest AS (
         |  SELECT event_id, ts, value FROM events
         |  ORDER BY ts DESC, event_id DESC LIMIT 1)
         |SELECT event_id AS frame_id, cast(ch + 1 AS int) AS channel,
         | cast(p AS int) AS point_idx,
         | CAST(1500.0 AS DOUBLE) + p * CAST(0.8 AS DOUBLE) AS wl,
         | ${rs(s"$raw * (1.0/(100.0 + ch)) + (-40.0 - ch)", 6)} AS db
         |FROM latest, generate_series(0, 7) c(ch),
         | generate_series(0, 15) s(p)
         |WHERE ((event_id % 256) >> ch) & 1 = 1""".stripMargin
    },

    // the single latest frame, values[k] = cents + k*1000 (the
    // FrameSource sensor recipe), slot 1-based
    "q_snapshot_sensors" ->
      ("""WITH latest AS (
         |  SELECT event_id, ts, value FROM events
         |  ORDER BY ts DESC, event_id DESC LIMIT 1)
         |SELECT event_id AS frame_id,
         |  cast(floor(epoch(ts)) AS bigint) AS ts_int,
         |  event_id % 1000000000 AS ts_frac,
         |  cast(k + 1 AS int) AS slot,
         |  floor(value*100 + 0.5) + k*1000 AS value
         |FROM latest, generate_series(0, 3) t(k)""").stripMargin,

    // the deterministic default offset table: region r of channel ch
    // ends at 1000r+100ch counts and compensates 10ch+5r meters of
    // fiber at ior 1.4682 (what the wire bytes decode to)
    "q_peak_offsets" ->
      ("""SELECT cast(ch AS int) AS channel, cast(r AS int) AS region,
         |  cast(1000*r + 100*ch AS int) AS boundary,
         |  cast(floor(2.0*CAST(10*ch + 5*r AS DOUBLE)*1.4682/
         |    299792458.0*1e9 + 0.5) AS bigint) AS delay_ns,
         |  CAST(1500.0 AS DOUBLE) + (1000*r + 100*ch) *
         |    CAST(0.0008 AS DOUBLE) AS boundary_wl
         |FROM generate_series(1, 8) c(ch), generate_series(1, 3) t(r)
         |WHERE r <= least(ch, 3)""").stripMargin,

    "q_catalog_scan" -> {
      val names = Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
      "SELECT * FROM (VALUES " +
        names.map(n => s"('graft_$n', true)").mkString(", ") +
        ") t(table_name, is_temp)"
    },

    // no frame_id in the wire format, so rows are keyed by the decoded
    // fields themselves (ts_frac = event_id % 1e9 is unique at these SFs)
    "q_frame_dump_scan" ->
      ("""SELECT user_id AS serial_number,
         | cast(floor(epoch(ts)) AS bigint) AS ts_int,
         | event_id % 1000000000 AS ts_frac,
         | cast(8 AS int) AS n_ports,
         | floor(value*100 + 0.5) AS peak_first,
         | floor(value*100 + 0.5) + 700 AS peak_last
         |FROM events""").stripMargin,

    "q_ddl_catalog" ->
      ("SELECT * FROM (VALUES ('lt_data', cast(10 AS bigint)), " +
        "('lt_peak', cast(9 AS bigint)), ('st_data', cast(10 AS bigint)), " +
        "('st_peak', cast(9 AS bigint))) t(table_name, n_cols)"),

    // binary round-trips: every field recomputed arithmetically — what the
    // decode of the encode MUST produce if both sides implement the wire
    // layout correctly. cents = floor(value*100 + 0.5).
    "q_frame_decode" ->
      ("""SELECT event_id AS frame_id,
         | cast(24 + 2*8 AS int) AS hdr_len,
         | user_id AS serial_number,
         | cast(floor(epoch(ts)) AS bigint) AS ts_int,
         | event_id % 1000000000 AS ts_frac,
         | cast(8 AS int) AS n_ports,
         | floor(value*100 + 0.5) AS peak_first,
         | floor(value*100 + 0.5) + 700 AS peak_last,
         | (event_id % 1000000000) * 1e-9 + cast(floor(epoch(ts)) AS bigint)
         |   AS ts_composed
         |FROM events""").stripMargin,

    "q_sensor_decode" ->
      ("""SELECT event_id AS frame_id,
         | cast(event_id % 256 AS int) AS status,
         | cast(event_id % 100 AS int) AS buffer_pct,
         | event_id AS serial_number,
         | cast(floor(epoch(ts)) AS bigint) AS ts_int,
         | cast(4 AS int) AS n_sensors,
         | floor(value*100 + 0.5) AS v_first,
         | floor(value*100 + 0.5) + 3000 AS v_last
         |FROM events""").stripMargin,

    "q_spectrum_decode" ->
      ("""SELECT event_id AS frame_id,
         | event_id AS serial_number,
         | CAST(1500.0 AS DOUBLE) AS start_wl,
         | CAST(0.8 AS DOUBLE) AS wl_inc,
         | cast(16 AS int) AS num_points,
         | cast(8 AS int) AS num_channels,
         | cast(event_id % 256 AS int) AS active_bits,
         | cast(cast(floor(value*100 + 0.5) AS bigint) % 65536 AS int)
         |   AS m_first,
         | cast((cast(floor(value*100 + 0.5) AS bigint) + 7*1000 + 15*7)
         |   % 65536 AS int) AS m_last
         |FROM events WHERE event_id % 50 = 0""").stripMargin,

    "q_csv_roundtrip" -> "SELECT event_id, value FROM events",

    "q_jsonl_roundtrip" ->
      ("SELECT doc_id, md5(text) AS text_md5, lang, source " +
        "FROM documents"),

    "q_orc_roundtrip" ->
      ("SELECT event_id, epoch(ts) AS ts_epoch, event_type, value " +
        "FROM events"),

    "q_schema_evolution" ->
      ("""SELECT event_type, cast(count(*) AS bigint) AS n,
         |  cast(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
         |    AS bigint) AS n_missing,
         |  cast(sum(CASE WHEN event_id % 2 = 1
         |    THEN cast(floor(value*100 + 0.5) AS bigint) ELSE 0 END)
         |    AS bigint) AS cents_sum
         |FROM events GROUP BY 1""").stripMargin,

    "q_csv_export_all" ->
      """WITH f AS (SELECT event_id AS id,
        |  floor(value*100 + 0.5) AS cents FROM events)
        |SELECT 'st_data' AS table_name, count(*) AS n_rows,
        |  cast(sum(id) AS bigint) AS id_sum,
        |  cast(count(*) AS double) AS col1_sum FROM f
        |UNION ALL SELECT 'lt_data', count(*), cast(sum(id) AS bigint),
        |  cast(count(*) AS double) FROM f WHERE id % 10 = 0
        |UNION ALL SELECT 'st_peak', count(*), cast(sum(id) AS bigint),
        |  cast(sum(cents) AS double) FROM f
        |UNION ALL SELECT 'lt_peak', count(*), cast(sum(id) AS bigint),
        |  cast(sum(cents) AS double) FROM f WHERE id % 10 = 0
        |""".stripMargin,

    "q_instrument_config" ->
      """WITH cfg AS (SELECT 'HYP-D-8421' AS serial_number,
        |  cast(64 AS int) AS max_peak_count_per_channel),
        |st AS (SELECT * FROM (VALUES
        |  (cast(0 AS int), 'default', cast(2000 AS int), 'Peak'),
        |  (1, 'sharp', 3000, 'Peak'),
        |  (2, 'valley', 1500, 'Valley'))
        |  AS t(setting_id, setting_name, threshold, mode)),
        |perch AS (
        |  SELECT cast(i AS int) AS channel, count(*) AS n_frames,
        |    max(cast(1 AS int)) AS max_observed
        |  FROM events, generate_series(1, 8) t(i)
        |  GROUP BY 1)
        |SELECT p.channel, p.n_frames, p.max_observed,
        |  cfg.max_peak_count_per_channel,
        |  p.max_observed <= cfg.max_peak_count_per_channel AS within_limit,
        |  cfg.serial_number, s.setting_id, s.setting_name, s.threshold,
        |  s.mode
        |FROM perch p
        |JOIN st s ON s.setting_id = (p.channel - 1) % 3
        |CROSS JOIN cfg""".stripMargin,

    // dim VALUES generated from the same InstrumentConfig constants the
    // responder serves over #ExportSensors
    "q_sensor_config" -> {
      val dim = graft.model.InstrumentConfig.DefaultSensors.map(x =>
        s"(cast(${x.channel} AS int), '${x.name}', '${x.model}', " +
          s"cast(${x.channel} AS int), cast(${x.wavelength} AS double), " +
          s"cast(${x.calibrationFactor} AS double))").mkString(",\n|  ")
      s"""WITH dim AS (SELECT * FROM (VALUES
         |  $dim)
         |  AS t(sensor_no, name, model, channel, wavelength,
         |       calibration_factor)),
         |agg AS (
         |  SELECT cast(k+1 AS int) AS sensor_no, count(*) AS n_frames,
         |    cast(sum(cast(floor(value*100 + 0.5) + k*1000 AS bigint))
         |      AS bigint) AS sval_total
         |  FROM events, generate_series(0, 3) t(k)
         |  GROUP BY 1)
         |SELECT a.sensor_no, d.name, d.model, d.channel, d.wavelength,
         |  d.calibration_factor, a.n_frames, a.sval_total,
         |  a.sval_total * d.calibration_factor AS calibrated_total
         |FROM agg a JOIN dim d ON a.sensor_no = d.sensor_no""".stripMargin
    })
}
