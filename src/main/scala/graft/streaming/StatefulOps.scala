package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Custom-state streaming operators (SURVEY.md §2.7 extension):
  * per-key state the built-in windowed aggregates can't express —
  * `KeyValueGroupedDataset.flatMapGroupsWithState` with explicit
  * timeout-driven eviction.
  *
  * Scale notes: state lives in the state store, partitioned by key —
  * one shuffle on the group key, then O(1) per-event updates; TTL via
  * GroupStateTimeout so idle keys are evicted instead of leaking (the
  * reference's drain loop keeps per-stream state implicitly in process
  * memory, ref: database_peak_streaming.py:16-69).
  */
object StatefulOps {

  final case class FrameEvent(serial: Long, ts: Timestamp, firstPeak: Double)

  /** Per-serial running monitor state. */
  final case class SerialState(
      nFrames: Long, sumFirstPeak: Double, lastTsMs: Long)

  final case class SerialUpdate(
      serial: Long, n_frames: Long, mean_first_peak: Double, last_ts_ms: Long)

  /** Live per-serial monitor: running count / mean-of-first-peak /
    * last-seen, emitted once per micro-batch per active key. With
    * `idleMs > 0`, idle keys time out after that much processing time
    * and emit a final row before their state is evicted (production
    * setting — keeps the store bounded); `idleMs = 0` keeps state for
    * the life of the query (bounded-key workloads, tests).
    */
  def serialMonitor(events: Dataset[FrameEvent],
                    idleMs: Long = 0L): Dataset[SerialUpdate] = {
    import events.sparkSession.implicits._
    val timeout = if (idleMs > 0) GroupStateTimeout.ProcessingTimeTimeout
                  else GroupStateTimeout.NoTimeout
    events.groupByKey(_.serial)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (serial: Long, rows: Iterator[FrameEvent],
         state: GroupState[SerialState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              SerialUpdate(serial, s.nFrames, s.sumFirstPeak / s.nFrames,
                s.lastTsMs))
          } else {
            val prev = state.getOption.getOrElse(SerialState(0L, 0.0, 0L))
            val next = rows.foldLeft(prev) { (s, e) =>
              SerialState(s.nFrames + 1, s.sumFirstPeak + e.firstPeak,
                math.max(s.lastTsMs, e.ts.getTime))
            }
            state.update(next)
            if (idleMs > 0) state.setTimeoutDuration(idleMs)
            Iterator.single(
              SerialUpdate(serial, next.nFrames,
                next.sumFirstPeak / next.nFrames, next.lastTsMs))
          }
      }
  }

  /** [[serialMonitor]] re-expressed on the transformWithState API
    * (Spark 4's arbitrary-state operator, SPARK-46815): typed
    * `ValueState` from the processor handle, optional per-state TTL via
    * `TTLConfig` (the store evicts expired state itself — no manual
    * timeout bookkeeping like GroupStateTimeout), and a processor
    * object the runtime can evolve independently of the query. Same
    * semantics as [[serialMonitor]] (one update per active key per
    * micro-batch), cross-checked in StatefulOpsSpec. Requires the
    * RocksDB state-store provider — at scale that is also the right
    * provider (incremental checkpoints, state larger than heap);
    * callers set `spark.sql.streaming.stateStore.providerClass`.
    */
  def serialMonitorTws(events: Dataset[FrameEvent],
                       ttl: java.time.Duration = null): Dataset[SerialUpdate] = {
    import events.sparkSession.implicits._
    val conf = Option(ttl).map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
    // TTL requires processing-time semantics; without TTL the state
    // lives for the query (bounded-key workloads, tests)
    val mode = if (conf == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    events.groupByKey(_.serial)
      .transformWithState(new SerialMonitorProcessor(conf), mode,
        OutputMode.Append())
  }

  /** The transformWithState processor behind [[serialMonitorTws]]. */
  final class SerialMonitorProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, FrameEvent, SerialUpdate] {
    @transient private var st: ValueState[SerialState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SerialState]("monitor",
        org.apache.spark.sql.Encoders.product[SerialState], ttl)
    override def handleInputRows(serial: Long, rows: Iterator[FrameEvent],
        timerValues: TimerValues): Iterator[SerialUpdate] = {
      val prev = if (st.exists()) st.get() else SerialState(0L, 0.0, 0L)
      val next = rows.foldLeft(prev) { (s, e) =>
        SerialState(s.nFrames + 1, s.sumFirstPeak + e.firstPeak,
          math.max(s.lastTsMs, e.ts.getTime))
      }
      st.update(next)
      Iterator.single(SerialUpdate(serial, next.nFrames,
        next.sumFirstPeak / next.nFrames, next.lastTsMs))
    }
  }

  final case class EventPoint(event_id: Long, user_id: Long,
      ts: Timestamp, value: Double)
  final case class EwmaPoint(event_id: Long, user_id: Long, ewma: Double)
  /** Trailing window carried between micro-batches: at most k−1 values,
    * newest last — bounded per-key state (16 doubles), store-friendly.
    */
  final case class EwmaState(values: Seq[Double])

  /** Streaming form of `q_ewma`: per-user trailing-k exponentially
    * weighted mean, one output row per arriving event. Each event folds
    * the IDENTICAL left-to-right Horner recurrences the batch query
    * evaluates (numerator Σ xᵢβⁿ⁻¹⁻ⁱ, normalizer Σ βᵏ, 6-dp floor pin),
    * so the update stream equals the batch result bit-for-bit when
    * events arrive in (ts, event_id) order per key. Within a
    * micro-batch the processor re-sorts its group (the groupByKey
    * shuffle has no order contract); CROSS-batch in-order delivery is
    * the stream contract, like the reference's in-order TCP frame
    * stream. Parity is pinned by StatefulOpsSpec against the batch
    * query on the same events.
    */
  def ewmaByKey(events: Dataset[EventPoint], beta: Double = 0.75,
                k: Int = 16): Dataset[EwmaPoint] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[EventPoint],
         state: GroupState[EwmaState]) =>
          var buf = state.getOption.map(_.values.toVector)
            .getOrElse(Vector.empty[Double])
          val ordered = rows.toVector.sortBy(e =>
            (e.ts.toInstant.getEpochSecond * 1000000L +
              e.ts.getNanos / 1000L, e.event_id))
          val out = ordered.map { e =>
            val arr = (buf :+ e.value).takeRight(k)
            val num = arr.foldLeft(0.0)((acc, x) => acc * beta + x)
            val den = arr.foldLeft(0.0)((acc, _) => acc * beta + 1.0)
            buf = arr.takeRight(k - 1)
            EwmaPoint(e.event_id, user,
              math.floor(num / den * 1e6 + 0.5) / 1e6)
          }
          state.update(EwmaState(buf))
          out.iterator
      }
  }

  /** Streaming exact dedup on a content digest within the watermark
    * horizon — the streaming form of [[graft.dedup.Dedup.exactDuplicates]]
    * using the BUILT-IN state operator (preferred over custom state when
    * semantics fit): state per digest is dropped once the watermark
    * passes, so it cannot grow unboundedly.
    */
  def dedupByDigest(docs: DataFrame, tsCol: String, digestCol: String,
                    watermark: String = "10 seconds"): DataFrame =
    docs.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(digestCol)

  final case class ChunkInstance(
      ts: Timestamp, doc_id: Long, ord: Int, digest: String)

  final case class ChunkVerdict(
      doc_id: Long, ord: Int, digest: String, occurrence: Long)

  final case class DigestCount(n: Long)

  /** Streaming occurrence rank per content digest — the ONLINE form of
    * q_substring_dedup's corpus-wide chunk occurrence count: each
    * arriving chunk instance is assigned its 1-based occurrence index
    * against everything the stream has seen so far (1 = novel content,
    * ≥2 = repeats earlier stream content). This is the dedup-at-ingest
    * semantic — a crawler flags repeated material the moment it
    * arrives, instead of waiting for a retrospective batch pass.
    *
    * State per digest is ONE counter (not the instances), partitioned
    * by the 128-bit digest exactly like the batch query's occurrence
    * groupBy — the same fixed-width-key scale rule. Within a
    * micro-batch the group re-sorts by (ts, doc_id, ord) so the rank
    * is deterministic (the groupByKey shuffle has no order contract);
    * cross-batch, arrival order is the stream contract.
    *
    * With `idleMs > 0`, a digest not seen for that much processing
    * time is EVICTED and its count forgotten (the production setting —
    * distinct-chunk cardinality grows with the corpus, so an unbounded
    * store is the scale-killer; forgetting idle digests is the same
    * bounded-memory contract as `dropDuplicatesWithinWatermark`, and
    * the [[serialMonitor]] idleMs convention). `idleMs = 0` keeps
    * every digest for the life of the query (bounded-key workloads,
    * tests).
    */
  def chunkOccurrence(chunks: Dataset[ChunkInstance],
                      idleMs: Long = 0L): Dataset[ChunkVerdict] = {
    import chunks.sparkSession.implicits._
    val timeout = if (idleMs > 0) GroupStateTimeout.ProcessingTimeTimeout
                  else GroupStateTimeout.NoTimeout
    chunks.groupByKey(_.digest)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (digest: String, rows: Iterator[ChunkInstance],
         state: GroupState[DigestCount]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var n = state.getOption.map(_.n).getOrElse(0L)
            val out = rows.toVector
              .sortBy(c => (c.ts.getTime, c.doc_id, c.ord))
              .map { c =>
                n += 1
                ChunkVerdict(c.doc_id, c.ord, digest, n)
              }
            state.update(DigestCount(n))
            if (idleMs > 0) state.setTimeoutDuration(idleMs)
            out.iterator
          }
      }
  }

  /** Stream-stream event-time interval join: each left event matched to
    * right events with the same key whose timestamp lies within
    * `[left.ts - lowerSec, left.ts + upperSec]`. Both sides carry
    * watermarks and the join condition bounds event time on BOTH sides —
    * the two requirements that let Spark evict join state instead of
    * buffering either stream forever (the scale contract for
    * stream-stream joins; an unbounded-time condition would grow state
    * with the stream).
    *
    * Column contract: left has (key, ts, …), right has (key, rts, …) —
    * distinct time-column names so the interval condition is
    * unambiguous.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   lowerSec: Long, upperSec: Long,
                   watermark: String = "10 seconds"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $lowerSec SECONDS") &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $upperSec SECONDS"))
      .drop(r(key))
  }
}
