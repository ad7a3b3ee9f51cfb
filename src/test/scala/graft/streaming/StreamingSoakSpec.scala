package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import graft.SparkSpec

/** Bounded-state soak for the stateful streaming path (r11 verdict
  * item 6). The reference's design point is month-scale uptime
  * (README.md:27, 2^30 s); the existing specs drain ≤16 micro-batches,
  * which exercises semantics but not the property that decides whether
  * the pipeline survives a month: STATE MUST PLATEAU. Each soak here
  * pushes hundreds of micro-batches through a stateful operator on the
  * RocksDB store (the at-scale provider), samples
  * `lastProgress.stateOperators.numRowsTotal` after every batch, and
  * asserts (a) the state-row curve plateaus — late-phase occupancy is
  * bounded by the horizon/domain, NOT by how long the stream has run —
  * and (b) every emitted row equals the sequential driver-side replay
  * of the same input, so eviction never changed an answer.
  */
class StreamingSoakSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `body` with the RocksDB provider set, restoring after.
    *
    * No-data micro-batches are disabled for the soak: with the default
    * trigger they re-fire continuously for processing-time timeouts
    * (thousands of empty batches behind 300 data batches — measured
    * batchId 5,861 after 300 adds), swamping the run without changing
    * what the soak asserts — data batches arrive every loop iteration,
    * and watermark eviction and timed-out-group processing both also
    * run on data batches.
    */
  private def withRocksDb[A](body: => A): A = {
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prev = spark.conf.getOption(providerKey)
    val prevNoData = spark.conf.getOption(noDataKey)
    spark.conf.set(providerKey, rocksDb)
    spark.conf.set(noDataKey, "false")
    try body
    finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
      prevNoData match {
        case Some(v) => spark.conf.set(noDataKey, v)
        case None => spark.conf.unset(noDataKey)
      }
    }
  }

  private def stateRows(q: StreamingQuery): Long = {
    val p = q.lastProgress
    if (p == null || p.stateOperators.isEmpty) -1L
    else p.stateOperators.map(_.numRowsTotal).sum
  }

  test("soak: dropDuplicatesWithinWatermark state plateaus at the " +
      "watermark horizon over 300 micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val nBatches = 300
      val in = MemoryStream[(Timestamp, String)]
      val out = StatefulOps.dedupByDigest(
        in.toDF().toDF("ts", "digest"), "ts", "digest", "10 seconds")
      val q = out.writeStream.format("memory").queryName("soak_dedup")
        .outputMode("append").start()
      val sizes = mutable.ArrayBuffer.empty[Long]
      try {
        // batch i (event-time second i): introduces digest n<i> and
        // replays the previous two batches' digests — in-horizon
        // repeats, so exactly one row per digest may survive
        for (i <- 0 until nBatches) {
          val rows = (math.max(0, i - 2) to i).map(j => (ts(i), s"n$j"))
          in.addData(rows)
          q.processAllAvailable()
          sizes += stateRows(q)
        }
        val emitted = spark.table("soak_dedup")
          .as[(Timestamp, String)].collect()
        // sequential replay: the first batch that carries digest n<j>
        // is batch j, so the suppression set is exactly one per digest
        assert(emitted.length == nBatches,
          s"expected one survivor per digest, got ${emitted.length}")
        assert(emitted.map(_._2).toSet == (0 until nBatches)
          .map(j => s"n$j").toSet)
        // plateau: 300 distinct digests passed through, but the
        // watermark (10 s behind max event time) keeps only ~13 live
        // seconds of digests; no late-phase sample may see the store
        // grow with stream age
        val late = sizes.drop(50).filter(_ >= 0)
        assert(late.max <= 25,
          s"state grew with stream age: late max ${late.max} " +
            s"(sizes tail: ${sizes.takeRight(10)})")
      } finally q.stop()
    }
  }

  test("soak: ewmaByKey state stays |users| over 300 micro-batches, " +
      "emissions equal the sequential fold") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val nBatches = 300
      val users = 8
      val beta = 0.75
      val k = 16
      val in = MemoryStream[StatefulOps.EventPoint]
      val q = StatefulOps.ewmaByKey(in.toDS(), beta, k)
        .writeStream.format("memory").queryName("soak_ewma")
        .outputMode("append").start()
      val sizes = mutable.ArrayBuffer.empty[Long]
      // deterministic values without Math.random: LCG in the driver
      var seed = 42L
      def nextVal(): Double = {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        ((seed >>> 11) % 1000L).toDouble / 10.0
      }
      // sequential model: the exact same fold the processor runs
      val bufs = mutable.Map.empty[Long, Vector[Double]]
      val model = mutable.Map.empty[Long, Double]
      try {
        var eid = 0L
        for (i <- 0 until nBatches) {
          val rows = (0 until 4).map { j =>
            val u = ((i * 4 + j) % users).toLong
            val v = nextVal()
            eid += 1
            val arr = (bufs.getOrElse(u, Vector.empty) :+ v).takeRight(k)
            val num = arr.foldLeft(0.0)((acc, x) => acc * beta + x)
            val den = arr.foldLeft(0.0)((acc, _) => acc * beta + 1.0)
            bufs(u) = arr.takeRight(k - 1)
            model(eid) = math.floor(num / den * 1e6 + 0.5) / 1e6
            StatefulOps.EventPoint(eid, u, ts(i), v)
          }
          in.addData(rows)
          q.processAllAvailable()
          sizes += stateRows(q)
        }
        val emitted = spark.table("soak_ewma")
          .as[StatefulOps.EwmaPoint].collect()
        assert(emitted.length == nBatches * 4)
        emitted.foreach(p => assert(p.ewma == model(p.event_id),
          s"event ${p.event_id}: stream ${p.ewma} != replay " +
            s"${model(p.event_id)}"))
        // per-user trailing windows are the ONLY state: |users| rows
        // forever, independent of the 1,200 events that flowed through
        assert(sizes.drop(2).filter(_ >= 0).forall(_ == users),
          s"state rows drifted from $users: ${sizes.distinct}")
      } finally q.stop()
    }
  }

  test("soak: chunkOccurrence with idle eviction — counts equal the " +
      "sequential replay, store tracks the live phase, not history") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      // digests rotate in phases: phase p (30 batches) touches only
      // digests p*8..p*8+7, then never again — with a 10 s idle TTL
      // a phase's digests are evicted a couple of phases later, so
      // the store tracks the live working set while TOTAL distinct
      // digests grow with the stream. Every batch touches ALL 8 of
      // its phase's digests, so the in-phase recurrence gap is ONE
      // batch: only a single micro-batch stalling past the whole TTL
      // could evict live state (a 4-batch gap at 5 s flaked exactly
      // that way on a loaded host — warm-up batches run 1-2 s).
      // Eviction can then only reset a count nobody reads again, so
      // the sequential model stays exact regardless of host pace.
      val phases = 10
      val batchesPerPhase = 30
      val in = MemoryStream[StatefulOps.ChunkInstance]
      val q = StatefulOps.chunkOccurrence(in.toDS(), idleMs = 10000L)
        .writeStream.format("memory").queryName("soak_chunk")
        .outputMode("append").start()
      val sizes = mutable.ArrayBuffer.empty[Long]
      val model = mutable.Map.empty[String, Long]
      val expect = mutable.ArrayBuffer.empty[(Long, Long)] // (doc, occ)
      try {
        var doc = 0L
        for (p <- 0 until phases; b <- 0 until batchesPerPhase) {
          val i = p * batchesPerPhase + b
          val rows = (0 until 8).map { j =>
            val dg = s"c${p * 8 + j}"
            doc += 1
            model(dg) = model.getOrElse(dg, 0L) + 1L
            expect += ((doc, model(dg)))
            StatefulOps.ChunkInstance(ts(i), doc, 0, dg)
          }
          in.addData(rows)
          q.processAllAvailable()
          sizes += stateRows(q)
          if (b % 10 == 9) Thread.sleep(600) // ≥1.8 s floor per phase
        }
        val emitted = spark.table("soak_chunk")
          .as[StatefulOps.ChunkVerdict].collect()
          .map(v => (v.doc_id, v.occurrence)).toMap
        expect.foreach { case (d, occ) =>
          assert(emitted(d) == occ,
            s"doc $d: stream occurrence ${emitted(d)} != replay $occ")
        }
        // 80 distinct digests flowed through; by mid-stream the live
        // set is one phase (8) plus a few phases awaiting timeout
        val late = sizes.drop(5 * batchesPerPhase).filter(_ >= 0)
        assert(late.max <= 48 && late.last <= 40,
          s"idle eviction not bounding the store: late max ${late.max}, " +
            s"final ${late.last}")
      } finally q.stop()
    }
  }
}
