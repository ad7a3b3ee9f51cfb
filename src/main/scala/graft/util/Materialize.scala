package graft.util

import org.apache.spark.sql.DataFrame

/** Stage-barrier materialization with a scale-configurable backend.
  *
  * Multi-stage pipelines (the curation funnel, iterative clustering)
  * cut lineage at stage boundaries so a stage computes once, not once
  * per downstream consumer. Two backends:
  *
  *  - default: `localCheckpoint` — executor-local blocks, fastest on a
  *    healthy cluster, but blocks die with their executor;
  *  - `spark.graft.materializeDir` set: stage output goes to parquet
  *    under that directory (the 100 TB configuration, mirroring
  *    [[graft.dedup.Dedup.duplicateClusters]]'s `materializePath`) — a
  *    lost executor re-reads from reliable storage instead of
  *    recomputing the stage chain, and a restarted job can resume from
  *    landed stages.
  *
  * The conf is read at call time from the session's runtime conf, so a
  * cluster profile flips every barrier with one setting and tests can
  * toggle per-session.
  */
object Materialize {
  val ConfKey = "spark.graft.materializeDir"

  /** Cut lineage at a stage boundary. Reliable mode writes to a
    * UNIQUE per-invocation subdirectory (`<name>-<uuid>`): a barrier
    * is per-execution state, not a cross-query memo, so two concurrent
    * runs of the same query must never overwrite each other's landed
    * stage out from under a returned DataFrame. (Memoized artifacts
    * with sharing semantics use their own latches — see
    * q_partitioned_prune.) Unlike lazy `localCheckpoint`, reliable
    * mode runs the stage's write job at barrier time; callers already
    * consume every stage, so nothing is computed that wasn't before.
    * The caller owns cleanup of the base directory.
    */
  def barrier(df: DataFrame, name: String): DataFrame =
    df.sparkSession.conf.getOption(ConfKey) match {
      case Some(base) if base.nonEmpty =>
        val safe = name.replaceAll("[^a-zA-Z0-9_-]", "_")
        val p = s"$base/$safe-${java.util.UUID.randomUUID().toString.take(8)}"
        df.write.mode("error").parquet(p)
        df.sparkSession.read.parquet(p)
      case _ => df.localCheckpoint(eager = false)
    }

  /** Land a SESSION-MEMOIZED artifact to parquet and read it back.
    * Unlike [[barrier]]'s default localCheckpoint (per-execution stage
    * state), a memo serves every later query of the session, so it
    * needs two properties localCheckpoint and plain persist each lack:
    *
    *  - survive executor-storage loss (checkpoint blocks die with
    *    their executor AND truncate lineage — the round-6
    *    CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND session-wide flake;
    *    BlockLossRecoverySpec pins the recovery);
    *  - a SMALL analyzed plan (a persisted iteration chain keeps its
    *    full multi-hundred-node tree, and re-analysis alone measured
    *    ~2 s per consuming query for the 5-iteration PageRank memo —
    *    the cache was hit, the DRIVER paid anyway).
    *
    * A parquet landing gives both: the read-back is a plain file scan
    * (tiny plan, storage-loss-proof). Uses `spark.graft.
    * materializeDir` when set (reliable shared storage — the cluster
    * profile), else the JVM tmpdir (single-node default). Memoized
    * artifacts are bounded (vocabulary/frontier-sized), so the write
    * is trivial.
    */
  def memo(df: DataFrame, name: String): DataFrame =
    df.sparkSession.read.parquet(memoPath(df, name))

  /** [[memo]], returning the artifact PATH instead of a DataFrame — for
    * callers that cache across session lifetimes (a path holds no
    * session reference; re-reading it is a trivial file-scan plan).
    * Artifacts landed under the tmpdir default are deleted at JVM exit;
    * an explicit `materializeDir` is cluster-owned storage and is left
    * to its owner's retention policy.
    */
  def memoPath(df: DataFrame, name: String): String = {
    val conf = df.sparkSession.conf.getOption(ConfKey).filter(_.nonEmpty)
    val base = conf.getOrElse(
      System.getProperty("java.io.tmpdir") + "/graft-memo")
    val safe = name.replaceAll("[^a-zA-Z0-9_-]", "_")
    val p = s"$base/$safe-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode("error").parquet(p)
    if (conf.isEmpty) sweepAtExit(p)
    p
  }

  // tmpdir memo artifacts are process-scoped scratch: sweep them when
  // the process ends so long-lived hosts don't accumulate UUID dirs
  private val exitSweep = scala.collection.mutable.ArrayBuffer.empty[String]
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      exitSweep.synchronized {
        exitSweep.foreach { p =>
          def del(f: java.io.File): Unit = {
            val kids = f.listFiles()
            if (kids != null) kids.foreach(del)
            f.delete()
          }
          del(new java.io.File(p))
        }
      }, "graft-memo-sweep"))
  private def sweepAtExit(p: String): Unit = {
    hookInstalled
    exitSweep.synchronized { exitSweep += p }
  }
}
