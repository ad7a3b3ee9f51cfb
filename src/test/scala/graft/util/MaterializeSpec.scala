package graft.util

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Crash-consistency contract of [[Materialize.barrier]] reliable mode
  * (`spark.graft.materializeDir`): a barrier write that dies mid-job
  * must never poison a retry — the retry lands in a FRESH
  * `<name>-<uuid>` directory and reads back exactly its own rows,
  * while whatever the failed attempt left behind is never read.
  * Complements BlockLossRecoverySpec (which covers the default
  * localCheckpoint backend's lost-block path).
  */
class MaterializeSpec extends SparkSpec {

  private def subdirs(base: String): Set[String] =
    Option(new File(base).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).toSet

  test("a failed barrier write never poisons the retry: fresh uuid dir, " +
      "clean rerun, half-written attempt unread") {
    val base = Files.createTempDirectory("graft_mat_crash").toString
    spark.conf.set(Materialize.ConfKey, base)
    try {
      // a plan that fails mid-write: assert_true throws on row 7, after
      // other partitions may already have landed task files
      val bad = spark.range(0, 10, 1, 4)
        .select(col("id"), assert_true(col("id") =!= 7).as("x"))
      intercept[Exception] { Materialize.barrier(bad, "crash") }
      val afterFailure = subdirs(base)
      // whatever the failed attempt left (a half-written dir, or
      // nothing if the committer cleaned up) must not satisfy a retry
      afterFailure.foreach { d =>
        assert(!new File(s"$base/$d/_SUCCESS").exists(),
          s"failed attempt $d must not look committed")
      }
      // the retry is a NEW invocation: new uuid dir, full data
      val good = Materialize.barrier(
        spark.range(0, 10, 1, 4).toDF("id"), "crash")
      assert(good.select(col("id")).collect().map(_.getLong(0)).sorted
        .toSeq == (0L until 10L))
      val committed = (subdirs(base) -- afterFailure)
        .filter(d => new File(s"$base/$d/_SUCCESS").exists())
      assert(committed.size == 1,
        s"exactly one fresh committed dir, got $committed")
      assert(committed.head.startsWith("crash-"))
      // mode("error") + per-invocation uuid: a second barrier under the
      // SAME name coexists — never overwrites the first's landed stage
      val again = Materialize.barrier(
        spark.range(100, 105).toDF("id"), "crash")
      assert(again.count() == 5L)
      assert(good.select(col("id")).collect().map(_.getLong(0)).sorted
        .toSeq == (0L until 10L),
        "first barrier's data intact after a same-name rerun")
    } finally {
      spark.conf.unset(Materialize.ConfKey)
    }
  }
}
