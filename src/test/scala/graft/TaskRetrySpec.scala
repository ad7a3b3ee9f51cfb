package graft

/** Task-retry determinism, end to end: a first-attempt task failure
  * injected mid-stream (RetryProbe, child JVM on `local[4, 2]`) must
  * leave query results BIT-IDENTICAL to the clean run — the
  * 1000-executor-cluster property the suite's determinism discipline
  * (no rand(), locally-sorted round-robin, digest keys) exists to
  * guarantee. Covers both a digest-keyed shuffle aggregate and the
  * custom TopKPerKey physical operator, whose per-partition heaps must
  * rebuild identically on the retried attempt.
  */
class TaskRetrySpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("injected first-attempt task failure leaves results bit-identical " +
      "(digest shuffle + custom TopKPerKey exec)") {
    val (rc, out) = graft.tools.ProbeHarness.launch(
      "graft.tools.RetryProbe", Seq(d), "/dev/shm/graft-spark-retry")
    assert(rc == 0, s"probe JVM failed (rc=$rc):\n$out")
    assert(out.linesIterator.exists(_.startsWith("injected|")),
      s"fault never fired — the probe proved nothing:\n$out")
    val probed = out.linesIterator
      .filter(l => l.startsWith("dedup|") || l.startsWith("topk|"))
      .toVector.sorted
    // clean reference: the IDENTICAL plan shapes (same typed hop, fault
    // disabled) on the suite's shared single-attempt session
    val docs = graft.tools.RetryProbe.input(spark, d, inject = false)
    val expected = graft.tools.RetryProbe.probes(docs)
      .flatMap { case (n, df) => graft.tools.RetryProbe.render(n, df) }
      .toVector.sorted
    assert(probed.nonEmpty && expected.nonEmpty)
    assert(probed == expected,
      s"retry changed results:\nprobe=${probed.take(5)}\nclean=${expected.take(5)}")
  }
}
