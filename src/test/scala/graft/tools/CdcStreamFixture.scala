package graft.tools

import java.sql.Timestamp

/** The seeded two-batch CDC stream fixture shared by
  * StreamingCurationSpec, StreamClusterProbe, and LocalClusterSpec —
  * ONE definition, so the probe's stream input and the specs' replay
  * oracles cannot drift apart: docs 1 and 3 share a 240-char block
  * (doc 3 arrives a batch later, so its interior chunks must be
  * flagged from digest state), docs 2 and 4 are novel.
  */
object CdcStreamFixture {
  val W = 8
  val Base = 131L
  val ModP = 32L

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  val Rows: Seq[(Timestamp, Long, String)] = {
    val rnd = new scala.util.Random(5)
    def txt(n: Int) = Seq.fill(n)((32 + rnd.nextInt(90)).toChar).mkString
    val block = txt(240)
    Seq(
      (ts(10), 1L, txt(40) + block + txt(30)),  // block's first sighting
      (ts(11), 2L, txt(300)),                   // unrelated
      (ts(40), 3L, txt(90) + block + txt(10)),  // later batch, same block
      (ts(41), 4L, txt(250)))
  }

  /** Batches as the probes feed them: docs 1-2, then 3-4. */
  val Batch1: Seq[(Timestamp, Long, String)] = Rows.take(2)
  val Batch2: Seq[(Timestamp, Long, String)] = Rows.drop(2)

  /** Pure-JVM sequential replay of [[graft.streaming.StatefulOps
    * .chunkOccurrence]] over `Rows` in (ts, doc_id, ord) order —
    * `verdict|doc|ord|digest|occurrence` lines, the cross-process
    * oracle. Uses the interpreted CdcChunksExpr and java.security MD5,
    * so nothing Spark-side is on the expectation path.
    */
  lazy val ReplayLines: Seq[String] = {
    val expr = graft.functions.CdcChunksExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(""),
        org.apache.spark.sql.types.StringType), W, Base, ModP)
    val seen = scala.collection.mutable.Map[String, Long]()
    Rows.sortBy(r => (r._1.getTime, r._2)).flatMap { case (_, id, t) =>
      val arr = expr.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      (0 until arr.numElements()).map { i =>
        val chunk = arr.getStruct(i, 2).getUTF8String(1).toString
        val dg = java.security.MessageDigest.getInstance("MD5")
          .digest(chunk.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val n = seen.getOrElse(dg, 0L) + 1
        seen(dg) = n
        s"verdict|$id|$i|$dg|$n"
      }
    }.sorted
  }
}
