package graft

/** Multi-process execution parity: representative queries (one per
  * custom-machinery class — native codegen expressions, the typed
  * vec-mean aggregate, the TopKPerKey physical operator, broadcast
  * Bloom probes, digest shuffle funnels) run on `local-cluster` with
  * two REAL executor JVMs (ClusterProbe) and must return row sets
  * identical to the shared single-JVM session. This is the boundary
  * `local[N]` never crosses: closure/broadcast serialization, remote
  * shuffle-block fetches between processes, and executor-side
  * class-loading of generated code and expression reference objects.
  */
class LocalClusterSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("representative queries return identical rows on real forked " +
      "executors (local-cluster) vs the in-process session") {
    val java = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(java) ++ addOpens ++ Seq("-Xmx4g",
      "-Dspark.local.dir=/dev/shm/graft-spark-cluster", "-cp", cp,
      "graft.tools.ClusterProbe", d)
    val out = new StringBuilder
    val rc = scala.sys.process.Process(cmd, None,
        "SPARK_HOME" -> "/opt/spark",
        // executor launcher can't infer the scala version when the
        // driver isn't started via spark-class on a binary dist
        "SPARK_SCALA_VERSION" -> "2.13")
      .!(scala.sys.process.ProcessLogger(l => out.append(l).append('\n'),
        _ => ()))
    assert(rc == 0, s"probe JVM failed (rc=$rc):\n${out.toString.takeRight(4000)}")
    // driver + 2 executors: multi-process really happened
    val execLine = out.toString.linesIterator
      .find(_.startsWith("executors|"))
    assert(execLine.exists(_.split('|')(1).toInt >= 3),
      s"probe did not run multi-process: $execLine")

    graft.tools.ClusterProbe.Probes.foreach { name =>
      val probed = out.toString.linesIterator
        .filter(_.startsWith(s"$name|")).toVector.sorted
      val expected = SparkEntry.queries(name)(spark, d).collect()
        .map(r => s"$name|${r.toString}").toVector.sorted
      assert(probed.nonEmpty, s"$name returned nothing from the cluster")
      assert(probed == expected,
        s"$name diverged across the process boundary:\n" +
          s"probe=${probed.take(3)}\nlocal=${expected.take(3)}")
    }
  }

  test("stateful streaming (chunkOccurrence) runs with executor-side " +
      "state stores and matches the sequential replay") {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx4g",
      "-Dspark.local.dir=/dev/shm/graft-spark-scluster", "-cp", cp,
      "graft.tools.StreamClusterProbe")
    val out = new StringBuilder
    val rc = scala.sys.process.Process(cmd, None,
        "SPARK_HOME" -> "/opt/spark",
        "SPARK_SCALA_VERSION" -> "2.13")
      .!(scala.sys.process.ProcessLogger(l => out.append(l).append('\n'),
        _ => ()))
    assert(rc == 0, s"probe JVM failed (rc=$rc):\n${out.toString.takeRight(4000)}")
    assert(out.toString.linesIterator
      .find(_.startsWith("executors|"))
      .exists(_.split('|')(1).toInt >= 3), "not multi-process")
    val probed = out.toString.linesIterator
      .filter(_.startsWith("verdict|")).toVector.sorted
    // the fixture is deterministic (seeded); replay it sequentially
    val rnd = new scala.util.Random(5)
    def txt(n: Int) = Seq.fill(n)((32 + rnd.nextInt(90)).toChar).mkString
    val block = txt(240)
    val texts = Seq(
      1L -> (txt(40) + block + txt(30)), 2L -> txt(300),
      3L -> (txt(90) + block + txt(10)), 4L -> txt(250))
    val expr = graft.functions.CdcChunksExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(""),
        org.apache.spark.sql.types.StringType), 8, 131L, 32L)
    val seen = scala.collection.mutable.Map[String, Long]()
    val expected = texts.flatMap { case (id, t) =>
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
    assert(probed.nonEmpty && probed == expected,
      s"cluster stream diverged:\nprobe=${probed.take(3)}\n" +
        s"replay=${expected.take(3)}")
  }
}
