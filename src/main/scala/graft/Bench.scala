package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = SparkEntry.queries.keys.toSeq.sorted
    var errors = Map.empty[String, String]

    names.foreach { n =>            // warmup pass (untimed)
      try force(SparkEntry.queries(n)(spark, sfDir))
      catch { case e: Throwable =>
        errors += n -> e.toString.linesIterator.next().take(200) }
    }

    val results = names.map { n =>  // timed pass
      val t0 = System.nanoTime()
      try force(SparkEntry.queries(n)(spark, sfDir))
      catch { case e: Throwable =>
        errors += n -> e.toString.linesIterator.next().take(200) }
      n -> (System.nanoTime() - t0) / 1e9
    }

    val qs = results.map { case (k, v) => s"\"$k\":$v" }
      .mkString("{", ",", "}")
    val errs = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"$k\":\"${v.replace("\\", "\\\\").replace("\"", "\\\"")}\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
