package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (InjectRuntimeFilter), demonstrated
  * live: when a join's creation side is small and selectively filtered
  * and the application side is a big scan on a NON-partition column,
  * the optimizer builds a bloom filter from the creation side's join
  * keys and pushes a `might_contain` probe below the application-side
  * shuffle — rows that cannot join die at the scan instead of paying
  * the exchange. This is the 100 TB complement to DPP (DppSpec) for
  * keys that are NOT the partition layout, and the same mechanism the
  * engine's own q_bloom_decontam builds by hand; here the OPTIMIZER
  * must inject it, result-transparently.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective dim filter injects a bloom probe on the fact scan, " +
      "result identical with the feature off") {
    val dir = Files.createTempDirectory("graft_rtf").toString
    import spark.implicits._
    // fact keyed on a non-partition column; dim selects 2 of 200 keys
    (0L until 100000L).map(i => (i, i % 200, i * 7)).toDF("id", "fk", "v")
      .write.parquet(s"$dir/fact")
    (0L until 200L).map(k => (k, s"grp${k % 100}")).toDF("k", "grp")
      .write.parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim")

    def run(): org.apache.spark.sql.DataFrame = fact
      .join(dim.filter(col("grp") === "grp0").hint("shuffle_hash"),
        col("fk") === col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).cast("long").as("s"))

    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      // thresholds sized for the fixture (the defaults target real
      // 10 MB / 10 GB tables); the MECHANISM under test is unchanged.
      // Auto-broadcast off: a by-size-broadcastable creation side
      // disqualifies the join from runtime filtering (at 100 TB the
      // dim after its filter is routinely past the broadcast limit)
      conf.set(keys(0), "true")
      conf.set(keys(1), "128MB")
      conf.set(keys(2), "0")
      conf.set(keys(3), "-1")
      val on = run()
      val Array(rowOn) = on.collect()
      val pOn = on.queryExecution.executedPlan.toString
      assert(pOn.contains("might_contain"),
        s"no bloom runtime filter reached the fact side:\n$pOn")

      conf.set(keys(0), "false")
      val off = run()
      val Array(rowOff) = off.collect()
      assert(!off.queryExecution.executedPlan.toString.contains("might_contain"))
      assert(rowOn == rowOff, s"bloom filter changed the result: " +
        s"$rowOn vs $rowOff")
      // exact expectation: keys 0 and 100 survive (grp0 = k % 100 == 0)
      val kept = (0L until 100000L).filter(i => i % 200 == 0 || i % 200 == 100)
      assert(rowOn.getLong(0) == kept.size &&
        rowOn.getLong(1) == kept.map(_ * 7).sum, rowOn.toString)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
