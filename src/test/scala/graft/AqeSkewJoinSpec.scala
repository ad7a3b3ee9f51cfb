package graft

import org.apache.spark.sql.functions._

/** AQE skew handling, demonstrated live: a 90 %-one-key fact joined to
  * a non-broadcastable dim must have its skewed shuffle partition SPLIT
  * by adaptive execution (OptimizeSkewedJoin) — the built-in runtime
  * alternative to q_salted_join's manual salting, and the mechanism a
  * 1000-executor job leans on when a hot key appears mid-dataset. The
  * spec drops the skew thresholds to toy scale, executes, and asserts
  * BOTH the final adaptive plan carries the skew-split join AND the
  * result is exactly the unskewed join's answer.
  */
class AqeSkewJoinSpec extends SparkSpec {

  test("AQE splits the skewed partition and the result is unchanged") {
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90 % of fact rows share key 0; padding makes the hot partition's
      // bytes trip the lowered threshold
      val fact = spark.range(0, 60000).select(
        when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
        col("id").as("v"),
        lpad(col("id").cast("string"), 64, "x").as("pad"))
      val dim = spark.range(0, 1000).select(
        col("id").as("k"), (col("id") * 2).as("w"))
      // keep pad in the output so the hot partition's shuffle bytes are
      // real, and collect THIS frame: count() would build a separate
      // (column-pruned) query execution, leaving joined's adaptive plan
      // unexecuted
      val joined = fact.join(dim, "k")
        .select(col("k"), col("v"), col("w"), col("pad"))
      val n = joined.collect().length.toLong
      // exact expectation: k=0 rows (9 of every 10) + ids <1000 with
      // id%10==9 (the only other fact keys inside the dim's domain)
      val expected = (0L until 60000L).count(_ % 10 < 9) +
        (0L until 1000L).count(_ % 10 == 9)
      assert(n == expected, s"join result changed under skew split: $n")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p)
      assert(p.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
