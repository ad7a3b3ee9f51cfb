package graft.util

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** AQE skew-join handling — the runtime complement to the
  * deterministic salting in [[Shuffle.saltedJoin]]: with adaptive
  * execution on, a sort-merge join whose build key is pathologically
  * hot must be re-planned at RUNTIME into split skew partitions
  * (`skew=true` in the executed plan), with results identical to the
  * non-adaptive plan. At 100 TB this is the difference between one
  * straggler task owning the hot key's entire partition and the hot
  * key being fanned across many tasks.
  */
class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("hot key triggers AQE skew split; results identical to non-AQE") {
    // 50k rows on one hot key + a uniform tail vs a small dim table
    val fact = (0 until 60000).map { i =>
      val k = if (i % 6 < 5) 0L else (i % 96 + 1).toLong // ~83% on key 0
      (k, i.toLong)
    }.toDF("k", "v")
    val dim = (0L until 97L).map(k => (k, s"dim$k")).toDF("k", "name")

    def run(aqe: Boolean): (Array[(Long, Long, String)], String) = {
      val conf = spark.conf
      val saved = Seq(
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.join.preferSortMergeJoin"
      ).map(k => k -> conf.getOption(k))
      try {
        conf.set("spark.sql.adaptive.enabled", aqe.toString)
        conf.set("spark.sql.adaptive.skewJoin.enabled", aqe.toString)
        // thresholds sized to the fixture so the hot partition is
        // "skewed" by AQE's definition at test scale
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          "64KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        // force the shuffle join path (no broadcast shortcut)
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.join.preferSortMergeJoin", "true")
        // no aggregation above the join: a downstream partitioning
        // requirement would veto the skew split (it breaks the hash
        // partitioning guarantee)
        val joined = fact.join(dim, "k")
          .select($"k", $"v", $"name").as[(Long, Long, String)]
        val rows = joined.collect().sortBy(r => (r._1, r._2))
        (rows, joined.queryExecution.executedPlan.toString)
      } finally saved.foreach { case (k, v) =>
        v.fold(conf.unset(k))(conf.set(k, _))
      }
    }

    val (withAqe, planAqe) = run(aqe = true)
    val (without, _) = run(aqe = false)
    assert(withAqe.sameElements(without), "AQE changed the results")
    assert(withAqe.count(_._1 == 0L) == 50000)
    // the executed adaptive plan must mark the hot-side SMJ skew-split
    assert(planAqe.contains("skew=true"),
      s"AQE did not split the skewed partition:\n$planAqe")
  }
}
