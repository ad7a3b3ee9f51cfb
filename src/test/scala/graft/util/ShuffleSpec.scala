package graft.util

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ShuffleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join and aggregate with ZERO exchanges") {
    val n = 1000
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Shuffle.writeBucketed(
        (0 until n).map(i => (i.toLong % 100, i.toLong)).toDF("k", "a"),
        "bk_left", buckets = 4, Seq("k"))
      Shuffle.writeBucketed(
        (0 until 200).map(i => (i.toLong % 100, s"v$i")).toDF("k", "b"),
        "bk_right", buckets = 4, Seq("k"))
      val joined = spark.table("bk_left").join(spark.table("bk_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == n * 2) // each k has 2 right rows

      // grouped agg on the bucket key: also exchange-free
      val agg = spark.table("bk_left").groupBy($"k").agg(sum($"a"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"bucketed agg still shuffles:\n$aggPlan")
      assert(agg.count() == 100)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bk_left")
      spark.sql("DROP TABLE IF EXISTS bk_right")
    }
  }

  test("saltedJoin ≡ plain join on a pathologically skewed key") {
    // 10k rows of hot key 0 + a tail of 100 other keys
    val left = ((0 until 10000).map(i => (0L, i.toLong)) ++
      (1 to 100).map(k => (k.toLong, -k.toLong))).toDF("k", "payload")
    val right = (0 to 100).map(k => (k.toLong, s"dim$k")).toDF("k", "name")
    val plain = left.join(right, "k")
      .select($"k", $"payload", $"name")
      .as[(Long, Long, String)].collect().sorted.toSeq
    val salted = Shuffle.saltedJoin(left, right, "k", saltFactor = 8)
      .select($"k", $"payload", $"name")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted == plain)
    // the hot key genuinely scatters: >1 distinct salt among key-0 rows
    val salts = left.filter($"k" === 0)
      .withColumn("__salt", pmod(hash(left.columns.map(col): _*), lit(8)))
      .select($"__salt").distinct().count()
    assert(salts > 1)
  }

  test("saltedJoin preserves duplicate right rows (inner-join semantics)") {
    val left = Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("k", "payload")
    val right = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "name")
    val plain = left.join(right, "k").count()
    val salted = Shuffle.saltedJoin(left, right, "k", 4).count()
    assert(salted == plain && salted == 5)
  }
}
