package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def data = {
    val rnd = new scala.util.Random(5)
    (1 to 500).map(i => (rnd.nextInt(20).toLong, i.toLong, rnd.nextInt(1000)))
      .toDF("k", "id", "v")
  }

  test("TopKPerKey equals the window+filter formulation") {
    val viaNode = TopKPerKey(data, Seq("k"),
        Seq("v" -> true, "id" -> false), 3)
      .select($"k", $"id").as[(Long, Long)].collect().toSet
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"id".asc)
    val viaWindow = data.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"k", $"id").as[(Long, Long)].collect().toSet
    assert(viaNode == viaWindow)
    assert(viaNode.nonEmpty)
  }

  test("key filters push below the node and results stay correct") {
    val df = TopKPerKey(data, Seq("k"), Seq("v" -> true, "id" -> false), 2)
      .filter($"k" < 5)
    // the rule moves the deterministic key filter under TopKPerKeyNode
    val optimized = df.queryExecution.optimizedPlan.toString
    val nodeIdx = optimized.indexOf("TopKPerKeyNode")
    val filterIdx = optimized.indexOf("Filter")
    assert(nodeIdx >= 0 && filterIdx > nodeIdx,
      s"expected Filter BELOW TopKPerKeyNode in:\n$optimized")
    val got = df.select($"k", $"id").as[(Long, Long)].collect().toSet
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"id".asc)
    val want = data.filter($"k" < 5)
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
      .select($"k", $"id").as[(Long, Long)].collect().toSet
    assert(got == want)
  }

  test("sort-based fallback under a tiny key budget equals the window form") {
    // 5 000 distinct skewed keys (~zipf-ish: key 0 holds ~half the rows)
    // through a 64-key in-memory budget — every partition overflows into
    // the spillable external sort
    val rnd = new scala.util.Random(11)
    val big = (1 to 20000).map { i =>
      val key = if (rnd.nextBoolean()) 0L else rnd.nextInt(5000).toLong
      (key, i.toLong, rnd.nextInt(100000))
    }.toDF("k", "id", "v")
    val viaNode = TopKPerKey(big, Seq("k"), Seq("v" -> true, "id" -> false),
        k = 3, spillKeyLimit = 64)
      .select($"k", $"id").as[(Long, Long)].collect().toSet
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"id".asc)
    val viaWindow = big.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"k", $"id").as[(Long, Long)].collect().toSet
    assert(viaNode == viaWindow)
    assert(viaNode.size > 5000) // most keys contribute fewer than k rows
  }

  test("fallback triggers exactly at the key limit, heap path below it") {
    val small = (1 to 300).map(i => (i.toLong % 30, i.toLong, i * 7 % 97))
      .toDF("k", "id", "v")
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"id".asc)
    val want = small.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2).select($"k", $"id").as[(Long, Long)].collect().toSet
    for (limit <- Seq(1, 29, 30, 1000)) {
      val got = TopKPerKey(small, Seq("k"), Seq("v" -> true, "id" -> false),
          k = 2, spillKeyLimit = limit)
        .select($"k", $"id").as[(Long, Long)].collect().toSet
      assert(got == want, s"spillKeyLimit=$limit")
    }
  }

  test("physical plan uses the custom exec with a hash exchange, no sort") {
    val plan = TopKPerKey(data, Seq("k"), Seq("v" -> true, "id" -> false), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))       // nodeName strips "Exec"
    assert(plan.contains("Exchange hashpartitioning"))
    assert(!plan.contains("Window") && !plan.contains("Sort "))
  }
}
