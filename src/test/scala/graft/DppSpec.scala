package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Dynamic partition pruning, demonstrated live: a fact table
  * partitioned on a join key, joined to a dim whose FILTER is only
  * known at runtime, must have its partition scan pruned by the
  * dim-side subquery — the mechanism that turns a 100 TB
  * star-schema scan into a read of the few partitions the dim
  * selects (q_partitioned_prune covers the PLANNING-time literal
  * prune; this is the runtime complement).
  */
class DppSpec extends SparkSpec {

  test("a dim filter prunes fact partitions at runtime (DPP), " +
      "result identical to the unpartitioned join") {
    val dir = Files.createTempDirectory("graft_dpp").toString
    import spark.implicits._
    val fact = (0L until 20000L)
      .map(i => (i, i % 20, i * 3))
      .toDF("id", "part_key", "v")
    fact.write.partitionBy("part_key").parquet(s"$dir/fact")
    // k as Int: the partition directory values read back as INT, and a
    // cast on the partition column would block the pruning filter.
    // The dim must be a SCANNED table: a local relation constant-folds
    // the filter away and DPP's selective-predicate check never sees it
    val dimRows = (0 until 20).map(k => (k, s"grp${k % 5}"))
    dimRows.toDF("k", "grp").write.parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
    val partedFact = spark.read.parquet(s"$dir/fact")
    val joined = partedFact
      .join(broadcast(dim.filter(col("grp") === "grp0")),
        col("part_key") === col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).cast("long").as("s"))
    val Array(row) = joined.collect()
    // exact expectation from the unpartitioned in-memory join
    val keep = dimRows.filter(_._2 == "grp0").map(_._1.toLong).toSet
    val kept = (0L until 20000L).filter(i => keep(i % 20))
    assert(row.getLong(0) == kept.size && row.getLong(1) == kept.map(_ * 3).sum,
      s"DPP changed the result: $row")
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"no dynamic-pruning filter reached the fact scan:\n$p")
  }
}
