package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shuffle-management utilities for the 100 TB regime: bucketed
  * co-located joins (eliminate the per-query exchange entirely) and
  * key salting (split a hot key across tasks when AQE's skew handling
  * isn't available — e.g. inside a custom operator or a stream).
  */
object Shuffle {

  /** Write `df` as a bucketed+sorted managed table: any number of
    * subsequent equi-joins/aggregations on `bucketCols` read it with NO
    * exchange and NO sort — the one-time shuffle at write amortizes
    * across every downstream query, the standard layout for a 100 TB
    * fact table keyed by join column.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Salted equi-join for a skewed build side: the left (large, skewed)
    * side scatters each key across `saltFactor` sub-keys by a
    * deterministic row hash; the right (smaller) side replicates each
    * row `saltFactor` times so every sub-key finds its match. Results
    * are identical to the plain join (law-checked in ShuffleSpec); the
    * hot key's rows land on `saltFactor` tasks instead of one.
    *
    * Deterministic salt (hash of the whole left row, not rand()) keeps
    * retries/speculative tasks consistent — nondeterministic salting
    * breaks exactly-once sinks on task retry.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    // collision-free internal column: silently overwriting a caller's
    // '__salt' via withColumn would corrupt the join result
    var saltCol = "__salt"
    while (left.columns.contains(saltCol) || right.columns.contains(saltCol))
      saltCol += "_"
    val salted = left.withColumn(saltCol,
      pmod(hash(left.columns.map(col): _*), lit(saltFactor)))
    val replicated = right.withColumn(saltCol,
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, saltCol)).drop(saltCol)
  }
}
