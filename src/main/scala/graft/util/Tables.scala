package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._

/** Uniform access to the driver-provided parquet tables
  * (`/root/testdata/sfN/<name>.parquet`, see TESTDATA.md) plus the few
  * column helpers shared by every oracle-checked query.
  *
  * Scale notes: all loaders are plain `spark.read.parquet` — Catalyst
  * handles predicate pushdown / column pruning, and on a real cluster the
  * same paths would be directories of many files, so nothing here assumes
  * single-file inputs.
  */
object Tables {
  /** Plan cache keyed by (session, path): `spark.read.parquet` builds a
    * fresh InMemoryFileIndex + reads footers for schema on every call —
    * pure driver overhead when 50 queries each re-open the same tables.
    * Reusing the analyzed relation is what a catalog does; the physical
    * plan of each query is still built per query.
    */
  private val planCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    planCache.getOrElseUpdate((spark, s"$sfDir/$name.parquet"),
      spark.read.parquet(s"$sfDir/$name.parquet"))

  def region(s: SparkSession, d: String)    = table(s, d, "region")
  def nation(s: SparkSession, d: String)    = table(s, d, "nation")
  def customer(s: SparkSession, d: String)  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = table(s, d, "supplier")
  def part(s: SparkSession, d: String)      = table(s, d, "part")
  def orders(s: SparkSession, d: String)    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String)  = table(s, d, "lineitem")
  /** `events.ts` has shipped in two parquet encodings across testdata
    * generations, so normalize by the type the reader actually produced:
    *  - TIMESTAMP(NANOS): Spark's reader rejects it
    *    ([PARQUET_TYPE_ILLEGAL]) unless read as raw Long nanos
    *    (`spark.sql.legacy.parquet.nanosAsLong`), then truncated to micros
    *    with integral division (`div`, not `/` — double division would
    *    lose precision at 1.7e18 ns). DuckDB truncates ns→µs on read the
    *    same way, so `epoch(ts)` agrees bit-for-bit between engines.
    *  - TIMESTAMP(MICROS) without UTC adjustment: Spark reads
    *    TIMESTAMP_NTZ; cast to session-local TIMESTAMP (session tz is
    *    pinned UTC, so the cast is identity on the stored micros and
    *    downstream epoch math is unchanged).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    planCache.getOrElseUpdate((s, s"$d/events.parquet#decoded"), {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = table(s, d, "events")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
      }
    })
  }
  def documents(s: SparkSession, d: String) = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = table(s, d, "embeddings")

  /** Ensure at least the session's default parallelism for expensive
    * per-row compute (hashing, decoding). No-op when the scan already
    * yields enough splits — the normal case at scale, where inputs are
    * thousands of files; for few-file local inputs this one narrow
    * round-robin shuffle unlocks all cores before the heavy map work.
    */
  def parallelize(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Decide from the driver-side file listing, NOT df.rdd.getNumPartitions:
    // the .rdd probe forces physical planning + RDD conversion of the whole
    // plan on every call. Many input files already split into enough scan
    // partitions (the normal case at scale); for few-file local inputs one
    // narrow round-robin shuffle unlocks all cores before heavy map work.
    if (df.inputFiles.length >= math.max(2, target / 2)) df
    else df.repartition(target)
  }

  /** Round a double column to `p` places via floor(x*10^p + 0.5)/10^p.
    * Used (identically formulated in the oracle SQL) so Spark-vs-DuckDB
    * float aggregation-order differences can't flip the hash compare.
    * floor on an identical double is bit-deterministic in both engines,
    * unlike round(), whose half-way tie-breaking differs (Spark rounds the
    * DECIMAL string repr HALF_UP, DuckDB rounds the binary double).
    */
  def r(c: Column, p: Int = 4): Column = {
    val m = math.pow(10, p)
    floor(c * m + 0.5).cast("double") / m
  }

  /** Exact money aggregation: integerize cents per row, sum as BIGINT.
    * Long sums are exact (no float associativity), so Spark and DuckDB
    * agree bit-for-bit at any scale factor.
    */
  def cents(c: Column): Column = floor(c * 100 + 0.5).cast("long")

  /** Epoch seconds (with fractional part) of a timestamp column — matches
    * DuckDB `epoch(ts)`. Spark's cast timestamp→double is epoch seconds
    * with microsecond fraction.
    */
  def epochS(c: Column): Column = c.cast("double")

  /** Tumbling-window start epoch: floor(epoch/width)*width as bigint.
    * Identical formulation in DuckDB
    * (`cast(floor(epoch(ts)/w)*w as bigint)`), so the window assignment is
    * engine-independent — unlike `window()` structs whose output shape
    * DuckDB can't reproduce.
    */
  def winBucket(ts: Column, widthSec: Int): Column =
    (floor(epochS(ts) / widthSec) * widthSec).cast("long")
}
