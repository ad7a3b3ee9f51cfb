package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P4/P5 — TTL retention.
  *
  * Reference: on every flush, delete short-term rows older than
  * `st_length` seconds (database_peak_streaming.py:65-69), then align the
  * companion `st_peak` table by deleting ids below the min surviving id.
  *
  * Batch-expressible forms (oracle-checked): the surviving set at a given
  * "now". The storage-side production form is a date-partitioned sink
  * where TTL = partition drop (metadata-only at 100 TB, never a row scan).
  */
object Retention {

  /** Rows surviving a TTL of `ttlSec` relative to the dataset's own max
    * timestamp (deterministic "now" so the oracle agrees).
    */
  def surviving(df: DataFrame, ts: Column, ttlSec: Long): DataFrame = {
    val cutoff = df.agg(max(ts.cast("double")).as("mx"))
      .select((col("mx") - ttlSec).as("cutoff"))
    df.join(broadcast(cutoff)).where(ts.cast("double") >= col("cutoff"))
      .drop("cutoff")
  }

  /** P5 key-range alignment: rows of `other` whose key precedes the min
    * surviving key (the reference's second DELETE,
    * database_peak_streaming.py:68-69).
    */
  def expiredByKeyAlignment(other: DataFrame, otherKey: Column,
                            survivors: DataFrame, survivorKey: Column): DataFrame = {
    val minKey = survivors.agg(min(survivorKey).as("mn"))
    other.join(broadcast(minKey)).where(otherKey < col("mn")).drop("mn")
  }
}
