package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** The PHYSICAL delete the reference performs on every flush
    * (`DELETE FROM st_data WHERE timestamp < now - st_length`,
    * database_peak_streaming.py:65-69), as its scale-correct storage
    * form: the sink is partitioned by a time-derived long column (epoch
    * hour/day, or the streaming sink's batch_id), and TTL enforcement
    * DELETES WHOLE EXPIRED PARTITION DIRECTORIES. Metadata-only — no
    * surviving file is opened, rewritten, or moved; at 100 TB this is a
    * handful of namenode calls where a row-level delete would rewrite
    * the table.
    *
    * Granularity contract: a partition is dropped iff its value is
    * strictly below `minSurvivingValue`, so retention rounds DOWN to
    * the partition boundary (the boundary partition survives whole —
    * rows inside it age out when the partition ages past the cutoff).
    * With `ttlSec` a multiple of the partition width this is exactly
    * [[surviving]]'s row-filter semantics.
    *
    * @return the dropped partition values (ascending)
    */
  def dropExpired(spark: SparkSession, path: String, partitionCol: String,
                  minSurvivingValue: Long): Seq[Long] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    val prefix = partitionCol + "="
    val dropped = fs.listStatus(p)
      .filter(d => d.isDirectory && d.getPath.getName.startsWith(prefix))
      .flatMap { d =>
        val v = d.getPath.getName.stripPrefix(prefix)
        try Some((d.getPath, v.toLong))
        catch { case _: NumberFormatException => None }
      }
      .filter(_._2 < minSurvivingValue)
      .sortBy(_._2)
    dropped.foreach { case (dir, _) => fs.delete(dir, true) }
    dropped.map(_._2).toSeq
  }
}
