package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A3 — stride downsampling: every `inc`-th row copied to long-term
  * storage (ref: database_peak_streaming.py:52-56, `st_data[::lt_increment]`).
  *
  * The reference's stride restarts at each flush batch; we reproduce that
  * with `row_number` partitioned by `batch_id`. With no batch column the
  * stride is global over the explicit ordering key.
  *
  * Scale note: a global `row_number` over one unpartitioned Window is a
  * single-task sort at 100 TB — so [[strided]] takes an optional partition
  * column (the flush batch / date) and production pipelines always supply
  * it; ordering keys are per-partition, matching the reference's
  * per-flush stride semantics exactly.
  */
object Downsample {
  def strided(df: DataFrame, orderKey: Column, inc: Int,
              partitionBy: Seq[Column] = Nil): DataFrame = {
    val w = (if (partitionBy.isEmpty) Window.partitionBy()
             else Window.partitionBy(partitionBy: _*)).orderBy(orderKey)
    df.withColumn("__rn", row_number().over(w))
      .filter((col("__rn") - 1) % inc === 0)
      .drop("__rn")
  }

  /** Cheaper equivalent when the ordering key is already a dense sequence
    * (frame/event ids): pure filter, no sort, no shuffle — the form to use
    * at scale.
    */
  def stridedByKey(df: DataFrame, denseKey: Column, inc: Int): DataFrame =
    df.filter(denseKey % inc === 0)
}
