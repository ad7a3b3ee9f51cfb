package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join (point-in-interval) — the second classic join Spark lacks
  * a native operator for.
  *
  * Naively, `p.x >= i.lo AND p.x < i.hi` plans as a broadcast-nested-
  * loop: O(|points|·|intervals|) compares. The scale formulation grids
  * the axis: every interval is exploded to the cells it overlaps
  * (≤ ceil(width/bucketWidth)+1, so ~2 when bucketWidth tracks the
  * median interval width), points hash-join on their single cell, and
  * the exact containment predicate filters. ONE equi-join shuffle keyed
  * by cell; no duplicates by construction (a point matches an interval
  * only through the point's own cell copy).
  */
object RangeJoin {
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    val p = points.withColumn("__pb",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val iv = intervals.withColumn("__ib",
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    p.join(iv, col("__pb") === col("__ib") &&
        col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__pb", "__ib")
  }
}
