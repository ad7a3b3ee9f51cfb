package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the single latest right row with
  * `right.ts <= left.ts` within the same key (the time-series join Spark
  * lacks natively; DuckDB/kdb call it ASOF JOIN).
  *
  * Formulated by composition (the brief's preference (a)): tag + union
  * both sides, one window sorted by (ts, side) per key, running
  * `last(_, ignoreNulls)` carries the most recent right values forward,
  * then keep only left rows. Cost = ONE shuffle + sort per key
  * partition — never the range-explosion of an inequality join, and no
  * global sort: the window is keyed, so at 100 TB each key's timeline
  * sorts independently (skewed keys → AQE/salting as with any keyed op).
  *
  * Tie semantics match DuckDB's ASOF (`l.ts >= r.ts`, inclusive): at
  * equal timestamps the right row sorts BEFORE the left row (side 0 < 1),
  * so a right row is visible to left rows at the same instant. Left rows
  * with no prior right row keep nulls (ASOF LEFT JOIN).
  */
object AsofJoin {

  /** @param left      left table
    * @param right     right table
    * @param keys      equality keys present in BOTH sides
    * @param ts        timestamp column name present in BOTH sides
    * @param rightCols right columns to carry (renamed as-is in output)
    */
  def asofLeft(left: DataFrame, right: DataFrame, keys: Seq[String],
               ts: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__side", lit(1))
      .withColumns(rightCols.map(c => c -> lit(null)).toMap)
    val r = right.select(
      (keys :+ ts).map(col) ++ rightCols.map(col) :+ lit(0).as("__side"): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightCols.foldLeft(u) { (df, c) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
      .filter(col("__side") === 1)
      .select((leftCols ++ rightCols).map(col): _*)
  }
}
