package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** A1 — the reference's core operator: per-window element-wise mean of the
  * peak vectors (ref: database_peak_streaming.py:38-45 — transpose the
  * window's list of vectors, numpy.mean per peak position).
  *
  * Two formulations, cross-checked in tests:
  *  1. [[VecMean]] — a typed `Aggregator` doing element-wise sum + count.
  *     One pass, map-side partial aggregation (sum/count buffers merge
  *     associatively), no explode: at scale this shuffles ONE row per
  *     (window, group) instead of `num_peaks` rows.
  *  2. [[posexplodeMean]] — pure built-ins (`posexplode` → `avg` →
  *     re-collect). Used as the oracle-shaped cross-check; costs a
  *     `num_peaks`× row blow-up before the shuffle.
  */
object WindowMean {

  /** Element-wise mean over Array columns. Buffer = (running sums, n).
    * Associative + commutative merge ⇒ Spark runs it as partial+final
    * HashAggregate with map-side combine.
    */
  object VecMean extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {
    def zero: (Array[Double], Long) = (Array.empty[Double], 0L)
    def reduce(b: (Array[Double], Long), a: Seq[Double]): (Array[Double], Long) = {
      if (a == null) b
      else if (b._2 == 0L) (a.toArray, 1L)
      else {
        val s = b._1
        var i = 0
        while (i < s.length && i < a.length) { s(i) += a(i); i += 1 }
        (s, b._2 + 1)
      }
    }
    def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
      if (x._2 == 0L) y
      else if (y._2 == 0L) x
      else {
        val s = x._1
        var i = 0
        while (i < s.length && i < y._1.length) { s(i) += y._1(i); i += 1 }
        (s, x._2 + y._2)
      }
    }
    def finish(b: (Array[Double], Long)): Seq[Double] =
      if (b._2 == 0L) Seq.empty else b._1.toSeq.map(_ / b._2)
    // ExpressionEncoder → Tungsten-native buffer (no Java serialization in
    // the shuffle hot path).
    def bufferEncoder: Encoder[(Array[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Column form: `vec_mean(arrayCol)` — the native
    * [[graft.functions.VecMeanExpr]] (no per-row encoder round trip);
    * [[vecMeanTyped]] is the Aggregator form, kept as the semantic
    * cross-check (LawsSpec asserts bit-identical results).
    */
  def vecMean(c: Column): Column = graft.functions.VecMeanExpr.vecMean(c)

  /** Typed-Aggregator formulation of the same aggregate. */
  def vecMeanTyped(c: Column): Column = udaf(VecMean).apply(c)

  /** Built-in-only formulation: explode by position, avg per (keys, pos),
    * re-assemble the vector ordered by position.
    */
  def posexplodeMean(df: DataFrame, keys: Seq[Column], arr: Column): DataFrame = {
    val keyed = df.select(keys :+ posexplode(arr).as(Seq("pos", "v")): _*)
    val keyNames = keyed.columns.dropRight(2)
    keyed
      .groupBy(keyNames.map(col) :+ col("pos"): _*)
      .agg(avg(col("v")).as("mean_v"))
      .groupBy(keyNames.map(col): _*)
      .agg(array_sort(collect_list(struct(col("pos"), col("mean_v"))))
        .as("pairs"))
      .withColumn("mean_peaks", transform(col("pairs"), p => p("mean_v")))
      .drop("pairs")
  }
}
