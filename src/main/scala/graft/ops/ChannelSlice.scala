package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** S4/A5/P3 — per-channel slicing of the flat peak vector.
  *
  * The reference computes `np.cumsum(peak_counts)` and slices the float64
  * data vector at those boundaries (ref: hyperion.py:440-453); the batch
  * analyzer re-derives per-port column ranges from the first row's port
  * counts (ref: analyze_data.py:66-82). Here both are higher-order array
  * expressions — fully codegen'd, no UDF, no shuffle.
  */
object ChannelSlice {

  /** Exclusive-prefix-sum of an int array: boundaries(i) = sum(counts[0..i)).
    * A5 (ref: hyperion.py:442) as `aggregate` building the running sum.
    */
  def sliceBoundaries(counts: Column): Column =
    aggregate(
      counts,
      struct(lit(0).as("acc"), array().cast("array<int>").as("out")),
      (st, c) => struct(
        (st("acc") + c).as("acc"),
        concat(st("out"), array(st("acc"))).as("out")),
      st => st("out"))

  /** Split a flat peaks vector into per-channel sub-arrays:
    * result(ch) = peaks[boundary(ch) ..+ counts(ch)]
    * (`slice` is 1-based, hence the +1.)
    */
  def channelSlices(peaks: Column, counts: Column): Column = {
    val bounds = sliceBoundaries(counts)
    zip_with(bounds, counts, (b, c) => slice(peaks, b + 1, c))
  }

  /** Static-counts fast path of [[channelSlices]]: when the per-port
    * counts are known at plan time — exactly how the reference's batch
    * analyzer works (analyze_data.py:66-82 derives the column ranges ONCE
    * from the first row's counts) — the prefix sums fold at compile time
    * and the result is a plain `array(slice, slice, …)` of builtin
    * slices: fully codegen'd, no interpreted higher-order lambdas per
    * row. OpsSpec asserts static ≡ dynamic on the same inputs.
    */
  def channelSlicesStatic(peaks: Column, counts: Seq[Int]): Column = {
    val bounds = counts.scanLeft(0)(_ + _)
    array(counts.zipWithIndex.map { case (c, i) =>
      slice(peaks, bounds(i) + 1, c)
    }: _*)
  }

  /** 1-based channel access, ref: HACQPeaksData.__getitem__
    * (hyperion.py:455-460).
    */
  def channel(slices: Column, ch: Int): Column = element_at(slices, ch)

  /** A2 — sensors per port = length of each channel slice
    * (ref: database_peak_streaming.py:31-36).
    */
  def portCounts(counts: Column): Column = counts // counts ARE the sizes
}
