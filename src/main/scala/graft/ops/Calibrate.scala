package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F4/F5/F8 — spectrum calibration surface.
  *
  * Reference: raw uint16 spectra are converted to dBm per channel via
  * `data_db = raw * (1/scale) + offset` (hyperion.py:533-540, cal vectors
  * parsed at hyperion.py:679-697); the wavelength axis is
  * `start + arange(n) * increment` (hyperion.py:527-531); active channels
  * come from a bitmap (hyperion.py:495-501).
  *
  * All pure higher-order array expressions — codegen'd, zero UDFs; the
  * per-channel cal constants ride along as a broadcast-joined dim table
  * (tiny) in pipelines.
  */
object Calibrate {

  /** dBm conversion of a single raw sample — the scalar kernel
    * (`raw * (1/scale) + offset`, hyperion.py:533-540). Element-wise
    * conversion is independent per sample, so pipelines that need one
    * sample (e.g. first-peak dBm) apply this AFTER `element_at` instead
    * of converting the whole vector through the interpreted `transform`
    * lambda: same double, pure codegen.
    */
  def toDbScalar(raw: Column, scale: Column, offset: Column): Column =
    raw.cast("double") * (lit(1.0) / scale) + offset

  /** dBm conversion of one channel's raw samples. */
  def toDb(raw: Column, scale: Column, offset: Column): Column =
    transform(raw, x => toDbScalar(x, scale, offset))

  /** F5 — wavelength axis: start + i*increment for i in [0, n). */
  def wavelengthAxis(start: Column, inc: Column, n: Column): Column =
    transform(sequence(lit(0), n - 1), i => start + i.cast("double") * inc)

  /** F8 — bitmap → list of active channel numbers (bit i set ⇒ channel i).
    * Ref loop: hyperion.py:495-501 over 16 possible channels.
    *
    * Unrolled as `concat(when(bit0, [0]), when(bit1, [1]), …)` rather
    * than `filter(sequence(…), λ)`: the channel count is a compile-time
    * constant (16) and array-`filter` lambdas evaluate interpreted —
    * this form is plain conditional/array/concat builtins, fully inside
    * whole-stage codegen at any scan width.
    */
  def activeChannels(bits: Column, maxChannels: Int = 16): Column = {
    val empty = array().cast("array<int>")
    concat((0 until maxChannels).map(i =>
      when(bits.cast("long").bitwiseAND(lit(1L << i)) =!= 0,
        array(lit(i))).otherwise(empty)): _*)
  }
}
