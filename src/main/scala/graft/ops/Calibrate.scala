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

  /** dBm conversion of one channel's raw samples. */
  def toDb(raw: Column, scale: Column, offset: Column): Column =
    transform(raw, x => x.cast("double") * (lit(1.0) / scale) + offset)

  /** F5 — wavelength axis: start + i*increment for i in [0, n). */
  def wavelengthAxis(start: Column, inc: Column, n: Column): Column =
    transform(sequence(lit(0), n - 1), i => start + i.cast("double") * inc)

  /** F8 — bitmap → list of active channel numbers (bit i set ⇒ channel i).
    * Ref loop: hyperion.py:495-501 over 16 possible channels.
    */
  def activeChannels(bits: Column, maxChannels: Int = 16): Column =
    filter(sequence(lit(0), lit(maxChannels - 1)),
      i => bits.cast("long")
        .bitwiseAND(pow(lit(2), i).cast("long")) =!= 0)
}
