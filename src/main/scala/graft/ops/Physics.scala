package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F6/F7 — the reference's (partly commented-out) sensor physics.
  *
  * Strain:      1e6 * ((wl - iwl) / iwl / gf)            (analyze_data.py:30-36)
  * Temperature: (wl - iwl) / (wl * gf * (k + alpha)) + itp (analyze_data.py:37-39)
  * Strain net of thermal: total_strain - temperature      (analyze_data.py:40-41)
  * Delay:       round(2 * distance * ior / c * 1e9) ns    (hyperion.py:1150-1153)
  *
  * `iwl` is the initial wavelength = first row's value (analyze_data.py:35)
  * — in Spark an explicit `first_value` window over the time order, since
  * nothing here may rely on storage order.
  */
object Physics {
  val SpeedOfLight = 299792458.0 // m/s, ref: hyperion.py:79

  def strain(wl: Column, iwl: Column, gaugeFactor: Double): Column =
    lit(1e6) * ((wl - iwl) / iwl / gaugeFactor)

  def temperature(wl: Column, iwl: Column, gf: Double, k: Double,
                  alpha: Double, itp: Column): Column =
    (wl - iwl) / (wl * gf * (k + alpha)) + itp

  def strainNetOfThermal(totalStrain: Column, temp: Column): Column =
    totalStrain - temp

  /** F6 — fiber delay in ns for a given distance and index of refraction.
    * floor(x + 0.5) instead of round(): identical for every non-tie value
    * but engine-deterministic at .5 boundaries (Spark rounds the decimal
    * repr HALF_UP, DuckDB rounds the binary double — see Tables.r).
    */
  def delayNs(distanceM: Column, ior: Column): Column =
    floor(lit(2.0) * distanceM * ior / SpeedOfLight * 1e9 + 0.5).cast("long")

  /** Scalar form of [[delayNs]] — used where the delay feeds a wire
    * payload built on the driver (the instrument's default peak-offset
    * table, [[graft.model.InstrumentConfig.defaultPeakOffsets]]), so the
    * command path and the query kernel share one formula.
    */
  def delayNsScalar(distanceM: Double, ior: Double): Long =
    math.floor(2.0 * distanceM * ior / SpeedOfLight * 1e9 + 0.5).toLong
}
