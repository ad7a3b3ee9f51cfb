package graft.pipeline

import java.util.Locale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EP2 figure output — the reference's batch-analysis plot
  * (`analyze_data.py:66-82`: a stacked subplot per port, one line per
  * peak in the port, x = timestamp, y = peak value), rendered as a
  * dependency-free SVG.
  *
  * Figure rendering is a client-boundary operation by nature: the
  * reference pulls the whole long-term table into matplotlib, and the
  * input here is the SAME bounded artifact (the strided long-term
  * series, not the raw stream), so a driver-side collect is the honest
  * shape — guarded by `maxPoints` so an accidental corpus-scale input
  * fails loudly instead of OOMing the driver.
  */
object Figure {

  /** Per-(port, line) time series — [[Analyze.perPortSeries]] exploded
    * one level further, so every plotted polyline has an identity:
    * (seq, ts_epoch, port_no, line_no, value). `line_no` is 1-based
    * within the port, matching the reference's per-port column ranges
    * (analyze_data.py:68-82).
    */
  def portLineSeries(lt: DataFrame): DataFrame =
    lt.select(col("seq"), col("ts_epoch"),
        posexplode(graft.ops.ChannelSlice.channelSlices(
          col("mean_peaks"), col("port_counts"))).as(Seq("p", "port_peaks")))
      .select(col("seq"), col("ts_epoch"), (col("p") + 1).as("port_no"),
        posexplode(col("port_peaks")).as(Seq("l", "value")))
      .select(col("seq"), col("ts_epoch"), col("port_no"),
        (col("l") + 1).as("line_no"), col("value"))

  private def fmt(v: Double): String =
    String.format(Locale.ROOT, "%.2f", Double.box(v))

  /** Render the series for `ports` (default: ports 1 and 2, the
    * reference's two subplots) to an SVG string. One `<g>` per port in
    * the given order, one `<polyline>` per line, points in time order.
    */
  def render(series: DataFrame, ports: Seq[Int] = Seq(1, 2),
             width: Int = 800, heightPerPort: Int = 240,
             maxPoints: Long = 1000000L): String = {
    val rows = series
      .filter(col("port_no").isin(ports.map(Integer.valueOf): _*))
      .orderBy(col("port_no"), col("line_no"), col("ts_epoch"), col("seq"))
      .select(col("ts_epoch").cast("double"), col("port_no").cast("int"),
        col("line_no").cast("int"), col("value").cast("double"))
      .limit((maxPoints + 1).min(Int.MaxValue).toInt)
      .collect()
    require(rows.length <= maxPoints,
      s"figure input exceeds $maxPoints points — figures render the " +
        "bounded long-term series, not raw data; downsample first")
    val pad = 40.0
    val xs = rows.map(_.getDouble(0))
    val (x0, x1) =
      if (xs.isEmpty) (0.0, 1.0) else (xs.min, math.max(xs.max, xs.min + 1e-9))
    def sx(t: Double): Double = pad + (t - x0) / (x1 - x0) * (width - 2 * pad)
    val sb = new StringBuilder
    val totalH = heightPerPort * ports.size
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$totalH" viewBox="0 0 $width $totalH">\n"""
    ports.zipWithIndex.foreach { case (port, idx) =>
      val top = idx * heightPerPort
      val prt = rows.filter(_.getInt(1) == port)
      val ys = prt.map(_.getDouble(3))
      val (y0, y1) =
        if (ys.isEmpty) (0.0, 1.0)
        else (ys.min, math.max(ys.max, ys.min + 1e-9))
      def sy(v: Double): Double =
        top + heightPerPort - pad -
          (v - y0) / (y1 - y0) * (heightPerPort - 2 * pad)
      sb ++= s"""  <g class="port" data-port="$port">\n"""
      sb ++= s"""    <rect x="${fmt(pad)}" y="${fmt(top + pad)}" width="${fmt(width - 2 * pad)}" height="${fmt(heightPerPort - 2 * pad)}" fill="none" stroke="black"/>\n"""
      prt.groupBy(_.getInt(2)).toSeq.sortBy(_._1).foreach {
        case (line, pts) =>
          val d = pts.map(r => s"${fmt(sx(r.getDouble(0)))},${fmt(sy(r.getDouble(3)))}")
            .mkString(" ")
          sb ++= s"""    <polyline data-line="$line" fill="none" stroke="hsl(${(line * 67) % 360},60%,40%)" points="$d"/>\n"""
      }
      sb ++= "  </g>\n"
    }
    sb ++= "</svg>\n"
    sb.toString
  }

  /** Render the long-term table's per-port figure to `path` — the
    * `plt.show()` of analyze_data.py:91 as a landed artifact.
    */
  def writeFigure(lt: DataFrame, path: String,
                  ports: Seq[Int] = Seq(1, 2)): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      render(portLineSeries(lt), ports)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
