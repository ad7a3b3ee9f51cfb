package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** EP2 figure output: the SVG renderer plots EXACTLY the series the
  * analysis projections produce (analyze_data.py:66-91 parity) — the
  * renderer's input is [[Figure.portLineSeries]], which must agree with
  * [[Analyze.perPortSeries]] row for row on the shared columns.
  */
class FigureSpec extends SparkSpec {
  import spark.implicits._

  // a 3-window long-term table, port_counts [2,1]: port 1 carries two
  // lines, port 2 one — the reference's two-subplot shape
  private def lt = Seq(
    (1L, 10.0, Seq(100.0, 200.0, 300.0), Seq(2, 1)),
    (2L, 20.0, Seq(110.0, 210.0, 290.0), Seq(2, 1)),
    (3L, 30.0, Seq(120.0, 190.0, 310.0), Seq(2, 1)))
    .toDF("seq", "ts_epoch", "mean_peaks", "port_counts")

  test("portLineSeries explodes the per-port split with line identity") {
    val got = Figure.portLineSeries(lt)
      .as[(Long, Double, Int, Int, Double)].collect().sorted.toSeq
    assert(got == Seq(
      (1L, 10.0, 1, 1, 100.0), (1L, 10.0, 1, 2, 200.0),
      (1L, 10.0, 2, 1, 300.0),
      (2L, 20.0, 1, 1, 110.0), (2L, 20.0, 1, 2, 210.0),
      (2L, 20.0, 2, 1, 290.0),
      (3L, 30.0, 1, 1, 120.0), (3L, 30.0, 1, 2, 190.0),
      (3L, 30.0, 2, 1, 310.0)))
  }

  test("the series fed to the renderer equals perPortSeries output") {
    // perPortSeries summarizes the same split (count + first peak per
    // port); line 1 of each port must carry ITS first_peak values and
    // the per-port line count must equal ITS n_in_port
    val fig = Figure.portLineSeries(lt)
    val summary = Analyze.perPortSeries(lt)
    val j = summary.join(fig,
      Seq("seq", "ts_epoch", "port_no"))
    assert(j.filter(col("line_no") === 1 &&
      col("value") =!= col("first_peak")).count() == 0)
    assert(j.groupBy(col("seq"), col("port_no"), col("n_in_port"))
      .agg(max(col("line_no")).as("lines"))
      .filter(col("lines") =!= col("n_in_port")).count() == 0)
  }

  test("render: one subplot group per port, one polyline per line, " +
      "one point per window, extremes pinned to the plot box") {
    val svg = Figure.render(Figure.portLineSeries(lt))
    assert(svg.contains("data-port=\"1\"") && svg.contains("data-port=\"2\""))
    val polylines = "<polyline".r.findAllIn(svg).length
    assert(polylines == 3) // two lines in port 1, one in port 2
    val pointRuns = "points=\"([^\"]*)\"".r
      .findAllMatchIn(svg).map(_.group(1).split(" ").length).toSeq
    assert(pointRuns == Seq(3, 3, 3)) // 3 windows per line
    // linear mapping: port 2's single line spans 290..310, so its min
    // point sits on the bottom inner edge and its max on the top
    val port2 = svg.substring(svg.indexOf("data-port=\"2\""))
    val pts = "points=\"([^\"]*)\"".r.findFirstMatchIn(port2).get.group(1)
      .split(" ").map { p =>
        val Array(x, y) = p.split(","); (x.toDouble, y.toDouble)
      }
    // subplot 2 occupies y ∈ [240, 480], padding 40: inner box 280..440
    assert(pts.map(_._2).min == 280.0 && pts.map(_._2).max == 440.0)
    // x axis spans ts 10..30 over inner 40..760: midpoint at 400
    assert(pts.map(_._1).toSeq == Seq(40.0, 400.0, 760.0))
  }

  test("writeFigure lands the artifact; oversize input fails loudly") {
    val p = java.nio.file.Files.createTempFile("graft_fig", ".svg")
    Figure.writeFigure(lt, p.toString)
    val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    assert(s.startsWith("<svg") && s.contains("</svg>"))
    val e = intercept[IllegalArgumentException] {
      Figure.render(Figure.portLineSeries(lt), maxPoints = 2L)
    }
    assert(e.getMessage.contains("downsample"))
  }
}
