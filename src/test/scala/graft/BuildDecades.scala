package graft

import org.apache.spark.sql.SparkSession

/** One-command decade-corpus rebuild (r13 verdict item 1) — NOT part
  * of the shipped surface.
  *
  * Every decade gate in TRISCALE.md reads `/tmp/graft_sfx{1,10,100}`
  * (and `AnnTriScaleSpec` additionally `/tmp/graft_embx16`), which
  * evaporate between rounds; previously the rebuild was four manual
  * [[ScaleCorpus]]/[[RelScaleCorpus]] invocations whose argument
  * conventions lived only in session notes. This entry point
  * regenerates ALL of them idempotently in one JVM and prints the row
  * counts, so "re-gate at ×100" is a command, not a setup ritual:
  *
  * | dir | docs ×N | embeddings ×N | events/part ×N |
  * |---|---|---|---|
  * | graft_sfx1   (×10)   | 10   | 4  | 10   |
  * | graft_sfx10  (×100)  | 100  | 4  | 100  |
  * | graft_sfx100 (×1000) | 1000 | 64 | 1000 |
  * | graft_embx16         | 1    | 16 | —    |
  *
  * The embedding factors are deliberately NOT the doc factors: 8k
  * vectors (×4) is the DuckDB-oracle literal-envelope bound
  * (TRISCALE.md — srpBits 10 ≤ 12, ivfCells 125 ≤ 128), ×64 = 128k is
  * the ×1000 ANN row, and ×16 = 32k is the past-the-envelope dir the
  * ANN spec uses for derived-parameter-movement laws only.
  *
  * Idempotence is row-count keyed: a table group whose parquet files
  * already hold exactly srcRows×N rows is skipped (the generators are
  * deterministic, so matching counts ⇒ matching bytes); anything
  * missing or mismatched is rebuilt via the same `build` methods the
  * single-dir mains call. A full cold build of all four dirs is
  * dominated by the ×1000 events write (~100M rows, single-file
  * landing) — budget ~10-15 min; a warm re-run is seconds.
  *
  * Usage: Test/runMain graft.BuildDecades [srcSfDir] [tmpRoot]
  *   (defaults /root/testdata/sf0.1 and /tmp)
  */
object BuildDecades {
  private case class Spec(out: String, docN: Int, embN: Int,
                          relN: Option[Int])

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val root = args.lift(1).getOrElse("/tmp")
    val specs = Seq(
      Spec(s"$root/graft_sfx1", 10, 4, Some(10)),
      Spec(s"$root/graft_sfx10", 100, 4, Some(100)),
      Spec(s"$root/graft_sfx100", 1000, 64, Some(1000)),
      Spec(s"$root/graft_embx16", 1, 16, None))
    // local[8]/shuffle 8: the exact settings the single-dir mains have
    // always used, so a BuildDecades corpus is byte-identical to the
    // hand-built ones every prior TRISCALE row was gated on
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // parquet count() is footer-metadata only — cheap even at 100M rows
    def cnt(path: String): Option[Long] =
      if (new java.io.File(path).exists())
        try Some(spark.read.parquet(path).count())
        catch { case _: Throwable => None }
      else None

    val srcDocs = spark.read.parquet(s"$src/documents.parquet").count()
    val srcEmbs = spark.read.parquet(s"$src/embeddings.parquet").count()
    val srcEvents = spark.read.parquet(s"$src/events.parquet").count()
    val srcPart = spark.read.parquet(s"$src/part.parquet").count()

    specs.foreach { s =>
      val docsOk =
        cnt(s"${s.out}/documents.parquet").contains(srcDocs * s.docN) &&
        cnt(s"${s.out}/embeddings.parquet").contains(srcEmbs * s.embN)
      if (docsOk)
        println(s"[build-decades] ${s.out}: documents+embeddings " +
          "up to date, skipped")
      else ScaleCorpus.build(spark, src, s.out, s.docN, s.embN)
      s.relN.foreach { n =>
        val relOk =
          cnt(s"${s.out}/events.parquet").contains(srcEvents * n) &&
          cnt(s"${s.out}/part.parquet").contains(srcPart * n)
        if (relOk)
          println(s"[build-decades] ${s.out}: events+part up to date, " +
            "skipped")
        else RelScaleCorpus.build(spark, src, s.out, n)
      }
    }

    specs.foreach { s =>
      val tables = Seq("documents", "embeddings") ++
        (if (s.relN.isDefined) Seq("events", "part") else Nil)
      val counts = tables.map(t =>
        s"$t=${cnt(s"${s.out}/$t.parquet").getOrElse(-1L)}")
      println(s"[build-decades] ${s.out}: ${counts.mkString(" ")}")
    }
    spark.stop()
  }
}
