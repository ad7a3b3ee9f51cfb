package graft.util

import java.nio.file.Files

import graft.SparkSpec

/** S10 — the generated CREATE TABLE IF NOT EXISTS DDL is real SQL
  * surface: idempotent bootstrap, catalog-visible tables with the
  * generated column lists, and INSERT/SELECT round-trips through the
  * created tables (the reference's add_data path,
  * database_peak_streaming.py:60-63).
  */
class DdlSpec extends SparkSpec {

  private lazy val loc =
    Files.createTempDirectory("graft_ddl_spec").toString

  test("bootstrap is idempotent and catalog-visible with generated columns") {
    Ddl.bootstrap(spark, numPorts = 8, numPeaks = 8, loc)
    Ddl.bootstrap(spark, numPorts = 8, numPeaks = 8, loc) // IF NOT EXISTS
    val tables = Ddl.catalogTables(spark).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tables == Map("st_data" -> 10L, "lt_data" -> 10L,
      "st_peak" -> 9L, "lt_peak" -> 9L))
    // generated column names match the reference's portN/peakN scheme
    val cols = spark.table("st_data").columns.toSeq
    assert(cols == Seq("id", "timestamp") ++ (1 to 8).map(i => s"port$i"))
    assert(spark.table("st_peak").columns.toSeq ==
      Seq("id") ++ (1 to 8).map(i => s"peak$i"))
  }

  test("INSERT INTO / SELECT round-trips through the DDL tables") {
    Ddl.bootstrap(spark, numPorts = 8, numPeaks = 8, loc)
    spark.sql("INSERT INTO st_peak VALUES " +
      "(1, 1500.1, 1600.2, 1700.3, 1800.4, 1900.5, 2000.6, 2100.7, 2200.8)")
    val row = spark.sql(
      "SELECT id, peak1, peak8 FROM st_peak WHERE id = 1").head()
    assert(row.getLong(0) == 1L)
    assert(row.getDouble(1) == 1500.1 && row.getDouble(2) == 2200.8)
    spark.sql("INSERT INTO st_data VALUES " +
      "(7, 1.7e9, 1, 1, 1, 1, 1, 1, 1, 1)")
    assert(spark.sql("SELECT count(*) FROM st_data WHERE id = 7")
      .head().getLong(0) == 1L)
  }
}
