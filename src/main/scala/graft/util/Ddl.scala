package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S10 — SQL DDL bootstrap, mirroring the reference's generated
  * `CREATE TABLE IF NOT EXISTS` statements
  * (database_peak_streaming.py:74-101: `st_data`/`lt_data` carry
  * id + timestamp + portN smallint columns, `st_peak`/`lt_peak` carry
  * id + peakN float columns, column lists string-generated from the
  * port/peak counts; sqlite_master is then enumerated).
  *
  * Spark form: the same generated DDL through `spark.sql(...)` as
  * catalog-registered parquet tables (`USING parquet`), enumerated via
  * the session catalog, written/read with SQL INSERT/SELECT. At scale
  * these would be `LOCATION`-ed at reliable storage and partitioned by
  * ingest date — the DDL shape is identical.
  */
object Ddl {
  val Tables = Seq("st_data", "lt_data", "st_peak", "lt_peak")

  private def portCols(numPorts: Int): String =
    (1 to numPorts).map(i => s"port$i INT").mkString(", ")

  private def peakCols(numPeaks: Int): String =
    (1 to numPeaks).map(i => s"peak$i DOUBLE").mkString(", ")

  /** The four generated CREATE TABLE statements (ref order:
    * database_peak_streaming.py:77-81). `location` roots the parquet
    * dirs (external tables) so repeated bootstraps are idempotent and
    * relocatable.
    */
  def createTablesSql(numPorts: Int, numPeaks: Int,
                      location: String): Seq[String] = Seq(
    s"""CREATE TABLE IF NOT EXISTS st_data
       | (id BIGINT, timestamp DOUBLE, ${portCols(numPorts)})
       | USING parquet LOCATION '$location/st_data'""".stripMargin,
    s"""CREATE TABLE IF NOT EXISTS lt_data
       | (id BIGINT, timestamp DOUBLE, ${portCols(numPorts)})
       | USING parquet LOCATION '$location/lt_data'""".stripMargin,
    s"""CREATE TABLE IF NOT EXISTS st_peak
       | (id BIGINT, ${peakCols(numPeaks)})
       | USING parquet LOCATION '$location/st_peak'""".stripMargin,
    s"""CREATE TABLE IF NOT EXISTS lt_peak
       | (id BIGINT, ${peakCols(numPeaks)})
       | USING parquet LOCATION '$location/lt_peak'""".stripMargin)

  /** Execute the generated DDL (idempotent — IF NOT EXISTS). */
  def bootstrap(spark: SparkSession, numPorts: Int, numPeaks: Int,
                location: String): Unit =
    createTablesSql(numPorts, numPeaks, location).foreach(spark.sql(_))

  /** Catalog enumeration of the bootstrapped tables with their column
    * counts — the Spark form of `select name from sqlite_master`.
    */
  def catalogTables(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val rows = Tables.map(t =>
      (t, spark.catalog.listColumns(t).count()))
    spark.createDataFrame(rows)
      .toDF("table_name", "n_cols")
      .orderBy(col("table_name"))
  }
}
