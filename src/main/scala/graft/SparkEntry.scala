package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{ReferenceQueries, RelationalQueries, PipelineQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query surface = three suites:
  *  - [[graft.queries.ReferenceQueries]] — the reference's own operator
  *    inventory (SURVEY.md §2: windowed vector means, stride downsample,
  *    TTL, channel slicing, calibration, physics).
  *  - [[graft.queries.RelationalQueries]] — the standard relational
  *    surface (joins, aggregates, windows, set ops, rollup, JSON).
  *  - [[graft.queries.PipelineQueries]] — training-data-pipeline ops
  *    (dedup, similarity search, text analysis, multimodal).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core operator: per-window element-wise mean of the
    * peak vectors (SURVEY.md §2.4 A1).
    */
  def entry(spark: SparkSession): DataFrame =
    ReferenceQueries.defs("q_window_mean")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.defs ++ RelationalQueries.defs ++ PipelineQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (q_ann_lsh, q_media_decode, q_media_frames → rows-only check).
    */
  def oracleSql: Map[String, String] =
    ReferenceQueries.oracle ++ RelationalQueries.oracle ++ PipelineQueries.oracle
}
