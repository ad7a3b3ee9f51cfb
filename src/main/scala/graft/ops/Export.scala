package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S13 — CSV export sink (ref: analyze_data.py:8-16, pandas `to_csv` of
  * the long-term tables).
  *
  * A thin, explicit wrapper over the DataFrame CSV writer so the export
  * surface is a named operator: header row on by default (the reference
  * writes one), overwrite semantics, optional coalesce for a
  * single-file export (the reference writes one file; at scale leave
  * `coalesce = 0` so every partition writes in parallel).
  */
object Export {
  def toCsv(df: DataFrame, path: String, header: Boolean = true,
            coalesce: Int = 0): Unit = {
    val out = if (coalesce > 0) df.coalesce(coalesce) else df
    out.write.mode("overwrite").option("header", header.toString).csv(path)
  }

  /** Schema-explicit CSV read-back (no inference job at scale). */
  def fromCsv(spark: SparkSession, path: String, ddl: String,
              header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).schema(ddl).csv(path)

  /** The reference's FULL export loop (analyze_data.py:8-16 iterates
    * every catalog table): each named table to its own CSV directory
    * under `dir`. The writes are INDEPENDENT jobs, so they are
    * submitted from a small driver thread pool (optimization guide
    * §2.6): Spark schedules concurrent jobs FIFO, and the next
    * export's tasks back-fill executors freed by the previous job's
    * straggler tail instead of leaving the cluster idle — measured
    * r14 on the 4-table export at sf0.1. Failures propagate: the
    * first failed write rethrows on its `get`.
    */
  def tablesToCsv(tables: Seq[(String, DataFrame)], dir: String,
                  header: Boolean = true): Unit =
    concurrently(tables.map { case (name, df) =>
      () => toCsv(df, s"$dir/$name", header)
    }: _*)

  /** Run independent Spark write jobs from a small driver thread pool
    * (optimization guide §2.6): concurrent jobs schedule FIFO and a
    * later job's tasks back-fill executors freed by the earlier job's
    * straggler tail. Blocks until all complete. On the first failure
    * (ADVICE r14): queued-but-unstarted writes are cancelled
    * (`shutdownNow`) so partial exports do not keep running behind the
    * caller's error handling, and the ORIGINAL exception rethrows (the
    * pre-pool behavior callers saw), not the ExecutionException
    * wrapper. Zero actions is a no-op (the pre-pool `foreach`
    * semantics; a 0-thread pool would throw).
    */
  def concurrently(actions: (() => Unit)*): Unit = {
    if (actions.isEmpty) return
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.min(actions.size, 4))
    try {
      actions.map { a =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = a()
        })
      }.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            pool.shutdownNow()
            throw Option(e.getCause).getOrElse(e)
        }
      }
    } finally pool.shutdown()
  }

  /** JSON-lines sink — the interchange format training-data pipelines
    * actually ship (one JSON object per line, splittable, append-able).
    */
  def toJsonl(df: DataFrame, path: String, coalesce: Int = 0): Unit = {
    val out = if (coalesce > 0) df.coalesce(coalesce) else df
    out.write.mode("overwrite").json(path)
  }

  /** Schema-explicit JSONL read-back (no inference job at scale). */
  def fromJsonl(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(ddl).json(path)
}
