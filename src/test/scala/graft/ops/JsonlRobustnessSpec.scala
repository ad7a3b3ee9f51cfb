package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Malformed-line handling on the JSONL ingest path: a real corpus
  * shipment always contains some broken lines (truncated uploads,
  * encoding damage), and the ingest contract is "keep every good row,
  * count and quarantine the bad ones" — never fail the job, never
  * silently drop.
  */
class JsonlRobustnessSpec extends SparkSpec {

  test("corrupt JSONL lines are quarantined, good rows survive intact") {
    val dir = Files.createTempDirectory("graft_jsonl_bad")
    val lines = Seq(
      """{"doc_id": 1, "text": "good row one"}""",
      """{"doc_id": 2, "text": "good row two"}""",
      """{"doc_id": 3, "text": "truncated""",           // cut mid-string
      """not json at all""",
      """{"doc_id": "not_a_number", "text": "bad type"}""",
      """{"doc_id": 4, "text": "good row three"}""")
    Files.write(Paths.get(dir.toString, "part-0.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))

    // PERMISSIVE (the default) + explicit corrupt-record column: the
    // schema is explicit like Export.fromJsonl at scale
    val df = spark.read
      .schema("doc_id BIGINT, text STRING, _bad STRING")
      .option("columnNameOfCorruptRecord", "_bad")
      .json(dir.toString)
      .cache()
    val good = df.filter(col("_bad").isNull)
    val bad = df.filter(col("_bad").isNotNull)
    assert(good.count() == 3)
    assert(good.select(sum(col("doc_id"))).head().getLong(0) == 7L)
    assert(good.filter(col("text") === "good row two").count() == 1)
    // 3 quarantined: truncated JSON, non-JSON, and the type mismatch
    assert(bad.count() == 3)
    // the quarantine column preserves the raw line for reprocessing
    assert(bad.filter(col("_bad") === "not json at all").count() == 1)

    // FAILFAST is the validation mode: the same input must throw
    val thrown = intercept[Exception] {
      spark.read
        .schema("doc_id BIGINT, text STRING")
        .option("mode", "FAILFAST")
        .json(dir.toString)
        .collect()
    }
    assert(thrown != null)
  }
}
