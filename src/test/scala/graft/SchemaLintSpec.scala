package graft

import org.apache.spark.sql.types._

/** Output-type discipline, made a law.
  *
  * The round-10 `q_jl_project` failure mode: the suite's correctness gate
  * compares VALUES (DuckDB vs Spark), but the driver's hash is
  * REPRESENTATION-sensitive — a `decimal(38,0)` column hashed apart
  * between the Spark parquet read and the DuckDB result even though every
  * value was bit-identical. That class of failure is invisible to the
  * local comparator, so the only defense is a type law: every
  * `SparkEntry.queries` output schema must stay inside the proven-stable
  * set (integral, string, boolean, double-by-floor-round-recipe,
  * timestamp/date/binary, and arrays thereof). Decimal, float, map and
  * struct outputs are banned — if a future query needs a wide sum,
  * accumulate in decimal INTERNALLY and emit hi/lo BIGINTs (the
  * q_jl_project energy recipe).
  */
class SchemaLintSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def stableLeaf(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case StringType | BooleanType => true
    case DoubleType => true // legal only via Tables.r / rs floor-rounding
    case TimestampType | DateType | BinaryType => true
    case _ => false // DecimalType, FloatType, anything exotic
  }

  /** Unstable leaf types under a field, descending through arrays only —
    * map/struct containers are themselves offenders (no query emits them
    * today, and the driver hash's canonicalization of them is unproven).
    */
  private def unstable(dt: DataType): Seq[String] = dt match {
    case ArrayType(e, _) => unstable(e).map(t => s"array<$t>")
    case t if stableLeaf(t) => Nil
    case t => Seq(t.simpleString)
  }

  test("every query output schema stays inside the hash-stable type set " +
      "(no decimal/float/map/struct — the q_jl_project law)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, f) =>
        f(spark, d).schema.fields.toSeq.flatMap { fld =>
          unstable(fld.dataType).map(t => s"$name.${fld.name}: $t")
        }
    }
    assert(offenders.isEmpty,
      s"hash-unstable output columns:\n${offenders.mkString("\n")}")
  }
}
