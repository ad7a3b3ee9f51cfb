package graft.ext

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions evaluate the native expressions") {
    GraftFunctions.register(spark)
    val (c, d, n) = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c, " +
        "graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "graft_norm(array(3.0d, 4.0d)) AS n")
      .as[(Double, Double, Double)].head()
    assert(c == 1.0 && d == 11.0 && n == 5.0)
  }

  test("extensions class injects the same function descriptions") {
    // the extensions path is exercised structurally (a fresh session per
    // suite would need its own SparkContext); descriptions must be
    // complete and distinct
    val names = GraftFunctions.descriptions.map(_._1.funcName)
    assert(names == Seq("graft_dot", "graft_cosine", "graft_norm"))
    val ext = new GraftExtensions
    val se = new org.apache.spark.sql.SparkSessionExtensions
    ext(se)   // must not throw; injection is validated on session build
  }
}
