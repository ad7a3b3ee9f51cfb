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

  test("registered SQL text kernels evaluate the native expressions") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_lang_id('the cat and the hat') AS lang, " +
        "graft_rolling_fp('abc') AS fp, " +
        "graft_bpe_count('a!!b') AS bpe, " +
        "graft_stopword_count('the cat of x') AS stop").head()
    assert(r.getString(0) == "en")
    assert(r.getLong(1) ==
      "abc".foldLeft(0L)((h, ch) => (h * 31 + ch) % 1000000007L))
    assert(r.getInt(2) == 4) // a, !, !, b (each non-alnum char is a token)
    assert(r.getInt(3) == 2) // the, of
  }

  test("graft_vec_mean SQL aggregate equals the Column-form aggregate") {
    GraftFunctions.register(spark)
    Seq((1L, Seq(1.0, 2.0)), (1L, Seq(3.0, 4.0)), (2L, Seq(5.0, 6.0)))
      .toDF("k", "v").createOrReplaceTempView("vm_in")
    val out = spark.sql(
      "SELECT k, graft_vec_mean(v) AS m FROM vm_in GROUP BY k")
      .as[(Long, Seq[Double])].collect().toMap
    assert(out(1L) == Seq(2.0, 3.0) && out(2L) == Seq(5.0, 6.0))
  }

  test("graft_kmv SQL aggregate: deterministic bottom-k distinct") {
    GraftFunctions.register(spark)
    Seq(10L, 10L, 7L, 42L, 3L, 7L).toDF("h").createOrReplaceTempView("kmv_in")
    val mins = spark.sql("SELECT graft_kmv(h, 3) AS m FROM kmv_in")
      .as[Seq[Long]].head()
    assert(mins == Seq(3L, 7L, 10L))
  }

  test("graft_vec_sum_long SQL aggregate and graft_bootstrap_weights " +
      "evaluate the native expressions") {
    GraftFunctions.register(spark)
    Seq(Seq(1L, 2L), Seq(10L, 20L), Seq(100L, 200L))
      .toDF("w").createOrReplaceTempView("vsl_in")
    val sums = spark.sql("SELECT graft_vec_sum_long(w) AS s FROM vsl_in")
      .as[Seq[Long]].head()
    assert(sums == Seq(111L, 222L))
    // the SQL form produces the same draws as the Column-form kernel
    val viaSql = spark.sql(
      "SELECT graft_bootstrap_weights(42L, 2) AS w")
      .as[Seq[Long]].head()
    val viaCol = Seq(42L).toDF("doc_id")
      .select(graft.functions.BootstrapWeightsExpr.bootstrapWeights(
        org.apache.spark.sql.functions.col("doc_id"), 2,
        graft.queries.PipelineQueries.poissonCuts).as("w"))
      .as[Seq[Long]].head()
    assert(viaSql.length == 8 && viaSql == viaCol)
    assert(viaSql.forall(w => w >= 0L && w <= 9L))
    val e = intercept[IllegalArgumentException] {
      spark.sql("SELECT graft_bootstrap_weights(42L, id) " +
        "FROM range(1)").collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }

  test("graft_hash_sample SQL aggregate: bottom-k-by-hash values " +
      "sorted ascending") {
    GraftFunctions.register(spark)
    Seq((10L, 100L), (10L, 100L), (7L, 900L), (42L, 5L), (3L, 200L))
      .toDF("h", "v").createOrReplaceTempView("hs_in")
    val vs = spark.sql("SELECT graft_hash_sample(h, v, 3) AS s FROM hs_in")
      .as[Seq[Long]].head()
    // pairs (3,200) (7,900) (10,100) survive; values sorted ascending
    assert(vs == Seq(100L, 200L, 900L))
  }

  test("graft_cms SQL aggregate: counter grid over a token stream") {
    GraftFunctions.register(spark)
    Seq("a", "a", "b").toDF("t").createOrReplaceTempView("cms_in")
    val grid = spark.sql("SELECT graft_cms(t, 2, 8) AS g FROM cms_in")
      .as[Seq[Long]].head()
    assert(grid.size == 16)
    assert(grid.slice(0, 8).sum == 3 && grid.slice(8, 16).sum == 3)
  }

  test("graft_cdc_chunks SQL function: tiles the input, plan-time params") {
    GraftFunctions.register(spark)
    val ch = spark.sql(
      "SELECT graft_cdc_chunks('the quick brown fox jumps over the " +
        "lazy dog and keeps on running', 8, 131, 32) AS c")
      .selectExpr("transform(c, x -> x.chunk) AS parts",
        "transform(c, x -> x.start) AS starts")
      .as[(Seq[String], Seq[Int])].head()
    assert(ch._1.mkString == "the quick brown fox jumps over the lazy " +
      "dog and keeps on running")
    assert(ch._2.head == 0 &&
      ch._2 == ch._1.map(_.length).scanLeft(0)(_ + _).dropRight(1))
  }

  test("graft_cdc_chunks rejects wrong arity / non-literal params " +
      "with the usage message") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_cdc_chunks('abc', 8, 131)").collect()
    }
    assert(e.getMessage.contains("graft_cdc_chunks(text, window, base, " +
      "modulus)"), e.getMessage)
  }

  test("extensions class injects the same function descriptions") {
    // the extensions path is exercised structurally (a fresh session per
    // suite would need its own SparkContext); descriptions must be
    // complete and distinct
    val names = GraftFunctions.descriptions.map(_._1.funcName)
    assert(names == Seq("graft_dot", "graft_cosine", "graft_norm",
      "graft_lang_id", "graft_rolling_fp", "graft_bpe_count",
      "graft_stopword_count", "graft_vec_mean", "graft_kmv",
      "graft_cms", "graft_jaro_winkler", "graft_cdc_chunks",
      "graft_hash_sample", "graft_vec_sum_long",
      "graft_bootstrap_weights"))
    assert(names.distinct.size == names.size)
    val ext = new GraftExtensions
    val se = new org.apache.spark.sql.SparkSessionExtensions
    ext(se)   // must not throw; injection is validated on session build
  }
}
