package graft.ext

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.{BpeCountExpr, CdcChunksExpr, CmsSketchExpr, CosineSim, DotProduct, JaroWinklerExpr, KmvSketchExpr, LangIdExpr, NormL2, RollingFpExpr, TokenSetCount, VecMeanExpr}
import graft.text.TextAnalysis

/** SQL surface for the native expressions: `graft_dot`, `graft_cosine`,
  * `graft_norm`, `graft_lang_id`, `graft_rolling_fp`,
  * `graft_bpe_count`, `graft_stopword_count`, `graft_cdc_chunks`,
  * `graft_jaro_winkler`, `graft_bootstrap_weights`, and
  * the `graft_vec_mean`/`graft_kmv`/`graft_cms`/`graft_hash_sample`/
  * `graft_vec_sum_long` aggregates become callable from
  * `spark.sql(...)`.
  *
  * Two registration paths:
  *  - new sessions: `.config("spark.sql.extensions",
  *    "graft.ext.GraftExtensions")` (or `.withExtensions(new
  *    GraftExtensions)`) — the sanctioned plugin mechanism;
  *  - existing sessions: [[GraftFunctions.register]] (temp functions).
  */
object GraftFunctions {
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
      (c: Seq[Expression]) => DotProduct(c(0), c(1))),
    (FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getCanonicalName, "graft_cosine"),
      (c: Seq[Expression]) => CosineSim(c(0), c(1))),
    (FunctionIdentifier("graft_norm"),
      new ExpressionInfo(classOf[NormL2].getCanonicalName, "graft_norm"),
      (c: Seq[Expression]) => NormL2(c.head)),
    (FunctionIdentifier("graft_lang_id"),
      new ExpressionInfo(classOf[LangIdExpr].getCanonicalName,
        "graft_lang_id"),
      (c: Seq[Expression]) => LangIdExpr(c.head, TextAnalysis.LangMarkers)),
    (FunctionIdentifier("graft_rolling_fp"),
      new ExpressionInfo(classOf[RollingFpExpr].getCanonicalName,
        "graft_rolling_fp"),
      (c: Seq[Expression]) => RollingFpExpr(c.head)),
    (FunctionIdentifier("graft_bpe_count"),
      new ExpressionInfo(classOf[BpeCountExpr].getCanonicalName,
        "graft_bpe_count"),
      (c: Seq[Expression]) => BpeCountExpr(c.head)),
    (FunctionIdentifier("graft_stopword_count"),
      new ExpressionInfo(classOf[TokenSetCount].getCanonicalName,
        "graft_stopword_count"),
      (c: Seq[Expression]) =>
        TokenSetCount(c.head, TextAnalysis.Stopwords)),
    (FunctionIdentifier("graft_vec_mean"),
      new ExpressionInfo(classOf[VecMeanExpr].getCanonicalName,
        "graft_vec_mean"),
      // SQL callers may pass array<int>/array<float> — cast like the
      // Column-layer entry point does
      (c: Seq[Expression]) => VecMeanExpr(
        org.apache.spark.sql.catalyst.expressions.Cast(c.head,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = true)))
        .toAggregateExpression()),
    (FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[KmvSketchExpr].getCanonicalName,
        "graft_kmv"),
      // k must be a literal (folded at registration — the sketch size
      // is a plan-time constant, like percentile_approx's accuracy)
      (c: Seq[Expression]) => KmvSketchExpr(
        org.apache.spark.sql.catalyst.expressions.Cast(c(0),
          org.apache.spark.sql.types.LongType),
        c(1).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression()),
    (FunctionIdentifier("graft_cms"),
      new ExpressionInfo(classOf[CmsSketchExpr].getCanonicalName,
        "graft_cms"),
      // depth/width are plan-time literals, like graft_kmv's k
      (c: Seq[Expression]) => CmsSketchExpr(
        org.apache.spark.sql.catalyst.expressions.Cast(c(0),
          org.apache.spark.sql.types.StringType),
        c(1).eval().asInstanceOf[Number].intValue(),
        c(2).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression()),
    (FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerExpr].getCanonicalName,
        "graft_jaro_winkler"),
      (c: Seq[Expression]) => {
        require(c.length == 2, "usage: graft_jaro_winkler(a, b)")
        JaroWinklerExpr(c(0), c(1))
      }),
    (FunctionIdentifier("graft_cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunksExpr].getCanonicalName,
        "graft_cdc_chunks"),
      // window / base / cut-modulus are plan-time literals, like
      // graft_kmv's k
      (c: Seq[Expression]) => {
        require(c.length == 4 && c.drop(1).forall(_.foldable),
          "usage: graft_cdc_chunks(text, window, base, modulus) with " +
            "literal window/base/modulus")
        CdcChunksExpr(c(0),
          c(1).eval().asInstanceOf[Number].intValue(),
          c(2).eval().asInstanceOf[Number].longValue(),
          c(3).eval().asInstanceOf[Number].longValue())
      }),
    (FunctionIdentifier("graft_hash_sample"),
      new ExpressionInfo(
        classOf[graft.functions.HashSampleExpr].getCanonicalName,
        "graft_hash_sample"),
      // k is a plan-time literal, like graft_kmv's
      (c: Seq[Expression]) => graft.functions.HashSampleExpr(
        org.apache.spark.sql.catalyst.expressions.Cast(c(0),
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.catalyst.expressions.Cast(c(1),
          org.apache.spark.sql.types.LongType),
        c(2).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression()),
    (FunctionIdentifier("graft_vec_sum_long"),
      new ExpressionInfo(
        classOf[graft.functions.VecSumLongExpr].getCanonicalName,
        "graft_vec_sum_long"),
      (c: Seq[Expression]) => {
        require(c.length == 1, "usage: graft_vec_sum_long(arr)")
        graft.functions.VecSumLongExpr(
          org.apache.spark.sql.catalyst.expressions.Cast(c.head,
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.LongType,
              containsNull = false)))
          .toAggregateExpression()
      }),
    (FunctionIdentifier("graft_bootstrap_weights"),
      new ExpressionInfo(
        classOf[graft.functions.BootstrapWeightsExpr].getCanonicalName,
        "graft_bootstrap_weights"),
      // blocks is a plan-time literal, like graft_kmv's k; the
      // Poisson(1) cutoffs are the library's shared decimal literals
      (c: Seq[Expression]) => {
        require(c.length == 2 && c(1).foldable,
          "usage: graft_bootstrap_weights(id, blocks) with literal " +
            "blocks")
        graft.functions.BootstrapWeightsExpr(
          org.apache.spark.sql.catalyst.expressions.Cast(c(0),
            org.apache.spark.sql.types.LongType),
          c(1).eval().asInstanceOf[Number].intValue(),
          graft.queries.PipelineQueries.poissonCuts)
      }))

  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (id, _, builder) =>
      ColumnBridge.registerTempFunction(spark, id.funcName, builder)
    }
}

/** `spark.sql.extensions` entry point: SQL functions, the TopKPerKey
  * planner strategy, and its key-filter pushdown rule.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKKeyFilterPushdown)
  }
}
