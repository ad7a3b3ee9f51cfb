package graft

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}

/** The single-partition-window law, made global and executable.
  *
  * An unpartitioned window (`Window.partitionBy()` empty) moves its
  * ENTIRE input through one task — the one plan shape that silently
  * stops scaling no matter how many executors exist. Every such window
  * in the suite today sits above a value-domain-bounded frame (a
  * distinct-count table, a quantile grid, a sketch row...), and until
  * r12 that property was argued query by query in comments. This spec
  * makes it a law: every query whose optimized logical plan contains
  * an empty-partition Window must appear in the whitelist below with
  * its documented bound, and the whitelist must stay exact — an entry
  * whose query no longer carries a global window fails too, so the
  * list cannot rot in either direction. Query #246 cannot add a
  * corpus-sized global sort without tripping CI.
  */
class WindowLawSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  /** query → why its unpartitioned window input is bounded (the bound
    * must be a VALUE-DOMAIN or manifest property, independent of corpus
    * row count).
    */
  private val whitelist: Map[String, String] = Map(
    "q_gini_tokens" -> ("prefix sum over the count-frequency table " +
      "(distinct word-count values — dozens of rows at any corpus)"),
    "q_good_turing" -> ("lead/totals over the same count-frequency " +
      "domain (distinct trigram counts)"),
    "q_spearman" -> ("two rank tables over the doc-length value " +
      "domain (distinct token counts, |domain| rows)"),
    "q_ks_test" -> ("cumulative ECDF over distinct sensor cents " +
      "(bounded value domain, never event rows)"),
    "q_shuffle_order" -> ("prefix sum over the 256-row digest-byte " +
      "bucket manifest; ranks assigned per bucket"),
    "q_skyline" -> ("prefix max over the per-n_chars table (distinct " +
      "length values)"),
    "q_compaction_plan" -> ("next-fit bin cumsum over the (source, " +
      "lang) shard manifest (value-domain cells)"),
    "q_concurrency" -> ("prefix sum over the hour-bucket delta table; " +
      "sweep ranks per bucket (two-level decomposition)"),
    "q_rfm" -> ("three prefix-sum offsets over quantized-value bucket " +
      "tables; user ranks per bucket (two-level decomposition)"),
    "q_ppl_buckets" -> ("prefix sum over the milli-nat NLL bucket " +
      "table (~2*10^4 max); doc ranks per bucket, decile arithmetic " +
      "from the broadcast count (r12 rewrite — was a corpus-" +
      "proportional ntile)"),
    "q_token_budget" -> ("Hamilton apportionment over the per-source " +
      "totals (|sources| rows)"),
    "q_temperature_mix" -> ("alpha-allocation over the per-stratum " +
      "table (|sources| rows); pick ranks partition by stratum"),
    "q_zipf_slope" -> ("rank over the TakeOrderedAndProject top-1000 " +
      "result (LIMIT-bounded)"),
    "q_rrf_fusion" -> "two rank windows over LIMIT-100 top-k results",
    "q_zonemap_prune" -> ("day-rank prefix over the distinct-shipdate " +
      "table (date-domain, ~2.5k rows)"))

  test("every unpartitioned Window sits above a documented " +
      "value-domain-bounded input (global law, all queries)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, f) =>
        val plan: LogicalPlan = f(spark, d).queryExecution.optimizedPlan
        val globals = plan.collect {
          case w: Window if w.partitionSpec.isEmpty => w
        }
        if (globals.isEmpty) Nil else Seq(name -> globals.size)
    }.toMap

    val undocumented = offenders.keySet -- whitelist.keySet
    val stale = whitelist.keySet -- offenders.keySet
    assert(undocumented.isEmpty,
      s"unpartitioned Window without a documented bound: " +
        s"${undocumented.toSeq.sorted.mkString(", ")} " +
        s"(counts: ${offenders.filter(kv => undocumented(kv._1))})")
    assert(stale.isEmpty,
      s"whitelist entries whose query no longer carries a global " +
        s"window (remove them): ${stale.toSeq.sorted.mkString(", ")}")
  }
}
