package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** The standard relational surface over the TPC-H-ish testdata —
  * aggregation, joins (broadcast/shuffle, semi/anti), ranking windows,
  * top-k, set ops, rollup, JSON extraction. All Catalyst built-ins
  * (SURVEY.md §7.3 step 7); the engine work is plan shape: small dims are
  * broadcast, filters sit at the scan, money sums are exact BIGINT cents
  * (Tables.cents) so the oracle hash can't drift.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  private def rs(e: String, p: Int = 4): String = {
    val m = math.pow(10, p).toLong
    s"floor(($e)*$m + 0.5)/$m"
  }
  /** exact cents per row, summed as BIGINT — mirrors Tables.cents */
  private def centsSql(e: String): String =
    s"cast(sum(cast(floor(($e)*100 + 0.5) AS bigint)) AS bigint)"

  val defs: Map[String, Q] = Map(
    // TPC-H Q1 shape: scan-heavy grouped aggregation with derived measures
    "q1_agg" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("sum_disc_cents"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax")))).as("sum_charge_cents"),
          r(avg(col("l_quantity"))).as("avg_qty"),
          r(avg(col("l_extendedprice"))).as("avg_price"),
          r(avg(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))),

    // TPC-H Q3 shape: selective dim filter → join chain → grouped top-k.
    // customer is broadcast (1.5k rows at sf0.01); lineitem never shuffles
    // its wide columns — only the aggregated cents survive the join.
    "q3_top_orders" -> ((s, d) => {
      val cust = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = orders(s, d)
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = lineitem(s, d)
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          col("o_orderpriority"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("o_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: five-way join, revenue per nation. region/nation
    // broadcast; customer↔supplier co-nation constraint.
    "q5_nation_revenue" -> ((s, d) => {
      val reg = region(s, d).filter(col("r_name") === "ASIA")
      val nat = nation(s, d)
      val cust = customer(s, d)
      val sup = supplier(s, d)
      val ord = orders(s, d)
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val li = lineitem(s, d)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(cust, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_cents"))
    }),

    // left-semi: orders having a heavy line (EXISTS)
    "q_semi_join" -> ((s, d) =>
      orders(s, d).join(
        lineitem(s, d).filter(col("l_quantity") >= 48).hint("shuffle_hash"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"))),

    // left-anti: customers with no URGENT order (NOT EXISTS). The
    // filter on the fact side is deliberate: the synthetic corpus gives
    // every customer at least one order, so an unfiltered anti-join
    // would prove only 0=0 against the oracle — this form witnesses
    // rows at every sf (18 / 203 / 1986 at sf0.001/0.01/0.1) while
    // keeping the same left-anti physical shape
    "q_anti_join" -> ((s, d) =>
      customer(s, d).join(
        orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
          .hint("shuffle_hash"),
        col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"))),

    // top-k: TakeOrderedAndProject, no full sort
    "q_topk" -> ((s, d) =>
      orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(10)),

    // distinct aggregation
    "q_distinct_agg" -> ((s, d) =>
      customer(s, d).groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n_cust"))),

    // TPC-H Q13 shape: LEFT OUTER join + two-level aggregation —
    // customers with zero orders stay (count = 0), then the histogram
    // of order counts
    "q_order_dist" -> ((s, d) =>
      customer(s, d).join(orders(s, d).hint("shuffle_hash"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("n_cust"))),

    // cube: all grouping-set combinations with subtotals
    "q_cube" -> ((s, d) =>
      orders(s, d).cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("o_totalprice"))).as("total_cents"))),

    // rollup with subtotal rows
    "q_rollup" -> ((s, d) =>
      lineitem(s, d).rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("n"))),

    // top-3 orders per customer through the CUSTOM plan node
    // (graft.plans.TopKPerKey: LogicalPlan + Rule + Strategy + SparkPlan,
    // bounded per-key heaps instead of a window sort) — same rows as the
    // q_window_rank formulation, checked against the same window oracle.
    "q_topk_per_key" -> ((s, d) =>
      graft.plans.TopKPerKey(
          orders(s, d).select(col("o_custkey"), col("o_orderkey"),
            col("o_totalprice")),
          keys = Seq("o_custkey"),
          order = Seq("o_totalprice" -> true, "o_orderkey" -> false),
          k = 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))),

    // ranking window: top-3 orders per customer
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rk").cast("int"))
    }),

    // pivot: order-status counts per priority as columns (explicit value
    // list so the output schema is static; count cells with no rows are
    // null in Spark's pivot vs 0 in conditional aggregation — na.fill
    // aligns them)
    "q_pivot" -> ((s, d) =>
      orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))),

    // unpivot (melt): the wide pivot result back to long (status, n)
    // rows — stack-style unpivot with the same static value list
    "q_unpivot" -> ((s, d) =>
      orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
        .unpivot(Array(col("o_orderpriority")),
          Array(col("F"), col("O"), col("P")), "status", "n")),

    // set ops: nation keys that have customers vs suppliers
    "q_setops" -> ((s, d) => {
      val c = customer(s, d).select(col("c_nationkey").as("nk")).distinct()
      val su = supplier(s, d).select(col("s_nationkey").as("nk")).distinct()
      c.except(su).withColumn("tag", lit("cust_only"))
        .unionByName(c.intersect(su).withColumn("tag", lit("both")))
        .select(col("tag"), col("nk"))
    }),

    // scalar-function parity battery (§2.6): date parts + truncation,
    // string ops incl. edit distance, math with floor-rounding, bit ops
    // — one row per event, every value recomputed identically by the
    // oracle (UTC session, so date parts are timezone-free)
    "q_scalar_funcs" -> ((s, d) =>
      events(s, d).select(col("event_id"),
        year(col("ts")).as("y"),
        month(col("ts")).as("mo"),
        dayofmonth(col("ts")).as("dom"),
        hour(col("ts")).as("h"),
        epochS(date_trunc("month", col("ts"))).as("month_start"),
        upper(substring(col("props"), 1, 8)).as("up8"),
        length(trim(col("props"))).cast("long").as("trim_len"),
        levenshtein(substring(col("props"), 1, 6), lit("{\"k\":1"))
          .as("lev"),
        r(exp(col("value") / 100), 6).as("e"),
        r(log(col("value") + 1), 6).as("l"),
        r(sqrt(abs(col("value"))), 6).as("sq"),
        (col("event_id") % 7).as("pm"),
        col("event_id").bitwiseXOR(255).as("bx"))),

    // JSON extraction from events.props
    "q_json_extract" -> ((s, d) =>
      events(s, d).select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))),

    // Spark 4 collations: case-insensitive grouping through the
    // UTF8_LCASE collation — the engine-level alternative to lower()
    // normalization (collation-aware comparators reach codegen'd
    // hash/sort operators; no per-row lowercased copy of the column).
    // Mixed-case input synthesized in-query (the url_canon recipe) so
    // real case collisions exist and the oracle sees identical bytes.
    "q_collated_group" -> ((s, d) =>
      events(s, d)
        .select(when(col("event_id") % 2 === 0, upper(col("event_type")))
          .otherwise(col("event_type")).as("et"), col("value"))
        .groupBy(expr("collate(et, 'UTF8_LCASE')").as("et_ci"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("value"))).as("v_cents")) // integerize per row,
                                                  // THEN the exact sum
        .select(expr("cast(lower(et_ci) as string collate UTF8_BINARY)")
          .as("event_type"), col("n"), col("v_cents"))),

    // Spark 4 VARIANT shredding: parse the JSON props column ONCE into
    // the binary VARIANT encoding, then typed-path extraction feeding a
    // grouped rollup — the open-table-format semi-structured pattern
    // (shred at ingest, type at query). Unlike q_json_extract's
    // per-access string parse, variant_get walks the pre-parsed binary.
    "q_variant_shred" -> ((s, d) =>
      events(s, d)
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).cast("long").as("k_sum"),
          min(col("k")).as("k_min"), max(col("k")).as("k_max"))),

    // explicit GROUPING SETS with grouping_id — the general form rollup/
    // cube specialize; identical SQL runs on both engines (spark.sql
    // entry path over a registered view)
    "q_grouping_sets" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("v_orders")
      s.sql(
        """SELECT o_orderpriority, o_orderstatus,
          |  cast(grouping(o_orderpriority) AS int) AS g_pri,
          |  cast(grouping(o_orderstatus) AS int) AS g_st,
          |  count(*) AS n
          |FROM v_orders
          |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
          |""".stripMargin)
    }),

    // analytic window-function battery: lead/lag/ntile/nth + running
    // extremes over one partition spec (standard default frames)
    "q_window_battery" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      orders(s, d).select(col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_key"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"),
        ntile(4).over(w).as("quartile"),
        min(cents(col("o_totalprice"))).over(w).as("run_min_cents"),
        max(cents(col("o_totalprice"))).over(w).as("run_max_cents"))
    }),

    // correlated scalar subquery: orders above their customer's average
    "q_corr_subquery" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("v_orders")
      s.sql(
        """SELECT o_orderkey FROM v_orders o
          |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM v_orders i
          |                      WHERE i.o_custkey = o.o_custkey)
          |""".stripMargin)
    }),

    // Q4 shape: priority counts for orders with a late-shipped line.
    // EXISTS(line WHERE l_shipdate > o_orderdate) ⇔ the order's MAX
    // shipdate is late, so lineitem pre-aggregates to one (orderkey,
    // max_ship) row BEFORE the join: map-side partial max collapses the
    // 4×-larger fact table to order cardinality ahead of the shuffle,
    // and the join becomes a pure equi-join (hash, AQE-broadcastable)
    // with the non-equi predicate as a cheap post-join filter — vs the
    // left_semi form whose mixed equi+non-equi condition shuffled the
    // full lineitem projection (profiled 0.53 → ~0.25 s at sf0.1).
    "q_priority_exists" -> ((s, d) =>
      orders(s, d).join(
        lineitem(s, d).groupBy(col("l_orderkey"))
          .agg(max(col("l_shipdate")).as("max_ship")),
        col("l_orderkey") === col("o_orderkey") &&
          col("max_ship") > col("o_orderdate"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))),

    // As-of join: every event matched to its user's latest checkpoint
    // (every 10th event) at or before its timestamp — the time-series
    // join Spark lacks natively, composed as tag+union+keyed-window
    // (graft.ops.AsofJoin); DuckDB's native ASOF LEFT JOIN is the oracle.
    "q_asof_join" -> ((s, d) => {
      val ev = events(s, d).select(col("event_id"), col("user_id"),
        col("ts"), col("value"))
      val cps = ev.filter(col("event_id") % 10 === 0)
        .select(col("user_id"), col("ts"),
          col("event_id").as("cp_id"), col("value").as("cp_value"))
      graft.ops.AsofJoin
        .asofLeft(ev, cps, Seq("user_id"), "ts", Seq("cp_id", "cp_value"))
        .select(col("event_id"), col("user_id"),
          epochS(col("ts")).as("ts_epoch"), col("cp_id"), col("cp_value"))
    }),

    // Range join: events (points on the value axis) against intervals
    // [v, v+2) from every 100th event — grid-bucketed equi-join
    // (graft.ops.RangeJoin), never a nested-loop inequality join.
    "q_range_join" -> ((s, d) => {
      val ev = events(s, d)
      val pts = ev.select(col("event_id").as("p_id"), col("value").as("x"))
      val ivs = ev.filter(col("event_id") % 100 === 0)
        .select(col("event_id").as("iv_id"), col("value").as("lo"),
          (col("value") + 2.0).as("hi"))
      graft.ops.RangeJoin.pointInInterval(pts, ivs, "x", "lo", "hi", 2.0)
        .select(col("p_id"), col("iv_id"), col("x"), col("lo"))
    }),

    // Conversion funnel over the event stream: users who viewed, then
    // clicked AFTER their first view, then purchased AFTER that first
    // qualifying click — the ordered-sequence semantics (strictly
    // later-than the previous stage's first occurrence) that a naive
    // per-type count gets wrong. Shape: each stage is a per-user min-ts
    // aggregation co-partitioned on user_id with the previous stage's
    // (|users|-sized) table — events shuffle once per stage on user_id,
    // never on anything wider, and the stage tables shrink
    // monotonically. The three 1-row stage counts meet in broadcast
    // cross-joins (the 1-row-scalar pattern).
    "q_funnel" -> ((s, d) => {
      val ev = events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("v_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("c_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click_after")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase_after")))
    }),

    // Cohort retention: users grouped by the epoch-week of their first
    // signup; for each (cohort week, week offset) the count of users
    // with ANY activity in that week. Weeks are epoch buckets
    // (winBucket), not calendar truncation — engine-independent by
    // construction. Shape: events collapse to distinct (user, week)
    // pairs FIRST (the only corpus-scale shuffle), then a co-partitioned
    // user_id join against the |users|-sized cohort table; the final
    // aggregation is (cohorts × offsets)-sized. A user appears once per
    // active week, so count(*) IS the distinct-user count — no
    // count-distinct expansion needed.
    "q_cohort_retention" -> ((s, d) => {
      val ev = events(s, d)
      val wk = winBucket(col("ts"), 604800)
      val cohorts = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(wk).as("cohort_wk"))
      ev.select(col("user_id"), wk.as("act_wk")).distinct()
        .join(cohorts, "user_id")
        .filter(col("act_wk") >= col("cohort_wk"))
        .groupBy(col("cohort_wk"),
          ((col("act_wk") - col("cohort_wk")) / 604800).cast("int")
            .as("week_offset"))
        .agg(count(lit(1)).as("n_active"))
    }),

    // Event-type transition matrix (the Markov-chain view of user
    // behavior): consecutive event pairs per user via lead() over
    // (ts, event_id) — the deterministic total order — then pair
    // counts and per-source-type transition probability in exact
    // integer micro units (floor-division of longs, so no float can
    // drift the hash). Shape: one shuffle on user_id for the sequence
    // window, then a (types × types)-sized aggregation; the
    // probability window runs on that tiny table.
    "q_event_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wt = Window.partitionBy(col("event_type"))
      events(s, d)
        .select(col("user_id"), col("event_type"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("tot", sum(col("n")).over(wt))
        .select(col("event_type"), col("next_type"), col("n"),
          expr("(n * 1000000) div tot").as("p_micro"))
    }),

    // Deequ-style data-quality constraint battery — the validation
    // gate a production pipeline runs before promoting a batch:
    // uniqueness, completeness, referential integrity, domain ranges.
    // Each check is one scan-shaped aggregation (the FK check is a
    // broadcast left join against the distinct key side); the report
    // is the per-check (checked, violations, pass) rows, so a failing
    // constraint is attributable, not a boolean for the whole batch.
    "q_dq_checks" -> ((s, d) => {
      def one(name: String, df: DataFrame): DataFrame =
        df.select(lit(name).as("check_name"), col("n_checked"),
          col("n_violations"))
      val ord = orders(s, d)
      val uniq = ord.agg(count(lit(1)).as("n_checked"),
        (count(lit(1)) - countDistinct(col("o_orderkey")))
          .as("n_violations"))
      val nn = ord.agg(count(lit(1)).as("n_checked"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L))
          .as("n_violations"))
      val fk = ord.join(
          broadcast(customer(s, d).select(col("c_custkey")).distinct()),
          col("o_custkey") === col("c_custkey"), "left")
        .agg(count(lit(1)).as("n_checked"),
          sum(when(col("c_custkey").isNull, 1L).otherwise(0L))
            .as("n_violations"))
      val rng = lineitem(s, d).agg(count(lit(1)).as("n_checked"),
        sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
          .otherwise(0L)).as("n_violations"))
      val pos = events(s, d).agg(count(lit(1)).as("n_checked"),
        sum(when(col("value") < 0, 1L).otherwise(0L)).as("n_violations"))
      one("orders.o_orderkey.unique", uniq)
        .unionByName(one("orders.o_custkey.not_null", nn))
        .unionByName(one("orders.o_custkey.fk_customer", fk))
        .unionByName(one("lineitem.l_quantity.range_1_50", rng))
        .unionByName(one("events.value.non_negative", pos))
        .withColumn("pass", col("n_violations") === 0L)
    }),

    // SCD type-2 dimension build (gaps-and-islands): per user, the
    // event_type history collapses to validity intervals — consecutive
    // runs of the same type become one row with [valid_from, valid_to)
    // micros, NULL valid_to + is_current on the open run. The island id
    // is the classic difference of two row_numbers over the SAME
    // deterministic (ts, event_id) order, so both window passes reuse
    // one user_id-partitioned sort; everything after runs on the
    // runs-sized table. The user_id shuffle is the only corpus-scale
    // exchange — exactly how a CDC pipeline folds a changelog into a
    // dimension at 100 TB (per-key ordered fold, no global sort).
    "q_scd2" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val byUserType = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("us"), col("event_id"))
      val isl = events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"), col("event_id"))
        .withColumn("island",
          row_number().over(byUser) - row_number().over(byUserType))
      val runs = isl.groupBy(col("user_id"), col("event_type"), col("island"))
        .agg(min(col("us")).as("valid_from_us"),
          count(lit(1)).as("n_events"))
      // tie-break: two runs of one user CAN share a start microsecond
      // (duplicate timestamps across types); (valid_from_us,
      // event_type, island) is unique per user, so the chain is
      // deterministic — the repo's window-determinism rule
      val seq = Window.partitionBy(col("user_id"))
        .orderBy(col("valid_from_us"), col("event_type"), col("island"))
      runs.select(col("user_id"), col("event_type"), col("valid_from_us"),
          lead(col("valid_from_us"), 1).over(seq).as("valid_to_us"),
          col("n_events"))
        .withColumn("is_current", col("valid_to_us").isNull)
    }),

    // Incremental materialized-view maintenance: the running per-type
    // aggregate (count + exact cents) is kept as a base MV; a new delta
    // batch aggregates ALONE (delta-sized shuffle, never a base rescan)
    // and merges via full-outer coalesce — the delta-maintenance
    // algebra (counts and sums are abelian-group measures, so
    // merge(base, agg(delta)) ≡ agg(base ∪ delta)). The query emits the
    // merged MV next to a from-scratch recompute plus a `consistent`
    // witness column, so the oracle hash certifies the maintenance
    // algebra itself, not just one side. At 100 TB the recompute branch
    // is the (rare) audit pass; the delta branch is the every-batch
    // cost: |delta| rows shuffled on event_type.
    "q_incremental_agg" -> ((s, d) => {
      val ev = events(s, d)
      def agg(df: DataFrame): DataFrame =
        df.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"), sum(cents(col("value"))).as("cents"))
      val base = agg(ev.filter(col("event_id") % 10 =!= 0))
      val delta = agg(ev.filter(col("event_id") % 10 === 0))
      val merged = base.select(col("event_type"), col("n").as("bn"),
          col("cents").as("bc"))
        .join(delta.select(col("event_type"), col("n").as("dn"),
          col("cents").as("dc")), Seq("event_type"), "full_outer")
        .select(col("event_type"),
          (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
            .as("n_merged"),
          (coalesce(col("bc"), lit(0L)) + coalesce(col("dc"), lit(0L)))
            .as("cents_merged"))
      merged.join(agg(ev).select(col("event_type"), col("n").as("n_full"),
          col("cents").as("cents_full")), Seq("event_type"), "full_outer")
        .select(col("event_type"), col("n_merged"), col("cents_merged"),
          (col("n_merged") === col("n_full") &&
            col("cents_merged") === col("cents_full")).as("consistent"))
    }),

    // Sliding-window z-score anomaly detection — the streaming-monitor
    // shape in batch form: per event_type, each value is scored against
    // the trailing 7-event window (6 preceding + current, deterministic
    // (ts, event_id) order). The z>2 test is evaluated in EXACT integer
    // cents algebra: z² = (c·n−S)²/(n·Q−S²) > 4  ⇔
    // (c·n−S)² > 4·(n·Q−S²), with S=Σc, Q=Σc² over the window — no
    // float mean/stddev, so the flag (and the hash) cannot drift with
    // summation order. One event_type-partitioned sort carries both
    // window sums; flagged rows only are emitted (the alert table).
    "q_anomaly_zscore" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("us"), col("event_id")).rowsBetween(-6, 0)
      events(s, d)
        .select(col("event_id"), col("event_type"),
          cents(col("value")).as("c"), unix_micros(col("ts")).as("us"))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("s", sum(col("c")).over(w))
        .withColumn("q", sum(col("c") * col("c")).over(w))
        .filter(col("n") === 7)
        .withColumn("dev", col("c") * col("n") - col("s"))
        .withColumn("var_n2", col("n") * col("q") - col("s") * col("s"))
        .filter(col("dev") * col("dev") > lit(4L) * col("var_n2"))
        .select(col("event_id"), col("event_type"), col("c").as("cents"),
          col("dev"), col("var_n2"))
    }),

    // Skew-salted join: the manual remedy when one hot key floods a
    // shuffle partition (AQE skew-split only kicks in post-shuffle —
    // salting prevents the hot partition from ever materializing). The
    // fact side derives a DETERMINISTIC salt in [0,8) by hashing its
    // own row identity (xxhash64 of (orderkey, linenumber) — no
    // rand(), so replays/retries are stable, and unlike
    // l_linenumber%8 — whose 1..7 domain would never hit salt 0 — the
    // hash reaches all 8 salts uniformly); the dim side replicates 8×
    // via explode(sequence) BEFORE its shuffle, and the join keys on
    // (orderkey, salt) — the hot orderkey now spreads over 8 reducers.
    // Salting is result-transparent: the oracle is the PLAIN join, so
    // the hash certifies transparency. Dim replication costs
    // 8×|orders| rows of (key, salt, priority) — at 100 TB you salt
    // only the keys the skew stats flag, not the whole dim.
    "q_salted_join" -> ((s, d) => {
      val S = 8
      val fact = lineitem(s, d)
        .select(col("l_orderkey"),
          cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("rev_cents"),
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(S))
            .as("salt"))
      val dim = orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
          explode(sequence(lit(0), lit(S - 1))).as("salt"))
      // shuffle-hash, NOT broadcast: AQE would happily broadcast the
      // 8×-replicated dim at test scale, which both defeats the salting
      // demonstration and pays 8× the broadcast volume — the whole
      // point of salting is that the join SHUFFLES on (key, salt).
      // r14: the hint moved to the FACT side, so the hash map builds
      // from the smaller relation (guide §3.1 — pick the build side
      // deliberately): the dim is 8×-replicated by the salting, so
      // fact < dim here by construction whenever |lineitem| < 8·|orders|
      // (interleaved min-of-5 at sf0.1: 1.71 s build-dim vs 1.57 s
      // build-fact, every paired run faster).
      fact.hint("shuffle_hash").join(dim,
          fact("l_orderkey") === dim("o_orderkey") &&
            fact("salt") === dim("salt"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"), sum(col("rev_cents")).as("rev_cents"))
    }),

    // Per-group linear trend — exact-integer OLS: slope of value-cents
    // against hours-since-corpus-start, per event_type. Every sum the
    // normal equations need (n, Σx, Σy, Σxy, Σx²) is an exact BIGINT
    // accumulated in ONE map-side-partial aggregation, and the slope
    // ships as the rational (n·Σxy−Σx·Σy) / (n·Σx²−(Σx)²) — numerator
    // and denominator separately, because a float (or floor-div, whose
    // negative-operand semantics differ across engines) would make the
    // hash lie. Bounds: x ≤ 720 h, y ≤ 10⁵ cents, n ≤ 10⁵ ⇒ n·Σxy ≤
    // 10¹⁸ < 2⁶³ — checked, not hoped.
    "q_trend_slope" -> ((s, d) => {
      val ev = events(s, d).select(col("event_type"),
        unix_micros(col("ts")).as("us"), cents(col("value")).as("y"))
      val lo = ev.agg(min(col("us")).as("lo"))
      ev.crossJoin(broadcast(lo))
        .withColumn("x", expr("(us - lo) div 3600000000"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(expr("x * y")).as("sxy"),
          sum(expr("x * x")).as("sxx"))
        .select(col("event_type"), col("n"), col("sx"), col("sy"),
          col("sxy"), col("sxx"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
    }),

    // Max-concurrency sweep line, two-level (the capacity-planning
    // query): user sessions (30-min gap rule) become ±1 boundary deltas
    // with an EXCLUSIVE end (last_us+1), and concurrency is the running
    // sum over the global (us, delta) order. The running sum is NOT one
    // global window: deltas bucket by hour, per-bucket sums prefix-scan
    // on the bucket table (hundreds of rows), and each bucket's rows
    // window-scan locally with the bucket's offset added — the
    // distributed prefix-sum decomposition, so no stage ever sorts the
    // corpus globally. Output is (us, delta, concurrent); within an
    // equal-(us, delta) tie group the prefix values are a fixed
    // multiset, so the hash is permutation-stable.
    "q_concurrency" -> ((s, d) => {
      val wu = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val ev = events(s, d).select(col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      val sess = ev
        .withColumn("prev", lag(col("us"), 1).over(wu))
        .withColumn("is_start", when(col("prev").isNull ||
          col("us") - col("prev") > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("sid", sum(col("is_start")).over(wu))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("us")).as("start_us"),
          (max(col("us")) + 1).as("end_us"))
        // one row per session, materialized once: the start-delta and
        // end-delta arms and the bucket-offset branch each consume
        // `sess` — without the barrier the events scan + sessionization
        // window ran up to four times (r9 perf audit)
        .localCheckpoint(false)
      val deltas = sess
        .select(col("start_us").as("us"), lit(1L).as("delta"))
        .unionAll(sess.select(col("end_us").as("us"), lit(-1L).as("delta")))
        .withColumn("bucket", expr("us div 3600000000"))
      val wb = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val off = deltas.groupBy(col("bucket"))
        .agg(sum(col("delta")).as("bsum"))
        .withColumn("offset", coalesce(sum(col("bsum")).over(wb), lit(0L)))
        .select(col("bucket"), col("offset"))
      val win = Window.partitionBy(col("bucket"))
        .orderBy(col("us"), col("delta"))
        .rowsBetween(Window.unboundedPreceding, 0)
      deltas.join(broadcast(off), "bucket")
        .withColumn("concurrent", col("offset") + sum(col("delta")).over(win))
        .select(col("us"), col("delta"), col("concurrent"))
    }),

    // Time-series subsequence similarity search (the EDBT'19/ICDE'21
    // streaming-similarity shape): every length-8 window of every
    // user's cents series is scored against a deterministic query
    // pattern (the lowest user's first full window) by EXACT integer
    // squared Euclidean distance, and the 10 closest windows return
    // via TakeOrderedAndProject. The distance profile materializes
    // with 7 lead() columns over ONE per-user sort — no self-join, no
    // subsequence explosion; the query pattern is a 1-row broadcast.
    // At 100 TB this is the distance-profile scan: corpus-sized work,
    // window-local state, top-k never sorts globally.
    "q_ts_similarity" -> ((s, d) => {
      val m = 8
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val series = events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), cents(col("value")).as("c0"))
        .withColumn("idx", row_number().over(w))
      val widened = (1 until m).foldLeft(series)((df, j) =>
        df.withColumn(s"c$j", lead(col("c0"), j).over(w)))
      val full = widened.filter(col(s"c${m - 1}").isNotNull)
      val minUser = series.agg(min(col("user_id")).as("qu"))
      val query = full.join(broadcast(minUser),
          col("user_id") === col("qu") && col("idx") === 1)
        .select((0 until m).map(j => col(s"c$j").as(s"q$j")): _*)
      val dist2 = (0 until m).map(j =>
        (col(s"c$j") - col(s"q$j")) * (col(s"c$j") - col(s"q$j")))
        .reduce(_ + _)
      full.crossJoin(broadcast(query))
        .select(col("user_id"), col("us").as("start_us"),
          dist2.as("dist2"))
        .orderBy(col("dist2"), col("user_id"), col("start_us"))
        .limit(10)
    }),

    // CDC MERGE (upsert, latest-wins): the changelog-apply step every
    // incremental lakehouse table needs. The corpus splits at a
    // deterministic integer time cutoff (min + 7/10 of the span) into a
    // snapshot era and a changelog era; each era folds to its per-user
    // latest record (one user_id shuffle each, (us, event_id) total
    // order), and the MERGE is a full-outer coalesce emitting the
    // post-merge state plus the action witness (insert / update /
    // keep). At 100 TB the snapshot side is the bucketed table (no
    // per-merge shuffle) and the changelog side is delta-sized — the
    // shape here is exactly that algebra, certified by the oracle hash.
    "q_upsert" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_type"),
        cents(col("value")).as("cents"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      val span = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
        .select(expr("lo + ((hi - lo) * 7) div 10").as("cut"))
      val cut = ev.crossJoin(broadcast(span))
      def latest(df: DataFrame): DataFrame = {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us").desc, col("event_id").desc)
        df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"), col("cents"), col("us"))
      }
      val snap = latest(cut.filter(col("us") <= col("cut")))
      val chg = latest(cut.filter(col("us") > col("cut")))
      snap.select(col("user_id"), col("event_type").as("s_type"),
          col("cents").as("s_cents"), col("us").as("s_us"))
        .join(chg.select(col("user_id"), col("event_type").as("c_type"),
          col("cents").as("c_cents"), col("us").as("c_us")),
          Seq("user_id"), "full_outer")
        .select(col("user_id"),
          coalesce(col("c_type"), col("s_type")).as("event_type"),
          coalesce(col("c_cents"), col("s_cents")).as("cents"),
          coalesce(col("c_us"), col("s_us")).as("us"),
          when(col("s_us").isNull, "insert")
            .when(col("c_us").isNull, "keep")
            .otherwise("update").as("action"))
    }),

    // Time-RANGE window frame (not ROWS): per user, the trailing
    // 1-hour rolling sum/count over event-time micros — RANGE BETWEEN
    // 3600000000 PRECEDING AND CURRENT ROW. Peer rows (equal us) enter
    // the frame together regardless of tie order, so the frame is
    // deterministic without an event_id tie-break; physical execution
    // is the same one user_id-partitioned sort as a ROWS frame, with
    // the frame boundary advanced by value instead of count.
    "q_range_window" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-3600000000L, 0L)
      events(s, d)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"), cents(col("value")).as("c"))
        .select(col("event_id"), col("user_id"), col("us"),
          sum(col("c")).over(w).as("roll_cents"),
          count(lit(1)).over(w).as("roll_n"))
    }),

    // ANALYZE-style column statistics — the stats layer a cost-based
    // optimizer (and a data catalog) runs per table: for each column of
    // events, row count, null count, exact NDV, and min/max rendered to
    // strings.
    "q_column_stats" -> ((s, d) => {
      val ev = events(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), cents(col("value")).as("cents"),
        unix_micros(col("ts")).as("us"))
      val nrows = ev.agg(count(lit(1)).as("n_rows"))
      // one two-level aggregation per column: the scan prunes to that
      // single column, groupBy(value) partial-aggregates map-side so
      // only (value, count) pairs shuffle, and the rollup row is
      // value-domain-sized. Benchmarked ~2.5× faster at sf0.1 than the
      // single-scan multi-countDistinct form, whose Expand inflated
      // every row 6× before the partial aggregates.
      def one(c: String): DataFrame =
        ev.select(col(c).as("v"))
          .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
          .agg(coalesce(sum(when(col("v").isNotNull, col("cnt"))),
              lit(0L)).as("n_notnull"),
            count(col("v")).as("ndv"),
            min(col("v")).cast("string").as("min_str"),
            max(col("v")).cast("string").as("max_str"))
          .select(lit(c).as("column_name"), col("n_notnull"),
            col("ndv"), col("min_str"), col("max_str"))
      Seq("event_id", "user_id", "event_type", "cents", "us")
        .map(one).reduce(_ unionByName _)
        .crossJoin(broadcast(nrows))
        .select(col("column_name"), col("n_rows"),
          (col("n_rows") - col("n_notnull")).as("n_null"),
          col("ndv"), col("min_str"), col("max_str"))
    }),

    // Bucketed co-located join — the 100 TB fact-table layout: both
    // sides are written ONCE as 8-bucket sorted-by-key tables (the
    // write pays the one shuffle), and every subsequent equi-join on
    // the bucket key plans with NO exchange — the corpus never crosses
    // the network again (plan-audited). Spark ≥3 re-sorts each bucket
    // locally (SPARK-28595 stopped trusting written sort order by
    // default; the legacy flag would elide even that) — an in-memory
    // streaming sort over pre-sorted runs, not a shuffle. The
    // repartition-by-key before the write yields one file per bucket.
    // Tables are created if absent and reused within the session — the
    // amortization that makes the layout pay. Oracle is the plain
    // join: bucketing must be result-transparent.
    "q_bucketed_join" -> ((s, d) => {
      val tag = d.replaceAll("[^a-zA-Z0-9]", "_")
      val base = System.getProperty("java.io.tmpdir") + "/graft_bj_" + tag
      def ensure(name: String, df: => DataFrame, key: String): Unit =
        if (!s.catalog.tableExists(name))
          df.repartition(8, col(key)).write.mode("overwrite")
            .bucketBy(8, key).sortBy(key)
            .option("path", s"$base/$name")
            .format("parquet").saveAsTable(name)
      val ot = s"bj_orders_$tag"
      val lt = s"bj_lineitem_$tag"
      ensure(ot, orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority")), "o_orderkey")
      ensure(lt, lineitem(s, d).select(col("l_orderkey"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("rev_cents")), "l_orderkey")
      s.table(lt).hint("merge")
        .join(s.table(ot), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("rev_cents")).as("rev_cents"))
    }),

    // RFM scoring (recency / frequency / monetary quintiles) — the
    // classic user-value segmentation. Events collapse to the per-user
    // aggregate FIRST (one user_id shuffle; integer micros and exact
    // cents, so nothing floats). The quintiles are then EXACT ntile(5)
    // semantics (first n%5 buckets one row larger) computed WITHOUT a
    // single-partition sort over the users table: each ordering gets
    // an exact global rank via the q_shuffle_order two-level prefix
    // decomposition — rows bucket by a coarse MONOTONE image of the
    // sort key (hour-quantized recency / negated frequency /
    // $1000-quantized negated monetary), bucket counts prefix-sum on
    // the value-domain-sized bucket table, each bucket ranks locally
    // with its offset added — and rank maps to the quintile
    // arithmetically from the broadcast user count. Users are a
    // corpus-scale entity at 100×; no window ever sees more than one
    // bucket of them.
    "q_rfm" -> ((s, d) => {
      // The per-user rollup is the ONLY events pass and it materializes
      // once: the reference timestamp, the user count, and all three
      // bucket-offset tables derive from the checkpointed per-user
      // table instead of re-scanning events per branch (the r8
      // perf_weak finding — 5 full scans collapsed to 1), and the
      // reference instant is max(last_us) ≡ max over events.
      val per = events(s, d).groupBy(col("user_id")).agg(
        max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("frequency"),
        sum(cents(col("value"))).as("monetary_cents"))
        .localCheckpoint(false)
      val st = per.agg(max(col("last_us")).as("ref_us"),
        count(lit(1)).as("n_users"))
      val base = per.crossJoin(broadcast(st))
        .select(col("user_id"),
          (col("ref_us") - col("last_us")).as("recency_us"),
          col("frequency"), col("monetary_cents"), col("n_users"))
      // Exact global rank of `ord` (a total order: tie-broken by
      // user_id) where `bucket` is monotone non-decreasing along it.
      // Offsets come from `base` (cheap projections of the checkpoint),
      // NOT the rank-chained df — the fold chains three ranks, and
      // deriving offsets from the chained df re-ran every earlier
      // rank's window per offset branch.
      def globalRank(df: DataFrame, bucket: Column, ord: Seq[Column],
          out: String): DataFrame = {
        val wb = Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val off = base.withColumn("__b", bucket).groupBy(col("__b"))
          .agg(count(lit(1)).as("__bn"))
          .withColumn("__off", coalesce(sum(col("__bn")).over(wb), lit(0L)))
          .select(col("__b"), col("__off"))
        val wl = Window.partitionBy(col("__b")).orderBy(ord: _*)
        df.withColumn("__b", bucket).join(broadcast(off), "__b")
          .withColumn(out, col("__off") + row_number().over(wl))
          .drop("__b", "__off")
      }
      // rank -> ntile(5): q = n div 5, r = n mod 5; buckets 1..r hold
      // q+1 rows, buckets r+1..5 hold q (the SQL-standard definition
      // Spark and DuckDB share). Pure integer arithmetic on positives.
      def ntileOf(rn: String): Column = expr(
        s"""cast(CASE
           |  WHEN $rn <= (n_users % 5) * ((n_users div 5) + 1)
           |  THEN ($rn - 1) div ((n_users div 5) + 1) + 1
           |  ELSE (n_users % 5) +
           |    ($rn - (n_users % 5) * ((n_users div 5) + 1) - 1)
           |      div (n_users div 5) + 1
           |END AS int)""".stripMargin)
      val ranked = Seq[(Column, Seq[Column], String)](
        (expr("recency_us div 3600000000"),
          Seq(col("recency_us"), col("user_id")), "__r_rn"),
        (-col("frequency"),
          Seq(col("frequency").desc, col("user_id")), "__f_rn"),
        (-expr("monetary_cents div 100000"),
          Seq(col("monetary_cents").desc, col("user_id")), "__m_rn"))
        .foldLeft(base) { case (df, (b, o, n)) => globalRank(df, b, o, n) }
      ranked.select(col("user_id"), col("recency_us"), col("frequency"),
          col("monetary_cents"),
          ntileOf("__r_rn").as("r_score"),
          ntileOf("__f_rn").as("f_score"),
          ntileOf("__m_rn").as("m_score"))
        .withColumn("rfm",
          col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
    }),

    // Q14 shape: conditional aggregation ratio over a join
    "q_promo_share" -> ((s, d) => {
      val li = lineitem(s, d).filter(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      li.join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO",
            cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .otherwise(0L)).as("promo_cents"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("total_cents"))
        .select(r(col("promo_cents").cast("double") * 100 /
          col("total_cents")).as("promo_pct"))
    }))

  private val revCents = centsSql("l_extendedprice*(1 - l_discount)")

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         | cast(sum(cast(l_quantity AS bigint)) AS bigint) AS sum_qty,
         | ${centsSql("l_extendedprice")} AS sum_base_cents,
         | $revCents AS sum_disc_cents,
         | ${centsSql("l_extendedprice*(1 - l_discount)*(1 + l_tax)")}
         |   AS sum_charge_cents,
         | ${rs("avg(l_quantity)")} AS avg_qty,
         | ${rs("avg(l_extendedprice)")} AS avg_price,
         | ${rs("avg(l_discount)")} AS avg_disc,
         | count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY 1, 2""".stripMargin,

    "q3_top_orders" ->
      s"""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
         | o_orderpriority, $revCents AS revenue_cents
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         | AND o_orderdate < TIMESTAMP '1998-01-01'
         | AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue_cents DESC, o_orderkey LIMIT 10""".stripMargin,

    "q5_nation_revenue" ->
      s"""SELECT n_name, $revCents AS revenue_cents
         |FROM lineitem
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN supplier ON l_suppkey = s_suppkey
         | JOIN customer ON o_custkey = c_custkey
         |   AND c_nationkey = s_nationkey
         | JOIN nation ON c_nationkey = n_nationkey
         | JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA' AND o_orderdate < TIMESTAMP '1999-01-01'
         |GROUP BY 1""".stripMargin,

    "q_semi_join" ->
      ("SELECT o_orderkey FROM orders WHERE EXISTS (SELECT 1 FROM lineitem " +
        "WHERE l_orderkey = o_orderkey AND l_quantity >= 48)"),

    "q_anti_join" ->
      ("SELECT c_custkey FROM customer WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
        "AND o_orderpriority = '1-URGENT')"),

    "q_topk" ->
      ("SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"),

    "q_distinct_agg" ->
      ("SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations, " +
        "count(*) AS n_cust FROM customer GROUP BY 1"),

    "q_order_dist" ->
      ("""SELECT c_count, count(*) AS n_cust FROM (
         |  SELECT c_custkey, count(o_orderkey) AS c_count
         |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
         |  GROUP BY c_custkey)
         |GROUP BY c_count""").stripMargin,

    "q_cube" ->
      ("SELECT o_orderpriority, o_orderstatus, count(*) AS n, " +
        "cast(sum(cast(floor(o_totalprice*100 + 0.5) AS bigint)) AS bigint)" +
        " AS total_cents FROM orders " +
        "GROUP BY CUBE (o_orderpriority, o_orderstatus)"),

    "q_rollup" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "cast(sum(cast(l_quantity AS bigint)) AS bigint) AS sum_qty, " +
        "count(*) AS n FROM lineitem " +
        "GROUP BY ROLLUP (l_returnflag, l_linestatus)"),

    "q_topk_per_key" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice FROM " +
        "(SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER " +
        "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) " +
        "AS rn FROM orders) WHERE rn <= 3"),

    "q_window_rank" ->
      ("SELECT o_custkey, o_orderkey, cast(rk AS int) AS rk FROM " +
        "(SELECT o_custkey, o_orderkey, row_number() OVER " +
        "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) " +
        "AS rk FROM orders) WHERE rk <= 3"),

    "q_pivot" ->
      ("""SELECT o_orderpriority,
         | count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
         | count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
         | count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
         |FROM orders GROUP BY 1""").stripMargin,

    "q_unpivot" ->
      ("""WITH w AS (
         |  SELECT o_orderpriority,
         |    count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f,
         |    count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o,
         |    count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p
         |  FROM orders GROUP BY 1)
         |SELECT o_orderpriority, 'F' AS status, f AS n FROM w
         |UNION ALL SELECT o_orderpriority, 'O', o FROM w
         |UNION ALL SELECT o_orderpriority, 'P', p FROM w""").stripMargin,

    "q_setops" ->
      ("SELECT 'cust_only' AS tag, nk FROM " +
        "(SELECT DISTINCT c_nationkey AS nk FROM customer EXCEPT " +
        "SELECT DISTINCT s_nationkey AS nk FROM supplier) " +
        "UNION ALL SELECT 'both' AS tag, nk FROM " +
        "(SELECT DISTINCT c_nationkey AS nk FROM customer INTERSECT " +
        "SELECT DISTINCT s_nationkey AS nk FROM supplier)"),

    "q_json_extract" ->
      ("SELECT event_id, cast(json_extract_string(props, '$.k') AS int) " +
        "AS k FROM events"),

    "q_collated_group" ->
      ("""WITH m AS (SELECT CASE WHEN event_id % 2 = 0
         |    THEN upper(event_type) ELSE event_type END AS et, value
         |  FROM events)
         |SELECT lower(et) AS event_type, cast(count(*) AS bigint) AS n,
         |  cast(sum(cast(floor(value*100 + 0.5) AS bigint)) AS bigint)
         |    AS v_cents
         |FROM m GROUP BY 1""").stripMargin,

    "q_variant_shred" ->
      ("""SELECT event_type, cast(count(*) AS bigint) AS n,
         |  cast(sum(cast(json_extract_string(props, '$.k') AS int))
         |    AS bigint) AS k_sum,
         |  cast(min(cast(json_extract_string(props, '$.k') AS int))
         |    AS int) AS k_min,
         |  cast(max(cast(json_extract_string(props, '$.k') AS int))
         |    AS int) AS k_max
         |FROM events GROUP BY 1""").stripMargin,

    "q_scalar_funcs" ->
      (s"""SELECT event_id,
          | cast(year(ts) AS int) AS y, cast(month(ts) AS int) AS mo,
          | cast(day(ts) AS int) AS dom, cast(hour(ts) AS int) AS h,
          | epoch(date_trunc('month', ts)) AS month_start,
          | upper(substr(props, 1, 8)) AS up8,
          | cast(length(trim(props)) AS bigint) AS trim_len,
          | cast(levenshtein(substr(props, 1, 6), '{"k":1') AS int) AS lev,
          | ${rs("exp(value / 100)", 6)} AS e,
          | ${rs("ln(value + 1)", 6)} AS l,
          | ${rs("sqrt(abs(value))", 6)} AS sq,
          | event_id % 7 AS pm,
          | xor(event_id, 255) AS bx
          |FROM events""").stripMargin,

    "q_grouping_sets" ->
      ("""SELECT o_orderpriority, o_orderstatus,
         |  cast(grouping(o_orderpriority) AS int) AS g_pri,
         |  cast(grouping(o_orderstatus) AS int) AS g_st,
         |  count(*) AS n
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
         |""").stripMargin,

    "q_window_battery" ->
      ("""SELECT o_custkey, o_orderkey,
         |  lag(o_orderkey, 1) OVER w AS prev_key,
         |  lead(o_orderkey, 1) OVER w AS next_key,
         |  cast(ntile(4) OVER w AS int) AS quartile,
         |  min(cast(floor(o_totalprice*100 + 0.5) AS bigint)) OVER w
         |    AS run_min_cents,
         |  max(cast(floor(o_totalprice*100 + 0.5) AS bigint)) OVER w
         |    AS run_max_cents
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
         |""").stripMargin,

    "q_corr_subquery" ->
      ("""SELECT o_orderkey FROM orders o
         |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders i
         |                      WHERE i.o_custkey = o.o_custkey)
         |""").stripMargin,

    "q_priority_exists" ->
      ("SELECT o_orderpriority, count(*) AS n_orders FROM " +
        "(SELECT DISTINCT o_orderkey, o_orderpriority FROM orders " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "AND l_shipdate > o_orderdate) GROUP BY 1"),

    "q_range_join" ->
      ("""SELECT p.event_id AS p_id, i.event_id AS iv_id,
         | p.value AS x, i.value AS lo
         |FROM events p JOIN
         | (SELECT event_id, value FROM events WHERE event_id % 100 = 0) i
         | ON p.value >= i.value AND p.value < i.value + 2.0""").stripMargin,

    "q_asof_join" ->
      ("""SELECT l.event_id, l.user_id, epoch(l.ts) AS ts_epoch,
         | r.event_id AS cp_id, r.value AS cp_value
         |FROM events l ASOF LEFT JOIN
         | (SELECT user_id, ts, event_id, value FROM events
         |  WHERE event_id % 10 = 0) r
         | ON l.user_id = r.user_id AND l.ts >= r.ts""").stripMargin,

    "q_funnel" ->
      ("""WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
         |  WHERE event_type = 'view' GROUP BY 1),
         |c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e
         |  JOIN v ON e.user_id = v.user_id AND e.ts > v.v_ts
         |  WHERE e.event_type = 'click' GROUP BY 1),
         |p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e
         |  JOIN c ON e.user_id = c.user_id AND e.ts > c.c_ts
         |  WHERE e.event_type = 'purchase' GROUP BY 1)
         |SELECT (SELECT count(*) FROM v) AS n_view,
         |  (SELECT count(*) FROM c) AS n_click_after,
         |  (SELECT count(*) FROM p) AS n_purchase_after""").stripMargin,

    "q_cohort_retention" ->
      ("""WITH co AS (SELECT user_id,
         |    min(cast(floor(epoch(ts)/604800)*604800 AS bigint))
         |      AS cohort_wk
         |  FROM events WHERE event_type = 'signup' GROUP BY 1),
         |a AS (SELECT DISTINCT user_id,
         |    cast(floor(epoch(ts)/604800)*604800 AS bigint) AS act_wk
         |  FROM events)
         |SELECT cohort_wk,
         |  cast((act_wk - cohort_wk)/604800 AS int) AS week_offset,
         |  count(*) AS n_active
         |FROM a JOIN co USING (user_id)
         |WHERE act_wk >= cohort_wk GROUP BY 1, 2""").stripMargin,

    "q_event_transitions" ->
      ("""WITH seq AS (SELECT user_id, event_type,
         |    lead(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS next_type
         |  FROM events),
         |t AS (SELECT event_type, next_type, count(*) AS n FROM seq
         |  WHERE next_type IS NOT NULL GROUP BY 1, 2)
         |SELECT event_type, next_type, n,
         |  (n*1000000) // cast(sum(n) OVER (PARTITION BY event_type)
         |    AS bigint) AS p_micro
         |FROM t""").stripMargin,

    "q_dq_checks" ->
      ("""SELECT 'orders.o_orderkey.unique' AS check_name,
         |  cast(count(*) AS bigint) AS n_checked,
         |  cast(count(*) - count(DISTINCT o_orderkey) AS bigint)
         |    AS n_violations,
         |  count(*) - count(DISTINCT o_orderkey) = 0 AS pass FROM orders
         |UNION ALL
         |SELECT 'orders.o_custkey.not_null', cast(count(*) AS bigint),
         |  cast(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
         |    AS bigint),
         |  sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0
         |FROM orders
         |UNION ALL
         |SELECT 'orders.o_custkey.fk_customer', cast(count(*) AS bigint),
         |  cast(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
         |    AS bigint),
         |  sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) = 0
         |FROM orders o LEFT JOIN
         |  (SELECT DISTINCT c_custkey FROM customer) c
         |  ON o.o_custkey = c.c_custkey
         |UNION ALL
         |SELECT 'lineitem.l_quantity.range_1_50', cast(count(*) AS bigint),
         |  cast(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
         |    THEN 1 ELSE 0 END) AS bigint),
         |  sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
         |    THEN 1 ELSE 0 END) = 0
         |FROM lineitem
         |UNION ALL
         |SELECT 'events.value.non_negative', cast(count(*) AS bigint),
         |  cast(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS bigint),
         |  sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) = 0
         |FROM events""").stripMargin,

    "q_ts_similarity" ->
      ("""WITH series AS (SELECT user_id, epoch_us(ts) AS us, event_id,
         |    cast(floor(value*100 + 0.5) AS bigint) AS c0,
         |    row_number() OVER w AS idx,
         |    lead(cast(floor(value*100 + 0.5) AS bigint), 1) OVER w AS c1,
         |    lead(cast(floor(value*100 + 0.5) AS bigint), 2) OVER w AS c2,
         |    lead(cast(floor(value*100 + 0.5) AS bigint), 3) OVER w AS c3,
         |    lead(cast(floor(value*100 + 0.5) AS bigint), 4) OVER w AS c4,
         |    lead(cast(floor(value*100 + 0.5) AS bigint), 5) OVER w AS c5,
         |    lead(cast(floor(value*100 + 0.5) AS bigint), 6) OVER w AS c6,
         |    lead(cast(floor(value*100 + 0.5) AS bigint), 7) OVER w AS c7
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |full_ AS (SELECT * FROM series WHERE c7 IS NOT NULL),
         |q AS (SELECT c0 AS q0, c1 AS q1, c2 AS q2, c3 AS q3, c4 AS q4,
         |    c5 AS q5, c6 AS q6, c7 AS q7
         |  FROM full_ WHERE idx = 1
         |    AND user_id = (SELECT min(user_id) FROM events))
         |SELECT user_id, us AS start_us,
         |  (c0-q0)*(c0-q0) + (c1-q1)*(c1-q1) + (c2-q2)*(c2-q2)
         |  + (c3-q3)*(c3-q3) + (c4-q4)*(c4-q4) + (c5-q5)*(c5-q5)
         |  + (c6-q6)*(c6-q6) + (c7-q7)*(c7-q7) AS dist2
         |FROM full_, q
         |ORDER BY dist2, user_id, start_us
         |LIMIT 10""").stripMargin,

    "q_trend_slope" ->
      ("""WITH ev AS (SELECT event_type, epoch_us(ts) AS us,
         |    cast(floor(value*100 + 0.5) AS bigint) AS y FROM events),
         |lo AS (SELECT min(us) AS lo FROM ev),
         |t AS (SELECT event_type, (us - lo) // 3600000000 AS x, y
         |  FROM ev, lo),
         |a AS (SELECT event_type, cast(count(*) AS bigint) AS n,
         |    cast(sum(x) AS bigint) AS sx, cast(sum(y) AS bigint) AS sy,
         |    cast(sum(x*y) AS bigint) AS sxy,
         |    cast(sum(x*x) AS bigint) AS sxx
         |  FROM t GROUP BY 1)
         |SELECT event_type, n, sx, sy, sxy, sxx,
         |  n*sxy - sx*sy AS slope_num, n*sxx - sx*sx AS slope_den
         |FROM a""").stripMargin,

    "q_concurrency" ->
      ("""WITH ev AS (SELECT user_id, epoch_us(ts) AS us, event_id
         |  FROM events),
         |l AS (SELECT user_id, us, event_id, lag(us) OVER
         |    (PARTITION BY user_id ORDER BY us, event_id) AS prev
         |  FROM ev),
         |g AS (SELECT user_id, us,
         |    CASE WHEN prev IS NULL OR us - prev > 1800000000
         |      THEN 1 ELSE 0 END AS is_start,
         |    event_id FROM l),
         |sg AS (SELECT user_id, us,
         |    sum(is_start) OVER (PARTITION BY user_id
         |      ORDER BY us, event_id) AS sid
         |  FROM g),
         |sess AS (SELECT user_id, sid, min(us) AS start_us,
         |    max(us) + 1 AS end_us
         |  FROM sg GROUP BY 1, 2),
         |deltas AS (SELECT start_us AS us, cast(1 AS bigint) AS delta
         |    FROM sess
         |  UNION ALL
         |  SELECT end_us, cast(-1 AS bigint) FROM sess)
         |SELECT us, delta,
         |  cast(sum(delta) OVER (ORDER BY us, delta
         |    ROWS UNBOUNDED PRECEDING) AS bigint) AS concurrent
         |FROM deltas""").stripMargin,

    "q_upsert" ->
      ("""WITH ev AS (SELECT user_id, event_type,
         |    cast(floor(value*100 + 0.5) AS bigint) AS cents,
         |    epoch_us(ts) AS us, event_id FROM events),
         |span AS (SELECT min(us) + (max(us) - min(us)) * 7 // 10 AS cut
         |  FROM ev),
         |snap AS (SELECT user_id, event_type AS s_type, cents AS s_cents,
         |    us AS s_us
         |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
         |      ORDER BY us DESC, event_id DESC) AS rn
         |    FROM ev, span WHERE us <= cut) WHERE rn = 1),
         |chg AS (SELECT user_id, event_type AS c_type, cents AS c_cents,
         |    us AS c_us
         |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
         |      ORDER BY us DESC, event_id DESC) AS rn
         |    FROM ev, span WHERE us > cut) WHERE rn = 1)
         |SELECT coalesce(s.user_id, c.user_id) AS user_id,
         |  coalesce(c_type, s_type) AS event_type,
         |  coalesce(c_cents, s_cents) AS cents,
         |  coalesce(c_us, s_us) AS us,
         |  CASE WHEN s_us IS NULL THEN 'insert'
         |       WHEN c_us IS NULL THEN 'keep'
         |       ELSE 'update' END AS action
         |FROM snap s FULL OUTER JOIN chg c
         |  ON s.user_id = c.user_id""").stripMargin,

    "q_range_window" ->
      ("""SELECT event_id, user_id, epoch_us(ts) AS us,
         |  cast(sum(cast(floor(value*100 + 0.5) AS bigint)) OVER w
         |    AS bigint) AS roll_cents,
         |  cast(count(*) OVER w AS bigint) AS roll_n
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
         |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""")
        .stripMargin,

    "q_column_stats" ->
      ("""WITH ev AS (SELECT event_id, user_id, event_type,
         |    cast(floor(value*100 + 0.5) AS bigint) AS cents,
         |    epoch_us(ts) AS us FROM events),
         |n AS (SELECT cast(count(*) AS bigint) AS n_rows FROM ev)
         |SELECT 'event_id' AS column_name, n_rows,
         |  n_rows - count(event_id) AS n_null,
         |  cast(count(DISTINCT event_id) AS bigint) AS ndv,
         |  cast(min(event_id) AS varchar) AS min_str,
         |  cast(max(event_id) AS varchar) AS max_str FROM ev, n
         |GROUP BY n_rows
         |UNION ALL
         |SELECT 'user_id', n_rows, n_rows - count(user_id),
         |  cast(count(DISTINCT user_id) AS bigint),
         |  cast(min(user_id) AS varchar), cast(max(user_id) AS varchar)
         |FROM ev, n GROUP BY n_rows
         |UNION ALL
         |SELECT 'event_type', n_rows, n_rows - count(event_type),
         |  cast(count(DISTINCT event_type) AS bigint),
         |  min(event_type), max(event_type) FROM ev, n GROUP BY n_rows
         |UNION ALL
         |SELECT 'cents', n_rows, n_rows - count(cents),
         |  cast(count(DISTINCT cents) AS bigint),
         |  cast(min(cents) AS varchar), cast(max(cents) AS varchar)
         |FROM ev, n GROUP BY n_rows
         |UNION ALL
         |SELECT 'us', n_rows, n_rows - count(us),
         |  cast(count(DISTINCT us) AS bigint),
         |  cast(min(us) AS varchar), cast(max(us) AS varchar)
         |FROM ev, n GROUP BY n_rows""").stripMargin,

    "q_scd2" ->
      ("""WITH isl AS (SELECT user_id, event_type,
         |    epoch_us(ts) AS us, event_id,
         |    row_number() OVER (PARTITION BY user_id
         |        ORDER BY ts, event_id)
         |      - row_number() OVER (PARTITION BY user_id, event_type
         |        ORDER BY ts, event_id) AS island
         |  FROM events),
         |runs AS (SELECT user_id, event_type, island,
         |    min(us) AS valid_from_us,
         |    cast(count(*) AS bigint) AS n_events
         |  FROM isl GROUP BY 1, 2, 3)
         |SELECT user_id, event_type, valid_from_us,
         |  lead(valid_from_us) OVER (PARTITION BY user_id
         |    ORDER BY valid_from_us, event_type, island) AS valid_to_us,
         |  n_events,
         |  lead(valid_from_us) OVER (PARTITION BY user_id
         |    ORDER BY valid_from_us, event_type, island) IS NULL
         |    AS is_current
         |FROM runs""").stripMargin,

    "q_incremental_agg" ->
      ("""WITH base AS (SELECT event_type, cast(count(*) AS bigint) AS n,
         |    cast(sum(cast(floor(value*100 + 0.5) AS bigint)) AS bigint)
         |      AS cents
         |  FROM events WHERE event_id % 10 <> 0 GROUP BY 1),
         |delta AS (SELECT event_type, cast(count(*) AS bigint) AS n,
         |    cast(sum(cast(floor(value*100 + 0.5) AS bigint)) AS bigint)
         |      AS cents
         |  FROM events WHERE event_id % 10 = 0 GROUP BY 1),
         |merged AS (SELECT coalesce(b.event_type, d.event_type)
         |      AS event_type,
         |    coalesce(b.n, 0) + coalesce(d.n, 0) AS n_merged,
         |    coalesce(b.cents, 0) + coalesce(d.cents, 0) AS cents_merged
         |  FROM base b FULL OUTER JOIN delta d
         |    ON b.event_type = d.event_type),
         |full_ AS (SELECT event_type, cast(count(*) AS bigint) AS n_full,
         |    cast(sum(cast(floor(value*100 + 0.5) AS bigint)) AS bigint)
         |      AS cents_full
         |  FROM events GROUP BY 1)
         |SELECT coalesce(m.event_type, f.event_type) AS event_type,
         |  m.n_merged, m.cents_merged,
         |  m.n_merged = f.n_full AND m.cents_merged = f.cents_full
         |    AS consistent
         |FROM merged m FULL OUTER JOIN full_ f
         |  ON m.event_type = f.event_type""").stripMargin,

    "q_anomaly_zscore" ->
      ("""WITH t AS (SELECT event_id, event_type,
         |    cast(floor(value*100 + 0.5) AS bigint) AS c, ts
         |  FROM events),
         |w AS (SELECT event_id, event_type, c,
         |    cast(count(*) OVER win AS bigint) AS n,
         |    cast(sum(c) OVER win AS bigint) AS s,
         |    cast(sum(c*c) OVER win AS bigint) AS q
         |  FROM t
         |  WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
         |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
         |SELECT event_id, event_type, c AS cents,
         |  c*n - s AS dev, n*q - s*s AS var_n2
         |FROM w
         |WHERE n = 7 AND (c*n - s)*(c*n - s) > 4*(n*q - s*s)""").stripMargin,

    "q_bucketed_join" ->
      ("""SELECT o.o_orderpriority,
         |  cast(count(*) AS bigint) AS n_items,
         |  cast(sum(cast(floor(
         |    l.l_extendedprice*(1 - l.l_discount)*100 + 0.5) AS bigint))
         |    AS bigint) AS rev_cents
         |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |GROUP BY 1""").stripMargin,

    "q_salted_join" ->
      ("""SELECT o.o_orderpriority,
         |  cast(count(*) AS bigint) AS n_items,
         |  cast(sum(cast(floor(
         |    l.l_extendedprice*(1 - l.l_discount)*100 + 0.5) AS bigint))
         |    AS bigint) AS rev_cents
         |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |GROUP BY 1""").stripMargin,

    "q_rfm" ->
      ("""WITH per AS (SELECT user_id, max(epoch_us(ts)) AS last_us,
         |    cast(count(*) AS bigint) AS frequency,
         |    cast(sum(cast(floor(value*100 + 0.5) AS bigint)) AS bigint)
         |      AS monetary_cents
         |  FROM events GROUP BY 1),
         |ref AS (SELECT max(epoch_us(ts)) AS ref_us FROM events),
         |base AS (SELECT user_id, ref_us - last_us AS recency_us,
         |    frequency, monetary_cents FROM per, ref),
         |scored AS (SELECT user_id, recency_us, frequency, monetary_cents,
         |    cast(ntile(5) OVER (ORDER BY recency_us, user_id) AS int)
         |      AS r_score,
         |    cast(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS int)
         |      AS f_score,
         |    cast(ntile(5) OVER (ORDER BY monetary_cents DESC, user_id)
         |      AS int) AS m_score
         |  FROM base)
         |SELECT user_id, recency_us, frequency, monetary_cents,
         |  r_score, f_score, m_score,
         |  r_score*100 + f_score*10 + m_score AS rfm FROM scored""")
        .stripMargin,

    "q_promo_share" ->
      (s"""SELECT ${rs("cast(promo_cents AS double)*100/total_cents")}
          | AS promo_pct FROM (
          | SELECT ${centsSql(
             "CASE WHEN p_type='PROMO' THEN l_extendedprice*(1-l_discount) " +
             "ELSE 0 END")} AS promo_cents,
          | $revCents AS total_cents
          | FROM lineitem JOIN part ON l_partkey = p_partkey
          | WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          |  AND l_shipdate < TIMESTAMP '1998-01-01')""".stripMargin))
}
