package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryGroup, Tables}
import graft.functions.Exact
import graft.operators.{AsOfJoin, Spread}

/** Relational capabilities beyond the reference's authored surface that
  * SURVEY §2 notes as "free in Spark" (grouping sets, ranking/lead-lag,
  * semi/anti joins, sketches, JSON) — implemented as first-class,
  * oracle-checked queries so the engine's completeness is demonstrated,
  * not asserted.
  */
object AdvancedQueries extends QueryGroup {

  /** CUBE over (status, priority) — grouping-set aggregation. Subtotal
    * rows' NULL keys are coalesced to '(all)' so results sort stably in
    * any comparator (and both engines emit the identical sentinel). */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    groupingSetsFromLeaf(Tables.orders(spark, dir),
      "o_orderstatus", "o_orderpriority", col("o_totalprice"),
      Seq((true, true), (true, false), (false, true), (false, false)))
      .select(coalesce(col("o_orderstatus"), lit("(all)")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("o_orderpriority"),
        col("n"), col("__sum").cast("double").as("total"))

  /** Cube/rollup via LEAF RE-AGGREGATION instead of the builtin
    * operators: the builtin plan Expands EVERY INPUT ROW once per
    * grouping set before the partial aggregate (3-4x the scan-side CPU
    * — at 100 TB, petabytes of rows through Expand), while COUNT and
    * the decimal-exact SUM are algebraic, so the coarser sets re-fold
    * EXACTLY from the finest (a, b) leaf. Plan: ONE full-data
    * aggregate to the leaf (the only data-sized exchange), then Expand
    * over the LEAF-SIZED result (dozens of rows) and a second, bounded
    * aggregate. Bit-identical to the builtin: decimal addition is
    * associative, and the final decimal→double cast happens once at
    * the end (the [[Exact]] contract).
    *
    * `sets` lists (keepA, keepB) per grouping set; dropped keys become
    * NULL like the builtin (group keys here are non-null by schema, so
    * set-NULL cannot collide with data NULL). Output: a, b, `n`,
    * `__sum` (still decimal — callers cast). */
  private def groupingSetsFromLeaf(df: DataFrame, aName: String,
      bName: String, value: Column,
      sets: Seq[(Boolean, Boolean)]): DataFrame = {
    val aT = df.schema(aName).dataType.catalogString
    val bT = df.schema(bName).dataType.catalogString
    val leaf = df.groupBy(col(aName), col(bName))
      .agg(count(lit(1)).as("__n"),
        sum(value.cast(Exact.DecimalT)).as("__s"))
    leaf.select(explode(array(sets.map { case (ka, kb) =>
        struct(
          (if (ka) col(aName) else lit(null).cast(aT)).as("a"),
          (if (kb) col(bName) else lit(null).cast(bT)).as("b"))
      }: _*)).as("__g"), col("__n"), col("__s"))
      .select(col("__g.a").as(aName), col("__g.b").as(bName),
        col("__n"), col("__s"))
      .groupBy(aName, bName)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("__sum"))
  }

  /** Explicit GROUPING SETS — the general form cube/rollup compile to,
    * through the SQL front-end (an asymmetric set list neither shortcut
    * can express), with grouping_id disambiguating real NULL group keys
    * from the super-aggregate rows. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("__graft_gs_orders")
    spark.sql(
      s"""SELECT o_orderstatus, o_orderpriority,
         |  CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT)
         |    AS gid,
         |  COUNT(*) AS n,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)
         |    AS total
         |FROM __graft_gs_orders
         |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
         |  (o_orderstatus), ())""".stripMargin)
  }

  /** Null-SAFE join semantics — the cross-engine trap: an equi-join on
    * a nullable key silently drops every null-keyed row; the null-safe
    * operator (`<=>` / IS NOT DISTINCT FROM) matches nulls to nulls.
    * Keys are nulled deterministically (every 7th order) so both
    * behaviors are visible in one result. */
  def nullSafeJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderkey"),
      when(col("o_orderkey") % 7 === 0, lit(null))
        .otherwise(col("o_orderpriority")).as("pri"))
    val dim = Tables.orders(spark, dir).select(col("o_orderpriority"))
      .distinct()
      .select(when(col("o_orderpriority") === "1-URGENT", lit(null))
        .otherwise(col("o_orderpriority")).as("pri"),
        col("o_orderpriority").as("pri_label"))
    o.join(dim, o("pri") <=> dim("pri"))
      .select(col("o_orderkey"), col("pri_label"))
  }

  /** ROLLUP over (returnflag, linestatus) — leaf re-aggregation form
    * (see [[groupingSetsFromLeaf]]): one full-data exchange instead of
    * Expand x3 over every input row. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    groupingSetsFromLeaf(Tables.lineitem(spark, dir),
      "l_returnflag", "l_linestatus", col("l_quantity"),
      Seq((true, true), (true, false), (false, false)))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("l_linestatus"),
        col("n"), col("__sum").cast("double").as("qty"))

  /** lead/lag over each customer's order sequence (deterministic
    * tie-break on the unique key). */
  def leadLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderkey"),
      coalesce(lag(col("o_totalprice"), 1).over(w), lit(-1.0))
        .as("prev_price"),
      coalesce(datediff(lead(to_date(col("o_orderdate")), 1).over(w),
        to_date(col("o_orderdate"))), lit(-1)).as("next_gap_days"))
  }

  /** As-of lookup: per event, the most recent PRIOR 'error' event time
    * of the same user (ms precision — ns/µs-safe across engines). */
  /** Two-table as-of join: each order picks up the user's latest daily
    * event (right side pre-aggregated to one row per (user, day) so the
    * as-of is deterministic) — oracle is DuckDB's native ASOF JOIN. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val dailyEvents = Tables.events(spark, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("ev_day"))
      .agg(max(col("event_id")).as("ev_id"),
        max_by(col("value"), col("event_id")).as("ev_value"))
    val orders = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_custkey").as("user_id"),
      to_date(col("o_orderdate")).as("o_day"))
    AsOfJoin.lastBefore(orders, dailyEvents, "user_id",
      "o_day", "ev_day", Seq("ev_id", "ev_value"))
      .select(col("o_orderkey"), col("user_id"), col("o_day"),
        coalesce(col("last_ev_id"), lit(-1L)).as("last_ev_id"),
        coalesce(col("last_ev_value"), lit(-1.0)).as("last_ev_value"))
  }

  /** Data-quality expectations over events: every row-level rule costs
    * one conditional count in a single-scan aggregate; uniqueness is its
    * own tiny aggregation unioned on. */
  def dataExpectations(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Expect
    val e = Tables.events(spark, dir)
    Expect.check(e, Seq(
      Expect.notNull("event_id"),
      Expect.notNull("value"),
      Expect.inRange("value", -1e6, 1e6),
      Expect.inSet("event_type", // 'scroll' intentionally absent: the
        // rule must actually count violations on this data
        Seq("click", "view", "purchase", "error"))))
      .unionByName(Expect.unique(e, Seq("event_id")))
  }

  /** Exact-moment bivariate statistics: corr + sample covariance from
    * decimal-exact power sums (built-in corr/covar_samp are summation-
    * order-dependent doubles — irreproducible across engines AND across
    * partitionings; the closed form over exact sums is bit-stable). */
  def statsMoments(spark: SparkSession, dir: String): DataFrame = {
    val x = col("value")
    val y = col("user_id").cast("double")
    // Spread.up (keyless: only 4 event types — hashing on the group
    // key would use 4 of 32 cores): the six decimal power sums are the
    // kernel, single-threaded on a one-split scan otherwise; partials
    // fold to one row per (task, group) before the exchange.
    Spread.up(Tables.events(spark, dir))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        Exact.dsum(x).as("sx"), Exact.dsum(y).as("sy"),
        Exact.dsum(x * y).as("sxy"),
        Exact.dsum(x * x).as("sxx"), Exact.dsum(y * y).as("syy"))
      .select(col("event_type"), col("n"), {
        // degenerate-group guards mirror Exact.dvarSamp/dstddevSamp and
        // are duplicated verbatim in the oracle: n<2 → NULL, and a
        // non-positive variance term (constant column, or cancellation
        // driving it slightly negative) → NULL — DuckDB would otherwise
        // return inf or raise on sqrt(negative) where Spark yields
        // NULL/NaN, breaking hash parity exactly when data degenerates
        when(col("n") < 2, lit(null).cast("double"))
          .otherwise((col("sxy") - col("sx") * col("sy") / col("n")) /
            (col("n") - 1)).as("covar_samp")
      }, {
        val varx = col("n") * col("sxx") - col("sx") * col("sx")
        val vary = col("n") * col("syy") - col("sy") * col("sy")
        when(col("n") < 2 || varx <= 0 || vary <= 0,
          lit(null).cast("double"))
          .otherwise((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(varx) * sqrt(vary))).as("corr")
      })
  }

  /** Batch sessionization (gaps-and-islands): a new session starts when
    * the gap to the previous event exceeds 30 min; sessions then
    * aggregate. One window (lag + running sum share the sort) + one
    * hash aggregate — the batch twin of the streaming session_window. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")), col("event_id"))
    // Spread.up by user: the repartition satisfies the window AND the
    // session aggregate (guide §2.4/§2.5 — one-split events scan)
    Spread.up(Tables.events(spark, dir), col("user_id"))
      .withColumn("__us", unix_micros(col("ts")))
      .withColumn("__gap_new",
        when(col("__us") - lag(col("__us"), 1).over(w) > 1800L * 1000000L
          || lag(col("__us"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("__gap_new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        expr("min(__us) div 1000").as("start_ms"),
        expr("max(__us) div 1000").as("end_ms"),
        Exact.dsum(col("value")).as("session_value"))
  }

  def asofPrevError(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .withColumn("__prev_us",
        max(when(col("event_type") === "error", unix_micros(col("ts"))))
          .over(w))
      // integer division: '/' would round on the oracle side (DuckDB
      // BIGINT '/' yields DOUBLE and CAST rounds; Spark cast truncates)
      .select(col("event_id"), col("user_id"),
        coalesce(expr("__prev_us div 1000"), lit(-1L)).as("prev_error_ms"))
  }

  /** Anti join: customers with no URGENT-priority order (every customer
    * has SOME order in the test data, so the filter keeps it non-empty
    * at every scale factor). */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority").startsWith("1"))
      .select(col("o_custkey").as("c_custkey"))
    Tables.customer(spark, dir)
      .join(o, Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  }

  /** JSON extraction from the events props column. */
  def jsonFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("int").as("k_val"))

  /** The VARIANT path (Spark 4's binary semi-structured type — parse
    * once, extract typed many times; at 100 TB the shredded-storage
    * replacement for per-query JSON string parsing): parse_json →
    * typed variant_get, a missing path through try_variant_get → NULL.
    * DuckDB reproduces the VALUES via its JSON extraction — the
    * encoding is engine-internal, the extraction contract is not. */
  def variantExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("__v", expr("parse_json(props)"))
      .select(
        col("event_id"),
        expr("variant_get(__v, '$.k', 'bigint')").as("k_big"),
        expr("variant_get(__v, '$.k', 'string')").as("k_str"),
        expr("try_variant_get(__v, '$.missing', 'bigint')").as("k_missing"))

  /** HLL sketch, made ORACLE-CHECKABLE despite estimator internals
    * being engine-specific: the sketch estimate itself cannot reproduce
    * in another engine, so the query emits the EXACT distinct plus a
    * `within_5pct` flag comparing sketch vs exact inside Spark; the
    * oracle computes the exact count and literal `true`. The row
    * hash-matches iff the sketch honors its error bound — a real
    * three-check green, not a `no_oracle` hole. Raw estimate accuracy
    * additionally spec-pinned (PlanShapeSpec).
    *
    * rsd is pinned to 0.01, NOT the 0.05 default: rsd is ONE standard
    * deviation, so a 5% contract over a 5% sketch is a coin flip at
    * scale — and the sf1 battery (200k distinct parts) caught exactly
    * that, the estimate drifting past 5% while the sf0.01/sf0.1 runs
    * had been lucky. At rsd=0.01 the 5% check is a ~5σ bound that
    * holds at every SF.
    *
    * Plan shape: the input is pre-DISTINCTed on (flag, partkey) and
    * both aggregates run over the distinct pairs — HLL is
    * duplicate-insensitive, so the estimate is identical, while the
    * expensive per-row sketch update touches only distinct values and
    * the mixed distinct/non-distinct aggregate's Expand (which doubles
    * every input row) disappears entirely. Measured at sf1: 34.6 s
    * (naive mixed form at rsd=0.01) → the distinct exchange + a
    * 2M-row sketch pass. */
  def hllDistinct(spark: SparkSession, dir: String): DataFrame =
    // NOT spread (measured 0.86 -> 1.11 s): the scan-stage partial
    // distinct reduces 600k rows to ~60k pairs before the exchange —
    // spreading would ship the raw rows (guide §2.3 "aggregate before
    // you shuffle" wins over kernel parallelism here)
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_partkey")).distinct()
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("__approx"),
        // count(col), not count(*): count_distinct ignores NULL keys,
        // so a NULL partkey must not count as one distinct value here
        // (TPC-H data never has one; other corpora can)
        count(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("__approx") - col("exact_parts")) <=
          col("exact_parts") * lit(0.05)).as("within_5pct"))

  /** MERGEABLE sketch workflow under the [[hllDistinct]] error-contract
    * pattern — the production shape for distinct counting at 100 TB:
    * per-DAY Datasketches HLL binaries (the rollup artifact a daily job
    * persists), merged across days with `hll_union_agg`, estimated
    * once. Merging sketches must agree with counting the union of the
    * raw data (to sketch accuracy) — the query checks that contract
    * inside Spark per user and emits the exact distinct + the flag; the
    * oracle computes the exact side and literal true. */
  def hllPartialMerge(spark: SparkSession, dir: String): DataFrame = {
    // Spread.up by user: one repartition serves the daily sketch agg,
    // the merge agg, the exact-distinct agg AND the join (all keyed
    // user_id) — parallel past the one-split events scan
    val ev = Spread.up(Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("event_type")), col("user_id"))
    val daily = ev.groupBy("user_id", "day")
      .agg(expr("hll_sketch_agg(event_type)").as("sk"))
    daily.groupBy("user_id")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("__merged"))
      .join(ev.groupBy("user_id")
        .agg(count_distinct(col("event_type")).as("exact_types")),
        Seq("user_id"))
      .select(col("user_id"), col("exact_types"),
        (abs(col("__merged") - col("exact_types")) <=
          greatest(col("exact_types") * lit(0.05), lit(1.0)))
          .as("within_5pct"))
  }

  /** Quantile sketch under the same error-contract pattern as
    * [[hllDistinct]]: the GK sketch estimate itself is engine-specific,
    * but its guarantee is a RANK error bound (ε = 1/accuracy = 1e-3
    * here), so the query checks — inside Spark — that the approximate
    * median lies between the exact 49th and 51st percentiles (implied
    * by any rank error ≤ 0.01) and emits the exact median plus the
    * flag; the oracle computes the exact median (bit-equal to DuckDB's
    * quantile_cont) and literal true. */
  def approxQuantile(spark: SparkSession, dir: String): DataFrame =
    // Spread.up (keyless: 3 return flags): parallelizes the percentile
    // sort-buffer partials past the one-split lineitem scan; partial
    // buffers merge map-side at the 3-key exchange as before
    Spread.up(Tables.lineitem(spark, dir)
        .select(col("l_returnflag"), col("l_extendedprice")))
      .groupBy(col("l_returnflag"))
      // ONE array-form exact percentile: all three rank points come out
      // of a single sort buffer (three scalar percentile aggs would
      // each buffer every value per group — 3× the merge work)
      .agg(expr("percentile(l_extendedprice, array(0.49, 0.5, 0.51))")
          .as("__p"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("__approx"))
      .select(col("l_returnflag"),
        col("__p").getItem(1).as("exact_median"),
        (col("__approx") >= col("__p").getItem(0) &&
          col("__approx") <= col("__p").getItem(2)).as("within_rank_1pct"))

  /** Weighted median/quartile of price, weighted by quantity, per
    * supplier — the reference's weighted-aggregate family extended to
    * percentiles (lower weighted quantile; window form, see
    * [[graft.functions.WeightedQuantile]]). */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame =
    graft.functions.WeightedQuantile.weightedQuantileByWindow(
      Tables.lineitem(spark, dir), Seq("l_suppkey"),
      col("l_extendedprice"), col("l_quantity"),
      Seq("wq1" -> 0.25, "wmed" -> 0.5, "wq3" -> 0.75))

  /** Fixed-width value histogram per event type. */
  def histogramQ(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Histogram(Tables.events(spark, dir),
      Seq("event_type"), col("value"), width = 25.0)

  /** Mergeable-quantile workflow ([[graft.operators.Histogram
    * .quantilesFromPartials]]): per-day histogram PARTIALS of event
    * values merged by bin, quantiles interpolated inside the rank's
    * bin — unlike hll/approx_quantile, this estimator is FULLY
    * deterministic, so the oracle replicates the estimate itself
    * bit-for-bit (not just an error contract). */
  def histQuantileMerge(spark: SparkSession, dir: String): DataFrame = {
    val partials = graft.operators.Histogram(
      Tables.events(spark, dir).withColumn("day", to_date(col("ts"))),
      Seq("day"), col("value"), width = 25.0)
    graft.operators.Histogram.quantilesFromPartials(
      partials, width = 25.0, origin = 0.0,
      qs = Seq(0.25, 0.5, 0.9, 0.99))
  }

  /** Pivot: order counts per year × status (fixed column set so the
    * schema is deterministic; missing cells coalesced to 0). */
  def pivotAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .select(col("yr"),
        coalesce(col("O"), lit(0L)).as("n_open"),
        coalesce(col("F"), lit(0L)).as("n_filled"),
        coalesce(col("P"), lit(0L)).as("n_pending"))

  /** Ordered collect: per customer, their order keys as a sorted CSV
    * string (collect_list is order-nondeterministic — array_sort makes
    * it comparable; string form avoids list-type compare quirks). */
  def arrayAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(concat_ws(",",
        array_sort(collect_list(col("o_orderkey")))).as("order_keys"),
        count(lit(1)).as("n_orders"))

  /** Count-min sketch rollup ([[graft.operators.CountMin]]): per-source
    * counter-grid partials, merged, then point-queried for every token
    * whose exact corpus count ≥ 10. The md5 bucket hash makes every
    * intermediate integer engine-exact, so the FULL workflow sits under
    * the oracle (vs HLL's opaque binaries, which get an error
    * contract). Output pins the sketch guarantee too: `cms_est` can
    * only overcount, so est ≥ exact row-by-row or the hash breaks. */
  def countMinMerge(spark: SparkSession, dir: String): DataFrame = {
    // ONE corpus shuffle: the token stream aggregates to per-(source,
    // token) occurrence counts immediately (map-side combinable), and
    // BOTH consumers — the weighted sketch partials and the exact
    // heavy-hitter counts — run over that vocabulary-sized frame. The
    // r11 form persisted the raw occurrence stream and exploded d=4
    // md5 rows per OCCURRENCE; that explode was the whole >2×-oracle
    // gap (adjudicated r12: 2.3–3.2× across three clean windows).
    // Persisted because vocabulary-sized and read twice.
    val tokCounts = Tables.documents(spark, dir)
      .select(col("source"),
        explode(graft.operators.TextStats.tokens(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sketch = graft.operators.CountMin.merge(
      graft.operators.CountMin.partialsWeighted(
        tokCounts, col("source"), col("w"), col("n")))
    val heavy = tokCounts.groupBy(col("w").as("token"))
      .agg(sum(col("n")).as("exact_n")).filter(col("exact_n") >= 10)
    graft.operators.CountMin.estimate(sketch, heavy, col("token"))
      .join(heavy, Seq("token"))
      .select(col("token"), col("exact_n"), col("cms_est"))
  }

  /** Calendar gap-fill + forward-fill: each user's daily value series
    * densified over their own [first, last] day span, holes carried
    * forward from the last observed day — the time-series resample step
    * every warehouse serves. Day value is `max_by(value, event_id)`
    * (deterministic "last write of the day"). Scale: the spine explode
    * is |user|×span rows into a user-keyed left join + one window —
    * everything keys on user_id, and the ffill window's state is one
    * value. */
  def gapFillFfill(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("value"), col("event_id"))
      .groupBy("user_id", "day")
      .agg(max_by(col("value"), col("event_id")).as("__v"))
    val spine = daily.groupBy("user_id")
      .agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
      .select(col("user_id"),
        explode(expr("sequence(__lo, __hi)")).as("day"))
    spine.join(daily, Seq("user_id", "day"), "left")
      .withColumn("value_ff",
        last(col("__v"), ignoreNulls = true).over(
          Window.partitionBy("user_id").orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("day"), col("value_ff"))
  }

  /** Explicit FULL OUTER join (the one join mode the battery exercised
    * only inside the catalog upsert): per (user, day), click counts vs
    * purchase counts — either side may be absent, absent sides coalesce
    * to 0. Keyed equi-join; at scale both sides shuffle on the same
    * key. */
  def fullOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("event_type"))
    def side(t: String, n: String) = ev.filter(col("event_type") === t)
      .groupBy("user_id", "day").agg(count(lit(1)).as(n))
    side("click", "n_clicks")
      .join(side("purchase", "n_purchases"), Seq("user_id", "day"),
        "full_outer")
      .select(col("user_id"), col("day"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
  }

  /** Unpivot (melt): the wide per-year status counts back to long form
    * — with [[pivotAgg]] this closes the reshape round-trip. Stateless
    * on top of the pivot aggregate (the melt itself adds no shuffle). */
  def unpivotLong(spark: SparkSession, dir: String): DataFrame =
    pivotAgg(spark, dir).unpivot(
      Array(col("yr")),
      Array(col("n_open"), col("n_filled"), col("n_pending")),
      "status", "n")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "count_min_merge" -> (countMinMerge _),
    "gap_fill_ffill" -> (gapFillFfill _),
    "full_outer_join" -> (fullOuterJoin _),
    "unpivot_long" -> (unpivotLong _),
    "pivot_agg" -> (pivotAgg _),
    "array_agg" -> (arrayAgg _),
    "histogram" -> (histogramQ _),
    "hist_quantile_merge" -> (histQuantileMerge _),
    "weighted_median" -> (weightedMedian _),
    "cube_agg" -> (cubeAgg _),
    "rollup_agg" -> (rollupAgg _),
    "grouping_sets" -> (groupingSets _),
    "null_safe_join" -> (nullSafeJoin _),
    "lead_lag" -> (leadLag _),
    "asof_prev_error" -> (asofPrevError _),
    "asof_join" -> (asofJoin _),
    "sessionize" -> (sessionize _),
    "stats_moments" -> (statsMoments _),
    "data_expectations" -> (dataExpectations _),
    "anti_join" -> (antiJoin _),
    "json_funcs" -> (jsonFuncs _),
    "variant_extract" -> (variantExtract _),
    "hll_distinct" -> (hllDistinct _),
    "hll_partial_merge" -> (hllPartialMerge _),
    "approx_quantile" -> (approxQuantile _))

  def oracles: Map[String, String] = {
    import Exact.sql._
    Map(
      // per-user calendar spine + IGNORE NULLS carry-forward; the day
      // value is max_by so both engines pick the identical double
      "gap_fill_ffill" ->
        """WITH daily AS (
          |  SELECT user_id, CAST(ts AS DATE) AS day,
          |    max_by("value", event_id) AS v
          |  FROM events GROUP BY 1, 2),
          |b AS (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi
          |      FROM daily GROUP BY 1),
          |spine AS (
          |  SELECT user_id, CAST(unnest(generate_series(
          |    CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
          |    INTERVAL 1 DAY)) AS DATE) AS day
          |  FROM b),
          |j AS (SELECT s.user_id, s.day, d.v
          |      FROM spine s LEFT JOIN daily d
          |        ON s.user_id = d.user_id AND s.day = d.day)
          |SELECT user_id, day,
          |  last_value(v IGNORE NULLS) OVER (
          |    PARTITION BY user_id ORDER BY day
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |    AS value_ff
          |FROM j""".stripMargin,
      "full_outer_join" ->
        """WITH ev AS (
          |  SELECT user_id, CAST(ts AS DATE) AS day, event_type
          |  FROM events),
          |c AS (SELECT user_id, day, COUNT(*) AS n_clicks FROM ev
          |      WHERE event_type = 'click' GROUP BY 1, 2),
          |p AS (SELECT user_id, day, COUNT(*) AS n_purchases FROM ev
          |      WHERE event_type = 'purchase' GROUP BY 1, 2)
          |SELECT user_id, day,
          |  COALESCE(n_clicks, 0) AS n_clicks,
          |  COALESCE(n_purchases, 0) AS n_purchases
          |FROM c FULL OUTER JOIN p USING (user_id, day)""".stripMargin,
      // the melt as its UNION ALL normal form (order-insensitive)
      "unpivot_long" ->
        """WITH p AS (
          |  SELECT CAST(year(o_orderdate) AS INT) AS yr,
          |    CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_open,
          |    CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_filled,
          |    CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n_pending
          |  FROM orders GROUP BY 1)
          |SELECT yr, 'n_open' AS status, n_open AS n FROM p
          |UNION ALL
          |SELECT yr, 'n_filled' AS status, n_filled AS n FROM p
          |UNION ALL
          |SELECT yr, 'n_pending' AS status, n_pending AS n FROM p""".stripMargin,
      // same md5("i:w")-prefix buckets, same counter grid, same
      // min-over-rows estimate — every integer engine-exact
      "count_min_merge" ->
        """WITH tok AS (
          |  SELECT source,
          |    unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\r]+')) AS w
          |  FROM documents),
          |hb AS (
          |  SELECT source, w, i,
          |    CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || w), 1, 6)
          |      AS BIGINT) % 256 AS b
          |  FROM tok CROSS JOIN range(0, 4) r(i)),
          |part AS (
          |  SELECT source, i AS h, b, COUNT(*) AS cnt
          |  FROM hb GROUP BY 1, 2, 3),
          |sk AS (
          |  SELECT h, b, CAST(SUM(cnt) AS BIGINT) AS cnt
          |  FROM part GROUP BY 1, 2),
          |heavy AS (
          |  SELECT w AS token, COUNT(*) AS exact_n
          |  FROM tok GROUP BY 1 HAVING COUNT(*) >= 10),
          |q AS (
          |  SELECT token, i,
          |    CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || token),
          |      1, 6) AS BIGINT) % 256 AS b
          |  FROM heavy CROSS JOIN range(0, 4) r(i)),
          |est AS (
          |  SELECT q.token, MIN(sk.cnt) AS cms_est
          |  FROM q JOIN sk ON q.i = sk.h AND q.b = sk.b
          |  GROUP BY 1)
          |SELECT heavy.token, heavy.exact_n, est.cms_est
          |FROM heavy JOIN est ON heavy.token = est.token""".stripMargin,
      "pivot_agg" ->
        """SELECT CAST(year(o_orderdate) AS INT) AS yr,
          |  CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_open,
          |  CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_filled,
          |  CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n_pending
          |FROM orders GROUP BY 1""".stripMargin,
      "array_agg" ->
        """SELECT o_custkey,
          |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys,
          |  COUNT(*) AS n_orders
          |FROM orders GROUP BY o_custkey""".stripMargin,
      "histogram" ->
        """SELECT event_type, bin, COUNT(*) AS n,
          |  bin * 25.0 + 0.0 AS bin_lo, (bin + 1) * 25.0 + 0.0 AS bin_hi
          |FROM (SELECT event_type,
          |  CAST(FLOOR(("value" - 0.0) / 25.0) AS BIGINT) AS bin
          |  FROM events) t
          |GROUP BY event_type, bin""".stripMargin,
      // the deterministic interpolation estimator replicated verbatim:
      // exact integer ranks, one double division, fixed IEEE op order
      // (constants CAST AS DOUBLE — the decimal-literal rule)
      "hist_quantile_merge" ->
        """WITH part AS (SELECT CAST(ts AS DATE) AS day,
          |    CAST(FLOOR(("value" - CAST(0 AS DOUBLE)) /
          |      CAST(25 AS DOUBLE)) AS BIGINT) AS bin,
          |    COUNT(*) AS n
          |  FROM events GROUP BY 1, 2),
          |m AS (SELECT bin, CAST(SUM(n) AS BIGINT) AS n
          |  FROM part GROUP BY 1),
          |c AS (SELECT bin, n, CAST(COALESCE(SUM(n) OVER (
          |    ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
          |    AND 1 PRECEDING), 0) AS BIGINT) AS cum_before FROM m),
          |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM m),
          |p AS (SELECT q, CAST(CEIL(q * total) AS BIGINT) AS rank,
          |    total
          |  FROM (VALUES (CAST(0.25 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
          |    (CAST(0.9 AS DOUBLE)), (CAST(0.99 AS DOUBLE))) v(q)
          |  CROSS JOIN t)
          |SELECT p.q,
          |  CAST(0 AS DOUBLE) + c.bin * CAST(25 AS DOUBLE) +
          |    CAST(25 AS DOUBLE) *
          |    (CAST(p.rank - c.cum_before AS DOUBLE) /
          |      CAST(c.n AS DOUBLE)) AS est,
          |  p.rank, p.total
          |FROM p JOIN c ON p.rank > c.cum_before
          |  AND p.rank <= c.cum_before + c.n""".stripMargin,
      "weighted_median" ->
        """WITH cw AS (
          |  SELECT l_suppkey, l_extendedprice AS v,
          |    SUM(l_quantity) OVER (PARTITION BY l_suppkey
          |      ORDER BY l_extendedprice
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
          |    SUM(l_quantity) OVER (PARTITION BY l_suppkey) AS tot_w
          |  FROM lineitem)
          |SELECT l_suppkey,
          |  MIN(CASE WHEN cum_w >= tot_w * 0.25 THEN v END) AS wq1,
          |  MIN(CASE WHEN cum_w >= tot_w * 0.5 THEN v END) AS wmed,
          |  MIN(CASE WHEN cum_w >= tot_w * 0.75 THEN v END) AS wq3
          |FROM cw GROUP BY l_suppkey""".stripMargin,
      "cube_agg" ->
        s"""SELECT COALESCE(o_orderstatus, '(all)') AS o_orderstatus,
           |  COALESCE(o_orderpriority, '(all)') AS o_orderpriority,
           |  COUNT(*) AS n,
           |  ${dsum("o_totalprice")} AS total
           |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
      "rollup_agg" ->
        s"""SELECT COALESCE(l_returnflag, '(all)') AS l_returnflag,
           |  COALESCE(l_linestatus, '(all)') AS l_linestatus,
           |  COUNT(*) AS n,
           |  ${dsum("l_quantity")} AS qty
           |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
      "lead_lag" ->
        """SELECT o_custkey, o_orderkey,
          |  COALESCE(LAG(o_totalprice, 1) OVER w, -1.0) AS prev_price,
          |  CAST(COALESCE(date_diff('day', CAST(o_orderdate AS DATE),
          |    LEAD(CAST(o_orderdate AS DATE), 1) OVER w), -1) AS INT) AS next_gap_days
          |FROM orders
          |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
      "asof_prev_error" ->
        """SELECT event_id, user_id,
          |  COALESCE(MAX(CASE WHEN event_type = 'error' THEN epoch_us(ts) END)
          |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) // 1000,
          |    -1) AS prev_error_ms
          |FROM events""".stripMargin,
      "data_expectations" ->
        """WITH base AS (SELECT COUNT(*) AS n,
          |  SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS v_id,
          |  SUM(CASE WHEN "value" IS NULL THEN 1 ELSE 0 END) AS v_val,
          |  SUM(CASE WHEN "value" IS NULL
          |    OR ("value" >= -1e6 AND "value" <= 1e6) THEN 0 ELSE 1 END) AS v_range,
          |  SUM(CASE WHEN event_type IS NULL
          |    OR event_type IN ('click','view','purchase','error')
          |    THEN 0 ELSE 1 END) AS v_set
          |  FROM events)
          |SELECT 'not_null_event_id' AS rule, n AS n_rows,
          |  CAST(v_id AS BIGINT) AS n_violations FROM base
          |UNION ALL SELECT 'not_null_value', n, CAST(v_val AS BIGINT) FROM base
          |UNION ALL SELECT 'range_value', n, CAST(v_range AS BIGINT) FROM base
          |UNION ALL SELECT 'in_set_event_type', n, CAST(v_set AS BIGINT) FROM base
          |UNION ALL SELECT 'unique_event_id',
          |  CAST(SUM(c) AS BIGINT), CAST(SUM(c - 1) AS BIGINT)
          |FROM (SELECT COUNT(*) AS c FROM events GROUP BY event_id) t""".stripMargin,
      "stats_moments" ->
        s"""WITH m AS (
           |  SELECT event_type, COUNT(*) AS n,
           |    ${dsum("\"value\"")} AS sx,
           |    ${dsum("CAST(user_id AS DOUBLE)")} AS sy,
           |    ${dsumStr("\"value\" * CAST(user_id AS DOUBLE)")} AS sxy,
           |    ${dsumStr("\"value\" * \"value\"")} AS sxx,
           |    ${dsum("CAST(user_id AS DOUBLE) * CAST(user_id AS DOUBLE)")} AS syy
           |  FROM events GROUP BY 1)
           |SELECT event_type, n,
           |  CASE WHEN n < 2 THEN NULL
           |       ELSE (sxy - sx * sy / n) / (n - 1) END AS covar_samp,
           |  CASE WHEN n < 2 OR (n * sxx - sx * sx) <= 0
           |         OR (n * syy - sy * sy) <= 0 THEN NULL
           |       ELSE (n * sxy - sx * sy) /
           |         (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
           |  END AS corr
           |FROM m""".stripMargin,
      "sessionize" ->
        s"""WITH g AS (
           |  SELECT user_id, event_id, epoch_us(ts) AS us, "value",
           |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts), 1)
           |        OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
           |        > 1800 * 1000000
           |      OR LAG(epoch_us(ts), 1)
           |        OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
           |        IS NULL
           |    THEN 1 ELSE 0 END AS gap_new
           |  FROM events),
           |s AS (
           |  SELECT user_id, us, "value",
           |    CAST(SUM(gap_new) OVER (PARTITION BY user_id
           |      ORDER BY us, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |      AS session_idx
           |  FROM g)
           |SELECT user_id, session_idx, COUNT(*) AS n_events,
           |  MIN(us) // 1000 AS start_ms, MAX(us) // 1000 AS end_ms,
           |  ${dsum("\"value\"")} AS session_value
           |FROM s GROUP BY 1, 2""".stripMargin,
      "asof_join" ->
        """WITH ev AS (
          |  SELECT user_id, CAST(ts AS DATE) AS ev_day,
          |    MAX(event_id) AS ev_id,
          |    max_by("value", event_id) AS ev_value
          |  FROM events GROUP BY 1, 2),
          |o AS (
          |  SELECT o_orderkey, o_custkey AS user_id,
          |    CAST(o_orderdate AS DATE) AS o_day
          |  FROM orders)
          |SELECT o.o_orderkey, o.user_id, o.o_day,
          |  COALESCE(ev.ev_id, -1) AS last_ev_id,
          |  COALESCE(ev.ev_value, -1.0) AS last_ev_value
          |FROM o ASOF LEFT JOIN ev
          |  ON o.user_id = ev.user_id AND ev.ev_day <= o.o_day""".stripMargin,
      "anti_join" ->
        """SELECT c_custkey, c_name FROM customer
          |WHERE NOT EXISTS (
          |  SELECT 1 FROM orders WHERE o_custkey = c_custkey
          |    AND o_orderpriority LIKE '1%')""".stripMargin,
      "json_funcs" ->
        """SELECT event_id,
          |  CAST(json_extract_string(props, '$.k') AS INT) AS k_val
          |FROM events""".stripMargin,
      "grouping_sets" ->
        """SELECT o_orderstatus, o_orderpriority,
          |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT)
          |    AS gid,
          |  COUNT(*) AS n,
          |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10)))
          |    AS VARCHAR) AS DOUBLE) AS total
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
          |  (o_orderstatus), ())""".stripMargin,
      "null_safe_join" ->
        """WITH o AS (SELECT o_orderkey,
          |    CASE WHEN o_orderkey % 7 = 0 THEN NULL
          |      ELSE o_orderpriority END AS pri
          |  FROM orders),
          |d AS (SELECT
          |    CASE WHEN o_orderpriority = '1-URGENT' THEN NULL
          |      ELSE o_orderpriority END AS pri,
          |    o_orderpriority AS pri_label
          |  FROM (SELECT DISTINCT o_orderpriority FROM orders))
          |SELECT o.o_orderkey, d.pri_label
          |FROM o JOIN d ON o.pri IS NOT DISTINCT FROM d.pri"""
          .stripMargin,
      "variant_extract" ->
        """SELECT event_id,
          |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_big,
          |  json_extract_string(props, '$.k') AS k_str,
          |  CAST(json_extract(props, '$.missing') AS BIGINT) AS k_missing
          |FROM events""".stripMargin,
      // the sketch estimate is engine-specific; the contract it must
      // honor (≤5% error vs exact) is checked INSIDE Spark and the flag
      // compared to a literal true — see hllDistinct scaladoc
      "hll_distinct" ->
        """SELECT l_returnflag,
          |  COUNT(DISTINCT l_partkey) AS exact_parts,
          |  TRUE AS within_5pct
          |FROM lineitem GROUP BY 1""".stripMargin,
      // merged-sketch contract checked in Spark (see scaladoc)
      "hll_partial_merge" ->
        """SELECT user_id,
          |  COUNT(DISTINCT event_type) AS exact_types,
          |  TRUE AS within_5pct
          |FROM events GROUP BY 1""".stripMargin,
      // GK-sketch rank-error contract checked in Spark (see scaladoc);
      // Spark-semantics median (equal-straddle shortcut), not
      // quantile_cont — see Exact.sql.sparkPercentile
      "approx_quantile" ->
        s"""WITH g AS (
           |  SELECT l_returnflag,
           |    list_sort(list(l_extendedprice)
           |      FILTER (l_extendedprice IS NOT NULL)) AS l,
           |    COUNT(l_extendedprice) AS n
           |  FROM lineitem GROUP BY 1)
           |SELECT l_returnflag,
           |  ${Exact.sql.sparkPercentile("l", "n", "0.5")} AS exact_median,
           |  TRUE AS within_rank_1pct
           |FROM g""".stripMargin)
  }
}
