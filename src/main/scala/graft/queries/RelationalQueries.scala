package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryGroup, Tables}
import graft.functions.Exact
import graft.operators._

/** Filters, joins, set ops, top-k, scalar functions — the SURVEY §2.2/2.3/
  * §2.6/2.7/2.8 surface expressed on the driver test tables (mapping in
  * /root/repo/FIXTURES.md §A).
  */
object RelationalQueries extends QueryGroup {

  /** P1 clip: dimension-filtered semi-join (customers in region ASIA),
    * the relational form of `geo_clip_raster_by_polygon` STUSPS=="MI". */
  def p1Clip(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .select(col("n_nationkey").as("c_nationkey"))
    Clip.semiOn(Tables.customer(spark, dir), dim, lit(true), "c_nationkey")
  }

  /** P2 mask: pointwise include-values predicate → 1.0/0.0. */
  def p2Mask(spark: SparkSession, dir: String): DataFrame =
    ValueMask(Tables.events(spark, dir), col("event_type"),
      Seq("click", "purchase"))
      .select(col("event_id"), col("event_type"), col("mask"))

  /** P5: day key recovered from a PRISM-style filename via regex. */
  def p5FilenameDay(spark: SparkSession, dir: String): DataFrame = {
    val named = Tables.orders(spark, dir).withColumn("fname",
      concat(lit("PRISM_ppt_stable_4kmD2_"),
        date_format(col("o_orderdate"), "yyyyMMdd"), lit("_bil.tif")))
    PathDay.fromColumn(named, col("fname"))
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
  }

  /** J1: broadcast multiply-join (lineitem × part price), aggregated. */
  def j1Multiply(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .select(col("p_partkey").as("l_partkey"), col("p_brand"),
        col("p_retailprice"))
    MultiplyJoin(Tables.lineitem(spark, dir), part, Seq("l_partkey"),
      col("l_quantity"), col("p_retailprice"))
      .groupBy(col("p_brand"))
      .agg(Exact.dsum(col("weighted")).as("qty_price"),
        count(lit(1)).as("n_lines"))
  }

  /** S6: schema-aligned union of two differently-shaped slices. */
  def s6Combine(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val a = o.filter(year(col("o_orderdate")) === 1995)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        lit("a").as("src"))
    val b = o.filter(year(col("o_orderdate")) === 1996)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        lit("b").as("src"))
    Combine.unionAll(Seq(a, b))
  }

  /** Skew-mitigation (SURVEY §7.7): two-phase salted aggregate. The salt
    * spreads a hot group key over `salts` reducers; decimal partials make
    * the re-aggregation bit-equal to the unsalted sum, which is exactly
    * what the oracle computes — the query PROVES salting preserves
    * answers. */
  def saltedSum(spark: SparkSession, dir: String): DataFrame =
    Skew.saltedSum(Tables.lineitem(spark, dir), Seq("l_suppkey"),
      col("l_extendedprice"), col("l_orderkey"), salts = 8, "sum_price")

  /** Skew-mitigation: salted equi-join (dim replicated per salt) feeding
    * the same aggregate as [[j1Multiply]] — oracle-equal to the plain
    * join, proving the rewrite is answer-preserving. */
  def saltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .select(col("p_partkey").as("l_partkey"), col("p_brand"),
        col("p_retailprice"))
    Skew.saltedJoin(Tables.lineitem(spark, dir), part, "l_partkey",
      col("l_orderkey"), salts = 8)
      .groupBy(col("p_brand"))
      .agg(Exact.dsum(col("l_quantity") * col("p_retailprice")).as("qty_price"),
        count(lit(1)).as("n_lines"))
  }

  /** Interval join as a bin equi-join (no theta/nested-loop plan):
    * orders priced into overlapping price bands. Aggregated per band so
    * the result is compact and the residual filter is fully exercised. */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val bands = spark.range(0, 20).select(
      col("id").as("band"),
      (col("id") * 20000.0).as("lo"),
      (col("id") * 20000.0 + 30000.0).as("hi"))
    RangeJoin.binned(
      Tables.orders(spark, dir).select("o_orderkey", "o_totalprice"),
      "o_totalprice", bands, "lo", "hi", binWidth = 20000.0)
      .groupBy("band")
      .agg(count(lit(1)).as("n_orders"),
        Exact.dsum(col("o_totalprice")).as("total_price"))
  }

  /** Exact corpus-wide top-k frequent tokens (explode → count → top-k,
    * tie-broken by token). */
  def tokenTopk(spark: SparkSession, dir: String): DataFrame =
    TopK.global(
      Tables.documents(spark, dir)
        .select(explode(TextStats.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n")),
      Seq(col("n").desc, col("token").asc), 20)

  /** §2.6 top-k per group with deterministic tie-break. */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame =
    TopK.perGroup(
      Tables.orders(spark, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
      Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)

  /** §2.6 global sort + limit (tie-broken by unique key). */
  def sortLimit(spark: SparkSession, dir: String): DataFrame =
    TopK.global(
      Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_totalprice"),
          to_date(col("o_orderdate")).as("o_day")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 10)

  /** §2.7 INTERSECT: customers with both open and filled orders. */
  def setIntersect(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.filter(col("o_orderstatus") === "O").select("o_custkey")
      .intersect(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
  }

  /** §2.7 EXCEPT: customers with open but no filled orders. */
  def setExcept(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.filter(col("o_orderstatus") === "O").select("o_custkey")
      .except(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
  }

  /** §2.7 bag-semantics set ops: EXCEPT ALL keeps multiplicity
    * (a customer with 3 open and 1 filled order survives twice) —
    * a different physical operator than the DISTINCT forms above.
    * Counted output keeps the result deterministic to compare. */
  def setExceptAll(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.filter(col("o_orderstatus") === "O").select("o_custkey")
      .exceptAll(o.filter(col("o_orderstatus") === "F")
        .select("o_custkey"))
      .groupBy("o_custkey").agg(count(lit(1)).as("n_surviving"))
  }

  /** Correlated scalar subqueries through the SQL front-end — Catalyst
    * decorrelates each into an aggregate + EQUI-join (no per-row
    * re-execution), the scale-safe form. The correlation must stay
    * equality-only: an inequality-correlated aggregate decorrelates to
    * a nested-loop join over the value domain (measured: quadratic in
    * distinct prices — a scale-killer), and that shape belongs to
    * window functions instead ([[windowFuncs]]). */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir)
      .createOrReplaceTempView("__graft_sq_customer")
    Tables.orders(spark, dir)
      .createOrReplaceTempView("__graft_sq_orders")
    spark.sql(
      """SELECT c_custkey,
        |  (SELECT COUNT(*) FROM __graft_sq_orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  (SELECT COALESCE(MAX(o_totalprice), -1.0)
        |   FROM __graft_sq_orders o
        |   WHERE o.o_custkey = c.c_custkey) AS max_price
        |FROM __graft_sq_customer c""".stripMargin)
  }

  /** §2.5 rank-based window battery: ntile/percent_rank/cume_dist plus
    * a running count, all sharing ONE window ordering (single sort). */
  def windowFuncs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("ntile_4", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .withColumn("run_n",
        count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("long"))
  }

  /** §2.8 scalar string/date/math battery (all exact types). */
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      lpad(col("o_orderkey").cast("string"), 12, "0").as("padded"),
      concat_ws("-", col("o_orderstatus"),
        upper(substring(col("o_orderpriority"), 1, 8))).as("tagged"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("day_str"),
      dayofyear(col("o_orderdate")).as("doy"),
      month(col("o_orderdate")).as("mth"),
      (col("o_orderkey") % 7).as("mod7"),
      when(col("o_orderpriority").startsWith("1"), "urgent")
        .when(col("o_orderpriority").startsWith("2"), "high")
        .otherwise("normal").as("prio_class"),
      length(col("o_orderpriority")).as("prio_len"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_clip" -> (p1Clip _),
    "p2_mask" -> (p2Mask _),
    "p5_filename_day" -> (p5FilenameDay _),
    "j1_multiply" -> (j1Multiply _),
    "s6_combine" -> (s6Combine _),
    "salted_sum" -> (saltedSum _),
    "salted_join" -> (saltedJoin _),
    "range_join" -> (rangeJoin _),
    "token_topk" -> (tokenTopk _),
    "window_funcs" -> (windowFuncs _),
    "topk_per_group" -> (topkPerGroup _),
    "sort_limit" -> (sortLimit _),
    "set_intersect" -> (setIntersect _),
    "set_except" -> (setExcept _),
    "set_except_all" -> (setExceptAll _),
    "scalar_subquery" -> (scalarSubquery _),
    "scalar_funcs" -> (scalarFuncs _))

  def oracles: Map[String, String] = {
    import Exact.sql._
    Map(
      "p1_clip" ->
        """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
          |FROM customer WHERE c_nationkey IN (
          |  SELECT n_nationkey FROM nation
          |  JOIN region ON n_regionkey = r_regionkey
          |  WHERE r_name = 'ASIA')""".stripMargin,
      "p2_mask" ->
        """SELECT event_id, event_type,
          |  CASE WHEN event_type IN ('click','purchase') THEN 1.0 ELSE 0.0 END AS mask
          |FROM events""".stripMargin,
      "p5_filename_day" ->
        """SELECT CAST(strptime(regexp_extract(
          |    'PRISM_ppt_stable_4kmD2_' || strftime(o_orderdate, '%Y%m%d') || '_bil.tif',
          |    '(\d{8})', 1), '%Y%m%d') AS DATE) AS day,
          |  COUNT(*) AS n
          |FROM orders GROUP BY 1""".stripMargin,
      "j1_multiply" ->
        s"""SELECT p_brand,
           |  ${dsum("l_quantity * p_retailprice")} AS qty_price,
           |  COUNT(*) AS n_lines
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |GROUP BY p_brand""".stripMargin,
      "s6_combine" ->
        """SELECT o_orderkey, o_custkey, o_totalprice, 'a' AS src
          |FROM orders WHERE year(o_orderdate) = 1995
          |UNION ALL BY NAME
          |SELECT o_orderkey, o_custkey, o_orderpriority, 'b' AS src
          |FROM orders WHERE year(o_orderdate) = 1996""".stripMargin,
      "salted_sum" ->
        s"""SELECT l_suppkey, ${dsum("l_extendedprice")} AS sum_price
           |FROM lineitem GROUP BY l_suppkey""".stripMargin,
      "range_join" ->
        s"""WITH bands AS (
           |  SELECT i AS band, i * 20000.0 AS lo, i * 20000.0 + 30000.0 AS hi
           |  FROM range(0, 20) t(i))
           |SELECT band, COUNT(*) AS n_orders,
           |  ${dsum("o_totalprice")} AS total_price
           |FROM orders JOIN bands
           |  ON o_totalprice >= lo AND o_totalprice < hi
           |GROUP BY band""".stripMargin,
      "window_funcs" ->
        """SELECT o_custkey, o_orderkey, o_totalprice,
          |  CAST(ntile(4) OVER w AS INT) AS ntile_4,
          |  percent_rank() OVER w AS pct_rank,
          |  cume_dist() OVER w AS cume,
          |  CAST(COUNT(*) OVER (PARTITION BY o_custkey
          |    ORDER BY o_totalprice DESC, o_orderkey
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_n
          |FROM orders
          |WINDOW w AS (PARTITION BY o_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin,
      "token_topk" ->
        """SELECT token, COUNT(*) AS n
          |FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\r]+')) AS token
          |      FROM documents) t
          |GROUP BY token
          |ORDER BY n DESC, token
          |LIMIT 20""".stripMargin,
      "salted_join" ->
        s"""SELECT p_brand,
           |  ${dsum("l_quantity * p_retailprice")} AS qty_price,
           |  COUNT(*) AS n_lines
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |GROUP BY p_brand""".stripMargin,
      "topk_per_group" ->
        """SELECT * FROM (
          |  SELECT o_custkey, o_orderkey, o_totalprice,
          |    ROW_NUMBER() OVER (PARTITION BY o_custkey
          |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |  FROM orders) t WHERE rn <= 3""".stripMargin,
      "sort_limit" ->
        """SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS o_day
          |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
      "set_intersect" ->
        """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
          |INTERSECT
          |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
      "set_except" ->
        """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
          |EXCEPT
          |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
      "set_except_all" ->
        """SELECT o_custkey, COUNT(*) AS n_surviving FROM (
          |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
          |  EXCEPT ALL
          |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
          |GROUP BY 1""".stripMargin,
      "scalar_subquery" ->
        """SELECT c_custkey,
          |  (SELECT COUNT(*) FROM orders o
          |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
          |  (SELECT COALESCE(MAX(o_totalprice), -1.0) FROM orders o
          |   WHERE o.o_custkey = c.c_custkey) AS max_price
          |FROM customer c""".stripMargin,
      "scalar_funcs" ->
        """SELECT o_orderkey,
          |  lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS padded,
          |  concat_ws('-', o_orderstatus, upper(substr(o_orderpriority, 1, 8))) AS tagged,
          |  strftime(o_orderdate, '%Y-%m-%d') AS day_str,
          |  CAST(dayofyear(o_orderdate) AS INT) AS doy,
          |  CAST(month(o_orderdate) AS INT) AS mth,
          |  o_orderkey % 7 AS mod7,
          |  CASE WHEN o_orderpriority LIKE '1%' THEN 'urgent'
          |       WHEN o_orderpriority LIKE '2%' THEN 'high'
          |       ELSE 'normal' END AS prio_class,
          |  CAST(length(o_orderpriority) AS INT) AS prio_len
          |FROM orders""".stripMargin)
  }
}
