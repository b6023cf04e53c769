package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class OperatorSpec extends SparkSpecBase {
  import spark.implicits._

  test("ValueMask: include values -> 1.0, others -> 0.0") {
    val df = Seq(("a", 1), ("b", 5), ("c", 3)).toDF("k", "v")
    val out = ValueMask(df, col("v"), Seq(1, 5)).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out == Map("a" -> 1.0, "b" -> 1.0, "c" -> 0.0))
  }

  test("Clip.semiOn: keeps matching rows, never duplicates on dup dim keys") {
    val facts = Seq((1, "x"), (2, "y"), (3, "z")).toDF("k", "p")
    // duplicate key rows in the dimension must not duplicate facts
    val dim = Seq((1, "MI"), (1, "MI"), (2, "OH")).toDF("k", "st")
    val out = Clip.semiOn(facts, dim, col("st") === "MI", "k").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1))
  }

  test("Rolling: window of 1 day is identity; gaps excluded by RANGE frame") {
    val df = Seq(
      ("u", "2024-01-01", 1.0), ("u", "2024-01-02", 2.0),
      // 2024-01-03 missing: 3-day window at 01-05 must NOT see 01-02
      ("u", "2024-01-05", 10.0))
      .toDF("id", "d", "v").withColumn("d", to_date(col("d")))
    val out = Rolling.trailingDaySums(df, Seq("id"), col("d"), col("v"),
      Seq(1, 3)).orderBy("d").collect()
    assert(out.map(_.getAs[Double]("rollsum_1d")).toSeq == Seq(1.0, 2.0, 10.0))
    assert(out.map(_.getAs[Double]("rollsum_3d")).toSeq == Seq(1.0, 3.0, 10.0))
  }

  test("Rolling.trimYear keeps only the target year but window saw prior") {
    val df = Seq(("u", "2023-12-31", 5.0), ("u", "2024-01-01", 1.0))
      .toDF("id", "d", "v").withColumn("d", to_date(col("d")))
    val rolled = Rolling.trailingDaySums(df, Seq("id"), col("d"), col("v"), Seq(3))
    val out = Rolling.trimYear(rolled, col("d"), 2024).collect()
    assert(out.length == 1 && out.head.getAs[Double]("rollsum_3d") == 6.0)
  }

  test("ZScore: standardized values have mean ~0 and sample stddev ~1") {
    val df = Seq.tabulate(20)(i => ("g", i.toDouble * 3 + 1)).toDF("g", "v")
    val z = ZScore(df, Seq("g"), col("v"))
    val stats = z.agg(avg(col("zscore")), stddev_samp(col("zscore"))).head()
    assert(math.abs(stats.getDouble(0)) < 1e-9)
    assert(math.abs(stats.getDouble(1) - 1.0) < 1e-9)
  }

  test("ZScore: n=1 and constant groups yield null (no division by zero)") {
    val df = Seq(("one", 5.0), ("const", 2.0), ("const", 2.0)).toDF("g", "v")
    val z = ZScore(df, Seq("g"), col("v")).collect()
    assert(z.forall(r => r.isNullAt(r.fieldIndex("zscore"))))
  }

  test("WeightedZonal with weight 1 equals plain mean") {
    val df = Seq(("a", 2.0), ("a", 4.0), ("b", 10.0)).toDF("g", "v")
    val out = WeightedZonal(df, Seq("g"), col("v"), lit(1.0)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("a" -> 3.0, "b" -> 10.0))
  }

  test("ZonalStats: percentiles of 1..5 per reference stat set") {
    val df = Seq.tabulate(5)(i => ("g", (i + 1).toDouble)).toDF("g", "v")
    val r = ZonalStats(df, Seq("g"), col("v"), "x").head()
    assert(r.getAs[Double]("x_min") == 1.0)
    assert(r.getAs[Double]("x_med") == 3.0)
    assert(r.getAs[Double]("x_q1") == 2.0)
    assert(r.getAs[Double]("x_q3") == 4.0)
    assert(math.abs(r.getAs[Double]("x_p5") - 1.2) < 1e-12) // 1 + 0.05*4
    assert(r.getAs[Double]("x_max") == 5.0)
    assert(r.getAs[Double]("x_avg") == 3.0)
    assert(r.getAs[Long]("x_n") == 5L)
  }

  test("Regrid: mean per affine bucket") {
    val df = Seq((0, 1.0), (9, 3.0), (10, 5.0)).toDF("x", "v")
    val out = Regrid.meanByBucket(df,
      Regrid.affineBucket(col("x"), 0.0, 10.0), col("v")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(0L -> 2.0, 1L -> 5.0))
  }

  test("MultiplyJoin: cellwise product against broadcast weights") {
    val facts = Seq((1, 2.0), (2, 3.0)).toDF("cell", "v")
    val w = Seq((1, 0.5), (2, 2.0)).toDF("cell", "w")
    val out = MultiplyJoin(facts, w, Seq("cell"), col("v"), col("w"))
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(out == Map(1 -> 1.0, 2 -> 6.0))
  }

  test("Combine: unionByName aligns by name and null-fills missing cols") {
    val a = Seq((1, "x")).toDF("id", "p")
    val b = Seq((2, 9.0)).toDF("id", "q")
    val out = Combine.unionAll(Seq(a, b)).orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).getString(1) == "x" && out(0).isNullAt(2))
    assert(out(1).isNullAt(1) && out(1).getDouble(2) == 9.0)
  }

  test("CatalogMerge: updates win, missing fields kept, keys union") {
    val e = Seq(("a", "t1", 1L), ("b", "t2", 2L)).toDF("id", "title", "n")
    val u = Seq(("b", null.asInstanceOf[String], 20L), ("c", "t3", 3L))
      .toDF("id", "title", "n")
    val out = CatalogMerge.upsert(e, u, "id").orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", "t1", 1L), ("b", "t2", 20L), ("c", "t3", 3L)))
  }

  test("CatalogMerge: protected fields keep the existing value") {
    val e = Seq(("a", "keep", 1L)).toDF("id", "title", "n")
    val u = Seq(("a", "clobber", 9L)).toDF("id", "title", "n")
    val out = CatalogMerge.upsert(e, u, "id", Set("title")).head()
    assert(out.getString(1) == "keep" && out.getLong(2) == 9L)
  }

  test("TopK.perGroup: deterministic under ties via tie-break key") {
    val df = Seq((1, 10, 5.0), (1, 11, 5.0), (1, 12, 5.0), (2, 20, 1.0))
      .toDF("g", "id", "score")
    val out = TopK.perGroup(df, Seq("g"),
      Seq(col("score").desc, col("id").asc), 2)
      .filter(col("g") === 1).orderBy("rn").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(10, 11))
  }

  test("PathDay: reference PRISM filename regex recovers the day") {
    val df = Seq("PRISM_ppt_stable_4kmD2_20170301_bil.tif").toDF("f")
    val out = PathDay.fromColumn(df, col("f")).head()
    assert(out.getDate(1).toString == "2017-03-01")
  }

  test("Profile: counts, nulls, distincts, typed extremes") {
    val df = Seq(("x", Some(1.0)), ("y", None), ("y", Some(3.0)))
      .toDF("s", "d")
    val rows = Profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("s").getAs[Long]("n_rows") == 3)
    assert(rows("s").getAs[Long]("n_distinct") == 2)
    assert(rows("s").getAs[String]("max_str") == "y")
    assert(rows("d").getAs[Long]("n_nulls") == 1)
    assert(rows("d").getAs[Double]("min_num") == 1.0)
    assert(rows("d").getAs[Double]("max_num") == 3.0)
  }

  test("Decontaminate: n-gram leak flags, short docs keep, bench broadcast") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // full 8-gram copy of a benchmark span → contaminated
      (1L, "prefix the quick brown fox jumps over the lazy dog suffix"),
      // shares words but no 8-gram run → clean
      (2L, "the lazy fox and the quick dog do not align here at all"),
      // shorter than 8 tokens: cannot form one shingle → clean
      (3L, "too short to leak")).toDF("doc_id", "text")
    val out = Decontaminate.flag(corpus, bench, "doc_id", col("text"), n = 8)
    val byId = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(byId(1L)._2 == false && byId(1L)._1 > 0, byId.toString)
    assert(byId(2L) == ((0L, true)), byId.toString)
    assert(byId(3L) == ((0L, true)), byId.toString)
    // scale contract: the benchmark side broadcasts; the corpus is never
    // on the build side of a corpus-sized join
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("Sample.fixedPerGroup: exactly k per group, rank-nested, " +
    "growth-stable, null ids excluded") {
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("grp", when(col("id") % 2 === 0, "a").otherwise("b"))
    val out = Sample.fixedPerGroup(df, col("id"), col("grp"), k = 10)
    val perGrp = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perGrp == Map("a" -> 10L, "b" -> 10L), perGrp.toString)
    // rank <= j IS the j-sample: nested subsets, no resampling
    val five = Sample.fixedPerGroup(df, col("id"), col("grp"), k = 5)
      .select("id").collect().map(_.getLong(0)).toSet
    val tenTop5 = out.filter(col("sample_rank") <= 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(five == tenTop5)
    // growth stability: doubling the corpus preserves most of the
    // sample (expected churn ~ k * new/total, not a reshuffle)
    val grown = spark.range(0, 2000).toDF("id")
      .withColumn("grp", when(col("id") % 2 === 0, "a").otherwise("b"))
    val after = Sample.fixedPerGroup(grown, col("id"), col("grp"), 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val before = out.select("id").collect().map(_.getLong(0)).toSet
    assert((before & after).size >= 10, s"kept ${(before & after).size}")
    // null ids can never consume a rank slot
    val withNull = Seq(Some(1L), None, Some(2L)).toDF("id")
      .withColumn("grp", lit("a"))
    assert(Sample.fixedPerGroup(withNull, col("id"), col("grp"), 3)
      .count() == 2L)
  }

  test("Sample.stratified: per-stratum rates, null ids never sampled, " +
    "membership independent of split assignment") {
    val df = spark.range(0, 4000).toDF("id")
      .withColumn("grp", when(col("id") % 2 === 0, "a").otherwise("b"))
    val out = Sample.stratified(df, col("id"), col("grp"),
      Map("a" -> 0.5), defaultRate = 0.1)
    val byGrp = out.groupBy("grp")
      .agg(avg(col("sampled").cast("double")).as("rate"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(byGrp("a") - 0.5) < 0.05, byGrp.toString)
    assert(math.abs(byGrp("b") - 0.1) < 0.05, byGrp.toString)
    // rate extremes are exact, not approximate
    val ext = Sample.stratified(df, col("id"), col("grp"),
      Map("a" -> 1.0, "b" -> 0.0), defaultRate = 0.5)
      .groupBy("grp").agg(sum(col("sampled").cast("long")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ext == Map("a" -> 2000L, "b" -> 0L), ext.toString)
    // null id -> never sampled, even at rate 1.0
    val withNull = Seq((Some(1L), "a"), (None, "a")).toDF("id", "grp")
    val ns = Sample.stratified(withNull, col("id"), col("grp"),
      Map("a" -> 1.0), defaultRate = 1.0).collect()
      .map(r => Option(r.get(0)) -> r.getBoolean(2)).toMap
    assert(ns(None) == false && ns(Some(1L)) == true, ns.toString)
    // sampling must not correlate with train/val/test assignment: the
    // sampled subset's split shares track the full population's
    val split = Split.assign(
      Sample.stratified(df, col("id"), col("grp"),
        Map("a" -> 0.5, "b" -> 0.5), 0.5),
      col("id"), Seq("train" -> 0.8, "val" -> 0.2))
    val trainShare = split.filter(col("sampled"))
      .agg(avg((col("split") === "train").cast("double")))
      .head().getDouble(0)
    assert(math.abs(trainShare - 0.8) < 0.05, trainShare.toString)
  }
}
