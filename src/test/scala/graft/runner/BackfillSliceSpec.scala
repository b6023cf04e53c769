package graft.runner

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.runner.plugins.DefaultRegistry
import graft.spec.SysContext

/** SURVEY §7.5 second slice — the §3.2 parent/child backfill shape on
  * the events fixture: a parent pipeline fans a parameterized child over
  * date spans (`foreach` + `vars_kv`, the reference's
  * county_daily_aggregate_parent/child nest); each child runs
  * sql_transform (daily series for its span) → rolling 7-day window;
  * the parent then combines the spans and the result must equal the
  * whole computation done as one Spark plan over the full range.
  */
class BackfillSliceSpec extends SparkSpecBase {

  test("parent/child backfill over date spans == single-plan computation") {
    val root = Files.createTempDirectory("graft_backfill")
    val events = s"$sf/events.parquet"
    // SQL form of Tables.normalizeEventTs for the embedded sql_transform:
    // the lake's physical ts is ns-BIGINT or naive timestamp[us]
    val tsSql = spark.read.parquet(events).schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        "timestamp_micros(ts div 1000)"
      case org.apache.spark.sql.types.TimestampNTZType =>
        "cast(ts as timestamp)"
      case _ => "ts"
    }

    Files.writeString(root.resolve("child.yml"),
      s"""vars:
         |  span: 1
         |steps:
         |  - name: "{sys.step.NN}_daily_span"
         |    plugin: sql_transform
         |    args:
         |      tables:
         |        events_raw: "$events"
         |      query: >
         |        SELECT user_id AS cell_id, user_id AS x, 0 AS y,
         |          CAST($tsSql AS DATE) AS day,
         |          CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS value
         |        FROM events_raw
         |        WHERE pmod(day($tsSql), 3) = {span}
         |        GROUP BY 1, 2, 3, 4
         |      output_path: "{env.basedir}/spans/daily_{span}.parquet"
         |""".stripMargin)
    Files.writeString(root.resolve("parent.yml"),
      s"""vars:
         |  spans: "{expr.range(0, 3)}"
         |steps:
         |  - name: run_span
         |    plugin: pipeline_execute
         |    foreach: spans
         |    parallel_with: span_children
         |    args:
         |      pipeline_path: child.yml
         |      mode: synchronized
         |      vars_kv: "span={item}"
         |  - name: combine_and_roll
         |    plugin: sql_transform
         |    args:
         |      tables:
         |        daily: "{env.basedir}/spans/daily_*.parquet"
         |      query: >
         |        SELECT cell_id, day, value,
         |          CAST(SUM(CAST(value AS DECIMAL(30,10))) OVER (
         |            PARTITION BY cell_id
         |            ORDER BY datediff(day, DATE '1970-01-01')
         |            RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
         |          AS DOUBLE) AS rollsum_7d
         |        FROM daily
         |      output_path: "{env.basedir}/rolled.parquet"
         |""".stripMargin)

    val runner = new PipelineRunner(DefaultRegistry(),
      env = Map("basedir" -> root.toString, "workdir" -> s"$root/work"),
      sparkProvider = () => spark, assetRoots = Seq(root),
      sysContext = Some(SysContext(
        java.time.LocalDateTime.of(2026, 1, 1, 0, 0), "bfill1")))
    runner.runFile(root.resolve("parent.yml"))

    val pipelined = spark.read.parquet(s"$root/rolled.parquet")
      .select("cell_id", "day", "rollsum_7d").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) -> r.getDouble(2))
      .toMap

    // single-plan equivalent over the full range
    val daily = graft.Tables.events(spark, sf)
      .groupBy(col("user_id").as("cell_id"), to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast(graft.functions.Exact.DecimalT)).as("v"))
    val expected = graft.operators.Rolling.trailingDaySums(
      daily, Seq("cell_id"), col("day"), col("v"), Seq(7))
      .select(col("cell_id"), col("day"), col("rollsum_7d")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) -> r.getDouble(2))
      .toMap

    assert(pipelined.nonEmpty && pipelined.keySet == expected.keySet)
    pipelined.foreach { case (k, v) =>
      assert(v == expected(k), s"$k: pipeline $v vs plan ${expected(k)}")
    }
  }
}
