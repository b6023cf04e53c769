package graft.runner

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.runner.plugins.DefaultRegistry
import graft.spec.SysContext

/** SURVEY §7.5 vertical slice: the reference's most query-like pipeline
  * (`prism-mi-corn-ppt-county.yml`, §3.3) — clip → mask → downsample →
  * weight → weighted county aggregate — driven from actual YAML through
  * the runner on relational raster fixtures, then cross-checked against
  * the SAME computation expressed as one Spark plan (§3.3's collapsed
  * query). Exercises spec + runner + ledger + 5 geo plugins end-to-end.
  */
class VerticalSliceSpec extends SparkSpecBase {
  import spark.implicits._

  test("corn-ppt-county chain: YAML pipeline == single Spark plan") {
    val root = Files.createTempDirectory("graft_slice")

    // --- fixtures (FIXTURES.md §B): 8x8 CDL-like grid, 3-day ppt stack,
    // two counties as bboxes, one state covering x<8
    val cdl = for { x <- 0 until 8; y <- 0 until 8 } yield
      (x.toLong * 100 + y, x, y, if ((x + y) % 3 == 0) 1.0 else 5.0)
    cdl.toDF("cell_id", "x", "y", "value")
      .write.parquet(s"$root/cdl.parquet")

    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03")
    val ppt = for {
      x <- 0 until 4; y <- 0 until 4; (d, i) <- days.zipWithIndex
    } yield (x.toLong * 100 + y, x, y, java.sql.Date.valueOf(d),
      (x + y + i + 1).toDouble)
    ppt.toDF("cell_id", "x", "y", "day", "value")
      .write.parquet(s"$root/ppt.parquet")

    Seq(
      ("26001", "Alpha", "MI", 0.0, 0.0, 1.0, 3.0),
      ("26003", "Beta", "MI", 2.0, 0.0, 3.0, 3.0))
      .toDF("geoid", "name", "stusps", "xmin", "ymin", "xmax", "ymax")
      .write.parquet(s"$root/counties.parquet")
    Seq(("MI", "Michigan", "MI", 0.0, 0.0, 7.0, 7.0))
      .toDF("geoid", "name", "stusps", "xmin", "ymin", "xmax", "ymax")
      .write.parquet(s"$root/state.parquet")

    val yaml =
      s"""project_id: default
         |vars:
         |  stage: "{env.basedir}/stage"
         |steps:
         |  - name: "{sys.step.NN}_clip_mi_cdl"
         |    plugin: geo/geo_clip_raster_by_polygon.py
         |    args:
         |      raster_path: "$root/cdl.parquet"
         |      selector_path: "$root/state.parquet"
         |      key: STUSPS
         |      value: MI
         |      output_path: "{stage}/cdl_mi.parquet"
         |  - name: "{sys.step.NN}_mask_mi_corn"
         |    plugin: geo/geo_raster_value_mask.py
         |    args:
         |      raster_path: "{stage}/cdl_mi.parquet"
         |      include_values: "1"
         |      output_path: "{stage}/corn_mask.parquet"
         |  - name: "{sys.step.NN}_resample_corn_fraction"
         |    plugin: geo/geo_raster_reproject.py
         |    args:
         |      raster_path: "{stage}/corn_mask.parquet"
         |      factor: 2
         |      resampling: average
         |      output_path: "{stage}/corn_frac.parquet"
         |  - name: "{sys.step.NN}_weight_ppt_for_corn"
         |    plugin: geo/geo_raster_multiply.py
         |    args:
         |      input_dir: "$root/ppt.parquet"
         |      weight_raster: "{stage}/corn_frac.parquet"
         |      output_dir: "{stage}/ppt_weighted.parquet"
         |  - name: "{sys.step.NN}_aggregate_corn_by_county"
         |    plugin: geo/geo_county_weighted_raster_aggregate.py
         |    args:
         |      input_dir: "$root/ppt.parquet"
         |      weight_raster: "{stage}/corn_frac.parquet"
         |      selector_path: "$root/counties.parquet"
         |      value_prefix: corn_ppt
         |      output_file: "{stage}/county_corn_ppt.csv"
         |""".stripMargin
    val pipelineFile = root.resolve("corn.yml")
    Files.writeString(pipelineFile, yaml)

    val runner = new PipelineRunner(DefaultRegistry(),
      env = Map("basedir" -> root.toString, "workdir" -> s"$root/work"),
      sparkProvider = () => spark, assetRoots = Seq(root),
      sysContext = Some(SysContext(
        java.time.LocalDateTime.of(2026, 1, 1, 0, 0), "slice1")))
    runner.runFile(pipelineFile)

    val pipelineOut = spark.read.option("header", "true")
      .csv(s"${root.resolve("stage")}/county_corn_ppt.csv")
      .select(col("geoid"), col("day"),
        col("corn_ppt_wavg").cast("double"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap

    // --- the same chain as ONE Spark plan (SURVEY §3.3 collapsed form)
    val frac = spark.read.parquet(s"$root/cdl.parquet")
      .filter(col("x") <= 7 && col("y") <= 7)
      .withColumn("mask", when(col("value") === 1.0, 1.0).otherwise(0.0))
      .groupBy((col("x") / 2).cast("int").as("x"),
        (col("y") / 2).cast("int").as("y"))
      .agg(avg(col("mask")).as("w"))
    val counties = spark.read.parquet(s"$root/counties.parquet")
    val pptDf = spark.read.parquet(s"$root/ppt.parquet")
    val joined = pptDf.join(frac, Seq("x", "y"))
      .join(counties,
        pptDf("x") >= col("xmin") && pptDf("x") <= col("xmax") &&
          pptDf("y") >= col("ymin") && pptDf("y") <= col("ymax"))
    val expected = joined.groupBy(col("geoid"), col("day"))
      .agg((sum(col("value") * col("w")) / sum(col("w"))).as("wavg"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getDouble(2))
      .toMap

    assert(expected.nonEmpty && pipelineOut.keySet == expected.keySet)
    expected.foreach { case (k, v) =>
      assert(math.abs(pipelineOut(k) - v) < 1e-9,
        s"county-day $k: pipeline ${pipelineOut(k)} vs plan $v")
    }

    // idempotent re-run: ledger skips the final CSV (overwrite absent = false)
    val second = runner.runFile(pipelineFile)
    assert(second.results.last.skipped)
  }
}
