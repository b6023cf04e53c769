package graft

import java.nio.file.Paths

import org.apache.spark.sql.SparkSession

import graft.runner.PipelineRunner
import graft.runner.plugins.DefaultRegistry

/** CLI pipeline runner — the engine's analog of the reference's
  * `python cli.py run <pipeline.yml> --env <env> --project-id <id>`
  * (/root/reference/pipelines/prism/README.md:13).
  *
  * Usage:
  *   runMain graft.RunPipeline <pipeline.yml> [k=v ...]
  * where k=v pairs become the env profile (`{env.k}` tokens); `var.k=v`
  * pairs become vars overrides (the CLI form of parent `vars_kv`).
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RunPipeline <pipeline.yml> [k=v ...]")
    val path = Paths.get(args.head)
    val kvs = args.tail.map { a =>
      val Array(k, v) = a.split("=", 2); k -> v
    }
    val env: Map[String, Any] = kvs.filterNot(_._1.startsWith("var."))
      .toMap
    val overrides: Map[String, Any] = kvs.collect {
      case (k, v) if k.startsWith("var.") => k.stripPrefix("var.") -> v
    }.toMap

    lazy val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

    val runner = new PipelineRunner(
      DefaultRegistry(), env, () => spark,
      assetRoots = Seq(path.toAbsolutePath.getParent, Paths.get(".")))
    val result = runner.runFile(path, overrides)
    result.results.zipWithIndex.foreach { case (r, i) =>
      val status = if (r.skipped) "SKIP" else "OK"
      println(f"[pipeline] step ${i + 1}%02d $status ${r.fields}")
    }
    println(s"[pipeline] completed ${result.results.size} steps")
  }
}
