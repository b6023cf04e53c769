package graft.typed

import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}
import graft.spec.AssetSources

class TypedSpec extends SparkSpecBase {

  test("typed datasets round-trip the driver tables") {
    assert(TypedTables.lineitem(spark, sf).head().l_orderkey >= 0)
    assert(TypedTables.events(spark, sf).head().ts != null)
    assert(TypedTables.documents(spark, sf).filter(_.n_chars > 0).count() > 0)
  }

  test("typed revenue aggregation equals untyped computation") {
    val typed = TypedTables.revenueByFlag(TypedTables.lineitem(spark, sf))
      .collect().map { case (k, rev, n) => k -> ((rev * 100).round, n) }.toMap
    val untyped = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("rev"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> (((r.getDouble(1) * 100).round, r.getLong(2))))
      .toMap
    assert(typed == untyped)
  }

  test("asset sources: lower priority number wins ordering") {
    val cfg = graft.spec.Yaml.parse(
      """pipeline_asset_sources:
        |  - project_key: land
        |    repo_url: /tmp/land_repo
        |    pipelines_dir: pipelines
        |    scripts_dir: scripts
        |    priority: 200
        |  - project_key: core
        |    repo_url: /tmp/core_repo
        |    pipelines_dir: pipelines
        |    scripts_dir: scripts
        |    priority: 100
        |""".stripMargin)
    val sources = AssetSources.fromConfig(cfg)
    assert(sources.map(_.projectKey) == List("core", "land"))
    assert(sources.head.pipelinesRoot.toString == "/tmp/core_repo/pipelines")
  }
}
