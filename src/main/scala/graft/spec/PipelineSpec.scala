package graft.spec

/** Case-class document model of the reference pipeline DSL (SURVEY §1.1).
  *
  * Top-level keys (all 26 reference pipelines): `project_id`, `vars`,
  * `dirs`, `steps`, `requires_pipelines`
  * (/root/reference/pipelines/sample.yml:1-7,
  * pipelines/prism/prism-mi-corn-ppt-county.yml:3-7).
  * Values are the untyped YAML tree (`Any`): scalars, lists, maps —
  * non-string values must survive interpolation untouched
  * (pipelines/sentinel/download-sentinel2-l2a-michigan.yml:10 bbox list).
  */
final case class Pipeline(
    projectId: String,
    requiresPipelines: List[String],
    vars: Map[String, Any],
    dirs: Map[String, Any],
    steps: List[Step],
    /** Path the pipeline was loaded from (for sibling-relative requires). */
    sourcePath: Option[String] = None)

/** One step (SURVEY §1.1): `name`, `plugin`, `args`, `foreach` /
  * `sequential_foreach` (pipelines/prism/county_daily_aggregate.yml:35,
  * county_daily_aggregate_child.yml:33), `parallel_with`
  * (county_daily_aggregate_parent.yml:21), `output_var`
  * (pipelines/tiger/county.yml:41), `resources`
  * (pipelines/prism/stage-ts-ppt-day-mi-spi-3d.yml:23-24).
  */
final case class Step(
    name: Option[String],
    plugin: String,
    args: Map[String, Any],
    foreach: Option[String],
    sequentialForeach: Option[String],
    parallelWith: Option[String],
    outputVar: Option[String],
    resources: Map[String, Any],
    /** Engine-level retention class for the step's declared outputs
      * (an extension beyond the reference DSL — SURVEY §4):
      * `scratch` marks the output an intermediate the runner may DROP
      * once its last in-pipeline consumer has completed
      * ([[graft.runner.Retention]]). Interpolated at run start, so
      * `retention: "{scratch_mode}"` gates the behavior on a var. Any
      * other value (or absence) keeps the output — the default. */
    retention: Option[String] = None)

object Pipeline {
  /** Build from the untyped YAML tree ([[Yaml.load]]). */
  def fromYaml(tree: Any, sourcePath: Option[String] = None): Pipeline = {
    val m = asMap(tree)
    Pipeline(
      projectId = m.get("project_id").map(_.toString).getOrElse("default"),
      requiresPipelines = asList(m.getOrElse("requires_pipelines", Nil))
        .map(_.toString),
      vars = asMap(m.getOrElse("vars", Map.empty)),
      dirs = asMap(m.getOrElse("dirs", Map.empty)),
      steps = asList(m.getOrElse("steps", Nil)).map(stepFromYaml),
      sourcePath = sourcePath)
  }

  def stepFromYaml(tree: Any): Step = {
    val m = asMap(tree)
    Step(
      name = m.get("name").map(_.toString),
      plugin = m.get("plugin").map(_.toString)
        .getOrElse(throw new IllegalArgumentException(
          s"step missing 'plugin': $m")),
      args = asMap(m.getOrElse("args", Map.empty)),
      foreach = m.get("foreach").map(_.toString),
      sequentialForeach = m.get("sequential_foreach").map(_.toString),
      parallelWith = m.get("parallel_with").map(_.toString),
      outputVar = m.get("output_var").map(_.toString),
      resources = asMap(m.getOrElse("resources", Map.empty)),
      retention = m.get("retention").map(_.toString))
  }

  /** Null-safe coercions for the YAML tree (empty map/list on null —
    * the `vars:` empty-map edge case, pipelines/sample_steps.yml:2-3). */
  def asMap(v: Any): Map[String, Any] = v match {
    case null => Map.empty
    case m: Map[_, _] => m.map { case (k, x) => k.toString -> x }
    case m: java.util.Map[_, _] =>
      import scala.jdk.CollectionConverters._
      m.asScala.map { case (k, x) => k.toString -> x }.toMap
    case other => throw new IllegalArgumentException(s"expected map, got $other")
  }

  def asList(v: Any): List[Any] = v match {
    case null => Nil
    case l: List[_] => l
    case l: Seq[_] => l.toList
    case l: java.util.List[_] =>
      import scala.jdk.CollectionConverters._
      l.asScala.toList
    case other => throw new IllegalArgumentException(s"expected list, got $other")
  }
}
