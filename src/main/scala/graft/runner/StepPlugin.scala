package graft.runner

import org.apache.spark.sql.SparkSession

import graft.spec.Scope

/** Plugin SPI (SURVEY §7.2) — the engine's operator registry surface,
  * keyed by the YAML plugin names. The reference dispatches each step to
  * an external Python program (`plugin: echo.py`,
  * /root/reference/pipelines/sample_steps.yml:8); here a step is an
  * in-process Scala call, usually submitting Spark jobs.
  */
trait StepPlugin extends Serializable {
  /** Canonical name (without `.py`, with namespace: `geo/geo_raster_spi`). */
  def name: String
  def run(ctx: StepContext): StepResult
}

/** Collector for `pipeline_execute mode: async` children: a step submits
  * work and returns immediately; the RUNNER awaits every handle at the
  * end of the invoking pipeline and merges the results (the reference's
  * synchronized/async contract, SURVEY §2.1 O3). The default `inline`
  * instance runs the body synchronously — directly-constructed contexts
  * (tests, ad-hoc embedding) keep synchronized semantics. */
final class AsyncRuns(exec: Option[java.util.concurrent.ExecutorService]) {
  private val handles =
    new java.util.concurrent.ConcurrentLinkedQueue[
      (String, java.util.concurrent.Future[StepResult])]()

  def submit(label: String)(body: => StepResult): Unit = exec match {
    case Some(pool) =>
      handles.add(label -> pool.submit(
        new java.util.concurrent.Callable[StepResult] { def call() = body }))
    case None => val r = body; val _ = r // inline: synchronized fallback
  }

  /** Await EVERY submitted child before reporting: a failed child must
    * not abandon the ones still running (they would keep going detached
    * and their outcomes would be lost) — all futures are joined first,
    * then the first failure is rethrown with the others suppressed. */
  def drain(): List[(String, StepResult)] = {
    var out = List.empty[(String, StepResult)]
    var failures = List.empty[Throwable]
    var h = handles.poll()
    while (h != null) {
      try out = (h._1 -> h._2.get()) :: out
      catch {
        case e: java.util.concurrent.ExecutionException =>
          failures = Option(e.getCause).getOrElse(e) :: failures
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); failures = e :: failures
      }
      h = handles.poll()
    }
    failures.reverse match {
      case first :: rest =>
        rest.foreach(first.addSuppressed)
        throw first
      case Nil => out.reverse
    }
  }
}

object AsyncRuns {
  /** Executes submissions on the calling thread (no pipeline-end merge
    * needed — results are complete when submit returns). */
  def inline: AsyncRuns = new AsyncRuns(None)
}

/** Everything a plugin sees for one invocation. */
final case class StepContext(
    /** Fully interpolated argument map for this invocation. */
    args: Map[String, Any],
    scope: Scope,
    /** Lazy session — pure-driver plugins never start Spark. */
    sparkProvider: () => SparkSession,
    runner: PipelineRunner,
    /** Source path of the invoking pipeline (sibling-relative refs). */
    currentPipeline: Option[String] = None,
    /** Async-child collector for this pipeline run. */
    async: AsyncRuns = AsyncRuns.inline) {

  def spark: SparkSession = sparkProvider()

  def arg(key: String): Any = args.getOrElse(key,
    throw new IllegalArgumentException(s"missing arg '$key' in $args"))
  def argStr(key: String): String = arg(key).toString
  def argOpt(key: String): Option[Any] = args.get(key)
  /** First present key wins — plugins accept the reference's YAML arg
    * names AND the engine's (verbatim reference pipelines must run). */
  def argAny(keys: String*): Option[Any] =
    keys.iterator.map(args.get).collectFirst { case Some(v) => v }
  def argAnyStr(keys: String*): String = argAny(keys: _*).map(_.toString)
    .getOrElse(throw new IllegalArgumentException(
      s"missing arg (any of ${keys.mkString("/")}) in $args"))
  def argBool(key: String, default: Boolean): Boolean =
    args.get(key).map(_.toString.toBoolean).getOrElse(default)
  def argInt(key: String, default: Int): Int =
    args.get(key).map(_.toString.toInt).getOrElse(default)
  /** `overwrite: false` is the reference's idempotence contract
    * (e.g. /root/reference/pipelines/cdl/download-national-30m-2008-2025.yml:22). */
  def overwrite: Boolean = argBool("overwrite", default = false)

  /** Resolve a possibly-relative FILESYSTEM arg the way the reference's
    * executor does: its cli runs from the checkout root, so YAML paths
    * like `catalog_json: .runs/catalog/catalog.json` or
    * `catalog_repo: ../landcore-data-catalog`
    * (/root/reference/pipelines/tiger/county.yml:9-10) are relative to
    * that root. Here the root is the runner's FIRST asset root
    * (default `.` — process CWD, the drop-in equivalent). Unlike
    * [[PipelineRunner.resolvePath]] this never requires existence: it
    * also names WRITE targets. */
  def fsPath(s: String): java.nio.file.Path = {
    val p = java.nio.file.Paths.get(s)
    if (p.isAbsolute) p
    else runner.checkoutRoot.resolve(s).normalize()
  }
}

/** Structured step result; fields are visible to later steps via
  * `{output_var.field}` (/root/reference/pipelines/tiger/county.yml:41,47). */
final case class StepResult(fields: Map[String, Any] = Map.empty,
                            skipped: Boolean = false)

/** Plugin registry. Lookup normalizes the reference's naming variants:
  * with/without `.py`, with/without the `geo/` namespace
  * (`plugin: echo` vs `echo.py` vs `geo/geo_raster_spi.py` —
  * /root/reference/pipelines/sample.yml:7, sample_steps.yml:8,
  * pipelines/prism/stage-ts-ppt-day-mi-spi-3d.yml:22).
  */
final class Registry(plugins: Seq[StepPlugin]) {
  private val byName: Map[String, StepPlugin] =
    plugins.flatMap { p =>
      val base = p.name.stripSuffix(".py")
      val short = base.split('/').last
      Seq(base -> p, short -> p)
    }.toMap

  def resolve(yamlName: String): StepPlugin = {
    val norm = yamlName.stripSuffix(".py")
    byName.get(norm).orElse(byName.get(norm.split('/').last)).getOrElse(
      throw new IllegalArgumentException(s"unknown plugin: $yamlName"))
  }

  def withPlugins(more: Seq[StepPlugin]): Registry =
    new Registry(byName.values.toSeq.distinct ++ more)
}
