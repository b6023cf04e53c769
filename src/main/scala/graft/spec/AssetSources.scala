package graft.spec

import java.nio.file.{Files, Path, Paths}

/** Prioritized pipeline/script asset resolution (SURVEY §1.2 "Asset
  * resolution"): the reference configures `pipeline_asset_sources` as a
  * list of repos with `project_key`, `pipelines_dir`, `scripts_dir` and
  * a numeric `priority` — 100 before 200, lower wins
  * (/root/reference/pipelines/sample_step.yml:111-127).
  *
  * The engine form: parse that block from a project-config YAML into an
  * ordered list of local roots for [[graft.runner.PipelineRunner]]'s
  * `assetRoots` (remote `repo_url`s are expected to be checked out /
  * staged locally first — fetching repos is the staging layer's job).
  */
object AssetSources {
  final case class AssetSource(projectKey: String, root: Path,
                               pipelinesDir: String, scriptsDir: String,
                               priority: Int) {
    def pipelinesRoot: Path = root.resolve(pipelinesDir)
    def scriptsRoot: Path = root.resolve(scriptsDir)
  }

  /** Parse the `pipeline_asset_sources` block of a project config. */
  def fromConfig(tree: Any, repoRootOf: String => Path = defaultRepoRoot)
  : List[AssetSource] = {
    val m = Pipeline.asMap(tree)
    Pipeline.asList(m.getOrElse("pipeline_asset_sources", Nil)).map { e =>
      val s = Pipeline.asMap(e)
      AssetSource(
        projectKey = s.getOrElse("project_key", "").toString,
        root = repoRootOf(s.getOrElse("repo_url", ".").toString),
        pipelinesDir = s.getOrElse("pipelines_dir", "pipelines").toString,
        scriptsDir = s.getOrElse("scripts_dir", "scripts").toString,
        priority = s.get("priority").map(_.toString.toInt).getOrElse(100))
    }.sortBy(_.priority) // lower number wins
  }

  /** Ordered pipeline roots for the runner (existing dirs only). */
  def pipelineRoots(sources: List[AssetSource]): Seq[Path] =
    sources.map(_.pipelinesRoot).filter(Files.isDirectory(_))

  /** Default mapping: treat repo_url as a local path (file:// or plain). */
  def defaultRepoRoot(url: String): Path =
    if (url.startsWith("file:")) Paths.get(java.net.URI.create(url))
    else Paths.get(url.stripPrefix("git@").replace("https://", "/"))
}
