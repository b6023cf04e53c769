package graft.spec

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** Run-clock + run-id context behind `{sys.*}` tokens (SURVEY §1.2):
  * `sys.now.{yymmdd,hhmmss,yyyy,yyyymmdd}`
  * (/root/reference/pipelines/sample.yml:4,
  * pipelines/usda_nass/download-quickstats-crops-census-and-crop-progress.yml:7),
  * `sys.run.short_id` (sample.yml:4), `sys.step.NN`
  * (pipelines/sample_mutlisteps.yml:10).
  *
  * The timestamp is fixed at run start (deterministic within a run) and
  * injectable for tests.
  */
final case class SysContext(
    now: LocalDateTime,
    shortId: String,
    /** 1-based ordinal of the currently-executing step. */
    stepOrdinal: Int = 0) {

  def lookup(path: List[String]): Option[Any] = path match {
    case "now" :: fmt :: Nil => fmt match {
      case "yymmdd" => Some(now.format(DateTimeFormatter.ofPattern("yyMMdd")))
      case "hhmmss" => Some(now.format(DateTimeFormatter.ofPattern("HHmmss")))
      case "yyyy" => Some(now.format(DateTimeFormatter.ofPattern("yyyy")))
      case "yyyymmdd" => Some(now.format(DateTimeFormatter.ofPattern("yyyyMMdd")))
      case _ => None
    }
    case "run" :: "short_id" :: Nil => Some(shortId)
    // zero-padded step ordinal; the literal token is `NN`
    case "step" :: "NN" :: Nil => Some(f"$stepOrdinal%02d")
    case _ => None
  }
}

object SysContext {
  def fresh(): SysContext = SysContext(
    LocalDateTime.now(),
    java.util.UUID.randomUUID().toString.replace("-", "").take(6))
}

/** Layered variable scope (SURVEY §1.2, §3.1 step 3).
  *
  * Precedence for a bare `{X}`: parent `vars_kv` overrides > `vars` >
  * `dirs` > `env` — evidence: parent `vars_kv: "year={item}"` overrides
  * the child default (pipelines/prism/county_daily_aggregate_parent.yml:19
  * vs _child.yml:5); `dirs` may reference `vars`
  * (pipelines/sentinel/download-sentinel2-l2a-michigan.yml:39-41).
  *
  * Dotted forms: `env.X`, `dirs.X`, `sys.a.b`, `item`, and
  * `{output_var.field}` structured step results
  * (pipelines/tiger/county.yml:47).
  */
final case class Scope(
    env: Map[String, Any] = Map.empty,
    vars: Map[String, Any] = Map.empty,
    dirs: Map[String, Any] = Map.empty,
    overrides: Map[String, Any] = Map.empty,
    outputs: Map[String, Map[String, Any]] = Map.empty,
    item: Option[Any] = None,
    sys: SysContext = SysContext.fresh()) {

  def lookup(pathStr: String): Option[Any] = {
    val path = pathStr.split("\\.").toList
    path match {
      case "item" :: Nil => item
      case "env" :: rest => get(env, rest)
      case "dirs" :: rest => get(dirs, rest)
      case "sys" :: rest => sys.lookup(rest)
      case head :: rest =>
        val bare = overrides.get(head)
          .orElse(vars.get(head))
          .orElse(dirs.get(head))
          .orElse(env.get(head))
          .orElse(outputs.get(head))
        bare match {
          case Some(v) if rest.isEmpty => Some(v)
          case Some(v) => get(v, rest)
          case None => None
        }
      case Nil => None
    }
  }

  private def get(v: Any, path: List[String]): Option[Any] = path match {
    case Nil => Some(v)
    case seg :: rest => v match {
      case m: Map[_, _] =>
        m.asInstanceOf[Map[String, Any]].get(seg).flatMap(get(_, rest))
      case _ => None
    }
  }

  def withItem(v: Any): Scope = copy(item = Some(v))
  def withStep(ordinal: Int): Scope = copy(sys = sys.copy(stepOrdinal = ordinal))
  def withOutput(name: String, fields: Map[String, Any]): Scope =
    copy(outputs = outputs + (name -> fields))
}
