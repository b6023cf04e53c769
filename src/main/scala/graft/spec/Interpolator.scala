package graft.spec

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import scala.util.matching.Regex

/** `{...}` placeholder interpolation (SURVEY §1.2).
  *
  * Reproduced subtleties, each pinned to reference evidence:
  *  - Literal braces coexist with placeholders: in
  *    `'{"eo:cloud_cover":{"lt":{max_cloud_cover}}}'` only
  *    `{max_cloud_cover}` interpolates
  *    (/root/reference/pipelines/sentinel/download-sentinel2-l2a-michigan.yml:50).
  *    Rule: a brace region substitutes only when its contents parse as a
  *    resolvable token (dotted identifier or expr call); everything else
  *    is left byte-for-byte.
  *  - Whole-string placeholders keep their TYPE: `foreach: days` fans over
  *    the list from `{expr.daterange(...)}`
  *    (pipelines/prism/county_daily_aggregate.yml:8) — a lone placeholder
  *    returns the typed value, not its string form.
  *  - Vars reference vars (`window` → `dataset_id`,
  *    pipelines/prism/stage-ts-ppt-day-mi-rollsum-14d.yml:7-9): resolution
  *    recurses with cycle detection.
  *  - `expr.range(a,b)` is HALF-OPEN `[a,b)`: the "2008-2025" CDL pipeline
  *    uses `range(2008, 2026)` (pipelines/cdl/download-national-30m-2008-2025.yml:6-7).
  *  - `expr.daterange(s,e)` is INCLUSIVE of both ends: Jan 1–Dec 31 must
  *    cover the whole year (pipelines/prism/county_daily_aggregate_child.yml:6),
  *    and nests: `daterange(date(year,1,1), date(year,12,31))`.
  *  - Dates splice as `yyyymmdd` (PRISM filename
  *    `PRISM_ppt_stable_4kmD2_{item}_bil.tif`,
  *    pipelines/prism/county_daily_aggregate.yml:9,27).
  */
object Interpolator {

  private val Brace: Regex = """\{([^{}]+)\}""".r
  private val TokenPath: Regex = """[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z0-9_]+)*""".r
  private val ExprCall: Regex = """expr\.([a-z_]+)\((.*)\)""".r

  /** Resolve any YAML value: strings interpolate, containers recurse,
    * other scalars pass through unchanged (bbox lists, ints, bools —
    * sentinel yml:10-14). */
  def resolve(value: Any, scope: Scope): Any = resolve(value, scope, Set.empty)

  private def resolve(value: Any, scope: Scope, seen: Set[String]): Any =
    value match {
      case s: String => resolveString(s, scope, seen)
      case m: Map[_, _] =>
        m.asInstanceOf[Map[String, Any]].map { case (k, v) =>
          k -> resolve(v, scope, seen)
        }
      case l: Seq[_] => l.map(resolve(_, scope, seen))
      case other => other
    }

  def resolveString(s: String, scope: Scope): Any =
    resolveString(s, scope, Set.empty)

  private def resolveString(s: String, scope: Scope, seen: Set[String]): Any = {
    // whole-string single placeholder → typed value
    val trimmed = s
    if (trimmed.length > 2 && trimmed.head == '{' && trimmed.last == '}' &&
      !trimmed.substring(1, trimmed.length - 1).exists(c => c == '{' || c == '}')) {
      val inner = trimmed.substring(1, trimmed.length - 1)
      evalToken(inner, scope, seen) match {
        case Some(v) => return v
        case None => // fall through to splicing (leaves it literal)
      }
    }
    Brace.replaceAllIn(s, m => {
      val token = m.group(1)
      evalToken(token, scope, seen) match {
        case Some(v) => Regex.quoteReplacement(render(v))
        case None => Regex.quoteReplacement(m.matched) // literal brace region
      }
    })
  }

  /** A token evaluates iff it's an expr call or a resolvable dotted path. */
  private def evalToken(token: String, scope: Scope, seen: Set[String]): Option[Any] =
    token match {
      case ExprCall(fn, args) => Some(evalExpr(fn, args, scope, seen))
      case t if TokenPath.pattern.matcher(t).matches() =>
        if (seen.contains(t))
          throw new IllegalStateException(s"interpolation cycle at '$t'")
        scope.lookup(t).map(v => resolve(v, scope, seen + t))
      case _ => None
    }

  /** How values splice into surrounding text. */
  def render(v: Any): String = v match {
    case d: LocalDate => d.format(DateTimeFormatter.BASIC_ISO_DATE) // yyyymmdd
    case l: Seq[_] => l.map(render).mkString(",")
    case null => ""
    case other => other.toString
  }

  // ---- expr.* functions ----

  private def evalExpr(fn: String, rawArgs: String, scope: Scope,
                       seen: Set[String]): Any = {
    val args = splitTopLevel(rawArgs).map(a => evalArg(a.trim, scope, seen))
    fn match {
      case "range" => (asInt(args(0)) until asInt(args(1))).toList // half-open
      case "date" =>
        LocalDate.of(asInt(args(0)), asInt(args(1)), asInt(args(2)))
      case "daterange" =>
        val start = asDate(args(0))
        val end = asDate(args(1)) // inclusive
        Iterator.iterate(start)(_.plusDays(1))
          .takeWhile(!_.isAfter(end)).toList
      case other =>
        throw new IllegalArgumentException(s"unknown expr function: $other")
    }
  }

  /** Split on commas not inside parentheses (nested expr calls). */
  private[spec] def splitTopLevel(s: String): List[String] = {
    if (s.trim.isEmpty) return Nil
    val out = List.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case c =>
        if (c == '(') depth += 1
        if (c == ')') depth -= 1
        cur.append(c)
    }
    out += cur.result()
    out.result()
  }

  private def evalArg(a: String, scope: Scope, seen: Set[String]): Any =
    a match {
      case ExprCall(fn, inner) => evalExpr(fn, inner, scope, seen)
      case _ if a.matches("-?\\d+") => a.toInt
      case _ if TokenPath.pattern.matcher(a).matches() =>
        scope.lookup(a).map(v => resolve(v, scope, seen + a)).getOrElse(
          throw new IllegalArgumentException(s"unresolved expr arg: $a"))
      case _ => a
    }

  private def asInt(v: Any): Int = v match {
    case i: Int => i
    case l: Long => l.toInt
    case s: String => s.trim.toInt
    case other => other.toString.toInt
  }

  private def asDate(v: Any): LocalDate = v match {
    case d: LocalDate => d
    case s: String if s.matches("\\d{8}") =>
      LocalDate.parse(s, DateTimeFormatter.BASIC_ISO_DATE)
    case s: String => LocalDate.parse(s)
    case other => throw new IllegalArgumentException(s"not a date: $other")
  }
}
