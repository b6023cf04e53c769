package graft.spec

import java.time.LocalDate

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the DSL layer (SURVEY §5 item 2): the
  * invariants the reference pins by example, generalized over random
  * inputs. Each property names the reference behavior it generalizes.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val scope = Scope(vars = Map("present" -> "v"))

  // ---- interpolation ----

  private val braceFree: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '.', '-', '_',
      ':', '/', '"', ','))).map(_.mkString)

  test("prop: brace-free strings interpolate to themselves") {
    check(Prop.forAll(braceFree) { s =>
      Interpolator.resolveString(s, scope) == s
    })
  }

  test("prop: a lone whole-string placeholder keeps the value's TYPE") {
    // foreach over {expr.daterange(...)} needs the typed list, not its
    // rendering (pipelines/prism/county_daily_aggregate.yml:8)
    val values: Gen[Any] = Gen.oneOf(
      Gen.choose(-1000000, 1000000),
      Gen.oneOf(true, false),
      Gen.listOf(Gen.choose(0, 99)),
      Gen.const(Map("k" -> 1)))
    check(Prop.forAll(values) { v =>
      val got = Interpolator.resolveString("{a}",
        Scope(vars = Map("a" -> v)))
      got == v
    })
  }

  test("prop: unresolvable tokens stay byte-for-byte literal") {
    // the literal-brace JSON contract (sentinel yml:50) — any brace
    // region whose contents aren't a resolvable token must survive
    val notAToken: Gen[String] = Gen.oneOf(
      Gen.const("\"lt\""), Gen.const("a b"), Gen.const("9x"),
      Gen.identifier.map(i => s"!$i"))
    check(Prop.forAll(notAToken) { t =>
      val s = s"pre {$t} post"
      Interpolator.resolveString(s, scope) == s
    })
  }

  test("prop: expr.range is half-open [a, b)") {
    // range(2008, 2026) covers a pipeline titled 2008-2025
    // (pipelines/cdl/download-national-30m-2008-2025.yml:6-7)
    check(Prop.forAll(Gen.choose(-500, 500), Gen.choose(-500, 500)) {
      (a, b) =>
        val got = Interpolator
          .resolveString(s"{expr.range($a, $b)}", scope)
          .asInstanceOf[List[Int]]
        got.length == math.max(0, b - a) &&
          (got.isEmpty || (got.head == a && got.last == b - 1))
    })
  }

  test("prop: expr.daterange is inclusive of both endpoints") {
    // Jan 1–Dec 31 must cover the whole year
    // (pipelines/prism/county_daily_aggregate_child.yml:6)
    val day: Gen[LocalDate] =
      Gen.choose(0L, 40000L).map(LocalDate.ofEpochDay)
    check(Prop.forAll(day, Gen.choose(0L, 800L)) { (start, span) =>
      val end = start.plusDays(span)
      val expr = s"{expr.daterange(expr.date(${start.getYear}," +
        s"${start.getMonthValue},${start.getDayOfMonth})," +
        s"expr.date(${end.getYear},${end.getMonthValue}," +
        s"${end.getDayOfMonth}))}"
      val got = Interpolator.resolveString(expr, scope)
        .asInstanceOf[List[LocalDate]]
      got.length == span + 1 && got.head == start && got.last == end
    })
  }

  test("prop: splitTopLevel honors nesting and round-trips flat lists") {
    val atom: Gen[String] = Gen.nonEmptyListOf(Gen.alphaNumChar)
      .map(_.mkString)
    val arg: Gen[String] = Gen.oneOf(
      atom, Gen.zip(atom, atom, atom).map { case (f, a, b) => s"$f($a,$b)" })
    check(Prop.forAll(Gen.nonEmptyListOf(arg)) { args =>
      Interpolator.splitTopLevel(args.mkString(",")) == args
    })
  }

  // ---- scope layering ----

  test("prop: bare-name precedence is overrides > vars > dirs > env") {
    // parent vars_kv overrides the child default
    // (pipelines/prism/county_daily_aggregate_parent.yml:19)
    val distinct4 = Gen.listOfN(4, Gen.identifier).suchThat(l =>
      l.distinct.length == 4)
    check(Prop.forAll(Gen.identifier, distinct4) { (k, vs) =>
      val Seq(o, v, d, e) = vs.toSeq
      val full = Scope(env = Map(k -> e), vars = Map(k -> v),
        dirs = Map(k -> d), overrides = Map(k -> o))
      full.lookup(k).contains(o) &&
        full.copy(overrides = Map.empty).lookup(k).contains(v) &&
        full.copy(overrides = Map.empty, vars = Map.empty)
          .lookup(k).contains(d) &&
        Scope(env = Map(k -> e)).lookup(k).contains(e)
    }, n = 100)
  }

  test("prop: dates render as yyyymmdd (PRISM filename splice)") {
    val day: Gen[LocalDate] =
      Gen.choose(0L, 40000L).map(LocalDate.ofEpochDay)
    check(Prop.forAll(day) { d =>
      val r = Interpolator.render(d)
      r.length == 8 && r.forall(_.isDigit) &&
        r == f"${d.getYear}%04d${d.getMonthValue}%02d${d.getDayOfMonth}%02d"
    })
  }
}
