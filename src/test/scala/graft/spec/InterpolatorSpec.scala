package graft.spec

import java.time.{LocalDate, LocalDateTime}

import org.scalatest.funsuite.AnyFunSuite

class InterpolatorSpec extends AnyFunSuite {

  private val sys = SysContext(LocalDateTime.of(2026, 8, 12, 14, 30, 45),
    "ab12cd", stepOrdinal = 5)
  private def scope(vars: (String, Any)*) =
    Scope(env = Map("basedir" -> "/base", "workdir" -> "/work"),
      vars = vars.toMap, sys = sys)

  test("basic var substitution and env namespace") {
    assert(Interpolator.resolveString("{env.basedir}/x", scope()) == "/base/x")
    assert(Interpolator.resolveString("{a}-{b}",
      scope("a" -> 1, "b" -> "z")) == "1-z")
  }

  test("literal-brace JSON interpolates only the resolvable token (sentinel yml:50)") {
    val s = """{"eo:cloud_cover":{"lt":{max_cloud_cover}}}"""
    val out = Interpolator.resolveString(s, scope("max_cloud_cover" -> 20))
    assert(out == """{"eo:cloud_cover":{"lt":20}}""")
  }

  test("unresolvable tokens stay literal, resolvable ones substitute") {
    val out = Interpolator.resolveString("{nope} {yes}", scope("yes" -> "y"))
    assert(out == "{nope} y")
  }

  test("whole-string placeholder keeps its type (lists for foreach)") {
    val out = Interpolator.resolveString("{years}",
      scope("years" -> List(2008, 2009)))
    assert(out == List(2008, 2009))
  }

  test("vars referencing vars resolve recursively (rollsum yml:7-9)") {
    val sc = scope("window" -> 14,
      "dataset_id" -> "stage.prism_ppt_daily_mi_rollsum_{window}d_v1")
    assert(Interpolator.resolveString("{dataset_id}", sc) ==
      "stage.prism_ppt_daily_mi_rollsum_14d_v1")
  }

  test("interpolation cycles are detected, not infinite") {
    val sc = scope("a" -> "{b}", "b" -> "{a}")
    intercept[IllegalStateException] {
      Interpolator.resolveString("{a}", sc)
    }
  }

  test("sys.now formats, run short_id, step NN (sample.yml:4, mutlisteps:10)") {
    assert(Interpolator.resolveString(
      "{sys.now.yymmdd}/{sys.now.hhmmss}-{sys.run.short_id}", scope()) ==
      "260812/143045-ab12cd")
    assert(Interpolator.resolveString("step {sys.step.NN}", scope()) ==
      "step 05")
    assert(Interpolator.resolveString("{sys.now.yyyy}{sys.now.yyyymmdd}",
      scope()) == "202620260812")
  }

  test("expr.range is half-open [a,b) (cdl 2008-2025 uses range(2008,2026))") {
    val out = Interpolator.resolveString("{expr.range(2008, 2026)}", scope())
    assert(out == (2008 until 2026).toList)
    assert(out.asInstanceOf[List[Int]].last == 2025)
  }

  test("expr.date renders yyyymmdd in filenames (county_daily_aggregate.yml:9,27)") {
    val sc = scope("d" -> "{expr.date(2017, 3, 1)}")
    assert(Interpolator.resolveString(
      "PRISM_ppt_stable_4kmD2_{d}_bil.tif", sc) ==
      "PRISM_ppt_stable_4kmD2_20170301_bil.tif")
  }

  test("expr.daterange inclusive of both ends; nested call form (child yml:6)") {
    val sc = scope("year" -> 2024)
    val out = Interpolator.resolveString(
      "{expr.daterange(expr.date(year,1,1), expr.date(year,12,31))}", sc)
      .asInstanceOf[List[LocalDate]]
    assert(out.size == 366) // 2024 is a leap year
    assert(out.head == LocalDate.of(2024, 1, 1))
    assert(out.last == LocalDate.of(2024, 12, 31))
  }

  test("override precedence: parent vars_kv beats child vars (parent yml:19)") {
    val sc = Scope(vars = Map("year" -> 2025),
      overrides = Map("year" -> 2013), sys = sys)
    assert(Interpolator.resolveString("{year}", sc) == 2013)
  }

  test("dirs may reference vars; bare lookup falls back vars->dirs->env") {
    val sc = Scope(env = Map("workdir" -> "/envwd"),
      vars = Map("workdir" -> "/varwd"),
      dirs = Map("outdir" -> "{workdir}/out"), sys = sys)
    assert(Interpolator.resolveString("{dirs.outdir}", sc) == "/varwd/out")
    assert(Interpolator.resolveString("{outdir}", sc) == "/varwd/out")
  }

  test("output_var dotted field access (tiger/county.yml:47)") {
    val sc = scope().withOutput("vector_facts",
      Map("vector_facts_json" -> "/tmp/facts.json"))
    assert(Interpolator.resolveString("{vector_facts.vector_facts_json}",
      sc) == "/tmp/facts.json")
  }

  test("non-string values survive resolution untouched (sentinel bbox)") {
    val v = Map("bbox" -> List(-90.42, 41.69, -82.12, 48.31),
      "max" -> 20, "flag" -> false, "empty" -> Map())
    assert(Interpolator.resolve(v, scope()) == v)
  }

  test("property: daterange length = days-between + 1 (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    (1 to 100).foreach { _ =>
      val start = LocalDate.of(2000, 1, 1).plusDays(rnd.nextInt(1000))
      val n = rnd.nextInt(500)
      val end = start.plusDays(n)
      val sc = scope("s" -> start.toString, "e" -> end.toString)
      val out = Interpolator.resolveString("{expr.daterange(s, e)}", sc)
        .asInstanceOf[List[LocalDate]]
      assert(out.size == n + 1)
      assert(out.head == start && out.last == end)
    }
  }

  test("property: range(a,b) size is b-a for a<=b (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    (1 to 100).foreach { _ =>
      val a = rnd.nextInt(20000) - 10000
      val d = rnd.nextInt(1000)
      val sc = scope("a" -> a, "b" -> (a + d))
      val out = Interpolator.resolveString("{expr.range(a, b)}", sc)
        .asInstanceOf[List[Int]]
      assert(out.size == d)
    }
  }
}
