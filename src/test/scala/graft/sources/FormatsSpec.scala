package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class FormatsSpec extends SparkSpecBase {
  import spark.implicits._

  private val df = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L))
    .toDF("id", "src", "n")

  test("format inference from extensions (gz transparent)") {
    assert(Formats.infer("x/part.parquet").contains("parquet"))
    assert(Formats.infer("x/docs.jsonl").contains("json"))
    assert(Formats.infer("x/docs.JSONL.gz").contains("json"))
    assert(Formats.infer("x/t.tsv").contains("csv"))
    assert(Formats.infer("x/raw.txt.gz").contains("text"))
    assert(Formats.infer("x/dataset_dir").isEmpty)
  }

  test("jsonl, csv, tsv, orc round-trips preserve data") {
    val root = Files.createTempDirectory("graft_formats").toString
    for (ext <- Seq("jsonl", "csv", "orc")) {
      val p = s"$root/d.$ext"
      Formats.write(df, p)
      val back = Formats.read(spark, p, schema = Some(df.schema))
      assert(back.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).toSet ==
        Set((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L)), ext)
    }
    // tsv: a BARE write/read round-trip must be the identity (write
    // defaults mirror read defaults — tab separator on both sides)
    Formats.write(df, s"$root/d.tsv")
    val tsv = Formats.read(spark, s"$root/d.tsv", schema = Some(df.schema))
    assert(tsv.agg(sum("n")).head().getLong(0) == 60L)
    assert(tsv.filter(col("src").isNull).count() == 0,
      "tsv round-trip must not collapse rows into one column")
    // a ".tsv" appearing MID-path must not switch a .csv to tabs
    val trick = s"$root/export.tsv_v2"
    Files.createDirectories(java.nio.file.Paths.get(trick))
    Formats.write(df, s"$trick/data.csv")
    val csv = Formats.read(spark, s"$trick/data.csv",
      schema = Some(df.schema))
    assert(csv.agg(sum("n")).head().getLong(0) == 60L)
  }

  test("text reads line-per-row for raw corpus ingestion") {
    val root = Files.createTempDirectory("graft_formats_txt").toString
    Files.writeString(java.nio.file.Paths.get(s"$root/c.txt"),
      "line one\nline two\n")
    val t = Formats.read(spark, s"$root/c.txt")
    assert(t.count() == 2 && t.columns.toSeq == Seq("value"))
  }
}
