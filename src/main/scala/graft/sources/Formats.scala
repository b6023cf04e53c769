package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Uniform multi-format source/sink surface (SURVEY §4: the reference
  * stages CSV/zip trees and parquet-ish outputs; an engine user also
  * needs JSON-lines — the canonical LLM-corpus interchange format —
  * plus ORC and raw text).
  *
  * Format is inferred from the path extension unless given explicitly;
  * `.gz` is transparent (Spark's text-based sources decompress
  * per-file). Scale notes: parquet/orc are splittable + column-pruned +
  * filter-pushed — always prefer them for hot data; plain jsonl/csv
  * split by line ranges; GZIPPED jsonl/csv are NOT splittable (one
  * task per file — size staged files accordingly, ~100-500 MB); text
  * reads line-per-row for raw-corpus ingestion.
  */
object Formats {

  private def stripped(path: String): String =
    path.toLowerCase.stripSuffix(".gz").stripSuffix(".gzip")

  /** Proper extension check (gz-stripped endsWith — a ".tsv" appearing
    * mid-path must not count). */
  private def isTsv(path: String): Boolean = stripped(path).endsWith(".tsv")

  /** Extension → Spark format name; None = not inferable (e.g. a bare
    * dataset directory — callers pick their own default, typically
    * parquet). */
  def infer(path: String): Option[String] = {
    val p = stripped(path)
    Seq("parquet", "orc", "csv", "tsv", "txt", "text", "json", "jsonl")
      .find(ext => p.endsWith(s".$ext"))
      .map {
        case "jsonl" => "json"
        case "tsv" => "csv"
        case "txt" | "text" => "text"
        case f => f
      }
  }

  /** Read `path` as `format` (inferred from the extension when None).
    * CSV defaults to header+inferSchema (the reference's CSVs carry
    * headers); TSV additionally sets the tab separator; pass `schema`
    * to skip inference scans (json/csv infer with an extra pass —
    * at scale always pass the schema). */
  def read(spark: SparkSession, path: String,
           format: Option[String] = None,
           schema: Option[StructType] = None,
           options: Map[String, String] = Map.empty): DataFrame = {
    val fmt = format.orElse(infer(path)).getOrElse(
      throw new IllegalArgumentException(
        s"cannot infer format from '$path'; pass format explicitly"))
    val defaults = fmt match {
      case "csv" =>
        val sep =
          if (isTsv(path)) Map("sep" -> "\t")
          else Map.empty[String, String]
        Map("header" -> "true") ++
          (if (schema.isEmpty) Map("inferSchema" -> "true")
           else Map.empty) ++ sep
      case _ => Map.empty[String, String]
    }
    val reader = spark.read.format(fmt).options(defaults ++ options)
    schema.fold(reader)(reader.schema).load(path)
  }

  /** Write `df` to `path` as `format` (inferred when None), optionally
    * directory-partitioned (partition pruning at read time). */
  def write(df: DataFrame, path: String,
            format: Option[String] = None,
            partitionBy: Seq[String] = Nil,
            mode: String = "overwrite",
            options: Map[String, String] = Map.empty): Unit = {
    val fmt = format.orElse(infer(path)).getOrElse(
      throw new IllegalArgumentException(
        s"cannot infer format from '$path'; pass format explicitly"))
    // write defaults MIRROR the read defaults — a bare write/read
    // round-trip of the same path must be the identity (a .tsv written
    // comma-separated but read tab-separated would silently corrupt)
    val defaults = fmt match {
      case "csv" =>
        Map("header" -> "true") ++
          (if (isTsv(path)) Map("sep" -> "\t")
           else Map.empty[String, String])
      case _ => Map.empty[String, String]
    }
    val writer = df.write.format(fmt).options(defaults ++ options)
      .mode(mode)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*)
     else writer).save(path)
  }
}
