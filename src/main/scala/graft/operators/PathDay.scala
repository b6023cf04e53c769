package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Attribute extraction from file paths (reference P5:
  * `day_from_filename_regex: "(\\d{8})"`,
  * /root/reference/pipelines/prism/prism-mi-corn-ppt-county.yml:82 —
  * the day key of each raster lives only in its filename, e.g.
  * `PRISM_ppt_stable_4kmD2_20170301_bil.tif`).
  *
  * Two forms: [[fromColumn]] when the path is already a column, and
  * [[fromInputFile]] for multi-file reads where the path comes from
  * `input_file_name()`. Pure projection — codegen-friendly, no shuffle.
  */
object PathDay {
  val defaultRegex = "(\\d{8})"

  def dayFrom(path: Column, regex: String = defaultRegex): Column =
    to_date(regexp_extract(path, regex, 1), "yyyyMMdd")

  def fromColumn(df: DataFrame, path: Column, outCol: String = "day",
                 regex: String = defaultRegex): DataFrame =
    df.withColumn(outCol, dayFrom(path, regex))

  def fromInputFile(df: DataFrame, outCol: String = "day",
                    regex: String = defaultRegex): DataFrame =
    df.withColumn(outCol, dayFrom(input_file_name(), regex))
}
