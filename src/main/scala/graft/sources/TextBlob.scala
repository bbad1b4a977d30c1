package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S6 (SURVEY.md §2.1): semi-structured text blob -> rows. The
  * reference splits a scraped page text by date markers and zips
  * markers with the content between them (bovada_pull.py:46-52,
  * including the off-by-one: the text BEFORE the first marker is
  * dropped). Here: regexp_extract_all + split + arrays_zip + explode
  * — one Generator, no driver-side loop, scales to any number of
  * blobs in parallel.
  */
object TextBlob {

  val DefaultDatePattern = "\\d{1,2}/\\d{1,2}/\\d{2}"

  /** Explode each blob row into (section_no, marker, content) rows.
    * Misaligned blobs (marker/segment count mismatch, e.g. truncated
    * scrapes) produce zero rows instead of corrupt pairs.
    * Output adds section_no/marker/content to the blob's columns
    * (those three names are the documented contract); intermediates
    * use a _tb_ prefix so caller columns like `pos`/`col` survive. */
  def sections(blobs: DataFrame, textCol: String,
               markerPattern: String = DefaultDatePattern): DataFrame = {
    val markers = regexp_extract_all(col(textCol), lit(s"($markerPattern)"), lit(1))
    val segments = split(col(textCol), markerPattern)
    // segments = [pre-marker junk, s1, s2, ...]: drop the head, trim.
    val contents = transform(
      slice(segments, lit(2), greatest(size(segments) - 1, lit(0))), s => trim(s))
    val zipped = when(size(markers) === size(contents),
      arrays_zip(markers.as("marker"), contents.as("content")))
      .otherwise(array().cast("array<struct<marker:string,content:string>>"))
    blobs
      .withColumn("_tb_z", zipped)
      .select(col("*"), posexplode(col("_tb_z")).as(Seq("_tb_pos", "_tb_s")))
      .select(col("*"), (col("_tb_pos") + 1).as("section_no"),
        col("_tb_s.marker").as("marker"), col("_tb_s.content").as("content"))
      .drop("_tb_z", "_tb_pos", "_tb_s", textCol)
  }
}
