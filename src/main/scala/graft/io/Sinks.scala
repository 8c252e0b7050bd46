package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** File sinks matching the reference's output surfaces.
  *
  * `single=true` coalesces to one partition for byte-level parity with the
  * reference's single `result.txt` / `WikiData.csv` (only sane for result-
  * sized data — top-k tables, not 100 TB scans; large outputs keep their
  * partitioning and write one file per partition).
  */
object Sinks {

  /** S3: `[page] [score]` formatted text lines (pageRank.py:19-24). */
  def writeResultText(top: DataFrame, path: String, single: Boolean = true): Unit = {
    val lines = top.select(
      concat(lit("["), col(top.columns.head).cast("string"), lit("] ["),
        col(top.columns(1)).cast("string"), lit("]")).as("value"))
    (if (single) lines.coalesce(1) else lines)
      .write.mode("overwrite").text(path)
  }

  /** S2/S5: header'd CSV dump (pageRank.py:40-41; UI download link). */
  def writeCsv(df: DataFrame, path: String, single: Boolean = false): Unit =
    (if (single) df.coalesce(1) else df)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** S5: the UI's base64 `data:` download href
    * (streamlit-pagerank.py:220-229) — presentation-layer encoding of a
    * (small, result-sized) table; collects, so never for scan-sized data.
    */
  def csvBase64Href(df: DataFrame, fileName: String): String = {
    def cell(v: Any): String = {
      val s = if (v == null) "" else v.toString
      if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    }
    val header = df.columns.map(cell).mkString(",")
    val body = df.collect()
      .map(_.toSeq.map(cell).mkString(","))
      .mkString("\n")
    val b64 = java.util.Base64.getEncoder.encodeToString(
      (header + "\n" + body).getBytes("UTF-8"))
    s"""<a href="data:file/csv;base64,$b64" download="$fileName">download</a>"""
  }
}
