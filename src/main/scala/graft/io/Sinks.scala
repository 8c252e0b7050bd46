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

  /** Hive-layout partitioned parquet sink: one directory per distinct
    * value combination of `partitionCols` (`lang=en/part-*.parquet`).
    * THE layout for a 100 TB corpus carved by a low-cardinality column
    * (language, source, date): a reader filtering on a partition column
    * prunes whole directories at planning time — the scan never opens
    * non-matching files (see `readPruned` / SinksSpec's plan assertion).
    * Keep partition columns low-cardinality: one dir (and ≥1 file) per
    * value; partitioning by a high-cardinality key produces the classic
    * small-files failure mode.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Read back a partitioned layout with a partition-column predicate.
    * The filter lands in the scan's `PartitionFilters` (not just
    * `PushedFilters`): pruning happens against the directory listing
    * before any file is opened.
    */
  def readPruned(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      partitionCol: String,
      value: String): DataFrame =
    spark.read.parquet(path).filter(col(partitionCol) === value)

  /** Training-shard export: the end-of-pipeline sink that turns a curated
    * corpus into the fixed-width, deterministically-ordered shard files a
    * training job consumes.
    *
    *   - shard assignment: `pmod(xxhash64(key), shards)` — stable across
    *     runs/engines/partitionings, no global sort, no driver state;
    *   - layout: `shard=K/part-*.parquet` via partitionBy (readers address
    *     one shard without listing the rest);
    *   - intra-shard order: `repartition(shards, shard)` then
    *     `sortWithinPartitions(shard, key)` — ONE shuffle, each shard
    *     written as a single sorted run (epoch replays are byte-stable);
    *   - manifest: per-shard row count + order-invariant content checksum
    *     (XOR of per-row xxhash64 — overflow-free under ANSI arithmetic;
    *     paired duplicate rows cancel in XOR, which the row count
    *     disambiguates), returned AND written next to the data as
    *     `_manifest/` — integrity check for downstream loaders.
    *
    * At 100 TB: the one shuffle is the unavoidable global redistribution;
    * `shards` sizes output files (pick corpus_bytes / ~1 GB), and the
    * checksum agg is map-side combinable.
    */
  def trainingShards(
      df: DataFrame, path: String, keyCol: String, shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive; got $shards")
    require(!df.columns.contains("shard"),
      "input already has a 'shard' column — rename it; trainingShards owns that name")
    val withShard = df
      .withColumn("shard", pmod(xxhash64(col(keyCol)), lit(shards.toLong)))
    withShard
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col(keyCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    // Manifest from the FILES JUST WRITTEN, not a re-execution of the
    // source plan: a nondeterministic input stage would otherwise let the
    // manifest describe rows that were never written, and a pipeline-sized
    // input would be scanned twice more. Reading back also makes the
    // checksum cover exactly what a downstream loader will see.
    // Column-wise xxhash64 via the Column API (quoting-safe for reserved
    // or spaced column names, unlike a SQL-string spelling). The explicit
    // schema keeps the read-back working when the input was EMPTY (a
    // zero-row partitioned write emits no files, and schema inference
    // would throw where an empty manifest is the right answer).
    val writtenSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+
        org.apache.spark.sql.types.StructField(
          "shard", org.apache.spark.sql.types.LongType, nullable = false))
    val written = df.sparkSession.read.schema(writtenSchema).parquet(path)
    val manifest = written
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(
        count(lit(1)).as("n_rows"),
        bit_xor(xxhash64(df.columns.map(col): _*)).as("content_xor"))
      .orderBy(col("shard"))
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$path/_manifest")
    df.sparkSession.read.parquet(s"$path/_manifest").orderBy(col("shard"))
  }

  /** Hard row cap for [[csvBase64Href]]: the reference embeds top-100 /
    * top-20 tables (streamlit-pagerank.py:297), so 10k rows is two
    * orders of magnitude of headroom while keeping a misuse (pointing
    * the href sink at a scan-sized frame) from collecting the corpus
    * onto the driver.
    */
  val MaxHrefRows: Int = 10000

  /** S5: the UI's base64 `data:` download href
    * (streamlit-pagerank.py:220-229) — presentation-layer encoding of a
    * (small, result-sized) table. Collects, so the collect is bounded:
    * fetches at most [[MaxHrefRows]]+1 rows and REJECTS an over-cap frame
    * (never silently truncates — a partial download link is corrupt data)
    * instead of OOMing the driver on scan-sized input.
    */
  def csvBase64Href(df: DataFrame, fileName: String): String = {
    def cell(v: Any): String = {
      val s = if (v == null) "" else v.toString
      if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    }
    val header = df.columns.map(cell).mkString(",")
    // limit(cap+1) bounds the driver fetch BEFORE collecting: an over-cap
    // frame transfers cap+1 rows (enough to detect), never the corpus.
    val rows = df.limit(MaxHrefRows + 1).collect()
    require(rows.length <= MaxHrefRows,
      s"csvBase64Href is a presentation sink for result-sized tables: " +
        s"input exceeds $MaxHrefRows rows — write it with writeCsv instead")
    val body = rows
      .map(_.toSeq.map(cell).mkString(","))
      .mkString("\n")
    val b64 = java.util.Base64.getEncoder.encodeToString(
      (header + "\n" + body).getBytes("UTF-8"))
    s"""<a href="data:file/csv;base64,$b64" download="$fileName">download</a>"""
  }
}
