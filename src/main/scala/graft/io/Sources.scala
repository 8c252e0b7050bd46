package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** Line-delimited JSON source/sink — the interchange format LLM corpus
  * pipelines actually move documents in (one JSON object per line,
  * splittable, appendable). The design rules mirror the S1 text scan:
  * ALWAYS impose the schema (never infer — inference costs a full extra
  * pass over 100 TB and silently widens types on dirty data) and make
  * malformed-line policy explicit.
  */
object Sources {

  /** Read JSONL with an imposed schema.
    *
    * @param mode `PERMISSIVE` (default) — malformed lines yield a row of
    *             nulls with the raw line captured in `_corrupt_record`
    *             (the column is appended to the schema here, since Spark
    *             only captures into a column the schema declares);
    *             `DROPMALFORMED` — malformed lines are dropped;
    *             `FAILFAST` — the first malformed line fails the scan,
    *             the right default for curated inputs (same contract as
    *             the S1 text scan's FAILFAST path).
    *
    * Spark restriction worth knowing at the call site: a query may not
    * reference ONLY `_corrupt_record` (raw-line capture happens during
    * parsing of the referenced data columns); select at least one data
    * column alongside it, e.g. the corrupt-line report below.
    */
  def jsonl(
      spark: SparkSession,
      path: String,
      schema: StructType,
      mode: String = "PERMISSIVE"): DataFrame = {
    require(Set("PERMISSIVE", "DROPMALFORMED", "FAILFAST")(mode),
      s"unknown JSON parse mode: $mode")
    val effective =
      if (mode == "PERMISSIVE" && !schema.fieldNames.contains("_corrupt_record"))
        schema.add("_corrupt_record", StringType, nullable = true)
      else schema
    spark.read
      .schema(effective)
      .option("mode", mode)
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
  }

  /** Malformed-line report: (line, n_occurrences). Spelled as a TEXT
    * scan + `from_json` with in-expression corrupt capture, rather than
    * a corrupt-column query over the json scan, because Spark disallows
    * queries whose only referenced column is `_corrupt_record`
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
    * text-scan spelling needs no cache. (PERMISSIVE `from_json` yields
    * an all-null struct, not a null, on malformed input — the capture
    * column is the reliable malformed signal.)
    */
  def corruptLines(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions._
    val withCr = schema.add("_cr", StringType, nullable = true)
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .withColumn("parsed", from_json(col("value"), withCr,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_cr")))
      .filter(col("parsed._cr").isNotNull)
      .groupBy(col("value").as("line"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("line"))
  }

  /** Write as JSONL (one object per line, overwrite). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
