package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE engine-portable hash draw shared with every DuckDB oracle:
  * the first 15 hex digits of md5(key) read as a base-16 long (60 bits,
  * always non-negative). DuckDB spelling:
  * `CAST('0x' || substr(md5(key), 1, 15) AS BIGINT)`.
  *
  * Every portable sample / split / bucket draw (p3b, p6, p9, p10, p11,
  * t15, minhash/simhash portable twins, LSH plane family) derives from
  * this; reproducibility across engines depends on the two spellings
  * staying byte-equivalent, so changes here must land in every oracle
  * too — which is exactly why the Spark side is defined ONCE.
  */
object Portable {
  def md5Long(key: Column): Column =
    conv(substring(md5(key), 1, 15), 16, 10).cast("long")
}
