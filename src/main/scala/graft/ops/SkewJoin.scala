package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic salted join for skewed keys.
  *
  * AQE's skew-join split handles most skew at runtime; explicit salting is
  * the fallback when one hot key exceeds what a single task can hold even
  * after splitting (e.g. a hub vertex, a stop-shingle). The big side gets a
  * content-derived (NOT random — keeps the plan deterministic and
  * re-runnable) salt in [0, factor); the small side is replicated once per
  * salt value; the join key becomes (key, salt), spreading each hot key
  * over `factor` tasks. Results are row-identical to the unsalted join
  * (asserted in SkewJoinSpec).
  */
object SkewJoin {

  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      factor: Int): DataFrame = {
    require(factor > 0)
    // Salt derived from the full row content: uniform over the hot key's
    // rows, stable across runs.
    val salted = big.withColumn("graft_salt",
      pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)), lit(factor.toLong)))
    val replicated = small.withColumn("graft_salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    // Drop the replicated side's copy of the join key along with the salts
    // so the result has a plain join's schema (col(key) stays unambiguous).
    salted.join(replicated,
        salted(key) === replicated(key) && salted("graft_salt") === replicated("graft_salt"))
      .drop(replicated(key))
      .drop("graft_salt")
  }
}
