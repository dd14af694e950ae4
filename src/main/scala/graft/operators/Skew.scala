package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md "Spill-aware … skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit salting
  * remains the tool when one key dominates so heavily that even split
  * sub-partitions of the probe side overwhelm a task, or when the engine
  * must co-group (not just join) a skewed key. The salt is derived from a
  * hash of the whole left row — deterministic per row content, uniformly
  * spreading a hot key over `salts` sub-keys; the right side is replicated
  * `salts`× (only acceptable because the build side is the smaller one).
  */
object Skew {

  /** Inner equi-join `left ⋈ right` on `key`, with the left side salted and
    * the right side replicated over `salts` sub-keys. Semantically identical
    * to `left.join(right, key)` for any data; physically the shuffle key
    * becomes (key, salt) so a hot key spreads across `salts` tasks. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val salted = left.withColumn("_salt", pmod(hash(left.columns.map(col).toSeq: _*), lit(salts)))
    val replicated = right.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    salted
      .join(replicated, salted("_salt") === replicated("_salt") && salted(key) === replicated(key), "inner")
      .drop("_salt")
      .drop(replicated(key))
  }
}
