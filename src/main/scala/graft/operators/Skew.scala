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

  /** Measured-skew salt advice (x270): one exact census pass over the
    * probe side's join key (partial-aggregated map-side — the shuffled
    * census is ≤ ndv rows, the x182 profile class) yields the heaviest
    * key's row share, and the salt factor is the smallest replication that
    * spreads that key across the target parallelism:
    *
    *   share_e6 = ⌊maxCount · 10⁶ / total⌋
    *   salts    = clamp(⌈share_e6 · parallelism / 10⁶⌉, 1, maxSalts)
    *
    * Integer end-to-end (BigInt against quadratic-fold overflow, the
    * x179/x228 discipline) so the advice replays in any engine. A uniform
    * key advises salts=1 — the caller should then keep the PLAIN join
    * (salting costs a build-side replication it wouldn't repay). This is
    * the stats-MISS fallback; when the key has a persisted x265 statistic
    * the same formula runs off the count-min upper bound instead of a
    * fresh census. */
  def advisedSalts(df: DataFrame, key: String, parallelism: Int, maxSalts: Int): (Long, Int) = {
    val r = df
      .groupBy(key)
      .agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("mx"), sum(col("c")).as("tot"))
      .collect()
      .head
    if (r.isNullAt(r.fieldIndex("tot"))) return (0L, 1) // empty input: nothing to salt
    val share = (BigInt(r.getAs[Long]("mx")) * 1000000 / BigInt(r.getAs[Long]("tot"))).toLong
    val salts = (BigInt(share) * parallelism + 999999) / 1000000 match {
      case s if s < 1 => 1
      case s if s > maxSalts => maxSalts
      case s => s.toInt
    }
    (share, salts)
  }

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
