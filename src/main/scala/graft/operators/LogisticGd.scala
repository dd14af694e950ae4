package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Logistic-regression trainer by distributed gradient descent (x228) —
  * the gradient-based member the classifier family lacked (x164 trains
  * Naive Bayes by counting, x179 solves least squares in closed form,
  * x68 is inference-only): the fastText-style production quality-filter
  * shape, a linear model over hashed features trained by fixed-iteration
  * full-batch GD.
  *
  * Determinism discipline (the x221 quantized-objective rule): every
  * arithmetic step is integer fixed-point, replayable bit-exactly in the
  * DuckDB oracle as unrolled per-iteration CTEs (the x72 pattern) —
  *   - activation: the RATIONAL fast sigmoid σ(z) ≈ 1/2 + z/(2(1+|z|)),
  *     e6-scaled with posmod-floor division (exactly representable in
  *     both engines, unlike exp; monotone, saturating, and its gradient
  *     never vanishes to zero — SGD folklore, e.g. Theano's
  *     `ultra_fast_sigmoid` lineage);
  *   - update: w ← w + ⌊Σ_docs err·x / n_train⌋ (posmod floor), err in
  *     e6 units — a fixed 1/n learning rate, so per-iteration weight
  *     steps are bounded by ±1e6;
  *   - features: PRESENCE of x65's 256 hashed buckets + an
  *     always-active bias bucket 256 (presence keeps ‖x‖ bounded by the
  *     active-bucket count, so z stays in long range at any corpus).
  *
  * Scale shape: each iteration is scan → equi-join with the ≤257-row
  * weight table (AQE broadcasts it) → per-doc agg → per-bucket agg —
  * two map-side-combinable shuffles over the feature stream, weights
  * localCheckpointed per round (the q62 iterative discipline). Nothing
  * ever materializes more than 257 rows outside the stream.
  */
object LogisticGd {

  /** posmod-floor integer division (both engines' shared convention) */
  def fdivSql(a: String, d: String): String =
    s"(($a) - ((($a) % ($d) + ($d)) % ($d))) div ($d)"

  /** fast sigmoid, e6-scaled: 500000 + ⌊z·500000 / (1e6 + |z|)⌋ */
  def sigSql(z: String): String =
    s"500000L + ${fdivSql(s"($z) * 500000L", s"1000000L + abs($z)")}"

  /** Train `iters` full-batch GD rounds. `feat`: (doc_id, b) presence
    * rows (bias bucket included by the caller); `lab`: (doc_id, y∈{0,1}).
    * Returns (b, w) e6-scaled weights for every bucket seen in training.
    */
  def train(feat: DataFrame, lab: DataFrame, iters: Int): DataFrame = {
    val tr = feat.join(lab, "doc_id").localCheckpoint() // reused every round
    val nTrain = tr.select("doc_id").distinct().count() // 1 driver constant
    require(nTrain > 0, "x228: empty training split")
    var w = tr.select("b").distinct().withColumn("w", lit(0L)).localCheckpoint()
    var t = 0
    while (t < iters) {
      val e = tr
        .join(w, "b")
        .groupBy("doc_id")
        .agg(max("y").as("y"), sum("w").as("z"))
        .withColumn("e", expr(s"y * 1000000L - (${sigSql("z")})"))
        .select("doc_id", "e")
      val g = tr.join(e, "doc_id").groupBy("b").agg(sum("e").as("g"))
      w = w
        .join(g, "b")
        .select(col("b"), expr(s"w + ${fdivSql("g", s"${nTrain}L")}").as("w"))
        .localCheckpoint() // cut the per-round lineage
      t += 1
    }
    w
  }

  /** Exact midrank ROC-AUC over (z, pos) — x159's Mann–Whitney form with
    * the x219 value-range bucketed prefix sum (z is negative-capable, so
    * the bucket key floor-divides to stay order-consistent); the only
    * unpartitioned window runs over the 8192×-compressed bucket table
    * (the documented x219 bounded class). Returns 1 row
    * (npos, nneg, auc_e6), zero-guarded.
    */
  def auc(scored: DataFrame): DataFrame = {
    val census = scored
      .groupBy("z")
      .agg(count(lit(1)).as("cnt"), sum("pos").as("npos_g"))
      .withColumn("bk", expr(fdivSql("z", "8192L")))
      .localCheckpoint() // two refs: bucket offsets + positions
    val offs = census
      .groupBy("bk")
      .agg(sum("cnt").as("bt"))
      .withColumn(
        "off",
        coalesce(sum("bt").over(Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
      )
      .select("bk", "off")
    val wb = Window.partitionBy("bk").orderBy("z").rowsBetween(Window.unboundedPreceding, -1)
    census
      .join(broadcast(offs), "bk")
      .withColumn("cum", col("off") + coalesce(sum("cnt").over(wb), lit(0L)))
      .agg(
        sum("npos_g").as("npos"),
        (sum("cnt") - sum("npos_g")).as("nneg"),
        // r2 is a quadratic fold (Σ cnt·2·cum ~ n²) — DECIMAL(38,0)
        sum((col("npos_g") * (lit(2L) * col("cum") + col("cnt") + 1L)).cast("decimal(38,0)")).as("r2")
      )
      .select(
        col("npos"),
        col("nneg"),
        // DECIMAL(38,0) headroom (advice-found): r2 grows as n², so the
        // ·500000 product overflows BIGINT past ~4M scored rows — the
        // x179/x181 quadratic-fold discipline applies here too
        expr(
          "IF(npos * nneg = 0, 0L, CAST(((CAST(r2 AS DECIMAL(38,0)) - CAST(npos AS DECIMAL(38,0)) * (npos + 1)) * 500000) " +
            "div (CAST(npos AS DECIMAL(38,0)) * nneg) AS BIGINT))"
        ).as("auc_e6")
      )
  }
}
