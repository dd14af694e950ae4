package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The x228 trainer must actually LEARN: a planted separable concept
  * (label = presence of one magic feature bucket) is recovered by 5 GD
  * rounds — held-out AUC ≈ 1, the magic bucket's weight dominating.
  * Plus determinism (bit-identical rerun) and the fast-sigmoid algebra.
  */
class LogisticGdSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** 400 docs; doc i is positive iff bucket 7 is among its features.
    * Features: 3 md5-derived buckets in 0..255 (noise) + bucket 7 for
    * positives; bias bucket 256 everywhere.
    */
  private def fixture() = {
    def h(i: Long, j: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(s"$i#$j".getBytes)
      (((md(0) & 0xffL) << 8) | (md(1) & 0xffL)) % 255L // 0..254, keeps 7 rare-ish
    }
    val rows = (0L until 400L).flatMap { i =>
      val pos = i % 3 == 0
      val noise = (1L to 3L).map(j => (i, h(i, j)))
      val magic = if (pos) Seq((i, 7L)) else Seq.empty
      val bias = Seq((i, 256L))
      (noise ++ magic ++ bias).distinct.map { case (d, b) => (d, b, if (pos) 1L else 0L) }
    }
    val df = rows.toDF("doc_id", "b", "y").localCheckpoint()
    (df.select("doc_id", "b").distinct(), df.select("doc_id", "y").distinct())
  }

  test("planted separable concept recovered: held-out AUC >= 0.95") {
    val (feat, lab) = fixture()
    val w = LogisticGd
      .train(feat.where(col("doc_id") % 2 === 0), lab.where(col("doc_id") % 2 === 0), iters = 5)
      .localCheckpoint()
    val scored = feat
      .where(col("doc_id") % 2 === 1)
      .join(w, "b")
      .groupBy("doc_id")
      .agg(sum("w").as("z"))
      .join(lab.where(col("doc_id") % 2 === 1), "doc_id")
      .select(col("z"), col("y").as("pos"))
    val verdict = LogisticGd.auc(scored).collect().head
    assert(verdict.getAs[Long]("auc_e6") >= 950000L, s"auc=${verdict.getAs[Long]("auc_e6")}")
    // the magic bucket's weight must dominate every noise bucket
    val weights = w.collect().map(r => r.getAs[Long]("b") -> r.getAs[Long]("w")).toMap
    val magic = weights(7L)
    val maxNoise = weights.collect { case (b, v) if b != 7L && b != 256L => v }.max
    assert(magic > maxNoise, s"magic=$magic maxNoise=$maxNoise")
    assert(magic > 0L)
  }

  test("determinism: bit-identical weights across reruns") {
    val (feat, lab) = fixture()
    def run() = LogisticGd
      .train(feat, lab, iters = 3)
      .orderBy("b")
      .collect()
      .map(r => (r.getAs[Long]("b"), r.getAs[Long]("w")))
      .toSeq
    assert(run() === run())
  }

  test("fast sigmoid algebra: bounds, midpoint, symmetry, saturation") {
    val z = Seq(-100000000L, -1000000L, -1L, 0L, 1L, 1000000L, 100000000L).toDF("z")
    val s = z.withColumn("s", expr(LogisticGd.sigSql("z"))).collect().map(r => r.getAs[Long]("z") -> r.getAs[Long]("s")).toMap
    assert(s(0L) === 500000L)
    assert(s(1000000L) === 750000L) // z=1: 1/2 + 1/4
    assert(s(-1000000L) === 250000L)
    assert(s.values.forall(v => v >= 0L && v <= 1000000L))
    assert(s(100000000L) > 990000L && s(-100000000L) < 10000L)
  }
}
