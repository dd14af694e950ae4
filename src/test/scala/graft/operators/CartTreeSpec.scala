package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x284 — the level-wise histogram CART trainer must recover planted
  * concepts, stop on pure nodes, break score ties deterministically, and
  * route out-of-range eval rows through the bin clamp.
  */
class CartTreeSpec extends AnyFunSuite {

  private lazy val s = TestSpark.spark
  import s.implicits._

  /** (k, y, split, f, v) long-format features → binned via train ranges. */
  private def binned(rows: Seq[(Long, Long, Long, Long, Long)]) = {
    val long = rows.toDF("k", "y", "split", "f", "v")
    val ranges = long.where(col("split") === 0).groupBy("f").agg(min("v").as("mn"), max("v").as("mx"))
    CartTree.bin(long, ranges)
  }

  test("planted threshold concept: root splits on the informative feature, holdout is perfect") {
    // y = v0 >= 500; v1 is hash noise. 16 bins over [0, 999] put the
    // boundary exactly at bin 8, so one split separates perfectly.
    val rows = (0L until 400L).flatMap { k =>
      val v0 = (k * 37 + 11) % 1000
      val y = if (v0 >= 500) 1L else 0L
      val split = k % 2
      Seq((k, y, split, 0L, v0), (k, y, split, 1L, (k * 91 + 3) % 17))
    }
    val b = binned(rows).localCheckpoint()
    val (splits, trainNodes) = CartTree.train(b.where(col("split") === 0), depth = 3)
    val root = splits.where(col("level") === 0).collect()
    assert(root.length == 1)
    assert(root(0).getAs[Long]("f") == 0L, "root must pick the informative feature")
    assert(root(0).getAs[Long]("thr") == 7L, "boundary bin: v<500 -> bins 0..7")
    // perfect holdout accuracy through apply()
    val leaves = trainNodes
      .join(rows.toDF("k", "y", "split", "f", "v").select("k", "y").distinct(), "k")
      .groupBy("node")
      .agg(count(lit(1)).as("n"), sum("y").as("pos"))
      .withColumn("pred", (col("pos") * 2 >= col("n")).cast("long"))
    val ev = CartTree
      .apply(b.where(col("split") === 1), splits, depth = 3)
      .join(rows.toDF("k", "y", "split", "f", "v").select("k", "y").distinct(), "k")
      .join(leaves.select("node", "pred"), "node")
    assert(ev.where(col("pred") =!= col("y")).count() == 0)
  }

  test("pure node: all-positive input trains no splits, a single root leaf") {
    val rows = (0L until 50L).map(k => (k, 1L, 0L, 0L, k % 30))
    val b = binned(rows)
    val (splits, nodes) = CartTree.train(b, depth = 3)
    assert(splits.count() == 0)
    assert(nodes.select("node").distinct().collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("score ties break to the lower feature then lower bin") {
    // two IDENTICAL informative features: f=0 must win the argmax
    val rows = (0L until 200L).flatMap { k =>
      val v = (k * 13 + 5) % 100
      val y = if (v >= 50) 1L else 0L
      Seq((k, y, 0L, 0L, v), (k, y, 0L, 1L, v))
    }
    val (splits, _) = CartTree.train(binned(rows), depth = 1)
    val root = splits.collect()
    assert(root.length == 1 && root(0).getAs[Long]("f") == 0L)
  }

  test("conjunction concept needs depth 2 and gets it exactly") {
    // y = (a >= 50) AND (b >= 50): greedy gini has positive root gain on
    // both features and resolves exactly with two levels. (XOR, by
    // contrast, has ZERO root gain everywhere — the classic greedy-CART
    // blind spot — so it is deliberately NOT the fixture here.)
    val rows = (0L until 400L).flatMap { k =>
      val a = (k * 37 + 1) % 100
      val b0 = (k * 61 + 7) % 100
      val y = if (a >= 50 && b0 >= 50) 1L else 0L
      Seq((k, y, k % 2, 0L, a), (k, y, k % 2, 1L, b0))
    }
    val b = binned(rows).localCheckpoint()
    val (splits, trainNodes) = CartTree.train(b.where(col("split") === 0), depth = 2)
    val leaves = trainNodes
      .join(rows.toDF("k", "y", "split", "f", "v").select("k", "y").distinct(), "k")
      .groupBy("node")
      .agg(count(lit(1)).as("n"), sum("y").as("pos"))
      .withColumn("pred", (col("pos") * 2 >= col("n")).cast("long"))
    val ev = CartTree
      .apply(b.where(col("split") === 1), splits, depth = 2)
      .join(rows.toDF("k", "y", "split", "f", "v").select("k", "y").distinct(), "k")
      .join(leaves.select("node", "pred"), "node")
    assert(ev.where(col("pred") =!= col("y")).count() == 0, "depth-2 tree must solve the conjunction exactly")
  }

  test("bagging (x285 shape): bootstraps are deterministic and replayable, majority vote is exact") {
    // the md5-bucket bootstrap must be replayable from the driver-side twin
    val ks = (0L until 300L)
    val df = ks.map(k => Tuple1(k)).toDF("k")
    for (t <- 0 until 3) {
      val engine = df
        .where(graft.functions.Hashing.md5Bucket(concat(col("k").cast("string"), lit(s"#rf$t")), 3L) < 2)
        .collect()
        .map(_.getLong(0))
        .toSet
      val twin = ks.filter(k => graft.functions.Hashing.md5BucketOf(s"$k#rf$t", 3L) < 2).toSet
      assert(engine == twin, s"bootstrap $t diverges from the driver twin")
      assert(engine.size > 150 && engine.size < 250, s"~2/3 sample expected, got ${engine.size}")
    }
    // the three bootstraps are distinct (different trees see different data)
    val sets = (0 until 3).map(t => ks.filter(k => graft.functions.Hashing.md5BucketOf(s"$k#rf$t", 3L) < 2).toSet)
    assert(sets.distinct.size == 3)
    // majority vote algebra: pv = (p0+p1+p2 >= 2) over all 8 combinations
    for (p0 <- 0 to 1; p1 <- 0 to 1; p2 <- 0 to 1) {
      val expected = if (p0 + p1 + p2 >= 2) 1L else 0L
      val got = Seq((p0.toLong, p1.toLong, p2.toLong))
        .toDF("pred0", "pred1", "pred2")
        .withColumn("pv", ((col("pred0") + col("pred1") + col("pred2")) >= 2).cast("long"))
        .collect()(0)
        .getAs[Long]("pv")
      assert(got == expected)
    }
  }

  test("boosting (x287 shape): regression rounds monotonically cut train MSE and solve a planted step") {
    def fdivE(a: String, dd: String) = s"(($a) - ((($a) % ($dd) + ($dd)) % ($dd))) div ($dd)"
    // v0 = k exactly covers [0, 999], so the 16-bin grid puts the planted
    // boundary 500 ON a bin edge (a straddling bin would leave residual
    // the tree cannot separate — a binning artifact, not a trainer bug)
    val rows = (0L until 1000L).flatMap { k =>
      val v0 = k % 1000
      val y = if (v0 >= 500) 1L else 0L
      Seq((k, y, 0L, 0L, v0), (k, y, 0L, 1L, (k * 91 + 3) % 17))
    }
    val b = binned(rows).localCheckpoint()
    val lab = rows.map(r => (r._1, r._2)).distinct.toDF("k", "y")
    var scores = lab.select(col("k"), (col("y") * 1000000L).as("target")).withColumn("sc", lit(0L))
    var prevMse = Long.MaxValue
    for (r <- 0 until 3) {
      val res = scores.select(col("k"), (col("target") - col("sc")).as("res")).localCheckpoint()
      val bres = b.join(res, "k").select(col("k"), col("res"), col("f"), col("bin"))
      val (splits, nodes) = CartTree.trainReg(bres, depth = 2)
      if (r == 0)
        assert(splits.where(col("level") === 0).collect()(0).getAs[Long]("f") == 0L, "root on the signal")
      val lv = nodes
        .join(res, "k")
        .groupBy("node")
        .agg(count(lit(1)).as("n"), sum("res").as("sres"))
        .withColumn("value", expr(fdivE("sres", "n * 2")))
      scores = scores
        .join(nodes, "k")
        .join(lv.select("node", "value"), "node")
        .select(col("k"), col("target"), (col("sc") + col("value")).as("sc"))
        .localCheckpoint()
      val mse = scores
        .agg((sum(expr("CAST(target - sc AS DECIMAL(38,0)) * (target - sc)")) / count(lit(1))).cast("long").as("m"))
        .collect()(0)
        .getLong(0)
      assert(mse < prevMse, s"round $r: MSE $mse did not drop below $prevMse")
      prevMse = mse
    }
    // the planted step concept is separable: boosted scores threshold cleanly
    val wrong = scores.where(((col("sc") >= 500000L).cast("long") * 1000000L) =!= col("target")).count()
    assert(wrong == 0, s"$wrong rows misclassified on a separable planted step")
  }

  test("eval rows outside the train range clamp into the edge bins") {
    val train = (0L until 100L).map(k => (k, if (k % 100 >= 50) 1L else 0L, 0L, 0L, k % 100))
    val eval = Seq((1000L, 1L, 1L, 0L, 5000L), (1001L, 0L, 1L, 0L, -5000L))
    val b = binned(train ++ eval).localCheckpoint()
    val (splits, _) = CartTree.train(b.where(col("split") === 0), depth = 1)
    val routed = CartTree.apply(b.where(col("split") === 1), splits, depth = 1).collect()
    val byK = routed.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byK(1000L) == 3L, "v≫max clamps to bin 15 → right child")
    assert(byK(1001L) == 2L, "v≪min clamps to bin 0 → left child")
  }
}
