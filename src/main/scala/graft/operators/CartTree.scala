package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** CART decision-tree trainer by LEVEL-WISE distributed histogram splits
  * (x284) — the tree member of the classifier family (x164 counts, x179
  * solves, x228 descends; this one PARTITIONS): the production
  * gradient-boosting building block, trained the way every distributed
  * tree library actually works at scale (Spark MLlib / XGBoost-hist /
  * LightGBM): one histogram pass per LEVEL over binned features, never a
  * pass per node, never per-row sorting.
  *
  * Determinism discipline (the x221/x228 quantized-objective rule):
  * integer end to end, replayable bit-exactly in DuckDB —
  *   - binning: fixed-width integer bins from TRAIN min/max,
  *     bin = ⌊(v − mn)·B / (mx − mn + 1)⌋ posmod-floor, eval rows clamped
  *     into [0, B−1];
  *   - split score: minimizing weighted Gini ⟺ maximizing
  *     S = (pL² + (nL−pL)²)·nR + (pR² + (nR−pR)²)·nL — the cross-
  *     multiplied common-denominator form, carried in DECIMAL(38,0)
  *     (S ~ n³: the x179/x181/x228 quadratic-fold discipline, one power
  *     worse);
  *   - argmax per node: the (S desc, feature asc, bin asc) total order;
  *   - candidates: thresholds at PRESENT bins with both sides non-empty;
  *     pure nodes (all-pos / all-neg) stop splitting.
  *
  * Scale shape per level: binned features co-join the per-row node table
  * on the row key, ONE map-side-combinable shuffle builds the
  * (node, feature, bin) histogram (≤ nodes·F·B cells — bounded regardless
  * of corpus size), prefix sums and the argmax run on that bounded cell
  * table (the x219 bounded-window class), and the ≤ 2^level split table
  * broadcasts back for the node update. Depth D costs D such passes.
  */
object CartTree {

  val Bins = 16L

  /** posmod-floor integer division (both engines' shared convention). */
  private def fdiv(a: String, d: String): String =
    s"(($a) - ((($a) % ($d) + ($d)) % ($d))) div ($d)"

  /** Bin a long feature stream (k, f, v) against per-feature train ranges
    * (f, mn, mx): fixed-width B bins, clamped (eval rows can fall outside
    * the train range).
    */
  def bin(long: DataFrame, ranges: DataFrame): DataFrame =
    long
      .join(broadcast(ranges), "f")
      .select(
        col("k"),
        col("y"),
        col("split"),
        col("f"),
        least(
          greatest(expr(fdiv("(v - mn) * " + Bins, "mx - mn + 1")), lit(0L)),
          lit(Bins - 1)
        ).as("bin")
      )

  /** Train a depth-`depth` tree over binned rows
    * (k, y∈{0,1}, f, bin) — train split only. Returns the split table
    * (level, node, f, thr) and the final per-row node assignment.
    */
  def train(binned: DataFrame, depth: Int): (DataFrame, DataFrame) = {
    val spark = binned.sparkSession
    import spark.implicits._
    var nodes = binned.select("k").distinct().withColumn("node", lit(1L)).localCheckpoint()
    var splits = Seq.empty[(Long, Long, Long, Long)].toDF("level", "node", "f", "thr")
    var t = 0
    while (t < depth) {
      val census = binned
        .join(nodes, "k")
        .groupBy("node", "f", "bin")
        .agg(count(lit(1)).as("cnt"), sum("y").as("pos"))
        .localCheckpoint() // bounded: ≤ nodes·F·B cells
      val wNf = Window.partitionBy("node", "f").orderBy("bin")
      val cand = census
        .withColumn("nL", sum("cnt").over(wNf))
        .withColumn("pL", sum("pos").over(wNf))
        .withColumn("tot", sum("cnt").over(Window.partitionBy("node", "f")))
        .withColumn("tpos", sum("pos").over(Window.partitionBy("node", "f")))
        .where(col("nL") > 0 && col("nL") < col("tot") && col("tpos") > 0 && col("tpos") < col("tot"))
        .withColumn("nR", col("tot") - col("nL"))
        .withColumn("pR", col("tpos") - col("pL"))
        .withColumn(
          "s",
          expr(
            "(CAST(pL AS DECIMAL(38,0)) * pL + CAST(nL - pL AS DECIMAL(38,0)) * (nL - pL)) * nR + " +
              "(CAST(pR AS DECIMAL(38,0)) * pR + CAST(nR - pR AS DECIMAL(38,0)) * (nR - pR)) * nL"
          )
        )
      val best = cand
        .withColumn(
          "rn",
          row_number().over(Window.partitionBy("node").orderBy(col("s").desc, col("f").asc, col("bin").asc))
        )
        .where(col("rn") === 1)
        .select(lit(t.toLong).as("level"), col("node"), col("f"), col("bin").as("thr"))
        .localCheckpoint() // ≤ 2^level rows
      splits = splits.unionByName(best).localCheckpoint()
      nodes = nodes
        .join(broadcast(best.select(col("node"), col("f"), col("thr"))), Seq("node"), "left")
        .join(binned.select(col("k"), col("f"), col("bin")), Seq("k", "f"), "left")
        .select(
          col("k"),
          when(col("f").isNull, col("node"))
            .otherwise(col("node") * 2 + when(col("bin") > col("thr"), 1L).otherwise(0L))
            .as("node")
        )
        .localCheckpoint()
      t += 1
    }
    (splits, nodes)
  }

  /** Regression variant (x287): binned rows carry an integer residual
    * `res` instead of a binary label; splits maximize the variance-
    * reduction cross-product S = sumL²·nR + sumR²·nL (DECIMAL(38,0) —
    * sum² ~ n²·1e12 at e6 residual scale). No purity stop (a constant-
    * residual node just ties deterministically); both sides non-empty.
    */
  def trainReg(binned: DataFrame, depth: Int): (DataFrame, DataFrame) = {
    val spark = binned.sparkSession
    import spark.implicits._
    var nodes = binned.select("k").distinct().withColumn("node", lit(1L)).localCheckpoint()
    var splits = Seq.empty[(Long, Long, Long, Long)].toDF("level", "node", "f", "thr")
    var t = 0
    while (t < depth) {
      val census = binned
        .join(nodes, "k")
        .groupBy("node", "f", "bin")
        .agg(count(lit(1)).as("cnt"), sum("res").as("sres"))
        .localCheckpoint()
      val wNf = Window.partitionBy("node", "f").orderBy("bin")
      val cand = census
        .withColumn("nL", sum("cnt").over(wNf))
        .withColumn("sL", sum("sres").over(wNf))
        .withColumn("tot", sum("cnt").over(Window.partitionBy("node", "f")))
        .withColumn("stot", sum("sres").over(Window.partitionBy("node", "f")))
        .where(col("nL") > 0 && col("nL") < col("tot"))
        .withColumn(
          "s",
          expr(
            "CAST(sL AS DECIMAL(38,0)) * sL * (tot - nL) + " +
              "CAST(stot - sL AS DECIMAL(38,0)) * (stot - sL) * nL"
          )
        )
      val best = cand
        .withColumn(
          "rn",
          row_number().over(Window.partitionBy("node").orderBy(col("s").desc, col("f").asc, col("bin").asc))
        )
        .where(col("rn") === 1)
        .select(lit(t.toLong).as("level"), col("node"), col("f"), col("bin").as("thr"))
        .localCheckpoint()
      splits = splits.unionByName(best).localCheckpoint()
      nodes = nodes
        .join(broadcast(best.select(col("node"), col("f"), col("thr"))), Seq("node"), "left")
        .join(binned.select(col("k"), col("f"), col("bin")), Seq("k", "f"), "left")
        .select(
          col("k"),
          when(col("f").isNull, col("node"))
            .otherwise(col("node") * 2 + when(col("bin") > col("thr"), 1L).otherwise(0L))
            .as("node")
        )
        .localCheckpoint()
      t += 1
    }
    (splits, nodes)
  }

  /** Route rows (k, f, bin) through a trained split table. */
  def apply(binned: DataFrame, splits: DataFrame, depth: Int): DataFrame = {
    var nodes = binned.select("k").distinct().withColumn("node", lit(1L))
    var t = 0
    while (t < depth) {
      val lvl = splits.where(col("level") === t).select(col("node"), col("f"), col("thr"))
      nodes = nodes
        .join(broadcast(lvl), Seq("node"), "left")
        .join(binned.select(col("k"), col("f"), col("bin")), Seq("k", "f"), "left")
        .select(
          col("k"),
          when(col("f").isNull, col("node"))
            .otherwise(col("node") * 2 + when(col("bin") > col("thr"), 1L).otherwise(0L))
            .as("node")
        )
      t += 1
    }
    nodes
  }
}
