package graft.operators

import graft.Graft.table
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Embedding similarity search [EXT] (SURVEY.md §7.1 ext/Similarity) over
  * `embeddings.embedding: array<float>`.
  *
  * x05 is the exact brute-force cosine top-k baseline. Its float arithmetic
  * deliberately mirrors DuckDB's `list_cosine_similarity` (float32 products
  * + float32 accumulation + float32 sqrt/divide) so the oracle hash-matches
  * bit-for-bit: float32 sqrt and divide are emulated through double ops +
  * a cast back to float, which is exact by the 2p+2 double-rounding theorem.
  *
  * x06 is the scale path: random-hyperplane LSH. Signatures are computed in
  * one pass (posexplode → broadcast-join the 16×64 hyperplane table →
  * re-aggregate), candidates meet only inside bucket partitions, and the
  * exact re-rank runs per-bucket — the all-pairs product never happens. At
  * 100 TB the bucket join shuffles on the 16-bit key; skewed buckets are
  * AQE-split. Hyperplanes are seeded deterministically from md5, no RNG.
  */
object Similarity {

  /** float32 sequential dot product of two float arrays. */
  private def dotF(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0f), (acc, x) => acc + x)

  /** float32 sqrt via double sqrt + downcast (exactly rounded). */
  private def sqrtF(x: Column): Column = sqrt(x.cast("double")).cast("float")

  /** float32 cosine from built-in higher-order functions — semantically
    * identical to the native expression; kept as the reference formulation
    * (the equivalence is asserted in SimilaritySpec). */
  private[graft] def cosineDeclarative(a: Column, b: Column): Column = {
    val denom = sqrtF(dotF(a, a)) * sqrtF(dotF(b, b)) // float32 multiply
    (dotF(a, b).cast("double") / denom.cast("double")).cast("float").cast("double")
  }

  /** hot path: the codegen'd native Catalyst expression */
  private def cosineF(a: Column, b: Column): Column = graft.functions.CosineSimF32(a, b)

  /** double-precision cosine for array<double> (centroid math, no oracle) */
  private def cosineD(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact top-5 neighbors for the first 10 vectors (brute force baseline)
    "x05_sim_cosine_topk" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      val q = emb.where(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val c = emb.select(col("vec_id").as("nid"), col("embedding").as("ne"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
      c.join(broadcast(q), col("nid") =!= col("qid"))
        .withColumn("cos", cosineF(col("qe"), col("ne")))
        .withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 5)
        .select("qid", "rk", "nid", "cos")
        .orderBy("qid", "rk")
    }),

    // LSH-bucketed approximate top-k (scale path; rows-only check)
    "x06_sim_ann_lsh" -> ((s, d) => {
      val s_ = s
      val emb = table(s, d, "embeddings")
      val dims = emb.select(size(col("embedding")).as("nd")).head().getInt(0)
      // 16 deterministic hyperplanes: w(p,i) = ±1 from md5(p:i)
      val planes = s_.range(16).toDF("p")
        .crossJoin(s_.range(dims.toLong).toDF("i"))
        .withColumn(
          "wgt",
          (graft.functions.Hashing.md5Bucket(concat_ws(":", col("p"), col("i")), 2L) * 2L - 1L).cast("double")
        )
      val comps = emb
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v")))
        .join(broadcast(planes), "i")
        .groupBy("vec_id", "p")
        .agg(sum(col("v").cast("double") * col("wgt")).as("proj"))
      // 4 OR-ed hash tables of 4 planes each: a pair is a candidate when it
      // collides in ANY band → recall without 2^16-sparse buckets
      val sig = comps
        .groupBy(col("vec_id"), (col("p") / 4).cast("int").as("band"))
        .agg(sum(when(col("proj") > 0, expr("shiftleft(1L, cast(p % 4 as int))")).otherwise(0L)).as("bucket"))
      val withSig = emb.join(sig, "vec_id")
      val q = withSig.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("band"), col("bucket"))
      val cand = withSig.select(col("vec_id").as("nid"), col("embedding").as("ne"), col("band"), col("bucket"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
      cand
        .join(broadcast(q), Seq("band", "bucket"))
        .where(col("nid") =!= col("qid"))
        .select("qid", "qe", "nid", "ne").distinct()
        .withColumn("cos", cosineF(col("qe"), col("ne")))
        .withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 5)
        .select("qid", "rk", "nid", "cos")
        .orderBy("qid", "rk")
    }),

    // IVF-style ANN: inverted lists keyed by `label` (stand-in for a k-means
    // coarse quantizer at this fixture scale), centroids = per-list mean
    // vector. A query probes its 2 nearest centroids and searches only those
    // lists — the candidate set shrinks by ~nlists/nprobe, and at 100 TB the
    // list search is a shuffle on the list id instead of a cross join.
    "x13_sim_ivf" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      val centroids = emb
        .select(col("label"), posexplode(col("embedding")).as(Seq("i", "v")))
        .groupBy("label", "i")
        .agg(avg(col("v").cast("double")).as("c"))
        .groupBy("label")
        .agg(transform(array_sort(collect_list(struct(col("i"), col("c")))), x => x.getField("c")).as("cvec"))
      val q = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), transform(col("embedding"), x => x.cast("double")).as("qe_d"), col("embedding").as("qe"))
      val wc = Window.partitionBy("qid").orderBy(col("ccos").desc, col("label"))
      val probes = q
        .crossJoin(broadcast(centroids))
        .withColumn("ccos", cosineD(col("qe_d"), col("cvec")))
        .withColumn("crk", row_number().over(wc))
        .where(col("crk") <= 2)
        .select("qid", "qe", "label")
      val wn = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
      probes
        .join(emb.select(col("vec_id").as("nid"), col("embedding").as("ne"), col("label")), Seq("label"))
        .where(col("nid") =!= col("qid"))
        .withColumn("cos", cosineF(col("qe"), col("ne")))
        .withColumn("rk", row_number().over(wn).cast("long"))
        .where(col("rk") <= 5)
        .select("qid", "rk", "nid", "cos")
        .orderBy("qid", "rk")
    }),

    // embedding-cosine near-dup pairs (the dedup face of similarity): at
    // scale the same banded-LSH candidate generation applies; the threshold
    // filter is what makes it a dedup operator
    "x12_dedup_embedding" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
      val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("cos", cosineF(col("ea"), col("eb")))
        .where(col("cos") >= 0.4)
        .select("id_a", "id_b", "cos")
        .orderBy("id_a", "id_b")
    })
  )

  def oracles: Map[String, String] = Map(
    "x05_sim_cosine_topk" ->
      """SELECT qid, rk, nid, cos FROM (
        |  SELECT a.vec_id AS qid, b.vec_id AS nid,
        |    list_cosine_similarity(a.embedding, b.embedding) AS cos,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rk
        |  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        |  WHERE a.vec_id < 10)
        |WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,
    // x06 intentionally has no oracle: LSH bucketing is engine-specific → rows-only check
    "x12_dedup_embedding" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_cosine_similarity(a.embedding, b.embedding) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin
  )
}
