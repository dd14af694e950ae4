package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{Bridge, CosineSimF32Expr, RollingHashExpr}

/** Public Column-API faces of graft's native codegen'd Catalyst expressions
  * (SURVEY.md §7.3 preference order: built-in → native Expression → UDF;
  * UDFs are never used in graft). Implementations live in
  * [[org.apache.spark.sql.graftbridge]] (they need `private[sql]` types).
  */
object CosineSimF32 {
  def apply(a: Column, b: Column): Column =
    Bridge.column(CosineSimF32Expr(Bridge.expression(a), Bridge.expression(b)))
}

object RollingHash {
  def apply(s: Column, modulus: Long = 1000000007L): Column =
    Bridge.column(RollingHashExpr(Bridge.expression(s), modulus))
}

object CharGramHashes {
  def apply(s: Column, n: Int): Column =
    Bridge.column(org.apache.spark.sql.graftbridge.CharGramHashesExpr(Bridge.expression(s), n))
}

object CharGramAllHashes {
  def apply(s: Column, n: Int): Column =
    Bridge.column(org.apache.spark.sql.graftbridge.CharGramAllHashesExpr(Bridge.expression(s), n))
}

object TokenGramHashes {
  def apply(s: Column, n: Int): Column =
    Bridge.column(org.apache.spark.sql.graftbridge.TokenGramHashesExpr(Bridge.expression(s), n))
}

object SimHashSig {
  def apply(text: Column): Column =
    Bridge.column(org.apache.spark.sql.graftbridge.SimHashSigExpr(Bridge.expression(text)))
}

object BandSigs {
  def apply(emb: Column, nPlanes: Int, bandRows: Int): Column =
    Bridge.column(org.apache.spark.sql.graftbridge.BandSigsExpr(Bridge.expression(emb), nPlanes, bandRows))
}

object WinnowFingerprints {
  def apply(s: Column, n: Int, w: Int): Column =
    Bridge.column(org.apache.spark.sql.graftbridge.WinnowFingerprintExpr(Bridge.expression(s), n, w))
}

/** KMV distinct-count sketch aggregate (native TypedImperativeAggregate —
  * bounded k-long buffer, map-side partials, mergeable). Returns the k
  * smallest distinct input hashes as a sorted array<long>; see
  * [[org.apache.spark.sql.graftbridge.KmvSketchAgg]] for the estimator. */
object KmvSketch {
  def apply(hash: Column, k: Int): Column =
    Bridge.column(
      org.apache.spark.sql.graftbridge
        .KmvSketchAgg(Bridge.expression(hash), k)
        .toAggregateExpression()
    )
}

/** Misra–Gries heavy-hitters aggregate (native TypedImperativeAggregate —
  * ≤ k (item, counter) buffer, map-side partials, mergeable per Agarwal
  * et al.). Returns the retained items as a sorted array<string>; only
  * the structural guarantee (true count > N/k ⇒ retained) is
  * order-independent — never gate-compare the counters. */
object MisraGries {
  def apply(item: Column, k: Int): Column =
    Bridge.column(
      org.apache.spark.sql.graftbridge
        .MisraGriesAgg(Bridge.expression(item), k)
        .toAggregateExpression()
    )
}

/** Deterministic-compaction mergeable quantile sketch (≤ k·levels longs,
  * level-wise merge, map-side partials). Sketch CONTENT is merge-order
  * dependent — only the worst-case rank guarantee (error ≤ 2·N·levels/k)
  * may cross a hash gate. Returns flattened (weight, value) pairs. */
object QuantileSketch {
  def apply(value: Column, k: Int): Column =
    Bridge.column(
      org.apache.spark.sql.graftbridge
        .QuantileSketchAgg(Bridge.expression(value), k)
        .toAggregateExpression()
    )
}

/** Count-min frequency sketch aggregate (native TypedImperativeAggregate —
  * fixed depth×width long-array buffer, pointwise-sum merge, map-side
  * partials). Counters are pure sums, so the sketch is fully
  * order-independent and gate-hashable; point estimates are taken
  * declaratively on the returned row-major array<long>. */
object CountMin {
  def apply(item: Column, depth: Int, width: Int): Column =
    Bridge.column(
      org.apache.spark.sql.graftbridge
        .CountMinAgg(Bridge.expression(item), depth, width)
        .toAggregateExpression()
    )
}

/** HyperLogLog NDV sketch aggregate (native TypedImperativeAggregate —
  * 2^p one-byte registers, pointwise-max merge, map-side partials).
  * Registers are per-slot maxes, so like count-min (and unlike MG /
  * quantile content) the full sketch is order-independent and
  * gate-hashable; the estimator is taken declaratively on the returned
  * array<long> of register values. */
object HllSketch {
  def apply(item: Column, p: Int): Column =
    Bridge.column(
      org.apache.spark.sql.graftbridge
        .HllSketchAgg(Bridge.expression(item), p)
        .toAggregateExpression()
    )
}

/** Jaro–Winkler similarity (native codegen'd expression; bit-identical to
  * DuckDB's `jaro_winkler_similarity` — see
  * [[org.apache.spark.sql.graftbridge.JaroWinklerExpr]]). */
object JaroWinkler {
  def apply(a: Column, b: Column): Column =
    Bridge.column(org.apache.spark.sql.graftbridge.JaroWinklerExpr(Bridge.expression(a), Bridge.expression(b)))
}
