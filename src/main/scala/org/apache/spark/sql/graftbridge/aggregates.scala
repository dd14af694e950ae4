package org.apache.spark.sql.graftbridge

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** graft's native Catalyst *aggregate* functions. Same placement rationale as
  * [[expressions.scala]]: the `AbstractDataType` in `ExpectsInputTypes` is
  * `private[sql]`; public faces live in [[graft.functions]].
  */

/** KMV (k-minimum-values) distinct-count sketch: the aggregation buffer is
  * the k smallest DISTINCT hash values seen — a bounded, mergeable state
  * (merge = union, re-trim to k), the canonical sketch shape for NDV at
  * 100 TB: every partial buffer is ≤ k longs no matter how many billions of
  * rows flow through it, and partial aggregation combines map-side before any
  * shuffle (ObjectHashAggregate partial → shuffle of ≤k-long buffers →
  * final merge).
  *
  * Unlike HLL (q34, register arrays with engine-specific encodings), the KMV
  * state is a pure *set minimum* — order-free and therefore exactly
  * deterministic: any engine that computes the same k smallest distinct
  * hashes produces the identical sketch, so the driver gate can hash-check
  * the sketch itself, not just "rows>0". The estimator is the standard
  * (k−1)/v_k with hashes uniform on [0, 2^60) (our md5-window-15 convention,
  * [[graft.functions.Hashing]]): est = (k−1)·2^60 / v_k, evaluated in double
  * (both factors exactly representable; IEEE division + round-half-away are
  * bit-identical in Spark and DuckDB). Relative standard error ≈ 1/√(k−2).
  *
  * Returns the retained hashes as a SORTED ascending array<long> (size ≤ k);
  * the estimator is declarative on top (`graft.operators.Advanced` x49) so
  * the gate checks the full sketch content, and callers can pick other
  * estimators (e.g. Jaccard of two sketches via union/intersection) without
  * touching the aggregate.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with ExpectsInputTypes {

  require(k >= 2, s"kmv_sketch: k must be >= 2, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    // Full buffer and h beyond the current kth minimum: h cannot enter the
    // set (equality means already-present for a set of longs) — skip the
    // tree insert entirely. Otherwise insert and re-trim.
    if (buf.size() < k || h < buf.last()) {
      if (buf.add(h) && buf.size() > k) buf.pollLast()
    }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow
  ): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]
  ): java.util.TreeSet[java.lang.Long] = {
    // Union-then-trim, but short-circuit once b2's candidates exceed b1's
    // kth minimum (b2 iterates ascending — everything after is larger).
    val it = b2.iterator()
    var live = true
    while (live && it.hasNext) {
      val h = it.next().longValue()
      if (buFull(b1) && h >= b1.last()) live = false else add(b1, h)
    }
    b1
  }

  private def buFull(b: java.util.TreeSet[java.lang.Long]): Boolean = b.size() >= k

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out) // ascending: TreeSet iterates in sorted order
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
