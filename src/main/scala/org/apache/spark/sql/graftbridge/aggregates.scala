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

/** Misra–Gries heavy-hitters sketch: the aggregation buffer is ≤ k
  * (item, counter) pairs — bounded, MERGEABLE state (Agarwal et al. 2012,
  * "Mergeable Summaries": pointwise-sum counters, then subtract the
  * (k+1)-th largest and drop non-positives), the canonical frequent-items
  * shape at 100 TB: partial buffers stay ≤ k entries through billions of
  * rows and combine map-side before any shuffle.
  *
  * The per-item estimate is ORDER-DEPENDENT (decrements depend on arrival
  * interleaving), so estimates must never cross the driver's hash gate.
  * What IS order-independent is the structural guarantee: total
  * undercount ≤ N/(k+1), hence every item with true count > N/k is
  * retained by every execution — the x94 gate pins exactly that
  * (membership of exact-twin-verified heavy items), never the counters.
  *
  * Returns the retained items as a sorted array<string> (size ≤ k).
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
    with ExpectsInputTypes {

  require(k >= 1, s"misra_gries: k must be >= 1, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(
      buf: java.util.HashMap[String, Long],
      input: InternalRow
  ): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      val cur = buf.get(item)
      if (cur != 0L || buf.containsKey(item)) buf.put(item, cur + 1L)
      else if (buf.size() < k) buf.put(item, 1L)
      else decrementAll(buf) // classic MG: full + absent ⇒ all counters -1
    }
    buf
  }

  private def decrementAll(buf: java.util.HashMap[String, Long]): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
    }
  }

  override def merge(
      b1: java.util.HashMap[String, Long],
      b2: java.util.HashMap[String, Long]
  ): java.util.HashMap[String, Long] = {
    // pointwise sum
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = b1.get(e.getKey)
      b1.put(e.getKey, cur + e.getValue)
    }
    // trim to k: subtract the (k+1)-th largest counter from everything
    if (b1.size() > k) {
      val counts = new Array[Long](b1.size())
      var i = 0
      val vs = b1.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(b1.size() - k - 1) // (k+1)-th largest
      val es = b1.entrySet().iterator()
      while (es.hasNext) {
        val e = es.next()
        if (e.getValue <= sub) es.remove() else e.setValue(e.getValue - sub)
      }
    }
    b1
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val items = new Array[String](buf.size())
    val it = buf.keySet().iterator()
    var i = 0
    while (it.hasNext) { items(i) = it.next(); i += 1 }
    java.util.Arrays.sort(items.asInstanceOf[Array[AnyRef]])
    new GenericArrayData(items.map(org.apache.spark.unsafe.types.UTF8String.fromString(_)))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // length-prefixed raw UTF-8, not writeUTF: items are arbitrary
      // strings and writeUTF throws past 64 KiB of encoded length
      val kb = e.getKey.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb); out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.put(new String(kb, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Deterministic-compaction mergeable quantile sketch (the MRL/KLL compactor
  * scheme with the random bit removed — Manku et al. 1998 / Karnin et al.
  * 2016): the buffer is a stack of levels, level `i` holding items of
  * weight 2^i, each level capped at `k` items. A full level sorts and
  * compacts: survivors at odd indices promote with doubled weight (an odd
  * count retains its maximum at the level), so TOTAL WEIGHT IS PRESERVED
  * EXACTLY — Σ weights ≡ N always. Merge = level-wise concatenation +
  * cascaded compaction: bounded (≤ k·levels longs), mergeable, map-side
  * partials — the quantile member of the native sketch family (KMV =
  * distinct, MG = heavy hitters, CM = frequency).
  *
  * Determinism contract: unlike CM (pure sums), the retained ITEMS depend
  * on merge order, so sketch content must never cross the driver's hash
  * gate. What IS order-independent is the worst-case rank guarantee: each
  * compaction at level i perturbs any rank by ≤ 2^i, and at most
  * ⌈N/(2^(i−1)·k)⌉ compactions happen per level, so the total rank error
  * is ≤ 2·N·L/k with L the level count — the x118 gate pins exactly that
  * sandwich (plus exact-twin percentiles), the x94 discipline.
  *
  * Returns flattened (weight, value) pairs as array<long>
  * [w0,v0,w1,v1,...], sorted by (value, weight) for a stable shape.
  */
case class QuantileSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Long]]]
    with ExpectsInputTypes {

  type Levels = scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Long]]

  require(k >= 4 && k % 2 == 0, s"quantile_sketch: k must be even and >= 4, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "quantile_sketch"

  override def createAggregationBuffer(): Levels =
    scala.collection.mutable.ArrayBuffer(scala.collection.mutable.ArrayBuffer.empty[Long])

  private def compactCascade(lv: Levels, from: Int): Unit = {
    var i = from
    while (i < lv.length && lv(i).length >= k) {
      if (i + 1 == lv.length) lv += scala.collection.mutable.ArrayBuffer.empty[Long]
      val buf = lv(i)
      val arr = buf.toArray
      java.util.Arrays.sort(arr)
      val even = arr.length - (arr.length % 2)
      val next = lv(i + 1)
      var j = 1
      while (j < even) { next += arr(j); j += 2 } // odd indices promote, weight doubles
      buf.clear()
      if (even < arr.length) buf += arr(arr.length - 1) // odd one out: retain the max
      i += 1
    }
  }

  override def update(lv: Levels, input: InternalRow): Levels = {
    val v = child.eval(input)
    if (v != null) {
      lv(0) += v.asInstanceOf[Long]
      if (lv(0).length >= k) compactCascade(lv, 0)
    }
    lv
  }

  override def merge(b1: Levels, b2: Levels): Levels = {
    while (b1.length < b2.length) b1 += scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i < b2.length) { b1(i) ++= b2(i); i += 1 }
    compactCascade(b1, 0)
    // concatenation can overfill a level below a cascade that already ran
    i = 0
    while (i < b1.length) { if (b1(i).length >= k) compactCascade(b1, i); i += 1 }
    b1
  }

  override def eval(lv: Levels): Any = {
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (value, weight)
    var i = 0
    while (i < lv.length) {
      val w = 1L << i
      lv(i).foreach(v => pairs += ((v, w)))
      i += 1
    }
    val sorted = pairs.sortBy(identity)
    val out = new Array[Long](sorted.length * 2)
    var j = 0
    sorted.foreach { case (v, w) => out(j) = w; out(j + 1) = v; j += 2 }
    new GenericArrayData(out)
  }

  override def serialize(lv: Levels): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(lv.length)
    lv.foreach { b =>
      out.writeInt(b.length)
      b.foreach(out.writeLong)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Levels = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val lv = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[Long]]
    var i = 0
    while (i < n) {
      val m = in.readInt()
      val b = scala.collection.mutable.ArrayBuffer.empty[Long]
      var j = 0
      while (j < m) { b += in.readLong(); j += 1 }
      lv += b
      i += 1
    }
    if (lv.isEmpty) lv += scala.collection.mutable.ArrayBuffer.empty[Long]
    lv
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Count-min sketch (Cormode & Muthukrishnan 2005): `depth` rows of `width`
  * counters; each input item increments one counter per row at
  * `h_i(item) = md5Window15("cm" + i + ":" + item) mod width`. Point
  * estimate (taken declaratively on the output array) = min over rows of
  * the probed counters — always ≥ the true count, and ≤ true + εN with
  * probability 1−δ for width = ⌈e/ε⌉, depth = ⌈ln(1/δ)⌉.
  *
  * The frequency companion to [[KmvSketchAgg]] (distinct) and
  * [[MisraGriesAgg]] (heavy hitters), with a property neither has: counters
  * are pure SUMS, so the whole sketch is order-independent — byte-identical
  * across partitionings and executions — and the driver gate can hash-check
  * the FULL sketch content against a SQL replay (group-by over the same md5
  * bucket formula), not just a structural guarantee. State is a fixed
  * depth×width long array (merge = pointwise sum, map-side partials): at
  * 100 TB the shuffle carries one ~`8·d·w`-byte buffer per partition, never
  * the stream.
  *
  * The hash matches [[graft.functions.Hashing.md5Window15]] exactly (first
  * 15 md5 hex digits as an int64), so DuckDB replays it with
  * `('0x' || substr(md5('cm' || i || ':' || item), 1, 15))::BIGINT % width`.
  *
  * Returns the counters as array<long> of length depth·width, row-major.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]]
    with ExpectsInputTypes {

  require(depth >= 1 && depth <= 16, s"count_min: depth must be in [1,16], got $depth")
  require(width >= 2, s"count_min: width must be >= 2, got $width")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  // hoisted out of the per-row path: one digest instance per task (digest()
  // resets it) and the per-row salt prefixes built once
  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")
  @transient private lazy val salts: Array[Array[Byte]] =
    Array.tabulate(depth)(i => s"cm$i:".getBytes("UTF-8"))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val itemBytes = v.toString.getBytes("UTF-8")
      var i = 0
      while (i < depth) {
        md.update(salts(i))
        md.update(itemBytes)
        val dig = md.digest()
        // first 15 hex digits = high 60 bits of the digest, as in md5Window15
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
        h = h >>> 4 // 64 bits read, keep the top 60 (15 hex chars)
        buf(i * width + (h % width).toInt) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007, the
  * HyperLogLog paper; practical corrections per Heule et al. 2013 §4,
  * small-range only — our 60-bit hash space never reaches the large-range
  * regime). Completes the native sketch family as the FIFTH mergeable
  * aggregate: KMV (x49, exact k-min state), Misra–Gries (x94, heavy-hitter
  * membership), count-min (x107, frequency), quantile (x118, ranks) — and
  * now the constant-memory NDV estimator that the others' use cases
  * compose with at 100 TB: `m = 2^p` one-byte registers per GROUP, total
  * state `m` bytes no matter how many billion rows flow through, map-side
  * partials, merge = pointwise max.
  *
  * Register discipline mirrors the count-min bucket convention so the
  * driver gate can replay the FULL sketch in SQL (registers are per-slot
  * MAXes — order-independent, like count-min's sums and unlike MG/quantile
  * content):
  *   - `h`   = md5Window15("hll:" + item)          — uniform on [0, 2^60)
  *   - `idx` = h mod m                             — register slot
  *   - `w`   = h div m                             — (60 − p) stochastic bits
  *   - `rho` = (60 − p) − bitlen(w) + 1            — leading-zero rank;
  *             w = 0 ⇒ rho = (60 − p) + 1 (the all-zeros pattern)
  *   - `M[idx] ← max(M[idx], rho)`
  * DuckDB replay: `CASE WHEN hv // m = 0 THEN 60 - p + 1 ELSE 60 - p + 1 -
  * length(bin(hv // m)) END` (bin() = exact integer bit length — never
  * float log2, whose boundary rounding could flip a register).
  *
  * The estimator lives DECLARATIVELY on the returned array (like x49/x107)
  * so the gate pins sketch content and the estimate: the harmonic-mean sum
  * Σ 2^−M[j] is computed as the exact integer Σ 2^(maxRho − M[j])
  * (order-free; ≤ m·2^maxRho < 2^63 for p ≥ 4), and only the final
  * alpha·m²·2^maxRho / Z division happens in double — one IEEE op,
  * bit-identical across engines.
  *
  * Returns the m registers as array<long> (index order, zeros included).
  */
case class HllSketchAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Byte]]
    with ExpectsInputTypes {

  require(p >= 4 && p <= 16, s"hll_sketch: p must be in [4,16], got $p")

  private val m = 1 << p
  private val wBits = 60 - p // stochastic bits left after the slot index

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "hll_sketch"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")
  @transient private lazy val salt: Array[Byte] = "hll:".getBytes("UTF-8")

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      md.update(salt)
      md.update(v.toString.getBytes("UTF-8"))
      val dig = md.digest()
      // first 15 hex digits = top 60 bits of the digest (md5Window15)
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
      h = h >>> 4
      val idx = (h % m).toInt
      val w = h / m
      // bitlen(w) = 64 - nlz(w); w = 0 falls out naturally: bitlen = 0
      val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(w)
      val rho = (wBits + 1 - bitlen).toByte
      if (rho > buf(idx)) buf(idx) = rho
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Long](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toLong; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
