package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** graft's native codegen'd Catalyst expressions. They live in this bridge
  * package only because `AbstractDataType` (needed for `ExpectsInputTypes`)
  * is `private[sql]`; the public faces are in [[graft.functions]].
  */

/** Float32 cosine similarity over two `array<float>` columns — float
  * products, sequential float accumulation, float sqrt/divide (emulated via
  * double + downcast, exact by the 2p+2 double-rounding theorem). Matches
  * DuckDB's `list_cosine_similarity` and the declarative formulation in
  * graft.operators.Similarity bit-for-bit, but runs as one tight Java loop
  * inside whole-stage codegen instead of per-element lambda interpretation.
  */
case class CosineSimF32Expr(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_f32"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSimF32Expr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      (a, b) => s"org.apache.spark.sql.graftbridge.CosineSimF32Expr.compute($a, $b)"
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimF32Expr {
  /** Shared by interpreted eval and generated code — one tight loop.
    * Mismatched lengths raise (as DuckDB's list_cosine_similarity does) —
    * silently truncating would mask ragged upstream data. */
  def compute(x: ArrayData, y: ArrayData): Double = {
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"cosine_f32: array length mismatch (${x.numElements()} vs ${y.numElements()})"
      )
    val n = x.numElements()
    var dot = 0f; var na = 0f; var nb = 0f
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i); val yi = y.getFloat(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na.toDouble).toFloat * math.sqrt(nb.toDouble).toFloat
    (dot.toDouble / denom.toDouble).toFloat.toDouble
  }
}

/** Polynomial rolling hash of a string's code points:
  * h ← (h·31 + codePoint) mod `modulus`. Equivalent to the per-character
  * fold `list_reduce(list_prepend(0, list_transform(string_split(s,''),
  * c -> ascii(c))), (acc,x) -> (acc*31+x) % m)` in DuckDB, but evaluated as
  * a single codegen'd loop over the string instead of exploding it into a
  * per-character array with interpreted lambdas (~40× faster at sf0.1).
  */
case class RollingHashExpr(child: Expression, modulus: Long)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(s: Any): Any =
    RollingHashExpr.compute(s.asInstanceOf[UTF8String], modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"org.apache.spark.sql.graftbridge.RollingHashExpr.compute($c, ${modulus}L)"
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHashExpr {
  def compute(s: UTF8String, modulus: Long): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % modulus
      i += Character.charCount(cp)
    }
    h
  }
}

/** DISTINCT md5-window-15 hashes of every `n`-character gram of a string,
  * as one `array<bigint>` — the single-pass replacement for
  * `explode(transform(sequence…, substr)) → distinct → md5 → conv`.
  *
  * Hash convention is exactly [[graft.functions.Hashing.md5Window15]]
  * (first 15 hex digits of md5 as int64 = big-endian u64 of the first 8
  * digest bytes >>> 4), so DuckDB oracles keep computing
  * `('0x' || substr(md5(sh),1,15))::BIGINT` over the string grams and
  * hash-match. Grams are CODE-POINT windows to mirror SQL `substr`
  * semantics on non-ASCII text. Deduplication happens here, inside the
  * row, so downstream per-doc aggregates (MinHash mins) consume the
  * explode directly — no (doc, gram) distinct shuffle exists at all.
  * Output order is sorted for determinism.
  */
case class CharGramHashesExpr(child: Expression, n: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_hashes"

  override protected def nullSafeEval(s: Any): Any =
    CharGramHashesExpr.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"org.apache.spark.sql.graftbridge.CharGramHashesExpr.compute($c, $n)"
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hyperplane-LSH band signatures of one embedding, in one pass:
  * `array<bigint>` where index = band and value = the band's bucket key.
  *
  * Matches graft.operators.Similarity's documented convention exactly —
  * components quantized to round(v·2^20) int64, ±1 weights seeded from
  * md5("p:i") (the same md5-window convention as Hashing.md5Window15),
  * integer projections, bucket = Σ (proj>0) << (p % bandRows) — so the
  * DuckDB oracles that recompute signatures from first principles in SQL
  * still hash-match. Replaces a posexplode → broadcast-join → two shuffled
  * aggregations pipeline with a per-row loop inside codegen: the signature
  * stage becomes embarrassingly parallel, which is the shape you want when
  * signing 100 TB of embeddings.
  */
case class BandSigsExpr(child: Expression, nPlanes: Int, bandRows: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_sigs"

  override protected def nullSafeEval(a: Any): Any =
    BandSigsExpr.compute(a.asInstanceOf[ArrayData], nPlanes, bandRows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"org.apache.spark.sql.graftbridge.BandSigsExpr.compute($c, $nPlanes, $bandRows)"
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BandSigsExpr {

  /** ±1 weight matrix, md5("p:i") mod 2 → {-1, 1} — per-entry deterministic
    * (independent of table size), identical to the SQL
    * `(('0x' || substr(md5(p || ':' || i), 1, 15))::BIGINT % 2) * 2 - 1`.
    * The table GROWS to the observed embedding dimensionality (ADVICE r02:
    * a fixed 256 cap silently ignored components of 384/768/1536-dim
    * embeddings); sizing rounds up to a power of two so concurrent growth
    * converges in O(log dims) regenerations per JVM. */
  private val weightCache = new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Long]]]()
  private def genWeights(nPlanes: Int, dims: Int): Array[Array[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nPlanes, dims) { (p, i) =>
      md.reset()
      val digest = md.digest(s"$p:$i".getBytes("UTF-8"))
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (digest(b) & 0xffL); b += 1 }
      ((v >>> 4) % 2) * 2 - 1 // first 15 hex digits, mod 2, → ±1
    }
  }
  private def weights(nPlanes: Int, minDims: Int): Array[Array[Long]] = {
    val cur = weightCache.get(nPlanes)
    if (cur != null && cur(0).length >= minDims) cur
    else {
      var dims = 256
      while (dims < minDims) dims <<= 1
      weightCache.merge(nPlanes, genWeights(nPlanes, dims), (a, b) => if (a(0).length >= b(0).length) a else b)
    }
  }

  def compute(emb: ArrayData, nPlanes: Int, bandRows: Int): ArrayData = {
    val n = emb.numElements()
    val w = weights(nPlanes, n)
    val vq = new Array[Long](n)
    var i = 0
    while (i < n) {
      // round half AWAY FROM ZERO — SQL round() semantics in both engines
      // (math.round alone is half-toward-+∞, which differs on negative ties)
      val d = emb.getFloat(i).toDouble * (1L << 20)
      vq(i) = if (d < 0) -math.round(-d) else math.round(d)
      i += 1
    }
    val nBands = nPlanes / bandRows
    val buckets = new Array[Long](nBands)
    var p = 0
    while (p < nPlanes) {
      var proj = 0L
      val wp = w(p)
      var j = 0
      while (j < n) { proj += vq(j) * wp(j); j += 1 }
      if (proj > 0) buckets(p / bandRows) |= 1L << (p % bandRows)
      p += 1
    }
    ArrayData.toArrayData(buckets)
  }
}

/** 62-bit SimHash signature of a document as `array<bigint>` of
  * [lo, hi] — two 31-bit halves from two md5 windows per token.
  *
  * Exactly graft.operators.Dedup's documented convention: whitespace
  * tokens of lower(trim(text)) (Spark's own UTF8String lower/trim so
  * semantics match the `split(lower(trim(text)), '\\s+')` formulation),
  * h1 = md5 hex[1..15] mod 2^31, h2 = md5 hex[17..31] mod 2^31, one ±1
  * vote per token INSTANCE per bit, sign → bit. The SimHash vote tally is
  * per-document state only, so the whole signature is a per-row loop —
  * the explode → 62-conditional-sum aggregation it replaces shuffled every
  * token to compute what this evaluates inside one codegen stage.
  * The DuckDB oracle keeps recomputing signatures from first principles.
  */
case class SimHashSigExpr(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_sig"

  override protected def nullSafeEval(s: Any): Any =
    SimHashSigExpr.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graftbridge.SimHashSigExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSigExpr {
  def compute(s: UTF8String): ArrayData = {
    val text = s.trim().toLowerCase.toString
    val votes1 = new Array[Long](31)
    val votes2 = new Array[Long](31)
    val md = java.security.MessageDigest.getInstance("MD5")
    val toks = text.split("\\s+")
    var t = 0
    while (t < toks.length) {
      md.reset()
      val digest = md.digest(toks(t).getBytes("UTF-8"))
      var hi1 = 0L; var hi2 = 0L
      var b = 0
      while (b < 8) {
        hi1 = (hi1 << 8) | (digest(b) & 0xffL)
        hi2 = (hi2 << 8) | (digest(b + 8) & 0xffL)
        b += 1
      }
      val h1 = (hi1 >>> 4) % 2147483648L // md5 hex [1..15] mod 2^31
      val h2 = (hi2 >>> 4) % 2147483648L // md5 hex [17..31] mod 2^31
      var bit = 0
      while (bit < 31) {
        votes1(bit) += (if (((h1 >> bit) & 1L) == 1L) 1L else -1L)
        votes2(bit) += (if (((h2 >> bit) & 1L) == 1L) 1L else -1L)
        bit += 1
      }
      t += 1
    }
    var lo = 0L; var hi = 0L
    var bit = 0
    while (bit < 31) {
      if (votes1(bit) > 0) lo |= 1L << bit
      if (votes2(bit) > 0) hi |= 1L << bit
      bit += 1
    }
    ArrayData.toArrayData(Array(lo, hi))
  }
}

/** DISTINCT md5-window-15 hashes of every word `n`-gram (space-joined
  * whitespace tokens of lower(trim(text))) — the word-shingle analog of
  * [[CharGramHashesExpr]], same hash convention, same per-row dedup, same
  * sorted-array determinism. The DuckDB oracles recompute
  * `('0x' || substr(md5(gram), 1, 15))::BIGint` over string grams. */
case class TokenGramHashesExpr(child: Expression, n: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_gram_hashes"

  override protected def nullSafeEval(s: Any): Any =
    TokenGramHashesExpr.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"org.apache.spark.sql.graftbridge.TokenGramHashesExpr.compute($c, $n)"
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenGramHashesExpr {
  def compute(s: UTF8String, n: Int): ArrayData = {
    val toks = s.trim().toLowerCase.toString.split("\\s+")
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.TreeSet[java.lang.Long]()
    var g = 0
    while (g + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(g))
      var k = 1
      while (k < n) { sb.append(' ').append(toks(g + k)); k += 1 }
      md.reset()
      val digest = md.digest(sb.toString.getBytes("UTF-8"))
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (digest(b) & 0xffL); b += 1 }
      seen.add(v >>> 4)
      g += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    ArrayData.toArrayData(out)
  }
}

/** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
  * standard local document sketch for plagiarism/overlap detection): over
  * the POSITIONAL sequence of char `n`-gram md5-window hashes, slide a
  * `w`-gram window and record each window's minimum; the sorted distinct
  * minima are the fingerprint set. Guarantee: any shared substring of at
  * least w+n−1 characters contributes at least one shared fingerprint.
  *
  * Single pass with a monotonic deque (O(length)), inside codegen — the
  * oracle recomputes the identical selection in SQL from substr+md5 first
  * principles (positions matter here, so [[CharGramHashesExpr]]'s per-row
  * distinct is NOT reusable). Input is expected pre-normalized (the caller
  * applies lower/trim/whitespace-collapse so both engines normalize
  * identically). */
case class WinnowFingerprintExpr(child: Expression, n: Int, w: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(s: Any): Any =
    WinnowFingerprintExpr.compute(s.asInstanceOf[UTF8String], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"org.apache.spark.sql.graftbridge.WinnowFingerprintExpr.compute($c, $n, $w)"
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprintExpr {
  def compute(s: UTF8String, n: Int, w: Int): ArrayData = {
    // gram hashing runs directly over the UTF-8 bytes: code-point starts
    // are byte offsets, and md5 digests the byte slice in place — no
    // per-gram String allocation or re-encode (identical digests: a
    // code-point substring's UTF-8 form IS the byte slice)
    val bytes = s.getBytes
    val cps = GramBytes.codePointStarts(bytes)
    val total = cps.length
    val nGrams = total - n + 1
    if (nGrams < w) return ArrayData.toArrayData(Array.emptyLongArray)
    val hashes = GramBytes.gramHashes(bytes, cps, n)
    // sliding-window minimum via monotonic deque of indices
    val fps = new java.util.TreeSet[java.lang.Long]()
    val deque = new java.util.ArrayDeque[Integer]()
    var j = 0
    while (j < nGrams) {
      while (!deque.isEmpty && hashes(deque.peekLast()) >= hashes(j)) deque.pollLast()
      deque.addLast(j)
      if (deque.peekFirst() <= j - w) deque.pollFirst()
      if (j >= w - 1) fps.add(hashes(deque.peekFirst()))
      j += 1
    }
    val out = new Array[Long](fps.size)
    val it = fps.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    ArrayData.toArrayData(out)
  }
}

object CharGramHashesExpr {
  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val cps = GramBytes.codePointStarts(bytes)
    val total = cps.length
    if (total < n) return ArrayData.toArrayData(Array.emptyLongArray)
    val hashes = GramBytes.gramHashes(bytes, cps, n)
    val seen = new java.util.TreeSet[java.lang.Long]()
    var g = 0
    while (g < hashes.length) { seen.add(hashes(g)); g += 1 }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    ArrayData.toArrayData(out)
  }
}

/** ALL md5-window-15 hashes of every `n`-character gram, positional order,
  * duplicates KEPT — the frequency-preserving sibling of
  * [[CharGramHashesExpr]] (x09's trigram profiles weight by occurrence
  * count, so per-row dedup would be wrong there). Same hash convention,
  * same single codegen'd pass; replaces the
  * `explode(transform(sequence…, substring))` formulation whose
  * interpreted lambda re-walks the string per gram (O(len²) on UTF-8 —
  * measured 77 s at the 16× probe vs 6 s for this). */
case class CharGramAllHashesExpr(child: Expression, n: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_all_hashes"

  override protected def nullSafeEval(s: Any): Any =
    CharGramAllHashesExpr.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"org.apache.spark.sql.graftbridge.CharGramAllHashesExpr.compute($c, $n)"
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharGramAllHashesExpr {
  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val cps = GramBytes.codePointStarts(bytes)
    if (cps.length < n) return ArrayData.toArrayData(Array.emptyLongArray)
    ArrayData.toArrayData(GramBytes.gramHashes(bytes, cps, n))
  }
}

/** Shared byte-level gram machinery: positional char n-gram md5-window-15
  * hashes computed straight off a string's UTF-8 bytes (code-point starts
  * are byte offsets; the digest consumes byte slices in place — zero
  * per-gram allocation). Hash values are identical to digesting the
  * code-point substring, because a substring's UTF-8 encoding IS the byte
  * slice. */
object GramBytes {
  def codePointStarts(bytes: Array[Byte]): Array[Int] = {
    val starts = new Array[Int](bytes.length)
    var i = 0
    var k = 0
    while (i < bytes.length) {
      starts(k) = i
      k += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    java.util.Arrays.copyOf(starts, k)
  }

  /** hash of every positional n-gram: first 15 md5 hex digits as int64 */
  def gramHashes(bytes: Array[Byte], cps: Array[Int], n: Int): Array[Long] = {
    val total = cps.length
    val nGrams = total - n + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      val from = cps(g)
      val until = if (g + n < total) cps(g + n) else bytes.length
      md.reset()
      md.update(bytes, from, until - from)
      val digest = md.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (digest(b) & 0xffL); b += 1 }
      hashes(g) = v >>> 4
      g += 1
    }
    hashes
  }
}

/** Jaro–Winkler similarity of two strings — the standard algorithm
  * (Winkler 1990: Jaro match/transposition counts within the
  * ⌊max(l1,l2)/2⌋−1 window, then the ≤4-char common-prefix boost at scale
  * 0.1 above the 0.7 threshold), computed with the EXACT double-arithmetic
  * order DuckDB's `jaro_winkler_similarity` uses, so gate values are
  * bit-identical: (m/l1 + m/l2 + (m−t)/m)/3, then j + l·0.1·(1−j).
  * Matching is over UTF-16 code units (the fixture corpora are ASCII).
  * Degenerate convention follows DuckDB, not the classical paper: ANY
  * empty side (including both empty) returns 0.0. One tight codegen'd
  * loop — the levenshtein-class scalar this engine's ER operators pair
  * with lossless candidate generation (x108/x147).
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpr.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      (a, b) => s"org.apache.spark.sql.graftbridge.JaroWinklerExpr.compute($a, $b)"
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpr {
  def compute(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0 // DuckDB's degenerate convention
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val from = math.max(0, i - window)
      val until = math.min(l2, i + window + 1)
      var j = from
      var found = false
      while (j < until && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val j = (m / l1.toDouble + m / l2.toDouble + (m - t) / m.toDouble) / 3.0
    if (j > 0.7) {
      var l = 0
      val maxP = math.min(4, math.min(l1, l2))
      while (l < maxP && s1.charAt(l) == s2.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    } else j
  }
}
