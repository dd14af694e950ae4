package graft.operators

/** In-memory reference BPE (Sennrich et al. 2016 semantics): weighted pair
  * counts over a word-frequency vocab, argmax with (count desc, pair asc)
  * ties, left-to-right non-overlapping merges. Shared by BpeTrainSpec
  * (merge-table parity) and BpeEncodeSpec (encode parity). */
object BpeReference {

  /** One left-to-right non-overlapping merge pass of (a, b). */
  def mergeWord(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { out += (a + b); i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** The textbook trainer: k rounds of count → argmax → re-segment. */
  def train(vocab: Map[String, Long], rounds: Int): Seq[(String, String, Long)] = {
    var seg: Map[Vector[String], Long] =
      vocab.groupMapReduce { case (w, _) => w.map(_.toString).toVector } { case (_, n) => n }(_ + _)
    (1 to rounds).map { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- seg; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      val ((a, b), c) = counts.minBy { case ((p1, p2), n) => (-n, p1, p2) }
      seg = seg.groupMapReduce { case (syms, _) => mergeWord(syms, a, b) } { case (_, n) => n }(_ + _)
      (a, b, c)
    }
  }

  /** Encode one word by replaying the merges in learned order. */
  def encode(w: String, merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(w.map(_.toString).toVector) { case (syms, (a, b)) => mergeWord(syms, a, b) }

  /** The module-wide md5 window-15 bucket (graft.functions.Hashing twin),
    * computed in plain JVM for spec-side expectations. */
  def md5Bucket(s: String, m: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % m
  }
}
