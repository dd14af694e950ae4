package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 operators: x41 line-level boilerplate dedup (expected output
  * recomputed from the LineFixture formulas, independent of the operator)
  * and q47 higher-order array functions (expected values recomputed in
  * plain Scala from the parquet floats).
  */
class LineDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("x41 line dedup: boilerplate lines removed, unique content kept in order") {
    // independent reference: line document-frequencies from the fixture formulas
    val allLines = (0 until 400).map(i => i -> LineFixture.docLines(i))
    val df = allLines
      .flatMap { case (i, ls) => ls.map(l => (l.toLowerCase.trim, i)) }
      .groupBy(_._1)
      .view
      .mapValues(_.map(_._2).distinct.size)
      .toMap
    // the planted separation must actually hold: pool lines far above the
    // threshold, unique lines at df = 1
    val (boiler, unique) = df.partition(_._2 >= LineFixture.dfThreshold)
    assert(boiler.size === 10, "every pool line crosses the threshold")
    assert(boiler.values.forall(_ >= 30))
    assert(unique.values.forall(_ === 1))

    val rows = Curation
      .queries("x41_line_dedup")(spark, "unused")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(rows.size === 400)
    for (i <- Seq(0, 1, 7, 123, 399)) {
      val ls = LineFixture.docLines(i)
      val kept = ls.filter(l => df(l.toLowerCase.trim) < LineFixture.dfThreshold)
      assert(rows(i.toLong)._1 === ls.length.toLong, s"doc $i n_lines")
      assert(rows(i.toLong)._2 === kept.length.toLong, s"doc $i n_kept")
      assert(rows(i.toLong)._3 === md5hex(kept.mkString("\n")), s"doc $i kept_md5")
    }
    // every document loses at least its j=1 pool line but keeps content
    assert(rows.values.forall { case (n, k, _) => k < n && k >= 3 })
  }

  test("q47 higher-order functions: lambda arithmetic matches plain Scala") {
    val sf = "/root/testdata/sf0.001"
    val got = Advanced
      .queries("q47_higher_order")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val raw = spark.read
      .parquet(s"$sf/embeddings.parquet")
      .where("vec_id < 50")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
      .toMap
    assert(got.keySet === raw.keySet)
    def e6(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    for ((id, xs) <- raw) {
      val nPos = xs.count(_ > 0).toLong
      val l1 = xs.map(v => e6(math.abs(v) * 1e6)).sum
      val revDot = xs.zip(xs.reverse).map { case (a, b) => e6(a * b * 1e6) }.sum
      val argmax = (xs.indexOf(xs.max) + 1).toLong
      assert(got(id) === ((nPos, l1, revDot, argmax)), s"vec $id")
    }
  }
}
