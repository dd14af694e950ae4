package graft.operators

import graft.TestSpark
import graft.functions.Hashing
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x125's dictionary law beyond the gate: codes are a DENSE 0..V−1
  * lexicographic enumeration (order-preserving, gap-free), invariant to
  * input partitioning — i.e. the prefix-sum assignment equals the global
  * sort it replaces, on adversarial vocabularies that straddle 2-char
  * bucket boundaries. */
class DictionarySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def assign(wordsIn: Seq[String], parts: Int): Map[String, Long] = {
    import spark.implicits._
    val words = wordsIn.toDF("word").repartition(parts).distinct()
      .withColumn("bkt", substring(col("word"), 1, 2))
    val wOff = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = words
      .groupBy("bkt")
      .agg(count(lit(1)).as("bn"))
      .withColumn("offset", coalesce(sum("bn").over(wOff), lit(0L)))
      .select("bkt", "offset")
    val wLoc = Window
      .partitionBy("bkt")
      .orderBy("word")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    words
      .join(broadcast(offsets), Seq("bkt"))
      .withColumn("code", col("offset") + count(lit(1)).over(wLoc) - 1L)
      .select("word", "code")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
  }

  // bucket-boundary adversaries: shared 1/2/3-char prefixes, a bare
  // 1-char word that is a strict prefix of its bucket-mates, duplicates
  private val vocab = Seq(
    "a", "aa", "aaa", "ab", "abc", "b", "ba", "b0", "zz", "zzz", "z",
    "m", "ma", "mb", "m9", "aa", "b", "zzz"
  )

  test("codes are dense, 0-based, lexicographic — equal to the global sort") {
    val expect = vocab.distinct.sorted.zipWithIndex.map { case (w, i) => w -> i.toLong }.toMap
    for (parts <- Seq(1, 3, 16)) {
      assert(assign(vocab, parts) == expect, s"parts=$parts")
    }
  }

  test("corpus vocabulary: dense cover of 0..V-1 and order-preserving") {
    import spark.implicits._
    val docs = graft.Graft
      .table(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .where(col("word") =!= "")
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSeq
    val got = assign(docs, 16)
    assert(got.values.toSeq.sorted == (0L until got.size.toLong))
    val bySorted = docs.distinct.sorted
    bySorted.zipWithIndex.foreach { case (w, i) => assert(got(w) == i.toLong, w) }
  }
}
