package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x164 Naive Bayes train + held-out eval on planted corpora: training on
  * the even half must recover a separation the fixture makes learnable,
  * and the dense smoothing grid must route docs of an untrained language
  * onto trained classes (never an 'und' fallback — every doc has
  * features, so every doc gets an argmax).
  */
class NbClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** (lang, pred_lang, is_train, n_docs, heldout_acc_ppm) per row */
  private def run(rows: Seq[(Long, String, String)]): Array[(String, String, Boolean, Long, Long)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nb_spec").toString
    rows.toDF("doc_id", "lang", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    TextAnalysis
      .queries("x164_nb_classifier")(spark, dir)
      .collect()
      .map(r =>
        (r.getString(0), r.getString(1), r.getBoolean(2), r.getLong(3), r.getAs[Long]("heldout_acc_ppm"))
      )
  }

  test("disjoint-vocabulary languages: diagonal confusion, held-out accuracy 1.0") {
    // even and odd docs of each language share the same marker vocabulary,
    // so the even-trained likelihoods transfer to the held-out odd half
    def xxDoc(i: Int) = s"krzko przkt vrzkq zrzkw brzk m${i % 5}"
    def yyDoc(i: Int) = s"feenaa veenoo teenee weenuu seenii m${i % 5}"
    val rows = (0 until 40).map { i =>
      if (i % 4 < 2) (i.toLong, "xx", xxDoc(i)) else (i.toLong, "yy", yyDoc(i))
    }
    val out = run(rows)
    assert(out.forall { case (lang, pred, _, _, _) => lang == pred }, out.mkString(", "))
    // heldout_acc_ppm rides every row as the broadcast eval column
    assert(out.map(_._5).toSet === Set(1000000L))
    // both splits appear and account for every document
    assert(out.map(_._4).sum === 40L)
    assert(out.map(_._3).toSet === Set(true, false))
  }

  test("a language absent from the train split routes onto trained classes, never 'und'") {
    // 'zz' exists only at odd ids: no class is trained for it, but its
    // docs still argmax over the trained {xx, yy} grid (dense smoothing
    // gives every (lang, bucket) a weight)
    val rows =
      (0 until 20).map(i => (i.toLong, "xx", s"krzko przkt vrzkq b${i % 3}")) ++
        Seq((21L, "zz", "feenaa veenoo teenee"), (23L, "zz", "feenaa weenuu seenii"))
    val out = run(rows)
    val zzPreds = out.filter(_._1 == "zz").map(_._2).toSet
    assert(zzPreds.nonEmpty && zzPreds.subsetOf(Set("xx")), s"zz predicted as: $zzPreds")
    assert(!out.exists(_._2 == "und"), "argmax must always produce a trained class")
    assert(out.map(_._4).sum === 22L)
  }
}
