package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x122's quarantine contract beyond the gate census:
  *   - conservation: every input LINE lands in exactly one class;
  *   - the corrupt channel carries the raw line verbatim (re-drive path);
  *   - truncated rows keep their parsed key prefix;
  *   - a wholly clean feed quarantines nothing.
  */
class CorruptCsvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def classified = {
    CorruptCsv.ensure(spark, sf)
    CorruptCsv
      .read(spark, sf)
      .select(
        col("o_orderkey"),
        col("o_totalprice"),
        col("_corrupt"),
        when(
          col("_corrupt").isNotNull,
          when(size(split(col("_corrupt"), ",")) < 3, "truncated").otherwise("bad_value")
        ).when(col("o_totalprice").isNull, "truncated")
          .otherwise("good")
          .as("cls")
      )
  }

  test("conservation: every line lands in exactly one class") {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(CorruptCsv.fixturePath(sf))
    )
    val byClass = classified.groupBy("cls").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byClass.values.sum == lines.size())
    assert(byClass.keySet == Set("good", "truncated", "bad_value"))
    val expTrunc = graft.Graft.table(spark, sf, "orders").where(expr("o_orderkey % 13 = 3")).count()
    val expBad = graft.Graft.table(spark, sf, "orders").where(expr("o_orderkey % 13 = 7")).count()
    assert(byClass("truncated") == expTrunc)
    assert(byClass("bad_value") == expBad)
  }

  test("corrupt channel carries the raw line verbatim; truncated keeps its key") {
    val bad = classified.where(col("cls") === "bad_value").limit(1).collect()(0)
    val raw = bad.getString(bad.fieldIndex("_corrupt"))
    assert(raw.endsWith(",N/A"), raw)
    assert(raw.split(",")(0).toLong % 13 == 7)
    val tr = classified.where(col("cls") === "truncated").limit(5).collect()
    tr.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("o_orderkey")), "short row lost its parsed key prefix")
      assert(r.getLong(r.fieldIndex("o_orderkey")) % 13 == 3)
      assert(r.isNullAt(r.fieldIndex("o_totalprice")))
    }
  }

  test("a wholly clean feed quarantines nothing") {
    val dir = TestSpark.tempDir()
    val p = java.nio.file.Paths.get(dir, "clean.csv")
    java.nio.file.Files.write(p, "1,O,10.00\n2,F,20.50\n".getBytes("UTF-8"))
    val df = spark.read
      .schema(CorruptCsv.schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(p.toString)
    assert(df.where(col("_corrupt").isNotNull || col("o_totalprice").isNull).count() == 0)
    assert(df.count() == 2)
  }
}
