package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x294 — the four attribution models against planted journeys: exact
  * floor-division remainders, conservation, journey boundaries at each
  * purchase, zero-touch journeys, error exclusion, trailing touches.
  */
class AttributionSpec extends AnyFunSuite {

  private lazy val s = TestSpark.spark
  import s.implicits._

  /** Run the x294 pipeline over a hand-built (user, us, id, type) table by
    * writing it as the events fixture shape.
    */
  private def run(events: Seq[(Long, Long, Long, String)]) = {
    val dir = TestSpark.tempDir()
    val df = events
      .toDF("user_id", "us", "event_id", "event_type")
      .select(
        col("event_id"),
        timestamp_micros(col("us")).as("ts"),
        col("user_id"),
        col("event_type"),
        lit(0.0).as("value"),
        lit("{}").as("props")
      )
    TestSpark.writeTable(dir, "events", df)
    Warehouse.queries("x294_attribution")(s, dir).collect()
  }

  test("planted 3-touch journey: exact remainders per model") {
    // user 1: view(t1) click(t2) signup(t3) purchase(t4)
    val out = run(
      Seq((1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "signup"), (1L, 40L, 4L, "purchase"))
    )
    val cell = out.map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(cell(("first", "view")) == ((1L, 1000000L)))
    assert(cell(("first", "click")) == ((1L, 0L)))
    assert(cell(("last", "signup")) == ((1L, 1000000L)))
    // linear: 333333 + 333333 + (333333 + 1 remainder to the LAST touch)
    assert(cell(("linear", "view")) == ((1L, 333333L)))
    assert(cell(("linear", "click")) == ((1L, 333333L)))
    assert(cell(("linear", "signup")) == ((1L, 333334L)))
    // U-shape with one middle: 400000 / 200000 / 400000
    assert(cell(("ushape", "view")) == ((1L, 400000L)))
    assert(cell(("ushape", "click")) == ((1L, 200000L)))
    assert(cell(("ushape", "signup")) == ((1L, 400000L)))
    assert(out.forall(_.getBoolean(4)), "every model conserves")
  }

  test("back-to-back purchases: the zero-touch journey is unattributed, conservation still holds") {
    val out = run(
      Seq(
        (1L, 10L, 1L, "click"),
        (1L, 20L, 2L, "purchase"),
        (1L, 30L, 3L, "purchase"), // zero-touch journey
        (1L, 40L, 4L, "view"),
        (1L, 50L, 5L, "purchase"),
        (1L, 60L, 6L, "click") // trailing touch: attributes to nothing
      )
    )
    val one = out.head
    val (nConv, nAttr) = (one.getLong(5), one.getLong(6))
    assert(nConv == 3L && nAttr == 2L)
    assert(out.forall(_.getBoolean(4)))
    // the trailing click is not credited anywhere
    val lastClick = out.filter(r => r.getString(0) == "last" && r.getString(1) == "click").head
    assert(lastClick.getLong(2) == 1L, "only the pre-purchase click is a credited touch")
  }

  test("error events are neither touches nor conversions") {
    val out = run(
      Seq(
        (1L, 10L, 1L, "error"),
        (1L, 20L, 2L, "click"),
        (1L, 30L, 3L, "error"),
        (1L, 40L, 4L, "purchase")
      )
    )
    assert(!out.exists(_.getString(1) == "error"))
    val cell = out.map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(cell(("linear", "click")) == 1000000L)
  }

  test("two-touch U-shape splits 50/50; single touch takes all") {
    val out = run(
      Seq(
        (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "purchase"),
        (2L, 10L, 4L, "signup"), (2L, 20L, 5L, "purchase")
      )
    )
    val cell = out.map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(cell(("ushape", "view")) == 500000L)
    assert(cell(("ushape", "click")) == 500000L)
    assert(cell(("ushape", "signup")) == 1000000L)
  }
}
