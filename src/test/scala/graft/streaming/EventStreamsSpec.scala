package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(min: Int, sec: Int = 0) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  test("windowed counts over a real incremental stream") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val counts = EventStreams.windowedCounts(
      input.toDF().toDF("ts", "event_type", "value")
    )
    val q = counts.writeStream.format("memory").queryName("wc").outputMode(OutputMode.Complete).start()
    try {
      input.addData((ts(1), "click", 1.0), (ts(2), "click", 2.0), (ts(7), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("wc").collect().map(r => (r.getAs[Timestamp]("ws"), r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
      assert(rows.toSet === Set(
        (ts(0), "click", 2L, 3.0),
        (ts(5), "view", 1L, 5.0)
      ))
      // incremental update: late-but-within-watermark event lands in its window
      input.addData((ts(3), "click", 4.0))
      q.processAllAvailable()
      val updated = spark.table("wc").where("event_type = 'click'").collect()
      assert(updated.map(_.getAs[Long]("n")).toSeq === Seq(3L))
    } finally q.stop()
  }

  test("stateful sessionization accumulates per-user state across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val sessions = EventStreams.sessionize(input.toDS())
    val q = sessions.writeStream.format("memory").queryName("sess").outputMode(OutputMode.Update).start()
    try {
      input.addData(
        EventStreams.Event(1L, ts(1), 7L, "click", 1.0),
        EventStreams.Event(2L, ts(2), 7L, "click", 2.0),
        EventStreams.Event(3L, ts(2), 8L, "view", 10.0)
      )
      q.processAllAvailable()
      input.addData(EventStreams.Event(4L, ts(3), 7L, "purchase", 4.0))
      q.processAllAvailable()
      val last = spark.table("sess").groupBy("user_id").agg(org.apache.spark.sql.functions.max("n_events").as("n")).collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n")).toMap
      assert(last(7L) === 3L) // state carried across micro-batches
      assert(last(8L) === 1L)
    } finally q.stop()
  }
}
