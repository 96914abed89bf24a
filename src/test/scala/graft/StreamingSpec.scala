package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("windowed counts with watermark over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Long)]
    val df = input.toDF().toDF("ts", "event_type", "user_id")
    val q = StreamOps.windowedCounts(df, "ts", "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("wc").outputMode("update").start()
    try {
      input.addData(
        (Timestamp.valueOf("2026-01-01 10:01:00"), "click", 1L),
        (Timestamp.valueOf("2026-01-01 10:02:00"), "click", 2L),
        (Timestamp.valueOf("2026-01-01 10:11:00"), "view", 1L))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n FROM wc ORDER BY event_type").collect()
      assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("click", 2L), ("view", 1L)))
    } finally q.stop()
  }

  test("streaming dedup within watermark drops re-deliveries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "text")
    val q = StreamOps.dedupWithinWatermark(df, "text", "ts", "1 hour")
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      input.addData(
        (Timestamp.valueOf("2026-01-01 10:00:00"), "hello world"),
        (Timestamp.valueOf("2026-01-01 10:00:01"), "HELLO   world"), // same fingerprint after normalize
        (Timestamp.valueOf("2026-01-01 10:00:02"), "different"))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM dd").collect()(0).getLong(0) == 2L)
    } finally q.stop()
  }

  test("stateful sessionize via mapGroupsWithState") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val df = input.toDF().toDF("user_id", "ts_millis")
    val q = StreamOps.sessionize(spark, df, gapMillis = 1000L)
      .writeStream.format("memory").queryName("sess").outputMode("update").start()
    try {
      input.addData((1L, 0L), (1L, 500L), (1L, 5000L)) // gap after 500 → second session
      q.processAllAvailable()
      val r = spark.sql("SELECT sessionId, events FROM sess WHERE userId = 1").collect()(0)
      assert(r.getLong(0) == 1L && r.getInt(1) == 1)
    } finally q.stop()
  }

  test("streaming geofence uses spatial expressions per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Double, Double)]
    val df = input.toDF().toDF("x", "y")
    val q = StreamOps.geofence(df, "x", "y", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
      .writeStream.format("memory").queryName("gf").outputMode("append").start()
    try {
      input.addData((5.0, 5.0), (20.0, 20.0), (1.0, 9.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM gf").collect()(0).getLong(0) == 2L)
    } finally q.stop()
  }
}
