package graft

import graft.sources.CopySink
import graft.streaming.EventsStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.DriverManager

/** Streaming → JDBC sink integration: foreachBatch reuses the batch
  * CopySink (the SURVEY §2.9 claim), draining the events file stream
  * into embedded Derby and checking target row counts — the streaming
  * analog of the reference's COPY load.
  */
class StreamingSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val url = "jdbc:derby:memory:graftstream;create=true"

  test("foreachBatch drains the event stream through CopySink") {
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        "CREATE TABLE \"events_sink\" (\"event_id\" BIGINT, " +
          "\"user_id\" BIGINT, \"value\" DOUBLE)")
    } finally conn.close()

    val events = EventsStream.readEvents(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "value")
    val q = events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        CopySink.write(batch, schema = null, table = "events_sink",
          connect = () => DriverManager.getConnection(
            "jdbc:derby:memory:graftstream"),
          batchSize = 200)
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val check = DriverManager.getConnection(
      "jdbc:derby:memory:graftstream")
    try {
      val rs = check.createStatement().executeQuery(
        "SELECT COUNT(*), SUM(\"event_id\") FROM \"events_sink\"")
      rs.next()
      assert(rs.getLong(1) == 1000L)
      assert(rs.getLong(2) == 999L * 1000 / 2)
    } finally check.close()
  }
}
