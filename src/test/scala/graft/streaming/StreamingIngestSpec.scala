package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingIngestSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streaming hourly counts ≡ batch date_trunc aggregation") {
    val streamed = StreamingIngest.hourlyEventCounts(spark, sf)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read.schema(StreamingIngest.EventsRawSchema)
      .parquet(s"$sf/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    assert(streamed.count() > 0)
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("flatMapGroupsWithState: state accumulates across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val out = StreamingIngest.runningUserCounts(spark, input.toDS())
    val name = s"running_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      input.addData((1L, 10L), (1L, 11L), (2L, 20L))
      q.processAllAvailable()
      input.addData((1L, 12L)) // second micro-batch: state must carry over
      q.processAllAvailable()
      val rows = spark.table(name).as[(Long, Long)].collect().toSeq
      assert(rows.contains((1L, 2L)))   // after batch 1
      assert(rows.contains((2L, 1L)))
      assert(rows.contains((1L, 3L)))   // state persisted into batch 2
    } finally q.stop()
  }

  test("typed stateful sessions: counts match groupBy, sessions ≥ 1") {
    val got = StreamingIngest.userSessions(spark, sf)
    val counts = spark.read.schema(StreamingIngest.EventsRawSchema)
      .parquet(s"$sf/events.parquet")
      .groupBy("user_id").agg(count(lit(1)).as("expected"))
    val joined = got.join(counts, "user_id")
    assert(joined.filter(col("n_events") =!= col("expected")).count() === 0)
    assert(got.filter(col("n_sessions") < 1 || col("n_sessions") > col("n_events")).count() === 0)
  }
}
