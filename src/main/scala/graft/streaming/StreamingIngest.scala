package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming ingestion (SURVEY.md §2.9 extension).
  *
  * The reference is batch-only; its only "incremental" behavior is the
  * insert-inside-loop bug (`scripts/prepare_data.py:79-95`). This module
  * is the pure extension SURVEY.md §2.9 sketches: the same event
  * aggregation semantics, expressed as a streaming query — Structured
  * Streaming's contract (streaming result ≡ batch result on the same
  * data) is exactly what the correctness oracle checks.
  *
  * Scale notes: the watermark bounds state; tumbling windows partition by
  * (window, event_type) so state is O(active windows × types), not O(rows).
  */
object StreamingIngest {

  /** events.parquet schema with ts as raw nanos (the file stores
    * TIMESTAMP(NANOS), which Spark only reads as long via the legacy
    * conf). */
  val EventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Hourly event counts computed as a STREAMING query over the parquet
    * file (one micro-batch; complete mode), returned as a batch DataFrame.
    * Semantics identical to the batch date_trunc aggregation.
    */
  def hourlyEventCounts(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val name = s"stream_hourly_${System.nanoTime()}"
    // FileStreamSource requires a DIRECTORY; pathGlobFilter selects just
    // the events table out of the shared testdata dir.
    val stream = spark.readStream
      .schema(EventsRawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"))
  }

  /** True streaming stateful operator (flatMapGroupsWithState): per-user
    * running event counts maintained in GroupState across micro-batches,
    * emitted on every update. The custom-state shape SURVEY.md §2.9
    * sketches for incremental ingestion.
    */
  def runningUserCounts(spark: SparkSession,
                        events: org.apache.spark.sql.Dataset[(Long, Long)]): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val counted = events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, batch: Iterator[(Long, Long)], state: GroupState[Long]) => {
          val prev = state.getOption.getOrElse(0L)
          val now = prev + batch.size
          state.update(now)
          Iterator((uid, now))
        })
      .toDF("user_id", "n_events")
    counted
  }

  /** Typed stateful aggregation over KeyValueGroupedDataset: per-user
    * event count + session count (sessions split on gaps > gapMinutes).
    * Deterministic: timestamps are sorted inside the group.
    */
  def userSessions(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val gapNs = gapMinutes * 60L * 1000L * 1000L * 1000L
    spark.read.schema(EventsRawSchema).parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("ts"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (uid, it) =>
        val ts = it.map(_._2).toArray.sorted
        val sessions = 1 + ts.iterator.sliding(2).withPartial(false)
          .count(w => w(1) - w(0) > gapNs)
        (uid, ts.length.toLong, sessions.toLong)
      }
      .toDF("user_id", "n_events", "n_sessions")
      .orderBy("user_id")
  }
}
