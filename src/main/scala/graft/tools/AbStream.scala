package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Scratch A/B harness for the streaming-state family (q53/q59) at sf1.
  *
  * Verdict r11 #4: q59 4.86 s / q53 3.86 s are the top of the sf1 table;
  * the state partition count is adaptive and RocksDB was rejected while
  * state fits memory — this tool attributes the remaining per-batch cost
  * using Structured Streaming's OWN progress metrics (durationMs:
  * addBatch / commitOffsets / walCommit; stateOperators: commit times,
  * rows, memory) plus a batch-equivalent control:
  *
  *  - `q59` / `q53`: the engine pipelines verbatim (same confs), printing
  *    every micro-batch's durationMs + stateOperators breakdown.
  *  - `b59` / `b53`: the SAME aggregation as a pure batch plan (no state
  *    store, no commit) — the compute+shuffle floor. streaming − batch ≈
  *    state machinery cost.
  *  - `parts`: q59 swept over shuffle-partition counts (4/8/16/32).
  *
  * `sbt 'runMain graft.tools.AbStream /root/repo/testdata-sf1 q59 3'`
  */
object AbStream {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val mode = args.drop(1).headOption.getOrElse("q59")
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .appName("ab-stream").master(s"local[${Runtime.getRuntime.availableProcessors}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tick(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[abstream] $name: $dt%.2f s")
      dt
    }

    def eventsSchema: StructType =
      spark.read.parquet(s"$dir/events.parquet").schema

    def eventStream(s: SparkSession, parts: String): DataFrame = {
      s.conf.set("spark.sql.shuffle.partitions", parts)
      s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      graft.Events.normalize(
        s.readStream.schema(eventsSchema)
          .option("pathGlobFilter", "events.parquet").parquet(dir))
    }

    def runAndReport(df: DataFrame, modeOut: String): Unit = {
      val name = s"ab_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = df.writeStream.outputMode(modeOut).format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
      q.recentProgress.foreach { p =>
        val dur = p.durationMs
        val st = p.stateOperators.map { so =>
          s"op=${so.operatorName} commitMs=${so.allUpdatesTimeMs}+${so.commitTimeMs} " +
            s"rowsTotal=${so.numRowsTotal} updated=${so.numRowsUpdated} mem=${so.memoryUsedBytes}"
        }.mkString(" | ")
        println(s"[abstream] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=$dur state[$st]")
      }
      df.sparkSession.sql(s"DROP TABLE IF EXISTS $name")
    }

    def q59(parts: String): Unit = {
      val s2 = spark.newSession()
      val sessions = eventStream(s2, parts)
        .withWatermark("ts", "1 hour")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      runAndReport(sessions, "complete")
    }

    def q53(parts: String): Unit = {
      val s2 = spark.newSession()
      val keyed = eventStream(s2, parts)
        .withWatermark("ts", "1 hour")
        .select(col("user_id"),
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"), col("ts"))
        .dropDuplicatesWithinWatermark("user_id", "hour", "event_type")
      runAndReport(keyed, "append")
    }

    // q53 variant: dedup on the TRUNCATED TIMESTAMP (8-byte state key
    // field) instead of the pre-formatted 19-char string; format after
    // dedup (991k rows instead of 1M). Same first-sighting semantics.
    def q53b(parts: String): Unit = {
      val s2 = spark.newSession()
      val keyed = eventStream(s2, parts)
        .withWatermark("ts", "1 hour")
        .select(col("user_id"), date_trunc("hour", col("ts")).as("hour_ts"),
          col("event_type"), col("ts"))
        .dropDuplicatesWithinWatermark("user_id", "hour_ts", "event_type")
        .select(col("user_id"),
          date_format(col("hour_ts"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
      runAndReport(keyed, "append")
    }

    // batch-equivalent controls: identical arithmetic, no state store
    def b59(): Unit = {
      val r = graft.Events.load(spark, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      r.write.format("noop").mode("overwrite").save()
    }
    def b53(): Unit = {
      val r = graft.Events.load(spark, dir)
        .select(col("user_id"),
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .dropDuplicates("user_id", "hour", "event_type")
      r.write.format("noop").mode("overwrite").save()
    }

    mode match {
      case "q59"   => (1 to reps).foreach(r => tick(s"q59 parts=8 rep$r")(q59("8")))
      case "q53"   => (1 to reps).foreach(r => tick(s"q53 parts=8 rep$r")(q53("8")))
      case "q53b"  => (1 to reps).foreach(r => tick(s"q53b parts=8 rep$r")(q53b("8")))
      case "b59"   => (1 to reps).foreach(r => tick(s"b59 batch rep$r")(b59()))
      case "b53"   => (1 to reps).foreach(r => tick(s"b53 batch rep$r")(b53()))
      case "parts" =>
        Seq("4", "8", "16", "32").foreach { p =>
          (1 to reps).foreach(r => tick(s"q59 parts=$p rep$r")(q59(p)))
        }
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
