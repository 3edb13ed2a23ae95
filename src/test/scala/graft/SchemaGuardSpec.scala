package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-10 seam hardening: the driver regenerates testdata between
  * rounds and has shipped two `events.ts` encodings so far (raw nanos
  * long; naive micros NTZ). SchemaGuard must pass BOTH, print the
  * fingerprint line, and fail loudly (naming the table) on any third
  * shape; Events.normalize must produce the identical TimestampType
  * instants from both encodings and refuse a sub-nanosecond-magnitude
  * INT64 instead of silently dividing it.
  */
class SchemaGuardSpec extends SparkSpec {

  /** Copy the (tiny) sf0.001 table set so a test can rewrite one table. */
  private def cloneTestdata(): String = {
    val dir = Files.createTempDirectory("schema-guard")
    val src = Paths.get("/root/testdata/sf0.001")
    Files.list(src).forEach { p =>
      Files.copy(p, dir.resolve(p.getFileName.toString), StandardCopyOption.REPLACE_EXISTING)
    }
    dir.toString
  }

  test("guard passes the driver's current testdata and prints a fingerprint") {
    val fp = SchemaGuard.check(spark, "/root/testdata/sf0.001")
    assert(fp.matches("[0-9a-f]{16}"), s"fingerprint '$fp' must be 16 hex chars")
  }

  test("guard accepts both known events.ts encodings") {
    import spark.implicits._
    val dir = cloneTestdata()
    val base = Seq((1L, 1754500000000000L, 7L, "click", 1.5, "{}"))
    // naive micros → TimestampNTZ on read (the round-9 driver encoding)
    base.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    SchemaGuard.check(spark, dir)
    // raw INT64 nanos — the shape the legacy conf surfaces TIMESTAMP(NANOS) as
    base.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), (col("us") * 1000L).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    SchemaGuard.check(spark, dir)
  }

  test("guard fails loudly, naming the table, on an unknown shape") {
    import spark.implicits._
    val dir = cloneTestdata()
    Seq((1L, "2025-08-06 12:00:00", 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](SchemaGuard.check(spark, dir))
    assert(e.getMessage.contains("events"), s"diff must name the table: ${e.getMessage}")
    assert(e.getMessage.contains("schema drift"))
  }

  test("Events.normalize yields identical instants from both encodings and rejects a third") {
    import spark.implicits._
    val micros = Seq(1754500000123456L, 1767225600000000L)
    val fromNanos = Events.normalize(
      micros.map(_ * 1000L).toDF("ts"))
      .select(col("ts").cast("string")).collect().map(_.getString(0))
    val fromNtz = Events.normalize(
      micros.toDF("us")
        .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))
      .select(col("ts").cast("string")).collect().map(_.getString(0))
    assert(fromNanos.toSeq === fromNtz.toSeq,
      "the two known encodings must normalize to the same instants")
    // a micros-magnitude INT64 (an unannounced third encoding) must fail
    // loudly at evaluation instead of silently shifting every ts 1000×
    val bad = Seq(1754500000123456L).toDF("ts")
    val err = intercept[Throwable](Events.normalize(bad).collect())
    assert(err.getMessage != null && err.getMessage.contains("unknown encoding"),
      s"sub-nanos INT64 must raise the refusal error, got: $err")
  }
}
