package graft

import org.apache.spark.sql.functions._

/** Property checks for the second-wave operators that have non-obvious
  * scalable formulations (the oracle gate pins values; these pin the
  * *equivalence* of the scalable plan to the naive one).
  */
class AdvancedQueriesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q33: binned range join ≡ naive inequality join") {
    val e = graft.Events.load(spark, sf)
      .select($"user_id", $"event_id", $"ts")
    val naive = e.as("a").join(e.as("b"),
        $"a.user_id" === $"b.user_id" &&
        $"b.ts" >= $"a.ts" && $"b.ts" <= $"a.ts" + expr("INTERVAL 10 MINUTES") &&
        $"a.event_id" < $"b.event_id")
      .select($"a.user_id", $"a.event_id".as("a_id"), $"b.event_id".as("b_id"))
    val binned = AdvancedQueries.defs.find(_.name == "q33_range_join").get
      .fn(spark, sf)
    assert(binned.except(naive).isEmpty && naive.except(binned).isEmpty)
    assert(binned.count() === naive.count()) // no per-bucket duplicates either
  }

  test("q32: every matched view precedes (or ties) its click, same user") {
    val out = AdvancedQueries.defs.find(_.name == "q32_asof_join").get
      .fn(spark, sf).filter($"view_id" =!= -1L)
    val e = graft.Events.load(spark, sf)
      .select($"event_id", $"user_id", $"ts")
    val joined = out
      .join(e.select($"event_id".as("click_id"), $"ts".as("click_ts"),
        $"user_id".as("cu")), "click_id")
      .join(e.select($"event_id".as("view_id"), $"ts".as("view_ts"),
        $"user_id".as("vu")), "view_id")
    assert(joined.filter($"view_ts" > $"click_ts" || $"cu" =!= $"vu").isEmpty)
  }

  test("q34: session event counts cover every event exactly once") {
    val sessions = AdvancedQueries.defs.find(_.name == "q34_sessions_batch").get
      .fn(spark, sf)
    val nEvents = graft.Events.load(spark, sf).count()
    assert(sessions.agg(sum($"n_events")).as[Long].head() === nEvents)
  }
}
