package graft

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._

/** Round-11 verdict #3: the fingerprint-keyed npairs artifact gets a
  * LIFECYCLE. Previously every driver data regeneration minted a new
  * fingerprint and orphaned the old table forever, and a writer that
  * crashed between parquet-write and atomic rename left its `.tmp-*`
  * directory behind. `vacuumArtifacts` (called on every open, under the
  * same per-path lock) must remove BOTH kinds of debris once they age
  * out — while never touching the current fingerprint or a FRESH
  * sibling (a concurrently-running process on a different corpus, e.g.
  * Verify at sf0.01 while Bench runs sf0.1, owns a live artifact under
  * a different fingerprint).
  *
  * Also pins the round-11 observability contract (verdict #1): the
  * first boundedPairs call on a corpus logs `[npairs] build <path>`,
  * every subsequent call logs `[npairs] hit <path>` — so artifact reuse
  * (the whole q31/q97/q98 speedup) shows up in driver logs instead of
  * being inferred from timings.
  */
class NpairsLifecycleSpec extends SparkSpec {

  private def mkDir(p: Path, ageMs: Long): Path = {
    Files.createDirectories(p)
    Files.write(p.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    Files.setLastModifiedTime(p,
      FileTime.fromMillis(System.currentTimeMillis() - ageMs))
    p
  }

  test("vacuum removes aged-out stale fingerprints and crashed-writer tmp dirs; keeps current and fresh siblings") {
    val base = Files.createTempDirectory("npairs-lifecycle")
    val hour = 3600L * 1000
    val current = mkDir(base.resolve("npairs-aaaa1111"), 30 * 24 * hour) // age-immune
    val staleSibling = mkDir(base.resolve("npairs-bbbb2222"), 25 * hour)
    val freshSibling = mkDir(base.resolve("npairs-cccc3333"), 1 * hour)
    val staleTmp = mkDir(base.resolve("npairs-dddd4444.tmp-ab12cd34"), 2 * hour)
    val freshTmp = mkDir(base.resolve("npairs-eeee5555.tmp-ef56ab78"), hour / 2)
    val unrelated = mkDir(base.resolve("not-an-artifact"), 90 * 24 * hour)

    TextQueries.vacuumArtifacts(current)

    assert(Files.exists(current.resolve("part-0.parquet")),
      "the CURRENT fingerprint must never be vacuumed, regardless of age")
    assert(!Files.exists(staleSibling), "a >24h-old non-current fingerprint is garbage")
    assert(Files.exists(freshSibling),
      "a fresh sibling may be another process's live artifact (different corpus)")
    assert(!Files.exists(staleTmp), "a >1h-old .tmp-* is crashed-writer debris")
    assert(Files.exists(freshTmp), "a young .tmp-* may be an in-flight write")
    assert(Files.exists(unrelated), "vacuum only touches npairs-* entries")
  }

  test("boundedPairs logs build on first derivation, hit on reuse, vacuum on collected debris") {
    import spark.implicits._
    val dataDir = Files.createTempDirectory("npairs-obs").toString
    (0L until 40L).map(i => (i, s"some document body number $i with words"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("crafted"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dataDir/documents.parquet")

    def captured(f: => Unit): String = {
      val buf = new ByteArrayOutputStream()
      Console.withOut(buf)(f)
      buf.toString("UTF-8")
    }
    val first = captured { TextQueries.boundedPairs(spark, dataDir).count() }
    val second = captured { TextQueries.boundedPairs(spark, dataDir).count() }
    assert(first.contains("[npairs] build "),
      s"first open must derive and say so; got: $first")
    assert(second.contains("[npairs] hit ") && !second.contains("[npairs] build "),
      s"second open must reuse the installed artifact; got: $second")

    // debris planted next to the live artifact is vacuumed on the next open
    val artifactBase = Paths.get(sys.env.getOrElse("SPARK_GRAFT_ARTIFACT_DIR",
      s"${System.getProperty("java.io.tmpdir")}/graft-artifacts"))
    val debris = mkDir(artifactBase.resolve("npairs-deadbeefdeadbeef"),
      TextQueries.NpairsVacuumAgeMs + 60_000)
    val third = captured { TextQueries.boundedPairs(spark, dataDir).count() }
    assert(third.contains(s"[npairs] vacuum $debris"), s"got: $third")
    assert(!Files.exists(debris))
  }

  test("a hit refreshes the artifact mtime, so an actively-used old artifact never ages out") {
    import spark.implicits._
    val dataDir = Files.createTempDirectory("npairs-touch").toString
    (0L until 30L).map(i => (i, s"touch corpus doc number $i text"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("crafted"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dataDir/documents.parquet")
    TextQueries.boundedPairs(spark, dataDir).count() // build
    val artifact = TextQueries.npairsPath(dataDir) // the ONE path owner
    // simulate an artifact built long ago but still in use
    Files.setLastModifiedTime(artifact,
      FileTime.fromMillis(System.currentTimeMillis() - 30L * 24 * 3600 * 1000))
    TextQueries.boundedPairs(spark, dataDir).count() // hit → touch
    val age = System.currentTimeMillis() -
      Files.getLastModifiedTime(artifact).toMillis
    assert(age < TextQueries.NpairsVacuumAgeMs,
      s"hit must refresh mtime (age still ${age}ms)")
  }
}
