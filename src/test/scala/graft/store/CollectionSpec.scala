package graft.store

import graft.SparkSpec
import graft.functions.TextEmbed
import org.apache.spark.sql.functions._

class CollectionSpec extends SparkSpec {
  import spark.implicits._

  private val root = java.nio.file.Files.createTempDirectory("graft-coll").toString

  private def seeded = {
    val docs = Seq(
      (0L, "spark window aggregation engine"),
      (1L, "the quick brown fox jumps"),
      (2L, "vector search cosine similarity"),
      (3L, "spark window aggregation engine twice")
    ).toDF("id", "text")
    TextEmbed.withEmbed(docs, "text", "vector").select("id", "vector", "text")
  }

  test("create / insert / describe roundtrip") {
    Collection.drop(root, "c1")
    val c = Collection.create(spark, root, "c1", TextEmbed.DefaultDim, overwrite = true)
    c.insert(seeded)
    val info = c.describe()
    assert(info.rows === 4)
    assert(info.dim === TextEmbed.DefaultDim)
    assert(info.metric === "COSINE")
    assert(Collection.list(spark, root).contains("c1"))
  }


  test("single-writer guard: a raced committed snapshot refuses loudly, never deleted (r12)") {
    Collection.drop(root, "crace")
    val c = Collection.create(spark, root, "crace", TextEmbed.DefaultDim, overwrite = true)
    c.insert(seeded) // appends, no version yet: the first rewrite targets v1
    val started = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    @volatile var thrown: Option[Throwable] = None
    // the "slow" writer: reads its base version (targets v1), then stalls
    // inside its write callback while the fast writer commits v1
    val slow = new Thread(() => {
      try c.rewriteSwap("race-test") { tmp =>
        started.countDown()
        release.await()
        new java.io.File(tmp).mkdirs() // produce SOMETHING installable
        ()
      } catch { case t: Throwable => thrown = Some(t) }
    }, "race-slow-writer")
    slow.start()
    started.await()
    c.delete("id = 0") // the fast writer: copy-on-write, commits v1
    val fastRows = c.df.count()
    release.countDown()
    slow.join(30000)
    assert(!slow.isAlive, "slow writer wedged")
    // the race must surface as the single-writer violation...
    assert(thrown.exists(_.isInstanceOf[IllegalStateException]),
      s"expected IllegalStateException, got $thrown")
    assert(thrown.get.getMessage.contains("concurrent writer"))
    // ...and the fast writer's committed snapshot must be intact
    assert(new java.io.File(s"$root/crace/v1").exists, "committed v1 was deleted")
    assert(c.df.count() === fastRows)
  }

  test("dead-JVM orphan install is still garbage-collected by the next rewrite (r12)") {
    Collection.drop(root, "crash")
    val c = Collection.create(spark, root, "crash", TextEmbed.DefaultDim, overwrite = true)
    c.insert(seeded)
    // simulate a crash between rename and pointer flip: v1 exists with
    // junk, but _current was never written
    val orphan = new java.io.File(s"$root/crash/v1")
    assert(orphan.mkdirs())
    java.nio.file.Files.write(orphan.toPath.resolve("junk"), Array[Byte](1, 2, 3))
    c.delete("id = 0") // must clear the orphan and commit a real v1
    assert(c.df.count() === 3)
    assert(!new java.io.File(s"$root/crash/v1/junk").exists, "orphan junk survived the install")
  }

  test("getByIds is a point lookup") {
    val c = Collection.open(spark, root, "c1")
    val got = c.getByIds(Seq(1L, 3L)).select("id").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 3L))
  }

  test("query: filter string + projection + limit (milvus query_entities surface)") {
    val c = Collection.open(spark, root, "c1")
    val got = c.query("id >= 1 and id <= 2", Seq("id", "text"), 10)
    assert(got.columns.toSeq === Seq("id", "text"))
    assert(got.count() === 2)
  }

  test("search: cosine top-k finds the near-duplicate first") {
    val c = Collection.open(spark, root, "c1")
    val qv = TextEmbed.embedScala("spark window aggregation engine")
    val hits = c.search(qv, k = 2).select("id", "score").as[(Long, Double)].collect()
    assert(hits.length === 2)
    assert(hits.head._1 === 0L) // exact text match → cosine 1
    assert(math.abs(hits.head._2 - 1.0) < 1e-9)
    assert(hits(1)._1 === 3L) // near-duplicate second
  }

  test("searchBatch: one plan, per-query ranks") {
    val c = Collection.open(spark, root, "c1")
    val qs = Seq(
      (10L, TextEmbed.embedScala("vector search cosine")),
      (11L, TextEmbed.embedScala("quick brown fox"))
    ).toDF("qid", "qv")
    val got = c.searchBatch(qs, k = 1).select("qid", "id").as[(Long, Long)].collect().toMap
    assert(got === Map(10L -> 2L, 11L -> 1L))
  }

  test("partitioned cells: probe prunes partitions at the scan") {
    import org.apache.spark.sql.functions._
    Collection.drop(root, "cells")
    val c = Collection.open(spark, root, "cells")
    c.insertPartitioned(seeded.withColumn("cell", col("id") % 2), "cell")
    val q = c.searchCells(TextEmbed.embedScala("spark window"), "cell", Seq(0L), k = 2)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [") && scan.contains("cell"), scan)
    // only even ids live in cell 0
    assert(q.select("id").as[Long].collect().forall(_ % 2 == 0))
  }

  test("search plans as TakeOrderedAndProject (no full sort, no shuffle)") {
    val c = Collection.open(spark, root, "c1")
    val plan = c.search(TextEmbed.embedScala("spark"), 3).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"unexpected plan:\n$plan")
  }

  test("delete(expr) removes matches copy-on-write and reports the count") {
    Collection.drop(root, "cdel")
    val c = Collection.create(spark, root, "cdel", TextEmbed.DefaultDim, overwrite = true)
    c.insert(seeded)
    val removed = c.delete("id >= 2")
    assert(removed === 2)
    assert(c.df.select("id").as[Long].collect().sorted.toSeq === Seq(0L, 1L))
    // survivors stay queryable and a second delete is a no-op
    assert(c.delete("id >= 2") === 0)
    assert(c.describe().rows === 2)
  }

  test("compact folds many small append files into one, preserving rows") {
    Collection.drop(root, "ccomp")
    val c = Collection.create(spark, root, "ccomp", TextEmbed.DefaultDim, overwrite = true)
    // 5 separate appends → ≥5 part files (each its own write job)
    (0 until 5).foreach(_ => c.insert(seeded.repartition(2)))
    val rowsBefore = c.df.count()
    val (before, after) = c.compact()
    assert(before >= 5)
    assert(after === 1) // tiny data → one right-sized file
    assert(c.df.count() === rowsBefore)
    // still searchable after the rewrite
    assert(c.search(TextEmbed.embedScala("spark"), 1).count() === 1)
  }

  test("upsert replaces same-id rows and appends new ones") {
    Collection.drop(root, "cups")
    val c = Collection.create(spark, root, "cups", TextEmbed.DefaultDim, overwrite = true)
    c.insert(seeded) // ids 0..3
    val batch = TextEmbed.withEmbed(
      Seq((2L, "vector search rewritten"), (9L, "a brand new row")).toDF("id", "text"),
      "text", "vector").select("id", "vector", "text")
    val (replaced, inserted) = c.upsert(batch)
    assert((replaced, inserted) === ((1L, 1L)))
    assert(c.df.count() === 5)
    val texts = c.df.select("id", "text").as[(Long, String)].collect().toMap
    assert(texts(2L) === "vector search rewritten") // replaced, not duplicated
    assert(texts(9L) === "a brand new row")
    assert(texts(0L) === "spark window aggregation engine") // untouched
    // idempotent re-upsert: same batch replaces both, inserts none
    assert(c.upsert(batch) === ((2L, 0L)))
    assert(c.df.count() === 5)
    // duplicate ids within one batch violate the replace-by-key contract
    intercept[IllegalArgumentException] {
      c.upsert(batch.union(batch.limit(1)))
    }
    // a cell-partitioned collection refuses with a rebuild hint instead
    // of failing inside the union (the batch has no cell column)
    Collection.drop(root, "cupsp")
    val cp = Collection.open(spark, root, "cupsp")
    cp.insertPartitioned(seeded.withColumn("cell", col("id") % 2), "cell")
    val err = intercept[IllegalArgumentException] { cp.upsert(batch) }
    assert(err.getMessage.contains("cell"))
  }

  test("clusterBy gives each file a disjoint key range (zone-map layout)") {
    Collection.drop(root, "cclust")
    val c = Collection.create(spark, root, "cclust", TextEmbed.DefaultDim, overwrite = true)
    // 60 rows inserted in shuffled id order across several files
    val docs = scala.util.Random.shuffle((0L until 60L).toList)
      .map(i => (i, s"doc number $i")).toDF("id", "text")
    c.insert(TextEmbed.withEmbed(docs.repartition(6), "text", "vector")
      .select("id", "vector", "text"))
    val nFiles = c.clusterBy(4, "id")
    assert(nFiles === 4)
    assert(c.df.count() === 60)
    // every parquet file owns a disjoint id range — the property row-group
    // min/max pruning needs
    val ranges = new java.io.File(c.dataDir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map { f =>
        val ids = spark.read.parquet(f.getAbsolutePath)
          .select("id").as[Long].collect()
        (ids.min, ids.max)
      }.sortBy(_._1)
    assert(ranges.length === 4)
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi < lo, s"overlapping file ranges: ${ranges.toSeq}")
    }
  }

  test("zorderBy keeps per-file ranges compact on BOTH metadata columns") {
    Collection.drop(root, "czord")
    val c = Collection.create(spark, root, "czord", TextEmbed.DefaultDim, overwrite = true)
    // two independent uniform metadata dims (16x16 grid)
    val docs = (0L until 256L)
      .map(i => (i, s"doc number $i", i % 16, i / 16)).toDF("id", "text", "x", "y")
    c.insert(TextEmbed.withEmbed(docs.repartition(4), "text", "vector")
      .select("id", "vector", "text", "x", "y"))
    val nFiles = c.zorderBy(16, buckets = 16, "x", "y")
    assert(nFiles === 16)
    assert(c.df.count() === 256)
    val spans = new java.io.File(c.dataDir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min($"x"), max($"x"), min($"y"), max($"y")).head()
        ((r.getLong(1) - r.getLong(0)) / 15.0, (r.getLong(3) - r.getLong(2)) / 15.0)
      }
    // 16 files over the 256-cell z-curve: each file holds a short z run
    // (~16 codes ≈ a 4x4-8x8 region; range cuts are count-based, not
    // bit-aligned, so a file straddling a block boundary widens — the
    // MEAN is what the curve bounds). Lexicographic layout would leave
    // the mean y span ≈ 1.0.
    assert(spans.length === 16)
    assert(spans.map(_._1).sum / 16 <= 0.5, s"x spans: ${spans.map(_._1).toSeq}")
    assert(spans.map(_._2).sum / 16 <= 0.5, s"y spans: ${spans.map(_._2).toSeq}")
  }

  test("shallowClone branches zero-copy: independent mutations, shared inodes") {
    Collection.drop(root, "csrc"); Collection.drop(root, "cclone")
    val c = Collection.create(spark, root, "csrc", TextEmbed.DefaultDim, overwrite = true)
    val rows = (0L until 20L).map(i => (i, s"doc number $i")).toDF("id", "text")
    c.insert(TextEmbed.withEmbed(rows, "text", "vector").select("id", "vector", "text"))
    val clone = c.shallowClone("cclone")
    assert(clone.df.count() === 20)
    // the clone's v1 files ARE the source's files (hard links): same inode
    def firstKey(dir: String): AnyRef = {
      val f = new java.io.File(dir).listFiles()
        .filter(x => x.isFile && x.getName.endsWith(".parquet")).minBy(_.getName)
      java.nio.file.Files.readAttributes(f.toPath,
        classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()
    }
    assert(firstKey(c.dataDir) === firstKey(clone.dataDir))
    // mutations diverge: delete on the clone, source untouched — and
    // vice versa
    assert(clone.delete("id >= 10") === 10L)
    assert(clone.df.count() === 10)
    assert(c.df.count() === 20)
    assert(c.delete("id = 0") === 1L)
    assert(c.df.count() === 19)
    assert(clone.df.count() === 10)
    // refuses to clobber an existing collection
    intercept[IllegalArgumentException](c.shallowClone("cclone"))
  }

  test("shallowClone of an IVF-indexed collection stays searchable (sidecars clone too)") {
    Collection.drop(root, "civ"); Collection.drop(root, "civ2")
    val c = Collection.create(spark, root, "civ", TextEmbed.DefaultDim, overwrite = true)
    val rows = (0L until 24L).map(i => (i, s"document about topic number $i"))
      .toDF("id", "text")
    c.insert(TextEmbed.withEmbed(rows, "text", "vector").select("id", "vector", "text"))
    c.buildIvf(nlist = 2, rounds = 2)
    // the cloned v1 carries the _ivf_build stamp, so without the matching
    // .__ivf sidecar searchIvf would refuse with "interrupted build"
    val clone = c.shallowClone("civ2")
    val qv = TextEmbed.embedScala("document about topic number 7")
    val hits = clone.searchIvf(qv, k = 3, nprobe = 2)
    assert(hits.count() === 3)
    assert(hits.select("id").as[Long].collect().contains(7L))
    // and the clone's index survives the SOURCE retraining its own
    // (marker writes land on new inodes — never through shared ones)
    c.buildIvf(nlist = 2, rounds = 2)
    assert(clone.searchIvf(qv, k = 1, nprobe = 2).count() === 1)
  }

  test("insert schema redefinition: widening only, markers survive the rewrite") {
    Collection.drop(root, "cwide")
    val c = Collection.create(spark, root, "cwide", TextEmbed.DefaultDim, overwrite = true)
    c.setRetention(5) // root marker the redefining insert must not destroy
    // a narrower first batch (no text) must refuse, not silently narrow
    val narrow = TextEmbed.withEmbed(Seq((0L, "x")).toDF("id", "text"), "text", "vector")
      .select("id", "vector")
    intercept[IllegalArgumentException](c.insert(narrow))
    // a widening first batch redefines the schema AND keeps the marker
    val wide = TextEmbed.withEmbed(Seq((0L, "doc zero")).toDF("id", "text"),
      "text", "vector").select("id", "vector", "text").withColumn("lang", lit("en"))
    c.insert(wide)
    assert(c.df.columns.toSet === Set("id", "vector", "text", "lang"))
    assert(c.df.count() === 1)
    assert(c.retention === 5, "_retain marker must survive the schema-defining insert")
  }

  test("diffVersions classifies added/removed/changed keys between snapshots") {
    Collection.drop(root, "cdiff")
    val c = Collection.create(spark, root, "cdiff", TextEmbed.DefaultDim, overwrite = true)
    c.setRetention(10)
    val rows = (0L until 10L).map(i => (i, s"doc number $i")).toDF("id", "text")
    c.insert(TextEmbed.withEmbed(rows, "text", "vector").select("id", "vector", "text"))
    c.delete("id >= 100") // no-op delete just to mint snapshot v1 of the insert
    // v2: remove 0-1, change 5, add 20
    c.delete("id < 2")
    val batch = TextEmbed.withEmbed(
      Seq((5L, "doc number five REVISED"), (20L, "a brand new doc"))
        .toDF("id", "text"), "text", "vector").select("id", "vector", "text")
    c.upsert(batch)
    val cur = c.history().map(_.version).max
    val d = c.diffVersions(1, cur).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d(0L) === "removed" && d(1L) === "removed")
    assert(d(5L) === "changed")
    assert(d(20L) === "added")
    assert(d.size === 4, s"unexpected diff rows: $d") // untouched keys absent
  }

  test("rewrites commit atomically: concurrent readers see old or new snapshot, never neither") {
    Collection.drop(root, "catomic")
    val c = Collection.create(spark, root, "catomic", TextEmbed.DefaultDim, overwrite = true)
    // 40 rows; each delete removes a disjoint 10-row slice, so the live
    // row count identifies the snapshot: 40 → 30 → 20 → 10
    val rows = (0L until 40L).map(i => (i, s"doc number $i")).toDF("id", "text")
    c.insert(TextEmbed.withEmbed(rows, "text", "vector").select("id", "vector", "text"))
    val legalCounts = Set(40L, 30L, 20L, 10L)

    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    @volatile var writing = true
    val reader = Future {
      val seen = scala.collection.mutable.Set[Long]()
      var errors = List.empty[Throwable]
      while (writing) {
        try seen += Collection.open(spark, root, "catomic").df.count()
        catch { case e: Throwable => errors ::= e }
      }
      (seen.toSet, errors)
    }
    for (slice <- 0 until 3) {
      c.delete(s"id >= ${30 - slice * 10} and id < ${40 - slice * 10}")
      Thread.sleep(50) // give the reader a beat on each snapshot
    }
    writing = false
    val (seen, errors) = Await.result(reader, 2.minutes)
    // The atomicity contract covers the vacuum horizon (1 superseded
    // snapshot). A reader that resolved the pointer and then lost the
    // scheduler for TWO commits can have its snapshot vacuumed mid-scan —
    // that surfaces as a FileNotFound-class error and is outside the
    // contract, not an atomicity violation. But the excuse is narrow:
    // the error must reference a snapshot vacuum actually removed (a
    // version ≥ 2 commits behind the final pointer, or the legacy root
    // layout) — a commit-ordering bug exposing a HALF-INSTALLED current
    // version also surfaces as missing files and must still fail.
    val finalVersion = 3 // three delete commits; insert is the legacy root layout
    def isVacuumRace(e: Throwable): Boolean =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).exists { t =>
        val fnf = t.isInstanceOf[java.io.FileNotFoundException] ||
          Option(t.getMessage).exists(m =>
            m.contains("FileNotFoundException") || m.contains("does not exist") ||
              m.contains("PATH_NOT_FOUND"))
        fnf && Option(t.getMessage).exists { m =>
          val vs = "/v(\\d+)/".r.findAllMatchIn(m).map(_.group(1).toInt).toList
          if (vs.nonEmpty) vs.forall(_ <= finalVersion - 2)
          else m.contains("catomic") // legacy root files, no v<N> in path
        }
      }
    val hard = errors.filterNot(isVacuumRace)
    assert(hard.isEmpty, s"reader hit ${hard.headOption}")
    // each serial read can be stranded by at most one commit's vacuum:
    // more excused errors than commits would itself be a regression
    assert(errors.count(isVacuumRace) <= 3,
      s"${errors.count(isVacuumRace)} vacuum-race errors for 3 commits: ${errors.headOption}")
    assert(seen.subsetOf(legalCounts), s"phantom snapshot counts: $seen")
    assert(seen.contains(10L)) // the final snapshot was observed
    assert(c.df.count() === 10)

    // vacuum horizon: exactly the superseded snapshot remains on disk
    val vdirs = new java.io.File(s"$root/catomic").listFiles()
      .filter(f => f.isDirectory && f.getName.matches("v\\d+")).map(_.getName).sorted
    assert(vdirs.toSeq === Seq("v2", "v3"))
  }

  test("time travel: readVersion reads snapshots within the retention horizon; vacuum(keepLast) trims unpinned history") {
    Collection.drop(root, "ctt")
    val c = Collection.create(spark, root, "ctt", TextEmbed.DefaultDim, overwrite = true)
    c.setRetention(10) // keep history deep enough to travel back through
    val rows = (0L until 30L).map(i => (i, s"doc number $i")).toDF("id", "text")
    c.insert(TextEmbed.withEmbed(rows, "text", "vector").select("id", "vector", "text"))
    c.delete("id >= 20") // v1: 20 rows
    c.delete("id >= 10") // v2: 10 rows
    assert(c.df.count() === 10)
    // v1 is TWO commits old and still readable (default horizon would
    // have vacuumed it — setRetention is what makes time travel real)
    assert(c.readVersion(1).count() === 20)
    assert(c.readVersion(2).count() === 10)
    val h = c.history()
    assert(h.map(_.version) === Seq(1, 2))
    assert(h.filter(_.current).map(_.version) === Seq(2))
    assert(h.forall(_.sizeBytes > 0))

    c.delete("id >= 5") // v3: 5 rows
    assert(c.readVersion(1).count() === 20)
    // vacuum keeps only the live snapshot; older versions are gone and
    // readVersion refuses with the retained list
    c.vacuum(keepLast = 1)
    assert(c.history().map(_.version) === Seq(3))
    val e = intercept[IllegalArgumentException](c.readVersion(1))
    assert(e.getMessage.contains("no snapshot"))
    assert(c.df.count() === 5) // the live snapshot is never vacuumed
  }

  test("delete leaves NULL-predicate rows alone (they are not matches)") {
    Collection.drop(root, "cnull")
    val c = Collection.create(spark, root, "cnull", TextEmbed.DefaultDim, overwrite = true)
    c.insert(seeded)
    c.insert(seeded.limit(1)
      .withColumn("text", lit(null).cast("string"))
      .withColumn("id", lit(99L)))
    // predicate evaluates NULL on the text-less row: it must survive
    val removed = c.delete("text = 'the quick brown fox jumps'")
    assert(removed === 1)
    assert(c.df.filter(col("id") === 99L).count() === 1)
    assert(c.describe().rows === 4)
  }
}
