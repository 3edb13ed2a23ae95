package graft

import org.apache.spark.sql.functions._

/** The q126 scale property the round-7 formulation lacked: a source
  * holding ~90% of the corpus must NOT pack on a single task. Range
  * sub-sharding (`seqPackRanges`) keys the partitioning by
  * (source, doc_id div PackRangeDocs), so the dominant source spreads
  * across |source|/PackRangeDocs tasks and the re-base
  * (`rebasePacked`) stitches shard-local bins into dense global
  * seq_ids. */
class PackSkewSpec extends SparkSpec {

  test("a 90%-skewed source packs on more than one task, output replays the two-level recurrence") {
    import spark.implicits._
    val R = CurationQueries.PackRangeDocs
    // big: 900 docs (doc_ids 0..899 → 8 ranges at R=128); small: 100
    val rows =
      (0L until 900L).map(i => ("big", i, 40L + (i % 7L) * 11L)) ++
      (900L until 1000L).map(i => ("small", i, 35L))
    val df = rows.toDF("source", "doc_id", "n_tok")

    val packed = CurationQueries.seqPackRanges(df)
    // >1 task: the packing pass must see big's rows in multiple
    // partitions of the repartition(source, range_id) exchange. AQE's
    // partition coalescer legitimately folds this KB-sized test exchange
    // to one partition, so pin it off for the assertion — what's under
    // test is the hash KEY (source, range_id), which is what spreads a
    // dominant source at real volume.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey, "true")
    val partsOfBig =
      try {
        spark.conf.set(coalesceKey, "false")
        packed.withColumn("pid", spark_partition_id())
          .filter(col("source") === "big")
          .select(col("pid")).distinct().count()
      } finally spark.conf.set(coalesceKey, prev)
    assert(partsOfBig > 1L,
      s"the 90% source packed on $partsOfBig task(s) — the skew ceiling is back")

    // exactness: the rebased output equals a driver-side replay of the
    // same two-level recurrence (next-fit per range, exclusive-scan base)
    val got = CurationQueries.rebasePacked(packed)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (src, g) =>
      var base = 0L
      g.sortBy(_._2).groupBy(_._2 / R).toSeq.sortBy(_._1).flatMap { case (_, range) =>
        var bin = 0L; var fill = -1L
        val out = range.sortBy(_._2).map { case (_, id, n) =>
          if (fill < 0) { bin = 0L; fill = n }
          else if (fill + n > 256L) { bin += 1L; fill = n }
          else fill += n
          (src, id, n, base + bin, fill)
        }
        base += bin + 1L
        out
      }
    }.sortBy(t => (t._1, t._2))
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g === e) }

    // per-source seq_ids stay dense after stitching
    got.groupBy(_._1).foreach { case (src, g) =>
      val bins = g.map(_._4).distinct
      assert(bins.max === bins.length - 1L, s"$src: seq_ids not dense after re-base")
    }
  }
}
