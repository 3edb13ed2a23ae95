package graft

import org.apache.spark.sql.functions._

/** q111's Apriori prune branch (r14) is NEVER exercised by the driver
  * corpus — every token of the synthetic ~31-type vocabulary passes the
  * 5% doc-frequency floor, so the gate only proves the no-prune path.
  * This spec builds a SKEWED fixture where per-doc unique tokens fall
  * below the floor (the Zipfian shape the prune exists for), including a
  * token sitting EXACTLY on the floor (c = ceil(0.05·n) boundary), and
  * checks the full query output against an independent brute-force
  * mirror of the PMI formula computed driver-side.
  */
class AssocPmiSpec extends SparkSpec {
  import spark.implicits._

  test("q111 prune branch: skewed vocabulary matches the brute-force PMI, floor boundary survives") {
    val nDocs = 40
    // every doc: alpha beta (always paired); gamma in 10; delta in
    // exactly 2 (floor = 0.05*40 = 2.0 — c >= floor must SURVIVE);
    // rare<i> unique per doc (c = 1 < 2 — must be PRUNED, and its pairs
    // would have failed the c_ab floor anyway: prune must not change
    // anything)
    val rows = (0 until nDocs).map { i =>
      val extra = new StringBuilder
      if (i < 10) extra.append(" gamma")
      if (i < 2) extra.append(" delta")
      (i.toLong, s"alpha beta rare$i" + extra.toString)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-q111").toFile
    try {
      rows.toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")

      val got = SparkEntry.queries("q111_assoc_pmi")(spark, dir.toString)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getDouble(4), r.getDouble(5)))

      // ── independent mirror: same arithmetic, no DataFrames ──
      val pres: Seq[(Long, String)] = rows.flatMap { case (id, text) =>
        text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).distinct
          .map(t => (id, t))
      }
      val nD = pres.map(_._1).distinct.size.toDouble
      val cT: Map[String, Long] =
        pres.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
      val cAb: Map[(String, String), Long] = pres.groupBy(_._1).toSeq
        .flatMap { case (_, xs) =>
          val ts = xs.map(_._2).sorted
          for (i <- ts.indices; j <- i + 1 until ts.size) yield (ts(i), ts(j))
        }
        .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      def half6(v: Double): Long =
        math.floor(BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble * 1e6 + 0.5).toLong
      val expected = cAb.toSeq
        .filter { case (_, cab) => cab >= 0.05 * nD }
        .map { case ((a, b), cab) =>
          val pmiInt = half6(math.log(cab * nD / (cT(a) * cT(b)).toDouble))
          val conf = math.floor(cab.toDouble / cT(a) * 1e6 + 0.5) / 1e6
          (a, b, cab, conf, pmiInt)
        }
        .sortBy { case (a, b, _, _, pmiInt) => (-pmiInt, a, b) }
        .take(20).zipWithIndex
        .map { case ((a, b, cab, conf, pmiInt), i) =>
          (i + 1L, a, b, cab, conf, pmiInt / 1e6)
        }

      // the fixture actually exercises what it claims: sub-floor tokens
      // exist (prune branch taken) and the boundary token survives
      assert(cT.count { case (_, c) => c < 0.05 * nD } === nDocs,
        "fixture must carry sub-floor (pruned) tokens")
      assert(got.exists { case (_, a, b, _, _, _) =>
        (a == "alpha" && b == "delta") || (a == "delta" && b == "alpha")
      }, s"floor-boundary pair (alpha, delta) must survive the prune: ${got.mkString("\n")}")

      assert(got.length === expected.length,
        s"got ${got.toSeq}\nexpected $expected")
      got.zip(expected).foreach { case (g, e) => assert(g === e) }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir)
    }
  }
}
