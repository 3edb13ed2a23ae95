package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import graft.{GraftExtensions, PlanProbe, SparkEntry}

/** Per-query formatted-plan snapshots for the optimization-round evidence
  * files (`plans/rNN/<query>_{before,after}.txt`).
  *
  * Usage: runMain graft.tools.PlanSnap <outDir> <suffix> <q1,q2,...> [sfDir]
  *
  * For each query, writes `<outDir>/<name>_<suffix>.txt` holding the
  * returned frame's `.explain("formatted")`, plus — for the
  * persist-discipline queries whose returned frame is an opaque
  * checkpoint scan — every PlanProbe-recorded inner plan (the plans that
  * actually executed inside the query, keyed `name` / `name#<sub>`).
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      PlanProbe.setEnabled(true)
      val sb = new StringBuilder
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        sb ++= s"# $name ($suffix) — .explain(\"formatted\"), $sfDir\n\n"
        sb ++= df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        // inner executions (materialized mid-fn; the real shapes for
        // checkpoint-returning queries), mainline first then #subs
        PlanProbe.getFormatted(name).foreach { inner =>
          sb ++= s"\n\n## inner plan: $name (materialized inside the query)\n\n"
          sb ++= inner
        }
        import scala.jdk.CollectionConverters._
        PlanProbe.allNames.asScala.toSeq.sorted
          .filter(_.startsWith(name + "#")).foreach { sub =>
            PlanProbe.getFormatted(sub).foreach { inner =>
              sb ++= s"\n\n## inner plan: $sub\n\n"
              sb ++= inner
            }
          }
      } finally PlanProbe.setEnabled(false)
      spark.catalog.clearCache()
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), sb.toString)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
