package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution for q48 (verdict-r12 #4): grew 1.75x sf0.1→sf1 while its
  * neighbors shrank, and has never been phase-profiled. Suspects: the
  * ExactPercentiles probe pass (count+approx_percentile head() job), the
  * bucketed-vs-window regime flip at SmallSortRows (sf1's 6M rows cross
  * it, sf0.1's 600k don't), and the percentile_approx sketch branch.
  *
  * `sbt 'runMain graft.tools.AbQ48 /root/testdata/sf1 [reps]'`
  */
object AbQ48 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.applyExtraConf(SparkSession.builder()
      .appName("ab-q48").master(s"local[${Runtime.getRuntime.availableProcessors}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $name%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (rep <- 1 to reps) {
      println(s"── rep $rep ──")
      def li = graft.Par(spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_returnflag"), col("l_extendedprice")))
      time("scan+Par only") { sink(li) }
      time("percentile_approx branch") {
        sink(li.groupBy(col("l_returnflag"))
          .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx")))
      }
      time("ranked() full") {
        sink(graft.ExactPercentiles.ranked(li, "l_returnflag", "l_extendedprice"))
      }
      time("ranked()+agg endpoints") {
        import graft.ExactPercentiles._
        sink(ranked(li, "l_returnflag", "l_extendedprice")
          .groupBy(col("l_returnflag"))
          .agg(max(col("n")).as("n"), lo(0.5).as("lo"), hi(0.5).as("hi")))
      }
      time("q48 end-to-end") { sink(graft.SparkEntry.queries("q48_approx_quantile")(spark, dir)) }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
