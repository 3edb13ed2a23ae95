package graft.tools

import org.apache.spark.sql.SparkSession
import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.concurrent.ExecutionContext.Implicits.global

/** Scratch reproducer for the q130 row-collapse under clearCache
  * interference (r18). Prints the collapsed rows when it fires. */
object DebugQ130 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q117_logreg_quality", "q130_calibration", "q128_bpe_train"))
    val serial = graft.SparkEntry.queries("q130_calibration")(spark, sf)
      .collect().map(_.toString).toSeq
    println(s"[debug] serial q130: ${serial.size} rows")
    var iter = 0
    var failed = false
    while (iter < 60 && !failed) {
      iter += 1
      @volatile var running = true
      val clearer = new Thread(() => {
        while (running) { spark.catalog.clearCache(); Thread.sleep(10) }
      })
      clearer.setDaemon(true); clearer.start()
      try {
        val res = Await.result(
          Future.traverse(names)(n =>
            Future(n -> graft.SparkEntry.queries(n)(spark, sf).collect().map(_.toString).toSeq)),
          Duration.Inf).toMap
        val q130 = res("q130_calibration")
        if (q130.size != serial.size) {
          failed = true
          println(s"[debug] ITER $iter COLLAPSED: ${q130.size} rows:")
          q130.foreach(r => println(s"[debug]   $r"))
        } else if (iter % 10 == 0) println(s"[debug] iter $iter ok")
      } finally { running = false; clearer.join() }
    }
    println(s"[debug] done after $iter iters, failed=$failed")
    spark.stop()
  }
}
