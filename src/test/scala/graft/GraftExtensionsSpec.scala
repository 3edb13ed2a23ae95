package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions session resolves dot_f32 / cosine_f32 in SQL") {
    // a dedicated session: extensions must come in through the builder.
    // getOrCreate reuses any default session (ignoring extensions), which
    // made this test order-dependent — clear first so a REAL new session
    // (on the shared SparkContext) is built with the extensions applied.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = s.sql(
        "SELECT dot_f32(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "cosine_f32(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c").head()
      assert(r.getDouble(0) === 11.0)
      assert(r.getDouble(1) === 0.0)
    } finally {
      // keep the shared session usable for other suites
      SparkSession.setActiveSession(SparkSpec.spark)
      SparkSession.setDefaultSession(SparkSpec.spark)
    }
  }
}
