package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions route: native functions injected at
  * session build, no Gateway/registration call needed. */
class ExtensionsSpec extends AnyFunSuite {
  test("GraftExtensions injects trigram functions at session build") {
    // getOrCreate would silently return a pre-existing default session
    // (ignoring withExtensions) in a full-suite run — clear and restore
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.ui.enabled", "false")
        .withExtensions(new org.apache.spark.sql.graftshim.GraftExtensions)
        .getOrCreate()
      val r = spark.sql(
        "SELECT trigram_similarity('word', 'two words') AS s, " +
        "trigram_distance('abc', 'abc') AS d").collect()(0)
      assert(math.abs(r.getDouble(0) - 4.0 / 11.0) < 1e-9)
      assert(r.getDouble(1) == 0.0)
      // nfc_normalize: decomposed e+U+0301 composes to U+00E9
      val n = spark.sql("SELECT nfc_normalize('e" + "\u0301" + "') AS n").first
      assert(n.getString(0) == "caf\u00e9".substring(3))
      // don't stop(): that would kill the shared SparkContext
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
