package graft.tools

import org.apache.spark.sql.SparkSession

/** Mimics the driver's t1 smoke: SparkEntry.entry(spark) rows > 0,
  * using a vanilla session (no special confs — like the driver's). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n schema=${df.schema.simpleString}")
    df.show(5, truncate = false)
    spark.stop()
  }
}
