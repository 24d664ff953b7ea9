package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints whether trigram_similarity runs inside WholeStageCodegen
  * (checked over a real scan — a local relation is collapsed to a
  * LocalTableScan with no codegen stage at all). */
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.Functions.register(spark)
    val df = spark.read
      .parquet("/root/testdata/sf0.001/customer.parquet")
      .selectExpr("trigram_similarity(c_name, c_mktsegment) as sim")
    val plan = df.queryExecution.executedPlan.toString
    println("[codegen] plan:\n" + plan)
    import spark.implicits._
    println("[codegen] sum: " + df.as[Double].collect().sum)
    spark.stop()
  }
}
