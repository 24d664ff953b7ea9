package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Fuzzy, Matcher}

object Debug2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val src = cust.filter(col("c_custkey") < 200)
      .select(col("c_custkey").as(Matcher.SourceId),
        translate(col("c_name"), "1", "l").as("c_name"))
    val tgt = cust.select(col("c_custkey"), col("c_name"))
    var t0 = System.nanoTime()
    val pairs = Fuzzy.candidatePairs(src, Matcher.SourceId, "c_name", tgt, "c_custkey", "c_name")
    println(s"[d2] pairs: ${pairs.count()} in ${(System.nanoTime()-t0)/1e9}s")
    t0 = System.nanoTime()
    val asg = Fuzzy.greedyAssign(pairs, Matcher.SourceId, "c_custkey")
    println(s"[d2] assigned: ${asg.count()} in ${(System.nanoTime()-t0)/1e9}s")
    spark.stop()
  }
}
