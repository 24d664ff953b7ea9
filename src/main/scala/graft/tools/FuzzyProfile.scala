package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Fuzzy, Matcher}

/** Stage-level CPU breakdown of the q_fuzzy_match pipeline — where do
  * the bench CPU-seconds go: trigram prep, candidate probe, or the
  * greedy assignment? */
object FuzzyProfile {
  private def cpuSec(): Double = {
    import java.lang.management.ManagementFactory
    ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        os.getProcessCpuTime / 1e9
      case _ => -1.0
    }
  }
  private def tme[T](label: String)(f: => T): T = {
    val c0 = cpuSec(); val t0 = System.nanoTime()
    val r = f
    println(f"[fuzzyprofile] $label: wall=${(System.nanoTime() - t0) / 1e9}%.2fs cpu=${cpuSec() - c0}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val snippet = substring(col("text"), 1, 60)
    def docs = graft.SparkEntry.queries // force entry init
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val src = d.filter(col("doc_id") % 37 === 0)
      .select(col("doc_id").as(Matcher.SourceId),
        translate(snippet, "e", "3").as("snippet"))
    val tgt = d.select(col("doc_id"), snippet.as("snippet"))
    (1 to 3).foreach { i =>
      val pairs = tme(s"candidatePairs build+count (pass $i)") {
        val p = Fuzzy.candidatePairs(
          src, Matcher.SourceId, "snippet", tgt, "doc_id", "snippet")
        println(s"[fuzzyprofile] pairs=${p.count()}")
        p.persist()
      }
      pairs.count()
      tme(s"greedyAssign (pass $i)") {
        println("[fuzzyprofile] assigned=" +
          Fuzzy.greedyAssign(pairs, Matcher.SourceId, "doc_id").count())
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
