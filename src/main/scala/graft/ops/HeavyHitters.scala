package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Exact frequent-items ("heavy hitters") without a full-vocabulary
 * shuffle: per-partition Misra–Gries summaries nominate a bounded
 * candidate set, one broadcast semi-join recounts ONLY the candidates
 * exactly, and the guarantee threshold keeps the result exact.
 *
 * Why not a plain `groupBy(token).count.orderBy`? At 100 TB the token
 * groupBy shuffles the ENTIRE long tail (billions of near-unique
 * keys) to answer a question about a handful of hot ones. Here the
 * shuffle carries at most `partitions · k` candidate tokens plus the
 * recount of candidate rows.
 *
 * Exactness: if count(x) > N/k then by averaging there is a partition
 * p where count_p(x) > N_p/k, and Misra–Gries with k counters never
 * evicts an item that frequent within its partition — so the union of
 * partition summaries contains EVERY global item above threshold. The
 * exact recount then removes all false nominees. Output = items with
 * `cnt · k > N` (strict, integer arithmetic), their exact counts —
 * deterministic at any partitioning, any row order.
 */
object HeavyHitters {

  /** Frequent values of `tokCol` (count > N/k), exact.
    * Output: (tok, cnt) — `tok` is the string form of the value. */
  def frequentItems(df: DataFrame, tokCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(col(tokCol).cast("string").as("tok"))
      .filter(col("tok").isNotNull)
    val n = toks.count()
    val cand = toks.as[String].mapPartitions { it =>
      val counters = mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        counters.get(t) match {
          case Some(c) => counters.update(t, c + 1)
          case None if counters.size < k => counters.update(t, 1L)
          case None =>
            // decrement-all step (amortized O(1) per input item)
            val dead = mutable.ArrayBuffer.empty[String]
            counters.foreach { case (key, c) =>
              if (c == 1L) dead += key else counters.update(key, c - 1)
            }
            dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("tok").distinct()
    toks.join(broadcast(cand), Seq("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > n)
  }
}
