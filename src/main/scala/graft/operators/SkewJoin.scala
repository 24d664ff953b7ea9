package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed keys.
 *
 * A shuffle join sends every row of a key to one reducer; a hot key
 * (the classic null-surrogate or "unknown" bucket at corpus scale)
 * funnels its whole volume into a single task. AQE's skew-join split
 * handles this when it can observe the skew at runtime, but not every
 * shape qualifies (it only rewrites sort-merge joins, and only under
 * AQE). Salting is the static fix:
 *
 *  - the FACT side appends a deterministic pseudo-random salt in
 *    `[0, saltFactor)` — a hash over the whole row, so one hot key
 *    spreads across `saltFactor` reducers while re-runs stay
 *    reproducible;
 *  - the DIM side replicates each row once per salt value
 *    (`explode(sequence(...))` — `saltFactor` × |dim| rows);
 *  - the equi-join keys become `(keys…, salt)`; each fact row matches
 *    exactly the one replica carrying its salt, so the result is
 *    row-for-row the unsalted inner join.
 *
 * Inner joins only (an outer join would need unmatched-replica
 * cleanup). Fact rows identical in EVERY column share a salt — a
 * corpus of literally duplicated rows should be aggregated first.
 */
object SkewJoin {

  /** Rows up to which a keyed-unique dim side is broadcast instead of
    * salted+shuffled: ~2M narrow rows build to tens of MB — well
    * inside executor budgets and far under Spark's 8 GB/512M-row
    * broadcast cap; past it the salted shuffle path engages. */
  val BroadcastRowBound: Long = 2L << 20

  /**
   * [[salted]] with a size dispatch (the topKAuto/denseVocab idiom):
   * when the caller can BOUND the dim side's row count
   * (`dimRowsAtMost` ≤ [[BroadcastRowBound]]), an explicit broadcast
   * inner join replaces the salted shuffle — row-for-row the same
   * result (every caller's dim is keyed-unique, and a broadcast join
   * never shuffles the fact side, so a hot fact key cannot funnel a
   * reducer: the hub-safety salting exists for is free here). The
   * fact side keeps its partitioning and the 8× dim replication plus
   * the fact-side exchange disappear. At scale the dim side (node
   * cardinality in the graph callers) outgrows the bound and the
   * salted path engages unchanged — the bound, not the call site,
   * carries the scale contract.
   */
  def saltedAuto(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltFactor: Int, dimRowsAtMost: Long): DataFrame =
    if (dimRowsAtMost <= BroadcastRowBound)
      fact.join(org.apache.spark.sql.functions.broadcast(dim), keys)
    else salted(fact, dim, keys, saltFactor)

  def salted(fact: DataFrame, dim: DataFrame, keys: Seq[String],
             saltFactor: Int): DataFrame = {
    require(keys.nonEmpty, "join keys must not be empty")
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    require(!fact.columns.contains("__salt") &&
      !dim.columns.contains("__salt"), "__salt is reserved by SkewJoin")
    val f = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toSeq: _*), lit(saltFactor.toLong))
        .cast("int"))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    f.join(d, keys :+ "__salt").drop("__salt")
  }
}
