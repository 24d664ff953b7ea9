package graft.ops

import org.apache.spark.sql.DataFrame

/**
 * Shared registry for operator-persisted frames whose lifetime must
 * outlive the building call (the returned plan reads them, so the
 * operator cannot unpersist before returning): operators [[add]] as
 * they hand plans out, callers release everything in one sweep. One
 * mechanism for every cache-owning operator ([[Retrieval]],
 * [[DatasetCard]]) — released plans recompute correctly, just slower,
 * if re-evaluated afterwards.
 */
private[graft] final class CacheRegistry {
  private val live =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  def add(df: DataFrame): DataFrame = { live.add(df); df }

  def releaseAll(): Unit = {
    var df = live.poll()
    while (df != null) { df.unpersist(); df = live.poll() }
  }
}
