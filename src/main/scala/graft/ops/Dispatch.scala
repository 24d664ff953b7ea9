package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Shared predicates for the adaptive-path dispatchers (the dense
  * tiled paths key documents by a long-cast id, so only integral id
  * types can take them — checked in one place instead of per
  * operator). */
private[graft] object Dispatch {
  def integralId(df: DataFrame, idCol: String): Boolean =
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }

  /** Spread a CPU-heavy narrow kernel across the session's cores when
    * the upstream scan cannot (optimization-guide §2.5, input skew:
    * "one huge unsplittable file … repartition immediately after the
    * read"). Fixture-scale inputs are single-file single-row-group
    * parquet, so every scan resolves to ONE effective task and a
    * narrow kernel chain (tokenize / featurize / decode / pair-score)
    * runs serially while the other cores idle — worse, AQE then picks
    * broadcast joins whose probe side inherits that single partition,
    * so the whole downstream chain stays serial. At production scale a
    * scan has ≥ parallelism splits and this is a structural no-op: the
    * partition-count guard, not the call site, is the contract.
    *
    * Deterministic HASH partitioning on `keys` — never round-robin
    * (round-robin pays a per-partition sort since SPARK-23207 and is
    * retry-unsafe for non-deterministic upstreams); callers pass a
    * high-cardinality key (the row id), so the spread is even. Every
    * declared query's result is partition-layout-independent (sorted
    * oracle compare; aggregates under the DECIMAL discipline), so this
    * cannot change what a query computes — re-verified per touched
    * gate against the DuckDB oracle.
    */
  def fanOut(df: DataFrame, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "fanOut needs a deterministic partition key")
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (target <= 1 || df.rdd.getNumPartitions >= target) df
    else df.repartition(target, keys: _*)
  }

  /** The dense-path dispatch probe shared by the Jaccard/containment
    * operators: approximate the token-hash cardinality first (one
    * cheap agg), and only collect the exact sorted vocabulary when it
    * plausibly fits `limit` (1.2 slack absorbs HLL error). `None`
    * means "take the sparse path" — either the id type can't key a
    * bitmap tile or the universe is too large. */
  def denseVocab(toks: DataFrame, tokCol: Column, idOk: Boolean,
                 limit: Int): Option[Array[Long]] = {
    val approxV =
      if (idOk && limit > 0)
        toks.agg(approx_count_distinct(tokCol)).head.getLong(0)
      else Long.MaxValue
    if (approxV <= limit * 1.2) {
      val v = toks.select(tokCol).distinct().collect().map(_.getLong(0))
      if (v.length <= limit) { java.util.Arrays.sort(v); Some(v) }
      else None
    } else None
  }
}
