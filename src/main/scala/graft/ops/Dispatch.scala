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
