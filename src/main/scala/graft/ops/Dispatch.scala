package graft.ops

import org.apache.spark.sql.DataFrame
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
}
