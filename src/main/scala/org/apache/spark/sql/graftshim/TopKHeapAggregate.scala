package org.apache.spark.sql.graftshim

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/**
 * Bounded top-k heap state: the k best (score, id) pairs under the
 * preference order (score DESC, id ASC) — the exact order
 * `row_number() OVER (ORDER BY cosine DESC, neighbor_id ASC)` ranks
 * by, so an aggregate built on this buffer is a drop-in for the
 * window-top-k pattern with O(k) state instead of a full partition
 * sort.
 *
 * Internally a binary min-heap with the WORST kept entry at the root,
 * so a full heap admits a new entry in O(log k) by root replacement.
 * Score comparison is `java.lang.Double.compare` with -0.0 normalized
 * to 0.0 on insert — matching Spark SQL's double ordering (NaN sorts
 * greatest; ±0.0 compare equal), so heap-vs-window results are
 * identical even on degenerate cosines (NaN from zero vectors,
 * signed zeros from cancellation).
 */
final class TopKHeapBuffer(val k: Int) extends Serializable {
  private[graftshim] val scores = new Array[Double](k)
  private[graftshim] val ids = new Array[Long](k)
  private[graftshim] var size = 0

  /** true iff (s1,i1) is strictly worse than (s2,i2) under
    * (score DESC, id ASC): lower score, or equal score + larger id. */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && i1 > i2)
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(scores(i), ids(i), scores(p), ids(p))) {
        val ts = scores(i); val ti = ids(i)
        scores(i) = scores(p); ids(i) = ids(p)
        scores(p) = ts; ids(p) = ti
        i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      val ts = scores(i); val ti = ids(i)
      scores(i) = scores(m); ids(i) = ids(m)
      scores(m) = ts; ids(m) = ti
      i = m
    }
  }

  def insert(scoreRaw: Double, id: Long): Unit = {
    val score = if (scoreRaw == 0.0) 0.0 else scoreRaw // -0.0 -> 0.0
    if (size < k) {
      scores(size) = score; ids(size) = id
      size += 1
      siftUp(size - 1)
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown()
    }
  }

  def mergeFrom(other: TopKHeapBuffer): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Kept entries, best first: (id, score) sorted by (score DESC, id ASC). */
  def sortedPairs: Array[(Long, Double)] = {
    val out = new Array[(Long, Double)](size)
    var i = 0
    while (i < size) { out(i) = (ids(i), scores(i)); i += 1 }
    out.sortWith { case ((i1, s1), (i2, s2)) =>
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && i1 < i2)
    }
  }
}

/**
 * `top_k_pairs(score, id, k)` — bounded-state top-k aggregate: the k
 * best (score, id) pairs per group under (score DESC, id ASC),
 * returned as `array<struct<neighbor_id: long, cosine: double>>` in
 * rank order (posexplode + pos+1 recovers the dense 1..k rank).
 *
 * This is the scale-correct replacement for the
 * `row_number() OVER (PARTITION BY group ORDER BY score DESC)` +
 * `filter(rank <= k)` pattern. Catalyst does rewrite that pattern with
 * `WindowGroupLimit` (partial map-side limit since SPARK-37099 — the
 * r8 "whole corpus in one task" reading is not true on Spark 4), but
 * the partial limit still requires a FULL local sort of every scored
 * partition (O(n log n) + spill at width). A TypedImperativeAggregate
 * keeps O(k) state per group, combines map-side under hash
 * aggregation (no sort, no spill proportional to the scored volume),
 * and ships only tasks×k rows per group through the shuffle.
 *
 * Null scores/ids are skipped (callers filter nulls before
 * aggregating so heap and window paths stay bit-identical).
 */
case class TopKPairsAgg(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeapBuffer] with ExpectsInputTypes {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, LongType, IntegerType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("neighbor_id", LongType, nullable = false),
      StructField("cosine", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_k_pairs"

  override def createAggregationBuffer(): TopKHeapBuffer = {
    require(k >= 1, s"top_k_pairs k must be >= 1: $k")
    new TopKHeapBuffer(k)
  }

  override def update(buffer: TopKHeapBuffer, input: InternalRow): TopKHeapBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKHeapBuffer, other: TopKHeapBuffer): TopKHeapBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKHeapBuffer): Any = {
    val pairs = buffer.sortedPairs
    val rows = new Array[Any](pairs.length)
    var i = 0
    while (i < pairs.length) {
      rows(i) = new GenericInternalRow(Array[Any](pairs(i)._1, pairs(i)._2))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKHeapBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buffer.size)
    bb.putInt(buffer.k)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i))
      bb.putLong(buffer.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeapBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val bk = bb.getInt()
    val n = bb.getInt()
    val buf = new TopKHeapBuffer(bk)
    var i = 0
    while (i < n) {
      val s = bb.getDouble()
      val id = bb.getLong()
      buf.insert(s, id)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairsAgg =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}

/** Column-API bridge for the private[sql] Expression↔Column converters. */
object TopKColumns {
  /** Aggregate column: top-k (score, id) pairs per group, rank order. */
  def topKPairs(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKPairsAgg(ExpressionUtils.expression(score),
        ExpressionUtils.expression(id), Literal(k))
        .toAggregateExpression())
}
