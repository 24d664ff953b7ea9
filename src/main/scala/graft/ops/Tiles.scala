package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

import graft.functions.FastHash

/**
 * Afrati–Ullman block-pair tiling, shared by every dense all-pairs
 * path (Jaccard bitmaps, simhash signatures, cosine vectors,
 * cross-corpus containment): documents are assigned to B blocks, each
 * unordered block pair is ONE task holding its two blocks' documents,
 * and the per-pair kernel runs inside the task with no further
 * shuffle. Replication is n·B rows — communication-optimal for
 * all-pairs workloads; pick B so a tile (2n/B payloads) fits executor
 * memory.
 *
 * Every unordered document pair appears in exactly one tile (the
 * (min(blkA, blkB), max(blkA, blkB)) one); same-block tiles iterate
 * i < j, cross tiles run the full bipartite loop.
 */
private[ops] object Tiles {

  /** Dictionary bitmap encoder over a sorted vocabulary: returns the
    * UDF turning a sorted hash array into a V-bit bitmap, plus the
    * bitmap word count. Shared by every dense bitmap path. */
  def bitmapUdf(spark: org.apache.spark.sql.SparkSession,
                vocab: Array[Long])
      : (org.apache.spark.sql.expressions.UserDefinedFunction, Int) = {
    val nWords = (vocab.length + 63) >>> 6
    val bcVocab = spark.sparkContext.broadcast(vocab)
    val toBits = org.apache.spark.sql.functions.udf((hs: Array[Long]) => {
      val v = bcVocab.value
      val words = new Array[Long](nWords)
      var i = 0
      while (i < hs.length) {
        val r = java.util.Arrays.binarySearch(v, hs(i))
        if (r >= 0) words(r >>> 6) |= 1L << (r & 63)
        i += 1
      }
      words
    })
    (toBits, nWords)
  }

  private def blockOf(id: Long, blocks: Int): Int =
    ((FastHash.fmix64(id) >>> 1) % blocks).toInt // >>> 1 keeps it non-negative

  private def replicated[P](docs: Dataset[(Long, P)], blocks: Int,
                            marker: Int, ownBlockFirst: Boolean)(
      implicit pEnc: Encoder[P]): Dataset[(Int, Int, Long, P)] = {
    implicit val enc: Encoder[(Int, Int, Long, P)] = Encoders.tuple(
      Encoders.scalaInt, Encoders.scalaInt, Encoders.scalaLong, pEnc)
    val b = blocks
    docs.flatMap { case (id, p) =>
      val blk = blockOf(id, b)
      (0 until b).iterator.map { o =>
        val pk = if (ownBlockFirst) blk * b + o else o * b + blk
        (pk, marker, id, p)
      }
    }
  }

  /** Self all-pairs: `compare(a, b, out)` once per unordered doc pair. */
  def selfPairs[P: Encoder, R: Encoder](
      docs: Dataset[(Long, P)], blocks: Int)(
      compare: ((Long, P), (Long, P), ArrayBuffer[R]) => Unit): Dataset[R] = {
    val b = blocks
    val expanded = docs.flatMap { case (id, p) =>
      val blk = blockOf(id, b)
      (0 until b).iterator.map { o =>
        (math.min(blk, o) * b + math.max(blk, o), blk, id, p)
      }
    }(Encoders.tuple(Encoders.scalaInt, Encoders.scalaInt,
      Encoders.scalaLong, implicitly[Encoder[P]]))
    expanded.groupByKey(_._1)(Encoders.scalaInt).flatMapGroups { (pk, it) =>
      val lo = pk / b
      val hi = pk % b
      val las = ArrayBuffer.empty[(Long, P)]
      val has = ArrayBuffer.empty[(Long, P)]
      it.foreach { case (_, blk, id, p) =>
        if (blk == lo) las += ((id, p)) else has += ((id, p))
      }
      val out = ArrayBuffer.empty[R]
      if (lo == hi) {
        var i = 0
        while (i < las.length) {
          var j = i + 1
          while (j < las.length) { compare(las(i), las(j), out); j += 1 }
          i += 1
        }
      } else {
        var i = 0
        while (i < las.length) {
          var j = 0
          while (j < has.length) { compare(las(i), has(j), out); j += 1 }
          i += 1
        }
      }
      out.iterator
    }
  }

  /** Bipartite grid: `tile(lefts, rights, out)` once per (left block ×
    * right block) task — for per-left aggregations (e.g. max
    * containment) emit partial results and reduce outside. */
  def grid[P: Encoder, R: Encoder](
      left: Dataset[(Long, P)], right: Dataset[(Long, P)], blocks: Int)(
      tile: (ArrayBuffer[(Long, P)], ArrayBuffer[(Long, P)], ArrayBuffer[R]) => Unit)
      : Dataset[R] = {
    val lRep = replicated(left, blocks, marker = 0, ownBlockFirst = true)
    val rRep = replicated(right, blocks, marker = 1, ownBlockFirst = false)
    lRep.union(rRep).groupByKey(_._1)(Encoders.scalaInt)
      .flatMapGroups { (_, it) =>
      val ls = ArrayBuffer.empty[(Long, P)]
      val rs = ArrayBuffer.empty[(Long, P)]
      it.foreach { case (_, marker, id, p) =>
        if (marker == 0) ls += ((id, p)) else rs += ((id, p))
      }
      val out = ArrayBuffer.empty[R]
      tile(ls, rs, out)
      out.iterator
    }
  }
}
