package graft.functions

/**
 * Deterministic 64-bit string hash (FNV-1a core + Murmur3 fmix64
 * avalanche) used by the MinHash / SimHash kernels. JVM-compiled and
 * allocation-free — these kernels run as Scala UDFs because Spark's
 * higher-order array functions (transform/aggregate/zip_with) are
 * CodegenFallback, i.e. interpreted per element; a tight JIT'd loop is
 * orders of magnitude faster in the per-pair/per-token hot path.
 */
object FastHash extends Serializable {

  def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    fmix64(h)
  }

  /** Murmur3 64-bit finalizer (public domain). */
  def fmix64(x: Long): Long = {
    var h = x
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** Sorted distinct 64-bit hash set of a string's k-char shingles —
    * the per-document prep of every Jaccard/MinHash path, as a static
    * JVM kernel so the native [[org.apache.spark.sql.graftshim.ShingleHashesExpr]]
    * can call it from generated code. */
  def shingleHashSet(s: String, k: Int): Array[Long] = {
    val hs = shingleHashesByPos(s, k)
    val m = hs.length
    if (m == 0) return hs
    java.util.Arrays.sort(hs)
    // dedupe in place
    var out = 0
    var p = 0
    while (p < m) {
      if (out == 0 || hs(p) != hs(out - 1)) { hs(out) = hs(p); out += 1 }
      p += 1
    }
    java.util.Arrays.copyOf(hs, out)
  }

  /** Positional variant of [[shingleHashSet]] (and the single home of
    * the window + hash rules — the set form is sort+dedupe of this):
    * hs(i) = hash of the shingle starting at 0-based char i — NOT
    * sorted or deduped, so index i is the span position. */
  def shingleHashesByPos(s: String, k: Int): Array[Long] = {
    if (s == null) return Array.emptyLongArray
    val n = s.length
    if (n == 0) return Array.emptyLongArray
    val m = math.max(1, n - k + 1)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      // inline FNV-1a over the shingle window, avalanche at end
      var h = 0xcbf29ce484222325L
      var j = i
      val end = math.min(i + k, n)
      while (j < end) { h ^= s.charAt(j); h *= 0x100000001b3L; j += 1 }
      hs(i) = fmix64(h)
      i += 1
    }
    hs
  }
}
