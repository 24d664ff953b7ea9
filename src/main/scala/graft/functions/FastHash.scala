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
}
