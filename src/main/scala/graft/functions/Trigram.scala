package graft.functions

/**
 * Trigram similarity with pg_trgm-compatible semantics.
 *
 * The reference accepts a fuzzy match when the pg_trgm distance
 * `source.col <-> target.col` is below 0.5
 * (reference: lib/voter_file/csv_driver/fuzzy_merger.rb:5,60-61).
 * pg_trgm semantics (public Postgres docs/source): lowercase the string,
 * split into alphanumeric words, pad each word with two leading and one
 * trailing space, collect the distinct 3-grams, and compute Jaccard
 * similarity |A ∩ B| / |A ∪ B|. Distance = 1 - similarity.
 *
 * Implemented as a static helper so both the Scala API and generated
 * code (codegen'd Catalyst expression) can call it.
 */
object Trigram extends Serializable {

  /** Distinct padded 3-grams of a string, pg_trgm style. */
  def trigrams(s: String): java.util.HashSet[String] = {
    val out = new java.util.HashSet[String]()
    if (s == null) return out
    val lower = s.toLowerCase
    val n = lower.length
    var i = 0
    while (i < n) {
      // skip non-alphanumeric
      while (i < n && !Character.isLetterOrDigit(lower.charAt(i))) i += 1
      val start = i
      while (i < n && Character.isLetterOrDigit(lower.charAt(i))) i += 1
      if (i > start) {
        // word = lower[start, i); pad "  word "
        val w = new java.lang.StringBuilder(i - start + 3)
        w.append("  ").append(lower, start, i).append(' ')
        val m = w.length()
        var j = 0
        while (j + 3 <= m) {
          out.add(w.substring(j, j + 3))
          j += 1
        }
      }
    }
    out
  }

  /** Jaccard similarity of the two trigram sets (pg_trgm `similarity`). */
  def similarity(a: String, b: String): Double = {
    val ta = trigrams(a)
    val tb = trigrams(b)
    if (ta.isEmpty && tb.isEmpty) return 0.0
    var inter = 0
    val it = ta.iterator()
    while (it.hasNext) if (tb.contains(it.next())) inter += 1
    val union = ta.size() + tb.size() - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** pg_trgm `<->` distance = 1 - similarity. */
  def distance(a: String, b: String): Double = 1.0 - similarity(a, b)
}
