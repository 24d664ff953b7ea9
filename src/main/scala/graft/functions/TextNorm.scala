package graft.functions

import java.text.Normalizer

/**
 * Unicode normalization kernel. Static JVM helper so both the Scala
 * API and whole-stage-generated code can call it (same split as
 * [[Trigram]]).
 *
 * NFC is the canonical form a web-corpus cleaning pass settles on
 * before hashing/dedup — without it, composed ("é") and decomposed
 * ("e" + U+0301) spellings of the same text hash apart and every
 * downstream dedup/fingerprint op silently misses duplicates.
 */
object TextNorm extends Serializable {

  /** NFC-normalize; the `isNormalized` probe makes the (dominant)
    * already-ASCII/already-NFC case allocation-free. */
  def nfc(s: String): String =
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) s
    else Normalizer.normalize(s, Normalizer.Form.NFC)
}
