package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * SCD Type-2 merge: history-preserving upsert (beyond-parity extension
 * of the M-family — the reference's merge, record_merger.rb, OVERWRITES
 * matched rows; warehouse dimension tables and reproducible
 * training-data snapshots instead close the old version and append the
 * new one, keyed by validity interval).
 *
 * Target layout: the business columns plus `validFrom`/`validTo`
 * interval columns; a row is CURRENT iff `validTo IS NULL`. Exactly one
 * current row per key is assumed (the invariant this operator itself
 * maintains). The source is a snapshot of current truth: one row per
 * key, business columns only.
 *
 * Per source key:
 *  - no current target row        → insert (effectiveTs, null);
 *  - current row differs on
 *    `compareCols` (null-safe)    → close it (validTo := effectiveTs)
 *                                   and insert the new version;
 *  - current row identical        → untouched (idempotent re-loads).
 * Target keys absent from the source stay open — a snapshot that DROPS
 * a key is a delete, which SCD2 models explicitly upstream, not here.
 *
 * Scale: closed history rows pass through untouched (filter only);
 * current rows full-outer-join the source on the key — ONE shuffle,
 * AQE-broadcastable when the snapshot is small — and the change test is
 * a null-safe column comparison, no row serialization. Output unions
 * are free.
 */
object Scd2 {

  def merge(target: DataFrame, source: DataFrame, pk: String,
            compareCols: Seq[String], effectiveTs: Column,
            validFrom: String = "valid_from",
            validTo: String = "valid_to"): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must not be empty")
    val attrs = target.columns.filterNot(c => c == validFrom || c == validTo)
    require(attrs.contains(pk), s"pk '$pk' must be a target column")
    require(compareCols.forall(attrs.contains),
      s"compareCols must be target business columns: $compareCols")

    val cur = target.filter(col(validTo).isNull)
    val hist = target.filter(col(validTo).isNotNull)
    // prefix the source side so the join output is unambiguous whatever
    // the caller's column names
    val sPref = attrs.foldLeft(source.select(attrs.map(col).toSeq: _*)) {
      (d, c) => d.withColumnRenamed(c, s"__s_$c")
    }
    val j = cur.join(sPref, col(pk) === col(s"__s_$pk"), "full_outer")
    val srcPresent = col(s"__s_$pk").isNotNull
    val tgtPresent = col(pk).isNotNull
    val same = compareCols.map(c => col(c) <=> col(s"__s_$c"))
      .reduce(_ && _)

    // existing current rows: closed when superseded, else untouched
    val oldRows = j.filter(tgtPresent).select(
      attrs.map(col) :+ col(validFrom) :+
        when(srcPresent && !same, effectiveTs)
          .otherwise(col(validTo)).as(validTo): _*)
    // new versions: brand-new keys, or keys whose values changed
    val newRows = j.filter(srcPresent && (!tgtPresent || !same)).select(
      attrs.map(c => col(s"__s_$c").as(c)) :+
        effectiveTs.as(validFrom) :+
        lit(null).cast(target.schema(validTo).dataType).as(validTo): _*)

    hist.select(oldRows.columns.map(col).toSeq: _*)
      .unionAll(oldRows).unionAll(newRows)
  }
}
