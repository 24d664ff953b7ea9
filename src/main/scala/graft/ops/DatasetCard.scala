package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * One-call corpus datasheet ("Datasheets for Datasets", Gebru et al.
 * 2018) — the release-note numbers every published training corpus
 * ships with, computed in a handful of map-side-combined passes and
 * emitted as a tall (metric, value) table that diffs cleanly between
 * corpus versions (pipe two cards into
 * [[graft.operators.Audits.tableDiff]] keyed on `metric`, or store one
 * per [[graft.sources.SnapshotStore]] version).
 *
 * Metrics: corpus totals (docs, blanks, chars, tokens, mean tokens per
 * doc), per-language doc counts, and char-length quantiles via the
 * deterministic DDSketch histogram chain
 * ([[graft.operators.Audits.quantileHistogram]]) — so every number,
 * including the quantiles, is exactly reproducible at any partition
 * layout and hash-exact against a SQL oracle. Token counts use the
 * whitespace tokenizer ([[TextAnalysis.tokenCount]]); the mean is one
 * long/long IEEE division.
 *
 * Scale shape: one aggregate for the totals, one groupBy for the
 * (bounded-cardinality) language counts, one bucket aggregate + grid-
 * bounded walk for the quantiles. Nothing data-sized leaves the
 * executors.
 */
object DatasetCard {

  def build(docs: DataFrame, textCol: String,
            langCol: String, alpha: Double = 0.02): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    // ONLY the derived scalar/lang columns are cached: carrying the
    // text payload (or the id) into the persisted projection would
    // cache the dominant bytes of a 100 TB corpus to serve a card of
    // a few dozen scalars
    val base = docs.select(
      coalesce(col(langCol).cast("string"), lit("_null")).as("__lang"),
      length(t).cast("long").as("__chars"),
      TextAnalysis.tokenCount(t).cast("long").as("__toks"),
      (col(textCol).isNull || trim(t) === "").cast("long").as("__blank"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = base.agg(
      count(lit(1)).as("n"),
      coalesce(sum(col("__blank")), lit(0L)).as("blanks"),
      coalesce(sum(col("__chars")), lit(0L)).as("chars"),
      coalesce(sum(col("__toks")), lit(0L)).as("toks"))
    val globalRows = totals.select(expr(
      """stack(5,
        | 'corpus/n_docs', CAST(n AS DOUBLE),
        | 'corpus/blank_docs', CAST(blanks AS DOUBLE),
        | 'corpus/total_chars', CAST(chars AS DOUBLE),
        | 'corpus/total_tokens', CAST(toks AS DOUBLE),
        | 'corpus/mean_doc_tokens',
        |   CAST(toks AS DOUBLE) / CAST(n AS DOUBLE)) AS (metric, value)
        |""".stripMargin))
    val langRows = base.groupBy(col("__lang"))
      .agg(count(lit(1)).as("n"))
      .select(
        concat(lit("lang/"), col("__lang"), lit("/docs")).as("metric"),
        col("n").cast("double").as("value"))
    val hist = graft.operators.Audits.quantileHistogram(
      base.withColumn("__all", lit(1)), Seq("__all"), "__chars", alpha)
    val quants = graft.operators.Audits
      .rollupQuantiles(hist, Nil, Seq(0.5, 0.95), alpha)
    // literal metric names per quantile — deriving "p50" from q*100
    // crosses a double→int cast whose rounding differs by engine
    val qRows = quants.filter(col("q") === 0.5)
      .select(lit("length/chars_p50").as("metric"),
        col("approx_value").as("value"))
      .unionByName(quants.filter(col("q") === 0.95)
        .select(lit("length/chars_p95").as("metric"),
          col("approx_value").as("value")))
    // base stays cached so the union's three branches share ONE scan
    // when the caller's action runs; release with unpersistCaches()
    // (or spark.catalog.clearCache()) after consuming the card
    liveCaches.add(base)
    globalRows.unionByName(langRows).unionByName(qRows)
  }

  private val liveCaches = new CacheRegistry

  /** Release the prepared-corpus caches of every card built since the
    * last call (the [[Retrieval.releaseCaches]] contract, through the
    * same shared [[CacheRegistry]] mechanism). */
  def unpersistCaches(): Unit = liveCaches.releaseAll()
}
