package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * JSONL (one JSON object per line) ingestion/export — the de-facto
 * interchange format of LLM corpora, beside the reference's CSV path
 * (SURVEY.md §2.1; same S1/S4 semantics re-expressed for JSON lines).
 *
 * Spark-first: the native distributed JSON reader parallelizes by
 * input split exactly like the CSV one; malformed-line removal is the
 * reader's DROPMALFORMED mode rather than a hand-rolled repair pass
 * (JSON has no quote-arity ambiguity — a line either parses against
 * the schema or it doesn't).
 *
 * At 100 TB ALWAYS pass an explicit schema: schema inference is a
 * whole extra pass over the data (and samples under
 * `samplingRatio` < 1, which can miss rare fields). `read` accepts
 * `None` for exploratory use only.
 */
final case class JsonlSpec(
    path: String,
    schema: Option[StructType] = None,
    dropMalformed: Boolean = true,
    encoding: String = "UTF-8")

object JsonlSource {

  def read(spark: SparkSession, spec: JsonlSpec): DataFrame = {
    val r = spark.read
      .option("encoding", spec.encoding)
      .option("mode", if (spec.dropMalformed) "DROPMALFORMED" else "PERMISSIVE")
    spec.schema.fold(r)(r.schema).json(spec.path)
  }

  /** Export as JSONL — shard-parallel, one object per line. Column
    * types survive the round trip for the JSON-representable lattice
    * (strings, integrals, doubles, booleans, arrays, structs);
    * timestamps serialize as ISO strings — re-read them through an
    * explicit schema. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Count of lines the reader dropped (A1 audit face, same contract
    * as CsvSource.malformedCount): raw line count minus parsed rows.
    * Blank lines are ignored by both counts.
    *
    * The parsed side counts through `.rdd` deliberately: a bare
    * `.count()` is a count-only plan, and under column pruning Spark's
    * JSON parser validates only line syntax — a well-formed line whose
    * values violate the schema (type mismatch) would survive the count
    * but be dropped by any real projected read. Materializing rows
    * forces full-schema parsing, so this count matches what a consumer
    * of `read` actually sees. */
  def malformedCount(spark: SparkSession, spec: JsonlSpec): Long = {
    val raw = spark.read.option("encoding", spec.encoding).text(spec.path)
      .filter(org.apache.spark.sql.functions.trim(
        org.apache.spark.sql.functions.col("value")) =!= "")
      .count()
    math.max(0L, raw - read(spark, spec).rdd.count())
  }
}
