package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The reference's per-session SQL "extensions" plus the trigram
 * similarity the fuzzy matcher needs, re-expressed as Spark Column
 * expressions (codegen'd built-ins wherever possible).
 *
 * Reference: lib/voter_file/csv_driver.rb:7-50 declares three opt-in
 * scalar UDFs installed per session; lib/voter_file/csv_driver.rb:170-175
 * + spec/csv_driver_spec.rb:157-167 is the load API.
 *
 * Everything is exposed twice:
 *  - as a Scala `Column` function (preferred; pure built-ins, codegen'd)
 *  - registered under its reference name via [[Functions.register]] so the
 *    `$S`/`$T` expression templates (Spark SQL fragments parsed with
 *    `expr(...)`) can call them by name.
 */
object Functions {

  /**
   * `nb_parse_election_name(date_text, type_text)` →
   * "<year>_<long name>"; code map pr→primary, ge→general,
   * pp→presidential_primary, sp→special, anything else verbatim.
   * Reference: lib/voter_file/csv_driver.rb:8-27.
   */
  def parseElectionName(dateCol: Column, typeCol: Column): Column = {
    val yr = year(to_date(dateCol)).cast("string")
    val name = lower(trim(typeCol))
    val mapped =
      when(name === "pr", lit("primary"))
        .when(name === "ge", lit("general"))
        .when(name === "pp", lit("presidential_primary"))
        .when(name === "sp", lit("special"))
        .otherwise(name)
    concat_ws("_", yr, mapped)
  }

  /**
   * `nb_coerce_to_date_or_null(text)` — cast to DATE, NULL on failure.
   * Reference: lib/voter_file/csv_driver.rb:28-38 (EXCEPTION → NULL).
   * Spark's `to_date` already yields NULL on unparsable input (non-ANSI),
   * matching the reference's safe-cast semantics.
   */
  def coerceToDateOrNull(c: Column): Column = to_date(c)

  /**
   * `nb_is_email_address_valid(text)` — TRUE if NULL/empty, else
   * `length BETWEEN 3 AND 100 AND LIKE '%@%' AND
   *  ~ '^\S*\.[a-zA-Z][a-zA-Z\.]*[a-zA-Z]$'`.
   * The odd regex (anchors the whole string, not just the domain) is
   * replicated exactly. Reference: lib/voter_file/csv_driver.rb:39-49.
   */
  def isEmailAddressValid(c: Column): Column = {
    val t = c.cast("string")
    when(t.isNull || t === "", lit(true))
      .otherwise(
        length(t).between(3, 100) &&
          t.like("%@%") &&
          t.rlike("^\\S*\\.[a-zA-Z][a-zA-Z\\.]*[a-zA-Z]$"))
  }

  /** pg_trgm `similarity(a, b)` — native codegen'd Catalyst expression
    * (org.apache.spark.sql.graftshim.TrigramSimilarityExpr). */
  def trigramSimilarity(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.TrigramColumns.trigramSimilarity(a, b)

  /** pg_trgm `<->` distance = 1 - similarity. */
  def trigramDistance(a: Column, b: Column): Column =
    lit(1.0) - trigramSimilarity(a, b)

  /** Names installable one at a time via [[loadExtension]] — the
    * reference's per-name opt-in list (csv_driver.rb:69-74,170-175). */
  val ExtensionNames: Seq[String] = Seq(
    "nb_parse_election_name", "nb_coerce_to_date_or_null",
    "nb_is_email_address_valid", "trigram_similarity", "trigram_distance")

  /**
   * Per-name opt-in installation mirroring the reference's
   * `load_extension(name)` (csv_driver.rb:170-175, spec
   * csv_driver_spec.rb:157-167). Unknown names fail loudly like the
   * reference's missing-file require would.
   */
  def loadExtension(spark: SparkSession, name: String): Unit = name match {
    case "nb_parse_election_name"     => registerParseElection(spark)
    case "nb_coerce_to_date_or_null"  => registerCoerceDate(spark)
    case "nb_is_email_address_valid"  => registerEmailValid(spark)
    case "trigram_similarity"         => registerTrigramSimilarity(spark)
    case "trigram_distance"           => registerTrigramDistance(spark)
    case other =>
      throw new IllegalArgumentException(
        s"unknown SQL extension '$other' (known: ${ExtensionNames.mkString(", ")})")
  }

  /**
   * Register all extensions under their reference names for use inside
   * `expr(...)` templates. Mirrors `driver.add_sql_function` /
   * `load_sql_extensions` (csv_driver.rb:69-74) — registration is
   * idempotent and cheap, so the Gateway installs all up front;
   * [[loadExtension]] is the per-name surface.
   */
  def register(spark: SparkSession): Unit =
    ExtensionNames.foreach(loadExtension(spark, _))

  private def registerParseElection(spark: SparkSession): Unit =
    spark.udf.register("nb_parse_election_name",
      (d: String, t: String) => {
        if (d == null || t == null) null
        else {
          val yr =
            try java.time.LocalDate.parse(d.trim.take(10)).getYear.toString
            catch { case _: Exception =>
              val m = "^(\\d{4})".r.findFirstIn(d.trim)
              m.orNull
            }
          if (yr == null) null
          else {
            val name = t.trim.toLowerCase match {
              case "pr" => "primary"
              case "ge" => "general"
              case "pp" => "presidential_primary"
              case "sp" => "special"
              case other => other
            }
            s"${yr}_$name"
          }
        }
      })

  private def registerCoerceDate(spark: SparkSession): Unit =
    spark.udf.register("nb_coerce_to_date_or_null",
      (s: String) =>
        if (s == null) null
        else
          try java.sql.Date.valueOf(java.time.LocalDate.parse(s.trim.take(10)))
          catch { case _: Exception => null })

  private def registerEmailValid(spark: SparkSession): Unit =
    spark.udf.register("nb_is_email_address_valid",
      (s: String) =>
        if (s == null || s.isEmpty) true
        else
          s.length >= 3 && s.length <= 100 && s.contains("@") &&
            s.matches("^\\S*\\.[a-zA-Z][a-zA-Z\\.]*[a-zA-Z]$"))

  // native expressions (whole-stage codegen) rather than UDFs
  private def registerTrigramSimilarity(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "trigram_similarity",
      exprs => org.apache.spark.sql.graftshim.TrigramSimilarityExpr(
        exprs(0), exprs(1)), "scala_udf")

  private def registerTrigramDistance(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "trigram_distance",
      exprs => org.apache.spark.sql.catalyst.expressions.Subtract(
        org.apache.spark.sql.catalyst.expressions.Literal(1.0),
        org.apache.spark.sql.graftshim.TrigramSimilarityExpr(
          exprs(0), exprs(1))), "scala_udf")
}
