package graft.types

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._

/**
 * SQL-name → Spark `DataType` table plus the `$S`/`$T` expression
 * template micro-language.
 *
 * The reference declares column types as opaque SQL type names spliced
 * into DDL (default TEXT — lib/voter_file/csv_driver/working_table.rb:15),
 * and its only expression IR is user SQL fragments where `$S` is the
 * source column and `$T` the target column
 * (working_table.rb:138-152, record_merger.rb:126-132).
 *
 * We keep that exact surface: type names map through this table; templates
 * substitute `$S`/`$T` with (qualified) column references and ride
 * Catalyst's SQL parser via `expr(...)` — no custom parser needed.
 */
object SqlTypes {

  /** Map a reference-style SQL type name to a Spark DataType. */
  def toDataType(sqlType: String): DataType =
    sqlType.trim.toUpperCase match {
      case "TEXT" | "VARCHAR" | "CHAR" | "STRING" | "UUID" => StringType
      case "INT" | "INTEGER" | "INT4"                      => IntegerType
      case "BIGINT" | "INT8" | "SERIAL" | "BIGSERIAL"      => LongType
      case "SMALLINT" | "INT2"                             => ShortType
      case "BOOLEAN" | "BOOL"                              => BooleanType
      case "DECIMAL" | "NUMERIC"                           => DecimalType(38, 10)
      case "REAL" | "FLOAT4"                               => FloatType
      case "DOUBLE" | "DOUBLE PRECISION" | "FLOAT8"        => DoubleType
      case "DATE"                                          => DateType
      case "TIMESTAMP" | "DATETIME"                        => TimestampType
      case "BYTEA" | "BINARY" | "BLOB"                     => BinaryType
      case t if t.startsWith("DECIMAL(") || t.startsWith("NUMERIC(") =>
        val args = t.substring(t.indexOf('(') + 1, t.indexOf(')')).split(',')
        DecimalType(args(0).trim.toInt,
          if (args.length > 1) args(1).trim.toInt else 0)
      case t if t.startsWith("GEOMETRY") =>
        // No PostGIS: geometry is carried as a (lng, lat) struct (§1.2).
        StructType(Seq(
          StructField("lng", DoubleType), StructField("lat", DoubleType)))
      case other =>
        throw new IllegalArgumentException(s"Unknown SQL type: $other")
    }
}

/**
 * `$S`/`$T` template substitution (reference §1.3).
 *
 * `$S` → the source reference, `$T` → the target reference. References
 * are spliced as (optionally alias-qualified) backtick-quoted column
 * names, then the whole fragment is parsed by Catalyst via `expr`.
 */
object Template {

  private def quoted(ref: String): String =
    ref.split('.').map(p => s"`$p`").mkString(".")

  /** Substitute `$S`/`$T` and return the raw SQL fragment. */
  def substitute(template: String,
                 source: Option[String],
                 target: Option[String] = None): String = {
    var out = template
    source.foreach(s => out = out.replace("$S", quoted(s)))
    target.foreach(t => out = out.replace("$T", quoted(t)))
    out
  }

  /** Substitute and parse into a Column. */
  def toColumn(template: String,
               source: Option[String],
               target: Option[String] = None): Column =
    expr(substitute(template, source, target))

  /** Does the template mention the target side? (`record_merger.rb:111-116`
    * drops `$T`-referencing constraints for the insert phase.) */
  def referencesTarget(template: String): Boolean = template.contains("$T")

  /** Does the template mention the source side? */
  def referencesSource(template: String): Boolean = template.contains("$S")
}
