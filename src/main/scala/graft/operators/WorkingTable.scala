package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.types.{SqlTypes, Template}

/**
 * The reference's working-table DSL (SURVEY.md §2.2, P1-P6), rebuilt as
 * a lazy DataFrame transformer.
 *
 * Reference: lib/voter_file/csv_driver/working_table.rb. A "working
 * table" there is a Postgres TEMPORARY table materialized per stage; here
 * a stage is just a new (lazy) DataFrame — Catalyst fuses the projection,
 * filters, and group-by into the scan, pushes predicates/pruning down to
 * parquet/CSV, and nothing materializes until an action. At 100 TB that
 * means: only mapped columns are read (ReadSchema pruning), constraints
 * reach the scan (PushedFilters), and the optional group-by is the only
 * shuffle in the load.
 *
 * DSL surface replicated:
 *  - `map_column name, from:, as:, type:` — typed projection; the `as:`
 *    template defaults to `$S::TYPE` (working_table.rb:138-152); ONLY
 *    mapped columns land in the output (working_table.rb:34-46);
 *  - `add_column name, type:` (working_table.rb:129-136);
 *  - `constrain_column col, "$S IS NOT NULL"` — conjunctive row filters
 *    (working_table.rb:170-176);
 *  - `group_records_by "expr, expr"` (working_table.rb:42-44,162-164);
 *    Postgres would reject non-grouped non-aggregated columns, so our
 *    DSL keeps `first(col)` for every non-key mapped column —
 *    deterministic via min-by ordering on the group keys' natural sort;
 *  - `default_data_type` (TEXT default, working_table.rb:15, README.md:97).
 */
final case class ColumnMapping(
    name: String,
    from: Option[String] = None,
    template: Option[String] = None,
    sqlType: Option[String] = None)

final case class ColumnConstraint(column: String, template: String)

class WorkingTableSpec(val defaultDataType: String = "TEXT") {
  private[graft] var mappings = Vector.empty[ColumnMapping]
  private[graft] var added = Vector.empty[(String, String)] // name -> type
  private[graft] var constraints = Vector.empty[ColumnConstraint]
  private[graft] var groupBy: Option[Seq[String]] = None
  private[graft] var primaryKey: Option[(String, String)] = None // name -> type

  /** `map_column name, from: src, as: "$S...", type: "INT"` */
  def mapColumn(name: String, from: String = null, as: String = null,
                sqlType: String = null): this.type = {
    mappings :+= ColumnMapping(name, Option(from), Option(as), Option(sqlType))
    this
  }

  /** `add_column name, type:` — declared but unmapped; NULL at load. */
  def addColumn(name: String, sqlType: String = null): this.type = {
    added :+= (name -> Option(sqlType).getOrElse(defaultDataType))
    this
  }

  /** `constrain_column col, "$S IS NOT NULL"` */
  def constrainColumn(column: String, template: String): this.type = {
    constraints :+= ColumnConstraint(column, template)
    this
  }

  /** `group_records_by "col1, col2"` — expressions over OUTPUT names. */
  def groupRecordsBy(exprs: String*): this.type = {
    groupBy = Some(exprs.toSeq)
    this
  }

  /** `set_primary_key name, type` (database_table handles / matcher). */
  def setPrimaryKey(name: String, sqlType: String = "INT"): this.type = {
    primaryKey = Some(name -> sqlType)
    this
  }

  def dataTypeOf(m: ColumnMapping): DataType =
    SqlTypes.toDataType(m.sqlType.getOrElse(defaultDataType))
}

object WorkingTable {

  /**
   * Conform `raw` to the spec: constraints (on the SOURCE columns, like
   * the reference's load WHERE), then typed projection of mapped columns
   * (+ declared-but-unmapped columns as typed NULLs), then optional
   * group-by collapse.
   */
  def conform(raw: DataFrame, spec: WorkingTableSpec): DataFrame = {
    // 1. row constraints — reference inlines them in the INSERT..SELECT
    //    WHERE (working_table.rb:39-41); Catalyst pushes them to the scan.
    val filtered = spec.constraints.foldLeft(raw) { (df, c) =>
      df.filter(Template.toColumn(c.template, Some(c.column)))
    }

    // 2. typed projection: default converter is the plain cast
    //    `$S::TYPE` (working_table.rb:142).
    val cols: Seq[Column] = spec.mappings.map { m =>
      val src = m.from.getOrElse(m.name)
      val dt = spec.dataTypeOf(m)
      val base = m.template match {
        case Some(t) => Template.toColumn(t, Some(src))
        case None    => col(src)
      }
      base.cast(dt).as(m.name)
    } ++ spec.added.map { case (n, t) =>
      lit(null).cast(SqlTypes.toDataType(t)).as(n)
    }
    val projected = filtered.select(cols: _*)

    // 3. optional in-load collapse (P4). Keys are expressions over the
    //    conformed output; every non-key column keeps an arbitrary-but-
    //    deterministic representative via `min` ordering (the reference
    //    relies on Postgres GROUP BY; dedup of exact duplicate rows is
    //    its documented use — README.md:113).
    spec.groupBy match {
      case None => projected
      case Some(keys) =>
        val keyCols = keys.map(expr)
        val keyNames = keys.map(_.trim)
        val valueCols = projected.columns.filterNot(c => keyNames.contains(c))
        if (valueCols.isEmpty) projected.dropDuplicates()
        else {
          val aggs = valueCols.map(c => min(col(c)).as(c))
          projected
            .groupBy(keyCols: _*)
            .agg(aggs.head, aggs.tail: _*)
            .toDF(keyNames ++ valueCols: _*)
        }
    }
  }

  /**
   * Correlated cross-table column update (P5): the reference's
   * `UPDATE t SET tcol = <expr($S,$T)> FROM s WHERE t.k1 = s.k1 [AND ...]`
   * (working_table.rb:48-70, database_table.rb:16-28,
   * csv_driver.rb:181-190; multi-key spec
   * csv_driver_working_table_spec.rb:157-172).
   *
   * Immutable rebuild: left-join target to source on the key columns and
   * conditionally replace the column — unmatched rows keep their old
   * value. If several source rows match one target key, the smallest
   * source value wins (deterministic; Postgres UPDATE..FROM is
   * documented-arbitrary here — divergence noted in SURVEY §7.4).
   *
   * Scale note: `source` is projected to keys+value before the join, so
   * Catalyst can broadcast it when small; otherwise it's a shuffled hash
   * join on the key — no wider than the reference's UPDATE..FROM.
   */
  def mapColumnFromTable(
      target: DataFrame,
      source: DataFrame,
      targetColumn: String,
      sourceColumn: String,
      keys: Seq[(String, String)], // (targetKey, sourceKey)
      template: String = "$S"): DataFrame = {
    val srcProj = source
      .select((keys.map(_._2) :+ sourceColumn).distinct.map(col): _*)
      .groupBy(keys.map(k => col(k._2)): _*)
      .agg(min(col(sourceColumn)).as("__src_value"))
    val joined = target.as("t").join(
      srcProj.as("s"),
      keys.map { case (tk, sk) => col(s"t.$tk") === col(s"s.$sk") }
        .reduce(_ && _),
      "left")
    val newVal = Template.toColumn(template,
      Some("s.__src_value"), Some(s"t.$targetColumn"))
    val replaced = when(col("s.__src_value").isNotNull, newVal)
      .otherwise(col(s"t.$targetColumn"))
    val outCols = target.columns.map {
      case c if c == targetColumn => replaced.as(c)
      case c                      => col(s"t.$c")
    }
    joined.select(outCols.toIndexedSeq: _*)
  }

  /** SRID the reference pins for PostGIS points (working_table.rb:7). */
  val Srid = 4326

  /**
   * Geocoding prep (P6, working_table.rb:72-107 + csv_driver.rb:147-152):
   *  - ensure `residential_lat`/`residential_lng` DECIMAL columns exist;
   *  - `needs_geocoding` = address non-blank AND (lat NULL OR lat = 0.0);
   *  - `residential_point`: no PostGIS, so a (lng, lat) struct + WKT text
   *    `POINT(lng lat)` where both coords are present (SURVEY §1.2).
   */
  def prepareForGeocoding(df: DataFrame, addressColumn: String,
                          latColumn: String = "residential_lat",
                          lngColumn: String = "residential_lng"): DataFrame = {
    val withCoords = Seq(latColumn, lngColumn).foldLeft(df) { (d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(DecimalType(18, 8)))
    }
    val addr = col(addressColumn).cast("string")
    val lat = col(latColumn)
    val lng = col(lngColumn)
    withCoords
      .withColumn("needs_geocoding",
        addr.isNotNull && trim(addr) =!= "" &&
          (lat.isNull || lat === 0.0))
      .withColumn("residential_point",
        when(lat.isNotNull && lng.isNotNull,
          struct(lng.cast("double").as("lng"), lat.cast("double").as("lat"))))
      .withColumn("residential_point_wkt",
        when(lat.isNotNull && lng.isNotNull,
          concat(lit("POINT("), lng.cast("double").cast("string"), lit(" "),
            lat.cast("double").cast("string"), lit(")"))))
  }
}
