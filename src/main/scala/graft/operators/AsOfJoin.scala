package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for each left row, attach the most recent right row of
 * the same key with right.ts <= left.ts (backward direction, the ASOF
 * JOIN of DuckDB/QuestDB/kdb and pandas merge_asof).
 *
 * Spark-first construction — UNION + ONE WINDOW, not a join:
 * tag both inputs, union them, and per key ordered by (ts, side) carry
 * the last right-row payload forward with `last(_, ignoreNulls)` over
 * an unbounded-preceding running frame; left rows then read their
 * as-of match from the carried column. One shuffle on the key, no
 * join at all — a range-predicate join (`r.ts <= l.ts` + window dedup)
 * would either cartesian-explode per key or shuffle twice; this is the
 * standard log-structured formulation and AQE-friendly (running
 * window, map-side safe). Ties (right.ts == left.ts): the right row
 * sorts BEFORE the left row of equal ts (side 0 < side 1), so an
 * equal-timestamp right row IS visible to the left row, matching
 * DuckDB ASOF (>= semantics); among equal-ts right rows the LAST in
 * (ts, tiebreak, hash(payload)) order wins. The payload hash is always
 * the final ordering key, so duplicate (key, ts) right rows — with or
 * without a caller tiebreak — resolve to the SAME payload on every run
 * and partition layout (rows whose hashes collide carry equal payloads
 * up to 64-bit xxhash collision, so the attached value is identical
 * either way).
 *
 * Scale: cost is sort-within-partition of |L|+|R| on (key, ts) — the
 * minimum any as-of formulation must pay — and skewed keys are
 * handled by AQE the same as any window; no broadcast needed on
 * either side.
 */
object AsOfJoin {

  /**
   * @param left       probe side
   * @param right      reference side (its `payload` columns are attached)
   * @param keyCols    equi-key columns (same names both sides)
   * @param leftTs     left ordering column name
   * @param rightTs    right ordering column name
   * @param payload    right columns to attach (must not collide with left names)
   * @param tiebreak   right column ordering equal-ts right rows (last wins)
   */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String],
               tiebreak: Option[String] = None): DataFrame =
    asof(left, right, keyCols, leftTs, rightTs, payload, tiebreak,
      forwardDir = false)

  /** Forward as-of: attach the EARLIEST right row with
    * right.ts >= left.ts (DuckDB `ASOF ... ON l.ts <= r.ts`) — the
    * "next event after" direction. Same union+window construction
    * traversed in descending time; equal-ts rights are visible
    * (>= semantics) and resolve to the same deterministic winner as
    * [[backward]]. */
  def forward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
              leftTs: String, rightTs: String, payload: Seq[String],
              tiebreak: Option[String] = None): DataFrame =
    asof(left, right, keyCols, leftTs, rightTs, payload, tiebreak,
      forwardDir = true)

  private def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTs: String, rightTs: String, payload: Seq[String],
                   tiebreak: Option[String], forwardDir: Boolean)
      : DataFrame = {
    require(payload.nonEmpty, "payload columns required")
    val leftCols = left.columns.toSeq
    require(payload.forall(!leftCols.contains(_)),
      s"payload ${payload.mkString(",")} collides with left columns")

    // common ordering axis; 0 = right rows first on ties
    val ts = "__asof_ts"
    val side = "__asof_side"
    val tb = "__asof_tb"
    val tbh = "__asof_tbh" // deterministic payload-derived disambiguator
    val l = left
      .withColumn(ts, col(leftTs))
      .withColumn(side, lit(1))
      .withColumn(tb, lit(null).cast("long"))
      .withColumn(tbh, lit(null).cast("long"))
      .withColumn("__asof_payload",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          payload.map(p => org.apache.spark.sql.types.StructField(
            p, right.schema(p).dataType, nullable = true)))))
    // ASOF null semantics (matching the SQL form `l.key = r.key AND
    // l.ts >= r.ts`): a null-ts or null-key right row can never
    // satisfy the predicate, so drop it — otherwise Spark's NULLS
    // FIRST ordering would attach a null-ts payload to every left row,
    // and Window.partitionBy (which groups null keys, unlike join
    // equality) would match null-key rows to each other. Null-ts LEFT
    // rows need no special case: they sort before every right row of
    // their key and correctly see no carried payload.
    val r = right
      .filter(col(rightTs).isNotNull &&
        keyCols.map(col(_).isNotNull).reduce(_ && _))
      .withColumn(ts, col(rightTs))
      .withColumn(side, lit(0))
      .withColumn(tb, tiebreak.map(col(_).cast("long")).getOrElse(lit(0L)))
      .withColumn(tbh, xxhash64(payload.map(col): _*))
      .withColumn("__asof_payload", struct(payload.map(col): _*))
    val rAligned = l.limit(0).unionByName(
      r.select((keyCols ++ Seq(ts, side, tb, tbh, "__asof_payload")).map(col): _*),
      allowMissingColumns = true)

    // forward = the same traversal in descending time. desc_nulls_first
    // keeps null-ts LEFT rows ahead of every right row (Spark desc
    // defaults NULLS LAST, which would hand them the latest payload);
    // within an equal-ts group the (tb, tbh) asc order is unchanged, so
    // both directions crown the same winner among duplicate rights.
    val tsOrd = if (forwardDir) col(ts).desc_nulls_first else col(ts).asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrd, col(side).asc, col(tb).asc_nulls_first,
        col(tbh).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(rAligned)
      .withColumn("__asof_match",
        last(col("__asof_payload"), ignoreNulls = true).over(w))
    carried.filter(col(side) === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__asof_match.$p").as(p)): _*)
  }
}
