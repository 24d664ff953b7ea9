package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Geospatial distance join — "every right point within `radiusKm` of
 * each left point", the store-to-customer / sensor-to-site matching a
 * location-bearing corpus needs (and the geo sibling of the geocoding
 * prep in `WorkingTable`; reference semantics ends at address cleanup,
 * this is the beyond-parity spatial face).
 *
 * Scale shape — grid-cell blocking, never all-pairs: both sides land
 * on a latitude-degree grid sized so one cell ≥ the radius
 * (`cellDeg = radiusKm / 111.045` km-per-degree meridian). A left row
 * occupies exactly ONE cell; a right row replicates to its lat-cell
 * ±1 and, in longitude, to the ADAPTIVE span ±⌈dLon/cell⌉ where
 * `dLon = radiusKm / (111.045·cos |lat|)` — longitude degrees shrink
 * with latitude, so a fixed ±1 would silently drop matches past ~60°;
 * the per-row span keeps the blocking LOSSLESS at any supported
 * latitude (polar rows |lat| > 85 are rejected: the lon span
 * degenerates there and a production pipeline treats poles
 * specially). The candidate join is then one equi-join on the cell
 * key — each true pair meets in exactly one cell (the left row's), so
 * no dedup pass — followed by the exact haversine verify.
 *
 * Cross-engine float discipline: the haversine
 * `2R·asin√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2))` evaluates the same
 * IEEE expression tree both engines; JVM-vs-libm trig drift is ≤ a few
 * ulps, far inside the round-6 grid the distance lands on (the
 * DDSketch log-bucket convention), and the ≤-radius gate compares the
 * ROUNDED distance so both engines decide boundaries identically.
 *
 * Output: left id cols + right id cols + `dist_km` (round 6).
 */
object GeoJoin {

  val EarthRadiusKm = 6371.0088
  val KmPerLatDeg = 111.045
  val MaxAbsLat = 85.0

  /** Haversine great-circle distance in km, rounded to 6 decimals
    * (≈ mm precision — far above trig ulp noise). */
  def haversineKm(lat1: Column, lon1: Column,
                  lat2: Column, lon2: Column): Column = {
    val p1 = radians(lat1)
    val p2 = radians(lat2)
    val dp = radians(lat2 - lat1) / 2.0
    val dl = radians(lon2 - lon1) / 2.0
    val a = sin(dp) * sin(dp) + cos(p1) * cos(p2) * sin(dl) * sin(dl)
    round(lit(2.0 * EarthRadiusKm) * asin(sqrt(a)), 6)
  }

  /**
   * All (left, right) pairs within `radiusKm`, grid-blocked as
   * described above. `leftCols`/`rightCols` select the id/payload
   * columns to carry (they must not collide).
   */
  def withinDistance(left: DataFrame, latL: String, lonL: String,
                     leftCols: Seq[String],
                     right: DataFrame, latR: String, lonR: String,
                     rightCols: Seq[String],
                     radiusKm: Double): DataFrame = {
    require(radiusKm > 0, s"radiusKm must be positive: $radiusKm")
    require((leftCols ++ rightCols).distinct.size ==
      leftCols.size + rightCols.size,
      s"left/right carried columns collide: $leftCols vs $rightCols")
    val cellDeg = radiusKm / KmPerLatDeg
    // the polar guard wraps the KEPT lat column (a side-channel bool
    // would be pruned by Catalyst and never evaluated)
    def checkedLat(lat: Column): Column =
      when(abs(lat) > MaxAbsLat,
        raise_error(concat(lit(s"|lat| > $MaxAbsLat unsupported: "),
          lat.cast("string")))).otherwise(lat)
    val l = left.filter(col(latL).isNotNull && col(lonL).isNotNull)
      .select(leftCols.map(col) :+
        checkedLat(col(latL)).as("__llat") :+ col(lonL).as("__llon"): _*)
      .select(leftCols.map(col) :+ col("__llat") :+ col("__llon") :+
        floor(col("__llat") / cellDeg).as("__clat") :+
        floor(col("__llon") / cellDeg).as("__clon"): _*)
    // adaptive longitude span ⌈(r / (111.045·cos φ*)) / cellDeg⌉ + 1:
    // φ* = |lat| + cellDeg (the matching left row can sit a full cell
    // closer to the pole, where lon degrees are narrower) and the +1
    // safety cell absorbs the sub-percent small-angle slack between
    // this planar estimate and the true haversine lon reach — the span
    // is provably ≥ the exact requirement at any |lat| ≤ 85
    val dLonCells = (ceil(
      (lit(radiusKm) / (lit(KmPerLatDeg) *
        cos(radians(least(abs(col("__rlat")) + cellDeg, lit(MaxAbsLat))))))
        / cellDeg).cast("long") + 1L)
    val r = right.filter(col(latR).isNotNull && col(lonR).isNotNull)
      .select(rightCols.map(col) :+
        checkedLat(col(latR)).as("__rlat") :+ col(lonR).as("__rlon"): _*)
      .select(rightCols.map(col) :+
        col("__rlat") :+ col("__rlon") :+
        explode(sequence(floor(col("__rlat") / cellDeg) - 1,
          floor(col("__rlat") / cellDeg) + 1)).as("__clat") :+
        dLonCells.as("__dlc"): _*)
      .select(rightCols.map(col) :+ col("__rlat") :+ col("__rlon") :+
        col("__clat") :+
        explode(sequence(floor(col("__rlon") / cellDeg) - col("__dlc"),
          floor(col("__rlon") / cellDeg) + col("__dlc"))).as("__clon"): _*)
    val dist = haversineKm(col("__llat"), col("__llon"),
      col("__rlat"), col("__rlon"))
    l.join(r, Seq("__clat", "__clon"))
      .withColumn("dist_km", dist)
      .filter(col("dist_km") <= radiusKm)
      .select((leftCols ++ rightCols).map(col) :+ col("dist_km"): _*)
  }
}
