package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sketch.Sketches.hash60

/** Geospatial primitives on a fixed integer lat/lon grid.
  *
  * Coordinates live in 1e-4-degree integer units (latu ∈ [0, 120000) ≡
  * [−6°, +6°), lonu ∈ [0, 360000) ≡ [−18°, +18°)) so that grid-cell
  * assignment is INTEGER division — bit-identical on any engine, no
  * floating-point floor at a cell boundary to disagree about. Degrees
  * are derived from the units (u/1e4 − offset) only where trigonometry
  * needs them. The synthetic world is a dense ~1330×4000 km region
  * rather than the whole globe so that test-scale corpora produce
  * non-trivial neighbor sets; nothing in the operators assumes the
  * bounds except the one-ring prune proof below.
  *
  * Scale shape: every spatial operator here is a CELL-BUCKETED join —
  * points are hashed once into (cell_y, cell_x) buckets (one keyed
  * shuffle, same cost class as the LSH band joins), and queries probe
  * a bounded neighborhood of cells instead of the whole corpus. With
  * 1° cells and the latitude band clamped to |lat| ≤ 6°, one ring of
  * neighbor cells is a PROOF-carrying prune for radius ≤ 50 km:
  * Δlat ≤ 50/111.19 = 0.450° < 1°, and Δlon ≤ 50/(111.19·cos 6°) =
  * 0.453° < 1° — so every true neighbor lies inside the 3×3 ring (the
  * latitude clamp is what bounds the longitude cell width from below;
  * GeoSpec property-tests completeness against an unpruned join).
  * Neighbor cell ids wrap modulo the longitude cell count — with a
  * real [−180°, 180°) world that is the dateline seam; here the wrap
  * only adds far-away candidates that the distance filter rejects.
  *
  * At 100 TB: points shuffle once by cell; a bounded probe set reads
  * only its 3×3 ring via a broadcast join, and cell-local statistics
  * are one partial-aggregable groupBy. Nothing is all-pairs; density
  * per cell is the skew knob (AQE skew-split handles a hot city cell).
  */
object Geo {
  /** Integer coordinate units per degree. */
  val UnitsPerDeg = 10000L
  /** Latitude span in units: 12° ≡ [−6°, +6°). */
  val LatUnits = 120000L
  /** Longitude span in units: 36° ≡ [−18°, +18°). */
  val LonUnits = 360000L
  /** Cell edge in units (1°); see the one-ring proof in the object doc. */
  val CellUnits: Long = UnitsPerDeg
  /** Number of longitude cells — the modulus for neighbor-cell wrap. */
  val LonCells: Long = LonUnits / CellUnits
  /** Largest radius (km) for which the 3×3 ring is provably complete. */
  val MaxRadiusKm = 50.0
  /** Mean-earth radius (IUGG R1) in km. */
  val EarthKm = 6371.0088

  /** Deterministic synthetic coordinates for a salted id: the same
    * salted-md5 → integer-unit arithmetic is replayable in ANSI SQL,
    * so an oracle can rebuild the exact same points. Latitude is in
    * the [−6°, +6°) band BY CONSTRUCTION — the precondition of the
    * one-ring prune proof. Distinct salts keep entity families (e.g.
    * customers vs probe sites) from landing on identical coordinates
    * when their numeric ids collide. */
  def syntheticPoint(id: Column, salt: String): (Column, Column) = {
    val latu = pmod(hash60(concat(lit(s"lat:$salt:"), id.cast("string"))), lit(LatUnits))
    val lonu = pmod(hash60(concat(lit(s"lon:$salt:"), id.cast("string"))), lit(LonUnits))
    (latu, lonu)
  }

  /** Degrees from integer units. */
  def latDeg(latu: Column): Column = latu.cast("double") / 10000.0 - 6.0
  def lonDeg(lonu: Column): Column = lonu.cast("double") / 10000.0 - 18.0

  /** Haversine great-circle distance in km between two (lat, lon)
    * degree pairs. Wrap-safe (sin(Δλ/2) is 2π-periodic). Callers must
    * round before comparing against a threshold so a 1-ulp libm
    * divergence between engines cannot flip membership (the A-ES
    * key-rounding precedent). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dphi = radians(lat2 - lat1) / 2.0
    val dlam = radians(lon2 - lon1) / 2.0
    val a = sin(dphi) * sin(dphi) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dlam) * sin(dlam)
    lit(2.0 * EarthKm) * asin(sqrt(a))
  }

  /** Points table for an id column of `df`: (id, latu, lonu, lat, lon,
    * cell_y, cell_x). One narrow projection — no shuffle. */
  def points(df: DataFrame, idCol: String, salt: String): DataFrame = {
    val (latu, lonu) = syntheticPoint(col(idCol), salt)
    df.select(col(idCol).as("id"), latu.as("latu"), lonu.as("lonu"))
      .withColumn("lat", latDeg(col("latu")))
      .withColumn("lon", lonDeg(col("lonu")))
      .withColumn("cell_y", expr(s"latu div $CellUnits"))
      .withColumn("cell_x", expr(s"lonu div $CellUnits"))
  }

  /** The 3×3 neighbor-ring expansion of a probe set: each probe row is
    * replicated 9× with (cell_y+dy, (cell_x+dx) mod LonCells). The
    * expansion is map-side (explode of a literal array); the probe
    * side is the SMALL side by contract and is broadcast by the
    * caller's join. */
  def withNeighborCells(probes: DataFrame): DataFrame =
    probes
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("ncell_y", col("cell_y") + col("dy"))
      .withColumn("ncell_x", pmod(col("cell_x") + col("dx"), lit(LonCells)))
      .drop("dy", "dx")

  /** Cell-pruned candidates of a bounded probe set: every point in
    * each probe's 3×3 neighbor ring, with the rounded distance
    * attached. The radius filter on top of this is exact for
    * radius ≤ [[MaxRadiusKm]] (one-ring proof). */
  def ringCandidates(pts: DataFrame, probes: DataFrame): DataFrame = {
    val ring = withNeighborCells(
      probes.select(col("id").as("probe_id"), col("lat").as("plat"),
        col("lon").as("plon"), col("cell_y"), col("cell_x")))
      .select("probe_id", "plat", "plon", "ncell_y", "ncell_x")
    pts.join(broadcast(ring),
        col("cell_y") === col("ncell_y") && col("cell_x") === col("ncell_x"))
      .withColumn("dist_km",
        round(haversineKm(col("plat"), col("plon"), col("lat"), col("lon")), 4))
  }

  /** Radius join: all `pts` rows within `radiusKm` of each probe
    * (bounded probe set — broadcast). Cell-pruned; `radiusKm` must be
    * ≤ [[MaxRadiusKm]] so the prune is lossless. Distances are rounded
    * to 4 dp BEFORE the threshold compare for cross-engine
    * determinism. */
  def radiusJoin(pts: DataFrame, probes: DataFrame, radiusKm: Double): DataFrame = {
    require(radiusKm <= MaxRadiusKm,
      s"one-ring prune proven only for r <= $MaxRadiusKm km, got $radiusKm")
    ringCandidates(pts, probes)
      .where(col("dist_km") <= radiusKm)
      .select("probe_id", "id", "dist_km")
  }
}
