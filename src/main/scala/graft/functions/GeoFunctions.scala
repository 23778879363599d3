package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, LessThanOrEqual}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.DoubleType

/**
 * Column-level geo API + SQL registration, mirroring the PostGIS surface the
 * reference reaches through its SQL fragments (SURVEY.md §2.8). Call
 * [[GeoFunctions.registerAll]] once per session (GeoDb does it in its
 * constructor); both the Column API and raw-SQL passthrough
 * (`geodb_get_pg` semantics) then resolve through the session function
 * registry to the Catalyst expressions in GeoExpressions.scala.
 */
object GeoFunctions {

  def st_point(x: Column, y: Column): Column = call_function("st_point", x, y)
  def st_geomfromtext(wkt: Column): Column = call_function("st_geomfromtext", wkt)
  def st_geomfromgeojson(json: Column): Column = call_function("st_geomfromgeojson", json)
  def st_asgeojson(g: Column): Column = call_function("st_asgeojson", g)
  def st_makeenvelope(minX: Column, minY: Column, maxX: Column, maxY: Column): Column =
    call_function("st_makeenvelope", minX, minY, maxX, maxY)
  def st_makeline(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    call_function("st_makeline", x1, y1, x2, y2)
  def st_astext(g: Column): Column = call_function("st_astext", g)
  def geometry_type(g: Column): Column = call_function("geometrytype", g)
  def st_centroid(g: Column): Column = call_function("st_centroid", g)
  def st_envelope(g: Column): Column = call_function("st_envelope", g)
  def st_x(g: Column): Column = call_function("st_x", g)
  def st_y(g: Column): Column = call_function("st_y", g)
  def st_xmin(g: Column): Column = call_function("st_xmin", g)
  def st_xmax(g: Column): Column = call_function("st_xmax", g)
  def st_ymin(g: Column): Column = call_function("st_ymin", g)
  def st_ymax(g: Column): Column = call_function("st_ymax", g)
  def st_area(g: Column): Column = call_function("st_area", g)
  def st_segments(g: Column): Column = call_function("st_segments", g)
  def st_length_spherical(g: Column): Column = call_function("st_length_spherical", g)
  def st_area_spherical(g: Column): Column = call_function("st_area_spherical", g)
  def st_area_spherical(g: Column, radius: Column): Column =
    call_function("st_area_spherical", g, radius)
  def st_length(g: Column): Column = call_function("st_length", g)
  def st_distance(a: Column, b: Column): Column = call_function("st_distance", a, b)
  def st_distance_spherical(a: Column, b: Column): Column =
    call_function("st_distance_spherical", a, b)
  def st_distance_spherical(a: Column, b: Column, radius: Column): Column =
    call_function("st_distance_spherical", a, b, radius)
  /** PostGIS ST_DWithin: sugar for `st_distance(a, b) <= r` — the form
    * [[graft.plans.GridSpatialJoin]] rewrites when `r` is a literal. */
  def st_dwithin(a: Column, b: Column, r: Column): Column =
    call_function("st_dwithin", a, b, r)
  /** Geodesic dwithin (metres): `st_distance_spherical(a, b) <= r`. */
  def st_dwithin_spherical(a: Column, b: Column, r: Column): Column =
    call_function("st_dwithin_spherical", a, b, r)
  /** Planar azimuth a→b, radians clockwise from north in [0, 2π). */
  def st_azimuth(a: Column, b: Column): Column = call_function("st_azimuth", a, b)
  /** Spherical initial bearing a→b, radians clockwise from north. */
  def st_azimuth_spherical(a: Column, b: Column): Column =
    call_function("st_azimuth_spherical", a, b)
  /** Spherical destination point at (metres, azimuth-radians). */
  def st_project_spherical(g: Column, dist: Column, azimuth: Column): Column =
    call_function("st_project_spherical", g, dist, azimuth)
  def st_buffer(g: Column, d: Column): Column = call_function("st_buffer", g, d)
  def st_transform(g: Column, from: Column, to: Column): Column =
    call_function("st_transform", g, from, to)
  def st_envelope_bounds(g: Column): Column = call_function("st_envelope_bounds", g)
  def st_intersection(a: Column, b: Column): Column = call_function("st_intersection", a, b)
  def st_union(a: Column, b: Column): Column = call_function("st_union", a, b)
  def st_difference(a: Column, b: Column): Column = call_function("st_difference", a, b)
  def st_symdifference(a: Column, b: Column): Column = call_function("st_symdifference", a, b)
  def st_convexhull(g: Column): Column = call_function("st_convexhull", g)
  def st_simplify(g: Column, tol: Column): Column = call_function("st_simplify", g, tol)
  /** Base-32 geohash of a lon/lat point at a character precision. */
  def st_geohash(g: Column, precision: Column): Column =
    call_function("st_geohash", g, precision)
  /** Geohash cell bounds [lonMin, latMin, lonMax, latMax]. */
  def st_geohash_decode(gh: Column): Column =
    call_function("st_geohash_decode", gh)
  /** Point at fraction f of a linestring's planar length. */
  def st_line_interpolate_point(g: Column, f: Column): Column =
    call_function("st_line_interpolate_point", g, f)
  /** Length fraction of a linestring at its closest point to pt. */
  def st_line_locate_point(line: Column, pt: Column): Column =
    call_function("st_line_locate_point", line, pt)
  /** Sub-line between two length fractions of a linestring. */
  def st_line_substring(g: Column, f0: Column, f1: Column): Column =
    call_function("st_line_substring", g, f0, f1)
  /** Point on a linestring closest to pt. */
  def st_closest_point(line: Column, pt: Column): Column =
    call_function("st_closest_point", line, pt)
  /** Snap coordinates to a regular origin-0 grid. */
  def st_snaptogrid(g: Column, size: Column): Column =
    call_function("st_snaptogrid", g, size)
  /** Pointy-top hexagonal bin [q, r] at a circumradius. */
  def st_hexbin(x: Column, y: Column, size: Column): Column =
    call_function("st_hexbin", x, y, size)
  def st_isempty(g: Column): Column = call_function("st_isempty", g)
  def st_npoints(g: Column): Column = call_function("st_npoints", g)
  /** Aggregate: dissolve — union of every geometry in the group. */
  def st_union_agg(g: Column): Column = call_function("st_union_agg", g)

  /** The reference's eight comparison modes (geodb.sql:1204-1214). */
  def st_relation(mode: String, a: Column, b: Column): Column = {
    graft.core.GeoOps.modeId(mode) // validate: error for unknown modes (geodb.sql:1213)
    call_function(s"st_${mode.toLowerCase(java.util.Locale.ROOT)}", a, b)
  }
  def st_within(a: Column, b: Column): Column = st_relation("within", a, b)
  def st_contains(a: Column, b: Column): Column = st_relation("contains", a, b)
  def st_intersects(a: Column, b: Column): Column = st_relation("intersects", a, b)
  def st_touches(a: Column, b: Column): Column = st_relation("touches", a, b)
  def st_overlaps(a: Column, b: Column): Column = st_relation("overlaps", a, b)
  def st_crosses(a: Column, b: Column): Column = st_relation("crosses", a, b)
  def st_disjoint(a: Column, b: Column): Column = st_relation("disjoint", a, b)
  def st_equals(a: Column, b: Column): Column = st_relation("equals", a, b)

  /** (name -> builder) pairs, shared by registerAll and GraftExtensions. */
  def builders: Seq[(String, Seq[Expression] => Expression)] = Seq[
      (String, Seq[Expression] => Expression)](
    "st_point" -> { case Seq(x, y) => StPoint(x, y) },
    "st_geomfromtext" -> { case Seq(w) => StGeomFromText(w) },
    "st_geomfromgeojson" -> { case Seq(j) => StGeomFromGeoJson(j) },
    "st_asgeojson" -> { case Seq(g) => StUnary("asGeoJson", g) },
    "st_makeenvelope" -> { case Seq(a, b, c, d) => StMakeEnvelope(a, b, c, d) },
    "st_makeline" -> { case Seq(a, b, c, d) => StMakeLine(a, b, c, d) },
    "st_astext" -> { case Seq(g) => StUnary("asText", g) },
    "geometrytype" -> { case Seq(g) => StUnary("geometryType", g) },
    "st_centroid" -> { case Seq(g) => StUnary("centroid", g) },
    "st_envelope" -> { case Seq(g) => StUnary("envelope", g) },
    "st_envelope_bounds" -> { case Seq(g) => StEnvelopeBounds(g) },
    "st_intersection" -> { case Seq(a, b) => StOverlay("intersectionOf", a, b) },
    "st_union" -> { case Seq(a, b) => StOverlay("unionOf", a, b) },
    "st_difference" -> { case Seq(a, b) => StOverlay("differenceOf", a, b) },
    "st_symdifference" -> { case Seq(a, b) => StOverlay("symDifferenceOf", a, b) },
    "st_convexhull" -> { case Seq(g) => StUnary("convexHull", g) },
    "st_simplify" -> { case Seq(g, t) => StSimplify(g, t) },
    "st_geohash" -> { case Seq(g, p) => StGeohash(g, p) },
    "st_geohash_decode" -> { case Seq(s) => StGeohashDecode(s) },
    "st_line_interpolate_point" -> { case Seq(g, f) => StLineInterpolatePoint(g, f) },
    "st_line_locate_point" -> { case Seq(l, p) => StLineLocatePoint(l, p) },
    "st_line_substring" -> { case Seq(g, a, b) => StLineSubstring(g, a, b) },
    "st_closest_point" -> { case Seq(l, p) => StClosestPoint(l, p) },
    "st_snaptogrid" -> { case Seq(g, sz) => StSnapToGrid(g, sz) },
    "st_hexbin" -> { case Seq(x, y, sz) => StHexbin(x, y, sz) },
    "st_isempty" -> { case Seq(g) => StUnary("stIsEmpty", g) },
    "st_npoints" -> { case Seq(g) => StUnary("nPoints", g) },
    "st_union_agg" -> { case Seq(g) => StUnionAgg(g) },
    "st_x" -> { case Seq(g) => StUnary("stX", g) },
    "st_y" -> { case Seq(g) => StUnary("stY", g) },
    "st_xmin" -> { case Seq(g) => StUnary("xMin", g) },
    "st_xmax" -> { case Seq(g) => StUnary("xMax", g) },
    "st_ymin" -> { case Seq(g) => StUnary("yMin", g) },
    "st_ymax" -> { case Seq(g) => StUnary("yMax", g) },
    "st_area" -> { case Seq(g) => StUnary("area", g) },
    "st_length_spherical" -> {
      case Seq(g) => StLengthSpherical(g,
        org.apache.spark.sql.catalyst.expressions.Literal(
          graft.core.DistanceJoin.EarthRadiusMeters))
      case Seq(g, r) => StLengthSpherical(g, r) },
    "st_area_spherical" -> {
      case Seq(g) => StAreaSpherical(g,
        org.apache.spark.sql.catalyst.expressions.Literal(
          graft.core.DistanceJoin.EarthRadiusMeters))
      case Seq(g, r) => StAreaSpherical(g, r) },
    "st_length" -> { case Seq(g) => StUnary("stLength", g) },
    "st_distance_spherical" -> {
      case Seq(a, b) => StDistanceSpherical(a, b,
        org.apache.spark.sql.catalyst.expressions.Literal(
          graft.core.DistanceJoin.EarthRadiusMeters))
      case Seq(a, b, r) => StDistanceSpherical(a, b, r) },
    // ST_DWithin is DEFINED as distance <= r (PostGIS docs) — expanding
    // at resolution time hands the conjunct to GridSpatialJoin's
    // distance rewrite with zero extra plumbing
    "st_dwithin" -> { case Seq(a, b, r) =>
      LessThanOrEqual(StDistance(a, b), Cast(r, DoubleType)) },
    "st_dwithin_spherical" -> { case Seq(a, b, r) =>
      LessThanOrEqual(StDistanceSpherical(a, b,
        org.apache.spark.sql.catalyst.expressions.Literal(
          graft.core.DistanceJoin.EarthRadiusMeters)),
        Cast(r, DoubleType)) },
    "st_azimuth" -> { case Seq(a, b) => StAzimuth("azimuth", a, b) },
    "st_azimuth_spherical" -> { case Seq(a, b) =>
      StAzimuth("azimuthSpherical", a, b) },
    "st_project_spherical" -> {
      case Seq(g, d, az) => StProjectSpherical(g, d, az,
        org.apache.spark.sql.catalyst.expressions.Literal(
          graft.core.DistanceJoin.EarthRadiusMeters))
      case Seq(g, d, az, r) => StProjectSpherical(g, d, az, r) },
    "st_segments" -> { case Seq(g) => StSegments(g) },
    "st_distance" -> { case Seq(a, b) => StDistance(a, b) },
    "st_buffer" -> { case Seq(g, d) => StBuffer(g, d) },
    "st_transform" -> { case Seq(g, f, t) => StTransform(g, f, t) },
    "hilbert_idx" -> { case Seq(x, y, mnx, mny, mxx, mxy, ord) =>
      def d(e: Expression) = e.eval().asInstanceOf[Number].doubleValue()
      HilbertExpr(d(mnx), d(mny), d(mxx), d(mxy),
        ord.eval().asInstanceOf[Number].intValue(), x, y) }) ++
    Seq("within", "contains", "intersects", "touches",
        "overlaps", "crosses", "disjoint", "equals").map { m =>
      (s"st_$m", { case Seq(a, b) => StRelation(m, a, b) }): (String, Seq[Expression] => Expression)
    }

  /** Register all geo functions in the session's SQL function registry. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }
}
