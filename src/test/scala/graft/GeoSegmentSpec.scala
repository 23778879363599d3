package graft

import org.apache.spark.sql.functions._

import graft.core.DistanceJoin

/** [[graft.core.DistanceJoin.geoSegmentRadiusJoin]] /
  * [[graft.core.DistanceJoin.geoSnapToSegments]] vs a local scalar
  * implementation of the SAME cross-track/along-track formulas (the
  * twin pins the candidate cover — the disk argument over
  * geoRadiusJoin — and the three-branch clamp), plus planted
  * behind/beyond/abeam/degenerate/antimeridian rows and the refusal
  * surface. */
class GeoSegmentSpec extends SparkSpec {

  private val R = DistanceJoin.EarthRadiusMeters

  /** Scalar twin of the operator's distance (same formula tree). */
  private def segDist(pLat: Double, pLon: Double,
                      aLat: Double, aLon: Double,
                      bLat: Double, bLon: Double): Double = {
    import math._
    def hav(la1: Double, lo1: Double, la2: Double, lo2: Double): Double = {
      val p1 = toRadians(la1); val p2 = toRadians(la2)
      val h = pow(sin((p2 - p1) / 2), 2) +
        cos(p1) * cos(p2) * pow(sin((toRadians(lo2) - toRadians(lo1)) / 2), 2)
      2.0 * asin(min(1.0, sqrt(h)))
    }
    def bearing(la1: Double, lo1: Double, la2: Double, lo2: Double): Double = {
      val p1 = toRadians(la1); val p2 = toRadians(la2)
      val dl = toRadians(lo2) - toRadians(lo1)
      atan2(sin(dl) * cos(p2), cos(p1) * sin(p2) - sin(p1) * cos(p2) * cos(dl))
    }
    val d12 = hav(aLat, aLon, bLat, bLon)
    val d13 = hav(aLat, aLon, pLat, pLon)
    if (d12 == 0.0) return d13 * R
    val th13 = bearing(aLat, aLon, pLat, pLon)
    val th12 = bearing(aLat, aLon, bLat, bLon)
    if (cos(th13 - th12) <= 0.0) return d13 * R
    val dxt = asin(max(-1.0, min(1.0, sin(d13) * sin(th13 - th12))))
    val dat = acos(max(-1.0, min(1.0, cos(d13) / cos(dxt))))
    if (dat >= d12) hav(bLat, bLon, pLat, pLon) * R
    else abs(dxt) * R
  }

  test("geoSegmentRadiusJoin equals the scalar twin on a global scatter") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val pts = (0L until 250L).map(i =>
      (i, rnd.nextDouble() * 160 - 80, rnd.nextDouble() * 360 - 180))
      .toDF("pid", "plat", "plon")
    val segs = (0L until 40L).map { i =>
      val la = rnd.nextDouble() * 150 - 75; val lo = rnd.nextDouble() * 360 - 180
      (i, la, lo,
        la + (rnd.nextDouble() - 0.5) * 4,
        lo + (rnd.nextDouble() - 0.5) * 4)
    }.toDF("sid", "alat", "alon", "blat", "blon")
    val pRows = pts.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val sRows = segs.collect().map(r => (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    for (rad <- Seq(200e3, 900e3)) {
      val brute = (for {
        (pid, la, lo) <- pRows; (sid, a1, o1, a2, o2) <- sRows
        if segDist(la, lo, a1, o1, a2, o2) <= rad
      } yield (pid, sid)).toSet
      val got = DistanceJoin.geoSegmentRadiusJoin(pts, segs,
          "plat", "plon", "alat", "alon", "blat", "blon",
          rad, maxSegMeters = 700e3)
        .select("pid", "sid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.size === got.toSet.size, s"duplicate pair at rad=$rad")
      assert(got.toSet === brute, s"pair set mismatch at rad=$rad")
    }
  }

  test("planted branches: behind A, beyond B, abeam, degenerate, antimeridian") {
    import spark.implicits._
    // equatorial west-east arc from (0,10) to (0,20)
    val segs = Seq(
      (1L, 0.0, 10.0, 0.0, 20.0),
      (2L, 5.0, 170.0, 5.0, -170.0), // crosses the antimeridian
      (3L, 30.0, 30.0, 30.0, 30.0))  // degenerate point-segment
      .toDF("sid", "alat", "alon", "blat", "blon")
    val pts = Seq(
      (1L, 0.0, 5.0),    // behind A -> d(P, A) ~ 5 deg of arc
      (2L, 0.0, 25.0),   // beyond B -> d(P, B) ~ 5 deg
      (3L, 3.0, 15.0),   // abeam -> cross-track ~ 3 deg
      (4L, 5.0, 175.0),  // near the antimeridian arc (the great circle
                         // bulges ~6.4 km poleward of the parallel here)
      (5L, 31.0, 30.0))  // 1 deg from the degenerate segment
      .toDF("pid", "plat", "plon")
    val got = DistanceJoin.geoSegmentRadiusJoin(pts, segs,
        "plat", "plon", "alat", "alon", "blat", "blon",
        radiusMeters = 600e3, maxSegMeters = 2500e3)
      .select("pid", "sid", "dist_m").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val deg = math.Pi / 180 * R
    assert(math.abs(got((1L, 1L)) - 5 * deg) < 1e3)
    assert(math.abs(got((2L, 1L)) - 5 * deg) < 1e3)
    assert(math.abs(got((3L, 1L)) - 3 * deg) < 3e3) // cross-track < meridian arc
    // a seam bug would read ~10^6 m (joining across raw lon difference);
    // the true distance is the small great-circle bulge off the parallel,
    // and it matches the scalar twin exactly
    assert(got((4L, 2L)) < 10e3)
    assert(math.abs(got((4L, 2L)) - segDist(5.0, 175.0, 5.0, 170.0, 5.0, -170.0)) < 1e-6)
    assert(math.abs(got((5L, 3L)) - 1 * deg) < 1e3)
    // each planted pair appears exactly for its own segment
    assert(!got.contains((1L, 2L)) && !got.contains((5L, 1L)))
  }

  test("geoSnapToSegments: brute argmin twin with lIdCol") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val pts = (0L until 120L).map(i =>
      (i, rnd.nextDouble() * 100 - 50, rnd.nextDouble() * 100 - 50))
      .toDF("pid", "plat", "plon")
    val segs = (0L until 15L).map { i =>
      val la = rnd.nextDouble() * 90 - 45; val lo = rnd.nextDouble() * 90 - 45
      (i, la, lo, la + (rnd.nextDouble() - 0.5) * 3, lo + (rnd.nextDouble() - 0.5) * 3)
    }.toDF("sid", "alat", "alon", "blat", "blon")
    val pRows = pts.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val sRows = segs.collect().map(r => (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val maxR = 2000e3
    val brute = pRows.flatMap { case (pid, la, lo) =>
      val cands = sRows.map(s => (s._1, segDist(la, lo, s._2, s._3, s._4, s._5)))
        .filter(_._2 <= maxR)
      if (cands.isEmpty) None else Some(pid -> cands.minBy(c => (c._2, c._1))._1)
    }.toMap
    val got = DistanceJoin.geoSnapToSegments(pts, segs, "plat", "plon",
        "alat", "alon", "blat", "blon", "sid",
        startRadiusMeters = 250e3, maxRadiusMeters = maxR,
        maxSegMeters = 500e3, lIdCol = Some("pid"))
      .select("pid", "sid").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === brute && brute.nonEmpty && brute.size < pRows.length)
  }

  test("refusals: over-long segment, out-of-range B, acute-regime bound") {
    import spark.implicits._
    val pts = Seq((1L, 0.0, 0.0)).toDF("pid", "plat", "plon")
    val long = Seq((1L, 0.0, 0.0, 0.0, 40.0)).toDF("sid", "alat", "alon", "blat", "blon")
    val e1 = intercept[Exception] {
      DistanceJoin.geoSegmentRadiusJoin(pts, long, "plat", "plon",
        "alat", "alon", "blat", "blon", 100e3, maxSegMeters = 100e3).collect()
    }
    assert(e1.toString.contains("maxSegMeters") ||
      Option(e1.getCause).exists(_.getMessage.contains("maxSegMeters")))
    val badB = Seq((1L, 0.0, 0.0, 95.0, 0.0)).toDF("sid", "alat", "alon", "blat", "blon")
    val e2 = intercept[Exception] {
      DistanceJoin.geoSegmentRadiusJoin(pts, badB, "plat", "plon",
        "alat", "alon", "blat", "blon", 100e3, maxSegMeters = 100e3).collect()
    }
    assert(e2.toString.contains("out of") ||
      Option(e2.getCause).exists(_.getMessage.contains("out of")))
    assertThrows[IllegalArgumentException] {
      DistanceJoin.geoSegmentRadiusJoin(pts, long, "plat", "plon",
        "alat", "alon", "blat", "blon", 9e6, maxSegMeters = 9e6)
    }
  }

  test("explodeToSegments: WKB shapes, composition with segmentRadiusJoin == JTS brute force") {
    import spark.implicits._
    import graft.functions.GeoFunctions._
    graft.functions.GeoFunctions.registerAll(spark)
    // shape coverage: linestring, multilinestring, polygon with hole
    val shapes = Seq(
      (1L, "LINESTRING(0 0, 4 0, 4 3)"),                          // 2 segs
      (2L, "MULTILINESTRING((0 0, 1 1), (5 5, 6 5, 7 5))"),       // 1 + 2
      (3L, "POLYGON((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 3 2, 3 3, 2 2))"), // 4 + 3
      (4L, "POINT(9 9)"))                                          // 0
      .toDF("rid", "wkt").select($"rid", st_geomfromtext($"wkt").as("geom"))
    val segs = DistanceJoin.explodeToSegments(shapes, "geom")
    assert(!segs.columns.contains("geom"), "WKB must not replicate per segment")
    val n = segs.groupBy("rid").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n === Map(1L -> 2L, 2L -> 3L, 3L -> 7L))
    val r1 = segs.filter($"rid" === 1).orderBy("seg_idx")
      .select("seg_idx", "ax", "ay", "bx", "by").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(r1.toSeq === Seq((0, 0.0, 0.0, 4.0, 0.0), (1, 4.0, 0.0, 4.0, 3.0)))
    // NULL geometry refuses loudly
    val withNull = shapes.union(Seq((5L, null.asInstanceOf[Array[Byte]]))
      .toDF("rid", "geom"))
    val eN = intercept[Exception] {
      DistanceJoin.explodeToSegments(withNull, "geom").count()
    }
    assert(eN.toString.contains("NULL geometry") ||
      Option(eN.getCause).exists(_.getMessage.contains("NULL geometry")))
    // composition: helper → segmentRadiusJoin equals a JTS st_distance
    // brute force over the ORIGINAL geometries at the same radius
    // (point-to-geometry distance = min over its segments/vertices)
    val rnd = new scala.util.Random(7)
    val roads = (0 until 25).map { i =>
      val x = rnd.nextInt(80); val y = rnd.nextInt(80)
      (100L + i, s"LINESTRING($x $y, ${x + 8} ${y + 3}, ${x + 16} $y)")
    }.toDF("road_id", "wkt").select($"road_id", st_geomfromtext($"wkt").as("rg"))
      .localCheckpoint(true)
    val pts = (0 until 400).map(i =>
      (1000L + i, ((i * 13) % 100).toDouble, ((i * 29) % 100).toDouble))
      .toDF("pid", "px", "py").localCheckpoint(true)
    val exploded = DistanceJoin.explodeToSegments(roads, "rg")
    val got = DistanceJoin.segmentRadiusJoin(pts, exploded,
        "px", "py", "ax", "ay", "bx", "by", radius = 5.0)
      .select("pid", "road_id").distinct() // per-ROAD match set
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pts.join(roads,
        st_distance(st_point($"px", $"py"), $"rg") <= 5.0)
      .select("pid", "road_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute && got.nonEmpty)
  }
}
