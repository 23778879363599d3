package graft

import org.apache.spark.sql.functions._

import graft.core.GeoCluster

/**
 * [[graft.core.GeoCluster.geoDbscan]] vs a driver-side brute-force
 * DBSCAN twin (same haversine, neighbor sets by cross product,
 * union-find components, the same deterministic border rule), plus
 * planted-scenario rows and the refusal surface.
 */
class GeoClusterSpec extends SparkSpec {

  private val R = graft.core.DistanceJoin.EarthRadiusMeters

  private def hav(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dphi = math.toRadians(lat1) - math.toRadians(lat2)
    val dlam = math.toRadians(lon1) - math.toRadians(lon2)
    val a = math.pow(math.sin(dphi / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dlam / 2), 2)
    2.0 * R * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** Brute DBSCAN: (id -> (isCore, clusterOrNone)) with cluster = min
    * core id of the component, border -> min neighbor-core rep. */
  private def brute(pts: Seq[(Int, Double, Double)], eps: Double,
                    minPts: Int): Map[Int, (Boolean, Option[Int])] = {
    val nbr = pts.map { case (i, la, lo) =>
      i -> pts.filter { case (j, lb, lob) => hav(la, lo, lb, lob) <= eps }
        .map(_._1).toSet
    }.toMap
    val cores = pts.map(_._1).filter(i => nbr(i).size >= minPts).toSet
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map(cores.toSeq.map(c => c -> c): _*)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    for (c <- cores; d <- nbr(c) if cores(d) && d != c) {
      val (a, b) = (find(c), find(d))
      if (a != b) parent(math.max(a, b)) = math.min(a, b)
    }
    val rep = cores.map(c => c -> find(c)).toMap
    pts.map { case (i, _, _) =>
      if (cores(i)) i -> ((true, Some(rep(i))))
      else {
        val nbrCores = nbr(i).filter(cores)
        i -> ((false, if (nbrCores.isEmpty) None else Some(nbrCores.map(rep).min)))
      }
    }.toMap
  }

  private def run(pts: Seq[(Int, Double, Double)], eps: Double, minPts: Int,
                  salt: Int = 0): Map[Int, (Boolean, Option[Int])] = {
    import spark.implicits._
    GeoCluster.geoDbscan(pts.toDF("id", "lat", "lon"), "id", "lat", "lon",
        eps, minPts, saltCells = salt)
      .select("id", "is_core", "cluster").collect()
      .map(r => r.getInt(0) ->
        ((r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getInt(2)))))
      .toMap
  }

  /** Two dense lat-line clusters, a bridge border point, and isolates. */
  private def fixture: Seq[(Int, Double, Double)] = {
    // cluster A: ids 1..6 along a meridian, ~440 m apart (0.004 deg)
    val a = (1 to 6).map(i => (i, 10.0 + i * 0.004, 20.0))
    // cluster B: ids 20..24, offset ~6 km north of A's end
    val b = (20 to 24).map(i => (i, 10.0 + 6 * 0.004 + 0.06 + (i - 20) * 0.004, 20.0))
    // border 40: within eps of A's last core but with few neighbors
    val border = Seq((40, 10.0 + 7 * 0.004 + 0.008, 20.0))
    // noise: far away singles
    val noise = Seq((50, 50.0, 50.0), (51, -30.0, 120.0))
    a ++ b ++ border ++ noise
  }

  test("geoDbscan equals the brute twin on the planted fixture") {
    for ((eps, minPts) <- Seq((2000.0, 4), (2000.0, 3), (900.0, 3), (500.0, 2))) {
      assert(run(fixture, eps, minPts) === brute(fixture, eps, minPts),
        s"mismatch at eps=$eps minPts=$minPts")
    }
  }

  test("geoDbscan on a random-ish global scatter equals the brute twin") {
    val pts = (0 until 160).map { i =>
      (i, ((i * 37) % 140).toDouble - 70.0 + ((i * 7) % 10) * 0.003,
          ((i * 53) % 360).toDouble - 180.0 + ((i * 11) % 10) * 0.003)
    }
    for ((eps, minPts) <- Seq((1500.0, 3), (5000.0, 2)))
      assert(run(pts, eps, minPts) === brute(pts, eps, minPts),
        s"mismatch at eps=$eps minPts=$minPts")
  }

  test("planted semantics: cores, border label, noise NULL, minPts=1 singletons") {
    val got = run(fixture, 2000.0, 4)
    assert(got(3) === ((true, Some(1))), "mid-cluster core labeled by min core id")
    assert(got(50) === ((false, None)) && got(51) === ((false, None)), "noise")
    assert(got(40)._1 === false && got(40)._2.isDefined, "border attaches")
    // minPts=1: every point is core (self-neighborhood), isolates become
    // their own singleton cluster — the isolated-core path
    val all1 = run(fixture, 2000.0, 1)
    assert(all1(50) === ((true, Some(50))) && all1(51) === ((true, Some(51))))
  }

  test("border point reachable from two clusters attaches to the min rep") {
    // two 4-point lat-line clusters, one point between them that sees
    // exactly one core of EACH (|nbr| = 3 < minPts=4 — border, and its
    // eps-reach spans both clusters)
    val pts =
      (1 to 4).map(i => (i, 10.0 + (i - 1) * 0.004, 20.0)) ++
      (11 to 14).map(i => (i, 10.030 + (i - 11) * 0.004, 20.0)) ++
      Seq((30, 10.021, 20.0))
    val got = run(pts, 1200.0, 4)
    val b = brute(pts, 1200.0, 4)
    assert(got === b)
    assert(got(30)._1 === false && got(30)._2 === Some(2),
      "deterministic min-rep attach (classic DBSCAN would be scan-order)")
  }

  test("saltCells parity") {
    assert(run(fixture, 2000.0, 3, salt = 4) === run(fixture, 2000.0, 3))
  }

  test("refusals: duplicate id, bad eps/minPts, reserved output columns") {
    import spark.implicits._
    val dup = Seq((1, 10.0, 20.0), (1, 11.0, 21.0)).toDF("id", "lat", "lon")
    val e = intercept[Exception] {
      GeoCluster.geoDbscan(dup, "id", "lat", "lon", 1000.0, 2).count()
    }
    assert(e.getMessage.contains("duplicate id") ||
      e.getCause != null && e.getCause.getMessage.contains("duplicate id"))
    val ok = Seq((1, 10.0, 20.0)).toDF("id", "lat", "lon")
    intercept[IllegalArgumentException] {
      GeoCluster.geoDbscan(ok, "id", "lat", "lon", -5.0, 2)
    }
    intercept[IllegalArgumentException] {
      GeoCluster.geoDbscan(ok, "id", "lat", "lon", 1000.0, 0)
    }
    intercept[IllegalArgumentException] {
      GeoCluster.geoDbscan(ok.withColumn("cluster", lit(1)),
        "id", "lat", "lon", 1000.0, 2)
    }
    intercept[IllegalArgumentException] {
      GeoCluster.geoDbscan(ok, "missing", "lat", "lon", 1000.0, 2)
    }
  }

  test("hotspots: scala Gi* reference, NULL contract, refusals") {
    import spark.implicits._
    // masses: cell (0,0)=4, (1,0)=2, (1,1)=1, (5,5)=1 — a hot corner
    // and a far singleton
    val pts = (Seq.fill(4)((0.5, 0.5)) ++ Seq.fill(2)((1.5, 0.5)) ++
      Seq((1.5, 1.5)) ++ Seq((5.5, 5.5))).toDF("x", "y")
    val got = GeoCluster.hotspots(pts, "x", "y", 1.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.get(5)).map(_ => r.getDouble(5))))).toMap
    // scala reference over the same formula
    val mass = Map((0L, 0L) -> 4L, (1L, 0L) -> 2L, (1L, 1L) -> 1L, (5L, 5L) -> 1L)
    val n = mass.size.toDouble
    val sx = mass.values.sum.toDouble
    val sx2 = mass.values.map(v => v * v).sum.toDouble
    val xbar = sx / n
    val s = math.sqrt(sx2 / n - xbar * xbar)
    mass.keys.foreach { case (cx, cy) =>
      val nbrs = mass.filter { case ((a, b), _) =>
        math.abs(a - cx) <= 1 && math.abs(b - cy) <= 1 }
      val wi = nbrs.size.toDouble
      val num = nbrs.values.sum - xbar * wi
      val z = num / (s * math.sqrt((n * wi - wi * wi) / (n - 1.0)))
      val (m, nm, nc, gz) = got((cx, cy))
      assert(m === mass((cx, cy)) && nm === nbrs.values.sum && nc === wi.toLong)
      assert(gz.isDefined && math.abs(gz.get - z) < 1e-12,
        s"cell ($cx, $cy): got $gz want $z")
    }
    // the hot corner scores positive, the far singleton negative
    assert(got((0L, 0L))._4.get > 0 && got((5L, 5L))._4.get < 0)
    // all-equal masses: S = 0, every z NULL (not NaN, not a crash)
    val flat = Seq((0.5, 0.5), (3.5, 0.5), (6.5, 0.5)).toDF("x", "y")
    val fz = GeoCluster.hotspots(flat, "x", "y", 1.0)
      .select("gi_z").collect().map(r => Option(r.get(0)))
    assert(fz.length === 3 && fz.forall(_.isEmpty))
    // neighborhood == universe: variance term 0 -> NULL
    val twoCells = (Seq.fill(3)((0.5, 0.5)) :+ ((1.5, 0.5))).toDF("x", "y")
    val tz = GeoCluster.hotspots(twoCells, "x", "y", 1.0)
      .select("gi_z").collect().map(r => Option(r.get(0)))
    assert(tz.length === 2 && tz.forall(_.isEmpty))
    // integral weights honored
    val wpts = Seq((0.5, 0.5, 4L), (1.5, 0.5, 2L), (1.5, 1.5, 1L), (5.5, 5.5, 1L))
      .toDF("x", "y", "w")
    val wgot = GeoCluster.hotspots(wpts, "x", "y", 1.0, Some("w"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    assert(math.abs(wgot((0L, 0L)) - got((0L, 0L))._4.get) < 1e-12)
    // refusals: single cell, fractional weight type, NULL coordinate
    val e1 = intercept[Exception] {
      Seq((0.5, 0.5)).toDF("x", "y")
        .transform(d => GeoCluster.hotspots(d, "x", "y", 1.0)).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e1).exists(_.contains("fewer than 2 occupied cells")))
    intercept[IllegalArgumentException] {
      GeoCluster.hotspots(Seq((0.5, 0.5, 1.0)).toDF("x", "y", "w"),
        "x", "y", 1.0, Some("w"))
    }
    val e2 = intercept[Exception] {
      Seq((Some(0.5), 0.5), (None, 1.5)).toDF("x", "y")
        .transform(d => GeoCluster.hotspots(d, "x", "y", 1.0)).collect()
    }
    assert(chain(e2).exists(_.contains("NULL/NaN/Inf")))
    // negative weight refuses loudly: signed mass breaks the count-mass
    // premise of the Gi* formulation (r15 ADVICE)
    val e3 = intercept[Exception] {
      Seq((0.5, 0.5, 4L), (1.5, 1.5, -1L)).toDF("x", "y", "w")
        .transform(d => GeoCluster.hotspots(d, "x", "y", 1.0, Some("w")))
        .collect()
    }
    assert(chain(e3).exists(_.contains("negative weight")))
  }

  test("hotspotsGeo: banded-grid scala reference, pole collapse, wrap, refusals") {
    import spark.implicits._
    val R = graft.core.DistanceJoin.EarthRadiusMeters
    val cellM = 700000.0 // ~6.3 deg bands
    // fixture spans equator, mid-lats, near-pole, and the antimeridian
    val pts = Seq(
      (0.3, 0.2, 3L), (0.4, 0.25, 2L),        // equator cluster
      (0.3, 7.1, 1L),                          // band above
      (45.2, 45.3, 5L), (46.0, 44.9, 4L),      // mid-lat
      (-179.8, 45.1, 2L), (179.9, 45.2, 1L),   // antimeridian pair
      (12.0, 88.5, 7L), (-100.0, 89.1, 3L))    // polar cap
      .toDF("lon", "lat", "w")
    val got = GeoCluster.hotspotsGeo(pts, "lon", "lat", cellM, Some("w"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.get(5)).map(_ => r.getDouble(5))))).toMap
    // ---- plain-scala reference of the banded grid + Gi* ----
    val hDeg = math.toDegrees(cellM / R)
    val sinHalf = math.sin(cellM / R / 2)
    def nCells(b: Long): Long = {
      val phiMax = math.min(90.0,
        math.max(math.abs(b * hDeg), math.abs((b + 1) * hDeg)) + hDeg)
      val dLam = math.toDegrees(2.0 *
        math.asin(math.min(1.0, sinHalf / math.cos(math.toRadians(phiMax)))))
      math.max(1L, math.floor(360.0 / dLam).toLong)
    }
    def cellOf(lon: Double, b: Long, shift: Long): Long = {
      val n = nCells(b)
      val c = (math.floor((lon + 180.0) / (360.0 / n)).toLong + shift) % n
      if (c < 0) c + n else c
    }
    val raw = Seq(
      (0.3, 0.2, 3L), (0.4, 0.25, 2L), (0.3, 7.1, 1L),
      (45.2, 45.3, 5L), (46.0, 44.9, 4L),
      (-179.8, 45.1, 2L), (179.9, 45.2, 1L),
      (12.0, 88.5, 7L), (-100.0, 89.1, 3L))
    val mass = raw.groupBy { case (lon, lat, _) =>
      val b = math.floor(lat / hDeg).toLong; (b, cellOf(lon, b, 0L))
    }.view.mapValues(_.map(_._3).sum).toMap
    val nT = mass.size.toDouble
    val sx = mass.values.sum.toDouble
    val sx2 = mass.values.map(v => v.toDouble * v).sum
    val xbar = sx / nT; val s2 = sx2 / nT - xbar * xbar
    def nbrs(b: Long, c: Long): Set[(Long, Long)] = {
      val centerLon = -180.0 + (c + 0.5) * (360.0 / nCells(b))
      (for (db <- -1L to 1L; dc <- -1L to 1L) yield {
        val tb = b + db; (tb, cellOf(centerLon, tb, dc))
      }).toSet
    }
    mass.foreach { case ((b, c), m) =>
      val occ = nbrs(b, c).filter(mass.contains)
      val nbrMass = occ.toSeq.map(mass).sum
      val wi = occ.size.toDouble
      val zRef =
        if (wi == nT || s2 <= 0) None
        else Some((nbrMass - xbar * wi) /
          (math.sqrt(s2) * math.sqrt((nT * wi - wi * wi) / (nT - 1.0))))
      val (gm, gn, gw, gz) = got((b, c))
      assert(gm === m && gn === nbrMass && gw === occ.size.toLong,
        s"cell ($b,$c): got ($gm,$gn,$gw) want ($m,$nbrMass,${occ.size})")
      (gz, zRef) match {
        case (Some(a), Some(e)) => assert(math.abs(a - e) < 1e-12)
        case (a, e) => assert(a.isEmpty === e.isEmpty, s"cell ($b,$c): $a vs $e")
      }
    }
    assert(got.keySet === mass.keySet)
    // the polar band collapses to few whole-circle cells: both polar
    // points land in band floor(88.5/hDeg)+ and their cells have tiny n
    val polarBand = math.floor(88.5 / hDeg).toLong
    assert(nCells(polarBand) < 8)
    // refusals: out-of-range latitude, negative weight
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    val e1 = intercept[Exception] {
      Seq((0.0, 91.0, 1L)).toDF("lon", "lat", "w")
        .transform(d => GeoCluster.hotspotsGeo(d, "lon", "lat", cellM, Some("w")))
        .collect()
    }
    assert(chain(e1).exists(_.contains("out of")))
    val e2 = intercept[Exception] {
      Seq((0.0, 1.0, 1L), (9.0, 9.0, -2L)).toDF("lon", "lat", "w")
        .transform(d => GeoCluster.hotspotsGeo(d, "lon", "lat", cellM, Some("w")))
        .collect()
    }
    assert(chain(e2).exists(_.contains("negative weight")))
    intercept[IllegalArgumentException] {
      GeoCluster.hotspotsGeo(pts, "lon", "lat", 0.0)
    }
  }
}
