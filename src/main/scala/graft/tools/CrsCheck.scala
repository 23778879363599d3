package graft.tools

import graft.core.GeoOps

/** Scratch validation of the round-3 CRS additions against published
  * projection test points (OS Guide appendix; EPSG Guidance Note 7-2
  * worked examples) plus roundtrip/invariant probes. */
object CrsCheck {
  def main(args: Array[String]): Unit = {
    // OSGB36 / British National Grid, projection-only golden from the OS
    // "A guide to coordinate systems in Great Britain" worked example:
    // phi 52d39'27.2531"N, lam 1d43'4.5177"E -> E 651409.903 N 313177.270
    val bng = GeoOps.crsSpec(27700).get.proj
    val (be, bn) = bng.forward(1.0 + 43.0/60 + 4.5177/3600, 52.0 + 39.0/60 + 27.2531/3600)
    println(f"BNG: E=$be%.4f (want 651409.903)  N=$bn%.4f (want 313177.270)")

    // RD New projection-only golden, EPSG GN 7-2 oblique stereographic
    // example: phi 53N lam 6E (Amersfoort geographic) -> 196105.283 557057.739
    val rd = GeoOps.crsSpec(28992).get.proj
    val (re, rn) = rd.forward(6.0, 53.0)
    println(f"RD:  E=$re%.4f (want 196105.283)  N=$rn%.4f (want 557057.739)")

    // UPS North (EPSG GN 7-2 polar stereographic variant A example):
    // phi 73N lam 44E -> E 3320416.75 N 632668.43
    val ups = GeoOps.crsSpec(32661).get.proj
    val (ue, un) = ups.forward(44.0, 73.0)
    println(f"UPS: E=$ue%.2f (want 3320416.75)  N=$un%.2f (want 632668.43)")

    // 3031 invariants: scale==1 at the standard parallel (-71), roundtrip
    val aps = GeoOps.crsSpec(3031).get.proj
    val d = 1e-4
    val (x1, y1) = aps.forward(0.0, -71.0)
    val (x2, y2) = aps.forward(d, -71.0)
    val planar = math.hypot(x2 - x1, y2 - y1)
    // ellipsoidal parallel arc at -71: nu cos(phi) dlam
    val e2 = 2.0/298.257223563 - 1.0/(298.257223563*298.257223563)
    val sp = math.sin(math.toRadians(-71.0))
    val nu = 6378137.0 / math.sqrt(1 - e2*sp*sp)
    val arc = nu * math.cos(math.toRadians(-71.0)) * math.toRadians(d)
    println(f"3031 scale at lat_ts: ${planar/arc}%.9f (want 1.0)")
    for ((lon, lat) <- Seq((120.0, -75.0), (-60.0, -80.0), (0.1, -89.9))) {
      val (px, py) = aps.forward(lon, lat)
      val (rlon, rlat) = aps.inverse(px, py)
      println(f"3031 rt ($lon,$lat) -> err ${math.abs(rlon-lon)+math.abs(rlat-lat)}%.2e")
    }
    // 3413 north aspect roundtrip
    val nps = GeoOps.crsSpec(3413).get.proj
    for ((lon, lat) <- Seq((-45.0, 70.0), (10.0, 85.0), (170.0, 65.0))) {
      val (px, py) = nps.forward(lon, lat)
      val (rlon, rlat) = nps.inverse(px, py)
      println(f"3413 rt ($lon,$lat) -> err ${math.abs(rlon-lon)+math.abs(rlat-lat)}%.2e")
    }
    // 3395 World Mercator golden (EPSG GN 7-2 Mercator variant B uses
    // other params; check x = a*lam and equator N=0, plus roundtrip)
    val m = GeoOps.crsSpec(3395).get.proj
    println(f"3395 forward(0,0) = ${m.forward(0,0)}  (want 0,0)")
    val (mx, my) = m.forward(110.0, 45.0)
    println(f"3395 (110,45) = ($mx%.3f, $my%.3f)  x want ${6378137.0*math.toRadians(110.0)}%.3f")
    val (rmx, rmy) = m.inverse(mx, my)
    println(f"3395 rt err = ${math.abs(rmx-110)+math.abs(rmy-45)}%.2e")

    // full datum paths through transform(): WGS84 London -> 27700
    val ldn = GeoOps.transform(GeoOps.point(-0.1276, 51.5074), 4326, 27700)
    val lc = GeoOps.read(ldn).getCoordinate
    println(f"London BNG: (${lc.x}%.1f, ${lc.y}%.1f)  (approx 530000, 180500)")
    val back = GeoOps.read(GeoOps.transform(ldn, 27700, 4326)).getCoordinate
    println(f"London rt err: ${math.abs(back.x + 0.1276) + math.abs(back.y - 51.5074)}%.2e")
    // Amsterdam -> 28992
    val ams = GeoOps.read(GeoOps.transform(GeoOps.point(4.9041, 52.3676), 4326, 28992)).getCoordinate
    println(f"Amsterdam RD: (${ams.x}%.1f, ${ams.y}%.1f)  (approx 121400, 487300)")
    // Brussels -> 31370
    val bru = GeoOps.read(GeoOps.transform(GeoOps.point(4.3517, 50.8466), 4326, 31370)).getCoordinate
    println(f"Brussels L72: (${bru.x}%.1f, ${bru.y}%.1f)  (approx 148900, 170300)")
    // Warsaw -> 2180
    val waw = GeoOps.read(GeoOps.transform(GeoOps.point(21.0122, 52.2297), 4326, 2180)).getCoordinate
    println(f"Warsaw CS92: (${waw.x}%.1f, ${waw.y}%.1f)  (approx 637000, 486000)")
    // ETRS89 UTM33N vs WGS84 UTM33N should differ by < 1 m (datum-coincident)
    val a1 = GeoOps.read(GeoOps.transform(GeoOps.point(15.0, 52.0), 4326, 25833)).getCoordinate
    val a2 = GeoOps.read(GeoOps.transform(GeoOps.point(15.0, 52.0), 4326, 32633)).getCoordinate
    println(f"25833 vs 32633: d=${math.hypot(a1.x-a2.x, a1.y-a2.y)}%.6f m (want ~0)")

    // custom registration: re-register Slovenia TM under 90001 and compare
    GeoOps.registerCrs(90001, "tm", Map("a" -> 6378137.0, "rf" -> 298.257222101,
      "lon0" -> 15.0, "k0" -> 0.9999, "fe" -> 500000.0, "fn" -> -5000000.0))
    val c1 = GeoOps.read(GeoOps.transform(GeoOps.point(14.5, 46.05), 4326, 90001)).getCoordinate
    val c2 = GeoOps.read(GeoOps.transform(GeoOps.point(14.5, 46.05), 4326, 3794)).getCoordinate
    println(f"custom 90001 vs 3794: d=${math.hypot(c1.x-c2.x, c1.y-c2.y)}%.9f (want 0)")
    GeoOps.unregisterCrs(90001)

    // Swiss projection: swisstopo worked example (Rigi, LV03 / CH1903
    // geographic): phi 47d03'28.956559233"N lam 8d29'11.11127154"E ->
    // y(E) 679520.05, x(N) 212273.44
    val lv03 = GeoOps.crsSpec(21781).get.proj
    val (se, sn) = lv03.forward(8.0 + 29.0/60 + 11.11127154/3600,
      47.0 + 3.0/60 + 28.956559233/3600)
    println(f"LV03 Rigi: E=$se%.3f (want 679520.05)  N=$sn%.3f (want 212273.44)")
    // origin golden: Bern natural origin -> (FE, FN)
    val lv95 = GeoOps.crsSpec(2056).get.proj
    println(s"LV95 origin: ${lv95.forward(7.0 + 26.0/60 + 22.5/3600, 46.0 + 57.0/60 + 8.66/3600)} (want 2600000, 1200000)")
    // full datum path: Zurich WGS84 (8.5417, 47.3769) -> LV95 approx (2683000, 1247800)
    val zrh = GeoOps.read(GeoOps.transform(GeoOps.point(8.5417, 47.3769), 4326, 2056)).getCoordinate
    println(f"Zurich LV95: (${zrh.x}%.1f, ${zrh.y}%.1f)")
    val zrt = GeoOps.read(GeoOps.transform(GeoOps.transform(GeoOps.point(8.5417, 47.3769), 4326, 2056), 2056, 4326)).getCoordinate
    println(f"Zurich rt err: ${math.abs(zrt.x - 8.5417) + math.abs(zrt.y - 47.3769)}%.2e")
    // Krovak: EPSG GN7-2 worked example is in S-JTSK geographic
    // (phi 50d12'32.442"N, lam 16d50'59.179"E Greenwich) ->
    // Southing 1050538.64, Westing 568991.00 => 5514 E=-568991.00 N=-1050538.64
    val kr = GeoOps.crsSpec(5514).get.proj
    val (ke, kn) = kr.forward(16.0 + 50.0/60 + 59.179/3600,
      50.0 + 12.0/60 + 32.442/3600)
    println(f"Krovak: E=$ke%.3f (want ~-568991.00)  N=$kn%.3f (want ~-1050538.64)")
    // Prague through the full datum path (approx -743000, -1043000)
    val prg = GeoOps.read(GeoOps.transform(GeoOps.point(14.4378, 50.0755), 4326, 5514)).getCoordinate
    println(f"Prague 5514: (${prg.x}%.1f, ${prg.y}%.1f)")
    val prt = GeoOps.read(GeoOps.transform(GeoOps.transform(GeoOps.point(14.4378, 50.0755), 4326, 5514), 5514, 4326)).getCoordinate
    println(f"Prague rt err: ${math.abs(prt.x - 14.4378) + math.abs(prt.y - 50.0755)}%.2e")
    println("CRSCHECK_DONE")
  }
}
