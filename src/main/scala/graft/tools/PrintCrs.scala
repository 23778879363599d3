package graft.tools

import graft.core.GeoOps

/** Prints conic/azimuthal transform goldens (cross-checked against an
  * independent Snyder implementation) for the q77 pinned oracle. */
object PrintCrs {
  def main(args: Array[String]): Unit = {
    def r3(v: Double): Double = math.rint(v * 1000.0) / 1000.0
    val cases = Seq(
      (2154, (0.0, 0.0, 4.0, 1.0)),
      (3035, (5.0, 45.0, 9.0, 49.0)),
      (5070, (-100.0, 40.0, -96.0, 44.0)))
    cases.foreach { case (srid, (ax, ay, bx, by)) =>
      val (x1, y1, x2, y2) = GeoOps.transformBbox(ax, ay, bx, by, 4326, srid)
      println(s"CRS $srid: ${r3(x1)}, ${r3(y1)}, ${r3(x2)}, ${r3(y2)}")
    }
    // q83 pins: the round-3 families (stereo/Mercator/datum-shifted TM+LCC),
    // inputs as (minlon, minlat, maxlon, maxlat) in each CRS's home region
    val r3cases = Seq(
      (3031, (-60.0, -80.0, 60.0, -71.0)),
      (3395, (-10.0, 40.0, 10.0, 50.0)),
      (3413, (-80.0, 65.0, -10.0, 80.0)),
      (2180, (14.1, 49.0, 24.1, 54.8)),
      (27700, (-5.0, 50.5, 1.0, 53.0)),
      (28992, (4.0, 51.8, 6.5, 53.2)),
      (31370, (2.9, 49.6, 5.8, 51.3)),
      (2056, (6.1, 45.9, 10.4, 47.8)),
      (5514, (12.9, 48.6, 18.9, 51.0)),
      (3067, (19.1, 59.7, 31.6, 70.1)),
      (3978, (-141.0, 41.7, -52.6, 83.1)),
      (6933, (-179.9, -85.0, 179.9, 85.0)),
      (31467, (7.5, 47.3, 10.5, 54.9)),
      (31287, (9.5, 46.4, 17.2, 49.0)),
      (29902, (-10.5, 51.4, -5.4, 55.4)))
    r3cases.foreach { case (srid, (ax, ay, bx, by)) =>
      val (x1, y1, x2, y2) = GeoOps.transformBbox(ax, ay, bx, by, 4326, srid)
      println(s"(${srid}, ${r3(x1)}, ${r3(y1)}, ${r3(x2)}, ${r3(y2)}), ")
    }
  }
}
