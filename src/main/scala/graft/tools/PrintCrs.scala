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
  }
}
