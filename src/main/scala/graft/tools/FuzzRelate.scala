package graft.tools

import graft.core.GeoOps

/** One-off fuzz: relate() vs raw JTS for rect x {rect, line, point}. */
object FuzzRelate {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(12345)
    val modes = Seq("within", "contains", "intersects", "touches",
      "overlaps", "crosses", "disjoint", "equals")
    var checked = 0
    def coord(grid: Boolean): Double =
      if (grid) rnd.nextInt(12).toDouble else rnd.nextDouble() * 12
    for (iter <- 0 until 20000) {
      val grid = iter % 2 == 0
      val x = coord(grid); val y = coord(grid)
      val w = 1.0 + rnd.nextInt(5); val h = 1.0 + rnd.nextInt(5)
      val ga = GeoOps.makeEnvelope(x, y, x + w, y + h)
      val ja = GeoOps.read(ga)
      val gb = iter % 3 match {
        case 0 =>
          val bx = coord(grid); val by = coord(grid)
          GeoOps.makeEnvelope(bx, by, bx + 1 + rnd.nextInt(4), by + 1 + rnd.nextInt(4))
        case 1 =>
          val pts = 2 + rnd.nextInt(3)
          val cs = Array.fill(pts)((coord(grid), coord(grid)))
          val f = new org.locationtech.jts.geom.GeometryFactory()
          GeoOps.write(f.createLineString(
            cs.map(p => new org.locationtech.jts.geom.Coordinate(p._1, p._2))))
        case _ => GeoOps.point(coord(grid), coord(grid))
      }
      val jb = GeoOps.read(gb)
      for (m <- modes) {
        val want = m match {
          case "within" => ja.within(jb); case "contains" => ja.contains(jb)
          case "intersects" => ja.intersects(jb); case "touches" => ja.touches(jb)
          case "overlaps" => ja.overlaps(jb); case "crosses" => ja.crosses(jb)
          case "disjoint" => ja.disjoint(jb); case "equals" => ja.equalsTopo(jb)
        }
        val got = GeoOps.relate(GeoOps.modeId(m), ga, gb)
        if (got != want) {
          println(s"MISMATCH mode=$m rect=(${x},${y},${x+w},${y+h}) b=${GeoOps.asText(gb)} got=$got want=$want")
          sys.exit(1)
        }
        checked += 1
      }
    }
    println(s"FUZZ_OK $checked checks")
  }
}
