package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/**
 * NTv2 grid-shift (.gsb) support — the published binary format behind
 * national datum-transformation grids (NRCan "NTv2 Developer's Guide";
 * the same files PROJ ships for NAD27→NAD83, OSTN-style corrections,
 * BETA2007, etc.). The reference gets these for free through pyproj
 * (`/root/reference/xcube_geodb/core/geodb.py:1535-1575`); here the
 * user SUPPLIES the grid file (`GeoOps.registerGridShift`) and the
 * engine does the interpolation — no bundled grids (they are data, not
 * code), no network.
 *
 * Format recap (all public): an 11-record overview header (16-byte
 * records: 8-char ASCII key + 8-byte value), `NUM_FILE` subgrids, each
 * an 11-record header (S_LAT/N_LAT/E_LONG/W_LONG/LAT_INC/LONG_INC in
 * ARC-SECONDS with longitude POSITIVE WEST — the Canadian convention —
 * plus GS_COUNT) followed by GS_COUNT 16-byte nodes of four float32:
 * (latShift, lonShift, latAcc, lonAcc), shifts in arc-seconds, lon
 * shift positive west. Nodes run row-major from the SE corner: rows
 * south→north, columns east→west (increasing positive-west longitude).
 * Both byte orders exist in the wild (Canadian big-endian, Australian
 * little-endian) — detected from NUM_OREC's value.
 *
 * Semantics: bilinear interpolation in the FINEST subgrid containing
 * the point (smallest LAT_INC — the child-grid-wins rule); forward =
 * source datum → target (lat += dLat/3600, lonEast −= dLonWest/3600);
 * inverse by fixed-point iteration (4 rounds — shifts are arc-second
 * scale and smooth, giving sub-0.1-mm closure, pinned in spec). A
 * point OUTSIDE every subgrid returns None — the caller falls back to
 * the registered Helmert (meter-class, documented) or refuses loudly.
 */
object NtV2 {

  /** One parsed subgrid: bounds/increments in arc-seconds, positive-west
    * longitudes; shifts as float32 exactly as stored. */
  final case class SubGrid(name: String, parent: String,
                           sLat: Double, nLat: Double,
                           eLonW: Double, wLonW: Double,
                           latInc: Double, lonInc: Double,
                           nRows: Int, nCols: Int,
                           latShift: Array[Float], lonShift: Array[Float])
      extends Serializable {
    def contains(latSec: Double, lonWSec: Double): Boolean =
      latSec >= sLat && latSec <= nLat && lonWSec >= eLonW && lonWSec <= wLonW

    /** Bilinear (dLatSec, dLonWestSec) at a contained point. */
    def interpolate(latSec: Double, lonWSec: Double): (Double, Double) = {
      val fr = (latSec - sLat) / latInc
      val fc = (lonWSec - eLonW) / lonInc
      var r0 = math.floor(fr).toInt
      var c0 = math.floor(fc).toInt
      if (r0 > nRows - 2) r0 = nRows - 2 // N/W edges land on the last cell
      if (c0 > nCols - 2) c0 = nCols - 2
      if (r0 < 0) r0 = 0
      if (c0 < 0) c0 = 0
      val dr = fr - r0
      val dc = fc - c0
      def at(a: Array[Float], r: Int, c: Int): Double = a(r * nCols + c)
      def bil(a: Array[Float]): Double =
        at(a, r0, c0) * (1 - dr) * (1 - dc) +
        at(a, r0, c0 + 1) * (1 - dr) * dc +
        at(a, r0 + 1, c0) * dr * (1 - dc) +
        at(a, r0 + 1, c0 + 1) * dr * dc
      (bil(latShift), bil(lonShift))
    }
  }

  /** A parsed .gsb: subgrids plus the finest-containing lookup. */
  final case class GridShift(source: String, target: String,
                             subGrids: Vector[SubGrid]) extends Serializable {
    /** (dLatSec, dLonWestSec) at positive-EAST degrees, None if outside. */
    def shiftAt(lonDeg: Double, latDeg: Double): Option[(Double, Double)] = {
      val latSec = latDeg * 3600.0
      val lonWSec = -lonDeg * 3600.0
      val hits = subGrids.filter(_.contains(latSec, lonWSec))
      if (hits.isEmpty) None
      else Some(hits.minBy(_.latInc).interpolate(latSec, lonWSec))
    }

    /** Source datum → target datum; None if outside every subgrid. */
    def forward(lonDeg: Double, latDeg: Double): Option[(Double, Double)] =
      shiftAt(lonDeg, latDeg).map { case (dLat, dLonW) =>
        (lonDeg - dLonW / 3600.0, latDeg + dLat / 3600.0)
      }

    /** Target datum → source datum, by fixed-point iteration on the
      * forward grid (the standard NTv2 inverse). */
    def inverse(lonDeg: Double, latDeg: Double): Option[(Double, Double)] = {
      var lon = lonDeg; var lat = latDeg
      var i = 0
      var ok = true
      while (i < 4 && ok) {
        shiftAt(lon, lat) match {
          case Some((dLat, dLonW)) =>
            lon = lonDeg + dLonW / 3600.0
            lat = latDeg - dLat / 3600.0
            i += 1
          case None => ok = false
        }
      }
      if (ok) Some((lon, lat)) else None
    }
  }

  /** Parse a .gsb byte array (use [[load]] for a file path). */
  def parse(bytes: Array[Byte]): GridShift = {
    require(bytes.length >= 11 * 16, s"NTv2: file too short (${bytes.length} bytes)")
    // byte order: NUM_OREC's value is 11 in the file's own order
    val le = ByteBuffer.wrap(bytes, 8, 4).order(ByteOrder.LITTLE_ENDIAN).getInt == 11
    val buf = ByteBuffer.wrap(bytes)
      .order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    def key(off: Int): String = {
      val b = new Array[Byte](8); buf.position(off); buf.get(b)
      new String(b, "US-ASCII").trim
    }
    def str(off: Int): String = key(off + 8)
    def int(off: Int): Int = { buf.position(off + 8); buf.getInt }
    def dbl(off: Int): Double = { buf.position(off + 8); buf.getDouble }
    def expect(off: Int, k: String): Unit = {
      val got = key(off)
      require(got == k,
        s"NTv2: expected record '$k' at byte $off, found '$got' — not a .gsb " +
        "file (or a subgrid count mismatch)")
    }
    expect(0, "NUM_OREC")
    require(int(0) == 11, s"NTv2: NUM_OREC must be 11, got ${int(0)}")
    expect(16, "NUM_SREC")
    require(int(16) == 11, s"NTv2: NUM_SREC must be 11, got ${int(16)}")
    expect(32, "NUM_FILE")
    val nFile = int(32)
    require(nFile >= 1 && nFile <= 100000, s"NTv2: NUM_FILE out of range: $nFile")
    expect(48, "GS_TYPE")
    val gsType = str(48)
    require(gsType == "SECONDS",
      s"NTv2: GS_TYPE '$gsType' unsupported — only SECONDS grids are published")
    val sysF = str(80); val sysT = str(96)
    var off = 11 * 16
    val grids = Vector.newBuilder[SubGrid]
    var g = 0
    while (g < nFile) {
      expect(off, "SUB_NAME")
      val name = str(off)
      val parent = str(off + 16)
      val sLat = dbl(off + 4 * 16); val nLat = dbl(off + 5 * 16)
      val eLonW = dbl(off + 6 * 16); val wLonW = dbl(off + 7 * 16)
      val latInc = dbl(off + 8 * 16); val lonInc = dbl(off + 9 * 16)
      expect(off + 10 * 16, "GS_COUNT")
      val count = int(off + 10 * 16)
      require(latInc > 0 && lonInc > 0 && nLat > sLat && wLonW > eLonW,
        s"NTv2 subgrid '$name': degenerate bounds/increments")
      val nRows = math.round((nLat - sLat) / latInc).toInt + 1
      val nCols = math.round((wLonW - eLonW) / lonInc).toInt + 1
      require(nRows >= 2 && nCols >= 2 && nRows.toLong * nCols == count,
        s"NTv2 subgrid '$name': GS_COUNT $count != $nRows rows x $nCols cols")
      off += 11 * 16
      val latS = new Array[Float](count)
      val lonS = new Array[Float](count)
      buf.position(off)
      var i = 0
      while (i < count) {
        latS(i) = buf.getFloat
        lonS(i) = buf.getFloat
        buf.getFloat; buf.getFloat // accuracies: parsed past, unused
        i += 1
      }
      off += count * 16
      grids += SubGrid(name, parent, sLat, nLat, eLonW, wLonW,
        latInc, lonInc, nRows, nCols, latS, lonS)
      g += 1
    }
    GridShift(sysF, sysT, grids.result())
  }

  /** Load a .gsb from any Hadoop-visible path (local/HDFS/S3). */
  def load(path: String, hadoopConf: org.apache.hadoop.conf.Configuration): GridShift = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf)
    val len = fs.getFileStatus(p).getLen
    require(len <= (1L << 31) - 1, s"NTv2: grid file over 2 GiB: $path")
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](len.toInt)
      in.readFully(0, bytes)
      parse(bytes)
    } finally in.close()
  }
}
