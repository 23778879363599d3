package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.locationtech.jts.algorithm.Orientation
import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory, LinearRing, LineString, MultiLineString, MultiPolygon, Point, Polygon}

import graft.core.GeoOps

/**
 * ESRI shapefile source/sink (SURVEY §2.1 S4) implemented from the PUBLIC
 * format specifications — the "ESRI Shapefile Technical Description"
 * (July 1998 whitepaper) for .shp and the dBASE III header layout for
 * .dbf. The reference ingests shapefiles client-side via geopandas
 * (README.md:13-14, docs/source/notebooks sample data); here the read is
 * DISTRIBUTED: each .shp/.dbf pair is one Spark task (`binaryFile`
 * source), so a directory of shapefiles parallelizes across the cluster.
 * A single .shp is bounded at 4 GB by the format itself, so per-file
 * parsing cannot blow an executor.
 *
 * Supported shapes: Null(0), Point(1), PolyLine(3), Polygon(5),
 * MultiPoint(8) and their Z/M variants (11/13/15/18, 21/23/25/28 — XY
 * read, Z/M ignored). Polygon rings are assembled shell/hole by ring
 * orientation (ESRI: outer = clockwise) with point-in-shell assignment.
 * DBF field types: C -> string, N/F -> long or double (by decimal
 * count), L -> boolean, D -> string (YYYYMMDD).
 */
object Shapefile {

  // ======================================================================
  // Read path
  // ======================================================================

  /** Distributed read of one shapefile or a directory/glob of them.
    * All files in one read must share the .dbf schema (standard for a
    * layer split across files); the schema is taken from the first .dbf. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val shp = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.shp").load(path)
      .select(regexp_replace(col("path"), "\\.shp$", "").as("stem"),
        col("content").as("shp"))
    val dbf = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.dbf").load(path)
      .select(regexp_replace(col("path"), "\\.dbf$", "").as("stem"),
        col("content").as("dbf"))
    val paired = shp.join(dbf, Seq("stem"), "left")
    val firstDbf = paired.select("dbf").filter(col("dbf").isNotNull)
      .head(1).headOption.map(_.getAs[Array[Byte]](0))
    val attrFields: Seq[StructField] = firstDbf
      .map(b => dbfFields(b).map(f => StructField(f.name, f.sparkType)))
      .getOrElse(Seq.empty)
    val schema = StructType(attrFields :+ StructField("geometry", BinaryType))
    val rdd = paired.select("shp", "dbf").rdd.flatMap { r =>
      val geoms = parseShp(r.getAs[Array[Byte]](0))
      val attrs: Iterator[Seq[Any]] =
        if (r.isNullAt(1)) Iterator.continually(Seq.empty[Any])
        else parseDbfRecords(r.getAs[Array[Byte]](1))
      geoms.zip(attrs).map { case (g, a) => Row.fromSeq(a :+ g) }
    }
    spark.createDataFrame(rdd, schema)
  }

  // ---- .shp ----
  private[sources] def parseShp(bytes: Array[Byte]): Iterator[Array[Byte]] = {
    val buf = ByteBuffer.wrap(bytes)
    buf.order(ByteOrder.BIG_ENDIAN)
    require(buf.getInt(0) == 9994, "not a shapefile (magic != 9994)")
    val fileWords = buf.getInt(24)
    val limit = math.min(bytes.length.toLong, fileWords.toLong * 2).toInt
    var off = 100
    new Iterator[Array[Byte]] {
      def hasNext: Boolean = off + 8 <= limit
      def next(): Array[Byte] = {
        val contentWords = buf.getInt(off + 4) // record header is BE
        val start = off + 8
        off = start + contentWords * 2
        parseShape(bytes, start, contentWords * 2)
      }
    }
  }

  private val factory = new GeometryFactory()

  private def parseShape(b: Array[Byte], start: Int, len: Int): Array[Byte] = {
    val buf = ByteBuffer.wrap(b, start, len).slice()
    buf.order(ByteOrder.LITTLE_ENDIAN)
    val shapeType = buf.getInt(0)
    shapeType match {
      case 0 => null // null shape
      case 1 | 11 | 21 => // Point / PointZ / PointM: x,y at offset 4
        GeoOps.point(buf.getDouble(4), buf.getDouble(12))
      case 8 | 18 | 28 => // MultiPoint: bbox(32) numPoints points
        val n = buf.getInt(36)
        val pts = Array.tabulate(n)(i =>
          factory.createPoint(new Coordinate(
            buf.getDouble(40 + i * 16), buf.getDouble(48 + i * 16))))
        GeoOps.write(factory.createMultiPoint(pts))
      case 3 | 13 | 23 => // PolyLine: bbox numParts numPoints parts points
        val parts = readParts(buf)
        val lines = parts.map(cs => factory.createLineString(cs))
        GeoOps.write(
          if (lines.length == 1) lines.head
          else factory.createMultiLineString(lines))
      case 5 | 15 | 25 => // Polygon: rings by orientation
        val rings = readParts(buf).filter(_.length >= 4)
          .map(cs => factory.createLinearRing(closed(cs)))
        polygonsFrom(rings)
      case t => throw new IllegalArgumentException(s"unsupported shape type $t")
    }
  }

  /** parts/points section shared by PolyLine/Polygon (starts at 36). */
  private def readParts(buf: ByteBuffer): Array[Array[Coordinate]] = {
    val numParts = buf.getInt(36)
    val numPoints = buf.getInt(40)
    val partIdx = Array.tabulate(numParts)(i => buf.getInt(44 + i * 4))
    val ptsOff = 44 + numParts * 4
    def point(i: Int) = new Coordinate(
      buf.getDouble(ptsOff + i * 16), buf.getDouble(ptsOff + 8 + i * 16))
    Array.tabulate(numParts) { p =>
      val from = partIdx(p)
      val to = if (p + 1 < numParts) partIdx(p + 1) else numPoints
      Array.tabulate(to - from)(i => point(from + i))
    }
  }

  private def closed(cs: Array[Coordinate]): Array[Coordinate] =
    if (cs.head.equals2D(cs.last)) cs else cs :+ cs.head.copy()

  /** ESRI polygons: outer rings clockwise, holes CCW; assign each hole to
    * the shell that contains its first vertex. */
  private def polygonsFrom(rings: Array[LinearRing]): Array[Byte] = {
    val (holes, shells) = rings.partition(r => Orientation.isCCW(r.getCoordinateSequence))
    val effective = if (shells.isEmpty) holes else shells // tolerate bad winding
    val holeList = if (shells.isEmpty) Array.empty[LinearRing] else holes
    val polys: Array[Polygon] = effective.map { shell =>
      val shellPoly = factory.createPolygon(shell)
      val mine = holeList.filter(h =>
        shellPoly.contains(factory.createPoint(h.getCoordinateN(0))))
      factory.createPolygon(shell, mine)
    }
    GeoOps.write(
      if (polys.length == 1) polys.head else factory.createMultiPolygon(polys))
  }

  // ---- .dbf ----
  private[sources] case class DbfField(name: String, ftype: Char,
                                       length: Int, decimals: Int) {
    def sparkType: DataType = ftype match {
      case 'N' | 'F' => if (decimals > 0) DoubleType else LongType
      case 'L' => BooleanType
      case _ => StringType // C, D, memo fallbacks
    }
  }

  private[sources] def dbfFields(b: Array[Byte]): Seq[DbfField] = {
    val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val headerSize = buf.getShort(8) & 0xffff
    val fields = Seq.newBuilder[DbfField]
    var off = 32
    while (off + 32 <= headerSize && b(off) != 0x0d) {
      val name = new String(b, off, 11, StandardCharsets.ISO_8859_1)
        .takeWhile(_ != '\u0000').trim.toLowerCase
      fields += DbfField(name, b(off + 11).toChar, b(off + 16) & 0xff, b(off + 17) & 0xff)
      off += 32
    }
    fields.result()
  }

  private[sources] def parseDbfRecords(b: Array[Byte]): Iterator[Seq[Any]] = {
    val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val numRecords = buf.getInt(4)
    val headerSize = buf.getShort(8) & 0xffff
    val recordSize = buf.getShort(10) & 0xffff
    val fields = dbfFields(b)
    (0 until numRecords).iterator.flatMap { r =>
      val off = headerSize + r * recordSize
      if (off + recordSize > b.length || b(off) == '*') None // deleted row
      else {
        var f = off + 1
        Some(fields.map { fd =>
          val raw = new String(b, f, fd.length, StandardCharsets.ISO_8859_1).trim
          f += fd.length
          fd.ftype match {
            case 'N' | 'F' =>
              if (raw.isEmpty) null
              else if (fd.decimals > 0) raw.toDoubleOption.orNull
              else raw.toLongOption.orNull
            case 'L' => raw.headOption.map("TtYy".contains(_)).orNull
            case _ => if (raw.isEmpty) null else raw
          }
        })
      }
    }
  }

  // ======================================================================
  // Write path (point layers) — the export twin of the reference's
  // geopandas round-trip; driver-side assembly, intended for result sets
  // of the size a client would export (the read path is the scale path).
  // ======================================================================
  /**
   * Export twin for point/line/polygon layers. Driver-side by design: a
   * shapefile is one non-splittable .shp/.shx/.dbf triplet, so this is a
   * bounded-export tool (the distributed interchange path is parquet /
   * GeoJSON-lines). The layer's shape type comes from the first geometry
   * (shapefiles are single-type); ESRI ring winding (outer CW, holes CCW)
   * is enforced per ring on write.
   */
  def writeShapefile(df: DataFrame, stem: String,
                     geometryCol: String = "geometry",
                     maxRows: Int = 1000000): Unit = {
    val attrs = df.schema.fields.filterNot(_.name == geometryCol)
    // Bounded pre-count BEFORE the collect: limit(maxRows+1).count() is a
    // cheap early-terminating scan, so a user pointing this at a 100 TB
    // collection gets a clear error instead of a driver OOM. The .shp
    // format itself caps at 2 GB (32-bit word offsets, ESRI whitepaper),
    // so an unbounded export could never succeed anyway.
    val cap = math.min(math.max(maxRows, 0), Int.MaxValue - 1) // +1 below must not overflow
    val bounded = df.limit(cap + 1).count()
    require(bounded <= cap,
      s"writeShapefile is a driver-side bounded-export tool and the input " +
        s"exceeds maxRows=$maxRows (the .shp format caps at 2 GB). Export " +
        "large collections with the distributed GeoJSON-lines or parquet " +
        "path (GeoSources.writeGeoJsonLines) instead, or raise maxRows " +
        "only for inputs known to fit the format.")
    val rows = df.collect()
    require(rows.nonEmpty, "refusing to write an empty shapefile")
    val geoms = rows.map(r => GeoOps.read(r.getAs[Array[Byte]](geometryCol)))
    val recs = geoms.map(shpRecord)
    val shapeType = recs.head._1
    require(recs.forall(_._1 == shapeType),
      "shapefiles are single-type: mixed geometry types in input")
    val totalLen = 100 + recs.map(8 + _._2.length).sum
    val shp = ByteBuffer.allocate(totalLen)
    val shx = ByteBuffer.allocate(100 + recs.length * 8)
    val env = new org.locationtech.jts.geom.Envelope()
    geoms.foreach(g => env.expandToInclude(g.getEnvelopeInternal))
    def header(b: ByteBuffer, words: Int): Unit = {
      b.order(ByteOrder.BIG_ENDIAN)
      b.putInt(0, 9994); b.putInt(24, words)
      b.order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(28, 1000); b.putInt(32, shapeType)
      b.putDouble(36, env.getMinX); b.putDouble(44, env.getMinY)
      b.putDouble(52, env.getMaxX); b.putDouble(60, env.getMaxY)
    }
    header(shp, totalLen / 2)
    header(shx, (100 + recs.length * 8) / 2)
    var off = 100
    recs.zipWithIndex.foreach { case ((_, content), i) =>
      shp.order(ByteOrder.BIG_ENDIAN)
      shp.putInt(off, i + 1); shp.putInt(off + 4, content.length / 2)
      shp.put(off + 8, content, 0, content.length)
      shx.order(ByteOrder.BIG_ENDIAN)
      shx.putInt(100 + i * 8, off / 2); shx.putInt(104 + i * 8, content.length / 2)
      off += 8 + content.length
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$stem.shp"), shp.array())
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$stem.shx"), shx.array())
    writeDbf(stem, attrs, rows)
  }

  /** One record's (shapeType, content bytes). */
  private def shpRecord(g: Geometry): (Int, Array[Byte]) = g match {
    case p: Point =>
      val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(0, 1); b.putDouble(4, p.getX); b.putDouble(12, p.getY)
      (1, b.array())
    case l: LineString => (3, partsRecord(3, Array(l.getCoordinates), g))
    case m: MultiLineString =>
      val parts = Array.tabulate(m.getNumGeometries)(
        i => m.getGeometryN(i).asInstanceOf[LineString].getCoordinates)
      (3, partsRecord(3, parts, g))
    case p: Polygon => (5, partsRecord(5, polygonRings(p), g))
    case m: MultiPolygon =>
      val parts = (0 until m.getNumGeometries).toArray
        .flatMap(i => polygonRings(m.getGeometryN(i).asInstanceOf[Polygon]))
      (5, partsRecord(5, parts, g))
    case other => throw new IllegalArgumentException(
      s"unsupported geometry type for shapefile export: ${other.getGeometryType}")
  }

  /** Rings with ESRI winding: shell clockwise, holes counter-clockwise. */
  private def polygonRings(p: Polygon): Array[Array[Coordinate]] = {
    def wound(cs: Array[Coordinate], wantCCW: Boolean): Array[Coordinate] =
      if (Orientation.isCCW(factory.getCoordinateSequenceFactory.create(cs)) == wantCCW) cs
      else cs.reverse
    val shell = wound(closed(p.getExteriorRing.getCoordinates), wantCCW = false)
    val holes = Array.tabulate(p.getNumInteriorRing)(i =>
      wound(closed(p.getInteriorRingN(i).getCoordinates), wantCCW = true))
    shell +: holes
  }

  /** PolyLine/Polygon content: type bbox numParts numPoints parts points. */
  private def partsRecord(shapeType: Int, parts: Array[Array[Coordinate]],
                          g: Geometry): Array[Byte] = {
    val numPoints = parts.map(_.length).sum
    val b = ByteBuffer.allocate(44 + parts.length * 4 + numPoints * 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    val env = g.getEnvelopeInternal
    b.putInt(0, shapeType)
    b.putDouble(4, env.getMinX); b.putDouble(12, env.getMinY)
    b.putDouble(20, env.getMaxX); b.putDouble(28, env.getMaxY)
    b.putInt(36, parts.length); b.putInt(40, numPoints)
    var idx = 0
    parts.zipWithIndex.foreach { case (p, i) =>
      b.putInt(44 + i * 4, idx); idx += p.length
    }
    val ptsOff = 44 + parts.length * 4
    var j = 0
    parts.foreach(_.foreach { c =>
      b.putDouble(ptsOff + j * 16, c.x); b.putDouble(ptsOff + 8 + j * 16, c.y)
      j += 1
    })
    b.array()
  }

  def writePoints(df: DataFrame, stem: String,
                  geometryCol: String = "geometry"): Unit = {
    val attrs = df.schema.fields.filterNot(_.name == geometryCol)
    val rows = df.collect()
    val xs = rows.map(r => GeoOps.stX(r.getAs[Array[Byte]](geometryCol)))
    val ys = rows.map(r => GeoOps.stY(r.getAs[Array[Byte]](geometryCol)))
    writeShp(stem, xs, ys)
    writeDbf(stem, attrs, rows)
  }

  private def writeShp(stem: String, xs: Array[Double], ys: Array[Double]): Unit = {
    val n = xs.length
    val recBytes = 8 + 20 // header + (type, x, y)
    val shp = ByteBuffer.allocate(100 + n * recBytes)
    val shx = ByteBuffer.allocate(100 + n * 8)
    def header(b: ByteBuffer, words: Int): Unit = {
      b.order(ByteOrder.BIG_ENDIAN)
      b.putInt(0, 9994); b.putInt(24, words)
      b.order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(28, 1000); b.putInt(32, 1)
      b.putDouble(36, if (n == 0) 0 else xs.min)
      b.putDouble(44, if (n == 0) 0 else ys.min)
      b.putDouble(52, if (n == 0) 0 else xs.max)
      b.putDouble(60, if (n == 0) 0 else ys.max)
    }
    header(shp, (100 + n * recBytes) / 2)
    header(shx, (100 + n * 8) / 2)
    var off = 100
    for (i <- 0 until n) {
      shp.order(ByteOrder.BIG_ENDIAN)
      shp.putInt(off, i + 1); shp.putInt(off + 4, 10)
      shp.order(ByteOrder.LITTLE_ENDIAN)
      shp.putInt(off + 8, 1)
      shp.putDouble(off + 12, xs(i)); shp.putDouble(off + 20, ys(i))
      shx.order(ByteOrder.BIG_ENDIAN)
      shx.putInt(100 + i * 8, off / 2); shx.putInt(104 + i * 8, 10)
      off += recBytes
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$stem.shp"), shp.array())
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$stem.shx"), shx.array())
  }

  private def writeDbf(stem: String, attrs: Array[StructField], rows: Array[Row]): Unit = {
    case class W(name: String, t: Char, len: Int, dec: Int)
    val ws = attrs.map { f =>
      f.dataType match {
        case _: IntegerType | _: LongType | _: ShortType => W(f.name, 'N', 18, 0)
        case _: DoubleType | _: FloatType | _: DecimalType => W(f.name, 'N', 18, 6)
        case _: BooleanType => W(f.name, 'L', 1, 0)
        case _ => W(f.name, 'C', 64, 0)
      }
    }
    val recordSize = 1 + ws.map(_.len).sum
    val headerSize = 32 + ws.length * 32 + 1
    val buf = ByteBuffer.allocate(headerSize + rows.length * recordSize + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0, 0x03.toByte)
    buf.putInt(4, rows.length)
    buf.putShort(8, headerSize.toShort)
    buf.putShort(10, recordSize.toShort)
    ws.zipWithIndex.foreach { case (w, i) =>
      val off = 32 + i * 32
      val nm = w.name.take(10).getBytes(StandardCharsets.ISO_8859_1)
      buf.put(off, nm, 0, nm.length)
      buf.put(off + 11, w.t.toByte)
      buf.put(off + 16, w.len.toByte)
      buf.put(off + 17, w.dec.toByte)
    }
    buf.put(32 + ws.length * 32, 0x0d.toByte)
    rows.zipWithIndex.foreach { case (row, r) =>
      var off = headerSize + r * recordSize
      buf.put(off, ' '.toByte); off += 1
      ws.zipWithIndex.foreach { case (w, i) =>
        val v = row.get(row.fieldIndex(w.name))
        val s = (v, w.t) match {
          case (null, _) => ""
          case (x, 'N') if w.dec > 0 => f"${x.toString.toDouble}%.6f"
          case (x, 'N') => x.toString
          case (x, 'L') => if (x == true) "T" else "F"
          case (x, _) => x.toString
        }
        val cell =
          if (w.t == 'C') s.take(w.len).padTo(w.len, ' ')       // left-justified
          else s.takeRight(w.len).reverse.padTo(w.len, ' ').reverse // right-justified
        buf.put(off, cell.getBytes(StandardCharsets.ISO_8859_1))
        off += w.len
      }
    }
    buf.put(buf.capacity() - 1, 0x1a.toByte)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$stem.dbf"), buf.array())
  }
}
