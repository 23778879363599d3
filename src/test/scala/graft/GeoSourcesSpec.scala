package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.GeoDb
import graft.functions.GeoFunctions._
import graft.sources.GeoSources

class GeoSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("GeoJSON FeatureCollection -> collection ingest roundtrip") {
    val dir = tmpDir("geojson-src")
    val doc =
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","geometry":{"type":"Point","coordinates":[10.5,20.5]},"properties":{"raba_id":1410,"name":"a"}},
        |{"type":"Feature","geometry":{"type":"Polygon","coordinates":[[[0,0],[2,0],[2,2],[0,2],[0,0]]]},"properties":{"raba_id":7000,"name":"b"}}
        |]}""".stripMargin
    Files.writeString(Paths.get(dir, "fc.geojson"), doc)
    val df = GeoSources.readGeoJson(spark, s"$dir/fc.geojson")
    assert(df.count() == 2)
    val typed = GeoSources.withProperties(df,
      Map("raba_id" -> IntegerType, "name" -> StringType))
    val rows = typed.select(geometry_type($"geometry"), $"raba_id", $"name")
      .orderBy("raba_id").collect()
    assert(rows.map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq ==
      Seq(("POINT", 1410, "a"), ("POLYGON", 7000, "b")))
    // ingest into the engine end-to-end
    val db = new GeoDb(spark, tmpDir("src-wh"), "geodb_user")
    db.createCollection("imported", Seq("raba_id" -> "integer", "name" -> "text"))
    db.insertIntoCollection("imported", typed.drop("properties"))
    assert(db.getCollection("imported", "raba_id=eq.1410").count() == 1)
  }

  test("line-delimited GeoJSON (splittable at scale)") {
    val dir = tmpDir("geojsonl-src")
    val lines = Seq(
      """{"type":"Feature","geometry":{"type":"Point","coordinates":[1,1]},"properties":{"v":1}}""",
      """{"type":"Feature","geometry":{"type":"Point","coordinates":[2,2]},"properties":{"v":2}}""")
    Files.writeString(Paths.get(dir, "features.jsonl"), lines.mkString("\n"))
    val df = GeoSources.readGeoJsonLines(spark, s"$dir/features.jsonl")
    assert(df.count() == 2)
    assert(df.select(st_x($"geometry")).as[Double].collect().sorted.toSeq == Seq(1.0, 2.0))
  }

  test("shapefile: point roundtrip with typed dbf attributes") {
    import graft.sources.Shapefile
    val dir = tmpDir("shp-src")
    val src = Seq((1L, "alpha", 1.5, true), (2L, "beta", -2.25, false))
      .toDF("id", "name", "score", "flag")
      .withColumn("geometry", st_point($"id".cast("double") * 10, lit(3.0)))
    Shapefile.writePoints(src, s"$dir/layer")
    val back = Shapefile.read(spark, dir)
    assert(back.count() == 2)
    assert(back.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(back.schema("score").dataType == org.apache.spark.sql.types.DoubleType)
    assert(back.schema("flag").dataType == org.apache.spark.sql.types.BooleanType)
    val rows = back.orderBy("id")
      .select($"id", $"name", $"score", $"flag", st_x($"geometry"), st_y($"geometry"))
      .collect()
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "alpha")
    assert(math.abs(rows(0).getDouble(2) - 1.5) < 1e-9 && rows(0).getBoolean(3))
    assert(rows(0).getDouble(4) == 10.0 && rows(0).getDouble(5) == 3.0)
    assert(rows(1).getLong(0) == 2L && !rows(1).getBoolean(3))
    assert(math.abs(rows(1).getDouble(2) + 2.25) < 1e-9)
  }

  test("shapefile: polygon/multipolygon/line writer roundtrips through own reader") {
    import graft.sources.Shapefile
    import graft.core.GeoOps
    // polygons incl. a hole and a multipolygon — winding is enforced on
    // write, reassembled by orientation on read, so JTS equality holds
    val polyDir = tmpDir("shp-poly")
    val wkts = Seq(
      (1L, "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"),
      (2L, "POLYGON((20 20, 30 20, 30 30, 20 30, 20 20))"),
      (3L, "MULTIPOLYGON(((40 0, 45 0, 45 5, 40 5, 40 0)), ((50 0, 55 0, 55 5, 50 5, 50 0)))"))
    val polys = wkts.toDF("id", "wkt")
      .withColumn("geometry", st_geomfromtext($"wkt")).drop("wkt")
    Shapefile.writeShapefile(polys, s"$polyDir/layer")
    val backP = Shapefile.read(spark, polyDir).orderBy("id")
      .select($"id", $"geometry").collect()
    wkts.zip(backP).foreach { case ((_, wkt), row) =>
      val expected = GeoOps.read(GeoOps.geomFromText(
        org.apache.spark.unsafe.types.UTF8String.fromString(wkt)))
      val got = GeoOps.read(row.getAs[Array[Byte]]("geometry"))
      assert(got.norm().equalsExact(expected.norm(), 1e-9), s"roundtrip of $wkt got $got")
    }
    // polylines incl. a multilinestring
    val lineDir = tmpDir("shp-line")
    val lineWkts = Seq(
      (1L, "LINESTRING(0 0, 5 5, 10 0)"),
      (2L, "MULTILINESTRING((0 0, 1 1), (2 2, 3 3, 4 2))"))
    val lines = lineWkts.toDF("id", "wkt")
      .withColumn("geometry", st_geomfromtext($"wkt")).drop("wkt")
    Shapefile.writeShapefile(lines, s"$lineDir/layer")
    val backL = Shapefile.read(spark, lineDir).orderBy("id")
      .select($"id", $"geometry").collect()
    lineWkts.zip(backL).foreach { case ((_, wkt), row) =>
      val expected = GeoOps.read(GeoOps.geomFromText(
        org.apache.spark.unsafe.types.UTF8String.fromString(wkt)))
      val got = GeoOps.read(row.getAs[Array[Byte]]("geometry"))
      assert(got.norm().equalsExact(expected.norm(), 1e-9), s"roundtrip of $wkt got $got")
    }
    // mixed types refused
    val mixed = Seq((1L, "POINT(0 0)"), (2L, "LINESTRING(0 0, 1 1)")).toDF("id", "wkt")
      .withColumn("geometry", st_geomfromtext($"wkt")).drop("wkt")
    intercept[IllegalArgumentException](
      Shapefile.writeShapefile(mixed, s"${tmpDir("shp-mixed")}/layer"))
    // export guard: refuses over-maxRows inputs BEFORE collecting, and the
    // error routes the user at the distributed export path
    val big = Seq((1L, "POINT(0 0)"), (2L, "POINT(1 1)"), (3L, "POINT(2 2)"))
      .toDF("id", "wkt")
      .withColumn("geometry", st_geomfromtext($"wkt")).drop("wkt")
    val guard = intercept[IllegalArgumentException](
      Shapefile.writeShapefile(big, s"${tmpDir("shp-guard")}/layer", maxRows = 2))
    assert(guard.getMessage.contains("GeoJSON"))
  }

  test("shapefile: polygon with hole and polyline records parse") {
    import graft.sources.Shapefile
    import java.nio.{ByteBuffer, ByteOrder}
    val dir = tmpDir("shp-poly")
    // hand-build a .shp: one Polygon record (outer CW ring + CCW hole)
    // and verify ring assembly; spec offsets from the public whitepaper
    val outer = Array((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)) // CW
    val hole = Array((2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0), (2.0, 2.0))      // CCW
    val pts = outer ++ hole
    val content = 4 + 32 + 8 + 2 * 4 + pts.length * 16
    val b = ByteBuffer.allocate(100 + 8 + content)
    b.order(ByteOrder.BIG_ENDIAN)
    b.putInt(0, 9994); b.putInt(24, (100 + 8 + content) / 2)
    b.order(ByteOrder.LITTLE_ENDIAN); b.putInt(28, 1000); b.putInt(32, 5)
    b.order(ByteOrder.BIG_ENDIAN); b.putInt(100, 1); b.putInt(104, content / 2)
    b.order(ByteOrder.LITTLE_ENDIAN)
    val s = 108
    b.putInt(s, 5) // polygon
    b.putInt(s + 36, 2); b.putInt(s + 40, pts.length)
    b.putInt(s + 44, 0); b.putInt(s + 48, outer.length)
    pts.zipWithIndex.foreach { case ((x, y), i) =>
      b.putDouble(s + 52 + i * 16, x); b.putDouble(s + 60 + i * 16, y)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "poly.shp"), b.array())
    val df = Shapefile.read(spark, dir)
    val g = df.select($"geometry").head.getAs[Array[Byte]](0)
    assert(graft.core.GeoOps.geometryType(g).toString == "POLYGON")
    assert(math.abs(graft.core.GeoOps.area(g) - (100.0 - 4.0)) < 1e-9) // hole cut out
  }

  test("CSV with WKT geometry column") {
    val dir = tmpDir("wktcsv-src")
    Files.writeString(Paths.get(dir, "data.csv"),
      "id,geometry,klass\n1,POINT(5 6),x\n2,\"POLYGON((0 0,1 0,1 1,0 0))\",y\n")
    val df = GeoSources.readWktCsv(spark, s"$dir/data.csv")
    assert(df.count() == 2)
    val types = df.select(geometry_type($"geometry")).as[String].collect().sorted
    assert(types.toSeq == Seq("POINT", "POLYGON"))
    // predicates work directly on the imported geometry
    assert(df.filter(st_contains(
      st_makeenvelope(lit(0.0), lit(0.0), lit(10.0), lit(10.0)), $"geometry"))
      .count() == 2)
  }
}
