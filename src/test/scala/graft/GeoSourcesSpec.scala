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
