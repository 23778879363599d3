package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GeoFunctions
import graft.functions.GeoFunctions._

/**
 * External geo-format sources (SURVEY §2.1 S4 — the reference ingests
 * files via geopandas client-side; here they are distributed Spark reads).
 *
 * The GeoJSON readers exploit the JSON source's raw-capture behavior:
 * declaring an object field as StringType yields the literal JSON subtree,
 * so geometry parsing happens in our codegen'd st_geomfromgeojson over
 * executors — schema inference never has to unify heterogeneous
 * coordinates nesting, and arbitrarily large files stay distributed.
 */
object GeoSources {

  private val featureSchema = StructType(Seq(
    StructField("type", StringType),
    StructField("geometry", StringType),   // raw JSON subtree
    StructField("properties", StringType)) // raw JSON subtree
  )

  /** One GeoJSON FeatureCollection document (multiLine). */
  def readGeoJson(spark: SparkSession, path: String): DataFrame = {
    GeoFunctions.registerAll(spark)
    val schema = StructType(Seq(
      StructField("type", StringType),
      StructField("features", ArrayType(featureSchema))))
    spark.read.option("multiLine", "true").schema(schema).json(path)
      .select(explode(col("features")).as("f"))
      .select(
        st_geomfromgeojson(col("f.geometry")).as("geometry"),
        col("f.properties").as("properties"))
  }

  /** Line-delimited GeoJSON features (the scalable layout: splittable). */
  def readGeoJsonLines(spark: SparkSession, path: String): DataFrame = {
    GeoFunctions.registerAll(spark)
    spark.read.schema(featureSchema).json(path)
      .select(
        st_geomfromgeojson(col("geometry")).as("geometry"),
        col("properties").as("properties"))
  }

  /** Pull typed property columns out of the raw `properties` JSON. */
  def withProperties(df: DataFrame, props: Map[String, DataType]): DataFrame =
    props.foldLeft(df) { case (d, (name, t)) =>
      d.withColumn(name,
        get_json_object(col("properties"), s"$$.$name").cast(t))
    }

  /** CSV with a WKT geometry column -> WKB geometry. */
  def readWktCsv(spark: SparkSession, path: String,
                 wktColumn: String = "geometry",
                 header: Boolean = true): DataFrame = {
    GeoFunctions.registerAll(spark)
    spark.read.option("header", header.toString).csv(path)
      .withColumn(wktColumn, st_geomfromtext(col(wktColumn)))
  }
}
