package graft

import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions
import graft.functions.GeoFunctions._

/**
 * The overlay family through the SESSION surface (SQL registry +
 * Column API + codegen) and the st_union_agg dissolve aggregate —
 * kernel semantics are pinned in GeoOpsSpec; these rows pin the Spark
 * plumbing: registration, partial aggregation, merge across
 * partitionings, NULL contract.
 */
class GeoOverlaySpec extends SparkSpec {

  private lazy val s = { GeoFunctions.registerAll(spark); spark }

  test("overlay scalars resolve through SQL and the Column API identically") {
    val r = s.sql(
      "SELECT st_area(st_intersection(st_makeenvelope(0D,0D,10D,10D), st_makeenvelope(5D,5D,15D,15D))) AS ia, " +
      "st_area(st_union(st_makeenvelope(0D,0D,10D,10D), st_makeenvelope(5D,5D,15D,15D))) AS ua, " +
      "st_npoints(st_simplify(st_makeline(0D,0D,10D,0D), 0.5D)) AS np, " +
      "st_isempty(st_difference(st_makeenvelope(0D,0D,2D,2D), st_makeenvelope(0D,0D,2D,2D))) AS em").head()
    assert(r.getDouble(0) == 25.0 && r.getDouble(1) == 175.0)
    assert(r.getInt(2) == 2 && r.getBoolean(3))
    import s.implicits._
    val df = Seq((0.0, 0.0)).toDF("x", "y")
      .select(st_area(st_symdifference(
        st_makeenvelope($"x", $"y", lit(10.0), lit(10.0)),
        st_makeenvelope(lit(5.0), lit(5.0), lit(15.0), lit(15.0)))).as("sd"))
    assert(df.head().getDouble(0) == 150.0)
  }

  test("st_union_agg dissolves an overlapping chain, collapse-batch exercised") {
    import s.implicits._
    // 100 rects x=i*10 width 20 height 5: an overlapping chain whose
    // union area is (99*10 + 20) * 5 = 5050; 100 > the 64 collapse
    // batch, so the cascaded path runs
    val rects = (0 until 100).map(i => (i, i * 10.0))
      .toDF("id", "x")
      .select($"id", st_makeenvelope($"x", lit(0.0), $"x" + 20.0, lit(5.0)).as("g"))
    def area(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(st_area(st_union_agg(col("g"))).as("a")).head().getDouble(0)
    assert(area(rects.repartition(1)) == 5050.0)
    // merge path: many partitions, same answer
    assert(area(rects.repartition(8)) == 5050.0)
  }

  test("st_union_agg per group, NULL skip, all-NULL group is NULL") {
    import s.implicits._
    val df = Seq(
      (1, Some(0.0)), (1, Some(30.0)), (1, None),
      (2, Some(100.0)), (3, None))
      .toDF("grp", "x")
      .select($"grp", when($"x".isNotNull,
        st_makeenvelope($"x", lit(0.0), $"x" + 10.0, lit(10.0))).as("g"))
    val got = df.groupBy($"grp")
      .agg(st_area(st_union_agg($"g")).as("area"),
        st_union_agg($"g").isNull.as("isnull"))
      .collect().map(r => (r.getInt(0),
        (if (r.isNullAt(1)) -1.0 else r.getDouble(1)), r.getBoolean(2))).toSet
    // grp 1: two disjoint 10x10 squares -> 200; NULL row skipped
    assert(got.contains((1, 200.0, false)))
    assert(got.contains((2, 100.0, false)))
    // all-NULL group -> NULL (the PostGIS contract)
    assert(got.exists(t => t._1 == 3 && t._3))
  }
}
