package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

import graft.core.GeoOps
import graft.query.PostgrestFilter

/**
 * Property tests (SURVEY.md §5): the PostgREST-filter parser is equivalent
 * to the corresponding Spark SQL predicate on randomized frames, and the
 * codegen'd geo predicates agree with direct JTS evaluation.
 */
class PropertySpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.functions.GeoFunctions.registerAll(spark)
    graft.ext.TextFunctions.registerAll(spark)
  }

  /** scalatestplus bridge is not in the offline cache: sample generators
    * directly with fixed seeds (deterministic across runs). */
  private def forAllSampled[T](gen: Gen[T], n: Int)(body: T => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .foreach(body)
    }
  import spark.implicits._

  private lazy val df = {
    val rows = (1 to 200).map { i =>
      (i.toLong, (i * 37 % 100).toDouble, s"name_${i % 10}", i % 2 == 0)
    }
    rows.toDF("id", "score", "name", "flag").cache()
  }

  private val numOps = Seq(
    ("eq", "="), ("neq", "<>"), ("gt", ">"), ("gte", ">="), ("lt", "<"), ("lte", "<="))

  test("property: parsed numeric conditions == SQL predicates") {
    val genCase = for {
      (pgOp, sqlOp) <- Gen.oneOf(numOps)
      col <- Gen.oneOf("id", "score")
      v <- Gen.choose(0, 100)
    } yield (pgOp, sqlOp, col, v)
    forAllSampled(genCase, 40) { case (pgOp, sqlOp, c, v) =>
      val viaParser = PostgrestFilter(df, s"$c=$pgOp.$v")
        .select("id").as[Long].collect().sorted.toSeq
      val viaSql = df.filter(s"$c $sqlOp $v")
        .select("id").as[Long].collect().sorted.toSeq
      assert(viaParser == viaSql)
    }
  }

  test("property: or-trees == SQL disjunctions") {
    val genCase = for {
      v1 <- Gen.choose(0, 100); v2 <- Gen.choose(0, 100); v3 <- Gen.choose(0, 100)
    } yield (v1, v2, v3)
    forAllSampled(genCase, 20) { case (v1, v2, v3) =>
      val viaParser = PostgrestFilter(df,
        s"or=(score.lt.$v1,and(score.gt.$v2,id.lte.$v3))")
        .select("id").as[Long].collect().sorted.toSeq
      val viaSql = df.filter(s"score < $v1 OR (score > $v2 AND id <= $v3)")
        .select("id").as[Long].collect().sorted.toSeq
      assert(viaParser == viaSql)
    }
  }

  test("property: codegen'd st_relation == direct JTS on random geoms") {
    val genEnv = for {
      x <- Gen.choose(-50.0, 50.0); y <- Gen.choose(-50.0, 50.0)
      w <- Gen.choose(0.5, 30.0); h <- Gen.choose(0.5, 30.0)
    } yield (x, y, x + w, y + h)
    forAllSampled(Gen.zip(genEnv, genEnv), 30) { case (a, b) =>
      val modes = Seq("within", "contains", "intersects", "touches",
        "overlaps", "crosses", "disjoint", "equals")
      val ga = GeoOps.makeEnvelope(a._1, a._2, a._3, a._4)
      val gb = GeoOps.makeEnvelope(b._1, b._2, b._3, b._4)
      val row = Seq((ga, gb)).toDF("ga", "gb")
        .select(modes.map(m =>
          graft.functions.GeoFunctions.st_relation(m, col("ga"), col("gb")).as(m)): _*)
        .head()
      modes.zipWithIndex.foreach { case (m, i) =>
        assert(row.getBoolean(i) == GeoOps.relate(GeoOps.modeId(m), ga, gb),
          s"mode $m disagrees for $a vs $b")
      }
    }
  }

  test("property: rect-rect fast path == raw JTS topology (integer grid)") {
    // relate()'s interval-arithmetic fast path must agree with full JTS
    // topology; an integer grid makes boundary contact (touches, equals,
    // shared edges) actually occur, unlike random doubles
    val genEnv = for {
      x <- Gen.choose(0, 10); y <- Gen.choose(0, 10)
      w <- Gen.choose(1, 6); h <- Gen.choose(1, 6)
    } yield (x.toDouble, y.toDouble, (x + w).toDouble, (y + h).toDouble)
    forAllSampled(Gen.zip(genEnv, genEnv), 80) { case (a, b) =>
      val ga = GeoOps.makeEnvelope(a._1, a._2, a._3, a._4)
      val gb = GeoOps.makeEnvelope(b._1, b._2, b._3, b._4)
      val ja = GeoOps.read(ga); val jb = GeoOps.read(gb)
      val expected = Map(
        "within" -> ja.within(jb), "contains" -> ja.contains(jb),
        "intersects" -> ja.intersects(jb), "touches" -> ja.touches(jb),
        "overlaps" -> ja.overlaps(jb), "crosses" -> ja.crosses(jb),
        "disjoint" -> ja.disjoint(jb), "equals" -> ja.equalsTopo(jb))
      expected.foreach { case (m, want) =>
        assert(GeoOps.relate(GeoOps.modeId(m), ga, gb) == want,
          s"mode $m disagrees with raw JTS for $a vs $b")
      }
    }
  }

  test("property: prepared-path relate (rect vs point/line) == raw JTS") {
    // non-rectangle second operands exercise the PreparedGeometry path
    // (and line operands the crosses logic); integer grid for boundary hits
    val genRect = for {
      x <- Gen.choose(0, 10); y <- Gen.choose(0, 10)
      w <- Gen.choose(1, 6); h <- Gen.choose(1, 6)
    } yield (x.toDouble, y.toDouble, (x + w).toDouble, (y + h).toDouble)
    val genPt = for { x <- Gen.choose(0, 16); y <- Gen.choose(0, 16) } yield (x, y)
    forAllSampled(Gen.zip(genRect, genPt, genPt), 60) { case (a, p1, p2) =>
      val ga = GeoOps.makeEnvelope(a._1, a._2, a._3, a._4)
      val pt = GeoOps.point(p1._1.toDouble, p1._2.toDouble)
      val ln = GeoOps.makeLine(p1._1.toDouble, p1._2.toDouble,
        p2._1.toDouble, p2._2.toDouble)
      val ja = GeoOps.read(ga)
      for (gb <- Seq(pt, ln)) {
        val jb = GeoOps.read(gb)
        val expected = Map(
          "contains" -> ja.contains(jb), "intersects" -> ja.intersects(jb),
          "touches" -> ja.touches(jb), "crosses" -> ja.crosses(jb),
          "disjoint" -> ja.disjoint(jb), "within" -> ja.within(jb),
          "overlaps" -> ja.overlaps(jb), "equals" -> ja.equalsTopo(jb))
        expected.foreach { case (m, want) =>
          assert(GeoOps.relate(GeoOps.modeId(m), ga, gb) == want,
            s"mode $m disagrees for rect $a vs ${GeoOps.asText(gb)}")
        }
      }
    }
  }

  test("property: geoRadiusJoin == brute haversine MULTISET on random globes and radii") {
    // the banding has three geometry regimes (equatorial many-cell,
    // mid-lat 1/cos widening, polar whole-circle collapse) and one
    // historical bug class (replication keys wrapping onto one cell ->
    // duplicate pairs, caught in round 13) — so the property is
    // MULTISET equality, radius randomized across four orders of
    // magnitude and latitudes biased toward the poles half the time
    val bigR = graft.core.DistanceJoin.EarthRadiusMeters
    def havM(la1: Double, lo1: Double, la2: Double, lo2: Double): Double = {
      val (p1, p2) = (math.toRadians(la1), math.toRadians(la2))
      val a = math.pow(math.sin((p1 - p2) / 2), 2) +
        math.cos(p1) * math.cos(p2) *
          math.pow(math.sin(math.toRadians(lo1 - lo2) / 2), 2)
      2 * bigR * math.asin(math.min(1.0, math.sqrt(a)))
    }
    val genCase = for {
      radiusKm <- Gen.oneOf(20.0, 200.0, 2000.0, 9000.0)
      polar <- Gen.oneOf(true, false)
      seed <- Gen.choose(1, 100000)
    } yield (radiusKm, polar, seed)
    forAllSampled(genCase, 8) { case (radiusKm, polar, seed) =>
      val rnd = new scala.util.Random(seed)
      def lat() =
        if (polar) (85 + rnd.nextDouble() * 5) * (if (rnd.nextBoolean()) 1 else -1)
        else rnd.nextDouble() * 178 - 89
      val lRows = (0L until 40L).map(i =>
        (i, lat(), rnd.nextDouble() * 360 - 180))
      val rRows = (0L until 40L).map(i =>
        (i, lat(), rnd.nextDouble() * 360 - 180))
      val got = graft.core.DistanceJoin.geoRadiusJoin(
          lRows.toDF("lid", "llat", "llon"), rRows.toDF("rid", "rlat", "rlon"),
          "llat", "llon", "rlat", "rlon", radiusKm * 1000)
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
      val brute = (for { (li, la, lo) <- lRows; (ri, ra, ro) <- rRows
                         if havM(la, lo, ra, ro) <= radiusKm * 1000 }
        yield (li, ri)).sorted
      assert(got == brute,
        s"radius=${radiusKm}km polar=$polar seed=$seed: " +
          s"got ${got.size} brute ${brute.size}")
    }
  }

  test("property: segmentRadiusJoin == brute point-to-segment MULTISET across radii/cells") {
    // the 2D reference-cell rule has two hazard classes — a pair lost
    // where the canonical cell is not covered, and a pair duplicated
    // across shared cells — so the property is MULTISET equality on
    // random segment mixes (long diagonals crossing many cells, short
    // stubs, degenerates) across radii and cell-size multipliers
    def segD2(px: Double, py: Double, ax: Double, ay: Double,
              bx: Double, by: Double): Double = {
      val wx = px - ax; val wy = py - ay
      val vx = bx - ax; val vy = by - ay
      val L = vx * vx + vy * vy; val w = wx * vx + wy * vy
      if (L == 0.0 || w <= 0.0) wx * wx + wy * wy
      else if (w >= L) (px - bx) * (px - bx) + (py - by) * (py - by)
      else { val c = wx * vy - wy * vx; c * c / L }
    }
    val genCase = for {
      radius <- Gen.oneOf(2.0, 9.0, 30.0)
      csMult <- Gen.oneOf(1.0, 2.5)
      seed <- Gen.choose(1, 100000)
    } yield (radius, csMult, seed)
    forAllSampled(genCase, 8) { case (radius, csMult, seed) =>
      val rnd = new scala.util.Random(seed)
      val pRows = (0L until 60L).map(i =>
        (i, rnd.nextDouble() * 120, rnd.nextDouble() * 120))
      val sRows = (0L until 25L).map { i =>
        val x = rnd.nextDouble() * 120; val y = rnd.nextDouble() * 120
        val len = if (i % 5 == 0) 0.0 else rnd.nextDouble() * 80
        val ang = rnd.nextDouble() * math.Pi * 2
        (i, x, y, x + len * math.cos(ang), y + len * math.sin(ang))
      }
      val got = graft.core.DistanceJoin.segmentRadiusJoin(
          pRows.toDF("pid", "px", "py"),
          sRows.toDF("sid", "ax", "ay", "bx", "by"),
          "px", "py", "ax", "ay", "bx", "by",
          radius, Some(radius * csMult))
        .select("pid", "sid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
      val brute = (for { (pi, px, py) <- pRows; (si, ax, ay, bx, by) <- sRows
                         if segD2(px, py, ax, ay, bx, by) <= radius * radius }
        yield (pi, si)).sorted
      assert(got == brute,
        s"radius=$radius csMult=$csMult seed=$seed: got ${got.size} brute ${brute.size}")
    }
  }

  test("property: distributed sequence packing == sequential reference") {
    // random corpora: the two-pass prefix sum must equal a plain
    // sequential scan for any doc-count/length mix and any seqLen
    val corpusGen = for {
      n <- Gen.choose(1, 120)
      lens <- Gen.listOfN(n, Gen.choose(0, 37))
      seqLen <- Gen.choose(1, 64)
    } yield (lens, seqLen)
    forAllSampled(corpusGen, 12) { case (lens, seqLen) =>
      val docs = lens.zipWithIndex.map { case (len, i) =>
        ((i + 1).toLong, Seq.fill(len)("w").mkString(" "))
      }.toDF("doc_id", "text")
      val got = graft.ext.TextAnalysis
        .packSequences(docs, "text", "doc_id", seqLen)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4))).toSeq
      var cum = 0L
      val want = lens.zipWithIndex.map { case (len, i) =>
        val start = cum / seqLen
        val end = if (len == 0) start else (cum + len - 1) / seqLen
        cum += len
        ((i + 1).toLong, len, start, end, end > start)
      }
      assert(got == want, s"seqLen=$seqLen lens=$lens")
    }
  }

  test("property: ngram_char_stats kernel == gram-string formulation") {
    // random token streams with planted repetition: the hashed in-kernel
    // count map must reproduce the count*len(gram) masses a string
    // groupBy computes (the formulation the q120 oracle runs)
    val genDoc = for {
      nTok <- Gen.choose(0, 40)
      toks <- Gen.listOfN(nTok, Gen.oneOf("a", "bb", "ccc", "dd", "e", "xyz"))
      sep <- Gen.oneOf(" ", "  ", "\t", " \n")
    } yield toks.mkString(sep)
    forAllSampled(Gen.zip(genDoc, Gen.choose(1, 5)), 60) { case (doc, n) =>
      val toks = doc.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val joined = toks.mkString(" ")
      val grams = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
      val masses = grams.groupBy(identity).toSeq.map { case (g, occ) =>
        (occ.size.toLong, g.length.toLong) }
      val expTop = if (masses.isEmpty) 0L else masses.map(m => m._1 * m._2).max
      val expDup = masses.filter(_._1 >= 2).map(m => m._1 * m._2).sum
      val got = graft.ext.TextOps.ngramCharStats(
        org.apache.spark.unsafe.types.UTF8String.fromString(doc), n)
      assert(got.getLong(0) == expTop, s"top: doc=$doc n=$n")
      assert(got.getLong(1) == expDup, s"dup: doc=$doc n=$n")
      assert(got.getLong(2) == joined.length.toLong, s"denom: doc=$doc n=$n")
    }
  }

  /** Pure-Scala Sennrich BPE reference: per-round argmax (count desc,
    * space-joined pair string asc) + leftmost-first non-overlapping
    * merge application. */
  private def bpeRef(words: Seq[String], rounds: Int): Seq[(Int, String, Long)] = {
    var vocab: Map[Vector[String], Long] = words.groupBy(identity)
      .map { case (w, g) => w.map(_.toString).toVector -> g.size.toLong }
    val out = collection.mutable.Buffer[(Int, String, Long)]()
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, wc) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + wc
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.minBy { case ((x, y), m) => (-m, x + " " + y) }
        out += ((r, s"$a $b", n))
        vocab = vocab.map { case (syms, wc) =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              nb += (a + b); i += 2
            } else { nb += syms(i); i += 1 }
          }
          nb.result() -> wc
        }
        r += 1
      }
    }
    out.toSeq
  }

  test("property: bpeTrainMerges == sequential Sennrich reference") {
    // tiny alphabets force pair collisions and argmax ties every round
    val genWord = for {
      len <- Gen.choose(1, 5)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b'))
    } yield cs.mkString
    val genCorpus = Gen.choose(3, 8).flatMap(k => Gen.listOfN(k, genWord))
    forAllSampled(genCorpus, 5) { words =>
      val docs = Seq(Tuple1(words.mkString(" "))).toDF("text")
      val got = graft.ext.TextAnalysis.bpeTrainMerges(docs, "text", rounds = 4)
        .collect().map(x => (x.getInt(0), x.getString(1), x.getLong(2))).toSeq
      val want = bpeRef(words, 4)
      assert(got == want, s"words=$words got=$got want=$want")
    }
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("property: editDistancePairs == brute force on random mixed-length corpora") {
    // alphabet {a,b,c}, lengths 0..12: strings straddle the short/long
    // boundary at both maxDist settings (shortMax 5 and 8 for q=3), so
    // the banded path, the prefix path, and their overlap band all get
    // random traffic; duplicates produce dist-0 pairs
    val genS = for {
      len <- Gen.choose(0, 12)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val genCorpus = Gen.choose(8, 16).flatMap(k => Gen.listOfN(k, genS))
    forAllSampled(Gen.zip(genCorpus, Gen.oneOf(1, 2)), 6) { case (ss, k) =>
      val rows = ss.zipWithIndex.map { case (s, i) => ((i + 1).toLong, s) }
      val got = graft.ext.Dedup.editDistancePairs(
          rows.toDF("id", "s"), "s", "id", maxDist = k, q = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (i, a) <- rows; (j, b) <- rows if i < j
        d = lev(a, b) if d <= k
      } yield (i, j, d)).toSet
      assert(got == want, s"k=$k corpus=$ss extra=${got.diff(want)} " +
        s"missing=${want.diff(got)}")
    }
  }

  test("property: containmentPairs == brute force on random word docs") {
    // word_shingles semantics: distinct 3-gram set; docs under 3 tokens
    // contribute the whole text as one gram
    def gramsOf(s: String): Set[String] = {
      val w = s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      if (w.isEmpty) Set.empty
      else if (w.size < 3) Set(w.mkString(" "))
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val genDoc = for {
      len <- Gen.choose(1, 10)
      ws <- Gen.listOfN(len, Gen.oneOf("ant", "bee", "cat", "dog", "elk"))
    } yield ws.mkString(" ")
    val genCorpus = Gen.choose(4, 9).flatMap(k => Gen.listOfN(k, genDoc))
    forAllSampled(genCorpus, 6) { ds =>
      val rows = ds.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
      val got = graft.ext.Dedup.containmentPairs(
          rows.toDF("doc_id", "text"), "text", "doc_id",
          n = 3, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .map { case (a, b, c) => (a, b, math.rint(c * 1e9) / 1e9) }.toSet
      val want = (for {
        (i, a) <- rows; (j, b) <- rows if i != j
        ga = gramsOf(a); gb = gramsOf(b)
        if ga.nonEmpty && gb.nonEmpty
        c = ga.intersect(gb).size.toDouble / ga.size if c >= 0.5
      } yield (i, j, math.rint(c * 1e9) / 1e9)).toSet
      assert(got == want, s"corpus=$ds extra=${got.diff(want)} " +
        s"missing=${want.diff(got)}")
    }
  }

  test("property: editDistanceJoin == brute force on random cross corpora") {
    val genS = for {
      len <- Gen.choose(0, 12)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val genSide = Gen.choose(5, 10).flatMap(k => Gen.listOfN(k, genS))
    forAllSampled(Gen.zip(genSide, genSide, Gen.oneOf(1, 2)), 5) {
      case (ls, rs, k) =>
        val lrows = ls.zipWithIndex.map { case (s, i) => ((i + 1).toLong, s) }
        val rrows = rs.zipWithIndex.map { case (s, i) => ((100 + i).toLong, s) }
        val got = graft.ext.Dedup.editDistanceJoin(
            lrows.toDF("id", "s"), "s", "id",
            rrows.toDF("rid", "rs"), "rs", "rid", maxDist = k, q = 3)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        val want = (for {
          (i, a) <- lrows; (j, b) <- rrows
          d = lev(a, b) if d <= k
        } yield (i, j, d)).toSet
        assert(got == want, s"k=$k l=$ls r=$rs extra=${got.diff(want)} " +
          s"missing=${want.diff(got)}")
    }
  }

  test("property: moment_unscaled is the pinned floor(x*1e12+0.5) rule, within half a unit") {
    // the limb kernel's conversion is deliberately NOT any engine's
    // double->decimal cast (cast tie behavior is not portable: Spark's
    // HALF_UP and DuckDB's cast disagree on 0.1983642578125 = 1625/2^13,
    // whose expansion terminates exactly at digit 13 = 5); the pinned
    // rule is IEEE-replayable on both engines. Pins here: the kernel
    // IS that rule, the rule never strays more than half a scale-12
    // unit + product-rounding slack from the exact value, the limb
    // split/recombine is the identity, and the dyadic tie resolves
    // toward +inf on both signs.
    val genD = Gen.oneOf(
      Gen.choose(-1e6, 1e6),
      Gen.choose(-1.0, 1.0),
      Gen.oneOf(0.0, -0.0, 1e-13, -1e-13, 0.1, 1.0 / 3.0,
        4.9e-324, 123456.789012345, 0.1983642578125, -0.1983642578125))
    forAllSampled(genD, 200) { d =>
      val viaKernel = graft.ext.MomentKernel.unscaled12(d)
      val rule = math.floor(d * 1e12 + 0.5)
      assert(viaKernel != null && viaKernel.longValue() == rule.toLong,
        s"kernel diverges from the pinned rule at $d: $viaKernel vs $rule")
      val asDec = java.math.BigDecimal.valueOf(viaKernel.longValue(), 12)
      val exact = new java.math.BigDecimal(d)
      // half a scale-12 unit + the product's own rounding slack (one
      // ulp of x*1e12, which dominates for large magnitudes)
      val slack = (0.5 + Math.ulp(d * 1e12)) * 1e-12 + 1e-18
      assert(asDec.subtract(exact).abs().doubleValue() <= slack,
        s"conversion strayed beyond the rule's bound at $d")
      // limb split/recombine is the identity
      val u = viaKernel.longValue()
      val rec = graft.ext.MomentKernel.limbsToDecimal(
        u >> 44, (u >> 22) & ((1L << 22) - 1), u & ((1L << 22) - 1))
      assert(rec.toJavaBigDecimal.compareTo(asDec) == 0,
        s"limb roundtrip broke at $d")
    }
    // the measured cross-engine tie: 1625/2^13 terminates at digit 13=5;
    // the pinned rule takes it UP on both signs (floor(x+0.5) semantics)
    assert(graft.ext.MomentKernel.unscaled12(0.1983642578125)
      .longValue() == 198364257813L)
    assert(graft.ext.MomentKernel.unscaled12(-0.1983642578125)
      .longValue() == -198364257812L)
    // NaN / infinities keep the NULL contract
    Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
      .foreach(d => assert(graft.ext.MomentKernel.unscaled12(d) == null))
  }

  test("property: binary pack/hamming invariants on random vectors") {
    import graft.ext.BinKernel
    val genVec = for {
      d <- Gen.choose(1, 130)
      v <- Gen.listOfN(d, Gen.choose(-2.0, 2.0))
    } yield v.toArray
    forAllSampled(genVec, 80) { v =>
      val t = new Array[Double](v.length)
      val p = BinKernel.packLocal(v, t)
      // each bit is exactly the per-dimension comparison
      v.indices.foreach { i =>
        val bit = (p(i >>> 6) >>> (i & 63)) & 1L
        assert((bit == 1L) == (v(i) > 0.0), s"bit $i wrong for ${v(i)}")
      }
      // hamming to itself is 0; flipping one dim moves it by exactly 1
      def ham(a: Array[Long], b: Array[Long]): Int =
        a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      assert(ham(p, p) == 0)
      val w = v.clone(); w(0) = if (v(0) > 0.0) -1.0 else 1.0
      assert(ham(p, BinKernel.packLocal(w, t)) == 1)
    }
  }

  test("property: MaxSimKernel == naive reference on random token sets") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val genCase = for {
      dim <- Gen.choose(1, 8)
      nd <- Gen.choose(1, 6)
      nq <- Gen.choose(1, 4)
      doc <- Gen.listOfN(nd, Gen.listOfN(dim, Gen.choose(-1.0, 1.0)))
      q <- Gen.listOfN(nq, Gen.listOfN(dim, Gen.choose(-1.0, 1.0)))
    } yield (doc.map(_.toArray), q.map(_.toArray).toArray)
    forAllSampled(genCase, 60) { case (doc, q) =>
      val mv = new GenericArrayData(
        doc.map(t => new GenericArrayData(t.map(java.lang.Double.valueOf))).toArray[Any])
      val got = graft.ext.MaxSimKernel.score(mv, q)
      val want = q.map { qt =>
        doc.map { dt =>
          var s = 0.0; var i = 0
          while (i < qt.length) { s += dt(i) * qt(i); i += 1 }
          s
        }.max
      }.foldLeft(0.0)(_ + _)
      assert(got == want, s"maxsim $got != reference $want")
    }
  }

  test("array ops: cs / cd / ov") {
    val adf = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("a")),
      (3L, Seq("d", "e")),
      (4L, Seq.empty[String])
    ).toDF("id", "tags")
    def ids(q: String): Seq[Long] =
      PostgrestFilter(adf, q).select("id").as[Long].collect().sorted.toSeq
    assert(ids("tags=cs.{a,b}") == Seq(1L))       // contains all
    assert(ids("tags=cd.{a,b,c,d}") == Seq(1L, 2L, 4L)) // contained in
    assert(ids("tags=ov.{a,e}") == Seq(1L, 2L, 3L))     // overlaps
  }
}
