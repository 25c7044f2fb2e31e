package graft

import graft.compile.SuiteCompiler
import graft.spec.{Spec, Unique}
import graft.table.TableChecks
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5): mode equivalence, partitioning invariance,
  * salted/partial-agg uniqueness ≡ naive, drift metric laws. Plain
  * ScalaCheck generators with pinned seeds (no scalatestplus bridge in the
  * offline cache) — 5 samples per property.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    (1 to 5).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(fail("gen failed")))
    }

  private def whenever(c: Boolean)(body: => Unit): Unit = if (c) body

  private val rowGen = for {
    n <- Gen.chooseNum(-100, 200)
    s <- Gen.oneOf("", "a", "ab", "abc", "hello world", "ZZ-99")
    nullS <- Gen.frequency(9 -> false, 1 -> true)
  } yield (n, if (nullS) null else s)

  private val specs = Seq(
    """{"columns":{"n":{"minimum":0,"maximum":100},"s":{"minLength":2}}}""",
    """{"columns":{"n":{"multipleOf":3},"s":{"pattern":"a"}},"required":["s"]}""",
    """{"columns":{"n":{"anyOf":[{"maximum":0},{"minimum":50}]},
        "s":{"enum":["a","ab","abc"]}}}""",
    """{"columns":{"n":{"if":{"minimum":100},"then":{"multipleOf":2},
        "else":{"exclusiveMinimum":-50}}}}""")

  test("flag mode ≡ violation-mode emptiness on random tables × specs") {
    forAll(Gen.listOfN(60, rowGen)) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("n", "s")
        specs.foreach { sj =>
          val suite = SuiteCompiler.compile(Spec.fromJson(sj), df.schema)
          val ann = graft.exec.Validator.annotate(df, suite)
            .select(col("valid"), size(col("violations")) === 0)
            .collect()
          ann.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1)))
          val flag = graft.exec.Validator.flag(df, suite)
            .select("valid").as[Boolean].collect().toSeq
          assert(flag == ann.map(_.getBoolean(0)).toSeq)
        }
      }
    }
  }

  test("verdicts are partitioning-invariant") {
    forAll(Gen.listOfN(80, rowGen)) { rows =>
      whenever(rows.nonEmpty) {
        val suiteJson = specs.head
        def invalids(parts: Int): Long = {
          val df = rows.toDF("n", "s").repartition(parts)
          val suite = SuiteCompiler.compile(Spec.fromJson(suiteJson), df.schema)
          graft.exec.Validator.flag(df, suite).filter(!col("valid")).count()
        }
        assert(invalids(1) == invalids(7))
      }
    }
  }

  test("uniqueness via partial agg ≡ naive per-key counting") {
    forAll(Gen.listOfN(100, Gen.chooseNum(0, 30))) { keys =>
      whenever(keys.nonEmpty) {
        val df = keys.map(k => (s"key_$k", k)).toDF("k", "v")
        val got = TableChecks.duplicateKeys(df, Seq("k"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val exp = keys.groupBy(identity).collect {
          case (k, vs) if vs.size > 1 => s"key_$k" -> vs.size.toLong
        }
        assert(got == exp)
      }
    }
  }

  test("PSI: zero against itself, invariant under repartition") {
    forAll(Gen.listOfN(100, Gen.chooseNum(0.0, 100.0))) { xs =>
      whenever(xs.nonEmpty) {
        val df = xs.toDF("v")
        val edges = Seq(25.0, 50.0, 75.0)
        val hist = TableChecks.histogram(df, "v", edges)
        val props = hist.map(_.toDouble / xs.size)
        val self = TableChecks.psi(df, "v", edges, props.toSeq)
        assert(math.abs(self) < 1e-9)
        val re = TableChecks.psi(df.repartition(5), "v", edges, props.toSeq)
        assert(math.abs(re - self) < 1e-12)
      }
    }
  }

  test("two-sample KS: identity = 0, bounded in [0,1], detects shift") {
    val xs = (1 to 200).map(_.toDouble)
    val df = xs.toDF("v")
    assert(TableChecks.ksTwoSample(df, "v", df, "v") == 0.0)
    val shifted = xs.map(_ + 150.0).toDF("v")
    val ks = TableChecks.ksTwoSample(df, "v", shifted, "v")
    assert(ks > 0.5 && ks <= 1.0)
  }

  test("uniqueness under extreme key skew: one key holds half the table (salted ≡ naive)") {
    // 200k rows, key 7 appears 100k times — the mega-hot-key shape that
    // breaks naive shuffles; partial-agg (and the explicit salted two-phase)
    // must both return the exact duplicate set
    val df = spark.range(200000)
      .select(when(col("id") % 2 === 0, lit(7L)).otherwise(col("id")).as("k"))
    val naive = TableChecks.duplicateKeys(df, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 100000 even ids map to 7, plus id=7 itself (odd) → 100001
    assert(naive == Set((7L, 100001L)))
    val salted = TableChecks.saltedDuplicateKeys(df, Seq("k"), saltBuckets = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == naive)
  }

  test("referential violations: broadcast and sort-merge anti-join arms agree") {
    import graft.spec.ForeignKey
    val df = spark.range(50000).select((col("id") % 1000).as("fk"))
    val ref = spark.range(900).select(col("id").as("rk")) // keys 900..999 missing
    val bc = TableChecks.fkViolations(df,
        ForeignKey(Vector("fk"), "ref", Vector("rk"), broadcastRef = true), ref)
      .collect().map(_.toString).sorted
    val smj = TableChecks.fkViolations(df,
        ForeignKey(Vector("fk"), "ref", Vector("rk"), broadcastRef = false), ref)
      .collect().map(_.toString).sorted
    assert(bc.length == 100) // 100 missing keys, 50 rows each
    assert(bc.sameElements(smj))
  }

  test("static (typed columns) and dynamic (variant JSON) modes agree on shared keywords") {
    // the same logical instances validated twice: once as typed columns
    // (static compiler), once JSON-encoded (dynamic compiler) — per-row
    // verdicts must match. to_json omits SQL NULLs, which matches the
    // static NULL=absent convention exactly.
    val rows = (0 until 60).map { i =>
      (i.toLong,
        if (i % 7 == 0) null.asInstanceOf[java.lang.Long] else java.lang.Long.valueOf((i * 37) % 150 - 10),
        if (i % 5 == 0) null else s"${"h" * (i % 3)}ello-$i")
    }
    val df = rows.toDF("k", "a", "b")
    val shared =
      """"a":{"minimum":0,"maximum":100,"multipleOf":1},
         "b":{"minLength":7,"pattern":"^h"}"""
    val staticSuite = SuiteCompiler.compile(Spec.fromJson(
      s"""{"columns":{$shared}}"""), df.schema)
    val staticValid = graft.exec.Validator.annotate(df, staticSuite)
      .select("k", "valid").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val dyn = df.select(col("k"),
      to_json(struct(col("a"), col("b"))).as("j"))
    val dynSuite = SuiteCompiler.compile(Spec.fromJson(
      s"""{"columns":{"j":{"json":{"properties":{$shared}}}}}"""), dyn.schema)
    val dynValid = graft.exec.Validator.annotate(dyn, dynSuite)
      .select("k", "valid").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    rows.foreach { case (k, a, b) =>
      assert(staticValid(k) == dynValid(k),
        s"row $k (a=$a, b=$b): static=${staticValid(k)} dynamic=${dynValid(k)}")
    }
  }

  test("driver-side SpecShape interpreter ≡ engine dynamic compiler on shared keywords") {
    // the vocab-shape gate (SpecShape) and the dynamic JSON compiler are two
    // evaluators of the same spec language — they must agree per document,
    // or a family spec accepted at parse time could fail the same check at
    // run time (and vice versa)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val shapes = Seq(
      """{"type":"object","required":["a"],
          "properties":{"a":{"type":"integer","minimum":0,"maximum":50},
                        "b":{"type":"array","minItems":1,"items":{"type":"string","minLength":2}},
                        "c":{"enum":["x","y",3]}},
          "additionalProperties":false}""",
      """{"type":"object",
          "patternProperties":{"^n_":{"type":"number","exclusiveMinimum":0}},
          "dependentRequired":{"u":["v"]},
          "minProperties":1}""",
      """{"anyOf":[{"type":"string","pattern":"^ok"},
                   {"type":"object","required":["k"]}],
          "not":{"type":"boolean"}}""")
    val docs = Seq(
      """{"a":5}""", """{"a":-1}""", """{"a":5,"b":["hi","yo"]}""",
      """{"a":5,"b":[]}""", """{"a":5,"b":["x"]}""", """{"a":5,"c":"x"}""",
      """{"a":5,"c":3}""", """{"a":5,"c":"z"}""", """{"a":5,"zz":1}""",
      """{"a":3.0}""", """{"a":3.5}""", """{}""", """{"n_x":1.5}""",
      """{"n_x":0}""", """{"n_x":"s"}""", """{"u":1}""", """{"u":1,"v":2}""",
      """"ok-yes"""", """"nope"""", """{"k":1}""", """true""", """[1,2]""",
      """3""", """null""")
    shapes.foreach { shapeJson =>
      val shapeNode = graft.spec.SchemaNode.parse(mapper.readTree(shapeJson),
        Vector("json"))
      val df = docs.zipWithIndex.map { case (d, i) => (i, d) }.toDF("k", "j")
      val suite = SuiteCompiler.compile(Spec.fromJson(
        s"""{"columns":{"j":{"json":$shapeJson}}}"""), df.schema)
      val engine = graft.exec.Validator.annotate(df, suite)
        .select("k", "valid").collect().map(r => r.getInt(0) -> r.getBoolean(1)).toMap
      docs.zipWithIndex.foreach { case (d, i) =>
        val interp = graft.spec.SpecShape
          .violations(mapper.readTree(d), shapeNode).isEmpty
        assert(interp == engine(i),
          s"doc $d vs shape $shapeJson: interpreter=$interp engine=${engine(i)}")
      }
    }
  }

  test("distributed two-sample KS equals driver-exact KS over many partitions") {
    // enough distinct values to span several range partitions; deterministic
    // pseudo-random values (no Random: reproducibility)
    val av = (1 to 20000).map(i => ((i * 2654435761L) % 100003L).toDouble)
    val bv = (1 to 15000).map(i => ((i * 40503L) % 90001L).toDouble + (i % 2) * 0.5)
    val aDf = av.toDF("x").repartition(7)
    val bDf = bv.toDF("y").repartition(5)
    val got = TableChecks.ksTwoSample(aDf, "x", bDf, "y")
    // driver-exact sup |Fa - Fb| over the merged distinct-value grid
    val ca = av.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cb = bv.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val na = av.size.toDouble
    val nb = bv.size.toDouble
    var (cumA, cumB, sup) = (0L, 0L, 0.0)
    (ca.keySet ++ cb.keySet).toSeq.sorted.foreach { v =>
      cumA += ca.getOrElse(v, 0L)
      cumB += cb.getOrElse(v, 0L)
      sup = math.max(sup, math.abs(cumA / na - cumB / nb))
    }
    assert(math.abs(got - sup) < 1e-12, s"distributed $got vs exact $sup")
    // determinism across re-executions (spark_partition_id pitfalls)
    val again = TableChecks.ksTwoSample(aDf, "x", bDf, "y")
    assert(got == again)
  }

  test("simhash is partitioning-invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = graft.pipeline.Dedup.simhash16(docs.repartition(1), "doc_id", "text")
      .orderBy("k").collect().map(_.toString)
    val b = graft.pipeline.Dedup.simhash16(docs.repartition(9), "doc_id", "text")
      .orderBy("k").collect().map(_.toString)
    assert(a.sameElements(b))
  }
  test("multipleOf fast arms == big.Rat shortest-repr semantics (integer divisor)") {
    // the guarded fmod fast arm and the exact-rational arm must both agree
    // with the reference's semantics — big.Rat over the double's SHORTEST
    // decimal repr (fmt.Sprint, validator.go:519) — on every double:
    // integral, fractional, scale-12-boundary, huge, negative
    val gen = Gen.oneOf(
      Gen.chooseNum(-1000000L, 1000000L).map(_.toDouble),            // integral
      Gen.chooseNum(-1000000L, 1000000L).map(_ + 0.5),               // fractional
      Gen.chooseNum(-1000L, 1000L).map(_ + 4.9999999999996e-1),     // near-boundary
      Gen.chooseNum(1L, 1000L).map(_ * 9.007199254740992e15),       // > 2^53
      Gen.const(0.0), Gen.const(-15.0), Gen.const(1e30))
    val vals = Gen.listOfN(4000, gen)
      .apply(Gen.Parameters.default, Seed(42L)).get
    val df = vals.toDF("x")
    val suite = SuiteCompiler.compile(
      Spec.fromJson("""{"columns":{"x":{"multipleOf":5}}}"""), df.schema)
    val got = graft.exec.Validator.flag(df, suite).select("x", "valid").collect()
      .map(r => r.getDouble(0) -> r.getBoolean(1)).toMap
    vals.distinct.foreach { v =>
      // oracle: exact rational remainder of the shortest decimal repr —
      // Go's fmt.Sprint form (so e.g. 1e30, whose IEEE expansion ends
      // ...838656 and fmods to 1, is a CLEAN multiple of 5 as the rational
      // 10^30 the reference sees; likewise 4*2^53's shortest repr
      // ...68963970 IS a multiple of 5 though its exact integer value is
      // not). NOT legacy Double.toString, which prints the 17-digit exact
      // integer for the k*2^53 class — a different rational (JDK-4511638);
      // shortestDouble itself is pinned against the definitional
      // linear-scan oracle in its own test below.
      val expected =
        (BigDecimal(graft.functions.ExactRatPredExpr.shortestDouble(v)) % 5)
          .signum == 0
      assert(got(v) == expected, s"value $v: got ${got(v)}, want $expected")
    }
  }

  test("bound fast arms == big.Rat shortest-repr semantics (round-trip gate)") {
    // three bound classes: dyadic (0.25, old isExactDouble arm), decimal
    // round-trip but NOT dyadic (0.08 — the common human bound, must stay
    // native), and a full-IEEE-expansion bound that does NOT round-trip
    // (must take the exact arm: no double's shortest repr ever sits between
    // it and its neighbours' reprs the way the naive promote would assume)
    val bounds = Seq("0.25", "0.08", "0.1000000000000000055511151231257827")
    val gen = Gen.oneOf(
      Gen.chooseNum(-100L, 100L).map(_ * 0.01),
      Gen.chooseNum(-100L, 100L).map(_ * 0.08),
      Gen.const(0.08), Gen.const(0.1), Gen.const(0.25),
      Gen.const(java.lang.Math.nextUp(0.08)),
      Gen.const(java.lang.Math.nextDown(0.08)),
      Gen.const(java.lang.Math.nextUp(0.1)), Gen.const(0.0))
    val vals = Gen.listOfN(600, gen)
      .apply(Gen.Parameters.default, Seed(7L)).get.distinct
    val df = vals.toDF("x")
    bounds.foreach { b =>
      val suite = SuiteCompiler.compile(
        Spec.fromJson(s"""{"columns":{"x":{"maximum":$b,"minimum":-$b}}}"""),
        df.schema)
      val got = graft.exec.Validator.flag(df, suite).select("x", "valid")
        .collect().map(r => r.getDouble(0) -> r.getBoolean(1)).toMap
      val bRat = BigDecimal(b)
      vals.foreach { v =>
        val r = BigDecimal( // true shortest repr (== legacy on this range)
          graft.functions.ExactRatPredExpr.shortestDouble(v))
        val expected = r <= bRat && r >= -bRat
        assert(got(v) == expected,
          s"bound $b value $v (repr $r): got ${got(v)}, want $expected")
      }
    }
    // plan shape: the round-tripping 0.08 bound must stay NATIVE (no
    // exact_rat_pred in the plan) — this is the sf1 hot-path guarantee
    val fastSuite = SuiteCompiler.compile(
      Spec.fromJson("""{"columns":{"x":{"maximum":0.08}}}"""), df.schema)
    val plan = graft.exec.Validator.flag(df, fastSuite)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("exact_rat_pred"),
      "0.08 bound fell off the native fast arm:\n" + plan.take(2000))
  }

  test("FloatType bound fast arm: float round-trip gate vs big.Rat oracle") {
    // bound classes: dyadic float-exact (0.25), decimal float-round-trip
    // (0.08), and the FULL dyadic expansion of double(0.1f) — isExactDouble
    // TRUE, so the old promote-to-double arm compared value(0.1f) < B as
    // FALSE where the reference's shortest-repr rational 0.1 < B is TRUE;
    // the float round-trip gate must route it to the exact arm
    val vals: Seq[Float] = Seq(0.1f, 0.08f, 0.25f,
      java.lang.Math.nextUp(0.08f), java.lang.Math.nextDown(0.08f),
      0.0f, -0.1f, 0.05f)
    val df = vals.toDF("x")
    val dyadicOfFloat =
      new java.math.BigDecimal(0.1f.toDouble).toPlainString
    Seq("0.25", "0.08", dyadicOfFloat).foreach { b =>
      val suite = SuiteCompiler.compile(
        Spec.fromJson(s"""{"columns":{"x":{"exclusiveMaximum":$b}}}"""),
        df.schema)
      val got = graft.exec.Validator.flag(df, suite).select("x", "valid")
        .collect().map(r => r.getFloat(0) -> r.getBoolean(1)).toMap
      val bRat = BigDecimal(b)
      vals.foreach { v =>
        val expected = BigDecimal(
          graft.functions.ExactRatPredExpr.shortestFloat(v)) < bRat
        assert(got(v) == expected,
          s"bound $b value $v: got ${got(v)}, want $expected")
      }
    }
    // 0.08 round-trips through float → must stay native
    val fastSuite = SuiteCompiler.compile(
      Spec.fromJson("""{"columns":{"x":{"maximum":0.08}}}"""), df.schema)
    val plan = graft.exec.Validator.flag(df, fastSuite)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("exact_rat_pred"),
      "float 0.08 bound fell off the native fast arm:\n" + plan.take(2000))
  }

  test("shortestDouble == brute-force shortest correctly-rounded repr") {
    // Java 17's legacy Double.toString emits one excess digit for ~0.3% of
    // doubles (JDK-4511638): a DIFFERENT rational than the reference's
    // fmt.Sprint shortest repr. The scan-down implementation must match the
    // definitional oracle: smallest p whose half-even rounding of the exact
    // binary value round-trips.
    // definitional oracle: smallest p where SOME p-digit decimal parses
    // back to d. Any such decimal must bracket the exact binary value, so
    // the two p-digit neighbours are a complete candidate set; the spec
    // prefers the nearest (half-even) one when both round-trip.
    def neighbours(exact: java.math.BigDecimal, p: Int): Seq[java.math.BigDecimal] = {
      val near = exact.round(new java.math.MathContext(
        p, java.math.RoundingMode.HALF_EVEN))
      val down = exact.round(new java.math.MathContext(
        p, java.math.RoundingMode.DOWN))
      val other = if (near.compareTo(down) == 0)
        exact.round(new java.math.MathContext(p, java.math.RoundingMode.UP))
      else down
      Seq(near, other)
    }
    def oracle(d: Double): java.math.BigDecimal = {
      val exact = new java.math.BigDecimal(d)
      (1 to 18).iterator
        .flatMap(p => neighbours(exact, p).find(_.doubleValue() == d))
        .nextOption()
        .getOrElse(exact).stripTrailingZeros()
    }
    val rnd = new java.util.Random(20260818L)
    var legacyDiffers = 0
    var i = 0
    while (i < 20000) {
      val d = java.lang.Double.longBitsToDouble(rnd.nextLong())
      if (!d.isNaN && !d.isInfinite) {
        val got = graft.functions.ExactRatPredExpr.shortestDouble(d)
        val want = oracle(d)
        assert(got.compareTo(want) == 0, s"d=$d got=$got want=$want")
        // every result must itself round-trip
        assert(got.doubleValue() == d, s"no round trip: d=$d got=$got")
        if (new java.math.BigDecimal(java.lang.Double.toString(d))
              .compareTo(got) != 0) legacyDiffers += 1
      }
      i += 1
    }
    // the sample must actually exercise the legacy-divergence class
    assert(legacyDiffers > 10, s"sample too tame: $legacyDiffers diverging")
    // float arm: same property at float precision
    def oracleF(f: Float): java.math.BigDecimal = {
      val exact = new java.math.BigDecimal(f.toDouble)
      (1 to 10).iterator
        .flatMap(p => neighbours(exact, p).find(_.floatValue() == f))
        .nextOption()
        .getOrElse(exact).stripTrailingZeros()
    }
    i = 0
    while (i < 20000) {
      val f = java.lang.Float.intBitsToFloat(rnd.nextInt())
      if (!f.isNaN && !f.isInfinite) {
        val got = graft.functions.ExactRatPredExpr.shortestFloat(f)
        assert(got.compareTo(oracleF(f)) == 0, s"f=$f got=$got")
        assert(got.floatValue() == f, s"no round trip: f=$f got=$got")
      }
      i += 1
    }
    // zeroes: rational 0 either sign
    assert(graft.functions.ExactRatPredExpr.shortestDouble(-0.0)
      .compareTo(java.math.BigDecimal.ZERO) == 0)
    assert(graft.functions.ExactRatPredExpr.shortestFloat(-0.0f)
      .compareTo(java.math.BigDecimal.ZERO) == 0)
  }

  test("legacy-repr divergence class: verdicts follow the TRUE shortest repr") {
    // d's legacy Java repr is 5.7223519193314771E17 (17 digits) but the
    // shortest round-tripping repr — what Go's fmt.Sprint prints and the
    // reference feeds big.Rat — is 5.722351919331477E17 (16). A schema
    // whose constant IS that shortest rational must treat d as EQUAL.
    val d = java.lang.Double.parseDouble("5.722351919331477E17")
    assert(java.lang.Double.toString(d) == "5.7223519193314771E17",
      "pinned double no longer exercises the legacy-excess-digit class")
    val df = Seq(d).toDF("x")
    def valid(spec: String): Boolean =
      graft.exec.Validator.flag(df,
        SuiteCompiler.compile(Spec.fromJson(spec), df.schema))
        .select("valid").collect().head.getBoolean(0)
    val s = "5.722351919331477E17"
    assert(valid(s"""{"columns":{"x":{"const":$s}}}"""),
      "const == true-shortest repr must match (reference big.Rat equality)")
    assert(valid(s"""{"columns":{"x":{"minimum":$s}}}"""))
    assert(valid(s"""{"columns":{"x":{"maximum":$s}}}"""))
    assert(!valid(s"""{"columns":{"x":{"exclusiveMinimum":$s}}}"""))
    assert(valid(s"""{"columns":{"x":{"multipleOf":$s}}}"""))
    // and the legacy 17-digit text is a DIFFERENT rational: not equal
    val legacy = "5.7223519193314771E17"
    assert(!valid(s"""{"columns":{"x":{"const":$legacy}}}"""))
    assert(valid(s"""{"columns":{"x":{"maximum":$legacy}}}"""),
      "d's shortest repr is BELOW the legacy rational")
  }

  test("other-neighbour shortest-repr class: near candidate fails, the away neighbour round-trips") {
    // For ~0.05% of full-exponent-range doubles the half-even-NEAREST
    // p-digit candidate does not round-trip while the p-digit neighbour on
    // the other side does — the shortest repr is that neighbour, and
    // stopping at the nearest one (the pre-fix scan) returns a LONGER repr
    // that is a different rational, flipping verdicts vs the reference.
    val d = java.lang.Double.parseDouble("7.1202363472230444E-307")
    val short = "7.120236347223045E-307" // 16 digits, parses back to d
    assert(java.lang.Double.parseDouble(short) == d,
      "pinned double no longer exercises the other-neighbour class")
    assert(graft.functions.ExactRatPredExpr.shortestDouble(d)
      .compareTo(new java.math.BigDecimal(short)) == 0)
    val df = Seq(d).toDF("x")
    def valid(spec: String): Boolean =
      graft.exec.Validator.flag(df,
        SuiteCompiler.compile(Spec.fromJson(spec), df.schema))
        .select("valid").collect().head.getBoolean(0)
    assert(valid(s"""{"columns":{"x":{"const":$short}}}"""),
      "const == the true shortest repr must match (reference big.Rat equality)")
    assert(valid(s"""{"columns":{"x":{"minimum":$short}}}"""))
  }

  test("huge-exponent schema bounds compile without materializing the digit expansion") {
    // 1e999999999 is a legal JSON number the reference holds as an exact
    // rational; serializing it via toPlainString would attempt a ~10^9-char
    // string at compile time. The operand must stay in scientific notation.
    val df = Seq(1.5d, -2.0d).toDF("x")
    val suite = SuiteCompiler.compile(Spec.fromJson(
      """{"columns":{"x":{"maximum":1e999999999,"minimum":-1e999999999}}}"""),
      df.schema)
    val ok = graft.exec.Validator.flag(df, suite)
      .select("valid").collect().map(_.getBoolean(0)).toSeq
    assert(ok == Seq(true, true))
  }

  test("VariantCanonExpr renders nested numbers by Spark's OWN storage class") {
    // True differential over the deep canon: Spark's schema_of_variant
    // classifies each generated number text's storage (DECIMAL/BIGINT vs
    // DOUBLE — the engine does not re-derive the rule), and the
    // variant-binary walk's rendering must match the per-class canon:
    // digit-exact stripTrailingZeros for decimal/integer storage, shortest
    // correctly-rounded repr for double storage. Catches both a wrong walk
    // and a wrong storage-rule assumption (e.g. if a Spark upgrade started
    // decimal-storing exponent notation, the expectation flips with it).
    import org.scalacheck.Gen
    val digits = Gen.chooseNum(1, 42).flatMap(n =>
      Gen.listOfN(n, Gen.numChar).map(_.mkString))
    val numText: Gen[String] = for {
      sign <- Gen.oneOf("", "-")
      intPart <- digits.map(_.dropWhile(_ == '0')).map(s => if (s.isEmpty) "0" else s)
      frac <- Gen.option(digits)
      exp <- Gen.frequency(
        2 -> Gen.const(""),
        1 -> Gen.chooseNum(-45, 45).map(e => s"e$e"),
        1 -> Gen.chooseNum(-45, 45).map(e => s"E+$e".replace("+-", "-")))
      extra <- Gen.oneOf(true, false)
    } yield {
      val base = sign + intPart + frac.map("." + _).getOrElse("") + exp
      if (extra && exp.isEmpty && frac.isEmpty) base + ".0" else base
    }
    val texts = (Gen.listOfN(3000, numText)
      .apply(Gen.Parameters.default, Seed(99L)).get ++ Seq(
        "3.602879701896397e16", "3.6028797018963968e16", "36028797018963968",
        "1e40", "-1e-40", "0.1000000000000000055511151231257827021181583404541015625",
        "5.722351919331477E17", "5.7223519193314771E17", "0", "-0.0", "0e5",
        "1" + "0" * 39, "9" * 39, "9" * 38)).distinct
      .filter(t => { val d = java.lang.Double.parseDouble(t)
        !d.isInfinite && !d.isNaN }) // variant double storage can't hold ±Inf
    val df = texts.toDF("t")
    val got = df.select(col("t"),
        graft.functions.VariantCanonExpr.col(
          parse_json(concat(lit("["), col("t"), lit("]")))),
        schema_of_variant(parse_json(col("t"))))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    got.foreach { case (t, canon, storage) =>
      val expected =
        if (storage == "DOUBLE")
          graft.functions.ExactRatPredExpr
            .shortestDouble(java.lang.Double.parseDouble(t)).toString
        else if (storage.startsWith("DECIMAL") || storage == "BIGINT" ||
                 storage == "INT" || storage == "SMALLINT" || storage == "TINYINT")
          new java.math.BigDecimal(t).stripTrailingZeros().toString
        else fail(s"unexpected variant storage $storage for $t")
      assert(canon == s"[$expected]",
        s"text $t (storage $storage): canon $canon, want [$expected]")
    }
    // the generator must actually exercise both storage classes
    assert(got.exists(_._3 == "DOUBLE") &&
      got.exists(_._3.startsWith("DECIMAL")) && got.exists(_._3 == "BIGINT"))
  }

  test("Go-lex range guard: no false rejects on any finite-double text") {
    // the guard rejects numbers outside finite double range; it must ACCEPT
    // every rendering of every finite double (legacy toString, shortest
    // repr, exact binary expansion, uppercase-E, padded zeros) — a false
    // reject would fail !parse on a document the reference accepts
    import org.scalacheck.Gen
    val dGen = Gen.oneOf(
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(java.lang.Double.longBitsToDouble),
      Gen.chooseNum(-1e308, 1e308),
      Gen.oneOf(java.lang.Double.MAX_VALUE, java.lang.Double.MIN_VALUE,
        java.lang.Double.MIN_NORMAL, 0.0, -0.0, 1e-300, 9.99e307))
    val ds = Gen.listOfN(4000, dGen)
      .apply(Gen.Parameters.default, Seed(123L)).get
      .filter(d => !d.isNaN && !d.isInfinite)
    def lexOk(t: String): Boolean = graft.functions.JsonGoLexExpr.goLexOk(
      org.apache.spark.unsafe.types.UTF8String.fromString(t))
    ds.foreach { d =>
      val renders = Seq(
        java.lang.Double.toString(d),
        graft.functions.ExactRatPredExpr.shortestDouble(d).toString,
        new java.math.BigDecimal(d).toPlainString,
        java.lang.Double.toString(d).toUpperCase,
        s"[${java.lang.Double.toString(d)}, 1]",
        s"""{"x":${java.lang.Double.toString(d)}}""")
      renders.foreach { t =>
        assert(lexOk(t), s"false reject of finite double $d as $t")
      }
    }
    // and the refusal class: every rendering beyond the range is rejected
    Seq("1e999", "-1e999", "2e308", "1.7976931348623159e308", "1e-999",
      "1e-325", "2e-324", "0.001e312", "1000e306", "[1, 2e308]",
      """{"deep":[{"x":-3e308}]}""").foreach { t =>
      assert(!lexOk(t), s"missed out-of-range number in $t")
    }
  }

  test("Go-lex range guard: EXACT strconv accept set at the IEEE boundaries") {
    // ground truth: Java's parseDouble is correctly-rounded IEEE like Go's
    // strconv — a text is in the float64 accept set iff it parses finite
    // and does not underflow a nonzero value to zero (both are ErrRange
    // in Go, loud refusals in the reference)
    def lexOk(t: String): Boolean = graft.functions.JsonGoLexExpr.goLexOk(
      org.apache.spark.unsafe.types.UTF8String.fromString(t))
    def strconvOk(t: String): Boolean = {
      val d = java.lang.Double.parseDouble(t)
      val zeroText = new java.math.BigDecimal(t).signum() == 0
      !d.isInfinite && (d != 0.0 || zeroText)
    }
    // the former sub-ulp band, exact midpoints, ties, and both sides of
    // each boundary — every case must match strconv exactly
    val overMid = new java.math.BigDecimal( // 2^1024 - 2^970
      java.math.BigInteger.ONE.shiftLeft(1024)
        .subtract(java.math.BigInteger.ONE.shiftLeft(970)))
    val underMid = java.math.BigDecimal.ONE.divide( // 2^-1075, exact
      new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(1075)))
    val cases = Seq(
      "1.7976931348623157e308",   // MaxValue: finite
      "1.7976931348623158e308",   // in the sub-ulp band: rounds DOWN, finite
      "1.797693134862315807e308", // still below the midpoint: finite
      overMid.toString,           // exact tie: half-even -> Inf (reject)
      overMid.toPlainString,      // same tie, plain rendering
      "1.7976931348623159e308",   // above: Inf (reject)
      "17976931348623158.08e292", // band value, shifted rendering
      "4.9e-324",                 // min subnormal: accepted
      "2.5e-324",                 // above 2^-1075: rounds to subnormal
      "2.4703282292062328e-324",  // just above the midpoint: subnormal
      underMid.toString,          // exact tie: rounds to 0 (reject)
      underMid.toPlainString,
      "2.4703282292062327e-324",  // just below: rounds to 0 (reject)
      "2.4703282292062326e-324",
      "2e-324", "1e-324",
      "0e999", "0.000e-999", "-0e308", // zeros at any exponent: accepted
      overMid.subtract(new java.math.BigDecimal("1e280")).toString, // < mid
      underMid.add(new java.math.BigDecimal("1e-1080")).toPlainString, // > mid
      underMid.subtract(new java.math.BigDecimal("1e-1080")).toPlainString)
    cases.foreach { t =>
      assert(lexOk(t) == strconvOk(t),
        s"guard=${lexOk(t)} strconv=${strconvOk(t)} for $t")
    }
    // randomized band sweep: perturb the two midpoints by tiny exact deltas
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      val dOver = new java.math.BigDecimal(rnd.nextInt(2000) - 1000)
        .multiply(new java.math.BigDecimal("1e281"))
      val tO = overMid.add(dOver).toString
      assert(lexOk(tO) == strconvOk(tO), s"over-band mismatch for $tO")
      val dUnder = new java.math.BigDecimal(rnd.nextInt(2000) - 1000)
        .multiply(new java.math.BigDecimal("1e-1079"))
      val tU = underMid.add(dUnder).toPlainString
      assert(lexOk(tU) == strconvOk(tU), s"under-band mismatch for $tU")
    }
  }
}
