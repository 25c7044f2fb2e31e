package graft

import graft.compile.SuiteCompiler
import graft.spec.Spec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized DIFFERENTIAL fuzz: the typed compiler (static columns) and the
  * dynamic compiler (variant JSON) are two independent evaluators of the
  * same spec language. For every keyword both can express, the same logical
  * instance must get the same verdict from both — the engine's strongest
  * self-check against the reference semantics short of running the Go
  * binary (the reference's single validator plays the role of the agreed
  * third semantics; each compiler is separately conformance-pinned to it,
  * so a typed/dynamic disagreement means at least one side diverged).
  *
  * Instances are flat rows (long, double, string, array<double>) JSON-encoded
  * on the driver for the dynamic side, omitting null fields (the typed
  * NULL=absent convention), with doubles rendered via
  * ExactRatPredExpr.shortestDouble — the same shortest-repr rational the
  * typed exact arms see. Spark's to_json is NOT used: it routes doubles
  * through Jackson's legacy Double.toString, whose excess-digit class
  * (JDK-4511638, ~0.3% of doubles) encodes a DIFFERENT rational than the
  * double's shortest repr, making typed and dynamic verdicts legitimately
  * disagree on text the engine never chose. Generators aim at the precision
  * and vacuousness cliffs: one-ulp bound neighbours, full-expansion
  * constants, >2^53 integrals (including 4*2^53, whose shortest repr IS a
  * multiple of 5 though its exact integer value is not), duplicate-bearing
  * arrays, empty strings/arrays, nulls.
  *
  * Pinned seeds (offline cache has no scalatestplus bridge); 40 random
  * specs x 48 rows per run.
  */
class DifferentialFuzzSpec extends SparkTestBase {
  import spark.implicits._

  // ---- random spec fragments per column type ----

  private val longKw: Gen[String] = Gen.oneOf(
    Gen.chooseNum(-50L, 150L).map(b => s""""minimum":$b"""),
    Gen.chooseNum(-50L, 150L).map(b => s""""maximum":$b"""),
    Gen.chooseNum(-50L, 150L).map(b => s""""exclusiveMinimum":$b"""),
    Gen.oneOf(2L, 3L, 5L, 7L).map(m => s""""multipleOf":$m"""),
    Gen.oneOf("0.5", "2.5", "0.01").map(m => s""""multipleOf":$m"""),
    Gen.chooseNum(-5L, 5L).map(c => s""""const":$c"""),
    Gen.const(""""enum":[1,2,3,9007199254740993]"""),
    Gen.const(""""type":"integer""""))

  private val doubleBoundLit: Gen[String] = Gen.oneOf(
    "0.08", "0.1", "0.25", "1e-3", "2.5", "100",
    "0.1000000000000000055511151231257827", // full expansion of double(0.1)
    "0.09999999999999999",
    "3.602879701896397e16",  // shortest repr of 4*2^53 (round-trips: native)
    "36028797018963968")     // 4*2^53 exact integer text: a DIFFERENT
                             // rational than that double's shortest repr
                             // (legacy-excess-digit class) — exact arm

  private val doubleKw: Gen[String] = Gen.oneOf(
    doubleBoundLit.map(b => s""""minimum":$b"""),
    doubleBoundLit.map(b => s""""maximum":$b"""),
    doubleBoundLit.map(b => s""""exclusiveMaximum":$b"""),
    Gen.oneOf("1", "5", "0.5", "1e-12").map(m => s""""multipleOf":$m"""),
    Gen.oneOf("0.1", "2", "2.0", "-0.5").map(c => s""""const":$c"""),
    Gen.const(""""enum":[0.1,2,30.5]"""),
    Gen.const(""""type":"integer""""))

  private val stringKw: Gen[String] = Gen.oneOf(
    Gen.chooseNum(0, 6).map(n => s""""minLength":$n"""),
    Gen.chooseNum(0, 6).map(n => s""""maxLength":$n"""),
    Gen.oneOf("^a", "b$", "^[a-z-]+$", "x").map(p => s""""pattern":"$p""""),
    Gen.const(""""enum":["","a","ab-9","hello"]"""),
    Gen.const(""""const":"ab-9""""),
    // a lone-surrogate ESCAPE in the spec document: both compilers must
    // read it as U+FFFD (SurrogateCanon ahead of the schema parse), so a
    // data string holding the real replacement char matches on both sides
    Gen.const(""""const":"\\ud800""""),
    Gen.const(""""enum":["�","a�b"]"""),
    Gen.const(""""format":"ipv4""""))

  private val arrayKw: Gen[String] = Gen.oneOf(
    Gen.chooseNum(0, 3).map(n => s""""minItems":$n"""),
    Gen.chooseNum(0, 3).map(n => s""""maxItems":$n"""),
    Gen.const(""""uniqueItems":true"""),
    doubleBoundLit.map(b => s""""items":{"minimum":$b}"""),
    doubleBoundLit.map(b => s""""contains":{"maximum":$b}"""),
    Gen.const(""""prefixItems":[{"minimum":0},{"multipleOf":1}]"""))

  /** 1-2 keywords for a column, optionally wrapped in composition. */
  private def colSpec(kw: Gen[String]): Gen[String] = for {
    k1 <- kw
    extra <- Gen.option(kw)
    body = (Seq(k1) ++ extra.toSeq).distinct.mkString(",")
    wrapped <- Gen.frequency(
      5 -> Gen.const(s"{$body}"),
      1 -> Gen.const(s"""{"allOf":[{$body}]}"""),
      1 -> kw.map(k2 => s"""{"anyOf":[{$body},{$k2}]}"""),
      1 -> Gen.const(s"""{"not":{"not":{$body}}}"""),
      1 -> kw.map(k2 => s"""{"if":{$k2},"then":{$body}}"""))
  } yield wrapped

  private val specGen: Gen[(String, String, String, String)] = for {
    a <- colSpec(longKw)
    d <- colSpec(doubleKw)
    s <- colSpec(stringKw)
    r <- colSpec(arrayKw)
  } yield (a, d, s, r)

  // ---- random rows aimed at the cliffs ----

  private val longGen: Gen[java.lang.Long] = Gen.frequency(
    6 -> Gen.chooseNum(-60L, 160L).map(java.lang.Long.valueOf),
    1 -> Gen.oneOf(Seq(0L, -1L, 9007199254740992L, 9007199254740993L,
      Long.MaxValue, Long.MinValue + 1).map(java.lang.Long.valueOf)),
    1 -> Gen.const(null.asInstanceOf[java.lang.Long]))

  private val doubleGen: Gen[java.lang.Double] = Gen.frequency(
    5 -> Gen.oneOf(Seq(0.0, 0.08, 0.1, 0.25, 2.0, 2.5, 30.5, 100.0, -0.5,
      1.0000000000001, 0.09999999999999999, 0.10000000000000002,
      java.lang.Math.nextUp(0.08), 1e-12, 5e-13, 1e30, -15.0, 4.0, 5.0,
      3.602879701896397e16,   // 4*2^53: legacy-excess-digit repr class
      5.722351919331477e17)   // 17-digit legacy vs 16-digit shortest class
      .map(java.lang.Double.valueOf)),
    2 -> Gen.chooseNum(-50, 150).map(n => java.lang.Double.valueOf(n.toDouble)),
    1 -> Gen.chooseNum(-500, 1500).map(n =>
      java.lang.Double.valueOf(n / 10.0)),
    1 -> Gen.const(null.asInstanceOf[java.lang.Double]))

  private val stringGen: Gen[String] = Gen.frequency(
    8 -> Gen.oneOf("", "a", "ab-9", "abc", "hello", "b", "xxb", "AB",
      "1.2.3.4", "999.1.1.1", "héllo",
      // U+FFFD data — what a lone-surrogate escape decodes to on both
      // sides (a RAW lone surrogate is not representable in UTF-8, so
      // the replacement char IS the whole observable class)
      "�", "a�b"),
    1 -> Gen.const(null))

  private val doubleGenNN: Gen[java.lang.Double] = Gen.oneOf(
    Seq(0.0, 0.08, 0.1, 0.25, 2.0, 2.5, 30.5, -0.5, 1.0000000000001,
      0.10000000000000002, 1e-12, 1e30, 4.0, 5.0, 7.5, 150.0,
      3.602879701896397e16)
      .map(java.lang.Double.valueOf))

  private val arrayGen: Gen[Seq[java.lang.Double]] = Gen.frequency(
    3 -> Gen.listOfN(3, Gen.oneOf(Seq(0.1, 2.0, 2.0, 0.08, -1.0, 1e30)
      .map(java.lang.Double.valueOf))),
    2 -> Gen.listOfN(2, doubleGenNN),
    1 -> Gen.const(Seq.empty[java.lang.Double]),
    1 -> Gen.const(Seq(2.0, 2.0).map(java.lang.Double.valueOf)),
    1 -> Gen.const(null.asInstanceOf[Seq[java.lang.Double]]))

  private val rowGen: Gen[(java.lang.Long, java.lang.Double, String, Seq[java.lang.Double])] =
    for { a <- longGen; d <- doubleGen; s <- stringGen; r <- arrayGen }
      yield (a, d, s, r)

  // driver-side JSON encoder for the dynamic arm: null fields omitted,
  // doubles rendered via shortestDouble (see class doc — to_json's legacy
  // Jackson double encoding is a different rational on the excess-digit
  // class, which would make the two compilers disagree on text the engine
  // never chose)
  private val jm = new com.fasterxml.jackson.databind.ObjectMapper()
  private def shortestNode(d: java.lang.Double) =
    com.fasterxml.jackson.databind.node.DecimalNode.valueOf(
      graft.functions.ExactRatPredExpr.shortestDouble(d.doubleValue()))
  private def encodeRow(a: java.lang.Long, d: java.lang.Double, s: String,
                        r: Seq[java.lang.Double]): String = {
    val o = jm.createObjectNode()
    if (a != null) o.put("a", a.longValue())
    if (d != null) o.set[com.fasterxml.jackson.databind.JsonNode](
      "d", shortestNode(d))
    if (s != null) o.put("s", s)
    if (r != null) {
      val arr = o.putArray("r")
      r.foreach { e =>
        if (e == null) arr.addNull() else { arr.add(shortestNode(e)); () }
      }
    }
    jm.writeValueAsString(o)
  }

  test("typed and dynamic compilers agree on 40 random specs x 48 edge rows") {
    // GRAFT_FUZZ_SPECS widens the campaign for one-off deep hunts
    val nSpecs = sys.env.getOrElse("GRAFT_FUZZ_SPECS", "40").toInt
    val seedBase = 20260818L
    (1 to nSpecs).foreach { i =>
      val (sa, sd, ss, sr) =
        specGen.apply(Gen.Parameters.default, Seed(seedBase + i))
          .getOrElse(fail("spec gen failed"))
      val rows = Gen.listOfN(48, rowGen)
        .apply(Gen.Parameters.default, Seed(seedBase * 7 + i))
        .getOrElse(fail("row gen failed"))
        .zipWithIndex.map { case ((a, d, s, r), k) => (k.toLong, a, d, s, r) }
      val df = rows.toDF("k", "a", "d", "s", "r")

      val shared =
        s""""a":$sa,"d":$sd,"s":$ss,"r":$sr"""
      val typedSuite = SuiteCompiler.compile(
        Spec.fromJson(s"""{"columns":{$shared}}"""), df.schema)
      val typedValid = graft.exec.Validator.annotate(df, typedSuite)
        .select("k", "valid").collect()
        .map(x => x.getLong(0) -> x.getBoolean(1)).toMap

      val dyn = rows.map { case (k, a, d, s, r) => (k, encodeRow(a, d, s, r)) }
        .toDF("k", "j")
      val dynSuite = SuiteCompiler.compile(
        Spec.fromJson(
          s"""{"columns":{"j":{"json":{"properties":{$shared}}}}}"""),
        dyn.schema)
      val dynValid = graft.exec.Validator.annotate(dyn, dynSuite)
        .select("k", "valid").collect()
        .map(x => x.getLong(0) -> x.getBoolean(1)).toMap

      rows.foreach { case (k, a, d, s, r) =>
        assert(typedValid(k) == dynValid(k),
          s"spec #$i {$shared}\nrow k=$k a=$a d=$d s=$s r=$r: " +
            s"typed=${typedValid(k)} dynamic=${dynValid(k)}")
      }
    }
  }
}
