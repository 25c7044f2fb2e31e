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
  * via to_json for the dynamic side; to_json omits SQL NULLs, which matches
  * the typed NULL=absent convention. Generators aim at the precision and
  * vacuousness cliffs: one-ulp bound neighbours, full-expansion constants,
  * >2^53 integrals, duplicate-bearing arrays, empty strings/arrays, nulls.
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
    "0.09999999999999999")

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
      java.lang.Math.nextUp(0.08), 1e-12, 5e-13, 1e30, -15.0, 4.0, 5.0)
      .map(java.lang.Double.valueOf)),
    2 -> Gen.chooseNum(-50, 150).map(n => java.lang.Double.valueOf(n.toDouble)),
    1 -> Gen.chooseNum(-500, 1500).map(n =>
      java.lang.Double.valueOf(n / 10.0)),
    1 -> Gen.const(null.asInstanceOf[java.lang.Double]))

  private val stringGen: Gen[String] = Gen.frequency(
    8 -> Gen.oneOf("", "a", "ab-9", "abc", "hello", "b", "xxb", "AB",
      "1.2.3.4", "999.1.1.1", "héllo"),
    1 -> Gen.const(null))

  private val doubleGenNN: Gen[java.lang.Double] = Gen.oneOf(
    Seq(0.0, 0.08, 0.1, 0.25, 2.0, 2.5, 30.5, -0.5, 1.0000000000001,
      0.10000000000000002, 1e-12, 1e30, 4.0, 5.0, 7.5, 150.0)
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

      val dyn = df.select(col("k"),
        to_json(struct(col("a"), col("d"), col("s"), col("r"))).as("j"))
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
