package graft

import graft.compile.SuiteCompiler
import graft.spec.Spec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import scala.jdk.CollectionConverters._

/** NESTED-structure differential fuzz — the object/array keyword surface
  * through both compilers (see [[DifferentialFuzzSpec]] for the flat-row
  * campaign and the rationale: typed-vs-dynamic agreement is the engine's
  * strongest self-check against the reference semantics short of running
  * the Go binary).
  *
  * The typed side validates a STRUCT column
  * `o: struct<x:long, y:string, arr:array<double>, sub:struct<p:long,
  * q:string>>` (NULL field = absent, the engine's convention); the dynamic
  * side validates the same logical instance as variant JSON with null
  * fields omitted and doubles rendered via shortestDouble (the rational
  * both exact arms see). Spec fragments aim at the code paths the flat
  * fuzz cannot reach: required / dependentRequired / dependentSchemas /
  * min-maxProperties / propertyNames / additionalProperties=false /
  * unevaluatedProperties=false under anyOf-oneOf branches (the runtime
  * branch-set column algebra) / contains+minContains / uniqueItems over
  * nested arrays / object-level composition (allOf, anyOf, oneOf, not,
  * if-then-else) / whole-object const (deep structural equality,
  * /root/reference/util.go:286-329).
  */
class NestedDifferentialFuzzSpec extends SparkTestBase {

  // ---- spec fragments over the object column ----

  private val fieldNames = Seq("x", "y", "arr", "sub", "objs", "tags")

  private val requiredKw: Gen[String] = for {
    n <- Gen.chooseNum(1, 2)
    fs <- Gen.pick(n, fieldNames)
  } yield s""""required":[${fs.map(f => s""""$f"""").mkString(",")}]"""

  private val depRequiredKw: Gen[String] = Gen.oneOf(
    """"dependentRequired":{"x":["y"]}""",
    """"dependentRequired":{"y":["x","arr"]}""",
    """"dependentRequired":{"arr":["sub"],"sub":["x"]}""")

  private val depSchemasKw: Gen[String] = Gen.oneOf(
    """"dependentSchemas":{"y":{"required":["x"]}}""",
    """"dependentSchemas":{"x":{"properties":{"y":{"minLength":2}}}}""",
    """"dependentSchemas":{"sub":{"minProperties":2}}""")

  private val countKw: Gen[String] = Gen.oneOf(
    Gen.chooseNum(0, 3).map(n => s""""minProperties":$n"""),
    Gen.chooseNum(1, 4).map(n => s""""maxProperties":$n"""))

  // field names are x(1), y(1), arr(3), sub(3): maxLength 1-3 discriminates
  private val propNamesKw: Gen[String] =
    Gen.chooseNum(1, 3).map(n => s""""propertyNames":{"maxLength":$n}""")

  private val xSpec: Gen[String] = Gen.oneOf(
    Gen.chooseNum(-3L, 12L).map(b => s"""{"minimum":$b}"""),
    Gen.chooseNum(-3L, 12L).map(b => s"""{"maximum":$b}"""),
    Gen.oneOf(2L, 3L, 5L).map(m => s"""{"multipleOf":$m}"""),
    Gen.chooseNum(-2L, 6L).map(c => s"""{"const":$c}"""),
    Gen.const("""{"enum":[0,1,2.0,7]}"""))

  private val ySpec: Gen[String] = Gen.oneOf(
    Gen.chooseNum(0, 4).map(n => s"""{"minLength":$n}"""),
    Gen.chooseNum(0, 4).map(n => s"""{"maxLength":$n}"""),
    Gen.oneOf("^a", "b$", "^[a-z-]+$").map(p => s"""{"pattern":"$p"}"""),
    Gen.const("""{"const":"ab"}"""),
    Gen.const("""{"enum":["","a","ab","hello"]}"""))

  private val arrSpec: Gen[String] = Gen.oneOf(
    Gen.chooseNum(0, 3).map(n => s"""{"minItems":$n}"""),
    Gen.chooseNum(0, 3).map(n => s"""{"maxItems":$n}"""),
    Gen.const("""{"uniqueItems":true}"""),
    Gen.oneOf("0.1", "2.5", "-1").map(b => s"""{"items":{"minimum":$b}}"""),
    Gen.oneOf("0.1", "2.0").map(b =>
      s"""{"contains":{"maximum":$b},"minContains":1}"""),
    Gen.const("""{"contains":{"minimum":0},"maxContains":2}"""))

  private val subSpec: Gen[String] = Gen.oneOf(
    Gen.const("""{"required":["p"]}"""),
    Gen.chooseNum(-2L, 8L).map(b =>
      s"""{"properties":{"p":{"maximum":$b},"q":{"minLength":1}}}"""),
    Gen.const("""{"dependentRequired":{"p":["q"]}}"""),
    Gen.const("""{"minProperties":1}"""),
    Gen.const("""{"propertyNames":{"pattern":"^[pq]$"}}"""))

  // object keywords applied PER ELEMENT of an array<struct> — a different
  // compile path than top-level struct columns (lambda-variable values
  // inside forall/exists), plus deep struct equality for uniqueItems
  private val objsSpec: Gen[String] = Gen.oneOf(
    Gen.const("""{"items":{"required":["m"]}}"""),
    Gen.chooseNum(-2L, 8L).map(b =>
      s"""{"items":{"properties":{"m":{"minimum":$b}}}}"""),
    Gen.const("""{"contains":{"required":["n"]},"minContains":1}"""),
    Gen.const("""{"items":{"dependentRequired":{"m":["n"]}}}"""),
    Gen.const("""{"uniqueItems":true}"""),
    Gen.const("""{"items":{"additionalProperties":{"minimum":0}}}"""),
    Gen.const("""{"items":{"propertyNames":{"maxLength":1}},"minItems":1}"""))

  // map<string,long> field: the map object arm under NESTING (top-level map
  // columns are covered by ObjectArraySpec; here the map is a struct field)
  private val tagsSpec: Gen[String] = Gen.oneOf(
    Gen.const("""{"required":["ka"]}"""),
    Gen.chooseNum(-2L, 8L).map(b =>
      s"""{"properties":{"ka":{"minimum":$b}}}"""),
    Gen.const("""{"patternProperties":{"^k":{"multipleOf":2}}}"""),
    Gen.const("""{"properties":{"ka":{}},"additionalProperties":false}"""),
    Gen.const("""{"propertyNames":{"pattern":"^k[ab]$"}}"""),
    Gen.const("""{"minProperties":1}"""),
    Gen.const("""{"dependentRequired":{"ka":["kb"]}}"""))

  private val propertiesKw: Gen[String] = for {
    px <- xSpec // at least one entry, so the fragment is never empty
    py <- Gen.option(ySpec)
    pa <- Gen.option(arrSpec)
    ps <- Gen.option(subSpec)
    po <- Gen.option(objsSpec)
    pt <- Gen.option(tagsSpec)
    entries = Seq(Some(s""""x":$px"""),
      py.map(s => s""""y":$s"""),
      pa.map(s => s""""arr":$s"""), ps.map(s => s""""sub":$s"""),
      po.map(s => s""""objs":$s"""), pt.map(s => s""""tags":$s""")).flatten
  } yield s""""properties":{${entries.mkString(",")}}"""

  // additionalProperties over a subset: non-covered fields must be ABSENT
  // (typed: null) under false, or match the subschema (vacuous off-type)
  private val addPropsKw: Gen[String] = for {
    n <- Gen.chooseNum(2, 3)
    fs <- Gen.pick(n, fieldNames)
    ap <- Gen.oneOf("false", """{"minimum":5}""", """{"maxLength":3}""")
  } yield s""""properties":{${fs.map(f => s""""$f":{}""").mkString(",")}},""" +
    s""""additionalProperties":$ap"""

  // patternProperties with SEARCH-semantics regexes over the static field
  // names x, y, arr, sub ("r" hits arr, "u" hits sub, "^[xy]$" both scalars)
  private val patternPropsKw: Gen[String] = Gen.oneOf(
    """"patternProperties":{"^a":{"minItems":2}}""",
    """"patternProperties":{"r":{"uniqueItems":true}}""",
    """"patternProperties":{"^[xy]$":{"minimum":1}}""",
    """"patternProperties":{"u":{"required":["p"]}}""",
    """"properties":{"x":{}},"patternProperties":{"^a":{}},
       "additionalProperties":false""".replaceAll("\\s+", ""))

  // unevaluatedProperties=false where the evaluated set depends on WHICH
  // anyOf/oneOf branch validated — the runtime branch-set column algebra
  private val unevalKw: Gen[String] = Gen.oneOf(
    """"anyOf":[{"required":["x"],"properties":{"x":{},"y":{}}},
       {"required":["arr"],"properties":{"arr":{},"sub":{}}}],
       "unevaluatedProperties":false""",
    """"oneOf":[{"required":["y"],"properties":{"y":{}}},
       {"required":["sub"],"properties":{"sub":{},"x":{}}}],
       "properties":{"arr":{}},
       "unevaluatedProperties":false""",
    """"if":{"required":["x"]},
       "then":{"properties":{"x":{},"y":{},"arr":{}}},
       "else":{"properties":{"y":{},"sub":{}}},
       "unevaluatedProperties":false""")
    .map(_.replaceAll("\\s+", ""))

  private val baseKw: Gen[String] = Gen.frequency(
    3 -> propertiesKw,
    2 -> requiredKw,
    1 -> depRequiredKw,
    1 -> depSchemasKw,
    1 -> countKw,
    1 -> propNamesKw,
    1 -> addPropsKw,
    1 -> patternPropsKw,
    1 -> unevalKw,
    1 -> Gen.const(
      """"const":{"x":2,"y":"ab","arr":[0.1,2],"sub":{"p":1,"q":"a"}}"""))

  /** Top-level JSON keys of a fragment body — pairing two fragments is only
    * legal when their key sets are DISJOINT (duplicate keys in the composed
    * schema document would be last-wins and silently drop the first
    * fragment — legal JSON, but it would make the campaign weaker than it
    * looks).
    */
  private def topKeys(body: String): Set[String] = {
    val keys = scala.collection.mutable.Set[String]()
    jm.readTree(s"{$body}").fieldNames().forEachRemaining(k => { keys += k; () })
    keys.toSet
  }

  /** 1-2 object fragments (disjoint top-level keys), optionally under
    * composition. */
  private val objSpecGen: Gen[String] = for {
    k1 <- baseKw
    k2cand <- Gen.option(baseKw)
    k2 = k2cand.filter(c => (topKeys(k1) & topKeys(c)).isEmpty)
    body = (Seq(k1) ++ k2.toSeq).mkString(",")
    wrapped <- Gen.frequency(
      5 -> Gen.const(s"{$body}"),
      1 -> Gen.const(s"""{"allOf":[{$body}]}"""),
      1 -> baseKw.map(k3 => s"""{"anyOf":[{$body},{$k3}]}"""),
      1 -> baseKw.map(k3 => s"""{"oneOf":[{$body},{$k3}]}"""),
      1 -> Gen.const(s"""{"not":{"not":{$body}}}"""),
      1 -> baseKw.map(k3 => s"""{"if":{$k3},"then":{$body}}"""))
  } yield wrapped

  // ---- random instances aimed at presence/boundary cliffs ----

  private val xGen: Gen[java.lang.Long] = Gen.frequency(
    5 -> Gen.chooseNum(-3L, 12L).map(java.lang.Long.valueOf),
    1 -> Gen.oneOf(Seq(0L, 2L, 7L).map(java.lang.Long.valueOf)),
    3 -> Gen.const(null.asInstanceOf[java.lang.Long]))

  private val yGen: Gen[String] = Gen.frequency(
    6 -> Gen.oneOf("", "a", "ab", "ab-9", "hello", "b", "AB"),
    3 -> Gen.const(null))

  private val arrElem: Gen[java.lang.Double] = Gen.oneOf(
    Seq(0.1, 2.0, 2.5, -1.0, 0.0, 7.5).map(java.lang.Double.valueOf) :+
      null.asInstanceOf[java.lang.Double])

  private val arrGen: Gen[Seq[java.lang.Double]] = Gen.frequency(
    3 -> Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, arrElem)),
    1 -> Gen.const(Seq(2.0, 2.0).map(java.lang.Double.valueOf)),
    1 -> Gen.const(Seq.empty[java.lang.Double]),
    2 -> Gen.const(null.asInstanceOf[Seq[java.lang.Double]]))

  private val subGen: Gen[Row] = Gen.frequency(
    2 -> (for { p <- xGen; q <- yGen } yield Row(p, q)),
    1 -> Gen.const(Row(java.lang.Long.valueOf(1L), "a")),
    2 -> Gen.const(null.asInstanceOf[Row]))

  // array<struct> elements: m/n absent via null; whole-element JSON null too
  private val objsElem: Gen[Row] = Gen.frequency(
    4 -> (for { m <- xGen; nm <- yGen } yield Row(m, nm)),
    1 -> Gen.const(null.asInstanceOf[Row]))

  private val objsGen: Gen[Seq[Row]] = Gen.frequency(
    3 -> Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, objsElem)),
    1 -> Gen.const(Seq(Row(java.lang.Long.valueOf(1L), "a"),
      Row(java.lang.Long.valueOf(1L), "a"))), // duplicate structs
    1 -> Gen.const(Seq.empty[Row]),
    3 -> Gen.const(null.asInstanceOf[Seq[Row]]))

  // map values: JSON null value = key PRESENT with null value (distinct
  // from an absent key — unlike struct fields, where null = absent)
  private val tagsGen: Gen[Map[String, java.lang.Long]] = Gen.frequency(
    2 -> (for { a <- xGen; b <- xGen } yield Map("ka" -> a, "kb" -> b)),
    1 -> xGen.map(a => Map("ka" -> a)),
    1 -> xGen.map(b => Map("kb" -> b, "zz" -> b)),
    1 -> Gen.const(Map.empty[String, java.lang.Long]),
    3 -> Gen.const(null.asInstanceOf[Map[String, java.lang.Long]]))

  private val objGen: Gen[Row] = Gen.frequency(
    8 -> (for { x <- xGen; y <- yGen; a <- arrGen; s <- subGen
                os <- objsGen; tg <- tagsGen }
      yield Row(x, y, a, s, os, tg)),
    // the const instance, so whole-object const is satisfiable
    1 -> Gen.const(Row(java.lang.Long.valueOf(2L), "ab",
      Seq(0.1, 2.0).map(java.lang.Double.valueOf), Row(java.lang.Long.valueOf(1L), "a"),
      null, null)),
    1 -> Gen.const(null.asInstanceOf[Row]))

  private val typedSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("o", StructType(Seq(
      StructField("x", LongType),
      StructField("y", StringType),
      StructField("arr", ArrayType(DoubleType, containsNull = true)),
      StructField("sub", StructType(Seq(
        StructField("p", LongType),
        StructField("q", StringType)))),
      StructField("objs", ArrayType(StructType(Seq(
        StructField("m", LongType),
        StructField("n", StringType))), containsNull = true)),
      StructField("tags", MapType(StringType, LongType,
        valueContainsNull = true)))))))

  // driver-side JSON encoder: null fields omitted, doubles via
  // shortestDouble (see DifferentialFuzzSpec — to_json's legacy Jackson
  // double form is a different rational on the excess-digit class)
  private val jm = new com.fasterxml.jackson.databind.ObjectMapper()
  private def shortestNode(d: java.lang.Double) =
    com.fasterxml.jackson.databind.node.DecimalNode.valueOf(
      graft.functions.ExactRatPredExpr.shortestDouble(d.doubleValue()))

  private def encodeObj(o: Row): String = {
    val root = jm.createObjectNode()
    if (o != null) {
      val node = root.putObject("o")
      val x = o.get(0).asInstanceOf[java.lang.Long]
      val y = o.get(1).asInstanceOf[String]
      val a = o.get(2).asInstanceOf[Seq[java.lang.Double]]
      val s = o.get(3).asInstanceOf[Row]
      if (x != null) node.put("x", x.longValue())
      if (y != null) node.put("y", y)
      if (a != null) {
        val arr = node.putArray("arr")
        a.foreach { e =>
          if (e == null) arr.addNull() else { arr.add(shortestNode(e)); () }
        }
      }
      if (s != null) {
        val sn = node.putObject("sub")
        val p = s.get(0).asInstanceOf[java.lang.Long]
        val q = s.get(1).asInstanceOf[String]
        if (p != null) sn.put("p", p.longValue())
        if (q != null) sn.put("q", q)
      }
      val os = o.get(4).asInstanceOf[Seq[Row]]
      if (os != null) {
        val arr = node.putArray("objs")
        os.foreach { e =>
          if (e == null) { arr.addNull(); () }
          else {
            val en = arr.addObject()
            val m = e.get(0).asInstanceOf[java.lang.Long]
            val nm = e.get(1).asInstanceOf[String]
            if (m != null) en.put("m", m.longValue())
            if (nm != null) en.put("n", nm)
          }
        }
      }
      val tg = o.get(5).asInstanceOf[Map[String, java.lang.Long]]
      if (tg != null) {
        val tn = node.putObject("tags")
        // deterministic key order (semantically irrelevant; keeps failures
        // reproducible); a null map VALUE encodes as JSON null — the key is
        // present, unlike a null struct field
        tg.toSeq.sortBy(_._1).foreach { case (k2, v2) =>
          if (v2 == null) tn.putNull(k2) else { tn.put(k2, v2.longValue()); () }
        }
      }
    }
    jm.writeValueAsString(root)
  }

  test("typed and dynamic compilers agree on 30 random OBJECT specs x 40 nested rows") {
    val nSpecs = sys.env.getOrElse("GRAFT_FUZZ_SPECS", "30").toInt
    val seedBase = 20260819L
    (1 to nSpecs).foreach { i =>
      val objSpec = objSpecGen
        .apply(Gen.Parameters.default, Seed(seedBase + i))
        .getOrElse(fail("spec gen failed"))
      val rows = Gen.listOfN(40, objGen)
        .apply(Gen.Parameters.default, Seed(seedBase * 11 + i))
        .getOrElse(fail("row gen failed"))
        .zipWithIndex.map { case (o, k) => Row(k.toLong, o) }

      val df = spark.createDataFrame(rows.asJava, typedSchema)
      // every 4th spec routes through $defs/$ref indirection, so ref
      // inlining is fuzzed differentially on both compilers too
      val viaRef = i % 4 == 0
      val typedSpecJson =
        if (viaRef)
          s"""{"$$defs":{"d":$objSpec},
              "columns":{"o":{"$$ref":"#/$$defs/d"}}}"""
        else s"""{"columns":{"o":$objSpec}}"""
      val typedSuite = SuiteCompiler.compile(
        Spec.fromJson(typedSpecJson), df.schema)
      val typedValid = graft.exec.Validator.annotate(df, typedSuite)
        .select("k", "valid").collect()
        .map(x => x.getLong(0) -> x.getBoolean(1)).toMap

      import spark.implicits._
      val dyn = rows.map(r => (r.getLong(0), encodeObj(r.getStruct(1))))
        .toDF("k", "j")
      val dynSpecJson =
        if (viaRef)
          s"""{"$$defs":{"d":$objSpec},
              "columns":{"j":{"json":{"properties":{"o":{"$$ref":"#/$$defs/d"}}}}}}"""
        else s"""{"columns":{"j":{"json":{"properties":{"o":$objSpec}}}}}"""
      val dynSuite = SuiteCompiler.compile(
        Spec.fromJson(dynSpecJson),
        dyn.schema)
      val dynValid = graft.exec.Validator.annotate(dyn, dynSuite)
        .select("k", "valid").collect()
        .map(x => x.getLong(0) -> x.getBoolean(1)).toMap

      rows.foreach { r =>
        val k = r.getLong(0)
        assert(typedValid(k) == dynValid(k),
          s"spec #$i $objSpec\nrow k=$k o=${r.get(1)} " +
            s"json=${encodeObj(r.getStruct(1))}: " +
            s"typed=${typedValid(k)} dynamic=${dynValid(k)}")
      }

      // NEGATION metamorphism: {"not": S} must INVERT the verdict for a
      // present object and stay vacuously valid for an absent one
      // (/root/reference/validator.go:552-560) — exercises predicate()
      // composition against the check-list verdict on both compilers
      val notSuite = SuiteCompiler.compile(
        Spec.fromJson(s"""{"columns":{"o":{"not":$objSpec}}}"""), df.schema)
      val notValid = graft.exec.Validator.annotate(df, notSuite)
        .select("k", "valid").collect()
        .map(x => x.getLong(0) -> x.getBoolean(1)).toMap
      val dynNotSuite = SuiteCompiler.compile(
        Spec.fromJson(
          s"""{"columns":{"j":{"json":{"properties":{"o":{"not":$objSpec}}}}}}"""),
        dyn.schema)
      val dynNotValid = graft.exec.Validator.annotate(dyn, dynNotSuite)
        .select("k", "valid").collect()
        .map(x => x.getLong(0) -> x.getBoolean(1)).toMap
      rows.foreach { r =>
        val k = r.getLong(0)
        val present = r.get(1) != null
        val want = if (present) !typedValid(k) else true
        assert(notValid(k) == want,
          s"NOT spec #$i $objSpec row k=$k o=${r.get(1)}: " +
            s"S=${typedValid(k)} not-S=${notValid(k)} want=$want")
        assert(dynNotValid(k) == want,
          s"NOT-dyn spec #$i $objSpec row k=$k " +
            s"json=${encodeObj(r.getStruct(1))}: " +
            s"S=${dynValid(k)} not-S=${dynNotValid(k)} want=$want")
      }

      // ATTRIBUTION probe (env-gated): same failing KEYWORD NAMES per row?
      if (sys.env.contains("GRAFT_FUZZ_PATHS")) {
        def kwNames(df0: org.apache.spark.sql.DataFrame,
                    suite: graft.compile.CompiledSuite): Map[Long, Set[String]] =
          graft.exec.Validator.annotate(df0, suite)
            .select(org.apache.spark.sql.functions.col("k"),
              org.apache.spark.sql.functions.transform(
                org.apache.spark.sql.functions.col("violations"),
                x => org.apache.spark.sql.functions.element_at(
                  org.apache.spark.sql.functions.split(x.getField("keyword"), "/"), -1))
                .as("kws"))
            .collect()
            .map(x => x.getLong(0) -> x.getSeq[String](1).toSet).toMap
        val tk = kwNames(df, typedSuite)
        val dk = kwNames(dyn, dynSuite)
        rows.foreach { r =>
          val k = r.getLong(0)
          if (tk(k) != dk(k))
            info(s"ATTR spec #$i $objSpec row k=$k " +
              s"json=${encodeObj(r.getStruct(1))} typed=${tk(k)} dyn=${dk(k)}")
        }
      }
    }
  }
}
