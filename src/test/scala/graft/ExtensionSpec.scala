package graft

import graft.compile.SuiteCompiler
import graft.exec.{Engine, Validator}
import graft.spec._
import graft.table.TableChecks
import org.apache.spark.sql.{DataFrame => SDF}
import org.apache.spark.sql.functions._

/** Extension surface + content pipeline + YAML specs + salted aggregation. */
class ExtensionSpec extends SparkTestBase {
  import spark.implicits._

  test("contentEncoding: base64 decodability, then media-type/schema over decoded") {
    val good = java.util.Base64.getEncoder.encodeToString("""{"kk": 5}""".getBytes)
    val badJson = java.util.Base64.getEncoder.encodeToString("nope".getBytes)
    val df = Seq((1, good), (2, badJson), (3, "!!!not-base64!!!")).toDF("k", "v")
    val spec =
      """{"columns":{"v":{"contentEncoding":"base64",
           "contentMediaType":"application/json",
           "contentSchema":{"type":"object","properties":{"kk":{"minimum":0}}}}}}"""
    val suite = SuiteCompiler.compile(Spec.fromJson(spec), df.schema)
    val valids = Validator.annotate(df, suite).orderBy("k")
      .select("valid").as[Boolean].collect().toSeq
    assert(valids == Seq(true, false, false))
    val kws = Validator.violations(df, suite, Seq("k"))
      .select("k", "keyword").collect()
      .groupBy(_.getInt(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert(kws(2) == Set("columns/v/contentMediaType"))
    // decode failure reports ONCE (pipeline stops at the decode error,
    // mirroring the reference's decode-then-parse)
    assert(kws(3) == Set("columns/v/contentEncoding"))
  }

  test("scheme-URL loader registry: builtins + custom scheme + typed unknown-scheme error") {
    // inline+json builtin
    val s1 = Spec.fromUrl("""inline+json:{"columns":{"x":{"minimum":1}}}""")
    assert(s1.columns.map(_._1) == Vector("x"))
    // file:// builtin routes yaml by extension
    val f = java.nio.file.Files.createTempFile("graftspec", ".yaml")
    java.nio.file.Files.writeString(f, "columns:\n  y:\n    maximum: 5\n")
    val s2 = Spec.fromUrl(s"file://$f")
    assert(s2.columns.map(_._1) == Vector("y"))
    // custom scheme (the reference's SchemeURLLoader registration surface)
    val store = Map("specs/a" -> """{"columns":{"z":{"const":"ok"}}}""")
    Spec.registerLoader("mem", url =>
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(store(url.stripPrefix("mem://"))))
    assert(Spec.fromUrl("mem://specs/a").columns.map(_._1) == Vector("z"))
    // unknown scheme → typed SpecError listing registered schemes
    val e = intercept[SpecError](Spec.fromUrl("s3://bucket/spec.json"))
    assert(e.getMessage.contains("no loader registered"))
  }

  test("Content registry: custom decoder + media type compose with the pipeline") {
    import graft.functions.Content
    // hex decoder (try semantics: NULL on undecodable), csv-ish media type
    Content.registerEncoding("hex16",
      v => try_to_binary(v, lit("hex")).cast("string"))
    Content.registerMediaType("text/csv-2col",
      v => size(split(v, ",")) === 2)
    def hex(s: String): String = s.getBytes.map("%02x".format(_)).mkString
    val df = Seq(
      (1, hex("a,b")),   // decodes, 2 columns → valid
      (2, hex("a,b,c")), // decodes, 3 columns → media type fails
      (3, "zz-not-hex")  // decode fails → contentEncoding only
    ).toDF("k", "v")
    val spec =
      """{"columns":{"v":{"contentEncoding":"hex16",
           "contentMediaType":"text/csv-2col"}}}"""
    val suite = SuiteCompiler.compile(Spec.fromJson(spec), df.schema)
    val kws = Validator.violations(df, suite, Seq("k"))
      .select("k", "keyword").collect()
      .groupBy(_.getInt(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert(!kws.contains(1))
    assert(kws(2) == Set("columns/v/contentMediaType"))
    assert(kws(3) == Set("columns/v/contentEncoding"))
  }

  test("PSI counts empty expected buckets as drift (spine join)") {
    import graft.table.TableChecks
    // data entirely in bucket 2; reference expects 40% in bucket 0
    val df = Seq.fill(100)(50.0).toDF("v")
    val psi = TableChecks.psi(df, "v", Seq(10.0, 30.0),
      Seq(0.4, 0.3, 0.3))
    // missing bucket 0 must contribute (eps-0.4)*ln(eps/0.4) ≈ +5.16
    assert(psi > 5.0, s"psi=$psi should include empty-bucket terms")
    // empty input: no NPE, psi reflects total absence
    val empty = Seq.empty[Double].toDF("v")
    val psiEmpty = TableChecks.psi(empty, "v", Seq(10.0), Seq(0.5, 0.5))
    assert(!psiEmpty.isNaN)
  }

  test("YAML spec parses to the same suite as JSON (jv YAML loader analogue)") {
    val yaml =
      """columns:
        |  sr_hz:
        |    minimum: 8000
        |    maximum: 48000
        |required:
        |  - sr_hz
        |table:
        |  unique:
        |    - sr_hz
        |""".stripMargin
    val fromY = Spec.fromYaml(yaml)
    val fromJ = Spec.fromJson(
      """{"columns":{"sr_hz":{"minimum":8000,"maximum":48000}},
          "required":["sr_hz"],"table":{"unique":["sr_hz"]}}""")
    assert(fromY.required == fromJ.required)
    assert(fromY.table == fromJ.table)
    assert(fromY.columns.map(_._1) == fromJ.columns.map(_._1))
    assert(fromY.columns.head._2.minimum == fromJ.columns.head._2.minimum)
  }

  test("custom constraint family registers and runs (Vocabulary analogue)") {
    final case class RowCountAtLeast(min: Long) extends CustomConstraint {
      def name = s"minRows($min)"
      def violations(df: SDF, refs: Map[String, SDF]): SDF = {
        df.agg(count(lit(1)).as("n")).filter(col("n") < min)
          .select(lit("table/minRows").as("keyword"),
            lit("<table>").as("instance_path"),
            concat(lit("minRows: got "), col("n").cast("string"),
              lit(s", want >= $min")).as("detail"))
      }
    }
    ConstraintFamilies.register("minRows",
      node => RowCountAtLeast(node.asLong()))
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val specJson = """{"columns":{},"table":{"minRows": 10}}"""
    val suite = SuiteCompiler.compile(Spec.fromJson(specJson), df.schema)
    val vios = Engine.allViolations(df, suite, Seq("k")).collect()
    assert(vios.length == 1)
    assert(vios(0).getAs[String]("keyword") == "table/minRows")
    assert(vios(0).getAs[String]("detail").contains("got 2, want >= 10"))
  }

  test("constraint family with a declared spec-shape schema rejects " +
      "malformed family specs with a typed error naming the family") {
    // vocab.go:19-35 analogue: Vocabulary.Schema checked before Compile
    final case class Budget(max: Long) extends CustomConstraint {
      def name = s"rowBudget($max)"
      def violations(df: SDF, refs: Map[String, SDF]): SDF =
        df.agg(count(lit(1)).as("n")).filter(col("n") > max)
          .select(lit("table/rowBudget").as("keyword"),
            lit("<table>").as("instance_path"),
            concat(lit("rowBudget: got "), col("n").cast("string"),
              lit(s", want <= $max")).as("detail"))
    }
    ConstraintFamilies.register("rowBudget",
      """{"type":"object","required":["max"],
          "properties":{"max":{"type":"integer","minimum":1},
                        "note":{"type":"string"}},
          "additionalProperties":false}""",
      node => Budget(node.get("max").asLong()))
    // well-shaped spec compiles
    val df = Seq((1, "a")).toDF("k", "v")
    SuiteCompiler.compile(Spec.fromJson(
      """{"columns":{},"table":{"rowBudget":{"max":5}}}"""), df.schema)
    // shape violations: wrong type, missing required, negative bound, extra key
    Seq(
      """{"table":{"rowBudget": 10}}""" -> "type",
      """{"table":{"rowBudget": {}}}""" -> "required",
      """{"table":{"rowBudget": {"max": 0}}}""" -> "minimum",
      """{"table":{"rowBudget": {"max": 2, "oops": 1}}}""" -> "additionalProperties"
    ).foreach { case (specJson, frag) =>
      val e = intercept[graft.spec.SpecError](Spec.fromJson(specJson))
      assert(e.getMessage.contains("rowBudget") && e.getMessage.contains(frag),
        s"$specJson → ${e.getMessage}")
    }
    // a shape schema may not use runtime-registry keywords
    val bad = intercept[graft.spec.SpecError] {
      ConstraintFamilies.register("badShape",
        """{"format":"uuid"}""", node => Budget(1))
    }
    assert(bad.getMessage.contains("not usable in a spec-shape schema"))
  }

  test("salted two-phase duplicate counting ≡ naive on skewed keys") {
    // 80% of rows share one hot key — the codec/sr_hz skew shape
    val rows = (1 to 2000).map(i => if (i % 5 != 0) "hot" else s"key_$i")
    val df = rows.toDF("k").repartition(16)
    val naive = TableChecks.duplicateKeys(df, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = TableChecks.saltedDuplicateKeys(df, Seq("k"), saltBuckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == naive)
    assert(naive("hot") == 1600)
  }
  test("SpecShape deepEq: numeric cross-type + key order inside containers") {
    import graft.spec.SpecShape
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val shape = SpecShape.parseShape(
      m.readTree("""{"const": {"a": 1, "b": [2.0, {"c": 3}]}}"""), "t")
    // numerically equal, different JSON number types, different key order
    assert(SpecShape.violations(
      m.readTree("""{"b": [2, {"c": 3.0}], "a": 1.0}"""), shape).isEmpty)
    assert(SpecShape.violations(
      m.readTree("""{"a": 1, "b": [2.0, {"c": 4}]}"""), shape).nonEmpty)
    val uniq = SpecShape.parseShape(m.readTree("""{"uniqueItems": true}"""), "t")
    // 1 and 1.0 are the same JSON value -> duplicates
    assert(SpecShape.violations(m.readTree("""[1, 1.0]"""), uniq).nonEmpty)
    assert(SpecShape.violations(m.readTree("""[{"x":1,"y":2}, {"y":2,"x":1}]"""), uniq).nonEmpty)
    assert(SpecShape.violations(m.readTree("""[1, 2]"""), uniq).isEmpty)
  }

  test("TLS loader options round-trip for custom-loader authors (jv -k/--cacert)") {
    val before = graft.spec.Spec.tlsOptions
    try {
      graft.spec.Spec.setTlsOptions(graft.spec.Spec.TlsOptions(
        insecureSkipVerify = true, caCertPem = Some("PEM")))
      val o = graft.spec.Spec.tlsOptions
      assert(o.insecureSkipVerify && o.caCertPem.contains("PEM"))
    } finally graft.spec.Spec.setTlsOptions(before)
  }
}
