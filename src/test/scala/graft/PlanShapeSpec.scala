package graft

/** Plan-shape assertions for the operator battery: column pruning reaches
  * the scan, broadcast joins are chosen where intended.
  */
class PlanShapeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def readSchemas(df: org.apache.spark.sql.DataFrame): Seq[String] =
    "ReadSchema: [^\\n]*".r.findAllIn(df.queryExecution.executedPlan.toString).toSeq

  test("validation queries prune to the checked + key columns") {
    val rs = readSchemas(Queries.qValidateBounds(spark, dir))
    assert(rs.nonEmpty)
    rs.foreach { r =>
      assert(!r.contains("l_shipdate") && !r.contains("l_tax") && !r.contains("l_returnflag"),
        s"unpruned scan: $r")
    }
  }

  test("unique reads only the key column") {
    val rs = readSchemas(Queries.qUnique(spark, dir))
    rs.foreach(r => assert(!r.contains("o_totalprice") && r.contains("o_custkey"), r))
  }

  test("brand revenue join broadcasts the part side") {
    val plan = Queries.qJoinBrandRevenue(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("referential check uses a broadcast anti join") {
    val plan = Queries.qReferential(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan)
    assert(plan.contains("Broadcast"), plan)
  }

  test("ANN brute force broadcasts the probe set (no shuffle of the corpus)") {
    val plan = Queries2.qAnnTopK(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("IVF join broadcasts the exploded probes (corpus never shuffles by cell)") {
    val plan = Queries2.qAnnIvf(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      plan)
  }

  test("dynamic JSON plan parses each row exactly once (binder + explode_outer)") {
    // regression guard for the round-2 plan-shape bugs: filter-before-explode
    // (explicit or inferred) re-inlines the whole check array, and unbound
    // variant walks repeat the parse per check — 10× wall at sf0.1
    val plan = Queries3.qValidateJsonDynamic(spark, dir)
      .queryExecution.executedPlan.toString
    // one parse SITE = 2 textual parseJson arms: the native hot arm plus
    // the Go-parity Jackson-normalize fallback, which Coalesce evaluates
    // only on rows the native arm rejected — per-row cost on well-formed
    // JSON is still ONE parse
    val parses = "parseJson".r.findAllIn(plan).size
    assert(parses == 2, s"expected exactly 2 parseJson (native + fallback arm), got $parses")
    val norms = "json_go_norm".r.findAllIn(plan).size
    assert(norms == 1, s"expected exactly 1 json_go_norm fallback, got $norms")
    val guards = "json_go_lex".r.findAllIn(plan).size
    assert(guards == 1, s"expected exactly 1 json_go_lex guard, got $guards")
    val schemaWalks = "schemaOfVariant".r.findAllIn(plan).size
    assert(schemaWalks <= 2, s"expected <=2 schemaOfVariant (root+child), got $schemaWalks")
  }

  test("dynamic content* plan parses at most 3× per row (doc, media-type, schema)") {
    // regression guard: the contentSchema recursion must bind its
    // try_parse_json(decoded) once — unbound it would re-inline per nested
    // check (the round-2 failure mode). The honest floor is 3 single-use
    // parse SITES — the outer document, the application/json media-type
    // predicate (an opaque registry function with its own parse), and the
    // bound contentSchema parse of the decoded payload — each carrying 2
    // textual arms (native + lazily-evaluated Go-parity fallback).
    val plan = Queries3.qValidateContentDynamic(spark, dir)
      .queryExecution.executedPlan.toString
    val parses = "parseJson".r.findAllIn(plan).size
    assert(parses <= 6, s"expected <=6 parseJson (3 sites x 2 arms), got $parses")
    val norms = "json_go_norm".r.findAllIn(plan).size
    assert(norms <= 3 && norms * 2 == parses,
      s"fallback arms must pair 1:1 with native parses: $norms norms, $parses parses")
  }

  test("static JSON plan evaluates from_json once per row") {
    val plan = Queries.qValidateJson(spark, dir)
      .queryExecution.executedPlan.toString
    val parses = "from_json".r.findAllIn(plan).size
    assert(parses <= 1, s"expected <=1 from_json, got $parses")
  }

  test("two-sample KS plan has no partition-less window") {
    val plan = graft.table.TableChecks.ksTwoSampleDf(
        spark.read.parquet(s"$dir/lineitem.parquet"), "l_extendedprice",
        spark.read.parquet(s"$dir/lineitem.parquet"), "l_quantity")
      .queryExecution.executedPlan.toString
    // every Window node must carry a partition spec (pid); a global window
    // would single-task the distinct-value sort at scale
    "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r.findAllMatchIn(plan).foreach { m =>
      assert(m.group(1).nonEmpty, s"partition-less window in:\n$plan")
    }
    assert(plan.contains("Window"), "expected a per-partition window")
  }

  test("text battery is a single codegen'd scan (no shuffle)") {
    val plan = Queries2.qTextBattery(spark, dir).queryExecution.executedPlan.toString
    // orderBy adds one exchange; the battery itself must not add more
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"$exchanges exchanges:\n$plan")
  }
  test("catalog schema linting: one agg shuffle + final sort, no join") {
    val plan = Queries6.qSchemaLint(spark, dir).queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"$exchanges exchanges:\n$plan") // agg + orderBy
    assert(!plan.contains("Join"), "verdict fold must not join")
  }

  test("mixed-dialect catalog lint walks each document ONCE (persisted node frame)") {
    import graft.spec.SchemaLint
    import spark.implicits._
    // perResourceDialects = true fans the node rows out to 5 draft
    // branches; without the persisted exploded frame the parse+walk UDF
    // re-ran once per branch (5 walks per document)
    val n = 40
    val df = (0 until n).map { i =>
      val schema = if (i % 3 == 0)
        s"""{"$$schema": "https://json-schema.org/draft-07/schema#", "minLength": $i}"""
      else s"""{"properties": {"f$i": {"type": "string"}}}"""
      (s"s$i", schema)
    }.toDF("id", "schema_json")
    val before = SchemaLint.enumCalls.get()
    val verdicts = SchemaLint.verdictsForCatalog(df, "id", "schema_json",
      "https://json-schema.org/draft/2020-12/schema")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val walks = SchemaLint.enumCalls.get() - before
    assert(verdicts.size == n && verdicts.values.forall(identity))
    assert(walks == n, s"expected $n walk invocations (one per document), got $walks")
  }

  test("flat unevaluatedProperties keeps the STATIC lowering (no branch-set algebra)") {
    import graft.compile.SuiteCompiler
    import graft.spec.Spec
    import org.apache.spark.sql.types._
    def deepSize(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
      1 + e.children.map(deepSize).sum
    def predSize(specJson: String): Int = {
      val schema = StructType(Seq(StructField("m", MapType(StringType, StringType))))
      val suite = SuiteCompiler.compile(Spec.fromJson(specJson), schema)
      val c = suite.rowChecks.filter(_.keywordPath.endsWith("unevaluatedProperties"))
      assert(c.nonEmpty)
      // measure on the ANALYZED plan (the unresolved bridge node is opaque);
      // bindings are projected first (as Validator does) and counted — the
      // runtime arm's branch predicates live there exactly once per row
      val df = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      val withBindings = suite.bindings.foldLeft(df) {
        case (d, (name, col)) => d.withColumn(name, col)
      }
      withBindings.select(c.map(_.pred): _*).queryExecution.analyzed
        .collect { case p => p.expressions.map(deepSize).sum }.sum
    }
    // flat: properties + allOf closure — compile-time evaluated set, tiny tree
    val flat = predSize(
      """{"columns": {"m": {
        |  "properties": {"a": {"minLength": 1}},
        |  "allOf": [{"properties": {"b": {"minLength": 1}}}],
        |  "unevaluatedProperties": false}}}""".stripMargin)
    // runtime: anyOf branches — per-row branch-set algebra, necessarily bigger
    val runtime = predSize(
      """{"columns": {"m": {
        |  "properties": {"a": {"minLength": 1}},
        |  "anyOf": [{"properties": {"b": {"const": "b"}}, "required": ["b"]},
        |            {"properties": {"c": {"const": "c"}}, "required": ["c"]}],
        |  "unevaluatedProperties": false}}}""".stripMargin)
    assert(flat < 40, s"static lowering regressed to $flat expression nodes")
    assert(runtime > flat, s"runtime arm ($runtime) should exceed static ($flat)")
  }
  test("crossdoc + recursive validation queries prune to the checked columns") {
    // CacheManager substitutes any cached full-schema documents relation
    // into logically-matching subplans, defeating the pruning assertion
    spark.catalog.clearCache()
    val rs1 = readSchemas(Queries4.qValidateCrossdoc(spark, dir))
    assert(rs1.nonEmpty)
    rs1.foreach { r =>
      assert(!r.contains("n_chars") && !r.contains("source"), s"unpruned: $r")
      assert(r.contains("text") && r.contains("lang"), r)
    }
    val rs2 = readSchemas(Queries4.qValidateRecursive(spark, dir))
    assert(rs2.nonEmpty)
    rs2.foreach { r =>
      // only doc_id feeds the derived JSON chain — text must not be read
      assert(!r.contains("text") && !r.contains("lang"), s"unpruned: $r")
    }
  }
}
