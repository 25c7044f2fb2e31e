package graft

import graft.compile.SuiteCompiler
import graft.exec.Validator
import graft.spec.Spec
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch 4: round-4 addressing features under the oracle gate —
  * cross-document `$ref` through the loader registry (per-resource dialect
  * included: the external library declares draft-07 and uses forms illegal
  * in the 2020-12 root) and bounded-unroll recursive `$ref` validation with
  * the typed depth cut. Reference surfaces: remote-ref resolution
  * (/root/reference/roots.go:103-150) and the runtime recursion guard
  * (/root/reference/validator.go:84-90), re-expressed as compile-time
  * inlining over Catalyst expressions.
  */
object Queries4 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def vios(df: DataFrame, specJson: String, keys: Seq[String]): DataFrame = {
    // depth-ADAPTIVE: recursive specs unroll to the corpus' real document
    // depth (one codegen'd pre-pass); non-recursive specs compile identically
    val suite = SuiteCompiler.compileAdaptive(Spec.fromJson(specJson), df)
    Validator.violations(df, suite, keys)
      .select((keys :+ "keyword" :+ "instance_path").map(col): _*)
      .orderBy((keys :+ "keyword").map(col): _*)
  }

  // ---- cross-document $ref: external draft-07 schema library carried in
  // an inline+json URL ('#'/'%' percent-encoded per RFC 3986); both rules
  // addressed by JSON pointer into the external document ----

  /** The external library document (draft-07: `dependencies` is legal HERE
    * while the 2020-12 root spec could not use it — per-resource dialect).
    */
  private val libraryJson =
    """{"$schema":"http://json-schema.org/draft-07/schema#","$defs":{""" +
      """"textRule":{"minLength":100,"dependencies":{"x":["y"]}},""" +
      """"langRule":{"enum":["en","de","fr","es"]}}}"""

  private[graft] val libraryUrl: String =
    "inline+json:" + libraryJson.replace("%", "%25").replace("#", "%23")

  // the URL itself contains JSON quotes — escape it when embedding as a
  // JSON string value
  private val libraryUrlJs: String =
    libraryUrl.replace("\\", "\\\\").replace("\"", "\\\"")

  def qValidateCrossdoc(spark: SparkSession, dir: String): DataFrame =
    vios(t(spark, dir, "documents"),
      s"""{"$$schema": "https://json-schema.org/draft/2020-12/schema",
           "columns": {
             "text": {"$$ref": "$libraryUrlJs#/$$defs/textRule"},
             "lang": {"$$ref": "$libraryUrlJs#/$$defs/langRule"}}}""",
      Seq("doc_id"))

  val sqlValidateCrossdoc: String =
    s"""SELECT doc_id, keyword, instance_path FROM (
          SELECT doc_id, '$libraryUrl#/$$defs/textRule/minLength' AS keyword,
                 'text' AS instance_path
          FROM documents WHERE text IS NOT NULL AND length(text) < 100
          UNION ALL
          SELECT doc_id, '$libraryUrl#/$$defs/langRule/enum', 'lang'
          FROM documents
          WHERE lang IS NOT NULL AND lang NOT IN ('en', 'de', 'fr', 'es'))
        ORDER BY doc_id, keyword"""

  // ---- recursive $ref with DEPTH-ADAPTIVE unroll: a per-doc linked-list
  // JSON column of depth (doc_id % 12 + 1) — well past the default unroll
  // of 4; leaf value -1 every 5th doc. compileAdaptive's corpus depth
  // pre-pass sizes the inline to 12, so EVERY document validates fully
  // (leaf minimum violations surface at their exact nesting path; no
  // DepthExceeded cut fires in-corpus) ----

  private val chainMaxDepth = 12

  /** Exposed for the RecProbe dev tool only. */
  private[graft] def chainJsonForProbe(depthCol: Column, leafCol: Column): Column =
    chainJson(depthCol, leafCol)

  private def chainJson(depthCol: Column, leafCol: Column): Column = {
    // depth d: (d-1) wrappers '{"v":0,"next":' + leaf '{"v":<leaf>}' + '}'*(d-1)
    def js(d: Int): Column = concat(
      lit("""{"v":0,"next":""" * (d - 1)),
      lit("""{"v":"""), leafCol.cast("string"), lit("}"),
      lit("}" * (d - 1)))
    (1 to chainMaxDepth).foldLeft(lit(null).cast("string")) { (acc, d) =>
      when(depthCol === d, js(d)).otherwise(acc)
    }
  }

  def qValidateRecursive(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val derived = docs.select(
      col("doc_id"),
      chainJson(
        (pmod(col("doc_id"), lit(chainMaxDepth)) + 1).cast("int"),
        when(pmod(col("doc_id"), lit(5)) === 0, lit(-1))
          .otherwise(pmod(col("doc_id"), lit(50)))).as("j"))
    vios(derived,
      """{"$defs": {"item": {"type": "object",
           "properties": {"v": {"minimum": 0},
                          "next": {"$ref": "#/$defs/item"}}}},
         "columns": {"j": {"json": {"$ref": "#/$defs/item"}}}}""",
      Seq("doc_id"))
  }

  val sqlValidateRecursive: String =
    """WITH d AS (SELECT doc_id, doc_id % 12 + 1 AS depth,
                         (doc_id % 5 = 0) AS badleaf FROM documents)
       SELECT doc_id, '$defs/item/properties/v/minimum' AS keyword,
              'j!json' || repeat('/next', CAST(depth - 1 AS INT)) || '/v'
                AS instance_path
       FROM d WHERE badleaf
       ORDER BY doc_id, keyword"""

  // ---- unevaluated* in DYNAMIC (variant) mode: runtime anyOf evaluated-key
  // sets on variant objects + contains-aware unevaluatedItems on variant
  // arrays (the r4 closure of the dynamic-mode residual) ----

  def qValidateUnevalDynamic(spark: SparkSession, dir: String): DataFrame = {
    val m = pmod(col("doc_id"), lit(5))
    val df = t(spark, dir, "documents").select(col("doc_id"),
      when(m === 0, lit("""{"a":1}"""))        // branch1 validates -> a evaluated
        .when(m === 1, lit("""{"b":"x"}"""))   // branch2 validates -> b evaluated
        .when(m === 2, lit("""{"a":1,"c":2}""")) // c unevaluated
        .when(m === 3, lit("""{"a":"s"}"""))   // both branches fail: anyOf + a unevaluated
        .otherwise(lit("not json")).as("j"),
      when(m === 0, lit("""[1,2]"""))          // all contained
        .when(m === 1, lit("""[1,"x"]"""))     // "x" not contained -> unevaluated
        .when(m === 2, lit("""[]"""))          // contains itself fails
        .when(m === 3, lit("""[2]"""))
        .otherwise(lit("not json")).as("ja"))
    vios(df,
      """{"columns":{
           "j":{"json":{
             "anyOf":[{"required":["a"],"properties":{"a":{"type":"number"}}},
                      {"required":["b"],"properties":{"b":{"type":"string"}}}],
             "unevaluatedProperties":false}},
           "ja":{"json":{"contains":{"type":"number"},
             "unevaluatedItems":false}}}}""",
      Seq("doc_id"))
  }

  val sqlValidateUnevalDynamic: String =
    """WITH d AS (SELECT doc_id, doc_id % 5 AS m FROM documents)
       SELECT doc_id, keyword, instance_path FROM (
         SELECT doc_id, 'columns/j/json/unevaluatedProperties' AS keyword,
                'j!json' AS instance_path FROM d WHERE m IN (2, 3)
         UNION ALL
         SELECT doc_id, 'columns/j/json/anyOf', 'j!json' FROM d WHERE m = 3
         UNION ALL
         SELECT doc_id, 'columns/j/json/!parse', 'j!json' FROM d WHERE m = 4
         UNION ALL
         SELECT doc_id, 'columns/ja/json/unevaluatedItems', 'ja!json'
           FROM d WHERE m = 1
         UNION ALL
         SELECT doc_id, 'columns/ja/json/contains', 'ja!json' FROM d WHERE m = 2
         UNION ALL
         SELECT doc_id, 'columns/ja/json/!parse', 'ja!json' FROM d WHERE m = 4)
       ORDER BY doc_id, keyword"""

  /** (query, oracle) registry for this batch. */
  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q_validate_crossdoc" -> ((qValidateCrossdoc _, sqlValidateCrossdoc)),
    "q_validate_recursive" -> ((qValidateRecursive _, sqlValidateRecursive)),
    "q_validate_uneval_dynamic" -> ((qValidateUnevalDynamic _, sqlValidateUnevalDynamic))
  )
}
