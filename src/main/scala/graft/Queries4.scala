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
    val suite = SuiteCompiler.compile(Spec.fromJson(specJson), df.schema)
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

  // ---- recursive $ref with bounded unroll: a per-doc linked-list JSON
  // column of depth (doc_id % 6 + 1); leaf value -1 every 5th doc. Depth
  // <= 4 validates fully (leaf minimum violations surface at their exact
  // nesting path); deeper chains fail the typed $ref depth cut at
  // /next/next/next/next ----

  private def chainJson(depthCol: Column, leafCol: Column): Column = {
    // depth d: (d-1) wrappers '{"v":0,"next":' + leaf '{"v":<leaf>}' + '}'*(d-1)
    def js(d: Int): Column = concat(
      lit("""{"v":0,"next":""" * (d - 1)),
      lit("""{"v":"""), leafCol.cast("string"), lit("}"),
      lit("}" * (d - 1)))
    (1 to 6).foldLeft(lit(null).cast("string")) { (acc, d) =>
      when(depthCol === d, js(d)).otherwise(acc)
    }
  }

  def qValidateRecursive(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val derived = docs.select(
      col("doc_id"),
      chainJson(
        (pmod(col("doc_id"), lit(6)) + 1).cast("int"),
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
    """WITH d AS (SELECT doc_id, doc_id % 6 + 1 AS depth,
                         (doc_id % 5 = 0) AS badleaf FROM documents)
       SELECT doc_id, keyword, instance_path FROM (
         SELECT doc_id, '$defs/item/properties/v/minimum' AS keyword,
                'j!json' || repeat('/next', CAST(depth - 1 AS INT)) || '/v'
                  AS instance_path
         FROM d WHERE depth <= 4 AND badleaf
         UNION ALL
         SELECT doc_id, '$defs/item/properties/next/$ref',
                'j!json/next/next/next/next'
         FROM d WHERE depth > 4)
       ORDER BY doc_id, keyword"""

  /** (query, oracle) registry for this batch. */
  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q_validate_crossdoc" -> ((qValidateCrossdoc _, sqlValidateCrossdoc)),
    "q_validate_recursive" -> ((qValidateRecursive _, sqlValidateRecursive))
  )
}
