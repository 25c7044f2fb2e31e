package graft

import graft.spec.SchemaLint
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle query for OFFICIAL-METASCHEMA catalog linting ([[SchemaLint]]):
  * a deterministic catalog of JSON Schema documents is synthesized from the
  * `documents` table (schema shapes chosen so validity under the 2020-12
  * meta is a closed-form predicate of `doc_id`), linted in one DataFrame
  * pass, and the per-document verdicts hash-compare against DuckDB
  * computing the same predicate directly.
  */
object Queries6 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** doc_id % 4 selects the schema shape:
    *   0 → valid object schema (minLength = doc_id % 5, always ≥ 0)
    *   1 → `{"type": 123}` — always shape-invalid
    *   2 → minLength = (doc_id % 7) - 3 — invalid iff negative
    *   3 → `$anchor` grammar: leading digit (invalid) iff doc_id % 3 = 0
    *       (doc_id ≡ 3 mod 4 is always odd, so a parity split would leave
    *       one branch dead)
    */
  def qSchemaLint(spark: SparkSession, dir: String): DataFrame = {
    val m = pmod(col("doc_id"), lit(4))
    val cat = t(spark, dir, "documents").select(col("doc_id"),
      when(m === 0, concat(
          lit("""{"type":"object","properties":{"a":{"type":"string","minLength":"""),
          pmod(col("doc_id"), lit(5)).cast("string"), lit("}}}")))
        .when(m === 1, lit("""{"type":123}"""))
        .when(m === 2, concat(lit("""{"properties":{"a":{"minLength":"""),
          (pmod(col("doc_id"), lit(7)) - 3).cast("string"), lit("}}}")))
        .when(pmod(col("doc_id"), lit(3)) === 0,
          lit("""{"$anchor":"0bad"}"""))
        .otherwise(lit("""{"$anchor":"ok_anchor"}"""))
        .as("schema_json"))
    // scale shape: annotate nodes in place + one map-side-partial AND
    // aggregation on doc_id — no join, no distinct
    SchemaLint.verdictsForCatalog(cat, "doc_id", "schema_json",
        "https://json-schema.org/draft/2020-12/schema",
        perResourceDialects = false) // homogeneous catalog: single branch
      .orderBy("doc_id")
  }

  val sqlSchemaLint: String =
    """SELECT doc_id,
         CASE doc_id % 4
           WHEN 0 THEN TRUE
           WHEN 1 THEN FALSE
           WHEN 2 THEN (doc_id % 7) - 3 >= 0
           ELSE doc_id % 3 <> 0
         END AS valid
       FROM documents ORDER BY doc_id"""

  // ------------------------------------------------- custom-meta shard

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  @volatile private var graftMetaRegistered = false

  /** Deterministic custom meta-schemas served through a registered scheme
    * loader (no remote, valid absolute URIs): `graftmeta:gated` keeps only
    * core+validation vocabularies (applicator keywords become
    * unconstrained annotations), `graftmeta:plain` has no `$vocabulary`
    * (its base draft's official meta governs).
    */
  private def registerGraftMetaLoader(): Unit = synchronized {
    if (!graftMetaRegistered) {
      val metas = Map(
        "graftmeta:gated" ->
          """{"$schema": "https://json-schema.org/draft/2020-12/schema",
             "$vocabulary": {
               "https://json-schema.org/draft/2020-12/vocab/core": true,
               "https://json-schema.org/draft/2020-12/vocab/validation": true}}""",
        "graftmeta:plain" ->
          """{"$schema": "https://json-schema.org/draft/2020-12/schema",
             "title": "no vocabulary: base official meta governs"}""")
      graft.spec.Spec.registerLoader("graftmeta", u =>
        mapper.readTree(metas.getOrElse(u,
          throw graft.spec.SpecError(u, s"unknown graftmeta document '$u'"))))
      graftMetaRegistered = true
    }
  }

  /** Catalog with a CUSTOM-META shard, per-document routing (the
    * non-pinned path: root `$schema` discovery + composed vocabulary
    * suites). doc_id % 3 picks the shard; validity stays a closed-form
    * predicate of doc_id:
    *   0 → official 2020-12 document: `allOf: [1]` → always INVALID
    *   1 → `graftmeta:gated` (no applicator): the same `allOf: [1]` is an
    *       unconstrained annotation — valid iff minLength ≥ 0
    *       (= (doc_id % 7) - 3 ≥ 0), proving per-document meta routing
    *   2 → `graftmeta:plain` (no $vocabulary → base official): valid iff
    *       minLength ≥ 0
    */
  def qSchemaLintCustom(spark: SparkSession, dir: String): DataFrame = {
    registerGraftMetaLoader()
    val m = pmod(col("doc_id"), lit(3))
    val k = (pmod(col("doc_id"), lit(7)) - 3).cast("string")
    val cat = t(spark, dir, "documents").select(col("doc_id"),
      when(m === 0, concat(lit("""{"allOf":[1],"minLength":"""), k, lit("}")))
        .when(m === 1, concat(
          lit("""{"$schema":"graftmeta:gated","allOf":[1],"minLength":"""),
          k, lit("}")))
        .otherwise(concat(
          lit("""{"$schema":"graftmeta:plain","minLength":"""), k, lit("}")))
        .as("schema_json"))
    SchemaLint.verdictsForCatalog(cat, "doc_id", "schema_json",
        "https://json-schema.org/draft/2020-12/schema")
      .orderBy("doc_id")
  }

  val sqlSchemaLintCustom: String =
    """SELECT doc_id,
         CASE doc_id % 3
           WHEN 0 THEN FALSE
           ELSE (doc_id % 7) - 3 >= 0
         END AS valid
       FROM documents ORDER BY doc_id"""

  /** (query, oracle) registry for this batch. */
  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q_schema_lint" -> ((qSchemaLint _, sqlSchemaLint)),
    "q_schema_lint_custom" -> ((qSchemaLintCustom _, sqlSchemaLintCustom))
  )
}
