package graft

import graft.table.TableChecks
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch 3: distribution-drift operators (exact two-sample KS, PSI) with
  * DuckDB oracles, + the fused verdict aggregate.
  */
object Queries3 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // ---- exact two-sample KS: returnflag A vs R on l_extendedprice ----
  def qDriftKs(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    TableChecks.ksTwoSampleDf(
        li.filter(col("l_returnflag") === "A"), "l_extendedprice",
        li.filter(col("l_returnflag") === "R"), "l_extendedprice")
      .select(round(col("ks"), 6).as("ks"))
  }

  val sqlDriftKs: String =
    """WITH av AS (SELECT CAST(l_extendedprice AS DOUBLE) v FROM lineitem
                   WHERE l_returnflag = 'A' AND l_extendedprice IS NOT NULL),
       bv AS (SELECT CAST(l_extendedprice AS DOUBLE) v FROM lineitem
              WHERE l_returnflag = 'R' AND l_extendedprice IS NOT NULL),
       u AS (SELECT v, 1 a, 0 b FROM av UNION ALL SELECT v, 0, 1 FROM bv),
       per AS (SELECT v, sum(a) ca, sum(b) cb FROM u GROUP BY v),
       cum AS (SELECT v,
                 sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) * 1.0
                   / (SELECT sum(ca) FROM per) AS fa,
                 sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) * 1.0
                   / (SELECT sum(cb) FROM per) AS fb
               FROM per)
       SELECT round(max(abs(fa - fb)), 6) AS ks FROM cum"""

  // ---- PSI: l_extendedprice distribution of returnflag A vs fixed ref ----
  private val psiEdges = Seq(2000.0, 10000.0, 30000.0, 60000.0)
  private val psiRef = Seq(0.05, 0.25, 0.40, 0.25, 0.05)

  def qDriftPsi(spark: SparkSession, dir: String): DataFrame =
    TableChecks.psiDf(
        t(spark, dir, "lineitem").filter(col("l_returnflag") === "A"),
        "l_extendedprice", psiEdges, psiRef)
      .select(round(col("psi"), 6).as("psi"))

  val sqlDriftPsi: String = {
    val bucket = "CASE WHEN v < 2000.0 THEN 0 WHEN v < 10000.0 THEN 1 " +
      "WHEN v < 30000.0 THEN 2 WHEN v < 60000.0 THEN 3 ELSE 4 END"
    val refArr = psiRef.mkString("[", ",", "]")
    s"""WITH vals AS (SELECT CAST(l_extendedprice AS DOUBLE) v FROM lineitem
                      WHERE l_returnflag = 'A' AND l_extendedprice IS NOT NULL),
        hist AS (SELECT $bucket AS b, count(*) AS n FROM vals GROUP BY 1),
        spine AS (SELECT unnest(generate_series(0, ${psiEdges.size})) AS b),
        full_hist AS (SELECT spine.b, coalesce(hist.n, 0) AS n
                      FROM spine LEFT JOIN hist ON spine.b = hist.b),
        withp AS (SELECT b,
                    greatest(n * 1.0 / greatest((SELECT sum(n) FROM full_hist), 1), 1e-6) AS p,
                    greatest(($refArr)[b + 1], 1e-6) AS q
                  FROM full_hist)
        SELECT round(sum((p - q) * ln(p / q)), 6) AS psi FROM withp"""
  }

  // ---- fused verdict aggregate (rows / invalid / violations / valid) ----
  def qVerdict(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "lineitem")
    val suite = graft.compile.SuiteCompiler.compile(
      graft.spec.Spec.fromJson(
        """{"columns":{"l_quantity":{"minimum":5,"maximum":45},
            "l_discount":{"maximum":0.08}}}"""), df.schema)
    graft.exec.Validator.verdict(df, suite)
  }

  val sqlVerdict: String =
    """WITH checks AS (SELECT
         (CASE WHEN l_quantity IS NOT NULL AND NOT (l_quantity >= 5) THEN 1 ELSE 0 END
        + CASE WHEN l_quantity IS NOT NULL AND NOT (l_quantity <= 45) THEN 1 ELSE 0 END
        + CASE WHEN l_discount IS NOT NULL AND NOT (l_discount <= 0.08) THEN 1 ELSE 0 END) AS nv
       FROM lineitem)
       SELECT count(*) AS rows,
              CAST(sum(CASE WHEN nv > 0 THEN 1 ELSE 0 END) AS BIGINT) AS invalid_rows,
              CAST(sum(nv) AS BIGINT) AS violations,
              sum(CASE WHEN nv > 0 THEN 1 ELSE 0 END) = 0 AS valid
       FROM checks"""

  // ---- dynamic (variant) JSON validation over events.props ----
  def qValidateJsonDynamic(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "events")
    val suite = graft.compile.SuiteCompiler.compile(
      graft.spec.Spec.fromJson(
        """{"columns":{"props":{"json":{
             "type":"object","required":["k"],
             "properties":{"k":{"type":"integer","minimum":10,"maximum":90}}}}}}"""),
      df.schema)
    graft.exec.Validator.violations(df, suite, Seq("event_id"))
      .select(col("event_id"), col("keyword"), col("instance_path"))
      .orderBy("event_id", "keyword")
  }

  // semantically complete mirror: !parse, root type, required, k type, and
  // k bounds — the latter three emit zero rows on this corpus (every props
  // is an object with an integral k) but keep the oracle equivalent if the
  // corpus ever changes
  val sqlValidateJsonDynamic: String =
    """WITH typed AS (
         SELECT event_id, props,
                CASE WHEN props IS NULL THEN 'missing'
                     WHEN json_valid(props) THEN json_type(json(props))
                     ELSE 'invalid' END AS jt,
                CASE WHEN json_valid(props) THEN json_type(json(props), '$.k') END AS kt,
                CASE WHEN json_valid(props) THEN CAST(json_extract(props, '$.k') AS DOUBLE) END AS kv
         FROM events)
       SELECT * FROM (
         SELECT event_id, 'columns/props/json/!parse' AS keyword,
                'props!json' AS instance_path
           FROM typed WHERE jt = 'invalid'
         UNION ALL
         SELECT event_id, 'columns/props/json/type', 'props!json'
           FROM typed WHERE jt NOT IN ('missing', 'invalid', 'OBJECT')
         UNION ALL
         SELECT event_id, 'columns/props/json/required', 'props!json'
           FROM typed WHERE jt = 'OBJECT' AND kt IS NULL
         UNION ALL
         SELECT event_id, 'columns/props/json/properties/k/type', 'props!json/k'
           FROM typed WHERE jt = 'OBJECT' AND kt IS NOT NULL
            AND NOT (kt IN ('BIGINT','UBIGINT')
                     OR (kt = 'DOUBLE' AND kv = floor(kv)))
         UNION ALL
         SELECT event_id, 'columns/props/json/properties/k/minimum', 'props!json/k'
           FROM typed WHERE kt IN ('BIGINT','UBIGINT','DOUBLE') AND NOT (kv >= 10)
         UNION ALL
         SELECT event_id, 'columns/props/json/properties/k/maximum', 'props!json/k'
           FROM typed WHERE kt IN ('BIGINT','UBIGINT','DOUBLE') AND NOT (kv <= 90)
       ) ORDER BY event_id, keyword"""

  // ---- dynamic object-keyword validation over DERIVED JSON (the new
  // key-enumeration arm: propertyNames / additionalProperties /
  // patternProperties / dependentRequired), branch per doc_id % 5 ----
  def qValidateJsonDynamic2(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "documents").select(col("doc_id"),
      when(pmod(col("doc_id"), lit(5)) === 0, lit("""{"a":1,"x_n":2}"""))
        .when(pmod(col("doc_id"), lit(5)) === 1, lit("""{"a":1,"zzz":"s"}"""))
        .when(pmod(col("doc_id"), lit(5)) === 2, lit("""{"BAD KEY":1}"""))
        .when(pmod(col("doc_id"), lit(5)) === 3, lit("""{"a":1,"x_n":"str"}"""))
        .otherwise(lit("not json")).as("j"))
    val suite = graft.compile.SuiteCompiler.compile(
      graft.spec.Spec.fromJson(
        """{"columns":{"j":{"json":{
             "properties":{"a":{"type":"integer"}},
             "patternProperties":{"^x_":{"type":"integer"}},
             "propertyNames":{"pattern":"^[a-zA-Z_]+$"},
             "additionalProperties":false,
             "dependentRequired":{"zzz":["www"]}}}}}"""),
      df.schema)
    graft.exec.Validator.violations(df, suite, Seq("doc_id"))
      .select(col("doc_id"), col("keyword"), col("instance_path"))
      .orderBy("doc_id", "keyword")
  }

  // branch map (m = doc_id % 5):
  //   m=0 {"a":1,"x_n":2}     → valid
  //   m=1 {"a":1,"zzz":"s"}   → additionalProperties (zzz) + dependentRequired/zzz
  //   m=2 {"BAD KEY":1}       → propertyNames (space) + additionalProperties
  //   m=3 {"a":1,"x_n":"str"} → patternProperties (^x_ value not integer)
  //   m=4 not json            → !parse only (checks vacuous on null variant)
  val sqlValidateJsonDynamic2: String =
    """WITH d AS (SELECT doc_id, doc_id % 5 AS m FROM documents)
       SELECT * FROM (
         SELECT doc_id, 'columns/j/json/additionalProperties' AS keyword,
                'j!json' AS instance_path
           FROM d WHERE m IN (1, 2)
         UNION ALL
         SELECT doc_id, 'columns/j/json/dependentRequired/zzz', 'j!json'
           FROM d WHERE m = 1
         UNION ALL
         SELECT doc_id, 'columns/j/json/propertyNames', 'j!json'
           FROM d WHERE m = 2
         UNION ALL
         SELECT doc_id, 'columns/j/json/patternProperties/^x_', 'j!json'
           FROM d WHERE m = 3
         UNION ALL
         SELECT doc_id, 'columns/j/json/!parse', 'j!json'
           FROM d WHERE m = 4
       ) ORDER BY doc_id, keyword"""

  // ---- content* keywords in DYNAMIC mode: base64-embedded JSON payloads
  // inside variant objects (validator.go:468-510), branch per doc_id % 5 ----
  def qValidateContentDynamic(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "documents").select(col("doc_id"),
      when(pmod(col("doc_id"), lit(5)) === 0,
          lit("""{"payload":"eyJrIjoxMn0="}""")) // {"k":12} → valid
        .when(pmod(col("doc_id"), lit(5)) === 1,
          lit("""{"payload":"!!!"}""")) // undecodable base64
        .when(pmod(col("doc_id"), lit(5)) === 2,
          lit("""{"payload":"bm90anNvbg=="}""")) // "notjson" → bad media type
        .when(pmod(col("doc_id"), lit(5)) === 3,
          lit("""{"payload":"eyJrIjozfQ=="}""")) // {"k":3} → minimum fails
        .otherwise(lit("""{"payload":42}""")).as("j")) // non-string: vacuous
    val suite = graft.compile.SuiteCompiler.compile(
      graft.spec.Spec.fromJson(
        """{"columns":{"j":{"json":{
             "properties":{"payload":{
               "contentEncoding":"base64",
               "contentMediaType":"application/json",
               "contentSchema":{"required":["k"],
                 "properties":{"k":{"minimum":10}}}}}}}}}"""),
      df.schema)
    graft.exec.Validator.violations(df, suite, Seq("doc_id"))
      .select(col("doc_id"), col("keyword"), col("instance_path"))
      .orderBy("doc_id", "keyword")
  }

  // branch map (m = doc_id % 5): m=0 valid; m=1 contentEncoding;
  // m=2 contentMediaType (decodes, not JSON); m=3 contentSchema minimum
  // (decoded k=3); m=4 non-string payload → all content* vacuous
  val sqlValidateContentDynamic: String =
    """WITH d AS (SELECT doc_id, doc_id % 5 AS m FROM documents)
       SELECT * FROM (
         SELECT doc_id, 'columns/j/json/properties/payload/contentEncoding' AS keyword,
                'j!json/payload' AS instance_path
           FROM d WHERE m = 1
         UNION ALL
         SELECT doc_id, 'columns/j/json/properties/payload/contentMediaType',
                'j!json/payload'
           FROM d WHERE m = 2
         UNION ALL
         SELECT doc_id, 'columns/j/json/properties/payload/contentSchema/properties/k/minimum',
                'j!json/payload!json/k'
           FROM d WHERE m = 3
       ) ORDER BY doc_id, keyword"""

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q_validate_json_dynamic2" -> ((qValidateJsonDynamic2 _, sqlValidateJsonDynamic2)),
    "q_validate_content_dynamic" -> ((qValidateContentDynamic _, sqlValidateContentDynamic)),
    "q_drift_ks" -> ((qDriftKs _, sqlDriftKs)),
    "q_drift_psi" -> ((qDriftPsi _, sqlDriftPsi)),
    "q_verdict" -> ((qVerdict _, sqlVerdict)),
    "q_validate_json_dynamic" -> ((qValidateJsonDynamic _, sqlValidateJsonDynamic))
  )
}
