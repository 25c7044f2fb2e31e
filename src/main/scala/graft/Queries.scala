package graft

import graft.compile.SuiteCompiler
import graft.exec.{Engine, Validator}
import graft.spec.{ForeignKey, Spec, Unique}
import graft.table.TableChecks
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The driver-facing operator battery: each entry exercises one engine
  * operator (SURVEY.md §2) over the shared testdata tables, paired with an
  * equivalent DuckDB SQL oracle in [[SparkEntry.oracleSql]].
  *
  * Results are deterministically ordered and avoid raw floating-point
  * aggregation (decimal casts) so the driver's hash compare is stable.
  */
object Queries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Violations of a spec over a table, projected to key cols + keyword +
    * instance_path (detail excluded: number formatting is engine-specific).
    */
  private def vios(df: DataFrame, specJson: String, keys: Seq[String]): DataFrame = {
    val suite = SuiteCompiler.compile(Spec.fromJson(specJson), df.schema)
    Validator.violations(df, suite, keys)
      .select((keys :+ "keyword" :+ "instance_path").map(col): _*)
      .orderBy((keys :+ "keyword").map(col): _*)
  }

  // ---- §2.2 number keywords (+ §2.7 ref addressing: the discount rule is
  // reached through an arbitrary-pointer $ref and the price rule through a
  // named $anchor, so both resolution paths are oracle-gated) ----
  def qValidateBounds(spark: SparkSession, dir: String): DataFrame =
    vios(t(spark, dir, "lineitem"),
      """{"$defs":{
           "shared":{"properties":{"disc":{"maximum":0.08}}},
           "price":{"$anchor":"priceRule","exclusiveMinimum":1500}},
          "columns":{
           "l_quantity":{"minimum":5,"maximum":45},
           "l_discount":{"$ref":"#/$defs/shared/properties/disc"},
           "l_extendedprice":{"$ref":"#priceRule"}}}""",
      Seq("l_orderkey", "l_linenumber"))

  val sqlValidateBounds: String =
    """SELECT * FROM (
         SELECT l_orderkey, l_linenumber, 'columns/l_quantity/minimum' AS keyword, 'l_quantity' AS instance_path
           FROM lineitem WHERE l_quantity IS NOT NULL AND NOT (l_quantity >= 5)
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'columns/l_quantity/maximum', 'l_quantity'
           FROM lineitem WHERE l_quantity IS NOT NULL AND NOT (l_quantity <= 45)
         UNION ALL
         SELECT l_orderkey, l_linenumber, '$defs/shared/properties/disc/maximum', 'l_discount'
           FROM lineitem WHERE l_discount IS NOT NULL AND NOT (l_discount <= 0.08)
         UNION ALL
         SELECT l_orderkey, l_linenumber, '$defs/price/exclusiveMinimum', 'l_extendedprice'
           FROM lineitem WHERE l_extendedprice IS NOT NULL AND NOT (l_extendedprice > 1500)
       ) ORDER BY l_orderkey, l_linenumber, keyword"""

  // ---- §2.2 enum + const ----
  def qValidateEnumConst(spark: SparkSession, dir: String): DataFrame =
    vios(t(spark, dir, "orders"),
      """{"columns":{
           "o_orderpriority":{"enum":["1-URGENT","2-HIGH","3-MEDIUM"]},
           "o_orderstatus":{"const":"O"}}}""",
      Seq("o_orderkey"))

  val sqlValidateEnumConst: String =
    """SELECT * FROM (
         SELECT o_orderkey, 'columns/o_orderpriority/enum' AS keyword, 'o_orderpriority' AS instance_path
           FROM orders WHERE o_orderpriority IS NOT NULL
            AND o_orderpriority NOT IN ('1-URGENT','2-HIGH','3-MEDIUM')
         UNION ALL
         SELECT o_orderkey, 'columns/o_orderstatus/const', 'o_orderstatus'
           FROM orders WHERE o_orderstatus IS NOT NULL AND o_orderstatus <> 'O'
       ) ORDER BY o_orderkey, keyword"""

  // ---- §2.2 string keywords (char-length semantics + regex search) ----
  def qValidateStrings(spark: SparkSession, dir: String): DataFrame =
    vios(t(spark, dir, "documents"),
      """{"columns":{
           "text":{"minLength":100,"maxLength":500,"pattern":"spark"},
           "lang":{"enum":["en","fr","es","de","zh"]}}}""",
      Seq("doc_id"))

  val sqlValidateStrings: String =
    """SELECT * FROM (
         SELECT doc_id, 'columns/text/minLength' AS keyword, 'text' AS instance_path
           FROM documents WHERE text IS NOT NULL AND NOT (length(text) >= 100)
         UNION ALL
         SELECT doc_id, 'columns/text/maxLength', 'text'
           FROM documents WHERE text IS NOT NULL AND NOT (length(text) <= 500)
         UNION ALL
         SELECT doc_id, 'columns/text/pattern', 'text'
           FROM documents WHERE text IS NOT NULL AND NOT regexp_matches(text, 'spark')
         UNION ALL
         SELECT doc_id, 'columns/lang/enum', 'lang'
           FROM documents WHERE lang IS NOT NULL AND lang NOT IN ('en','fr','es','de','zh')
       ) ORDER BY doc_id, keyword"""

  // ---- §2.2 multipleOf (exact decimal divisibility) ----
  def qValidateMultipleOf(spark: SparkSession, dir: String): DataFrame =
    vios(t(spark, dir, "lineitem"),
      """{"columns":{"l_quantity":{"multipleOf":5}}}""",
      Seq("l_orderkey", "l_linenumber"))

  val sqlValidateMultipleOf: String =
    """SELECT l_orderkey, l_linenumber, 'columns/l_quantity/multipleOf' AS keyword,
              'l_quantity' AS instance_path
       FROM lineitem
       WHERE l_quantity IS NOT NULL
         AND NOT (CAST(l_quantity AS DECIMAL(38,12)) % 5 = 0)
       ORDER BY l_orderkey, l_linenumber"""

  // ---- §2.3 format scalar functions over derived columns ----
  private def withDerivedFormats(df: DataFrame): DataFrame = {
    val h = md5(col("doc_id").cast("string"))
    val uuid = concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
    df.select(
      col("doc_id"),
      when(pmod(col("doc_id"), lit(7)) === 0, lit("not-a-uuid")).otherwise(uuid).as("uid"),
      when(pmod(col("doc_id"), lit(5)) === 0, lit("2024-02-30"))
        .otherwise(concat(lit("2024-"),
          lpad((pmod(col("doc_id"), lit(9)) + 1).cast("string"), 2, "0"), lit("-"),
          lpad((pmod(col("doc_id"), lit(8)) + 1).cast("string"), 2, "0"))).as("d"),
      concat(pmod(col("doc_id"), lit(300)).cast("string"), lit(".10.20.30")).as("ip"))
  }

  def qValidateFormats(spark: SparkSession, dir: String): DataFrame =
    vios(withDerivedFormats(t(spark, dir, "documents")),
      """{"columns":{
           "uid":{"format":"uuid"},
           "d":{"format":"date"},
           "ip":{"format":"ipv4"}}}""",
      Seq("doc_id"))

  val sqlValidateFormats: String =
    """WITH derived AS (
         SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN 'not-a-uuid' ELSE
             substr(md5(CAST(doc_id AS VARCHAR)),1,8) || '-' ||
             substr(md5(CAST(doc_id AS VARCHAR)),9,4) || '-' ||
             substr(md5(CAST(doc_id AS VARCHAR)),13,4) || '-' ||
             substr(md5(CAST(doc_id AS VARCHAR)),17,4) || '-' ||
             substr(md5(CAST(doc_id AS VARCHAR)),21,12) END AS uid,
           CASE WHEN doc_id % 5 = 0 THEN '2024-02-30' ELSE
             '2024-' || lpad(CAST(doc_id % 9 + 1 AS VARCHAR),2,'0') || '-' ||
             lpad(CAST(doc_id % 8 + 1 AS VARCHAR),2,'0') END AS d,
           CAST(doc_id % 300 AS VARCHAR) || '.10.20.30' AS ip
         FROM documents)
       SELECT * FROM (
         SELECT doc_id, 'columns/uid/format' AS keyword, 'uid' AS instance_path
           FROM derived WHERE NOT regexp_matches(uid,
             '^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$')
         UNION ALL
         SELECT doc_id, 'columns/d/format', 'd'
           FROM derived WHERE NOT (regexp_matches(d, '^[0-9]{4}-[0-9]{2}-[0-9]{2}$')
             AND TRY_CAST(d AS DATE) IS NOT NULL)
         UNION ALL
         SELECT doc_id, 'columns/ip/format', 'ip'
           FROM derived WHERE NOT regexp_matches(ip,
             '^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$')
       ) ORDER BY doc_id, keyword"""

  // ---- §2.6 composition: oneOf + if/then over the row ----
  def qValidateComposition(spark: SparkSession, dir: String): DataFrame =
    vios(t(spark, dir, "part"),
      """{"columns":{"p_size":{"oneOf":[{"maximum":10},{"minimum":5}]}},
          "row":[{"if":{"properties":{"p_brand":{"const":"Brand#13"}}},
                  "then":{"properties":{"p_size":{"maximum":25}}}}]}""",
      Seq("p_partkey"))

  val sqlValidateComposition: String =
    """SELECT * FROM (
         SELECT p_partkey, 'columns/p_size/oneOf' AS keyword, 'p_size' AS instance_path
           FROM part WHERE p_size IS NOT NULL
             AND (CASE WHEN p_size <= 10 THEN 1 ELSE 0 END
                + CASE WHEN p_size >= 5 THEN 1 ELSE 0 END) <> 1
         UNION ALL
         SELECT p_partkey, 'row/0/then/properties/p_size/maximum', 'p_size'
           FROM part WHERE (p_brand IS NULL OR p_brand = 'Brand#13')
             AND NOT (p_size IS NULL OR p_size <= 25)
       ) ORDER BY p_partkey, keyword"""

  // ---- §2.2 contentSchema: JSON-in-string validation ----
  def qValidateJson(spark: SparkSession, dir: String): DataFrame =
    vios(t(spark, dir, "events"),
      """{"columns":{"props":{
           "contentMediaType":"application/json",
           "contentSchema":{"type":"object",
             "properties":{"k":{"type":"integer","minimum":10,"maximum":90}}}}}}""",
      Seq("event_id"))

  // Semantically complete mirror of the Spark plan: the contentMediaType
  // branch fires on unparseable JSON, and the k bounds fire ONLY when
  // from_json would yield a non-null long — i.e. root is an object and k is
  // an integral JSON number in int64 range (Spark's PERMISSIVE from_json
  // nulls the row for non-object roots, fractional/string/overflow k).
  val sqlValidateJson: String =
    """WITH typed AS (
         SELECT event_id, props,
                CASE WHEN props IS NULL THEN 'missing'
                     WHEN json_valid(props) THEN json_type(json(props))
                     ELSE 'invalid' END AS jt,
                CASE WHEN json_valid(props) AND json_type(json(props)) = 'OBJECT'
                      AND json_type(json(props), '$.k') IN ('BIGINT', 'UBIGINT')
                     THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT) END AS kv
         FROM events)
       SELECT * FROM (
         SELECT event_id, 'columns/props/contentMediaType' AS keyword,
                'props' AS instance_path
           FROM typed WHERE jt = 'invalid'
         UNION ALL
         SELECT event_id, 'columns/props/contentSchema/properties/k/minimum', 'props!json/k'
           FROM typed WHERE kv IS NOT NULL AND NOT (kv >= 10)
         UNION ALL
         SELECT event_id, 'columns/props/contentSchema/properties/k/maximum', 'props!json/k'
           FROM typed WHERE kv IS NOT NULL AND NOT (kv <= 90)
       ) ORDER BY event_id, keyword"""

  // ---- §2.4 object keywords over a map column: properties +
  // patternProperties + dependentSchemas + unevaluatedProperties ----
  def qValidateObjectOps(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "documents")
    // derived map column: every doc carries {lang, text}; every third doc an
    // 'extra' key that no keyword evaluates
    val m = when(pmod(col("doc_id"), lit(3)) === 0,
        map(lit("lang"), col("lang"),
          lit("text"), substring(col("text"), 1, 10),
          lit("extra"), lit("x")))
      .otherwise(
        map(lit("lang"), col("lang"),
          lit("text"), substring(col("text"), 1, 10)))
    vios(base.select(col("doc_id"), m.as("m")),
      """{"columns":{"m":{
           "properties":{"lang":{"enum":["en","fr","es","de","zh"]}},
           "patternProperties":{"^te":{"minLength":1}},
           "dependentSchemas":{"extra":{"required":["title"]}},
           "unevaluatedProperties":false}}}""",
      Seq("doc_id"))
  }

  // semantically complete: includes the patternProperties branch (fires on
  // EMPTY text — NULL map values are vacuous per the engine's convention;
  // zero rows on the current corpus but the oracle must not rely on that
  // data invariant) and the lang-NULL vacuous convention
  val sqlValidateObjectOps: String =
    """WITH d AS (SELECT doc_id, lang, text,
                    (doc_id % 3 = 0) AS has_extra FROM documents)
       SELECT * FROM (
         SELECT doc_id, 'columns/m/properties/lang' AS keyword, 'm' AS instance_path
           FROM d WHERE lang NOT IN ('en','fr','es','de','zh')
         UNION ALL
         SELECT doc_id, 'columns/m/patternProperties/^te', 'm'
           FROM d WHERE text IS NOT NULL AND length(substr(text, 1, 10)) < 1
         UNION ALL
         SELECT doc_id, 'columns/m/dependentSchemas/extra/required', 'm'
           FROM d WHERE has_extra
         UNION ALL
         SELECT doc_id, 'columns/m/unevaluatedProperties', 'm'
           FROM d WHERE has_extra
       ) ORDER BY doc_id, keyword"""

  // ---- §2.9 uniqueness (hash agg w/ map-side partials) ----
  def qUnique(spark: SparkSession, dir: String): DataFrame =
    TableChecks.uniqueViolations(t(spark, dir, "orders"), Unique(Vector("o_custkey")))
      .orderBy("instance_path")

  val sqlUnique: String =
    """SELECT 'table/unique/o_custkey' AS keyword,
              CAST(o_custkey AS VARCHAR) AS instance_path,
              'unique: key appears ' || CAST(count(*) AS VARCHAR) || ' times' AS detail
       FROM orders GROUP BY o_custkey HAVING count(*) > 1
       ORDER BY instance_path"""

  // ---- §2.9 referential integrity (broadcast anti-join) ----
  def qReferential(spark: SparkSession, dir: String): DataFrame = {
    val refSmall = t(spark, dir, "nation").filter(col("n_nationkey") < 20)
    TableChecks.fkViolations(
      t(spark, dir, "customer"),
      ForeignKey(Vector("c_nationkey"), "nation_small", Vector("n_nationkey")),
      refSmall
    ).orderBy("instance_path")
  }

  val sqlReferential: String =
    """SELECT 'table/foreignKey/c_nationkey->nation_small' AS keyword,
              CAST(c_nationkey AS VARCHAR) AS instance_path,
              'foreignKey: ' || CAST(count(*) AS VARCHAR) ||
                ' row(s) reference missing key in nation_small' AS detail
       FROM customer
       WHERE c_nationkey IS NOT NULL
         AND c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_nationkey < 20)
       GROUP BY c_nationkey
       ORDER BY instance_path"""

  // ---- §2.9 column stats (exact arm — oracle-checkable) ----
  def qStatsExact(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice", "l_partkey")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}_count"),
        sum(col(c).isNull.cast("long")).as(s"${c}_nulls"),
        min(col(c)).cast("string").as(s"${c}_min"),
        max(col(c)).cast("string").as(s"${c}_max"),
        countDistinct(col(c)).as(s"${c}_distinct"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  val sqlStatsExact: String =
    """SELECT
         count(l_quantity) AS l_quantity_count,
         CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_quantity_nulls,
         CAST(min(l_quantity) AS VARCHAR) AS l_quantity_min,
         CAST(max(l_quantity) AS VARCHAR) AS l_quantity_max,
         count(DISTINCT l_quantity) AS l_quantity_distinct,
         count(l_extendedprice) AS l_extendedprice_count,
         CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_extendedprice_nulls,
         CAST(min(l_extendedprice) AS VARCHAR) AS l_extendedprice_min,
         CAST(max(l_extendedprice) AS VARCHAR) AS l_extendedprice_max,
         count(DISTINCT l_extendedprice) AS l_extendedprice_distinct,
         count(l_partkey) AS l_partkey_count,
         CAST(sum(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_partkey_nulls,
         CAST(min(l_partkey) AS VARCHAR) AS l_partkey_min,
         CAST(max(l_partkey) AS VARCHAR) AS l_partkey_max,
         count(DISTINCT l_partkey) AS l_partkey_distinct
       FROM lineitem"""

  // ---- §2.11 aggregation (TPC-H Q1 shape, decimal-exact sums) ----
  def qAggPricing(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val dq = col("l_quantity").cast("decimal(18,2)")
    val dp = col("l_extendedprice").cast("decimal(18,2)")
    val dd = col("l_discount").cast("decimal(18,2)")
    // sum() results are rendered as fixed-scale STRINGS on BOTH the Spark and
    // DuckDB sides: the driver's hash renders DECIMAL columns differently
    // across the two readers even when values are identical (r2 verdict), and
    // scale-2/4 decimal→string is deterministic and identical in both engines
    // (the q_stats_exact min/max→VARCHAR precedent).
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dq).cast("decimal(38,2)").cast("string").as("sum_qty"),
        sum(dp).cast("decimal(38,2)").cast("string").as("sum_base_price"),
        sum((dp * (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") - dd))
          .cast("decimal(28,4)")).cast("decimal(38,4)").cast("string").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val sqlAggPricing: String =
    """SELECT l_returnflag, l_linestatus,
              CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_qty,
              CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_base_price,
              CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                  AS DECIMAL(28,4))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_disc_price,
              count(*) AS count_order
       FROM lineitem GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  // ---- §2.11 window (top-N per key, deterministic tie-break) ----
  def qWindowTopN(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "rn")
      .orderBy("o_custkey", "rn")
  }

  val sqlWindowTopN: String =
    """SELECT o_custkey, o_orderkey, rn FROM (
         SELECT o_custkey, o_orderkey,
                row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
         FROM orders) WHERE rn <= 3
       ORDER BY o_custkey, rn"""

  // ---- §2.11 broadcast join + aggregation ----
  def qJoinBrandRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val p = t(spark, dir, "part")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy("p_brand")
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("decimal(38,2)")
          .cast("string").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  val sqlJoinBrandRevenue: String =
    """SELECT p_brand,
              CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS revenue,
              count(*) AS n_items
       FROM lineitem JOIN part ON l_partkey = p_partkey
       GROUP BY p_brand ORDER BY p_brand"""

  // ---- §2.11 sort / top-N ----
  def qSortTopN(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(10)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")

  val sqlSortTopN: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice
       FROM lineitem
       ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
       LIMIT 10"""

  // ---- time-window aggregation (events) ----
  def qEventsHourly(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("decimal(38,4)")
          .cast("string").as("sum_value"))
      .select(col("w.start").cast("string").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("hour_start", "event_type")

  val sqlEventsHourly: String =
    """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour_start, event_type,
              count(*) AS n,
              CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_value
       FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type"""

  /** Batch-1 registry (validation + table + relational operators). */
  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q_validate_bounds" -> ((qValidateBounds _, sqlValidateBounds)),
    "q_validate_enum_const" -> ((qValidateEnumConst _, sqlValidateEnumConst)),
    "q_validate_strings" -> ((qValidateStrings _, sqlValidateStrings)),
    "q_validate_multipleof" -> ((qValidateMultipleOf _, sqlValidateMultipleOf)),
    "q_validate_formats" -> ((qValidateFormats _, sqlValidateFormats)),
    "q_validate_composition" -> ((qValidateComposition _, sqlValidateComposition)),
    "q_validate_json" -> ((qValidateJson _, sqlValidateJson)),
    "q_validate_object_ops" -> ((qValidateObjectOps _, sqlValidateObjectOps)),
    "q_unique" -> ((qUnique _, sqlUnique)),
    "q_referential" -> ((qReferential _, sqlReferential)),
    "q_stats_exact" -> ((qStatsExact _, sqlStatsExact)),
    "q_agg_pricing" -> ((qAggPricing _, sqlAggPricing)),
    "q_window_topn" -> ((qWindowTopN _, sqlWindowTopN)),
    "q_join_brand_revenue" -> ((qJoinBrandRevenue _, sqlJoinBrandRevenue)),
    "q_sort_topn" -> ((qSortTopN _, sqlSortTopN)),
    "q_events_hourly" -> ((qEventsHourly _, sqlEventsHourly))
  )
}
