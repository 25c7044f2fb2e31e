package graft.table

import graft.spec._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-level constraint execution — the engine's counterpart to the
  * reference's custom-vocabulary checks (uniqueness modeled on the
  * `uniqueKeys` vocabulary example,
  * /root/reference/example_vocab_uniquekeys_test.go:14-43). These are the
  * only operators in the engine that shuffle; every one is written for the
  * 100 TB case:
  *
  *  - uniqueness: hash aggregation — Spark's partial (map-side) aggregation
  *    IS the salting for a count: each executor pre-counts its local keys, so
  *    a hot key contributes one partial row per task, not 10^9 shuffled rows.
  *    The duplicate-key join-back is broadcast (duplicate sets are small) and
  *    AQE skew-join covers the pathological case.
  *  - referential: broadcast LEFT ANTI against small reference sets (the
  *    common dimension case); sort-merge anti with AQE for large refs.
  *  - drift: fixed-bucket histogram (PSI) and quantile-sketch ECDF (KS) —
  *    both partial+final aggregations, one shuffle of O(buckets) rows.
  *  - stats: one single-pass aggregation (count/nulls/min/max/HLL
  *    distinct/approx quantiles) per table.
  */
object TableChecks {

  /** Violation rows share the row-level shape (keyword, instance_path,
    * detail) so row + table violations union into one output table.
    */
  private val vioCols = Seq("keyword", "instance_path", "detail")

  /** Keys of `cols` appearing more than once, with their counts.
    * Output: cols..., dup_count.
    */
  def duplicateKeys(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** Uniqueness violations as standard violation rows. */
  def uniqueViolations(df: DataFrame, u: Unique): DataFrame = {
    val keyStr = concat_ws("|", u.columns.map(c => col(c).cast("string")): _*)
    duplicateKeys(df, u.columns).select(
      lit(s"table/unique/${u.columns.mkString(",")}").as("keyword"),
      keyStr.as("instance_path"),
      concat(lit("unique: key appears "), col("dup_count").cast("string"), lit(" times")).as("detail"))
  }

  /** Rows of `df` whose non-null key tuple has no match in the reference
    * table (LEFT ANTI). Null keys are skipped (a null FK is "absent", policed
    * by `required` if needed).
    */
  def fkViolations(df: DataFrame, fk: ForeignKey, refDf: DataFrame): DataFrame = {
    val ref = refDf.select(fk.refColumns.map(col): _*).dropDuplicates(fk.refColumns)
    val refSide = if (fk.broadcastRef) broadcast(ref) else ref
    val joinCond = fk.columns.zip(fk.refColumns)
      .map { case (c, r) => df(c) === refSide(r) }
      .reduce(_ && _)
    val nonNull = fk.columns.map(c => df(c).isNotNull).reduce(_ && _)
    val keyStr = concat_ws("|", fk.columns.map(c => col(c).cast("string")): _*)
    df.filter(nonNull)
      .join(refSide, joinCond, "left_anti")
      .groupBy(fk.columns.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .select(
        lit(s"table/foreignKey/${fk.columns.mkString(",")}->${fk.refTable}").as("keyword"),
        keyStr.as("instance_path"),
        concat(lit("foreignKey: "), col("n").cast("string"),
          lit(s" row(s) reference missing key in ${fk.refTable}")).as("detail"))
  }

  /** Population Stability Index of `column` vs pinned reference proportions
    * over fixed bucket edges. One partial+final aggregation; result is a
    * single driver-side double (formula on the driver, histogram on the
    * cluster — SURVEY.md §2.9).
    */
  def psi(df: DataFrame, column: String, edges: Seq[Double], refProps: Seq[Double]): Double = {
    val eps = 1e-6
    val hist = histogram(df, column, edges)
    val total = hist.sum.toDouble.max(1.0)
    hist.zip(refProps).map { case (n, q0) =>
      val p = math.max(n / total, eps)
      val q = math.max(q0, eps)
      (p - q) * math.log(p / q)
    }.sum
  }

  /** Bucket counts for fixed edges: bucket 0 = (-inf, e0), i = [e(i-1), e(i)),
    * last = [eN, +inf). NULLs excluded. Returns edges.size+1 counts.
    */
  def histogram(df: DataFrame, column: String, edges: Seq[Double]): Array[Long] = {
    val c = col(column).cast("double")
    // width_bucket(v, ...) needs uniform buckets; arbitrary edges via a fused
    // CASE chain (codegen'd, one pass, partial agg → O(buckets) shuffle rows)
    // build the CASE chain so the SMALLEST edge is the outermost test
    val bucket = edges.zipWithIndex.reverse.foldLeft(lit(edges.size): Column) {
      case (acc, (e, i)) => when(c < e, i).otherwise(acc)
    }
    val counts = df.filter(c.isNotNull)
      .groupBy(bucket.as("b")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    Array.tabulate(edges.size + 1)(i => counts.getOrElse(i, 0L))
  }

  /** Two-sample-style KS statistic of `column` against a pinned reference
    * quantile vector (refQuantiles(i) ≈ value at rank i/(n-1)): sup over the
    * reference quantile points of |ECDF_data(q) - i/(n-1)|. The data-side
    * ECDF at the fixed points is ONE aggregation (no sort, no window): each
    * point is a sum(v <= q)/count — fused into a single pass.
    */
  def ksAgainstQuantiles(df: DataFrame, column: String, refQuantiles: Seq[Double]): Double = {
    val c = col(column).cast("double")
    val aggs = refQuantiles.zipWithIndex.map { case (q, i) =>
      sum(when(c <= q, 1L).otherwise(0L)).as(s"le_$i")
    } :+ count(c).as("n")
    val row = df.filter(c.isNotNull).agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getAs[Long]("n").toDouble.max(1.0)
    val m = refQuantiles.size
    refQuantiles.indices.map { i =>
      val ecdf = row.getAs[Long](s"le_$i") / n
      val refCdf = if (m == 1) 1.0 else i.toDouble / (m - 1)
      math.abs(ecdf - refCdf)
    }.max
  }

  /** Exact two-sample KS between two columns (small/medium data; the oracle
    * arm). Distributed-friendly: ECDFs computed per distinct value via
    * aggregation, sup over the merged distinct-value set.
    */
  def ksTwoSample(a: DataFrame, aCol: String, b: DataFrame, bCol: String): Double = {
    val av = a.select(col(aCol).cast("double").as("v")).filter(col("v").isNotNull)
    val bv = b.select(col(bCol).cast("double").as("v")).filter(col("v").isNotNull)
    val na = av.count().toDouble
    val nb = bv.count().toDouble
    val union = av.withColumn("src", lit("a")).union(bv.withColumn("src", lit("b")))
    val perValue = union.groupBy("v").agg(
      sum(when(col("src") === "a", 1L).otherwise(0L)).as("ca"),
      sum(when(col("src") === "b", 1L).otherwise(0L)).as("cb"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    perValue
      .withColumn("fa", sum("ca").over(w) / na)
      .withColumn("fb", sum("cb").over(w) / nb)
      .agg(max(abs(col("fa") - col("fb"))).as("ks"))
      .collect()(0).getDouble(0)
  }

  /** Drift violations: empty DataFrame when within threshold, one violation
    * row otherwise.
    */
  def driftViolations(df: DataFrame, d: Drift): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val value = d.method match {
      case "psi" => psi(df, d.column, d.edges, d.refProportions)
      case "ks"  => ksAgainstQuantiles(df, d.column, d.refQuantiles)
    }
    val rows =
      if (value <= d.threshold) Seq.empty[(String, String, String)]
      else Seq((s"table/drift/${d.method}/${d.column}", d.column,
        f"drift: ${d.method} = $value%.6f exceeds threshold ${d.threshold}%.6f"))
    rows.toDF(vioCols: _*)
  }

  /** Column statistics in ONE pass: count, nulls, min, max, HLL distinct,
    * approximate quartiles (SURVEY.md §2.9). Output: one row per column.
    */
  def stats(df: DataFrame, columns: Seq[String]): DataFrame = {
    val numericSet = df.schema.fields
      .filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      .map(_.name).toSet
    val aggs: Seq[Column] = columns.flatMap { c =>
      val base = Seq(
        count(col(c)).as(s"${c}__count"),
        sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"),
        approx_count_distinct(col(c)).as(s"${c}__distinct"))
      if (numericSet.contains(c))
        base :+ percentile_approx(col(c).cast("double"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as(s"${c}__quartiles")
      else base
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // unpivot to one row per column
    val spark = df.sparkSession
    import spark.implicits._
    val r = row.collect()(0)
    columns.map { c =>
      val q = if (numericSet.contains(c))
        Option(r.getAs[scala.collection.Seq[Double]](s"${c}__quartiles")).map(_.mkString(",")).getOrElse("")
      else ""
      (c, r.getAs[Long](s"${c}__count"), r.getAs[Long](s"${c}__nulls"),
        r.getAs[String](s"${c}__min"), r.getAs[String](s"${c}__max"),
        r.getAs[Long](s"${c}__distinct"), q)
    }.toDF("column", "count", "nulls", "min", "max", "approx_distinct", "quartiles")
  }
}
