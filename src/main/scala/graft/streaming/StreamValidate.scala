package graft.streaming

import graft.compile.CompiledSuite
import graft.exec.Validator
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming validation. The reference is strictly batch (no concurrency
  * anywhere — SURVEY.md §2.11), but a Spark-native engine gets streaming
  * nearly for free: the fused row pass is pure column expressions, so the
  * SAME compiled suite annotates a streaming DataFrame unchanged. Only
  * table-level constraints change shape — uniqueness/drift become windowed,
  * watermarked aggregations (bounded state), because global distinct over an
  * unbounded stream is not a thing.
  *
  * Scale notes: per-micro-batch work is the same fused codegen pass; the
  * windowed aggregations carry watermarks so state is evicted; keyword
  * violation-rate state is O(windows × keywords).
  */
object StreamValidate {

  /** Row-level validation on a stream: identical plan as batch. */
  def annotate(stream: DataFrame, suite: CompiledSuite): DataFrame =
    Validator.annotate(stream, suite)

  /** Registered constraint FAMILIES on a stream: a per-row (stateless)
    * family — containerMagic, transcriptConsistency, audioSignal — compiles
    * to a narrow select/explode plan, so the SAME violations() frame streams
    * unchanged, emitting (keyword, instance_path, detail) rows per
    * micro-batch. A family that genuinely needs aggregation or a join
    * raises Spark's unsupported-operation error at query start — loud,
    * never a silently-wrong streamed result.
    */
  def familyViolations(
      stream: DataFrame,
      suite: CompiledSuite,
      refTables: Map[String, DataFrame] = Map.empty): DataFrame = {
    val fams = suite.tableConstraints.collect {
      case c: graft.spec.CustomConstraint => c
    }
    fams.map(_.violations(stream, refTables))
      .reduceOption(_ unionByName _)
      // no families: an empty frame DERIVED from the input, so a streaming
      // caller still gets a streaming Dataset (writeStream keeps working)
      .getOrElse(stream.where(lit(false)).select(
        lit("").as("keyword"), lit("").as("instance_path"),
        lit("").as("detail")))
  }

  /** Windowed violation counts by keyword: the streaming analogue of the
    * flat BasicOutput — one row per (event-time window, keyword) with a
    * violation count, watermarked for state eviction.
    */
  def violationRates(
      stream: DataFrame,
      suite: CompiledSuite,
      tsCol: String,
      windowLen: String = "1 hour",
      watermark: String = "10 minutes"
  ): DataFrame =
    annotate(stream, suite)
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), explode(col("violations")).as("v"))
      .groupBy(window(col(tsCol), windowLen), col("v.keyword").as("keyword"))
      .agg(count(lit(1)).as("violations"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("keyword"), col("violations"))

  /** Windowed row verdict summary (rows / invalid rows per window). */
  def verdictRates(
      stream: DataFrame,
      suite: CompiledSuite,
      tsCol: String,
      windowLen: String = "1 hour",
      watermark: String = "10 minutes"
  ): DataFrame =
    annotate(stream, suite)
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(count(lit(1)).as("rows"),
        sum(when(col("valid"), 0L).otherwise(1L)).as("invalid_rows"))
      .select(col("window.start").as("window_start"),
        col("rows"), col("invalid_rows"))

  /** Streaming exact dedup: keep the first row per key, with watermark-bound
    * state — composes Spark's own `dropDuplicatesWithinWatermark` (built-in
    * state management beats custom flatMapGroupsWithState here; preference
    * order per the build rules).
    */
  def dedupStream(stream: DataFrame, keyCol: String, tsCol: String,
                  watermark: String = "10 minutes"): DataFrame =
    stream
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Windowed PSI drift: per event-time window, the PSI of `column`'s
    * fixed-edge histogram against reference proportions. Built as ONE
    * stateful aggregation (per-bucket conditional sums — Structured
    * Streaming forbids chained aggregations), PSI computed in the final
    * projection; watermark bounds state at O(windows × buckets).
    */
  def windowedPsiDrift(
      stream: DataFrame,
      column: String,
      edges: Seq[Double],
      refProps: Seq[Double],
      tsCol: String,
      windowLen: String = "1 hour",
      watermark: String = "10 minutes"
  ): DataFrame = {
    require(refProps.size == edges.size + 1, "refProps must have edges+1 entries")
    val eps = 1e-6
    val c = col(column).cast("double")
    val bucket = edges.zipWithIndex.reverse.foldLeft(lit(edges.size): Column) {
      case (acc, (e, i)) => when(c < e, i).otherwise(acc)
    }
    val bucketAggs = (0 to edges.size).map(i =>
      sum(when(c.isNotNull && bucket === i, 1L).otherwise(0L)).as(s"__b_$i"))
    val counts = (0 to edges.size).map(i => col(s"__b_$i"))
    val observed = counts.reduce(_ + _)
    val total = greatest(observed, lit(1L)).cast("double")
    val psi = (0 to edges.size).map { i =>
      val p = greatest(counts(i) / total, lit(eps))
      val q = greatest(lit(refProps(i)), lit(eps))
      (p - q) * log(p / q)
    }.reduce(_ + _)
    stream
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(bucketAggs.head, bucketAggs.tail: _*)
      // a window with ZERO non-null observations carries no drift evidence:
      // psi is NULL there, not the huge all-eps-vs-ref artifact
      .select(col("window.start").as("window_start"),
        when(observed === 0, lit(null).cast("double")).otherwise(psi).as("psi"))
  }

  /** In-window duplicate keys (streaming uniqueness): key counts per
    * watermarked window; count > 1 ⇒ duplicate within the window. Global
    * uniqueness on an unbounded stream is intentionally unsupported —
    * use the batch ledgered run for that.
    */
  def windowedDuplicates(
      stream: DataFrame,
      keyCol: String,
      tsCol: String,
      windowLen: String = "1 hour",
      watermark: String = "10 minutes"
  ): DataFrame =
    stream
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(col("window.start").as("window_start"), col(keyCol), col("n"))
}
