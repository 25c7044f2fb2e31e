package graft.exec

import graft.compile.{CompiledSuite, SuiteCompiler}
import graft.spec._
import graft.table.TableChecks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top-level entry: compile a spec against a table and run it — the engine's
  * analogue of the reference's `Compiler.Compile` + `Schema.Validate`
  * lifecycle (/root/reference/compiler.go:153-214,
  * /root/reference/validator.go:15-17), re-shaped for Spark: compilation is
  * driver-only; execution is a handful of declarative DataFrame plans.
  */
object Engine {

  /** Compile: spec JSON + concrete table → compiled suite. */
  def compile(specJson: String, df: DataFrame): CompiledSuite =
    SuiteCompiler.compile(Spec.fromJson(specJson), df.schema)

  /** All violations — row-level (keyed by `keyCols`) UNION table-level — in
    * the reference's flat BasicOutput shape
    * (/root/reference/output.go:126-152). `refTables` resolves foreignKey
    * targets by name.
    */
  def allViolations(
      df: DataFrame,
      suite: CompiledSuite,
      keyCols: Seq[String],
      refTables: Map[String, DataFrame] = Map.empty
  ): DataFrame = {
    val key = concat_ws("|", keyCols.map(c => col(c).cast("string")): _*)
    val rowVios = Validator.violations(df, suite, keyCols)
      .select(col("keyword"),
        concat(key, lit("/"), col("instance_path")).as("instance_path"),
        col("detail"))
    val tableVios: Seq[DataFrame] = suite.tableConstraints.flatMap {
      case u: Unique => Some(TableChecks.uniqueViolations(df, u))
      case fk: ForeignKey =>
        val ref = refTables.getOrElse(fk.refTable,
          throw SpecError("#/table/foreignKey", s"no table named '${fk.refTable}' provided"))
        Some(TableChecks.fkViolations(df, fk, ref))
      case d: Drift => Some(TableChecks.driftViolations(df, d))
      case c: CustomConstraint => Some(c.violations(df, refTables))
      case _ => None
    }
    tableVios.foldLeft(rowVios)(_ unionByName _)
  }

  /** Table-level violations only (unique / FK / drift / custom) — used by
    * the ledgered run's global phase so the row pass isn't recomputed.
    */
  def tableViolations(
      df: DataFrame,
      suite: CompiledSuite,
      refTables: Map[String, DataFrame] = Map.empty
  ): DataFrame = {
    val parts: Seq[DataFrame] = suite.tableConstraints.flatMap {
      case u: Unique => Some(TableChecks.uniqueViolations(df, u))
      case fk: ForeignKey =>
        val ref = refTables.getOrElse(fk.refTable,
          throw SpecError("#/table/foreignKey", s"no table named '${fk.refTable}' provided"))
        Some(TableChecks.fkViolations(df, fk, ref))
      case d: Drift => Some(TableChecks.driftViolations(df, d))
      case c: CustomConstraint => Some(c.violations(df, refTables))
      case _ => None
    }
    parts.reduceOption(_ unionByName _).getOrElse {
      import df.sparkSession.implicits._
      Seq.empty[(String, String, String)].toDF("keyword", "instance_path", "detail")
    }
  }

  /** Full report: per-row annotated frame + flat violations + stats. */
  final case class Report(
      annotated: DataFrame,
      violations: DataFrame,
      stats: Option[DataFrame]
  )

  def run(
      df: DataFrame,
      specJson: String,
      keyCols: Seq[String],
      refTables: Map[String, DataFrame] = Map.empty
  ): Report = {
    val suite = compile(specJson, df)
    val statsDf = suite.tableConstraints.collectFirst { case s: Stats =>
      TableChecks.stats(df, s.columns)
    }
    Report(
      annotated = Validator.annotate(df, suite),
      violations = allViolations(df, suite, keyCols, refTables),
      stats = statsDf)
  }

  final case class FusedResult(
      totalViolations: Long,
      stats: Map[String, Any]
  )

  /** Builds the fused single-action plan (violations union with observed
    * stats) WITHOUT executing it — callers that re-run the action (bench,
    * resume) pay Catalyst planning once.
    */
  def fusedPlan(
      df: DataFrame,
      specJson: String,
      keyCols: Seq[String],
      refTables: Map[String, DataFrame] = Map.empty
  ): (DataFrame, org.apache.spark.sql.Observation) = {
    val suite = compile(specJson, df)
    val statsCols = suite.tableConstraints.collectFirst { case s: Stats => s.columns }
    val annotated = Validator.annotate(df, suite)

    val obs = new org.apache.spark.sql.Observation()
    val baseAggs = Seq(
      count(lit(1)).as("rows"),
      sum(size(col("violations")).cast("long")).as("row_violations"))
    val allAggs = baseAggs ++ statsCols.toSeq.flatMap(cs =>
      TableChecks.statAggs(df, cs))
    val observed = annotated.observe(obs, allAggs.head, allAggs.tail: _*)

    val key = concat_ws("|", keyCols.map(c => col(c).cast("string")): _*)
    // explode_outer + isNotNull on the generator output: a pre-explode
    // filter (explicit or inferred by InferFiltersFromGenerate) would be
    // pushed below the Project and re-inline the whole check expression —
    // see Validator.violations
    val rowVios = observed
      .select(explode_outer(col("violations")).as("v"), key.as("k"))
      .filter(col("v").isNotNull)
      .select(col("v.keyword").as("keyword"),
        concat(col("k"), lit("/"), col("v.instance_path")).as("instance_path"),
        col("v.detail").as("detail"))
    val tableVios: Seq[DataFrame] = suite.tableConstraints.flatMap {
      case u: Unique => Some(TableChecks.uniqueViolations(df, u))
      case fk: ForeignKey =>
        val ref = refTables.getOrElse(fk.refTable,
          throw SpecError("#/table/foreignKey", s"no table named '${fk.refTable}' provided"))
        Some(TableChecks.fkViolations(df, fk, ref))
      case d: Drift => Some(TableChecks.driftViolations(df, d))
      case c: CustomConstraint => Some(c.violations(df, refTables))
      case _ => None
    }
    (tableVios.foldLeft(rowVios)(_ unionByName _), obs)
  }

  /** The north star's fused single pass, as ONE Spark action: the violations
    * union (row keywords + unique + referential + drift, each branch
    * column-pruned to exactly what it needs) counted once, with column stats
    * piggybacked on the row-pass scan via `observe` (CollectMetrics) — zero
    * extra scans, zero extra jobs for stats.
    */
  def runFused(
      df: DataFrame,
      specJson: String,
      keyCols: Seq[String],
      refTables: Map[String, DataFrame] = Map.empty
  ): FusedResult = {
    val (plan, obs) = fusedPlan(df, specJson, keyCols, refTables)
    val total = plan.count()
    FusedResult(total, obs.get)
  }
}
