package graft.compile

import graft.spec._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** A fully compiled constraint suite over one table schema: the analogue of
  * the reference's compiled `*Schema` graph (/root/reference/schema.go:11-95)
  * — row-level checks as fused Catalyst predicates, table-level constraints
  * as DataFrame plan builders (executed by [[graft.table.TableChecks]]).
  */
final case class CompiledSuite(
    spec: Spec,
    rowChecks: Seq[Check],
    tableConstraints: Seq[TableConstraint],
    // shared expensive subexpressions (JSON parses), materialized once per
    // row by Validator before the check pass — see [[Binder]]
    bindings: Seq[(String, org.apache.spark.sql.Column)] = Nil
)

object SuiteCompiler {

  /** Compile a spec against a concrete table schema. Fails fast with typed
    * [[SpecError]]s on unknown columns — the compile-time analogue of the
    * reference validating schemas against their metaschema before use
    * (/root/reference/roots.go:53-56).
    */
  def compile(spec: Spec, schema: StructType): CompiledSuite = {
    CompileLimits.resetVisits() // per-suite node-expansion budget
    val fieldSet = schema.fieldNames.toSet
    val binder = new Binder

    // column-level `required` — the only check that rejects NULL
    val reqChecks = spec.required.map { c =>
      if (!fieldSet.contains(c)) throw SpecError("#/required", s"unknown column '$c'")
      Check(s"required/$c", c, col(c).isNotNull, lit(s"required: column '$c' is null"),
        ErrorKind.RequiredK(c))
    }

    val colChecks = spec.columns.flatMap { case (name, node) =>
      if (!fieldSet.contains(name))
        throw SpecError(s"#/columns/$name", s"unknown column '$name'")
      RowCompiler.compile(spec, node, col(name), schema(name).dataType, name,
        Nil, Some(binder))
    }

    // cross-column row rules: the whole row as one object instance
    val rowChecks = if (spec.rowRules.isEmpty) Seq.empty else {
      val rowValue = struct(schema.fieldNames.map(col).toSeq: _*)
      spec.rowRules.flatMap(r =>
        RowCompiler.compile(spec, r, rowValue, schema, "", Nil, Some(binder)))
    }

    // validate table constraints' column references at compile time
    spec.table.foreach {
      case Unique(cols) => cols.foreach { c =>
        if (!fieldSet.contains(c)) throw SpecError("#/table/unique", s"unknown column '$c'") }
      case ForeignKey(cols, _, refCols, _) =>
        cols.foreach { c =>
          if (!fieldSet.contains(c)) throw SpecError("#/table/foreignKey", s"unknown column '$c'") }
        if (cols.size != refCols.size)
          throw SpecError("#/table/foreignKey", "columns/refColumns arity mismatch")
      case Drift(c, _, _, _, _, _) =>
        if (!fieldSet.contains(c)) throw SpecError("#/table/drift", s"unknown column '$c'")
      case Stats(cols) => cols.foreach { c =>
        if (!fieldSet.contains(c)) throw SpecError("#/table/stats", s"unknown column '$c'") }
      case _ => // custom families validate inside their own compile hook
    }

    CompiledSuite(spec, reqChecks ++ colChecks ++ rowChecks, spec.table,
      binder.bindings)
  }

  /** JSON string columns whose compiled checks carry a recursive-unroll
    * depth cut — the columns whose DATA depth decides how far the compile
    * must inline. Typed (struct) columns never qualify: their data depth is
    * bounded by the table schema, so the default unroll is already exact.
    */
  private def depthCutJsonColumns(suite: CompiledSuite): Seq[String] =
    suite.rowChecks.iterator.collect {
      case c if c.kind.isInstanceOf[ErrorKind.DepthExceeded] &&
        c.instancePath.contains("!json") =>
        c.instancePath.substring(0, c.instancePath.indexOf("!json"))
    }.toSeq.distinct

  /** Whether the suite carries any recursive-unroll depth cut (a `$ref`
    * inlined to the limit) — callers with per-document data (the CLI) use
    * this to decide whether depth-keyed recompiles can ever be needed.
    */
  def hasDepthCut(suite: CompiledSuite): Boolean =
    suite.rowChecks.exists(_.kind.isInstanceOf[ErrorKind.DepthExceeded])

  /** Compile with an explicit unroll depth (callers memoize per depth). */
  def compileWithUnroll(spec: Spec, schema: StructType, unroll: Int): CompiledSuite =
    CompileLimits.withUnroll(unroll)(compile(spec, schema))

  /** DEPTH-ADAPTIVE compile: like [[compile]], but when the compiled suite
    * carries recursive-`$ref` depth cuts over JSON columns, ONE cheap
    * corpus pre-pass (`max(json_max_depth(col))`, codegen'd scan — the
    * distributed version of the detailed-output unroll sizing) derives the
    * real document depth and the suite recompiles unrolled exactly that
    * far. The typed [[ErrorKind.DepthExceeded]] cut then cannot fire for
    * in-corpus data — matching the reference, which validates recursive
    * schemas at ANY instance depth at runtime (/root/reference/validator.
    * go:767-811) — while staying the loud guard for streaming/unseen
    * inputs. Corpus depth beyond [[CompileLimits.maxAdaptiveUnroll]] keeps
    * the cut at that ceiling (a typed refusal, never a silent pass or a
    * runaway compile).
    */
  def compileAdaptive(spec: Spec, df: org.apache.spark.sql.DataFrame)
      : CompiledSuite = {
    val base = compile(spec, df.schema)
    val cols = depthCutJsonColumns(base)
    if (cols.isEmpty) return base
    // resolve each instance-path prefix ("j", "user/profile", "" = whole
    // row) to the JSON-text source column; anything unresolvable keeps the
    // base suite's loud typed cut rather than failing the compile
    def depthSource(prefix: String): org.apache.spark.sql.Column = {
      val parts = prefix.split("/").filter(_.nonEmpty)
      val src =
        if (parts.isEmpty) struct(df.columns.map(col).toSeq: _*)
        else parts.tail.foldLeft(col(parts.head))(_.getItem(_))
      df.select(src.as("x")).schema.head.dataType match {
        case org.apache.spark.sql.types.StringType => src
        case _ => to_json(src) // variant / struct sources re-serialize
      }
    }
    try {
      val aggs = cols.zipWithIndex.map { case (c, i) =>
        max(graft.functions.JsonDepthExpr(depthSource(c))).as(s"__depth_$i")
      }
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      val depth = cols.indices.map(i =>
        if (row.isNullAt(i)) 0 else row.getInt(i)).max
      val unroll = math.min(depth, CompileLimits.maxAdaptiveUnroll)
      if (unroll <= CompileLimits.maxRefUnroll) base
      else CompileLimits.withUnroll(unroll)(compile(spec, df.schema))
    } catch {
      case _: org.apache.spark.sql.AnalysisException =>
        base // unresolvable depth source: keep the typed DepthExceeded cut
      case _: graft.spec.SpecError =>
        // the corpus-sized recompile blew the compile-node budget (branchy
        // recursive schemas grow ~K^depth): keep the base suite — deep rows
        // fail LOUDLY with typed DepthExceeded instead of crashing the job
        // (same fallback the CLI takes)
        base
    }
  }
}
