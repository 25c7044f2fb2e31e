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
}
