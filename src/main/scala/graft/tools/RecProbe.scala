package graft.tools

import graft.compile.{CompileLimits, SuiteCompiler}
import graft.exec.Validator
import graft.spec.Spec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: phase breakdown of the depth-adaptive recursive validation
  * query (q_validate_recursive) — base compile, depth pre-pass, deep
  * recompile, validation action.
  */
object RecProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val specJson =
      """{"$defs": {"item": {"type": "object",
           "properties": {"v": {"minimum": 0},
                          "next": {"$ref": "#/$defs/item"}}}},
         "columns": {"j": {"json": {"$ref": "#/$defs/item"}}}}"""
    (1 to reps).foreach { r =>
      spark.catalog.clearCache()
      var t0 = System.nanoTime()
      def mark(l: String): Unit = {
        println(f"[rec] rep$r $l: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        t0 = System.nanoTime()
      }
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val derived = docs.select(col("doc_id"),
        graft.Queries4.chainJsonForProbe(
          (pmod(col("doc_id"), lit(12)) + 1).cast("int"),
          when(pmod(col("doc_id"), lit(5)) === 0, lit(-1))
            .otherwise(pmod(col("doc_id"), lit(50)))).as("j"))
      mark("frame build")
      val spec = Spec.fromJson(specJson)
      val base = SuiteCompiler.compile(spec, derived.schema)
      mark("base compile")
      val depth = derived.agg(
        max(graft.functions.JsonDepthExpr(col("j")))).head().getInt(0)
      mark(s"depth pre-pass (depth=$depth)")
      val deep = CompileLimits.withUnroll(depth)(
        SuiteCompiler.compile(spec, derived.schema))
      mark("deep recompile")
      val vios = Validator.violations(derived, deep, Seq("doc_id"))
      mark("violations frame build")
      val plan = vios.queryExecution.executedPlan
      mark("catalyst plan")
      val n = vios.count()
      mark(s"validation action ($n violations)")
      if (r == reps) {
        val p = vios.queryExecution.executedPlan.toString
        val wsc = "WholeStageCodegen \\(\\d+\\)".r.findAllIn(p).toSeq.distinct
        println(s"[rec] wholestage spans: ${wsc.size}; " +
          s"fallback projects: ${"(?m)^\\s*Project".r.findAllIn(p).size}")
        println(p.linesIterator.take(25).mkString("\n"))
      }
    }
    spark.stop()
  }
}
