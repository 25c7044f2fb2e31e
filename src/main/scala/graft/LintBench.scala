package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement arm for the mixed-dialect catalog lint (the
  * `perResourceDialects = true` default): synthesizes a 50k-document
  * catalog spanning all five official drafts, times
  * [[graft.spec.SchemaLint.verdictsForCatalog]], and prints one JSON line.
  *
  *   SPARK_GRAFT_LINT_DOCS=50000 sbt "runMain graft.LintBench"
  *   SPARK_GRAFT_LINT_NO_CACHE=1 …   # the pre-one-pass re-walk behavior
  *
  * The one-pass change (persisted exploded node frame) is what's being
  * measured: without the cache the parse+walk UDF re-runs once per draft
  * branch (5×).
  */
object LintBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_LINT_DOCS", "50000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .appName("graft-lint-bench").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metas = Array(
      "", // no $schema → default draft
      """"$schema":"https://json-schema.org/draft/2020-12/schema",""",
      """"$schema":"https://json-schema.org/draft/2019-09/schema",""",
      """"$schema":"http://json-schema.org/draft-07/schema#",""",
      """"$schema":"http://json-schema.org/draft-04/schema#",""")
    val metaCol = element_at(lit(metas), (pmod(col("id"), lit(5)) + 1).cast("int"))
    val cat = spark.range(n).select(col("id"),
      concat(lit("{"), metaCol,
        lit(""""properties":{"a":{"type":"string","minLength":"""),
        (pmod(col("id"), lit(9)) - 2).cast("string"),
        lit("""}},"required":["a"]}""")).as("schema_json"))
      .persist()
    cat.count() // input off the clock
    def once(): Double = {
      spark.catalog.clearCache()
      cat.persist(); cat.count()
      val t0 = System.nanoTime()
      graft.spec.SchemaLint.verdictsForCatalog(cat, "id", "schema_json",
        "https://json-schema.org/draft/2020-12/schema").count()
      (System.nanoTime() - t0) / 1e9
    }
    once() // JIT + suite-compile warm
    val ts = (1 to 3).map(_ => once())
    println(f"""{"lint_docs":$n,"cached_exploded":${
      !sys.env.contains("SPARK_GRAFT_LINT_NO_CACHE")},"min_sec":${ts.min}%.3f,"reps":[${
      ts.map(t => f"$t%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
