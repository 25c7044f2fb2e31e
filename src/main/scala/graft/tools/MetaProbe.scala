package graft.tools

import graft.spec.MetaSpec
import org.apache.spark.sql.SparkSession

/** Timing probe for meta-spec validation (optimizer-iteration diagnosis).
  * Usage: runMain graft.tools.MetaProbe [maxIterations] [excludedRules]
  */
object MetaProbe {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    args.headOption.filter(_.nonEmpty).foreach(m => b.config("spark.sql.optimizer.maxIterations", m))
    args.lift(1).filter(_.nonEmpty).foreach(r => b.config("spark.sql.optimizer.excludedRules", r))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val doc = """{"columns":{"v":{"type":"string","minLength":2,
      "pattern":"^a","allOf":[{"maxLength":10}]}},
      "required":["v"],"table":{"unique":["v"]}}"""
    // warm
    var t0 = System.nanoTime()
    val v1 = MetaSpec.violations(spark, doc)
    println(f"[metaprobe] first violations(): ${(System.nanoTime() - t0) / 1e6}%.0f ms (${v1.size} vios)")
    (1 to 2).foreach { i =>
      t0 = System.nanoTime()
      MetaSpec.violations(spark, doc)
      println(f"[metaprobe] rep $i: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
    }
    // phase breakdown on the raw violations frame
    t0 = System.nanoTime()
    val df = MetaSpec.violationsFrame(spark, doc)
    println(f"[metaprobe] plan build: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
    t0 = System.nanoTime()
    val an = df.queryExecution.analyzed
    println(f"[metaprobe] analyze: ${(System.nanoTime() - t0) / 1e6}%.0f ms, analyzed expr nodes=${an.expressions.map(_.collect{case e => e}.size).sum}")
    t0 = System.nanoTime()
    df.queryExecution.optimizedPlan
    println(f"[metaprobe] optimize: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
    t0 = System.nanoTime()
    df.queryExecution.executedPlan
    println(f"[metaprobe] plan: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
    t0 = System.nanoTime()
    df.collect()
    println(f"[metaprobe] execute: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
    // deep expression-node count of the analyzed plan
    def deepSize(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
      1 + e.children.map(deepSize).sum
    val an2 = df.queryExecution.analyzed
    val total = an2.collect { case pl => pl.expressions.map(deepSize).sum }.sum
    println(s"[metaprobe] deep expr nodes over plan: $total, plan ops: ${an2.collect{case x=>x}.size}")
    org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
    val dfX = MetaSpec.violationsFrame(spark, doc)
    dfX.collect()
    val report = org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
    println("[metaprobe] top rules:")
    report.split("\n").drop(2).take(18).foreach(l => println("  " + l))
    // RDD-backed variant: no LocalRelation for the optimizer to fold
    import scala.jdk.CollectionConverters._
    val doc2 = graft.spec.Spec.documentFromJson(doc)
    val rows2: Seq[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Row("#", doc2.toString, null) +:
        MetaSpec.schemaNodes(doc2).map { case (pp, n) => org.apache.spark.sql.Row(pp, null, n.toString) }
    (1 to 3).foreach { i =>
      t0 = System.nanoTime()
      val df2 = spark.createDataFrame(
        spark.sparkContext.parallelize(rows2, 1), MetaSpec.inputSchema)
      val vio2 = graft.exec.Validator.violations(df2, MetaSpec.compiledSuiteForProbe, Seq("path"))
      val n2 = vio2.collect().length
      println(f"[metaprobe] rdd-backed rep $i end-to-end: ${(System.nanoTime() - t0) / 1e6}%.0f ms ($n2 vios)")
    }
    spark.stop()
  }
}
