package graft.tools

import graft.{ClipSuite, SparkEntry}
import graft.exec.{Engine, Validator}
import graft.compile.SuiteCompiler
import graft.spec.Spec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan inspection: prints the formatted physical plan of the fused
  * validation pass + a planning-vs-execution wall breakdown. Used to keep
  * the plan honest at scale: ReadSchema must exclude `bytes`, filters must
  * push down, the row pass must be one WholeStageCodegen span.
  *
  * Usage: runMain graft.tools.Explain [corpusDir] [cpus]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_bench_clips_500000")
    val cpus = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    graft.audio.AudioGen.registerFormats()
    val specJson = if (args.contains("--deep")) ClipSuite.deepSpecJson else ClipSuite.specJson
    val df = spark.read.parquet(dir)
    var t0 = System.nanoTime()
    val suite = SuiteCompiler.compile(Spec.fromJson(specJson), df.schema)
    println(f"[explain] spec compile: ${(System.nanoTime() - t0) / 1e6}%.0f ms")

    t0 = System.nanoTime()
    val annotated = Validator.annotate(df, suite)
    val vios = Engine.allViolations(df, suite, Seq("clip_id"),
      Map("ref_codecs" -> ClipSuite.refCodecs(spark)))
    println(f"[explain] plan construction: ${(System.nanoTime() - t0) / 1e6}%.0f ms")

    t0 = System.nanoTime()
    val physical = vios.queryExecution.executedPlan
    println(f"[explain] catalyst analyze+optimize+plan: ${(System.nanoTime() - t0) / 1e6}%.0f ms")

    t0 = System.nanoTime()
    val n = vios.count()
    println(f"[explain] first action (cold codegen): ${(System.nanoTime() - t0) / 1e6}%.0f ms, $n violations")

    t0 = System.nanoTime()
    vios.count()
    println(f"[explain] second action (warm): ${(System.nanoTime() - t0) / 1e6}%.0f ms")

    t0 = System.nanoTime()
    val flagOnly = Validator.flag(df, suite).filter(!col("valid")).count()
    println(f"[explain] flag-mode pass (warm-ish): ${(System.nanoTime() - t0) / 1e6}%.0f ms, $flagOnly invalid")

    t0 = System.nanoTime()
    df.select(count(lit(1))).collect()
    println(f"[explain] bare scan count: ${(System.nanoTime() - t0) / 1e6}%.0f ms")

    if (args.contains("--bytesprobe")) {
      t0 = System.nanoTime()
      df.select(sum(length(col("bytes")))).collect()
      println(f"[explain] bytes read (sum length): ${(System.nanoTime() - t0) / 1e6}%.0f ms")
      t0 = System.nanoTime()
      df.select(sum(length(col("bytes")))).collect()
      println(f"[explain] bytes read again: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
      t0 = System.nanoTime()
      df.select(sum(graft.audio.AudioGen.decodedSamples(col("bytes")))).collect()
      println(f"[explain] decode UDF over bytes: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
    }

    if (args.contains("--fusedprobe")) {
      val cached = df.drop("bytes").cache()
      cached.count()
      val suite2 = SuiteCompiler.compile(Spec.fromJson(ClipSuite.specJson), cached.schema)
      import graft.table.TableChecks
      import graft.spec._
      def time(name: String)(f: => Unit): Unit = {
        f // warm
        val t0 = System.nanoTime(); f
        println(f"[explain] fusedprobe $name: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
      }
      time("row-pass violations count") {
        Validator.violations(cached, suite2, Seq("clip_id")).count()
      }
      time("row-pass flag") {
        Validator.flag(cached, suite2).filter(!col("valid")).count()
      }
      time("unique") {
        TableChecks.uniqueViolations(cached, Unique(Vector("clip_id"))).count()
      }
      time("fk") {
        TableChecks.fkViolations(cached,
          ForeignKey(Vector("codec"), "ref_codecs", Vector("codec")),
          ClipSuite.refCodecs(spark)).count()
      }
      time("psi") {
        TableChecks.psiDf(cached, "sr_hz", Seq(8001, 16001, 22051, 44101),
          Seq(0.08, 0.10, 0.07, 0.70, 0.05)).count()
      }
      time("stats-observe") {
        val o = new org.apache.spark.sql.Observation()
        val aggs = TableChecks.statAggs(cached, Seq("sr_hz", "dur_ms", "codec", "transcript"))
        cached.observe(o, aggs.head, aggs.tail: _*).select(count(lit(1))).collect()
      }
      time("stats-hashagg") {
        val aggs = TableChecks.statAggs(cached, Seq("sr_hz", "dur_ms", "codec", "transcript"))
        cached.agg(aggs.head, aggs.tail: _*).collect()
      }
      cached.unpersist()
    }

    if (args.contains("--cacheprobe")) {
      val cached = df.cache()
      cached.count()
      for (probe <- Seq("decode", "decode2", "regex", "groupby",
          "uuid-regex", "uuid-expr")) {
        t0 = System.nanoTime()
        probe match {
          case "decode" | "decode2" =>
            cached.select(sum(graft.audio.AudioGen.decodedSamples(col("bytes")))).collect()
          case "regex" =>
            cached.select(sum(when(col("clip_id").rlike(
              "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"), 1L).otherwise(0L))).collect()
          case "groupby" =>
            cached.groupBy("clip_id").count().filter(col("count") > 1).count()
          case "uuid-regex" =>
            cached.select(sum(when(graft.functions.Formats.get("uuid").get(
              col("clip_id")), 1L).otherwise(0L))).collect()
          case "uuid-expr" =>
            cached.select(sum(when(graft.functions.UuidFormatExpr(
              col("clip_id")), 1L).otherwise(0L))).collect()
        }
        println(f"[explain] cacheprobe $probe: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
      }
      cached.unpersist()
    }

    // scan shape checks — use the FINAL (post-AQE) plan
    val planStr = vios.queryExecution.executedPlan.toString
    val reads = "ReadSchema: [^\\n]*".r.findAllIn(planStr).toSeq.distinct
    reads.foreach(r => println(s"[explain] $r"))
    println(s"[explain] bytes read from scan: ${reads.exists(_.contains("bytes"))}")
    val wsc = "\\*\\(\\d+\\)".r.findAllIn(planStr).map(_.toString).toSet.size
    println(s"[explain] WholeStageCodegen spans: $wsc")
    if (args.contains("--full")) println(vios.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
