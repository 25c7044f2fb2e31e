package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: time connectedComponents alone on a materialized pair set
  * (the sf jaccard-LSH pairs by default, or a synthetic chain/clique mix),
  * separating candidate-generation cost from CC-round cost.
  *
  * Usage: runMain graft.tools.CcProbe [sfDir] [reps] [mode]
  *   mode: lsh (default) | synth:<nCliques>:<cliqueSize>
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val mode = args.lift(2).getOrElse("lsh")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pairs0 = mode match {
      case m if m.startsWith("synth") =>
        val Array(_, nc, cs) = m.split(":")
        spark.range(nc.toLong * cs.toLong)
          .select((col("id") / cs.toInt).cast("long").as("g"), col("id"))
          .groupBy("g").agg(collect_list("id").as("ids"))
          .select(explode(expr(
            "filter(transform(ids, (x, i) -> IF(i > 0, struct(ids[0] as a, x as b), null)), x -> x is not null)")).as("p"))
          .select(col("p.a"), col("p.b"))
      case _ =>
        graft.pipeline.Dedup.jaccardPairsLsh(
          spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
          shingleN = 3, threshold = 0.5, numBands = 8).select("a", "b")
    }
    val pairs = pairs0.cache()
    val n = pairs.count()
    println(s"[ccprobe] pairs=$n")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks)
        }
      })
    (1 to reps).foreach { i =>
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      val (res, rounds) = graft.pipeline.Dedup
        .connectedComponentsWithRounds(pairs)
      val rows = res.groupBy(col("comp")).agg(count(lit(1))).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[ccprobe] rep$i: $t%.3f s ($rows comps, $rounds rounds, " +
        s"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get})")
      res.unpersist()
    }
    spark.stop()
  }
}
