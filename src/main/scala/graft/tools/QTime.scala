package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing probe: `runMain graft.tools.QTime <query>
  * [sfDir] [reps] [cpus]` — times one SparkEntry battery query end-to-end
  * (fresh plan per rep, min + all reps printed). Dev tool for iterating on
  * one operator without paying the full Bench battery.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = if (args.length > 3) args(3).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-qtime")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.audio.AudioGen.registerFormats()
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name' (known: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})"))
    if (sys.env.contains("QTIME_EXPLAIN")) {
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      println("QPLAN-BEGIN")
      println(plan.take(20000))
      println("QPLAN-END")
    }
    val times = (1 to reps).map { i =>
      if (sys.env.contains("QTIME_CLEARCACHE")) spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"QTIME $name rep$i: $t%.3f s ($n rows)")
      t
    }
    println(f"QTIME $name min: ${times.min}%.3f s")
    spark.stop()
  }
}
