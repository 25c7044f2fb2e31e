package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Supplementary benchmarks that must NOT touch the frozen `graft.Bench`
  * harness (driver contract):
  *
  *  - minhash hash-engine arm: the md5 (oracle-parity) engine vs the
  *    xxhash64 production knob on the synthetic sf1 near-dup corpus — the
  *    measured number behind "xxhash64 is the 100 TB default";
  *  - noop-sink isolation (optimization guide §1.4) for the heaviest
  *    pipeline queries: every column of every row computed and discarded,
  *    so the number is the computation, not the count()'s column pruning.
  *
  * Usage: runMain graft.BenchExtra [sfDir] [reps]
  *   (sfDir default: the bench's synthetic sf1 if present, else sf0.1)
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sf1 = "/tmp/graft_sf1_sf0.1"
    val dir = args.headOption.getOrElse(
      if (new java.io.File(s"$sf1/_DONE").exists()) sf1
      else "/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.audio.AudioGen.registerFormats()
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def minOf(label: String)(mk: => org.apache.spark.sql.DataFrame): Double = {
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(label)
        mk.write.format("noop").mode("overwrite").save()
        spark.sparkContext.setJobDescription(null)
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }

    val engines = Seq("md5", "xxhash64").map { eng =>
      eng -> minOf(s"minhashCandidates[$eng]")(
        pipeline.Dedup.minhashCandidates(docs, "doc_id", "text",
          numBands = 8, shingleN = 3, hashEngine = eng))
    }
    val noops = Seq(
      "jaccardPairsLsh" -> minOf("jaccardPairsLsh noop")(
        pipeline.Dedup.jaccardPairsLsh(docs, "doc_id", "text",
          shingleN = 3, threshold = 0.5, numBands = 8)),
      "dedupGroups" -> minOf("dedupGroups noop")(
        pipeline.Dedup.dedupGroups(
          pipeline.Dedup.jaccardPairsLsh(docs, "doc_id", "text",
            shingleN = 3, threshold = 0.5, numBands = 8).select("a", "b"))),
      "simhashNearDup64" -> minOf("simhashNearDup64 noop")(
        pipeline.Dedup.simhashNearDup64(docs, "doc_id", "text")))
    val cells = (engines.map { case (e, t) =>
      f""""minhash_candidates_$e":$t%.3f""" } ++
      noops.map { case (n, t) => f""""noop_$n":$t%.3f""" })
      .mkString(",")
    println(s"""{"sf":"$dir","reps":$reps,$cells}""")
    spark.stop()
  }
}
