package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev probe: stage split of minhash candidate generation at a given sf —
  * band-index materialization vs bucket-size agg vs self-join+distinct.
  */
object MhProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1_sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    (1 to reps).foreach { r =>
      spark.catalog.clearCache()
      var t0 = System.nanoTime()
      def mark(l: String): Unit = {
        println(f"[mh] rep$r $l: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        t0 = System.nanoTime()
      }
      val bands = graft.pipeline.Dedup
        .minhashBands(docs, "doc_id", "text", numBands = 8)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nb = bands.count(); mark(s"bands materialize ($nb)")
      val bucketSizes = bands.groupBy("band", "h").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1 && col("n") <= 1000L)
        .select("band", "h")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nbk = bucketSizes.count(); mark(s"ok-buckets ($nbk)")
      val inB = bands.join(bucketSizes, Seq("band", "h"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nin = inB.count(); mark(s"in-bucket rows ($nin)")
      val raw = inB.as("x").join(inB.as("y"),
        col("x.band") === col("y.band") && col("x.h") === col("y.h") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      val nraw = raw.count(); mark(s"self-join pairs pre-distinct ($nraw)")
      val nd = raw.distinct().count(); mark(s"distinct pairs ($nd)")
      bands.unpersist(); bucketSizes.unpersist(); inB.unpersist()
    }
    spark.stop()
  }
}
