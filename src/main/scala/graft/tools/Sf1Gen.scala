package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: materialize the same deterministic synthetic sf1 corpus the
  * bench builds (10×-replica, remapped keys, per-replica near-dup suffixes)
  * so individual queries can be probed at sf1 without running the full
  * bench. Mirrors Bench.synthSf1 exactly.
  */
object Sf1Gen {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = s"/tmp/graft_sf1_${new java.io.File(sfDir).getName}"
    if (new java.io.File(s"$out/_DONE").exists()) {
      println(s"[sf1gen] already present: $out"); spark.stop(); return
    }
    val replicas = 10
    val off = 1000000000L
    val dims = Set("region", "nation")
    new java.io.File(out).mkdirs()
    val tables = Option(new java.io.File(sfDir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
    tables.foreach { f =>
      val name = f.getName.stripSuffix(".parquet")
      val df = spark.read.parquet(f.getAbsolutePath)
      val rep =
        if (dims(name)) df
        else {
          val crossed = df.crossJoin(
            spark.range(replicas).select(col("id").as("__r")))
          val remapped = df.schema.fields.foldLeft(crossed) { (acc, fld) =>
            val isKey = fld.name.matches("(?i).*(custkey|suppkey|partkey|orderkey|_id)$")
            if (isKey && fld.dataType == org.apache.spark.sql.types.LongType)
              acc.withColumn(fld.name, col(fld.name) + col("__r") * off)
            else acc
          }
          val withText =
            if (name == "documents")
              remapped.withColumn("text",
                when(col("__r") === 0, col("text"))
                  .otherwise(concat(col("text"), lit(" r"),
                    col("__r").cast("string"))))
            else remapped
          withText.drop("__r")
        }
      rep.write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    new java.io.File(s"$out/_DONE").createNewFile()
    println(s"[sf1gen] wrote $out")
    spark.stop()
  }
}
