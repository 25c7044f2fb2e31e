package graft

import graft.compile.SuiteCompiler
import graft.spec.Spec
import graft.streaming.StreamValidate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming validation: streaming results ≡ batch results on the
  * same data (micro-batch determinism), watermarked windowed aggregations.
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  /** readStream needs a directory source; stage the single-file table. */
  private lazy val src: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  private val specJson =
    """{"columns":{
         "value":{"minimum":0,"maximum":100},
         "event_type":{"enum":["click","view","purchase","signup","logout"]}},
       "required":["user_id"]}"""

  test("streaming row validation ≡ batch on the same events") {
    
    val batch = spark.read.parquet(src)
    val suite = SuiteCompiler.compile(Spec.fromJson(specJson), batch.schema)

    val stream = spark.readStream.schema(batch.schema).parquet(src)
    val out = StreamValidate.violationRates(stream, suite, "ts", "6 hours", "0 seconds")
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("vrates")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.sql("SELECT * FROM vrates")
      .orderBy("window_start", "keyword").collect().map(_.toString)

    val batchEquiv = graft.exec.Validator.annotate(batch, suite)
      .withColumn("ts", col("ts").cast("timestamp"))
      .select(col("ts"), explode(col("violations")).as("v"))
      .groupBy(window(col("ts"), "6 hours"), col("v.keyword").as("keyword"))
      .agg(count(lit(1)).as("violations"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("keyword"), col("violations"))
      .orderBy("window_start", "keyword").collect().map(_.toString)

    assert(streamed.nonEmpty || batchEquiv.isEmpty)
    assert(streamed.sameElements(batchEquiv))
  }

  test("streaming dedup keeps one row per key (stateful, watermark-bound)") {
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val q = StreamValidate.dedupStream(stream, "user_id", "ts", "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("dedup")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT count(*), count(DISTINCT user_id) FROM dedup").collect()(0)
    val distinctKeys = spark.read.parquet(src)
      .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    // single micro-batch ⇒ exactly one row per key survives
    assert(got.getLong(0) == distinctKeys && got.getLong(1) == distinctKeys)
  }

  test("windowed PSI drift ≡ batch PSI per window (single stateful agg)") {
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val edges = Seq(25.0, 50.0, 75.0)
    val ref = Seq(0.25, 0.25, 0.25, 0.25)
    val q = StreamValidate.windowedPsiDrift(stream, "value", edges, ref,
        "ts", "1 day", "0 seconds")
      .writeStream.outputMode("complete").format("memory").queryName("psidrift")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT window_start, psi FROM psidrift")
      .collect().map(r => r.getTimestamp(0) -> r.getDouble(1)).toMap
    assert(got.nonEmpty)
    // batch equivalence: TableChecks.psi over each window's slice
    val batch = spark.read.parquet(src).withColumn("ts", col("ts").cast("timestamp"))
    got.foreach { case (ws, psiStream) =>
      val slice = batch.filter(
        window(col("ts"), "1 day").getField("start") === lit(ws))
      val psiBatch = graft.table.TableChecks.psi(slice, "value", edges, ref)
      assert(math.abs(psiStream - psiBatch) < 1e-9, s"window $ws: $psiStream vs $psiBatch")
    }
  }

  test("windowed duplicates detect in-window key repeats") {
    
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val q = StreamValidate.windowedDuplicates(stream, "user_id", "ts", "1 day", "0 seconds")
      .writeStream.outputMode("complete").format("memory").queryName("dups")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT count(*) FROM dups").collect()(0).getLong(0)
    val exp = spark.read.parquet(src)
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "1 day"), col("user_id"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    assert(got == exp && got > 0)
  }

  test("streaming family constraints ≡ batch (containerMagic + transcriptConsistency)") {
    graft.audio.AudioGen.registerFormats()
    val dir = java.nio.file.Files.createTempDirectory("clips_stream").toString
    graft.audio.AudioGen.clips(spark, 2000L, seed = 7L)
      .write.mode("overwrite").parquet(dir)
    val spec = Spec.fromJson(
      """{"table": {
           "containerMagic": {"bytes": "bytes", "key": "clip_id",
             "codec": "codec",
             "magics": {"wav": [{"offset": 0, "ascii": "RIFF"},
                                {"offset": 8, "ascii": "WAVE"}]}},
           "transcriptConsistency": {"transcript": "transcript",
             "key": "clip_id", "durMs": "dur_ms",
             "maxCharsPerSec": 40, "requireNonEmptyOverMs": 100}}}""")
    val batch = spark.read.parquet(dir)
    val suite = SuiteCompiler.compile(spec, batch.schema)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val q = StreamValidate.familyViolations(stream, suite)
      .writeStream.outputMode("append").format("memory").queryName("famv")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT * FROM famv").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val exp = graft.exec.Engine.tableViolations(batch, suite).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == exp && got.nonEmpty)
    assert(got.exists(_._1.startsWith("table/containerMagic")))
    assert(got.exists(_._1.startsWith("table/transcriptConsistency")))
  }

  test("familyViolations with no families still yields a streaming Dataset (empty)") {
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val suite = SuiteCompiler.compile(
      Spec.fromJson("""{"columns": {}, "table": {"unique": ["user_id"]}}"""),
      schema)
    val out = StreamValidate.familyViolations(stream, suite)
    assert(out.isStreaming)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("famv0").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.sql("SELECT count(*) FROM famv0").collect()(0).getLong(0) == 0L)
  }
}
