package graft

import graft.audio.AudioGen
import graft.ledger.{CheckpointedRun, Ledger}
import org.apache.spark.sql.functions._

/** Checkpoint/resume: resume(ledger) ≡ fresh run; ledger carries per-
  * partition metrics; partition pruning reaches the scan.
  */
class LedgerSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graftledger").toString

  private val spec =
    """{"columns":{"sr_hz":{"minimum":8000,"maximum":48000},
        "dur_ms":{"exclusiveMinimum":0}},"required":["transcript"]}"""

  private def writePartitioned(dir: String): Unit =
    AudioGen.clips(spark, 3000, seed = 42L)
      .write.mode("overwrite").partitionBy("codec").parquet(dir)

  test("fresh run processes every partition and records metrics") {
    val (data, ledger, out) = (tmp(), tmp(), tmp())
    writePartitioned(data)
    val r = CheckpointedRun.run(spark, data, "codec", spec,
      Seq("clip_id"), ledger, out)
    assert(r.skipped.isEmpty && r.processed.nonEmpty)
    val entries = Ledger.read(ledger)
    assert(entries.map(_.partition).toSet == r.processed.toSet)
    assert(entries.map(_.rows).sum == 3000)
    assert(entries.forall(e => e.bytes > 0 && e.wallMs >= 0))
  }

  test("resume(ledger) ≡ fresh: interrupted run completes to identical output") {
    val (data, ledgerA, outA, ledgerB, outB) = (tmp(), tmp(), tmp(), tmp(), tmp())
    writePartitioned(data)
    // fresh complete run
    CheckpointedRun.run(spark, data, "codec", spec, Seq("clip_id"), ledgerA, outA)
    // interrupted run: pre-ledger 3 partitions as if already done by a
    // previous attempt (with their outputs), then resume
    val parts = CheckpointedRun.listPartitions(spark, data, "codec")
    val first = parts.take(3)
    first.foreach { p =>
      val df = spark.read.parquet(data).filter(col("codec") === p)
      val suite = graft.compile.SuiteCompiler.compile(
        graft.spec.Spec.fromJson(spec), df.schema)
      graft.exec.Engine.allViolations(df, suite, Seq("clip_id"))
        .write.mode("overwrite").parquet(s"$outB/codec=$p")
      Ledger.record(ledgerB, graft.ledger.LedgerEntry(p, 0, 0, 1, 0, "t"))
    }
    val resumed = CheckpointedRun.run(spark, data, "codec", spec,
      Seq("clip_id"), ledgerB, outB)
    assert(resumed.skipped.toSet == first.toSet)
    assert(resumed.processed.toSet == parts.toSet.diff(first.toSet))
    val a = CheckpointedRun.violations(spark, outA)
      .collect().map(_.toString).sorted
    val b = CheckpointedRun.violations(spark, outB)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("per-partition read is partition-pruned (scan sees one directory)") {
    val data = tmp()
    writePartitioned(data)
    val df = spark.read.parquet(data).filter(col("codec") === "wav")
    val plan = df.queryExecution.executedPlan.toString
    // PartitionFilters must carry the codec predicate
    assert(plan.contains("PartitionFilters") && plan.contains("codec"),
      s"partition filter missing:\n$plan")
  }

  test("ledger writes are atomic and idempotent (re-record overwrites)") {
    val ledger = tmp()
    Ledger.record(ledger, graft.ledger.LedgerEntry("p=1/x", 10, 2, 100, 5, "t1"))
    Ledger.record(ledger, graft.ledger.LedgerEntry("p=1/x", 11, 3, 100, 5, "t2"))
    val e = Ledger.read(ledger)
    assert(e.size == 1 && e.head.rows == 11)
    assert(Ledger.completed(ledger) == Set("p=1/x"))
  }
}
