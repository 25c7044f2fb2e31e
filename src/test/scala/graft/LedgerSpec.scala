package graft

import graft.audio.AudioGen
import graft.ledger.{CheckpointedRun, Ledger}
import graft.spec.Spec
import org.apache.spark.sql.functions._

/** Checkpoint/resume: resume(ledger) ≡ fresh run; ledger carries per-
  * partition metrics; table-level constraints run globally (cross-partition
  * duplicates found); partition pruning reaches the scan.
  */
class LedgerSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graftledger").toString

  private val rowSpec = Spec.fromJson(
    """{"columns":{"sr_hz":{"minimum":8000,"maximum":48000},
        "dur_ms":{"exclusiveMinimum":0}},"required":["transcript"]}""")

  private val fullSpec = Spec.fromJson(
    """{"columns":{"sr_hz":{"minimum":8000,"maximum":48000}},
        "table":{"unique":["clip_id"]}}""")

  private def writePartitioned(dir: String): Unit =
    AudioGen.clips(spark, 3000, seed = 42L)
      .write.mode("overwrite").partitionBy("codec").parquet(dir)

  test("fresh run processes every partition and records metrics") {
    val (data, ledger, out) = (tmp(), tmp(), tmp())
    writePartitioned(data)
    val r = CheckpointedRun.run(spark, data, "codec", rowSpec,
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
    // arm A: one uninterrupted run
    CheckpointedRun.run(spark, data, "codec", fullSpec, Seq("clip_id"), ledgerA, outA)
    // arm B: full run, then simulate a crash that lost 3 partitions' ledger
    // entries AND the table phase (outputs may or may not survive a crash —
    // idempotent overwrite must handle both; delete one output too)
    CheckpointedRun.run(spark, data, "codec", fullSpec, Seq("clip_id"), ledgerB, outB)
    val parts = CheckpointedRun.listPartitions(spark, data, "codec")
    val lost = parts.take(2) :+ CheckpointedRun.TablePhase
    lost.foreach { p =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
        ledgerB, java.net.URLEncoder.encode(p, "UTF-8") + ".json"))
    }
    // also nuke one lost partition's output entirely
    val nuked = new java.io.File(s"$outB/codec=${lost.head}")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(nuked)
    val resumed = CheckpointedRun.run(spark, data, "codec", fullSpec,
      Seq("clip_id"), ledgerB, outB)
    assert(resumed.processed.toSet == lost.toSet)
    val a = CheckpointedRun.violations(spark, outA)
      .collect().map(_.toString).sorted
    val b = CheckpointedRun.violations(spark, outB)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("table phase finds cross-partition duplicate keys (global semantics)") {
    val (data, ledger, out) = (tmp(), tmp(), tmp())
    writePartitioned(data)
    // duplicated clip_ids from AudioGen land in per-id codecs → many straddle
    // partition boundaries; a per-partition unique check would miss those
    val r = CheckpointedRun.run(spark, data, "codec", fullSpec,
      Seq("clip_id"), ledger, out)
    assert(r.processed.contains(CheckpointedRun.TablePhase))
    val tableVios = spark.read.parquet(s"$out/codec=${CheckpointedRun.TablePhase}")
    val dupCount = tableVios.filter(col("keyword").startsWith("table/unique")).count()
    // must equal the GLOBAL duplicate-key count
    val expected = graft.table.TableChecks
      .duplicateKeys(spark.read.parquet(data), Seq("clip_id")).count()
    assert(dupCount == expected && dupCount > 0)
    // ledger records the table phase; resume skips it
    val again = CheckpointedRun.run(spark, data, "codec", fullSpec,
      Seq("clip_id"), ledger, out)
    assert(again.processed.isEmpty)
    assert(again.skipped.contains(CheckpointedRun.TablePhase))
  }

  test("per-partition read is partition-pruned (scan sees one directory)") {
    val data = tmp()
    writePartitioned(data)
    val df = spark.read.parquet(data).filter(col("codec") === "wav")
    val plan = df.queryExecution.executedPlan.toString
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

  test("escaped partition values round-trip (dir name vs filter value)") {
    val data = tmp()
    Seq(("a b/c", 1), ("plain", 2)).toDF("part", "v")
      .write.mode("overwrite").partitionBy("part").parquet(data)
    val parts = CheckpointedRun.listPartitions(spark, data, "part")
    assert(parts.contains("a b/c") && parts.contains("plain"))
    // the unescaped value must actually match rows
    val n = spark.read.parquet(data).filter(col("part") === "a b/c").count()
    assert(n == 1)
  }

  test("full run over a '/'-containing partition value: escaped output layout, correct metrics") {
    val (data, ledger, out) = (tmp(), tmp(), tmp())
    Seq(("a b/c", 1), ("x=y", 5), ("plain", 100000)).toDF("part", "v")
      .write.mode("overwrite").partitionBy("part").parquet(data)
    val spec = Spec.fromJson("""{"columns":{"v":{"maximum":10}}}""")
    val r = CheckpointedRun.run(spark, data, "part", spec, Seq("v"), ledger, out)
    assert(r.processed.toSet == Set("a b/c", "x=y", "plain"))
    // the violations output must be ONE escaped dir per partition (no nested
    // dirs from the raw '/'), readable back as a partitioned table
    assert(new java.io.File(s"$out/part=a%20b%2Fc").isDirectory ||
      new java.io.File(s"$out/part=a b%2Fc").isDirectory)
    assert(!new java.io.File(s"$out/part=a b").exists())
    val vios = CheckpointedRun.violations(spark, out)
    assert(vios.count() == 1) // only v=100000 violates
    // per-partition metrics resolved the escaped dirs (bytes > 0, rows exact)
    val entries = Ledger.read(ledger)
    assert(entries.filter(_.partition != CheckpointedRun.TablePhase)
      .forall(e => e.bytes > 0 && e.rows == 1))
  }
  test("MID-RUN KILL between partition batches: resume ≡ fresh on verdicts AND violation rows") {
    val (data, ledgerA, outA, ledgerB, outB) = (tmp(), tmp(), tmp(), tmp(), tmp())
    writePartitioned(data)
    // arm A: uninterrupted control
    CheckpointedRun.run(spark, data, "codec", fullSpec, Seq("clip_id"), ledgerA, outA)
    // arm B: the run DIES after the 2nd partition's ledger entry lands —
    // the failure-injection hook fires at the exact recovery boundary
    final case class Killed() extends RuntimeException
    var doneCount = 0
    intercept[Killed] {
      CheckpointedRun.run(spark, data, "codec", fullSpec, Seq("clip_id"),
        ledgerB, outB, afterPartition = { _ =>
          doneCount += 1
          if (doneCount == 2) throw Killed()
        })
    }
    assert(Ledger.completed(ledgerB).size == 2)
    // crash aftermath: one completed partition loses HALF its output files
    // (torn write survivors) — resume must NOT trust un-ledgered bytes, and
    // ledgered partitions are skipped with their output intact
    val completed = Ledger.completed(ledgerB).toSeq.sorted
    val inFlightDir = new java.io.File(
      s"$outB/codec=${CheckpointedRun.listPartitions(spark, data, "codec")
        .filterNot(completed.contains).head}")
    // fabricate a partial in-flight output dir (no _SUCCESS, half a file)
    inFlightDir.mkdirs()
    java.nio.file.Files.writeString(
      inFlightDir.toPath.resolve("part-00000-torn.parquet"), "not parquet")
    val resumed = CheckpointedRun.run(spark, data, "codec", fullSpec,
      Seq("clip_id"), ledgerB, outB)
    assert(resumed.skipped.toSet == completed.toSet)
    // violation rows identical to the uninterrupted arm
    val a = CheckpointedRun.violations(spark, outA).collect().map(_.toString).sorted
    val b = CheckpointedRun.violations(spark, outB).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    // VERDICTS identical too: per-partition (rows, violations) ledger metrics
    def verdicts(dir: String) = Ledger.read(dir)
      .map(e => (e.partition, e.rows, e.violations)).sortBy(_._1)
    assert(verdicts(ledgerA) == verdicts(ledgerB))
  }
}
