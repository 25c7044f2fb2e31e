package graft.ledger

import graft.compile.SuiteCompiler
import graft.exec.{Engine, Validator}
import graft.spec.Spec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-wise resumable validation over a Hive/Iceberg-style partitioned
  * table (directory layout `root/<partCol>=<value>/...`).
  *
  * Protocol per pending partition (mirrors the ledger contract, see
  * [[Ledger]]):
  *   1. read ONLY that partition (partition pruning: the filter on the
  *      partition column reaches the file listing — no other data touched);
  *   2. run the fused row pass + per-partition verdict aggregation in one
  *      job, write violations idempotently under `violationsOut/part=...`;
  *   3. atomically record the ledger entry.
  *
  * Resume = list partitions − ledgered partitions. A killed run re-does at
  * most the one in-flight partition; `resume ≡ fresh` is property-tested in
  * LedgerSpec.
  *
  * Driver loops partitions sequentially, each step a distributed job — at
  * production scale steps are Iceberg partitions (large) so the loop length
  * is modest; batching N partitions per step is a trivial extension.
  */
object CheckpointedRun {

  final case class RunResult(processed: Seq[String], skipped: Seq[String])

  def listPartitions(spark: SparkSession, tableDir: String, partCol: String): Seq[String] = {
    val fs = new java.io.File(tableDir)
    fs.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith(s"$partCol="))
      .map(_.getName.stripPrefix(s"$partCol="))
      .sorted
  }

  def run(
      spark: SparkSession,
      tableDir: String,
      partCol: String,
      specJson: String,
      keyCols: Seq[String],
      ledgerDir: String,
      violationsOut: String,
      refTables: Map[String, DataFrame] = Map.empty
  ): RunResult = {
    val all = listPartitions(spark, tableDir, partCol)
    val done = Ledger.completed(ledgerDir)
    val pending = all.filterNot(done.contains)

    pending.foreach { part =>
      val t0 = System.nanoTime()
      val df = spark.read.parquet(tableDir)
        .filter(col(partCol) === part) // partition-pruned scan
      val suite = SuiteCompiler.compile(Spec.fromJson(specJson), df.schema)
      val vios = Engine.allViolations(df, suite, keyCols, refTables)
      // violations written BEFORE the ledger entry; overwrite = idempotent
      vios.write.mode("overwrite")
        .parquet(s"$violationsOut/$partCol=$part")
      val counts = Validator.annotate(df, suite)
        .agg(count(lit(1)), sum(size(col("violations")).cast("long")))
        .collect()(0)
      val bytes = partitionBytes(tableDir, partCol, part)
      Ledger.record(ledgerDir, LedgerEntry(
        partition = part,
        rows = counts.getLong(0),
        violations = Option(counts.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L),
        bytes = bytes,
        wallMs = (System.nanoTime() - t0) / 1000000L,
        finishedAt = java.time.Instant.now().toString))
    }
    RunResult(pending, all.filter(done.contains))
  }

  private def partitionBytes(tableDir: String, partCol: String, part: String): Long = {
    def size(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(size).sum).getOrElse(0L)
    size(new java.io.File(s"$tableDir/$partCol=$part"))
  }

  /** All violations accumulated so far (fresh or resumed runs read the same). */
  def violations(spark: SparkSession, violationsOut: String): DataFrame =
    spark.read.parquet(violationsOut)
}
