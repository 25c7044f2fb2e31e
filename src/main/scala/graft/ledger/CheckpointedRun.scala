package graft.ledger

import graft.compile.SuiteCompiler
import graft.exec.{Engine, Validator}
import graft.spec.Spec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-wise resumable validation over a Hive/Iceberg-style partitioned
  * table (directory layout `root/<partCol>=<value>/...`).
  *
  * Two check scopes, ledgered separately:
  *  - ROW-level checks run per partition (partition-pruned scan, idempotent
  *    violation overwrite, then an atomic ledger entry — see [[Ledger]]);
  *  - TABLE-level constraints (uniqueness / referential / drift) run ONCE
  *    over the whole table as a final `__table__` step — a duplicate key
  *    split across two partitions is still a duplicate, so evaluating these
  *    per partition would silently under-report (the global pass is the
  *    correct semantics and is itself ledgered/resumable as one step).
  *
  * Resume = pending steps only; a killed run re-does at most the one
  * in-flight step. `resume ≡ fresh` is property-tested in LedgerSpec.
  */
object CheckpointedRun {

  /** The reserved ledger/output partition name for the global table phase. */
  val TablePhase = "__table__"

  final case class RunResult(processed: Seq[String], skipped: Seq[String])

  /** Hive-style %XX escape for building partition dir names — the same
    * character set Spark/Hive escape on write ('/', '=', '%', ':' etc.), so
    * a value like "a/b" maps to ONE directory (`p=a%2Fb`) instead of
    * corrupting the layout with nested dirs, and Spark's partition discovery
    * round-trips it back to the original value on read.
    */
  private val charsToEscape: Set[Char] =
    ((0x00 to 0x1f).map(_.toChar) ++
      Seq('"', '#', '%', '\'', '*', '/', ':', '=', '?', '\\', '\u007F',
        '{', '[', ']', '^')).toSet

  private[ledger] def escapePathName(s: String): String =
    s.flatMap(c =>
      if (charsToEscape.contains(c)) f"%%${c.toInt}%02X" else c.toString)

  /** Hive-style %XX unescape (Spark escapes special chars in partition dir
    * names; the filter value must be the UNESCAPED string).
    */
  private def unescapePathName(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.result()
  }

  def listPartitions(spark: SparkSession, tableDir: String, partCol: String): Seq[String] = {
    val root = new java.io.File(tableDir)
    val files = Option(root.listFiles()).getOrElse(
      throw new IllegalArgumentException(
        s"'$tableDir' is not a readable directory (need a $partCol=<value> partitioned layout)"))
    files.toSeq
      .filter(f => f.isDirectory && f.getName.startsWith(s"$partCol="))
      .map(f => unescapePathName(f.getName.stripPrefix(s"$partCol=")))
      .sorted
  }

  def run(
      spark: SparkSession,
      tableDir: String,
      partCol: String,
      spec: Spec,
      keyCols: Seq[String],
      ledgerDir: String,
      violationsOut: String,
      refTables: Map[String, DataFrame] = Map.empty,
      // test-only failure injection: invoked after each partition's ledger
      // entry lands (i.e. BETWEEN partition batches) — throwing here
      // simulates a mid-run kill at the exact recovery boundary
      afterPartition: String => Unit = _ => ()
  ): RunResult = {
    val all = listPartitions(spark, tableDir, partCol)
    val done = Ledger.completed(ledgerDir)
    val pending = all.filterNot(done.contains)

    // --- per-partition row-level phase ---
    pending.foreach { part =>
      val t0 = System.nanoTime()
      val df = spark.read.parquet(tableDir)
        .filter(col(partCol) === part) // partition-pruned scan
      val suite = SuiteCompiler.compile(spec, df.schema)
      val key = concat_ws("|", keyCols.map(c => col(c).cast("string")): _*)
      // the scanned-row count rides the violations pass via observe — ONE
      // scan per partition, not two
      val obs = new org.apache.spark.sql.Observation(
        s"graft_rows_${escapePathName(part)}_${System.nanoTime()}")
      val rowVios = Validator.violations(
          df.observe(obs, count(lit(1)).as("rows")), suite, keyCols)
        .select(col("keyword"),
          concat(key, lit("/"), col("instance_path")).as("instance_path"),
          col("detail"))
      // violations written BEFORE the ledger entry; overwrite = idempotent
      val outDir = s"$violationsOut/$partCol=${escapePathName(part)}"
      rowVios.write.mode("overwrite").parquet(outDir)
      val vioCount = spark.read.parquet(outDir).count() // footer-metadata count
      val rows = obs.get("rows").asInstanceOf[Long]
      Ledger.record(ledgerDir, LedgerEntry(
        partition = part,
        rows = rows,
        violations = vioCount,
        bytes = partitionBytes(tableDir, partCol, part),
        wallMs = (System.nanoTime() - t0) / 1000000L,
        finishedAt = java.time.Instant.now().toString))
      afterPartition(part)
    }

    // --- global table-level phase (unique / FK / drift over ALL rows) ---
    val tablePending = !Ledger.completed(ledgerDir).contains(TablePhase)
    if (tablePending && spec.table.nonEmpty) {
      val t0 = System.nanoTime()
      val full = spark.read.parquet(tableDir)
      val suite = SuiteCompiler.compile(spec, full.schema)
      val tableVios = Engine.tableViolations(full, suite, refTables)
      val outDir = s"$violationsOut/$partCol=$TablePhase"
      tableVios.write.mode("overwrite").parquet(outDir)
      val vioCount = spark.read.parquet(outDir).count()
      Ledger.record(ledgerDir, LedgerEntry(
        partition = TablePhase,
        rows = 0L,
        violations = vioCount,
        bytes = 0L,
        wallMs = (System.nanoTime() - t0) / 1000000L,
        finishedAt = java.time.Instant.now().toString))
    }
    RunResult(
      processed = pending ++ (if (tablePending && spec.table.nonEmpty) Seq(TablePhase) else Nil),
      skipped = all.filter(done.contains) ++
        (if (!tablePending) Seq(TablePhase) else Nil))
  }

  private def partitionBytes(tableDir: String, partCol: String, part: String): Long = {
    def size(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(size).sum).getOrElse(0L)
    size(new java.io.File(s"$tableDir/$partCol=${escapePathName(part)}"))
  }

  /** All violations accumulated so far (fresh or resumed runs read the same). */
  def violations(spark: SparkSession, violationsOut: String): DataFrame =
    spark.read.parquet(violationsOut)
}
