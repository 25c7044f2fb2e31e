package graft.ledger

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** Per-partition lineage + metrics ledger (north rule: "resumable from
  * per-partition checkpoints with a lineage + metrics ledger — rows scanned,
  * violations, bytes, wall-time per Iceberg partition").
  *
  * One JSON file per completed partition, written atomically
  * (write-to-temp + rename) so a crash mid-write can never record a
  * partially-processed partition — the resume contract is: a partition is
  * either fully processed and ledgered, or it is reprocessed from scratch.
  * Violations for a partition are written BEFORE its ledger entry, so
  * idempotent per-partition overwrite + atomic ledger append give
  * exactly-once semantics without any coordination.
  *
  * In the Iceberg production shape the ledger itself is a table and the
  * rename is a metadata commit; this file-per-partition stand-in keeps the
  * identical protocol on plain filesystems.
  */
final case class LedgerEntry(
    partition: String,
    rows: Long,
    violations: Long,
    bytes: Long,
    wallMs: Long,
    finishedAt: String
) {
  def toJson: String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    s"""{"partition":"${esc(partition)}","rows":$rows,"violations":$violations,""" +
      s""""bytes":$bytes,"wall_ms":$wallMs,"finished_at":"${esc(finishedAt)}"}"""
  }
}

object Ledger {

  private def entryFile(dir: Path, partition: String): Path =
    dir.resolve(java.net.URLEncoder.encode(partition, "UTF-8") + ".json")

  /** Partitions already fully processed (their ledger entry exists). */
  def completed(ledgerDir: String): Set[String] = {
    val dir = Paths.get(ledgerDir)
    if (!Files.isDirectory(dir)) return Set.empty
    val stream = Files.list(dir)
    try stream.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .map(p => java.net.URLDecoder.decode(
        p.getFileName.toString.stripSuffix(".json"), "UTF-8"))
      .toSet
    finally stream.close()
  }

  /** Atomic append: temp-file + rename. */
  def record(ledgerDir: String, e: LedgerEntry): Unit = {
    val dir = Paths.get(ledgerDir)
    Files.createDirectories(dir)
    val tmp = Files.createTempFile(dir, ".tmp-", ".json")
    Files.write(tmp, e.toJson.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, entryFile(dir, e.partition),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def read(ledgerDir: String): Seq[LedgerEntry] = {
    val dir = Paths.get(ledgerDir)
    if (!Files.isDirectory(dir)) return Seq.empty
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val stream = Files.list(dir)
    try stream.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .map { p =>
        val n = mapper.readTree(Files.readAllBytes(p))
        LedgerEntry(n.get("partition").asText(), n.get("rows").asLong(),
          n.get("violations").asLong(), n.get("bytes").asLong(),
          n.get("wall_ms").asLong(), n.get("finished_at").asText())
      }.toSeq.sortBy(_.partition)
    finally stream.close()
  }
}
