package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query: the full audio constraint suite (row keywords +
    * uniqueness + referential + drift) over a deterministic synthetic clip
    * table at sf0.001 scale (~6k rows), returning the flat violation table.
    * Driver smoke-checks rows>0 (the corpus has seeded violation rows).
    */
  def entry(spark: SparkSession): DataFrame = {
    val clips = graft.audio.AudioGen.clips(spark, 6000L, seed = 42L)
    graft.exec.Engine.run(clips, ClipSuite.specJson, Seq("clip_id"),
      Map("ref_codecs" -> ClipSuite.refCodecs(spark))).violations
  }
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (Queries.all ++ Queries2.all ++ Queries3.all ++ Queries4.registry ++ Queries5.registry ++ Queries6.registry ++ Queries7.registry ++ Queries8.registry).map { case (k, (fn, _)) => k -> fn }
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    (Queries.all ++ Queries2.all ++ Queries3.all ++ Queries4.registry ++ Queries5.registry ++ Queries6.registry ++ Queries7.registry ++ Queries8.registry).map { case (k, (_, sql)) => k -> sql }
}
