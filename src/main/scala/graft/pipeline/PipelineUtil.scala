package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Shared plumbing for the pipeline operators. */
private[pipeline] object PipelineUtil {

  /** Scale-adaptive input fan-out for CPU-heavy signature passes
    * (tokenize + shingle + per-band hashing, per-row embedding math): a
    * small corpus arriving as one or two parquet splits would otherwise
    * run the ENTIRE signature computation on one core — measured 21 s
    * single-threaded vs sub-second spread across the box on the bench's
    * one-file synthetic sf1 corpus. Repartition fires ONLY when the scan
    * exposes fewer splits than the session's parallelism, so at real scale
    * (inputs already ≥ cores splits) it is a no-op and no shuffle of the
    * corpus is introduced; when it does fire, the shuffled bytes are
    * exactly the small input (callers project to the needed columns
    * first). Results are unaffected: every consumer aggregates or joins
    * (row-order-free).
    */
  def fanOut(df: DataFrame): DataFrame = {
    // streaming frames have no .rdd (and micro-batches are already split
    // by the source) — pass them through untouched
    if (df.isStreaming) return df
    // probe ONLY narrow plans (projections/filters straight over a leaf):
    // that is exactly where the one-split hazard lives, and on such plans
    // df.rdd builds the RDD without running jobs. Any wider plan has an
    // upstream exchange (already ≥ shuffle-partitions parallel), and under
    // AQE a .rdd probe there would EXECUTE every upstream query stage just
    // to read a partition count — then throw that work away.
    if (!isNarrow(df.queryExecution.optimizedPlan)) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  private def isNarrow(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
    p match {
      case _: org.apache.spark.sql.catalyst.plans.logical.LeafNode => true
      case _: org.apache.spark.sql.catalyst.plans.logical.Project |
           _: org.apache.spark.sql.catalyst.plans.logical.Filter |
           _: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
        p.children.forall(isNarrow)
      case _ => false
    }
}
