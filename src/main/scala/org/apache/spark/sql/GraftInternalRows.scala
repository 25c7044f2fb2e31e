package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Internal-row round-trip for lineage cuts (public Spark API surface,
  * accessed via the `org.apache.spark.sql` package because the classic
  * implementation marks it `private[sql]`).
  *
  * `Dataset.rdd` + `createDataFrame(rdd, schema)` — the portable lineage
  * cut — pays a FULL per-row conversion each way: UnsafeRow → external Row
  * (boxing every field) on the way out and an encoder pass back to
  * UnsafeRow on the way in. For an iterative algorithm that cuts lineage
  * every round (Dedup.connectedComponents) that conversion is pure
  * overhead: the rows never leave the JVM. This shim keeps the round-trip
  * at the InternalRow layer: `queryExecution.toRdd` out,
  * `internalCreateDataFrame` back in — zero conversion, same fresh-leaf
  * (default statistics) plan-cut semantics as the Row route.
  *
  * The produced RDD iterates REUSED mutable UnsafeRows — callers that
  * persist it MUST `.map(_.copy())` first (done in [[cutLineage]]).
  */
object GraftInternalRows {

  /** The dataframe's computed rows at the InternalRow layer (rows are
    * reused mutable buffers — copy before retaining).
    */
  def toInternalRdd(df: Dataset[Row]): RDD[InternalRow] =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd

  /** Wrap an InternalRow RDD as a DataFrame with a fresh leaf plan
    * (default statistics — no propagation from the origin plan).
    */
  def fromInternalRdd(spark: SparkSession, rdd: RDD[InternalRow],
                      schema: StructType): Dataset[Row] =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)

  /** Persist-backed lineage cut: compute `df`'s rows into a persisted
    * InternalRow RDD (copied — safe to retain) and return (cut frame,
    * the persisted RDD for explicit unpersist by the caller).
    */
  def cutLineage(df: Dataset[Row],
                 level: org.apache.spark.storage.StorageLevel)
      : (Dataset[Row], RDD[InternalRow]) = {
    val rdd = toInternalRdd(df).map(_.copy()).persist(level)
    (fromInternalRdd(df.sparkSession, rdd, df.schema), rdd)
  }
}
