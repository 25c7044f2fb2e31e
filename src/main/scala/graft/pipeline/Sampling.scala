package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * Both arms avoid RNG state entirely — the "randomness" is a cryptographic
  * hash of the row key, so samples are reproducible across engines (the
  * DuckDB oracle reproduces them bit-for-bit), across partitionings, and
  * across reruns — the property a data pipeline actually needs from a
  * sampler (resume ≡ fresh, audit-replayable).
  *
  * Scale:
  *  - [[stratifiedExact]] ranks within each stratum — parallel ACROSS
  *    strata, single-task within one (fine for codec/lang-like strata; for
  *    one mega-stratum use [[stratifiedHash]]).
  *  - [[stratifiedHash]] is a pure map-side filter (keep rows whose hash
  *    falls under the per-stratum rate) — no shuffle at all, approximate
  *    counts (binomial around rate·N).
  */
object Sampling {

  private def hashKey(key: Column): Column = md5(key.cast("string"))

  /** Exactly `n` rows per stratum (fewer if the stratum is smaller),
    * deterministically chosen by md5-of-key order.
    */
  def stratifiedExact(df: DataFrame, strataCol: String, keyCol: String,
                      n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strataCol)
      .orderBy(hashKey(col(keyCol)).asc, col(keyCol).asc)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= n)
      .drop("__rank")
  }

  /** Rate-based deterministic sample: keep rows whose key hash falls below
    * `rate` of the hash space — zero shuffle, stable under appends (a row's
    * membership never changes when other rows arrive).
    */
  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, "rate in [0,1]")
    // first 15 hex digits = 60 bits, exact in a double
    val bucket = conv(substring(hashKey(col(keyCol)), 1, 15), 16, 10)
      .cast("double") / math.pow(16.0, 15)
    df.filter(bucket < rate)
  }

  /** Per-stratum rate sampling (map-side only). `rates` maps stratum value →
    * keep-rate; absent strata keep `defaultRate`.
    */
  def stratifiedHash(df: DataFrame, strataCol: String, keyCol: String,
                     rates: Map[String, Double],
                     defaultRate: Double = 0.0): DataFrame = {
    val bucket = conv(substring(hashKey(col(keyCol)), 1, 15), 16, 10)
      .cast("double") / math.pow(16.0, 15)
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(strataCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(bucket < rate)
  }
}
