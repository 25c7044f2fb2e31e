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

  /** Uniform [0,1) bucket from the key hash. 60 hash bits squeezed into a
    * double's 53-bit mantissa — values within ~2^-53 of 1.0 can round UP to
    * exactly 1.0, so rate comparisons use `< rate` with an explicit
    * rate-≥-1 bypass (otherwise a "keep everything" sample could drop a
    * one-in-2^53 row).
    */
  private def hashBucket(key: Column): Column =
    conv(substring(hashKey(key), 1, 15), 16, 10)
      .cast("double") / math.pow(16.0, 15)

  private def requireRate(r: Double): Unit =
    require(r >= 0 && r <= 1, s"rate must be in [0,1], got $r")

  /** Rate-based deterministic sample: keep rows whose key hash falls below
    * `rate` of the hash space — zero shuffle, stable under appends (a row's
    * membership never changes when other rows arrive).
    */
  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame = {
    requireRate(rate)
    if (rate >= 1.0) df else df.filter(hashBucket(col(keyCol)) < rate)
  }

  /** Per-stratum rate sampling (map-side only). `rates` maps stratum value →
    * keep-rate; absent strata keep `defaultRate`.
    */
  def stratifiedHash(df: DataFrame, strataCol: String, keyCol: String,
                     rates: Map[String, Double],
                     defaultRate: Double = 0.0): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(requireRate)
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(strataCol) === s, lit(r)).otherwise(acc)
    }
    // rate >= 1.0 bypasses the bucket compare entirely (see hashBucket)
    df.filter(rate >= 1.0 || hashBucket(col(keyCol)) < rate)
  }
}
