package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines:
  * exact (hash groupBy), MinHash+LSH banding, SimHash, and n-gram Jaccard.
  *
  * Scale design (100 TB / 10^12 rows):
  *  - All signatures (shingles, minhash bands, simhash) are computed in the
  *    scan pass (codegen'd expressions or one explode+partial-agg), so the
  *    only shuffles are the bucket joins, which move O(#docs × #bands) small
  *    rows — never the documents themselves.
  *  - Candidate joins go through LSH buckets, not all-pairs: cost is
  *    Σ bucket_size², kept bounded by `maxBucket` (mega-buckets = stop
  *    signatures carrying no dedup information; dropping them is standard
  *    and logged, not silent).
  *  - Exact-dup groupBy benefits from map-side partial aggregation; hot
  *    fingerprints (boilerplate docs) pre-aggregate per task.
  */
object Dedup {

  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles; a document shorter than n words is its
    * own single shingle.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " "))))
      .otherwise(array(array_join(toks, " ")))
  }

  /** (n_docs, n_distinct, n_dup_groups) for exact dedup by md5(text). */
  def exactStats(df: DataFrame, textCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col(textCol))).as("n_distinct"))
      .withColumn("n_dups", col("n_docs") - col("n_distinct"))

  /** Duplicate groups: fingerprint + member count (>1 only). */
  def exactDupGroups(df: DataFrame, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("fingerprint"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** One MinHash band value: the lexicographic min over shingles of
    * md5(band ++ ":" ++ shingle). Deterministic, engine-agnostic (the DuckDB
    * oracle reproduces it exactly), and a faithful min-wise permutation
    * sketch per band.
    */
  def bandHash(sh: Column, band: Int): Column =
    array_min(transform(sh, s => md5(concat(lit(s"$band:"), s))))

  /** (key, band, h) — one row per document per band; the LSH index. */
  def minhashBands(df: DataFrame, keyCol: String, textCol: String,
                   numBands: Int, shingleN: Int = 3): DataFrame = {
    val sh = shingles(col(textCol), shingleN)
    val bandsArr = array((0 until numBands).map(b => bandHash(sh, b)): _*)
    df.select(col(keyCol), posexplode(bandsArr).as(Seq("band", "h")))
  }

  /** Candidate near-dup pairs: documents sharing ≥1 MinHash band bucket.
    * `maxBucket` drops degenerate mega-buckets (logged upstream) so the
    * bucket self-join stays bounded at scale.
    */
  def minhashCandidates(df: DataFrame, keyCol: String, textCol: String,
                        numBands: Int = 8, shingleN: Int = 3,
                        maxBucket: Long = 1000L): DataFrame = {
    val bands = minhashBands(df, keyCol, textCol, numBands, shingleN)
    // drop empty/mega buckets BEFORE pairing (skew valve), then generate
    // pairs with a bucket-equality self-join — parallelizes across buckets
    // instead of materializing n² arrays per bucket
    val bucketSizes = bands.groupBy("band", "h").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1 && col("n") <= maxBucket)
      .select("band", "h")
    val inBuckets = bands.join(bucketSizes, Seq("band", "h"))
    inBuckets.as("x").join(inBuckets.as("y"),
        col("x.band") === col("y.band") && col("x.h") === col("y.h") &&
          col(s"x.$keyCol") < col(s"y.$keyCol"))
      .select(col(s"x.$keyCol").as("a"), col(s"y.$keyCol").as("b"))
      .distinct()
  }

  /** Exact n-gram Jaccard over candidate pairs found by shingle co-occurrence.
    * `maxDf` removes stop-shingles (appearing in more than maxDf docs) before
    * the self-join — the skew valve at scale.
    */
  def jaccardPairs(df: DataFrame, keyCol: String, textCol: String,
                   shingleN: Int = 3, threshold: Double = 0.5,
                   maxDf: Long = Long.MaxValue): DataFrame = {
    val sh = df.select(col(keyCol).as("k"),
      explode(shingles(col(textCol), shingleN)).as("s"))
    val filtered =
      if (maxDf == Long.MaxValue) sh
      else {
        val hot = sh.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDf).select("s")
        sh.join(broadcast(hot), Seq("s"), "left_anti")
      }
    val sizes = filtered.groupBy("k").agg(count(lit(1)).as("n"))
    val inter = filtered.as("x").join(filtered.as("y"),
        col("x.s") === col("y.s") && col("x.k") < col("y.k"))
      .groupBy(col("x.k").as("a"), col("y.k").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("k", "a").withColumnRenamed("n", "na"), "a")
      .join(sizes.withColumnRenamed("k", "b").withColumnRenamed("n", "nb"), "b")
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** 16-bit SimHash over whitespace tokens (with multiplicity): bit i is the
    * sign of the token-count-weighted sum of hex digit i of md5(token)
    * (digit ≥ 8 → +1, else −1). One explode + one partial-aggregated groupBy.
    */
  def simhash16(df: DataFrame, keyCol: String, textCol: String): DataFrame = {
    val hexHi = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val tok = df.select(col(keyCol).as("k"),
      explode(tokens(col(textCol))).as("t"))
      .withColumn("h", md5(col("t")))
    val sums = (1 to 16).map { i =>
      sum(when(substring(col("h"), i, 1).isin(hexHi: _*), 1).otherwise(-1))
        .as(s"s_$i")
    }
    tok.groupBy("k").agg(sums.head, sums.tail: _*)
      .select(col("k"),
        (1 to 16).map { i =>
          when(col(s"s_$i") >= 0, lit(1L << (i - 1))).otherwise(lit(0L))
        }.reduce(_ + _).as("simhash"))
  }

  /** Near-dup pairs by SimHash hamming distance ≤ maxHamming. At 16 bits and
    * large corpora this self-joins on the full code first (distance 0 =
    * bucket join), then widens via the bit-flip neighborhood — here the
    * simple bounded variant: join on identical code.
    */
  def simhashDupes(df: DataFrame, keyCol: String, textCol: String): DataFrame = {
    val sh = simhash16(df, keyCol, textCol)
    sh.as("x").join(sh.as("y"),
        col("x.simhash") === col("y.simhash") && col("x.k") < col("y.k"))
      .select(col("x.k").as("a"), col("y.k").as("b"), col("x.simhash"))
  }
}
