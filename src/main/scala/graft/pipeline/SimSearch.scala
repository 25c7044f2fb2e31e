package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Two arms:
  *  - brute-force cosine top-k — correct baseline; the probe set is
  *    broadcast, so the big side streams once with no shuffle of vectors.
  *  - random-hyperplane LSH — the scale path: a per-vector bucket signature
  *    computed in the scan (pure expressions), then a bucket-equality
  *    self-join; only bucket-colliding pairs pay the exact cosine.
  *
  * All arithmetic is double-precision positional fold (aggregate over
  * zip_with) so results are bit-reproducible across partitionings and match
  * the DuckDB oracle exactly.
  */
object SimSearch {

  private def asD(c: Column): Column = c.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asD(a), asD(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each probe vector (probes broadcast).
    * Output: (query_id, neighbor_id, rank); ties broken by neighbor id.
    */
  def bruteTopK(corpus: DataFrame, probes: DataFrame, keyCol: String,
                vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // norms are per-ROW, computed once per side — not per pair (the join
    // would otherwise re-fold each probe's norm for every corpus row);
    // sqrt(dot(v,v)) is the same expression, so sim stays bit-identical
    val q = probes.select(col(keyCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"))
    val c = PipelineUtil.fanOut(corpus.select(col(keyCol), col(vecCol)))
      .select(col(keyCol).as("neighbor_id"), col(vecCol).as("cv"),
        norm(col(vecCol)).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Deterministic ±1 random hyperplanes (splitmix64-seeded) as literal
    * arrays — reproducible across engines, embeddable in an oracle query.
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    def mix(a: Long): Long = {
      var z = a + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    (0 until numPlanes).map { p =>
      Array.tabulate(dim)(d => if (mix(seed ^ (p.toLong << 32) ^ d) >= 0) 1.0 else -1.0)
    }
  }

  /** Sign-bit bucket id from the hyperplane battery — computed inline in the
    * scan, no UDF.
    */
  def lshBucket(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (h, i) =>
      val hLit = array(h.map(lit): _*)
      when(dot(vec, hLit) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Near-duplicate pairs above a cosine threshold, candidate-filtered by an
    * LSH bucket equality join (identical sign signature ⇒ low angular
    * distance). Recall/cost tradeoff via numPlanes.
    */
  def lshNearDup(df: DataFrame, keyCol: String, vecCol: String,
                 threshold: Double, numPlanes: Int = 8,
                 dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(numPlanes, dim, seed)
    // signature + norm computed once per row in ONE select (multi-referenced
    // non-cheap aliases survive CollapseProject); the per-pair work is one
    // dot product + a multiply
    val withB = PipelineUtil.fanOut(df.select(col(keyCol), col(vecCol)))
      .select(col(keyCol).as("k"), col(vecCol).as("v"),
        lshBucket(col(vecCol), planes).as("bucket"),
        norm(col(vecCol)).as("n"))
    withB.as("x").join(withB.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.k") < col("y.k"))
      .withColumn("sim",
        round(dot(col("x.v"), col("y.v")) / (col("x.n") * col("y.n")), 6))
      .filter(col("sim") >= threshold)
      .select(col("x.k").as("a"), col("y.k").as("b"), col("sim"))
  }

  /** IVF (inverted-file) coarse quantizer: Lloyd's k-means on a bounded
    * driver-side sample (deterministic take, seeded init), centroids
    * broadcast as literal arrays. At 100 TB the sample stays bounded and the
    * assignment/probing is pure per-row expressions over the scan — the
    * classic IVF layout where only nProbe cells pay the exact distance.
    */
  final case class IvfModel(centroids: Seq[Array[Double]]) {
    // per-centroid scores s_i = dot(v,c_i)/(|v|·|c_i|). The vector's norm is
    // taken as a PRECOMPUTED column (ivfTopK already materializes it per
    // row) — recomputing it per centroid would fold the vector k extra
    // times per row in the scan, pure waste at 10^12 rows. |c_i| stays a
    // Spark expression over the literal array: Catalyst constant-folds it
    // once, and the DuckDB oracle folds the identical literal in the same
    // order, keeping scores bit-identical.
    private def scoredStructs(vec: Column, vecNorm: Column): Seq[Column] =
      centroids.zipWithIndex.map { case (c, i) =>
        val cLit = array(c.map(lit): _*)
        struct((dot(vec, cLit) / (vecNorm * norm(cLit))).as("s"), lit(i).as("i"))
      }

    /** Nearest-centroid id for a vector column (argmax of cosine; ties to
      * the larger index, matching the oracle's ORDER BY s DESC, i DESC).
      */
    def cell(vec: Column, vecNorm: Column): Column =
      array_max(array(scoredStructs(vec, vecNorm): _*)).getField("i")

    def cell(vec: Column): Column = cell(vec, norm(vec))

    /** The nProbe nearest cells for a probe vector. */
    def probeCells(vec: Column, vecNorm: Column, nProbe: Int): Column =
      slice(reverse(array_sort(array(scoredStructs(vec, vecNorm): _*))),
        1, nProbe).getField("i")

    def probeCells(vec: Column, nProbe: Int): Column =
      probeCells(vec, norm(vec), nProbe)
  }

  /** Train the coarse quantizer on a deterministic sample (first `sampleN`
    * by key order — reproducible across partitionings).
    */
  def trainIvf(df: DataFrame, keyCol: String, vecCol: String,
               k: Int = 16, iters: Int = 5, sampleN: Int = 2000,
               seed: Long = 42L): IvfModel = {
    val sample = df.orderBy(col(keyCol)).limit(sampleN)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "empty training sample")
    def mix(a: Long): Long = {
      var z = a + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    var centroids = (0 until k).map(i =>
      sample(math.floorMod(mix(seed ^ i), sample.length.toLong).toInt).clone()).toArray
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) -1.0 else d / math.sqrt(na * nb)
    }
    (1 to iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](sample.head.length))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val best = (0 until k).maxBy(i => cos(v, centroids(i)))
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      centroids = (0 until k).map { i =>
        if (counts(i) == 0) centroids(i)
        else sums(i).map(_ / counts(i))
      }.toArray
    }
    IvfModel(centroids.toSeq)
  }

  /** IVF top-k: probes search only their nProbe nearest cells. The cell
    * assignment is computed in the scan; the join is an equi-join on cell id
    * (shuffle moves O(rows) small (cell, key) pairs, never re-shuffles by
    * probe), then exact cosine only within probed cells.
    */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, keyCol: String,
              vecCol: String, k: Int, model: IvfModel, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = PipelineUtil.fanOut(corpus.select(col(keyCol), col(vecCol)))
      .select(col(keyCol).as("neighbor_id"), col(vecCol).as("cv"),
        norm(col(vecCol)).as("cn"))
      .withColumn("cell", model.cell(col("cv"), col("cn")))
    val q = probes.select(col(keyCol).as("query_id"), col(vecCol).as("qv"),
        norm(col(vecCol)).as("qn"))
      .withColumn("cell", explode(model.probeCells(col("qv"), col("qn"), nProbe)))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** recall@k of the IVF path against the brute-force baseline on the same
    * corpus/probes: |ivf ∩ truth| / |truth|. Records the accuracy/cost
    * tradeoff per (k, nProbe) — consumed by the bench's recall arm.
    */
  def ivfRecallAtK(corpus: DataFrame, probes: DataFrame, keyCol: String,
                   vecCol: String, k: Int, model: IvfModel,
                   nProbe: Int): Double = {
    val truth = bruteTopK(corpus, probes, keyCol, vecCol, k)
      .select("query_id", "neighbor_id")
    val approx = ivfTopK(corpus, probes, keyCol, vecCol, k, model, nProbe)
      .select("query_id", "neighbor_id")
    val n = truth.count()
    if (n == 0L) 1.0
    else truth.join(approx, Seq("query_id", "neighbor_id")).count().toDouble / n
  }

  /** Brute-force near-dup (all pairs) — the oracle/recall baseline. */
  def bruteNearDup(df: DataFrame, keyCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    val v = PipelineUtil.fanOut(df.select(col(keyCol), col(vecCol)))
      .select(col(keyCol).as("k"), col(vecCol).as("v"),
        norm(col(vecCol)).as("n"))
    v.as("x").join(v.as("y"), col("x.k") < col("y.k"))
      .withColumn("sim",
        round(dot(col("x.v"), col("y.v")) / (col("x.n") * col("y.n")), 6))
      .filter(col("sim") >= threshold)
      .select(col("x.k").as("a"), col("y.k").as("b"), col("sim"))
  }
}
