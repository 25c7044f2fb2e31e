package graft

import graft.functions.{TDigest, TDigestAgg}
import org.apache.spark.sql.functions._

/** Mergeable t-digest quantile sketch: accuracy, merge ≈ global, serde
  * round-trip, Catalyst aggregate integration, partition-mergeable ledger
  * use.
  */
class TDigestSpec extends SparkTestBase {
  import spark.implicits._

  private val uniform: Seq[Double] = {
    // deterministic pseudo-uniform sample
    var x = 42L
    (1 to 20000).map { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 11).toDouble / (1L << 53).toDouble) * 1000.0
    }
  }

  test("quantile accuracy on uniform data (local digest)") {
    val d = new TDigest(100)
    uniform.foreach(d.add(_))
    Seq(0.01, 0.25, 0.5, 0.75, 0.99).foreach { q =>
      val got = d.quantile(q)
      assert(math.abs(got - q * 1000.0) < 15.0, s"q=$q got=$got")
    }
    assert(d.size < 6 * d.compression, s"digest grew to ${d.size} centroids")
  }

  test("merge of shard digests ≈ global digest (ledger mergeability)") {
    val shards = uniform.grouped(2500).map { chunk =>
      val d = new TDigest(100)
      chunk.foreach(d.add(_))
      d
    }.toSeq
    val merged = new TDigest(100)
    shards.foreach(merged.merge)
    val global = new TDigest(100)
    uniform.foreach(global.add(_))
    Seq(0.1, 0.5, 0.9).foreach { q =>
      assert(math.abs(merged.quantile(q) - global.quantile(q)) < 20.0)
    }
  }

  test("serialization round-trips through bytes (checkpoint format)") {
    val d = new TDigest(100)
    uniform.take(5000).foreach(d.add(_))
    val back = TDigest.fromBytes(d.toBytes)
    Seq(0.05, 0.5, 0.95).foreach { q =>
      assert(math.abs(back.quantile(q) - d.quantile(q)) < 1e-6)
    }
    assert(back.total == d.total)
  }

  test("Catalyst aggregate: tdigest_quantiles over a DataFrame, any partitioning") {
    val df = uniform.toDF("v")
    def quantiles(parts: Int): Seq[Double] =
      df.repartition(parts)
        .agg(TDigestAgg.tdigestQuantiles(col("v"), Seq(0.25, 0.5, 0.75)).as("q"))
        .collect()(0).getAs[scala.collection.Seq[Double]]("q").toSeq
    val q1 = quantiles(1)
    val q8 = quantiles(8)
    q1.zip(Seq(250.0, 500.0, 750.0)).foreach { case (got, exp) =>
      assert(math.abs(got - exp) < 15.0, s"got $got want ~$exp")
    }
    q1.zip(q8).foreach { case (a, b) => assert(math.abs(a - b) < 25.0) }
  }

  test("Catalyst aggregate: binary sketches merge across groups") {
    val df = uniform.zipWithIndex.map { case (v, i) => (i % 4, v) }.toDF("g", "v")
    val sketches = df.groupBy("g")
      .agg(TDigestAgg.tdigestSketch(col("v")).as("sk"))
      .collect().map(_.getAs[Array[Byte]]("sk"))
    assert(sketches.length == 4)
    val merged = new TDigest(100)
    sketches.foreach(b => merged.merge(TDigest.fromBytes(b)))
    assert(math.abs(merged.quantile(0.5) - 500.0) < 20.0)
    assert(merged.total == uniform.size)
  }

  test("stats path with tdigest quantile arm agrees with percentile_approx") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    def quartiles(mode: String): Seq[Double] = {
      val aggs = graft.table.TableChecks.statAggs(df, Seq("l_extendedprice"), mode)
      df.agg(aggs.head, aggs.tail: _*).collect()(0)
        .getAs[String]("l_extendedprice__q").split(",").map(_.toDouble).toSeq
    }
    val approx = quartiles("approx")
    val td = quartiles("tdigest")
    approx.zip(td).foreach { case (a, b) =>
      assert(math.abs(a - b) / math.max(a, 1.0) < 0.05, s"$a vs $b")
    }
  }
}
