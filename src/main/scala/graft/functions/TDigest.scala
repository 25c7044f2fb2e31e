package graft.functions

import java.nio.ByteBuffer

/** A compact merging t-digest (Dunning's merging-digest form, public
  * algorithm): centroids bounded by the k1-ish size limit
  * 4·n·q·(1−q)/δ, inserts buffered and folded in by a sort-merge pass.
  *
  * Mergeable + byte-serializable — the property the per-partition ledger
  * needs (SURVEY.md §4.2: "checkpoint/resume + partition-mergeable ledgers
  * want serializable mergeable sketches", the reason `percentile_approx`
  * alone doesn't suffice).
  */
final class TDigest(val compression: Int) extends Serializable {
  private var means = new Array[Double](0)
  private var weights = new Array[Double](0)
  private var bufMeans = new Array[Double](512)
  private var bufWeights = new Array[Double](512)
  private var bufN = 0
  private var totalWeight = 0.0
  private var dMin = Double.PositiveInfinity
  private var dMax = Double.NegativeInfinity

  def size: Int = means.length
  def total: Double = totalWeight

  def add(x: Double, w: Double = 1.0): Unit = {
    if (x.isNaN) return
    if (bufN == bufMeans.length) compress()
    bufMeans(bufN) = x
    bufWeights(bufN) = w
    bufN += 1
    totalWeight += w
    if (x < dMin) dMin = x
    if (x > dMax) dMax = x
  }

  def merge(other: TDigest): Unit = {
    other.compress()
    // update totalWeight BEFORE inserting: a mid-loop compress() must see the
    // full denominator or q exceeds 1 and the size limit degenerates
    totalWeight += other.totalWeight
    if (other.dMin < dMin) dMin = other.dMin
    if (other.dMax > dMax) dMax = other.dMax
    var i = 0
    while (i < other.means.length) {
      if (bufN == bufMeans.length) compress()
      bufMeans(bufN) = other.means(i)
      bufWeights(bufN) = other.weights(i)
      bufN += 1
      i += 1
    }
  }

  def compress(): Unit = {
    if (bufN == 0) return
    val n = means.length + bufN
    val ms = new Array[Double](n)
    val ws = new Array[Double](n)
    System.arraycopy(means, 0, ms, 0, means.length)
    System.arraycopy(bufMeans, 0, ms, means.length, bufN)
    System.arraycopy(weights, 0, ws, 0, means.length)
    System.arraycopy(bufWeights, 0, ws, means.length, bufN)
    bufN = 0
    // sort (mean, weight) pairs by mean
    val idx = (0 until n).sortBy(ms(_)).toArray
    val outM = new Array[Double](n)
    val outW = new Array[Double](n)
    var k = -1
    var cum = 0.0
    var i = 0
    while (i < n) {
      val m = ms(idx(i)); val w = ws(idx(i))
      val q = if (totalWeight <= 0) 0.0 else (cum + w / 2) / totalWeight
      val limit = math.max(1.0, 4.0 * totalWeight * q * (1 - q) / compression)
      if (k >= 0 && outW(k) + w <= limit) {
        outM(k) = (outM(k) * outW(k) + m * w) / (outW(k) + w)
        outW(k) += w
      } else {
        k += 1
        outM(k) = m
        outW(k) = w
      }
      cum += w
      i += 1
    }
    means = java.util.Arrays.copyOf(outM, k + 1)
    weights = java.util.Arrays.copyOf(outW, k + 1)
  }

  /** Quantile estimate at probability q (0..1) by linear interpolation over
    * centroid midpoints, pinned to observed min/max at the tails.
    */
  def quantile(q: Double): Double = {
    compress()
    if (means.isEmpty) return Double.NaN
    if (means.length == 1) return means(0)
    val target = q * totalWeight
    var cum = 0.0
    var i = 0
    var prevMid = 0.0
    var prevX = dMin
    while (i < means.length) {
      val mid = cum + weights(i) / 2
      if (target < mid) {
        val frac = if (mid - prevMid <= 0) 0.0 else (target - prevMid) / (mid - prevMid)
        return prevX + frac * (means(i) - prevX)
      }
      cum += weights(i)
      prevMid = mid
      prevX = means(i)
      i += 1
    }
    dMax
  }

  private[functions] def setState(tw: Double, mn: Double, mx: Double): Unit = {
    totalWeight = tw; dMin = mn; dMax = mx
  }

  def toBytes: Array[Byte] = {
    compress()
    val buf = ByteBuffer.allocate(4 + 8 * 3 + 4 + means.length * 16)
    buf.putInt(compression)
    buf.putDouble(totalWeight).putDouble(dMin).putDouble(dMax)
    buf.putInt(means.length)
    var i = 0
    while (i < means.length) { buf.putDouble(means(i)).putDouble(weights(i)); i += 1 }
    buf.array()
  }
}

object TDigest {
  def fromBytes(bytes: Array[Byte]): TDigest = {
    val buf = ByteBuffer.wrap(bytes)
    val d = new TDigest(buf.getInt)
    val tw = buf.getDouble
    val mn = buf.getDouble
    val mx = buf.getDouble
    val n = buf.getInt
    var i = 0
    while (i < n) {
      val m = buf.getDouble; val w = buf.getDouble
      d.add(m, w)
      i += 1
    }
    // restore exact bookkeeping (adds recomputed approximations)
    d.compress()
    d.setState(tw, mn, mx)
    d
  }
}
