package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Merging t-digest (Dunning & Ertl, "Computing Extremely Accurate Quantiles
  * Using t-Digests") with the k1 scale function. Centroid count is bounded by
  * the compression parameter, so the serialized state stays O(compression)
  * regardless of input rows — the same contract the reference pins in
  * `percentile_agg_state_is_bounded` (`/root/reference/src/functions.rs:1508-1526`).
  *
  * This is a from-scratch implementation of the published algorithm (no code
  * ported); 200 is the reference's default compression.
  */
final class TDigest(val compression: Double) extends Serializable {
  private var means = new Array[Double](64)
  private var weights = new Array[Double](64)
  private var n = 0 // live centroids (sorted by mean)

  private var bufMeans = new Array[Double](256)
  private var bufWeights = new Array[Double](256)
  private var bufN = 0

  var totalWeight: Double = 0.0
  var min: Double = Double.PositiveInfinity
  var max: Double = Double.NegativeInfinity

  def isEmpty: Boolean = totalWeight == 0

  def add(x: Double, w: Double = 1.0): Unit = {
    if (x.isNaN) return
    if (bufN == bufMeans.length) compress()
    bufMeans(bufN) = x
    bufWeights(bufN) = w
    bufN += 1
    totalWeight += w
    if (x < min) min = x
    if (x > max) max = x
  }

  def merge(other: TDigest): Unit = {
    other.compress()
    // account for the incoming weight BEFORE copying centroids: compress()
    // can trigger mid-copy and normalizes quantiles by totalWeight — a stale
    // (smaller) total would clamp q past 1.0 and over-merge the upper tail
    totalWeight += other.totalWeight
    if (other.min < min) min = other.min
    if (other.max > max) max = other.max
    var i = 0
    while (i < other.n) {
      if (bufN == bufMeans.length) compress()
      bufMeans(bufN) = other.means(i)
      bufWeights(bufN) = other.weights(i)
      bufN += 1
      i += 1
    }
  }

  private def kScale(q: Double): Double =
    compression / (2.0 * math.Pi) * math.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0)

  /** Merge buffered points into the centroid set, enforcing the k1 size
    * bound. */
  def compress(): Unit = {
    if (bufN == 0) return
    // sort the buffer (insertion into merged array below requires order)
    val order = (0 until bufN).sortBy(bufMeans)
    val sm = order.map(bufMeans).toArray
    val sw = order.map(bufWeights).toArray
    // merge-sort existing centroids with buffer
    val totalN = n + bufN
    val am = new Array[Double](totalN)
    val aw = new Array[Double](totalN)
    var i = 0; var j = 0; var k = 0
    while (i < n || j < bufN) {
      if (j >= bufN || (i < n && means(i) <= sm(j))) {
        am(k) = means(i); aw(k) = weights(i); i += 1
      } else {
        am(k) = sm(j); aw(k) = sw(j); j += 1
      }
      k += 1
    }
    // greedy recombination under the k1 bound
    val om = new Array[Double](totalN)
    val ow = new Array[Double](totalN)
    var outN = 0
    var curMean = am(0); var curW = aw(0)
    var wSoFar = 0.0
    var idx = 1
    while (idx < totalN) {
      val q0 = wSoFar / totalWeight
      val q1 = (wSoFar + curW + aw(idx)) / totalWeight
      if (kScale(q1) - kScale(q0) <= 1.0) {
        val w = curW + aw(idx)
        curMean = curMean + (am(idx) - curMean) * aw(idx) / w
        curW = w
      } else {
        om(outN) = curMean; ow(outN) = curW; outN += 1
        wSoFar += curW
        curMean = am(idx); curW = aw(idx)
      }
      idx += 1
    }
    om(outN) = curMean; ow(outN) = curW; outN += 1
    if (means.length < outN) {
      means = new Array[Double](math.max(outN, means.length * 2))
      weights = new Array[Double](means.length)
    }
    System.arraycopy(om, 0, means, 0, outN)
    System.arraycopy(ow, 0, weights, 0, outN)
    n = outN
    bufN = 0
  }

  /** Interpolated quantile estimate; NaN when empty.
    *
    * Rank convention: the target position is `q·(N−1) + 0.5` in cumulative
    * weight space, interpolated linearly between centroid midpoints — the
    * convention of the reference's tdigests crate (`estimate_quantile`;
    * pinned by the reference's own percentile fixtures: the median of two
    * singletons {25,35} is 30, quartiles of small singleton sets land ON
    * the sample values, and p95 of {100,150,200} is 195). */
  def quantile(q: Double): Double = {
    compress()
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    val target = q * (totalWeight - 1.0) + 0.5
    if (target <= weights(0) / 2) {
      // interpolate between min and first centroid center
      val c0 = weights(0) / 2
      return min + (means(0) - min) * math.max(0.0, target) / c0
    }
    var cum = 0.0
    var i = 0
    while (i < n - 1) {
      val center = cum + weights(i) / 2
      val nextCenter = cum + weights(i) + weights(i + 1) / 2
      if (target >= center && target < nextCenter) {
        val f = (target - center) / (nextCenter - center)
        return means(i) + (means(i + 1) - means(i)) * f
      }
      cum += weights(i)
      i += 1
    }
    // tail: between last centroid center and max
    val lastCenter = cum + weights(n - 1) / 2
    val span = totalWeight - lastCenter
    if (span <= 0) max
    else {
      val f = math.min(1.0, (target - lastCenter) / span)
      means(n - 1) + (max - means(n - 1)) * f
    }
  }

  def centroidCount: Int = { compress(); n }

  def toBytes: Array[Byte] = {
    compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(TDigest.Magic)
    out.writeDouble(compression)
    out.writeDouble(min)
    out.writeDouble(max)
    out.writeInt(n)
    var i = 0
    while (i < n) { out.writeDouble(means(i)); out.writeDouble(weights(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }
}

object TDigest {
  val Magic: Int = 0x54444731 // "TDG1"
  val DefaultCompression: Double = 200.0 // reference functions.rs:1096-1209

  def fromBytes(bytes: Array[Byte]): TDigest = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readInt() == Magic, "not a TDG1 digest")
    val d = new TDigest(in.readDouble())
    val mn = in.readDouble(); val mx = in.readDouble()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val m = in.readDouble(); val w = in.readDouble()
      d.add(m, w)
      i += 1
    }
    d.min = mn
    d.max = mx
    d
  }
}
