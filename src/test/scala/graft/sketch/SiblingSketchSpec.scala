package graft.sketch

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable
import scala.util.Random

/** Error-bound and merge-property tests for the sibling sketches
  * (SURVEY.md §5.2-2). Bounds are generous multiples of the published
  * asymptotics so the suite is deterministic-stable.
  */
class SiblingSketchSpec extends AnyFunSuite {

  // ---------------- HLL ----------------

  test("HLL relative error within 3·1.04/sqrt(m); merge == union") {
    val rnd = new Random(42)
    for (p <- Seq(10, 12, 14); trueN <- Seq(100, 10000, 200000)) {
      val h = HllSketch(p)
      var i = 0
      while (i < trueN) { h.add(rnd.nextLong()); i += 1 }
      val err = math.abs(h.estimate - trueN) / trueN.toDouble
      val bound = 3.0 * 1.04 / math.sqrt((1 << p).toDouble)
      assert(err <= bound, s"p=$p n=$trueN est=${h.estimate} err=$err bound=$bound")
    }
    // merge
    val a = HllSketch(12); val b = HllSketch(12); val u = HllSketch(12)
    for (i <- 0 until 50000) {
      val k = rnd.nextLong()
      if (i % 2 == 0) a.add(k) else b.add(k)
      u.add(k)
    }
    a.mergeInPlace(b)
    assert(a == u, "HLL merge must equal union build")
    // serde
    assert(HllSketch.deserialize(a.serialize()) == a)
  }

  test("HLL duplicates do not inflate the estimate") {
    val h = HllSketch(12)
    for (i <- 0 until 100000) h.add((i % 500).toLong)
    val err = math.abs(h.estimate - 500) / 500.0
    assert(err <= 3.0 * 1.04 / math.sqrt(4096.0), s"est=${h.estimate}")
  }

  // ---------------- Count-min ----------------

  test("CMS overestimate-only and ≤ εN bound; merge additive") {
    val rnd = new Random(7)
    val eps = 0.005
    val cms = CountMinSketch.fromError(eps, 0.01)
    val oracle = mutable.Map.empty[Long, Long]
    var n = 0L
    for (_ <- 1 to 100000) {
      // zipf-ish: heavy head
      val k = (math.pow(rnd.nextDouble(), 3.0) * 5000).toLong
      cms.add(k)
      oracle(k) = oracle.getOrElse(k, 0L) + 1
      n += 1
    }
    assert(cms.total == n)
    var violations = 0
    oracle.foreach { case (k, c) =>
      val est = cms.estimate(k)
      assert(est >= c, s"CMS must never underestimate (key $k: $est < $c)")
      if (est > c + (eps * n).toLong) violations += 1
    }
    // ≤ εN holds with prob 1-δ per key; allow a small violation fraction
    assert(violations <= math.max(2, oracle.size / 50), s"violations=$violations")
    // merge == single build
    val a = CountMinSketch(5, 1024); val b = CountMinSketch(5, 1024)
    val whole = CountMinSketch(5, 1024)
    for (i <- 0 until 20000) {
      val k = rnd.nextInt(800).toLong
      (if (i % 2 == 0) a else b).add(k)
      whole.add(k)
    }
    assert(a.mergeInPlace(b) == whole)
    assert(CountMinSketch.deserialize(whole.serialize()) == whole)
  }

  // ---------------- Bloom ----------------

  test("Bloom: no false negatives; FPR within 2× formula; merge == union") {
    val rnd = new Random(11)
    val n = 20000
    val bloom = BloomSketch.fromExpected(n, 0.01)
    val present = mutable.Set.empty[Long]
    while (present.size < n) {
      val k = rnd.nextLong()
      bloom.add(k)
      present += k
    }
    present.foreach(k => assert(bloom.mightContain(k), "false negative!"))
    var fp = 0
    val trials = 100000
    var t = 0
    while (t < trials) {
      val k = rnd.nextLong()
      if (!present.contains(k) && bloom.mightContain(k)) fp += 1
      t += 1
    }
    val fpr = fp.toDouble / trials
    assert(fpr <= 0.02, s"FPR $fpr exceeds 2× the 1% design target")
    assert(math.abs(bloom.expectedFpp - fpr) < 0.01)
    // merge
    val a = BloomSketch(1 << 14, 4); val b = BloomSketch(1 << 14, 4)
    val u = BloomSketch(1 << 14, 4)
    for (i <- 0 until 2000) {
      val k = rnd.nextLong()
      (if (i % 2 == 0) a else b).add(k)
      u.add(k)
    }
    assert(a.mergeInPlace(b) == u)
    assert(BloomSketch.deserialize(u.serialize()) == u)
  }

  // ---------------- t-digest ----------------

  test("t-digest quantiles within tolerance on uniform and lognormal") {
    val rnd = new Random(3)
    for (dist <- Seq("uniform", "lognormal")) {
      val n = 100000
      val data = Array.fill(n)(dist match {
        case "uniform" => rnd.nextDouble()
        case _ => math.exp(rnd.nextGaussian())
      })
      val td = TDigest(100)
      data.foreach(td.add(_))
      val sorted = data.sorted
      for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
        val est = td.quantile(q)
        // measure error in rank space: |cdf_true(est) - q|
        val rank = {
          var lo = 0; var hi = n
          while (lo < hi) { val mid = (lo + hi) / 2; if (sorted(mid) <= est) lo = mid + 1 else hi = mid }
          lo.toDouble / n
        }
        assert(math.abs(rank - q) <= 0.02,
          s"$dist q=$q est=$est rank=$rank (err ${math.abs(rank - q)})")
      }
      assert(math.abs(td.cdf(sorted(n / 2)) - 0.5) < 0.02)
    }
  }

  test("t-digest merge keeps quantile accuracy; serde round-trips") {
    val rnd = new Random(5)
    val parts = Array.fill(8)(TDigest(100))
    val n = 80000
    val data = Array.fill(n)(rnd.nextGaussian())
    data.zipWithIndex.foreach { case (x, i) => parts(i % 8).add(x) }
    val merged = parts.reduceLeft(_.mergeInPlace(_))
    val sorted = data.sorted
    for (q <- Seq(0.05, 0.5, 0.95)) {
      val est = merged.quantile(q)
      val trueV = sorted((q * (n - 1)).toInt)
      val rank = sorted.count(_ <= est).toDouble / n
      assert(math.abs(rank - q) <= 0.03, s"q=$q est=$est true=$trueV")
    }
    val back = TDigest.deserialize(merged.serialize())
    for (q <- Seq(0.1, 0.5, 0.9))
      assert(math.abs(back.quantile(q) - merged.quantile(q)) < 1e-9)
    assert(math.abs(merged.totalWeight - n) < 1e-6)
  }

  // ---------------- KLL ----------------

  test("KLL rank error ≤ 3·1.33/k; quantiles sane; merge; serde") {
    val rnd = new Random(9)
    val n = 200000
    val k = 200
    val kll = KllSketch(k)
    val data = Array.fill(n)(rnd.nextDouble() * 1000)
    data.foreach(kll.add)
    assert(kll.n == n)
    val sorted = data.sorted
    val bound = 3.0 * 1.33 / k
    for (q <- Seq(0.01, 0.1, 0.5, 0.9, 0.99)) {
      val est = kll.quantile(q)
      val rank = sorted.count(_ <= est).toDouble / n
      assert(math.abs(rank - q) <= bound, s"q=$q est=$est rank=$rank bound=$bound")
      val rEst = kll.rank(sorted((q * (n - 1)).toInt)).toDouble / n
      assert(math.abs(rEst - q) <= bound, s"rank(q=$q)=$rEst")
    }
    // merge across 8 partitions
    val parts = Array.fill(8)(KllSketch(k))
    data.zipWithIndex.foreach { case (x, i) => parts(i % 8).add(x) }
    val merged = parts.reduceLeft(_.mergeInPlace(_))
    assert(merged.n == n)
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val rank = sorted.count(_ <= merged.quantile(q)).toDouble / n
      assert(math.abs(rank - q) <= bound, s"merged q=$q rank=$rank")
    }
    val back = KllSketch.deserialize(merged.serialize())
    assert(back.n == merged.n)
    for (q <- Seq(0.25, 0.75))
      assert(back.quantile(q) == merged.quantile(q))
  }

  test("corrupt HLL/KLL/TD inputs fail cleanly") {
    val h = HllSketch(12)
    (0L until 100L).foreach(h.add)
    val okH = h.serialize()
    val badP = okH.clone(); badP(8) = 60.toByte // p=60 would OOM unguarded
    intercept[IllegalArgumentException](HllSketch.deserialize(badP))
    intercept[IllegalArgumentException](
      HllSketch.deserialize(java.util.Arrays.copyOf(okH, okH.length - 7)))
    // payload semantics: a register above the rank invariant (64-p+1)
    // wraps the shift-based estimate; a negative one drives it negative
    val badReg = okH.clone(); badReg(16) = 64.toByte
    intercept[IllegalArgumentException](HllSketch.deserialize(badReg))
    val negReg = okH.clone(); negReg(16) = (-3).toByte
    intercept[IllegalArgumentException](HllSketch.deserialize(negReg))

    val k = KllSketch(200)
    (0 until 500).foreach(i => k.add(i.toDouble))
    val okK = k.serialize()
    val badL = okK.clone(); badL(32) = 0x7f.toByte // absurd nLevels
    intercept[IllegalArgumentException](KllSketch.deserialize(badL))

    val td = TDigest(100.0)
    td.add(1.0)
    intercept[IllegalArgumentException](td.add(2.0, -1.0))
    intercept[IllegalArgumentException](td.add(2.0, Double.NaN))
    assert(td.quantile(0.5) == 1.0)
  }
}
