package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

/** sketch_meta's kernel half: magic dispatch across all eight kinds and
  * the per-kind field semantics documented on [[SketchMeta]]. */
class SketchMetaSpec extends AnyFunSuite {

  test("dispatches every kind by magic; fields match the structures") {
    val cqf = Cqf(10, 40, invertible = true, compact = true)
    (0 until 5000).foreach(i => cqf.insert((i % 700).toLong))
    val mc = SketchMeta.of(cqf.serialize())
    assert(mc.kind == "cqf" && mc.n == 5000L && mc.distinct == 700L)
    assert(mc.load > 0 && mc.load <= 1.0 && mc.param == cqf.quotientBits)
    assert(mc.errBound == 0.0) // invertible hash = exact membership

    val nonInv = Cqf(10, 16, invertible = false)
    (0 until 900).foreach(i => nonInv.insert(i.toLong))
    val mni = SketchMeta.of(nonInv.serialize())
    assert(mni.errBound > 0.0 && // published delta = n / 2^hash_bits
      math.abs(mni.errBound - mni.distinct.toDouble / (1 << 16)) < 1e-12)

    val hll = HllSketch(12)
    (0 until 10000).foreach(i => hll.add(i.toLong))
    val mh = SketchMeta.of(hll.serialize())
    assert(mh.kind == "hll" && mh.n == -1L && mh.param == 12L)
    assert(math.abs(mh.distinct - 10000L) <= 3 * 1.04 / 64.0 * 10000)
    assert(math.abs(mh.errBound - 1.04 / 64.0) < 1e-12)

    val cms = CountMinSketch(5, 2048)
    (0 until 3000).foreach(i => cms.add((i % 100).toLong))
    val mm = SketchMeta.of(cms.serialize())
    assert(mm.kind == "cms" && mm.n == 3000L && mm.distinct == -1L)
    assert(mm.load > 0 && mm.load <= 1.0 && mm.param == 2048L)

    val bloom = BloomSketch(1L << 16, 5)
    (0 until 2000).foreach(i => bloom.add(i.toLong))
    val mb = SketchMeta.of(bloom.serialize())
    assert(mb.kind == "bloom" && mb.n == -1L)
    assert(mb.load > 0 && mb.load < 1.0 && mb.errBound == bloom.expectedFpp)

    val td = TDigest(100.0)
    (0 until 5000).foreach(i => td.add(i.toDouble))
    val mt = SketchMeta.of(td.serialize())
    assert(mt.kind == "tdigest" && mt.n == 5000L && mt.errBound.isNaN)
    assert(mt.load > 0 && mt.load <= 2.0 && mt.param == 100L)

    val kll = KllSketch(200)
    (0 until 5000).foreach(i => kll.add(i.toDouble))
    val mk = SketchMeta.of(kll.serialize())
    assert(mk.kind == "kll" && mk.n == 5000L && mk.param == 200L)
    assert(mk.load > 0 && mk.load <= 1.0)
    assert(math.abs(mk.errBound - 1.33 / 200.0) < 1e-12)

    val kmvExact = KmvSketch(256)
    (0 until 5000).foreach(i => kmvExact.add((i % 100).toLong))
    val me = SketchMeta.of(kmvExact.serialize())
    assert(me.kind == "kmv" && me.n == -1L && me.distinct == 100L)
    assert(me.load == 100.0 / 256.0 && me.param == 256L && me.errBound == 0.0)
    val kmvFull = KmvSketch(256)
    (0 until 5000).foreach(i => kmvFull.add(i.toLong))
    val mf = SketchMeta.of(kmvFull.serialize())
    assert(mf.kind == "kmv" && mf.load == 1.0)
    assert(math.abs(mf.errBound - 1.0 / math.sqrt(254.0)) < 1e-12)
    assert(math.abs(mf.distinct - 5000.0) <= 4 * mf.errBound * 5000.0)
  }

  test("unrecognized or truncated bytes fail cleanly") {
    assert(SketchMeta.kindOf(null).isEmpty)
    assert(SketchMeta.kindOf(Array[Byte](1, 2, 3)).isEmpty)
    assert(SketchMeta.kindOf(Array.fill[Byte](64)(0x41)).isEmpty)
    intercept[IllegalArgumentException](SketchMeta.of(Array.fill[Byte](64)(0x41)))
    // the reference's headerless mmap image is NOT sniffable — documented
    val c = Cqf(8, 32, invertible = true, compact = true)
    c.insert(1L)
    assert(SketchMeta.kindOf(Cqf.exportRefLayout(c)).isEmpty)
  }
}
