package graft.sketch

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable
import scala.util.Random

/** Mixed-operation soak: interleaved insert / setCount (including 0 =
  * delete) / merge / serde / implicit grow against an exact Map oracle,
  * across wide+compact modes and several (q, hashBits) shapes. Guards
  * the insert fast paths (in-place count bump) and deletion semantics
  * under realistic operation interleavings — re-run after any kernel
  * surgery (ROUND1_NOTES lesson 11). */
class CqfSoakSpec extends AnyFunSuite {

  private def soak(q: Int, hashBits: Int, compact: Boolean, seed: Long,
      steps: Int): Unit = {
    val rnd = new Random(seed)
    var cqf = Cqf(q, hashBits, invertible = true, compact = compact)
    val oracle = mutable.Map.empty[Long, Long]
    val keySpace = 1L << math.min(hashBits, 14)
    var side = Cqf(q, hashBits, invertible = true, compact = compact)
    val sideOracle = mutable.Map.empty[Long, Long]

    for (step <- 1 to steps) {
      rnd.nextInt(100) match {
        case r if r < 55 => // insert with count 1-4
          val k = rnd.nextLong() % keySpace & (keySpace - 1)
          val c = 1L + rnd.nextInt(4)
          cqf.insert(k, c)
          oracle(k) = oracle.getOrElse(k, 0L) + c
        case r if r < 70 => // build the side filter
          val k = rnd.nextLong() % keySpace & (keySpace - 1)
          side.insert(k)
          sideOracle(k) = sideOracle.getOrElse(k, 0L) + 1
        case r if r < 80 => // setCount overwrite (sometimes 0 = delete)
          val k = rnd.nextLong() % keySpace & (keySpace - 1)
          val c = if (rnd.nextBoolean()) 0L else rnd.nextInt(1000).toLong
          cqf.setCount(k, c)
          if (c == 0L) oracle.remove(k) else oracle(k) = c
        case r if r < 90 => // serde round trip
          cqf = Cqf.deserialize(cqf.serialize())
        case _ => // merge the side filter in, reset it
          cqf.mergeInPlace(side)
          sideOracle.foreach { case (k, c) =>
            oracle(k) = oracle.getOrElse(k, 0L) + c
          }
          side = Cqf(q, hashBits, invertible = true, compact = compact)
          sideOracle.clear()
      }
      if (step % 400 == 0 || step == steps) {
        // full differential check: point queries + enumeration
        oracle.foreach { case (k, c) =>
          assert(cqf.count(k) == c, s"[$q/$hashBits/$compact] key $k at step $step")
        }
        val enumerated = cqf.keyIterator.toMap
        val nonZero = oracle.filter(_._2 > 0L)
        assert(enumerated == nonZero,
          s"[$q/$hashBits/$compact] enumeration mismatch at step $step: " +
          s"${enumerated.size} vs ${nonZero.size}")
      }
    }
    assert(cqf.distinctCount == oracle.count(_._2 > 0L))
    assert(cqf.totalCount == oracle.values.sum)
  }

  test("soak: wide mode, several shapes") {
    soak(q = 6, hashBits = 20, compact = false, seed = 101, steps = 2000)
    soak(q = 8, hashBits = 14, compact = false, seed = 102, steps = 2000)
    soak(q = 10, hashBits = 64, compact = false, seed = 103, steps = 2000)
  }

  test("soak: compact (u32-slot) mode, several shapes") {
    soak(q = 6, hashBits = 20, compact = true, seed = 201, steps = 2000)
    soak(q = 8, hashBits = 30, compact = true, seed = 202, steps = 2000)
    soak(q = 12, hashBits = 40, compact = true, seed = 203, steps = 2000)
  }
}
