import graft.sketch.Cqf

// kernel-only replica of the headline build's per-shard workload:
// PRE-MATERIALIZED zipf^2.5 tokens (pow paid outside the timed loop)
object KernelProbe {
  def xorshift(s0: Long): Long = {
    var s = s0; s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s
  }
  def main(args: Array[String]): Unit = {
    val perShard = 1700000
    def mkTokens(tid: Int): Array[Int] = {
      val a = new Array[Int](perShard)
      var seed = 0x9e3779b97f4a7c15L * (tid + 1)
      var i = 0
      while (i < perShard) {
        seed = xorshift(seed)
        val u = (seed >>> 11).toDouble / 9007199254740992.0
        a(i) = (math.pow(u, 2.5) * 50000).toInt
        i += 1
      }
      a
    }
    val tokenSets = (0 until 32).map(mkTokens).toArray
    def run(threads: Int): Double = {
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { tid =>
        val t = new Thread(() => {
          val c = Cqf(8, 40, invertible = true, compact = true)
          val toks = tokenSets(tid)
          var i = 0
          while (i < toks.length) { c.insert(toks(i).toLong); i += 1 }
          require(c.totalCount == perShard)
        })
        t.start(); t
      }
      ts.foreach(_.join())
      threads.toDouble * perShard / ((System.nanoTime() - t0) / 1e9) / 1e6
    }
    run(2)
    for (t <- Seq(1, 8, 32)) {
      val best = (1 to 3).map(_ => run(t)).max
      println(f"KPROBE $t%2d threads: $best%.1f M inserts/s (pre-materialized zipf tokens)")
    }
  }
}
