package graft

import graft.sketch.{Cqf, CqfBuilder, WangHash}

/** Single-JVM microbenchmarks backing BASELINE.md:
  *
  *  - `insert`: the reference binary's own workload
  *    (/root/reference/src/main.rs:6-22,96-105 — LOGN_SLOTS=26,
  *    HASH_BITS=46, u32 slots, invertible Wang hash, keys
  *    (rand & mask) % 10000, 0.94*2^26 inserts), single thread, min of
  *    N interleaved reps. Comparable to the offline-built reference
  *    binary's 16-17 M inserts/s on this host.
  *  - `membw`: aggregate streaming read bandwidth at 1/8/32 threads over
  *    thread-private 256 MiB long arrays — evidence for the 8->32
  *    scaling plateau being DRAM saturation, not a code serialization
  *    point (pure in-cache kernel work scales; streaming DRAM does not).
  */
object KernelBench {

  private def xorshift(s0: Long): Long = {
    var s = s0
    s ^= s << 13
    s ^= s >>> 7
    s ^= s << 17
    s
  }

  /** zipf^2.5 token ids over a 50k vocab, deterministic per shard — the
    * headline build's per-shard key distribution. `math.pow` is paid
    * here, at materialization, never inside a timed loop (an in-loop
    * generator halves apparent throughput — BASELINE.md lesson). */
  private def zipfTokens(tid: Int, n: Int): Array[Int] = {
    val a = new Array[Int](n)
    var seed = 0x9e3779b97f4a7c15L * (tid + 1)
    var i = 0
    while (i < n) {
      seed = xorshift(seed)
      val u = (seed >>> 11).toDouble / 9007199254740992.0
      a(i) = (math.pow(u, 2.5) * 50000).toInt
      i += 1
    }
    a
  }

  /** One shard per thread, joined; FAILS if any shard thread died (a
    * dead thread would otherwise silently inflate the rate with
    * never-run work). Returns M ops/s over threads × perShard. */
  private def runShards(threads: Int, perShard: Int)(shard: Int => Unit): Double = {
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { tid =>
      val t = new Thread(() => { shard(tid); done.incrementAndGet(); () })
      t.start(); t
    }
    ts.foreach(_.join())
    require(done.get() == threads,
      s"only ${done.get()} of $threads shards completed")
    threads.toDouble * perShard / ((System.nanoTime() - t0) / 1e9) / 1e6
  }

  def insertBench(reps: Int): Unit = {
    val hashBits = 46
    val q = 26
    val n = (0.94 * (1L << q)).toLong
    val mask = WangHash.mask(hashBits)
    var best = Double.MaxValue
    var bestIter = Double.MaxValue
    for (r <- 1 to reps) {
      val cqf = Cqf(q, hashBits, invertible = true, compact = true)
      var seed = 0x9e3779b97f4a7c15L + r
      val t0 = System.nanoTime()
      var i = 0L
      while (i < n) {
        seed = xorshift(seed)
        cqf.insert((seed & mask) % 10000L)
        i += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      var total = 0L
      val it = cqf.iterator
      while (it.hasNext) total += it.next()._2
      val iterSec = (System.nanoTime() - t1) / 1e9
      require(total == n, s"lost inserts: $total != $n")
      println(f"[kernelbench] rep $r: ${n / sec / 1e6}%.2f M inserts/s " +
        f"(${sec}%.2f s), full iteration ${iterSec * 1000}%.1f ms")
      best = math.min(best, sec)
      bestIter = math.min(bestIter, iterSec)
    }
    println(f"[kernelbench] BEST: ${n / best / 1e6}%.2f M inserts/s at q=$q " +
      f"hashBits=$hashBits compact; iteration ${bestIter * 1000}%.1f ms")
    // same workload through the CqfBuilder pre-agg layer (the production
    // build path): content asserted identical to the direct kernel
    var bestB = Double.MaxValue
    for (r <- 1 to reps) {
      val b = CqfBuilder(q, hashBits, invertible = true, compact = true)
      var seed = 0x9e3779b97f4a7c15L + r
      val t0 = System.nanoTime()
      var i = 0L
      while (i < n) {
        seed = xorshift(seed)
        b.add((seed & mask) % 10000L)
        i += 1
      }
      val c = b.result()
      val sec = (System.nanoTime() - t0) / 1e9
      require(c.totalCount == n, s"builder lost inserts: ${c.totalCount} != $n")
      println(f"[kernelbench] builder rep $r: ${n / sec / 1e6}%.2f M inserts/s (${sec}%.2f s)")
      bestB = math.min(bestB, sec)
    }
    println(f"[kernelbench] BUILDER BEST: ${n / bestB / 1e6}%.2f M inserts/s " +
      f"(pre-agg table on the identical workload)")
  }

  def membwBench(): Unit = {
    val wordsPerThread = (256L << 20) / 8 // 256 MiB per thread
    def run(threads: Int): Double = {
      val arrays = Array.fill(threads)(new Array[Long](wordsPerThread.toInt))
      arrays.foreach { a =>
        var i = 0
        while (i < a.length) { a(i) = i.toLong; i += 1 }
      }
      val sink = new java.util.concurrent.atomic.AtomicLong()
      val t0 = System.nanoTime()
      val ts = arrays.map { a =>
        val t = new Thread(() => {
          var s = 0L
          var pass = 0
          while (pass < 4) {
            var i = 0
            while (i < a.length) { s += a(i); i += 1 }
            pass += 1
          }
          sink.addAndGet(s)
        })
        t.start(); t
      }
      ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      val bytes = 4.0 * threads * wordsPerThread * 8
      bytes / sec / 1e9
    }
    run(1) // warm-up / page-fault absorption
    for (t <- Seq(1, 2, 8, 32)) {
      val gbs = (1 to 3).map(_ => run(t)).max
      println(f"[membw] $t%2d threads: $gbs%.1f GB/s aggregate streaming read")
    }
  }

  /** Copy (read+write) bandwidth — the traffic class GC/allocation and
    * row materialization produce; typically saturates well below the
    * read-only number on one socket. */
  def copybwBench(): Unit = {
    val wordsPerThread = (128L << 20) / 8 // 128 MiB src + 128 MiB dst per thread
    def run(threads: Int): Double = {
      val srcs = Array.fill(threads)(new Array[Long](wordsPerThread.toInt))
      val dsts = Array.fill(threads)(new Array[Long](wordsPerThread.toInt))
      val t0 = System.nanoTime()
      val ts = srcs.zip(dsts).map { case (src, dst) =>
        val t = new Thread(() => {
          var pass = 0
          while (pass < 4) {
            System.arraycopy(src, 0, dst, 0, src.length)
            pass += 1
          }
        })
        t.start(); t
      }
      ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      // count both the read and the write stream
      8.0 * threads * wordsPerThread * 8 / sec / 1e9
    }
    run(1)
    for (t <- Seq(1, 2, 8, 32)) {
      val gbs = (1 to 3).map(_ => run(t)).max
      println(f"[copybw] $t%2d threads: $gbs%.1f GB/s aggregate copy (r+w)")
    }
  }

  /** Pure-kernel thread scaling: T threads each build a PRIVATE q=16 CQF
    * from generated keys (the per-bucket shard shape of the distributed
    * build, minus Spark's scan/decode). If this scales 8->32 while the
    * Spark build does not, the plateau lives in the scan/row path, not
    * the kernel or the algorithm. */
  def kernelScaleBench(): Unit = {
    val nPerThread = 20000000
    def run(threads: Int): Double = runShards(threads, nPerThread) { tid =>
      val cqf = Cqf(16, 40, invertible = true, compact = true)
      var seed = 0x9e3779b97f4a7c15L * (tid + 1)
      var i = 0L
      while (i < nPerThread) {
        seed = xorshift(seed)
        cqf.insert((seed & 0xffffffffffL) % 10000L)
        i += 1
      }
      require(cqf.occupiedSlots > 0)
    }
    run(2)
    for (t <- Seq(1, 8, 32)) {
      val mps = (1 to 3).map(_ => run(t)).max
      println(f"[kernel-scale] $t%2d threads: $mps%.1f M inserts/s aggregate (private q=16 shards)")
    }
  }

  /** Shard-footprint A/B for the 8->32 thread wall (round-4 experiment):
    * 20M inserts/thread into thread-private compact CQFs whose quotient
    * grows while load stays ~50% (uniform keys over 2^(q-1) distinct),
    * so per-insert instruction work is constant (hash + rank/select +
    * 2-slot counter either way) and ONLY the resident table size varies
    * (~74 KB at q=14 -> ~18.9 MB/thread at q=22; x32 threads = 600 MB,
    * far past L3). If the wall were a serialization point in the code,
    * efficiency would not depend on footprint; if it is shared L3/DRAM,
    * the in-cache footprint scales and the DRAM-sized one collapses. */
  def footprintBench(): Unit = {
    val nPerThread = 20000000
    def run(threads: Int, q: Int): Double = runShards(threads, nPerThread) { tid =>
      val keys = 1L << (q - 1)
      val cqf = Cqf(q, 40, invertible = true, compact = true)
      var seed = 0x9e3779b97f4a7c15L * (tid + 1)
      var i = 0L
      while (i < nPerThread) {
        seed = xorshift(seed)
        cqf.insert((seed >>> 20) % keys)
        i += 1
      }
      require(cqf.occupiedSlots > 0)
    }
    run(2, 14) // JIT warm-up
    for (q <- Seq(14, 18, 22)) {
      val mbPerThread = (1L << q) * 4.5 / 1e6
      val r8 = (1 to 3).map(_ => run(8, q)).max
      val r32 = (1 to 3).map(_ => run(32, q)).max
      val eff = (r32 / r8) / 4.0
      println(f"[footprint] q=$q (${mbPerThread}%.2f MB/shard): " +
        f"8t=$r8%.1f M/s 32t=$r32%.1f M/s eff(8->32)=$eff%.3f")
    }
  }

  /** t-digest insert throughput (compress() dominates: every ~bufferSize
    * inserts triggers a buffer sort + centroid merge). Lognormal-ish
    * values via exp of a crude uniform sum keep centroid churn realistic. */
  def tdBench(reps: Int): Unit = {
    val n = 20_000_000L
    var best = Double.MaxValue
    for (r <- 1 to reps) {
      val td = graft.sketch.TDigest(200.0)
      var seed = 0xdeadbeefL + r
      val t0 = System.nanoTime()
      var i = 0L
      while (i < n) {
        seed = xorshift(seed)
        // uniform in [0,1) -> mildly skewed positive value
        val u = (seed >>> 11).toDouble / (1L << 53).toDouble
        td.add(u * u * 1000.0)
        i += 1
      }
      val q = td.quantile(0.5)
      val sec = (System.nanoTime() - t0) / 1e9
      require(q > 0 && q < 1000.0, s"bad median $q")
      println(f"[kernelbench] td rep $r: ${n / sec / 1e6}%.2f M inserts/s (${sec}%.2f s, p50=$q%.2f)")
      best = math.min(best, sec)
    }
    println(f"[kernelbench] TD BEST: ${n / best / 1e6}%.2f M inserts/s (compression=200)")
  }

  /** KLL insert throughput (kll_agg's per-row path). Added when add()
    * stopped recomputing retained items + per-level capacities (a
    * math.pow per level) on every insert — this mode is the evidence
    * tier for that fix and the regression floor for future ones. */
  def kllBench(reps: Int): Unit = {
    val n = 50_000_000L
    var best = Double.MaxValue
    for (r <- 1 to reps) {
      val kll = graft.sketch.KllSketch(200)
      var seed = 0xdeadbeefL + r
      val t0 = System.nanoTime()
      var i = 0L
      while (i < n) {
        seed = xorshift(seed)
        val u = (seed >>> 11).toDouble / (1L << 53).toDouble
        kll.add(u * u * 1000.0)
        i += 1
      }
      val q = kll.quantile(0.5)
      val sec = (System.nanoTime() - t0) / 1e9
      require(q > 0 && q < 1000.0, s"bad median $q")
      println(f"[kernelbench] kll rep $r: ${n / sec / 1e6}%.2f M inserts/s (${sec}%.2f s, p50=$q%.2f)")
      best = math.min(best, sec)
    }
    println(f"[kernelbench] KLL BEST: ${n / best / 1e6}%.2f M inserts/s (k=200)")
  }

  /** Kernel-only replica of the headline build's per-shard workload:
    * PRE-MATERIALIZED zipf^2.5 tokens over a 50k vocab (pow paid outside
    * the timed loop — a generator in the loop halves apparent
    * throughput) into grown compact shards. The 32-thread figure is the
    * build's kernel ceiling cited in BASELINE.md round 3. */
  def zipfBench(): Unit = {
    val perShard = 1700000
    val tokenSets = (0 until 32).map(zipfTokens(_, perShard)).toArray
    def run(threads: Int): Double = runShards(threads, perShard) { tid =>
      val c = Cqf(16, 40, invertible = true, compact = true)
      val toks = tokenSets(tid)
      var i = 0
      while (i < toks.length) { c.insert(toks(i).toLong); i += 1 }
      require(c.totalCount == perShard)
    }
    run(2)
    for (t <- Seq(1, 8, 32)) {
      val best = (1 to 3).map(_ => run(t)).max
      println(f"[kernel-zipf] $t%2d threads: $best%.1f M inserts/s (zipf 50k-vocab shards)")
    }
  }

  /** Candidate insert-path restructurings vs the direct per-token insert,
    * on the zipf shard workload (same tokens, same shard shape):
    *
    *  - `sort`: buffer every hash, Arrays.sort, run-length-collapse equal
    *    hashes, build via the sequential AppendCursor (streaming writes,
    *    no rank/select walk per token);
    *  - `table`: bounded open-addressing table (hash -> count) as a
    *    pre-aggregation layer, flushed into the CQF when full and at the
    *    end (one CQF insert per DISTINCT key per flush epoch, not per
    *    token).
    *
    * Both produce a Cqf with content identical to the direct path
    * (asserted). The winner informs whether the Spark aggregate grows a
    * batched update path. */
  def altBuildBench(): Unit = {
    val perShard = 1700000
    val hashBits = 40
    val tokenSets = (0 until 32).map(zipfTokens(_, perShard)).toArray

    def directBuild(toks: Array[Int]): Cqf = {
      val c = Cqf(16, hashBits, invertible = true, compact = true)
      var i = 0
      while (i < toks.length) { c.insert(toks(i).toLong); i += 1 }
      c
    }
    def sortBuild(toks: Array[Int]): Cqf = {
      val hs = new Array[Long](toks.length)
      var i = 0
      while (i < toks.length) { hs(i) = WangHash.hash(toks(i).toLong, hashBits); i += 1 }
      java.util.Arrays.sort(hs)
      // run-length collapse in place: hs(j) = hash, cs(j) = count
      val cs = new Array[Long](toks.length)
      var j = -1
      i = 0
      while (i < hs.length) {
        if (j >= 0 && hs(j) == hs(i)) cs(j) += 1L
        else { j += 1; hs(j) = hs(i); cs(j) = 1L }
        i += 1
      }
      val m = j + 1
      // def, not val: a FullException retry must restart the stream
      def it = new Iterator[(Long, Long)] {
        private var k = 0
        def hasNext: Boolean = k < m
        def next(): (Long, Long) = { val t = (hs(k), cs(k)); k += 1; t }
      }
      // bounded retry via the sketch package's own growing builder: only
      // capacity misses escalate q; a genuine bug (IllegalArgument/
      // IllegalState from the append path) escapes immediately
      Cqf.fromSortedHashesGrowing(() => it, 16, hashBits,
        invertible = true, compact = true)
    }
    def tableBuild(toks: Array[Int]): Cqf = {
      // 2^17-slot open-addressing table: 1 MiB keys + 1 MiB counts
      val bits = 17
      val cap = 1 << bits
      val mask = cap - 1
      val keys = new Array[Long](cap) // hash+1 (0 = empty)
      val cnts = new Array[Long](cap)
      val c = Cqf(16, hashBits, invertible = true, compact = true)
      var used = 0
      val flushAt = (cap * 0.7).toInt
      def flush(): Unit = {
        var s = 0
        while (s < cap) {
          if (keys(s) != 0L) { c.insertHash(keys(s) - 1L, cnts(s)); keys(s) = 0L; cnts(s) = 0L }
          s += 1
        }
        used = 0
      }
      var i = 0
      while (i < toks.length) {
        val h = WangHash.hash(toks(i).toLong, hashBits)
        val k = h + 1L
        var s = (WangHash.mix64(h, 0x9e3779b97f4a7c15L) & mask.toLong).toInt
        var done = false
        while (!done) {
          val cur = keys(s)
          if (cur == k) { cnts(s) += 1L; done = true }
          else if (cur == 0L) {
            keys(s) = k; cnts(s) = 1L; used += 1; done = true
            if (used >= flushAt) flush()
          } else s = (s + 1) & mask
        }
        i += 1
      }
      flush()
      c
    }

    // content identity vs the direct path (one shard)
    val ref = directBuild(tokenSets(0))
    require(sortBuild(tokenSets(0)).iterator.sameElements(ref.iterator), "sortBuild content mismatch")
    require(tableBuild(tokenSets(0)).iterator.sameElements(ref.iterator), "tableBuild content mismatch")

    def run(threads: Int, build: Array[Int] => Cqf): Double =
      runShards(threads, perShard) { tid =>
        require(build(tokenSets(tid)).totalCount == perShard)
      }
    for ((name, b) <- Seq(("direct", directBuild _), ("sort", sortBuild _), ("table", tableBuild _))) {
      run(2, b)
      for (t <- Seq(1, 8, 32)) {
        val best = (1 to 3).map(_ => run(t, b)).max
        println(f"[altbuild-$name] $t%2d threads: $best%.1f M inserts/s")
      }
    }
  }

  /** Adversarial low-duplication check: the pre-agg table must not
    * regress when nearly every key is distinct (the table then buffers
    * without deduplicating and pays probe+rehash+drain ON TOP of the
    * kernel inserts). Direct kernel vs production CqfBuilder on ~unique
    * 31-bit keys. */
  def distinctBench(): Unit = {
    val perShard = 1700000
    val hashBits = 40
    def mkKeys(tid: Int): Array[Long] = {
      val a = new Array[Long](perShard)
      var seed = 0x9e3779b97f4a7c15L * (tid + 17)
      var i = 0
      while (i < perShard) {
        seed = xorshift(seed)
        a(i) = seed & 0x7fffffffL // ~2^31 space: almost all distinct
        i += 1
      }
      a
    }
    val keySets = (0 until 32).map(mkKeys).toArray
    def direct(ks: Array[Long]): Long = {
      val c = Cqf(16, hashBits, invertible = true, compact = true)
      var i = 0
      while (i < ks.length) { c.insert(ks(i)); i += 1 }
      c.totalCount
    }
    def table(ks: Array[Long]): Long = {
      val b = CqfBuilder(16, hashBits, invertible = true, compact = true)
      var i = 0
      while (i < ks.length) { b.add(ks(i)); i += 1 }
      b.result().totalCount
    }
    require(direct(keySets(0)) == perShard && table(keySets(0)) == perShard)
    def run(threads: Int, f: Array[Long] => Long): Double =
      runShards(threads, perShard) { tid => require(f(keySets(tid)) == perShard) }
    for ((name, f) <- Seq(("direct", direct _), ("table", table _))) {
      run(2, f)
      for (t <- Seq(1, 8, 32)) {
        val best = (1 to 3).map(_ => run(t, f)).max
        println(f"[distinct-$name] $t%2d threads: $best%.1f M inserts/s (~all-distinct keys)")
      }
    }
  }

  /** Byte-key (string) build: direct per-occurrence `insertBytes` vs
    * the pre-agg builder's `addBytes` on a duplicate-heavy word stream
    * (zipf over a 50k vocabulary, ~13-byte UTF-8 words, content asserted
    * identical). Both paths pay WangHash.mixBytes per OCCURRENCE — the
    * open question this mode answers is whether the builder's gain
    * survives when hashing (not the CQF insert) is the per-occurrence
    * cost floor; a hypothetical bytes-keyed table that skips re-hashing
    * repeats would have to store and compare the byte keys per slot,
    * which costs more than the ~1 ns/byte mix it saves. */
  def strBuildBench(): Unit = {
    val perShard = 1000000
    def mkWords(tid: Int): Array[Array[Byte]] =
      zipfTokens(tid, perShard).map(id => s"tokenword_$id".getBytes("UTF-8"))
    val wordSets = (0 until 32).map(mkWords).toArray
    def direct(ws: Array[Array[Byte]]): Cqf = {
      val c = Cqf(16, 40, invertible = false, compact = true)
      var i = 0
      while (i < ws.length) { c.insertBytes(ws(i)); i += 1 }
      c
    }
    def table(ws: Array[Array[Byte]]): Cqf = {
      val b = graft.sketch.CqfBuilder(16, 40, invertible = false, compact = true)
      var i = 0
      while (i < ws.length) { b.addBytes(ws(i)); i += 1 }
      b.result()
    }
    require(java.util.Arrays.equals(
      direct(wordSets(0)).serialize(), table(wordSets(0)).serialize()))
    def run(threads: Int, f: Array[Array[Byte]] => Cqf): Double =
      runShards(threads, perShard) { tid => f(wordSets(tid)); () }
    for ((name, f) <- Seq(("direct", direct _), ("table", table _))) {
      run(2, f)
      for (t <- Seq(1, 8, 32)) {
        val best = (1 to 3).map(_ => run(t, f)).max
        println(f"[strbuild-$name] $t%2d threads: $best%.1f M inserts/s (byte keys, zipf 50k vocab)")
      }
    }
  }

  /** CMS direct vs CmsBuilder on the zipf shard workload (content
    * asserted identical). The builder defers both seed mixes to the
    * per-distinct fold, so repeats pay one table probe instead of two
    * mix64s + depth row updates. */
  /** FrequentItems (ss_agg kernel) insert throughput on the headline
    * zipf shard workload, several k — the amortized-O(1) claim measured:
    * duplicate-heavy streams mostly hit the counter-increment fast path;
    * purges are rare (each drops ~half the counters). */
  def ssBuildBench(): Unit = {
    val perShard = 1700000
    val tokenSets = (0 until 32)
      .map(tid => zipfTokens(tid, perShard).map(_.toLong)).toArray
    def build(k: Int)(ks: Array[Long]): graft.sketch.FrequentItems = {
      val f = graft.sketch.FrequentItems(k)
      var i = 0
      while (i < ks.length) { f.add(ks(i)); i += 1 }
      f
    }
    for (k <- Seq(256, 4096)) {
      val f = build(k) _
      def run(threads: Int): Double =
        runShards(threads, perShard) { tid => f(tokenSets(tid)); () }
      run(2)
      for (t <- Seq(1, 8, 32)) {
        val best = (1 to 3).map(_ => run(t)).max
        println(f"[ssbuild-k$k] $t%2d threads: $best%.1f M inserts/s")
      }
    }
  }

  /** KMV (bottom-k) insert throughput — the family's hot path is a
    * single compare against the k-th min once full, so duplicate-heavy
    * zipf streams measure the reject floor while uniform random longs
    * measure the accept-decay path (k·ln(n/k) accepted inserts paying
    * the O(k) memmove). */
  def kmvBuildBench(): Unit = {
    val perShard = 1700000
    val zipfSets = (0 until 32)
      .map(tid => zipfTokens(tid, perShard).map(_.toLong)).toArray
    val rndSets = (0 until 32).map { tid =>
      val r = new java.util.Random(4242 + tid)
      Array.fill(perShard)(r.nextLong())
    }.toArray
    def build(k: Int)(ks: Array[Long]): graft.sketch.KmvSketch = {
      val s = graft.sketch.KmvSketch(k)
      var i = 0
      while (i < ks.length) { s.add(ks(i)); i += 1 }
      s
    }
    for ((name, sets) <- Seq(("zipf", zipfSets), ("rnd", rndSets));
         k <- Seq(1024, 16384)) {
      val f = build(k) _
      def run(threads: Int): Double =
        runShards(threads, perShard) { tid => f(sets(tid)); () }
      run(2)
      for (t <- Seq(1, 8, 32)) {
        val best = (1 to 3).map(_ => run(t)).max
        println(f"[kmvbuild-$name-k$k] $t%2d threads: $best%.1f M inserts/s")
      }
    }
  }

  def cmsBuildBench(): Unit = {
    val perShard = 1700000
    val tokenSets = (0 until 32)
      .map(tid => zipfTokens(tid, perShard).map(_.toLong)).toArray
    def direct(ks: Array[Long]): graft.sketch.CountMinSketch = {
      val c = graft.sketch.CountMinSketch(5, 2048)
      var i = 0
      while (i < ks.length) { c.add(ks(i)); i += 1 }
      c
    }
    def table(ks: Array[Long]): graft.sketch.CountMinSketch = {
      val b = new graft.sketch.CmsBuilder(graft.sketch.CountMinSketch(5, 2048))
      var i = 0
      while (i < ks.length) { b.add(ks(i)); i += 1 }
      b.result()
    }
    require(java.util.Arrays.equals(
      direct(tokenSets(0)).serialize(), table(tokenSets(0)).serialize()))
    def run(threads: Int, f: Array[Long] => graft.sketch.CountMinSketch): Double =
      runShards(threads, perShard) { tid => f(tokenSets(tid)); () }
    for ((name, f) <- Seq(("direct", direct _), ("table", table _))) {
      run(2, f)
      for (t <- Seq(1, 8, 32)) {
        val best = (1 to 3).map(_ => run(t, f)).max
        println(f"[cmsbuild-$name] $t%2d threads: $best%.1f M inserts/s")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "all"
    if (mode == "td") tdBench(reps = 3)
    if (mode == "kll") kllBench(reps = 3)
    if (mode == "zipf") zipfBench()
    if (mode == "altbuild") altBuildBench()
    if (mode == "distinct") distinctBench()
    if (mode == "cmsbuild") cmsBuildBench()
    if (mode == "ssbuild") ssBuildBench()
    if (mode == "kmvbuild") kmvBuildBench()
    if (mode == "strbuild") strBuildBench()
    if (mode == "insert" || mode == "all") insertBench(reps = 3)
    if (mode == "membw" || mode == "all") membwBench()
    if (mode == "copybw" || mode == "all") copybwBench()
    if (mode == "kscale" || mode == "all") kernelScaleBench()
    if (mode == "footprint") footprintBench()
  }
}
