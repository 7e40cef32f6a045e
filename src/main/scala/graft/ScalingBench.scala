package graft

import graft.jobs.TokenGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Two-parallelism-level scaling evidence (BASELINE.md protocol): the
  * identical CQF build job on the identical deterministic input at
  * local[N] and local[4N]; reports tokens/sec at both and the scaling
  * efficiency (T_4N / T_N) / 4, target >= 0.8.
  *
  * Job shape: the token table is stored bucket-CLUSTERED by (source,
  * salt) (Iceberg/bucketed parquet co-located with the aggregation key)
  * and read with size-balanced splits + partial sketch aggregation
  * ([[buildJob]]): each split emits ~1 sketch partial, raw tokens never
  * shuffle, and no hash-collided bucket task can carry multiple shards.
  * Skew is pre-handled by proportional salting (web holds ~half the
  * rows and gets 64 shards; cold sources 8).
  *
  * No real cluster exists in this sandbox; local parallelism levels stand
  * in for executor counts (each local thread = one executor core; the job
  * shape is the one that runs under spark-submit on a real cluster).
  * Repetitions are interleaved and the per-level MIN taken, because the
  * sandbox host is shared and ambient contention would otherwise
  * masquerade as (anti-)scaling.
  */
object ScalingBench {

  // 120 shard keys into 512 buckets: bucket ids come from hash(source,
  // salt) % Buckets, so with Buckets ≈ #keys several keys collide into
  // one bucket and that task carries 2-3 shards' tokens — the stage wall
  // clock is the hottest task. Over-provisioning buckets keeps almost
  // every shard alone in its bucket (~1.9 M tokens max instead of ~5 M)
  final val Buckets = 512
  // `packed` is the DEFAULT build input (table columns: doc_id STRING,
  // tokens ARRAY<INT>, n_tok INT, source STRING, packed BINARY,
  // salt INT): the same token ids as `tokens` but packed little-endian
  // into one BINARY cell per doc (pack_ints), so the scan rides
  // parquet's vectorized primitive path instead of the nested-array
  // assembly path (measured 4-6x scan throughput; the array<int> column
  // stays for operators that genuinely need elements)
  def saltCol = when(col("source") === "web",
    pmod(xxhash64(col("doc_id")), lit(64)))
    .otherwise(pmod(xxhash64(col("doc_id")), lit(8))).cast("int")

  def tableName(nDocs: Long) = s"graft_tokens_v2_$nDocs"

  /** Idempotent bench-dataset materialization: runs `write` only when
    * the dir's _SUCCESS marker is absent. Reuses the caller's active
    * session when one exists (getOrCreate would return it anyway —
    * stopping it afterwards would kill the caller); only owns-and-stops
    * a session it created itself. Shared by ScalingBench/PipelineBench. */
  def materializeDir(dir: String)(write: SparkSession => Unit): String = {
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      val active = SparkSession.getActiveSession
      val spark = active.getOrElse {
        SparkSession.builder().master("local[32]")
          .config("spark.ui.enabled", "false")
          .config("spark.local.dir",
            sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-graft"))
          .getOrCreate()
      }
      spark.sparkContext.setLogLevel("ERROR")
      write(spark)
      // some writers (bucketed external saveAsTable) leave no _SUCCESS;
      // write our own completion marker
      new java.io.File(s"$dir/_SUCCESS").createNewFile()
      if (active.isEmpty) spark.stop()
    }
    dir
  }

  def materialize(nDocs: Long): String =
    materializeDir(s"/tmp/graft_bucketed_tokens_v2_$nDocs") { spark =>
      TokenGen.generate(spark, nDocs, vocab = 50000, numPartitions = 64)
        .withColumn("salt", saltCol)
        // co-shuffle rows onto their bucket BEFORE the bucketed write:
        // otherwise every writer task emits a sliver of every bucket
        // (64 x 60 ≈ 2300 tiny files) and the scan pays thousands of
        // parquet footer reads; this way each bucket is ONE file
        .repartition(Buckets, col("source"), col("salt"))
        .write.mode("overwrite")
        .bucketBy(Buckets, "source", "salt")
        .option("path", s"/tmp/graft_bucketed_tokens_v2_$nDocs")
        .saveAsTable(tableName(nDocs))
    }

  /** The headline build plan (BASELINE.json metric: CQF insert+merge
    * tokens/sec). Reads the bucket-CLUSTERED files as plain parquet with
    * size-balanced splits (see [[withSplitScan]]) and lets Catalyst's
    * partial aggregation build one sketch partial per split — because
    * each file holds exactly one (source, salt) shard, a split emits ~1
    * partial, so raw tokens never shuffle (only ~0.6 MB sketch partials
    * do) and no task can be 2-3x the others the way hash-collided bucket
    * tasks were. Compact u32 slots at hashBits=40 stay exact for 32-bit
    * token ids (the reference bench's own U32 right-sizing). */
  def buildJob(src: org.apache.spark.sql.DataFrame): Long = src
    .groupBy(col("source"), col("salt"))
    .agg(api.cqf_agg_packed(col("packed"), 16, 40, compact = true).as("partial"))
    .groupBy(col("source"))
    .agg(api.cqf_merge_agg(col("partial")).as("sk"))
    .select(col("source"), api.cqf_total(col("sk")).as("total"))
    .collect().map(_.getLong(1)).sum

  /** Session builder shared by the bench mains (Bench, DecompBench):
    * one config block so their scan/build denominators stay comparable
    * instead of drifting copy by copy. */
  def benchSession(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-graft"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.registerAll(spark)
    spark
  }

  /** The scan-only denominator pass shared by Bench and DecompBench: the
    * cheapest full pass over the same bytes the build reads (codegen'd
    * sum over the vectorized binary column), integrity-checked. */
  def scanOnlyPass(stored: org.apache.spark.sql.DataFrame, nTokens: Long): Unit =
    require(stored.agg(sum(octet_length(col("packed")))).head().getLong(0)
      == nTokens * 4L, "packed column lost tokens")

  /** Run `f` with scan splits sized so the build stage is balanced across
    * cores regardless of per-file skew; restores the session default
    * after (queries should keep the stock 128 MB splits). */
  def withSplitScan[T](spark: SparkSession)(f: => T): T = {
    val key = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(key)
    spark.conf.set(key,
      sys.env.getOrElse("SPARK_GRAFT_SPLIT_MB", "16") + "m")
    try f finally spark.conf.set(key, old)
  }

  /** Master string + total core slots for parallelism level `n` under
    * the given protocol mode (shared with PipelineBench): "threads" →
    * `local[n]`; "executors" → `local-cluster[n,cores,memMB]`, Spark's
    * multi-process pseudo-cluster (n real executor JVMs). */
  def masterFor(n: Int, mode: String): (String, Int) = mode match {
    case "executors" =>
      // default 2 cores/executor: the memMB field below is only the
      // WORKER's capacity — the executor JVM heap is spark.executor.
      // memory (set in runOnce from the same env var; default 1g
      // otherwise), and 8 concurrent tasks in a too-small executor OOM
      // the 4B-token build (exit 52). 1x2 vs 4x2 is also the recorded
      // r4-r6 protocol pair.
      val cores = sys.env.getOrElse("SPARK_GRAFT_EXEC_CORES", "2").toInt
      val memMb = sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM_MB", "8192").toInt
      (s"local-cluster[$n,$cores,$memMb]", n * cores)
    case "threads" => (s"local[$n]", n)
    // a typo'd mode must not silently measure threads while the output
    // JSON labels the run with the raw mode string (mislabeled evidence)
    case other => throw new IllegalArgumentException(
      s"SPARK_GRAFT_SCALE_MODE must be 'threads' or 'executors', got '$other'")
  }

  /** local-cluster executors register ASYNCHRONOUSLY (standalone
    * semantics: minRegisteredResourcesRatio defaults to 0, so a job can
    * start on whichever subset is up) — block until the full cluster is
    * present before any work is scheduled. No-op for local masters. */
  def awaitExecutors(spark: SparkSession, master: String): Unit =
    if (master.startsWith("local-cluster")) {
      val want = master.stripPrefix("local-cluster[").takeWhile(_ != ',').toInt
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (spark.sparkContext.getExecutorMemoryStatus.size - 1 < want &&
          System.nanoTime() < deadline) Thread.sleep(100)
      require(spark.sparkContext.getExecutorMemoryStatus.size - 1 >= want,
        s"only ${spark.sparkContext.getExecutorMemoryStatus.size - 1} of $want executors registered")
    }

  /** One timed build at a given master. `master` is either a thread-par
    * `local[N]` (the default protocol) or a `local-cluster[N,cores,memMB]`
    * — Spark's multi-process pseudo-cluster: N REAL executor JVMs
    * launched by spark-submit, each with its own heap/GC/code cache,
    * partials crossing process boundaries through netty shuffle exactly
    * as on a standalone cluster. `slots` = total executor cores, used to
    * size shuffle partitions. */
  private def runOnce(master: String, slots: Int, dir: String,
      warmup: Boolean): (Double, Long) = {
    val spark = SparkSession.builder()
      .master(master)
      // executor JVM heap — NOT taken from the local-cluster master
      // string (that field is worker capacity); without this the
      // executors silently run the 1g default regardless of launcher
      .config("spark.executor.memory",
        sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM_MB", "8192") + "m")
      .config("spark.sql.shuffle.partitions", slots.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-graft"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.registerAll(spark)
    awaitExecutors(spark, master)
    val tokens = spark.read.parquet(dir)
    val nTokens = tokens.agg(sum(col("n_tok"))).head().getLong(0)
    val result = withSplitScan(spark) {
      // threads mode: a 5% sample JITs the persistent JVM once; executors
      // mode spawns fresh executor JVMs per cluster, so the timed run
      // must follow a FULL untimed pass (C2-compiles the kernel + stage
      // codegen in every executor)
      if (warmup) {
        if (master.startsWith("local-cluster")) buildJob(tokens)
        else buildJob(tokens.sample(0.05))
      }
      val t0 = System.nanoTime()
      val builtTokens = buildJob(tokens)
      val sec = (System.nanoTime() - t0) / 1e9
      require(builtTokens == nTokens)
      (sec, nTokens)
    }
    // AFTER withSplitScan: its finally-restore of the split setting must
    // run against a live session (stopping inside the block silently
    // voided the helper's restore contract)
    spark.stop()
    result
  }

  def main(args: Array[String]): Unit = {
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", (lo * 4).toString).toInt
    // "threads": lo/hi = local[N] thread counts (the default protocol).
    // "executors": lo/hi = EXECUTOR-JVM counts under local-cluster — the
    // north rule's "N and 4N executors" run literally as separate
    // executor processes (launch via tools/scaling_submit.sh so the
    // worker JVMs inherit the packaged application jar).
    val mode = sys.env.getOrElse("SPARK_GRAFT_SCALE_MODE", "threads")
    val (masterLo, slotsLo) = masterFor(lo, mode)
    val (masterHi, slotsHi) = masterFor(hi, mode)
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "3000000").toLong
    val dir = materialize(nDocs)
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt
    require(reps > 0, s"SPARK_GRAFT_SCALE_REPS must be >= 1, got $reps")
    var tok = 0L
    val (losecs, hisecs) = (Array.fill(reps)(0.0), Array.fill(reps)(0.0))
    // threads mode reuses one JVM across reps (JIT persists — warm up
    // once); executors mode spawns FRESH executor JVMs per runOnce, so
    // every rep must warm its own cluster before the timed build
    val warmEvery = mode == "executors"
    for (r <- 0 until reps) {
      val (sl, t1) = runOnce(masterLo, slotsLo, dir, warmup = warmEvery || r == 0)
      val (sh, t2) = runOnce(masterHi, slotsHi, dir, warmup = warmEvery || r == 0)
      require(t1 == t2); tok = t1
      losecs(r) = sl; hisecs(r) = sh
      System.err.println(f"rep $r: lo=${sl}%.2f s hi=${sh}%.2f s")
    }
    val secLo = losecs.min
    val secHi = hisecs.min
    val thLo = tok / secLo / 1e6
    val thHi = tok / secHi / 1e6
    val eff = (thHi / thLo) / (hi.toDouble / lo.toDouble)
    println(s"""{"metric":"scaling_efficiency","value":${Bench.jsonNum(eff)},"unit":"ratio","mode":"$mode","lo_par":$lo,"hi_par":$hi,"lo_master":"$masterLo","hi_master":"$masterHi","tokens":$tok,"lo_sec":${Bench.jsonNum(secLo)},"hi_sec":${Bench.jsonNum(secHi)},"lo_mtokens_per_sec":${Bench.jsonNum(thLo)},"hi_mtokens_per_sec":${Bench.jsonNum(thHi)}}""")
  }
}
