package graft

import graft.jobs.TokenGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Two-parallelism-level scaling evidence (BASELINE.md protocol): the
  * identical CQF build job on the identical deterministic input at
  * local[N] and local[4N]; reports tokens/sec at both and the scaling
  * efficiency (T_4N / T_N) / 4, target >= 0.8.
  *
  * Job shape: the token table is stored BUCKETED BY (source, salt) —
  * the production layout (Iceberg/bucketed parquet co-located with the
  * aggregation key) — so the build is a shuffle-free scan -> aggregate:
  * one task per bucket builds that shard's sketch, then 60 tiny sketch
  * rows merge per source. Skew is pre-handled by proportional salting
  * (the hot source gets 32 shards, cold sources 4).
  *
  * No real cluster exists in this sandbox; local parallelism levels stand
  * in for executor counts (each local thread = one executor core; the job
  * shape is the one that runs under spark-submit on a real cluster).
  * Repetitions are interleaved and the per-level MIN taken, because the
  * sandbox host is shared and ambient contention would otherwise
  * masquerade as (anti-)scaling.
  */
object ScalingBench {

  final val Buckets = 60
  final val TableDdlCols =
    "doc_id STRING, tokens ARRAY<INT>, n_tok INT, source STRING, salt INT"

  def saltCol = when(col("source") === "web",
    pmod(xxhash64(col("doc_id")), lit(32)))
    .otherwise(pmod(xxhash64(col("doc_id")), lit(4))).cast("int")

  def tableName(nDocs: Long) = s"graft_tokens_$nDocs"

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
    materializeDir(s"/tmp/graft_bucketed_tokens_$nDocs") { spark =>
      TokenGen.generate(spark, nDocs, vocab = 50000, numPartitions = 64)
        .withColumn("salt", saltCol)
        .write.mode("overwrite")
        .bucketBy(Buckets, "source", "salt")
        .option("path", s"/tmp/graft_bucketed_tokens_$nDocs")
        .saveAsTable(tableName(nDocs))
    }

  /** Re-register the external bucketed table in this session's (in-memory)
    * catalog; data files are untouched. */
  def registerTable(spark: SparkSession, nDocs: Long, dir: String): Unit =
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS ${tableName(nDocs)} ($TableDdlCols)
         |USING parquet
         |CLUSTERED BY (source, salt) INTO $Buckets BUCKETS
         |LOCATION '$dir'""".stripMargin)

  private def runOnce(par: Int, nDocs: Long, dir: String,
      warmup: Boolean): (Double, Long) = {
    val spark = SparkSession.builder()
      .master(s"local[$par]")
      .config("spark.sql.shuffle.partitions", par.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-graft"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.registerAll(spark)
    registerTable(spark, nDocs, dir)
    val tokens = spark.table(tableName(nDocs))
    val nTokens = tokens.agg(sum(col("n_tok"))).head().getLong(0)
    def build(src: org.apache.spark.sql.DataFrame): Long = src
      .groupBy(col("source"), col("salt"))
      // compact u32 slots at hashBits=40: exact for 32-bit token ids,
      // half the cache footprint (the reference bench's own U32 shape)
      .agg(api.cqf_agg(col("tokens"), 8, 40, compact = true).as("partial"))
      .groupBy(col("source"))
      .agg(api.cqf_merge_agg(col("partial")).as("sk"))
      .select(col("source"), api.cqf_total(col("sk")).as("total"))
      .collect().map(_.getLong(1)).sum
    if (warmup) build(tokens.sample(0.05))
    val t0 = System.nanoTime()
    val builtTokens = build(tokens)
    val sec = (System.nanoTime() - t0) / 1e9
    require(builtTokens == nTokens)
    spark.stop()
    (sec, nTokens)
  }

  def main(args: Array[String]): Unit = {
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", (lo * 4).toString).toInt
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "750000").toLong
    val dir = materialize(nDocs)
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt
    var tok = 0L
    val (losecs, hisecs) = (Array.fill(reps)(0.0), Array.fill(reps)(0.0))
    for (r <- 0 until reps) {
      val (sl, t1) = runOnce(lo, nDocs, dir, warmup = r == 0)
      val (sh, t2) = runOnce(hi, nDocs, dir, warmup = r == 0)
      require(t1 == t2); tok = t1
      losecs(r) = sl; hisecs(r) = sh
      System.err.println(f"rep $r: lo=${sl}%.2f s hi=${sh}%.2f s")
    }
    val secLo = losecs.min
    val secHi = hisecs.min
    val thLo = tok / secLo / 1e6
    val thHi = tok / secHi / 1e6
    val eff = (thHi / thLo) / (hi.toDouble / lo.toDouble)
    println(s"""{"metric":"scaling_efficiency","value":${Bench.jsonNum(eff)},"unit":"ratio","lo_par":$lo,"hi_par":$hi,"tokens":$tok,"lo_sec":${Bench.jsonNum(secLo)},"hi_sec":${Bench.jsonNum(secHi)},"lo_mtokens_per_sec":${Bench.jsonNum(thLo)},"hi_mtokens_per_sec":${Bench.jsonNum(thHi)}}""")
  }
}
