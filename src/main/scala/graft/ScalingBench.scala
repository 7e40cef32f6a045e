package graft

import graft.jobs.TokenGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Two-parallelism-level scaling evidence (BASELINE.md protocol): the
  * identical CQF build job on the identical deterministic input at
  * local[N] and local[4N]; reports tokens/sec at both and the scaling
  * efficiency (T_4N / T_N) / 4, target >= 0.8.
  *
  * No real cluster exists in this sandbox; local parallelism levels stand
  * in for executor counts (each local thread = one executor core; the job
  * shape — salted partials, shuffle, kernel merge — is the one that runs
  * under spark-submit on a real cluster).
  */
object ScalingBench {

  private def materialize(nDocs: Long): String = {
    val dir = s"/tmp/graft_bench_tokens_$nDocs"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      TokenGen.generate(spark, nDocs, vocab = 50000, numPartitions = 64)
        .write.mode("overwrite").parquet(dir)
      spark.stop()
    }
    dir
  }

  private def runOnce(par: Int, dir: String, warmup: Boolean): (Double, Long) = {
    val spark = SparkSession.builder()
      .master(s"local[$par]")
      .config("spark.sql.shuffle.partitions", par.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.registerAll(spark)
    // size read splits so scan parallelism matches the core count —
    // small-file bin-packing (128MB maxPartitionBytes + 4MB openCost)
    // would otherwise cap the whole build at ~4 tasks
    val inputBytes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    spark.conf.set("spark.sql.files.maxPartitionBytes",
      math.max(inputBytes / (par * 3), 2L * 1024 * 1024).toString)
    spark.conf.set("spark.sql.files.openCostInBytes", "262144")
    val tokens = spark.read.parquet(dir)
    val nTokens = tokens.agg(sum(col("n_tok"))).head().getLong(0)
    if (warmup) {
      tokens.sample(0.05)
        .withColumn("salt", when(col("source") === "web",
          pmod(xxhash64(col("doc_id")), lit(32)))
          .otherwise(pmod(xxhash64(col("doc_id")), lit(4))).cast("int"))
        .repartition(60, col("source"), col("salt"))
        .groupBy(col("source"), col("salt"))
        .agg(api.cqf_agg(col("tokens"), 8, 64).as("partial"))
        .groupBy(col("source"))
        .agg(api.cqf_merge_agg(col("partial")).as("sk"))
        .select(col("source"), api.cqf_total(col("sk")).as("total")).collect()
    }
    def build(): Long = tokens
      .withColumn("salt", when(col("source") === "web",
          pmod(xxhash64(col("doc_id")), lit(32)))
          .otherwise(pmod(xxhash64(col("doc_id")), lit(4))).cast("int"))
      .repartition(60, col("source"), col("salt"))
      .groupBy(col("source"), col("salt"))
      .agg(api.cqf_agg(col("tokens"), 8, 64).as("partial"))
      .groupBy(col("source"))
      .agg(api.cqf_merge_agg(col("partial")).as("sk"))
      .select(col("source"), api.cqf_total(col("sk")).as("total"))
      .collect().map(_.getLong(1)).sum
    val t0 = System.nanoTime()
    val builtTokens = build()
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
    // the sandbox host is shared: interleave repetitions and take the MIN
    // per level so ambient contention doesn't masquerade as (anti-)scaling
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt
    var tok = 0L
    val (losecs, hisecs) = (Array.fill(reps)(0.0), Array.fill(reps)(0.0))
    for (r <- 0 until reps) {
      val (sl, t1) = runOnce(lo, dir, warmup = r == 0)
      val (sh, t2) = runOnce(hi, dir, warmup = r == 0)
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
