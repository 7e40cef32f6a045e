package graft

import graft.ops.{DedupOps, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline benchmark: the full near-dup dedup chain
  * (fused shingle-MinHash signatures -> banded LSH candidates -> exact
  * shingle-Jaccard recheck -> connected components -> representative
  * selection) plus the single-pass text-quality stage, timed at two
  * parallelism levels on a deterministic synthetic corpus with planted
  * exact and near duplicates — the scaling-evidence protocol of
  * BASELINE.md applied to the pipeline operators instead of the sketch
  * build. Prints ONE JSON line.
  *
  * Corpus: every value is a pure function of (row id, seed): ~3% of
  * docs are byte-exact copies of their predecessor, a further ~3% are
  * near-copies (one appended token), the rest are zipf-ish token
  * sequences rendered as words.
  */
object PipelineBench {

  def corpus(spark: SparkSession, nDocs: Long): DataFrame = {
    // exact dup: id % 31 == 1 copies id-1; near dup: id % 37 == 1 copies
    // id-1 and appends one marker word. Chains are excluded (a dup whose
    // PREDECESSOR is itself a dup would re-derive from the raw id-1 and
    // copy nothing), so the planted rates are exact
    val predIsDup = (col("id") - 1) % 31 === 1 || (col("id") - 1) % 37 === 1
    val isExact = col("id") % 31 === 1 && !predIsDup
    val isNear = col("id") % 37 === 1 && !(col("id") % 31 === 1) && !predIsDup
    val effId = when(isExact || isNear, col("id") - 1).otherwise(col("id"))
    val nTok = (lit(40) + pmod(xxhash64(effId, lit(43L)), lit(192))).cast("int")
    val words = transform(sequence(lit(1), nTok), i => {
      val ui = shiftrightunsigned(xxhash64(effId, i, lit(44L)), 11)
        .cast("double") / lit(9007199254740992.0)
      concat(lit("w"), (pow(ui, lit(2.0)) * lit(30000)).cast("int").cast("string"))
    })
    val text = when(isNear, concat_ws(" ", concat(words, array(lit("neardupmark")))))
      .otherwise(concat_ws(" ", words))
    spark.range(nDocs).select(col("id").as("doc_id"), text.as("text"))
  }

  def materialize(nDocs: Long): String = {
    // v2: chain-free planted duplicates (dir name versions the corpus)
    val dir = s"/tmp/graft_pipeline_docs_v2_$nDocs"
    ScalingBench.materializeDir(dir) { spark =>
      corpus(spark, nDocs).repartition(64)
        .write.mode("overwrite").parquet(dir)
    }
  }

  /** One timed pipeline pass. `master` is `local[N]` (default protocol)
    * or `local-cluster[N,cores,memMB]` under SPARK_GRAFT_SCALE_MODE=
    * executors (real executor JVMs via tools/scaling_submit.sh — note
    * each call then pays cold-JIT in fresh executors; the chain is long
    * enough that codegen'd stages dominate, but expect a few % drag
    * relative to the persistent-JVM threads numbers). */
  private def runOnce(master: String, slots: Int, dir: String): (Double, Double, Long, Long) = {
    val spark = SparkSession.builder()
      .master(master)
      // see ScalingBench.runOnce: executor heap is NOT the local-cluster
      // master string's memory field
      .config("spark.executor.memory",
        sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM_MB", "8192") + "m")
      .config("spark.sql.shuffle.partitions", slots.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-graft"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.registerAll(spark)
    ScalingBench.awaitExecutors(spark, master)
    val docs = spark.read.parquet(dir)

    // near-dup chain: exact dedup first (collapses byte-identical docs),
    // then LSH + exact recheck + components over the survivors
    val t0 = System.nanoTime()
    val kept = DedupOps.exactDedup(docs, col("text"), col("doc_id"))
      .select(col("kept_id").as("doc_id"))
      .join(docs, Seq("doc_id"))
    val pairs = DedupOps.minhashVerifiedPairs(kept, TextOps.tokens(col("text")),
      col("doc_id"), k = 3, bands = 16, rowsPerBand = 4, threshold = 0.8)
      .select(col("id_a"), col("id_b"))
    val survivors = DedupOps.dedupByPairs(
        kept.select(col("doc_id").as("id")), pairs)
      .where(col("kept")).count()
    val dedupSec = (System.nanoTime() - t0) / 1e9

    // text-quality pass: metrics + language id + fingerprint, one scan
    val t1 = System.nanoTime()
    val m = TextOps.qualityMetrics(col("text"))
    val qrows = docs.select(
        (Seq(TextOps.langId(col("text")).as("lang"),
          TextOps.fingerprint(col("text")).as("fp")) ++
          m.map { case (nm, c) => c.as(nm) }): _*)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"), sum(col("n_words")).as("w"))
      .collect().map(_.getLong(1)).sum
    val textSec = (System.nanoTime() - t1) / 1e9
    spark.stop()
    (dedupSec, textSec, survivors, qrows)
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_PIPE_DOCS", "200000").toLong
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "32").toInt
    val mode = sys.env.getOrElse("SPARK_GRAFT_SCALE_MODE", "threads")
    val (masterLo, slotsLo) = ScalingBench.masterFor(lo, mode)
    val (masterHi, slotsHi) = ScalingBench.masterFor(hi, mode)
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "2").toInt
    val dir = materialize(nDocs)
    var survivors = 0L
    var qrows = 0L
    val (dLo, dHi) = (Array.fill(reps)(0.0), Array.fill(reps)(0.0))
    val (tLo, tHi) = (Array.fill(reps)(0.0), Array.fill(reps)(0.0))
    for (r <- 0 until reps) {
      val (d1, t1, s1, q1) = runOnce(masterLo, slotsLo, dir)
      val (d2, t2, s2, _) = runOnce(masterHi, slotsHi, dir)
      require(s1 == s2, s"parallelism changed the dedup answer: $s1 vs $s2")
      survivors = s1; qrows = q1
      dLo(r) = d1; dHi(r) = d2; tLo(r) = t1; tHi(r) = t2
      System.err.println(f"rep $r: dedup lo=$d1%.2f s hi=$d2%.2f s; text lo=$t1%.2f s hi=$t2%.2f s")
    }
    val eff = (dLo.min / dHi.min) / (hi.toDouble / lo.toDouble)
    println(s"""{"metric":"pipeline_dedup","unit":"sec","docs":$nDocs,"survivors":$survivors,"checked_rows":$qrows,"lo_par":$lo,"hi_par":$hi,"dedup_lo_sec":${Bench.jsonNum(dLo.min)},"dedup_hi_sec":${Bench.jsonNum(dHi.min)},"dedup_kdocs_per_sec_hi":${Bench.jsonNum(nDocs / dHi.min / 1e3)},"text_lo_sec":${Bench.jsonNum(tLo.min)},"text_hi_sec":${Bench.jsonNum(tHi.min)},"text_kdocs_per_sec_hi":${Bench.jsonNum(nDocs / tHi.min / 1e3)},"dedup_scaling_efficiency":${Bench.jsonNum(eff)}}""")
  }
}
