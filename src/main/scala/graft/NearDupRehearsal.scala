package graft

import graft.ops.{DedupOps, TextOps}
import org.apache.spark.sql.functions._

/** sf1-class scale rehearsal for the near-dup pipeline (round-5 VERDICT
  * #8): the gate's all-pairs DuckDB oracles are quadratic and cannot
  * follow the corpus past sf0.1, so this main rehearses the
  * NON-oracle-able scale properties on the deterministic PipelineBench
  * corpus (planted exact + near duplicates, pure function of row id) at
  * 2M docs — 40x the sf0.1 gate corpus, i.e. sf40-class for the
  * documents table — and reports the observables a reviewer needs to
  * judge 100 TB readiness:
  *
  *  - LSH margins: max / p99.9 bucket size vs bucketCap (how much
  *    headroom before the cap starts dropping candidates), buckets over
  *    cap (must be 0 for the planted-recall claim to bind);
  *  - planted-near-dup recovery: every planted near pair has true
  *    shingle-Jaccard >= ~0.9, so recovered/planted is a ground-truth
  *    recall measurement with no oracle;
  *  - CC round count on the distributed large-star/small-star path
  *    (localEdgeThreshold=0 forces it): must stay ~log(cluster
  *    diameter), not grow with the corpus;
  *  - wall seconds per stage at local[cpus].
  *
  * Prints ONE JSON line.
  */
object NearDupRehearsal {

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_REHEARSAL_DOCS", "2000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val bucketCap = 5000
    val dir = PipelineBench.materialize(nDocs)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-graft"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.registerAll(spark)
    val docs = spark.read.parquet(dir)

    // production order: exact dedup first, LSH over the survivors.
    // localCheckpoint so the per-stage walls below are attributable:
    // without it every downstream action (hist, LSH, CC) re-runs the
    // exact-dedup groupBy + join from scratch and exact-dedup time is
    // silently triple-counted into the other stages' readings
    val t0 = System.nanoTime()
    val kept = DedupOps.exactDedup(docs, col("text"), col("doc_id"))
      .select(col("kept_id").as("doc_id"))
      .join(docs, Seq("doc_id"))
      .localCheckpoint()
    val keptN = kept.count()
    val exactSec = (System.nanoTime() - t0) / 1e9

    // LSH margin: bucket histogram BEFORE the cap (one extra banding
    // pass, rehearsal-only cost)
    val t1 = System.nanoTime()
    val hist = DedupOps.bucketHistogram(kept, TextOps.tokens(col("text")),
        col("doc_id"), k = 3, bands = 16, rowsPerBand = 4)
      .agg(max(col("bsz")).as("mx"),
        expr("percentile_approx(bsz, 0.999, 10000)").as("p999"),
        sum(when(col("bsz") > bucketCap, 1L).otherwise(0L)).as("over"),
        count(lit(1)).as("nbuckets"))
      .head()
    val (maxBucket, p999Bucket, overCap, nBuckets) =
      (hist.getLong(0), hist.getLong(1), hist.getLong(2), hist.getLong(3))
    val histSec = (System.nanoTime() - t1) / 1e9

    // propose + exact recheck
    val t2 = System.nanoTime()
    val pairs = DedupOps.minhashVerifiedPairs(kept, TextOps.tokens(col("text")),
      col("doc_id"), k = 3, bands = 16, rowsPerBand = 4, threshold = 0.8,
      bucketCap = bucketCap)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint()
    val nPairs = pairs.count()
    val lshSec = (System.nanoTime() - t2) / 1e9

    // planted ground truth (PipelineBench corpus law): id%37==1 docs are
    // near-copies of id-1 unless they are also exact copies or their
    // predecessor is itself a dup — recovered/planted is oracle-free
    // recall at J>=0.9 >= threshold 0.8
    val idc = col("id")
    val predIsDup = (idc - 1) % 31 === 1 || (idc - 1) % 37 === 1
    val planted = spark.range(1, nDocs)
      .where(idc % 37 === 1 && !(idc % 31 === 1) && !predIsDup)
      .select((idc - 1).as("id_a"), idc.as("id_b"))
    val nPlanted = planted.count()
    val recovered = planted.join(pairs, Seq("id_a", "id_b"), "left_semi").count()

    // distributed CC (forced): round count is the log-round evidence
    val t3 = System.nanoTime()
    val (cc, rounds) = DedupOps.connectedComponentsWithRounds(
      kept.select(col("doc_id").as("id")), pairs, localEdgeThreshold = 0L)
    val survivors = cc.where(col("id") === col("component")).count()
    val ccSec = (System.nanoTime() - t3) / 1e9

    println(s"""{"metric":"near_dup_rehearsal","docs":$nDocs,"kept_after_exact":$keptN,"bucket_cap":$bucketCap,"max_bucket":$maxBucket,"p999_bucket":$p999Bucket,"buckets_over_cap":$overCap,"n_buckets":$nBuckets,"verified_pairs":$nPairs,"planted_near_pairs":$nPlanted,"recovered_planted":$recovered,"cc_rounds":$rounds,"survivors":$survivors,"exact_sec":${Bench.jsonNum(exactSec)},"hist_sec":${Bench.jsonNum(histSec)},"lsh_sec":${Bench.jsonNum(lshSec)},"cc_sec":${Bench.jsonNum(ccSec)},"cpus":$cpus}""")
    spark.stop()
  }
}
