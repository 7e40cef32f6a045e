package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** spark-submit entry point for the checkpoint-resumable sketch build:
  *
  * spark-submit --class graft.jobs.BuildSketchesMain <jar> \
  *   <inputParquetDir> <checkpointDir> <outputDir> [kind=cqf] [salts=16]
  *
  * Input must have the input_hint shape (doc_id, tokens array<int>,
  * n_tok, source). Re-running after a failure resumes from the
  * checkpoint's completed (source, salt) shards.
  */
object BuildSketchesMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: BuildSketchesMain <inputDir> <checkpointDir> <outputDir> [kind] [salts]")
    val Array(inputDir, ckptDir, outDir) = args.take(3)
    val kind = if (args.length > 3) args(3) else "cqf"
    val salts = if (args.length > 4) args(4).toInt else 16
    val spark = SparkSession.builder()
      .appName(s"graft-build-$kind")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .getOrCreate()
    graft.GraftFunctions.registerAll(spark)
    val input = spark.read.parquet(inputDir)
    val result = BuildSketches.run(spark, input, ckptDir,
      BuildSketches.Config(kind = kind, salts = salts))
    // range layout on the group key: clustered output files, so
    // downstream per-source reads prune to contiguous file ranges
    result.repartitionByRange(col("source"))
      .write.mode("overwrite").parquet(outDir)
    spark.stop()
  }
}
