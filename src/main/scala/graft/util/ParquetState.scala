package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared filesystem guard for resumable parquet state directories
  * (BuildSketches checkpoints, IncrementalDedup stores). */
object ParquetState {

  /** Read a state table only if the directory holds VISIBLE data
    * entries: a killed first append leaves `_temporary/` and a committed
    * empty append a lone `_SUCCESS` — counting those as data would send
    * a resume into a parquet read with zero data files
    * (UNABLE_TO_INFER_SCHEMA) instead of a fresh start. */
  def readIfAny(spark: SparkSession, dir: String): Option[DataFrame] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val path = new org.apache.hadoop.fs.Path(dir)
    if (fs.exists(path) && fs.listStatus(path).exists { st =>
          val n = st.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        })
      Some(spark.read.parquet(dir))
    else None
  }

  /** Remove a local throwaway state directory (temp dirs created by
    * gate queries / specs) — callers materialize results FIRST. */
  def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete()
  }
}
