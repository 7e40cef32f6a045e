package graft

/** Per-query micro-bench + plan capture for optimization work (guide
  * §1.4): NOT part of the driver contract — Bench.scala stays the
  * official harness. This main times a SUBSET of SparkEntry.queries
  * with N interleaved reps (same action as Bench: .collect()) and can
  * dump .explain("formatted") per query for the plans/ evidence dir.
  *
  * Env:
  *   SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS     core count (default 32)
  *   GRAFT_BX_QUERIES     comma list of query names, or "all"
  *   GRAFT_BX_REPS        reps per query (default 3)
  *   GRAFT_BX_PLANDIR     if set, write <dir>/<query>.txt explain output
  *   GRAFT_BX_TAG         label echoed in the output lines
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("GRAFT_BX_REPS", "3").toInt
    val tag = sys.env.getOrElse("GRAFT_BX_TAG", "bx")
    val planDir = sys.env.get("GRAFT_BX_PLANDIR")
    val wanted = sys.env.getOrElse("GRAFT_BX_QUERIES", "all")
    val spark = ScalingBench.benchSession(cpus)
    val named =
      if (wanted == "all") SparkEntry.queries.toSeq.sortBy(_._1)
      else wanted.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        .map(n => n -> SparkEntry.queries.getOrElse(n,
          throw new IllegalArgumentException(s"unknown query '$n'")))
    // one warm-up pass (codegen/JIT), then interleaved timed reps —
    // min over reps, the Bench convention (ambient noise only inflates)
    named.foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"warmup:$name")
      fn(spark, sfDir).collect()
    }
    val times = Array.fill(named.size)(List.empty[Double])
    for (rep <- 1 to reps; i <- named.indices) {
      val (name, fn) = named(i)
      spark.sparkContext.setJobDescription(s"$tag:$name:rep$rep")
      val t0 = System.nanoTime()
      fn(spark, sfDir).collect()
      times(i) ::= (System.nanoTime() - t0) / 1e9
    }
    planDir.foreach { dir =>
      new java.io.File(dir).mkdirs()
      named.foreach { case (name, fn) =>
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(s"$dir/$name.txt")
        try w.write(txt) finally w.close()
      }
    }
    named.indices.foreach { i =>
      val samples = times(i).reverse
      println(f"[$tag] ${named(i)._1}%-32s min=${samples.min}%.3f " +
        f"samples=${samples.map(s => f"$s%.3f").mkString(",")}")
    }
    println(f"[$tag] TOTAL_MIN_SUM ${times.map(_.min).sum}%.3f")
    spark.stop()
  }
}
