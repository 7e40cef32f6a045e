package graft

/** Job-level profile of one SparkEntry query (guide §1/§7): runs the
  * query once warm, then once instrumented with a SparkListener that
  * records per-job wall time and call site — the local-mode stand-in
  * for the UI's Jobs page. Not part of the driver contract.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, GRAFT_PROF_QUERY.
  */
object ProfQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val name = sys.env.getOrElse("GRAFT_PROF_QUERY", "dedup_incremental")
    val spark = ScalingBench.benchSession(cpus)
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).collect() // warm-up: codegen + JIT
    val jobs = new scala.collection.mutable.ArrayBuffer[(Int, Long, Long, String)]
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val stages = new scala.collection.mutable.ArrayBuffer[(Int, Long, Int, String)]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s)
          .getOrElse(-1L)
        stages.synchronized {
          stages += ((si.stageId, ms, si.numTasks, si.name.take(90)))
        }
      }
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description"))
            .orElse(Option(js.properties.getProperty("callSite.short")))
            .getOrElse("?")))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = starts.get(je.jobId)
        if (s != null) jobs.synchronized {
          jobs += ((je.jobId, s._1, System.nanoTime() - s._1, s._2))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).collect()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // listener bus drain
    val sorted = jobs.sortBy(_._1)
    var prevEnd = t0
    sorted.foreach { case (id, st, d, cs) =>
      val gap = (st - prevEnd) / 1e9 // driver-side time before this job
      prevEnd = st + d
      println(f"[prof] job $id%3d gap=$gap%6.3f run=${d / 1e9}%7.3f  $cs")
    }
    stages.sortBy(_._1).foreach { case (id, ms, nt, nm) =>
      println(f"[pstage] $id%4d ${ms / 1e3}%7.3f s tasks=$nt%3d  $nm")
    }
    println(f"[prof] $name wall=$wall%.3f jobs=${sorted.size} " +
      f"jobsum=${sorted.map(_._3).sum / 1e9}%.3f " +
      f"gapsum=${wall - sorted.map(_._3).sum / 1e9}%.3f")
    spark.stop()
  }
}
