import org.apache.spark.sql.functions._
object ScanScale {
  def main(args: Array[String]): Unit = {
    for (par <- Seq(8, 32)) {
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$par]")
        .config("spark.sql.shuffle.partitions", par.toString)
        .config("spark.local.dir", "/dev/shm/spark-tmp")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val dir = "/tmp/graft_bench_tokens_750000"
      val inputBytes = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
      spark.conf.set("spark.sql.files.maxPartitionBytes", math.max(inputBytes / (par * 3), 2L*1024*1024).toString)
      spark.conf.set("spark.sql.files.openCostInBytes", "262144")
      def time[T](l: String)(f: => T): T = { val t0=System.nanoTime(); val r=f; println(f"PROBE par=$par $l: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
      val df = spark.read.parquet(dir)
      df.agg(sum(size(col("tokens")))).head() // warm
      for (r <- 1 to 4) time(s"scan+lambda-sum r$r") {
        df.select(aggregate(col("tokens"), lit(0L), (a,x) => a + x).as("s")).agg(sum(col("s"))).head() }
      spark.stop()
    }
  }
}
