package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only: per-Spark-job timing breakdown for one named query.
  * `runMain graft.DebugJobs <queryName> [sfDir]`
  */
object DebugJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = starts.getOrDefault(je.jobId, 0L)
        println(f"[job ${je.jobId}%3d] ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
    })

    val fn = SparkEntry.queries(name)
    // warmup at smallest SF
    fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    println("=== warmup done; measured run follows ===")
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    // `plan` arg: dump the AQE-FINAL executed plan (ReusedExchange,
    // skew splits and runtime join picks only exist post-execution;
    // collect() the same DataFrame whose plan we print — a fresh
    // action would spawn a fresh, never-run QueryExecution)
    if (args.contains("plan")) {
      val df = fn(spark, sfDir)
      df.collect()
      println("=== executed plan (AQE final) ===")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
