package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        if (wall > 1.0) {
          val rdds = si.rddInfos.map(r => r.name).mkString("<")
          println(f"SLOWSTAGE id=${si.stageId} wall=$wall%.1fs tasks=${si.numTasks} " +
            f"cpu=${si.taskMetrics.executorCpuTime / 1e9}%.1fs rdds=$rdds")
        }
      }
    })
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    import operators.Dedup
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $tag rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    (1 to 4).foreach(i => time(s"full_$i")(Dedup.minHashLsh(docs).count()))
    spark.stop()
  }
}
