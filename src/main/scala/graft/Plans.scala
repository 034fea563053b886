package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: dump `.explain("formatted")` for named queries to files —
  * the optimization-round evidence trail (plans/r14/<query>_before.txt /
  * _after.txt). Uses the BENCH session config (local[32], 32 shuffle
  * partitions, 64MB autoBroadcast) so the captured plan is the plan the
  * bench actually times.
  *
  * Usage: sbt "runMain graft.Plans <outDir> <suffix> <query> [query...]"
  *   e.g. runMain graft.Plans plans/r14 before t35_textrank t36_quality_ngram
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val p = java.nio.file.Paths.get(outDir, s"${q}_$suffix.txt")
      java.nio.file.Files.writeString(p, txt)
      println(s"wrote $p (${txt.length} chars)")
    }
    spark.stop()
  }
}
