package graft

import org.apache.spark.sql.SparkSession

/** Dev-only smoke probe: runs entry() and the capture queries with codegen
  * fallback disabled, proving TryCapture's generated code compiles (no
  * silent interpreted fallback). Usage: sbt "runMain graft.Probe".
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("ENTRY_ROWS=" + SparkEntry.entry(spark).count())
    val dir = if (args.nonEmpty && !args(0).startsWith("explain:")) args(0)
      else "/root/testdata/sf0.001"
    args.filter(_.startsWith("explain:")).map(_.stripPrefix("explain:")).foreach { q =>
      println(s"==== EXPLAIN $q")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    val e2 = SparkEntry.queries("e2_capture_values")(spark, dir)
    println("E2_CODEGEN_ONLY_ROWS=" + e2.count())
    SparkEntry.queries("e4_dead_letters")(spark, dir).show(3, 60, vertical = false)
    spark.stop()
  }
}
