package graft
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $tag rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    // warm
    operators.Dedup.shingleSets(docs, 3, "text", "doc_id").write.format("noop").mode("overwrite").save()
    time("shingles")(operators.Dedup.shingleSets(docs, 3, "text", "doc_id").count())
    time("sigs")(operators.Dedup.minHashSignatures(docs, 16).count())
    time("bands")(operators.Dedup.lshBands(operators.Dedup.minHashSignatures(docs, 16), 4).count())
    time("full")(operators.Dedup.minHashLsh(docs).count())
    spark.stop()
  }
}
