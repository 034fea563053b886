package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    import operators.Dedup
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $tag rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    // warm
    Dedup.minHashLsh(docs).write.format("noop").mode("overwrite").save()
    val bands = Dedup.lshBands(Dedup.minHashSignatures(docs, 16), 4)
    val buckets = bands.groupBy(col("band"), col("bandsig"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= 10000)
    time("buckets")(buckets.count())
    val cand = buckets.select(explode(expr(
        "flatten(transform(ids, (x, i) -> " +
          "transform(slice(ids, i + 2, size(ids)), y -> struct(x AS da, y AS db))))"))
        .as("p"))
      .select(col("p.da"), col("p.db"))
    time("cand_distinct")(cand.distinct().count())
    val tsets = Dedup.shingleSets(docs, 3, "text", "doc_id")
    time("verify_only")(Dedup.verifyJaccard(cand.distinct(), tsets, 0.5).count())
    (1 to 4).foreach(i => time(s"full_$i")(Dedup.minHashLsh(docs).count()))
    spark.stop()
  }
}
