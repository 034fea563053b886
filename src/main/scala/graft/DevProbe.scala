package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
// temporary dev probe — not part of the library surface
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val tok = docs.select(col("doc_id").as("d"),
      explode(split(trim(col("text")), "\\s+")).as("tok"))
    val perDoc = tok.groupBy(col("d")).agg(count(lit(1)).as("n_tok"))
    val newTypes = tok.groupBy(col("tok")).agg(min(col("d")).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val points = perDoc.join(newTypes, Seq("d"), "left_outer")
      .select(col("d"), col("n_tok"), coalesce(col("n_new"), lit(0L)).as("n_new"))
      .select(sum(col("n_tok")).over(w).as("cum_tok"),
        sum(col("n_new")).over(w).as("cum_types"))
    val x = round(log(col("cum_tok").cast("double")), 9)
    val y = round(log(col("cum_types").cast("double")), 9)
    def dec(c: org.apache.spark.sql.Column) = round(c, 9).cast("decimal(20,12)")
    points.agg(count(lit(1)), sum(dec(x)).cast("string"), sum(dec(y)).cast("string"),
      sum(dec(x * y)).cast("string"), sum(dec(x * x)).cast("string"),
      sum(dec(y * y)).cast("string")).show(false)
    spark.stop()
  }
}
