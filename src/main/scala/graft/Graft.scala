package graft

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.TryCapture

/** `SparkSessionExtensions` hook: registers graft's native functions so
  * they are usable from SQL (`spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(Graft.tryCaptureFn)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}

object Graft {
  val tryCaptureFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("try_capture"),
    new ExpressionInfo(classOf[TryCapture].getName, "try_capture"),
    (children: Seq[Expression]) => TryCapture(children.head))

  /** Runtime registration for sessions built without the extensions conf. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "try_capture", tryCaptureFn._3, "built-in")
    registerStrategies(spark)
  }

  /** Install graft's planner strategies (idempotent). */
  def registerStrategies(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(graft.plans.TopKPerKeyStrategy))
      spark.experimental.extraStrategies = cur :+ graft.plans.TopKPerKeyStrategy
  }
}

/** Test-data table loaders. */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def views(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
