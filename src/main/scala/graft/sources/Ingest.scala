package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental file-ingest bookkeeping: process each landed file exactly
  * once. A 100 TB pipeline never re-reads its lake on every run — it
  * lists the landing directory, anti-joins a LEDGER of already-processed
  * file names, processes only the delta, and commits those names. The
  * listing is a driver-side metadata operation bounded by the file
  * count (the same budget every Spark scan's FileIndex already pays);
  * the ledger is a name-keyed parquet table that grows by #files, not
  * rows.
  *
  * Crash contract: commit the ledger AFTER the processing write lands.
  * A crash between the two re-processes that batch (at-least-once) —
  * pair with an idempotent sink (overwrite-by-batch partition, the
  * Sinks.writeDeadLetters pattern) for effective exactly-once.
  */
object Ingest {

  /** Names (not paths) of data files under `dataDir`, driver-side. */
  private[graft] def listDataFiles(spark: SparkSession, dataDir: String): Seq[String] = {
    val p = new Path(dataDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
      .map(_.getPath.getName).sorted
  }

  /** Already-committed file names, empty before the first commit. */
  def ledger(spark: SparkSession, ledgerPath: String): Seq[String] = {
    val p = new Path(ledgerPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      import spark.implicits._
      spark.read.parquet(ledgerPath).select("file_name").as[String]
        .collect().toSeq.sorted
    }
  }

  /** File names landed in `dataDir` but absent from the ledger. */
  def pendingFiles(spark: SparkSession, dataDir: String, ledgerPath: String): Seq[String] =
    (listDataFiles(spark, dataDir).toSet -- ledger(spark, ledgerPath).toSet)
      .toSeq.sorted

  /** Rows of exactly the pending files (None when nothing is pending —
    * callers skip the run instead of scheduling an empty job).
    */
  def readPendingRows(spark: SparkSession, dataDir: String,
      ledgerPath: String): Option[(DataFrame, Seq[String])] = {
    val pending = pendingFiles(spark, dataDir, ledgerPath)
    if (pending.isEmpty) None
    else Some((spark.read.parquet(pending.map(n => s"$dataDir/$n"): _*), pending))
  }

  /** Append the processed names to the ledger (call AFTER the
    * processing write lands — see the crash contract above).
    */
  def commit(spark: SparkSession, ledgerPath: String, fileNames: Seq[String]): Unit = {
    import spark.implicits._
    if (fileNames.nonEmpty)
      fileNames.toDF("file_name")
        .withColumn("committed_at", current_timestamp())
        .coalesce(1).write.mode("append").parquet(ledgerPath)
  }
}
