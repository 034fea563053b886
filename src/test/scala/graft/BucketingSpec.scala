package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def countShuffles(p: SparkPlan): Int =
    graft.sources.Layout.flattenPlan(p).count(_.isInstanceOf[ShuffleExchangeExec])

  // UUID-suffixed names: a crashed prior run (or another suite sharing
  // the metastore) must not fail saveAsTable with TableAlreadyExists
  private def freshTag(): String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  private def writeBucketed(df: org.apache.spark.sql.DataFrame, key: String,
      buckets: Int, path: String, table: String): Unit =
    // repartition on the bucket key BEFORE the bucketed write: one
    // task per bucket -> ONE file per bucket instead of
    // tasks × buckets slivers
    df.repartition(buckets, col(key))
      .write.format("parquet").bucketBy(buckets, key).sortBy(key)
      .option("path", path).saveAsTable(table)

  test("bucketed tables join with zero exchanges (bucketed scans carry the join)") {
    val tag = freshTag()
    val tmp = java.nio.file.Files.createTempDirectory("bucketspec").toString
    val (ltab, rtab) = (s"bspec_left_$tag", s"bspec_right_$tag")
    try {
      val left = (0 until 1000).map(i => (i.toLong, s"p${i % 5}")).toDF("k", "prio")
      val right = (0 until 5000).map(i => ((i % 1000).toLong, i.toDouble)).toDF("k2", "qty")
      // (The merge-join's partition-local Sort still appears: since 3.0
      // Spark ignores bucket sortBy order on read unless
      // spark.sql.legacy.bucketedTableScan.outputOrdering is set — the
      // win under test is the absent Exchange, which is the part that
      // costs a network pass at 100 TB.)
      writeBucketed(left, "k", 4, s"$tmp/left", ltab)
      writeBucketed(right, "k2", 4, s"$tmp/right", rtab)
      // hint("merge"): without it the planner broadcasts the small side
      // and disables the bucketed scan — fine at spec scale, but the
      // property under test is the 100-TB shape where neither side
      // broadcasts and the buckets must carry the join
      val joined = spark.table(ltab).hint("merge")
        .join(spark.table(rtab), $"k" === $"k2")
      assert(joined.count() === 5000L)
      // the bucketed layout IS the shuffle: the join must not add one
      assert(countShuffles(joined.queryExecution.executedPlan) === 0,
        s"bucketed join still shuffles:\n${joined.queryExecution.executedPlan}")
      // both sides must actually scan through the bucketed layout
      // (a planner fallback to a plain file scan would also show zero
      // shuffles here only by broadcasting — which the merge hint bars)
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("SelectedBucketsCount") || planStr.contains("Bucketed: true"),
        s"scan did not use bucketed layout:\n$planStr")
      info(s"bucketed join plan:\n$planStr")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $ltab")
      spark.sql(s"DROP TABLE IF EXISTS $rtab")
      SparkEntry.rmTree(tmp)
    }
  }

  test("bucket-count mismatch re-shuffles exactly ONE side (the 100x-scale footgun)") {
    val tag = freshTag()
    val tmp = java.nio.file.Files.createTempDirectory("bucketspec_mm").toString
    val (ltab, rtab) = (s"bspec_mml_$tag", s"bspec_mmr_$tag")
    try {
      val left = (0 until 1000).map(i => (i.toLong, s"p${i % 5}")).toDF("k", "prio")
      val right = (0 until 5000).map(i => ((i % 1000).toLong, i.toDouble)).toDF("k2", "qty")
      // 4-bucket table joined to an 8-bucket table: the layouts hash the
      // same key to DIFFERENT partition counts, so one side must
      // re-shuffle — silently, which is why the bucket count is a
      // corpus-wide convention at scale, not a per-table choice
      writeBucketed(left, "k", 4, s"$tmp/left", ltab)
      writeBucketed(right, "k2", 8, s"$tmp/right", rtab)
      val joined = spark.table(ltab).hint("merge")
        .join(spark.table(rtab), $"k" === $"k2")
      assert(joined.count() === 5000L)
      // exactly one Exchange: the mismatched side re-buckets, the other
      // side's layout still carries its half of the join (two exchanges
      // would mean bucketing bought nothing)
      val n = countShuffles(joined.queryExecution.executedPlan)
      assert(n === 1,
        s"expected exactly 1 exchange for mismatched buckets, got $n:\n" +
          joined.queryExecution.executedPlan)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $ltab")
      spark.sql(s"DROP TABLE IF EXISTS $rtab")
      SparkEntry.rmTree(tmp)
    }
  }

  test("persisted LSH index: probe == direct incremental, index scan is bucketed") {
    val tag = freshTag()
    val tmp = java.nio.file.Files.createTempDirectory("bucketspec_lsh").toString
    val itab = s"bspec_lshidx_$tag"
    try {
      val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
        "zeta", "eta", "theta", "iota", "kappa")
      def text(seed: Int, mut: Int): String =
        (0 until 8).map(i => words((seed * 3 + i + (if (i == 7) mut else 0)) % 10))
          .mkString(" ")
      val corpus = (0 until 20).map(i => (i.toLong, text(i % 5, 0))).toDF("doc_id", "text")
      val batch = (100 until 110).map(i => (i.toLong, text(i % 5, i % 2)))
        .toDF("doc_id", "text") // even ids: exact shingle-set copies of a corpus doc
      graft.operators.Dedup.writeLshIndex(corpus, itab, s"$tmp/idx", buckets = 4)
      val probed = graft.operators.Dedup.probeLshIndex(batch, corpus, itab)
        .orderBy($"da", $"db")
      val direct = graft.operators.Dedup.minHashLshIncremental(corpus, batch)
        .orderBy($"da", $"db")
      val p = probed.collect().toSeq
      assert(p.nonEmpty, "probe found no pairs — vacuous fixture")
      assert(p === direct.collect().toSeq)
      // the index side must be served by the bucketed layout (its half
      // of the candidate join needs no exchange — the generic bucketed
      // tests above pin the exchange-free property itself)
      val planStr = probed.queryExecution.executedPlan.toString
      assert(planStr.contains("SelectedBucketsCount") || planStr.contains("Bucketed: true"),
        s"probe did not scan the bucketed index:\n$planStr")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $itab")
      SparkEntry.rmTree(tmp)
    }
  }

  test("x4 bucket count is a conf knob (spark.graft.x4.buckets)") {
    spark.conf.set("spark.graft.x4.buckets", "3")
    try {
      val out = SparkEntry.queries("x4_bucketed_join")(spark, "/root/testdata/sf0.001")
      assert(out.count() === 5L) // five order priorities — result invariant to the knob
    } finally spark.conf.unset("spark.graft.x4.buckets")
  }
}
