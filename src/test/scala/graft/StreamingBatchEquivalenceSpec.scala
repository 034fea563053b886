package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamErrorHandling

/** The streaming surfaces with oracle-verified batch twins (VERDICT r5
  * item 8): run each over the SAME sf0.01 parquet via the file source
  * and assert equality with the batch twin's output — closing the
  * "spec-only" asterisk on SURVEY §2d without a DuckDB streaming
  * analog. ST3 ↔ q20, ST4 ↔ d1, ST5 ↔ the q29-shaped batch interval
  * join (same operator semantics; q24's as-of has unbounded lookback,
  * so the bounded stream-stream join's honest twin is the bounded
  * batch interval join), ST7 ↔ q26.
  */
class StreamingBatchEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  /** Stage one table file into a fresh directory (the file source
    * lists a directory, the testdata tables are single files).
    */
  private def staged(table: String): String = {
    val dir = Files.createTempDirectory(s"graft-sbe-$table")
    Files.copy(Paths.get(s"$sf/$table.parquet"), dir.resolve(s"$table.parquet"))
    dir.toString
  }

  private def fileStream(dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    // same long-nanos ts contract as the batch loader (no-op without ts)
    Tables.withNanosTs(spark.readStream.schema(schema).parquet(dir))
  }

  test("ST3 windowedCounts over file-sourced events equals batch q20 hour x type counts") {
    val dir = staged("events")
    val stream = fileStream(dir)
      .withColumn("ets", timestamp_micros(expr("ts div 1000")))
    val out = StreamErrorHandling.windowedCounts(
      stream, "ets", "1 hour", "2 hours", "event_type")
    val q = out.writeStream.format("memory").queryName("sbe_wc")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("sbe_wc")
      .select($"window_start", $"event_type", $"n")
      .as[(String, String, Long)].collect().toSet
    val want = SparkEntry.queries("q20_hourly_events")(spark, sf)
      .select($"hour", $"event_type", $"n")
      .as[(String, String, Long)].collect().toSet
    assert(got == want)
  }

  test("ST4 dedupStreaming over file-sourced documents equals batch d1 exact dedup") {
    val dir = staged("documents")
    val stream = fileStream(dir)
      .withColumn("text_hash", md5($"text"))
      // synthetic event time: content dedup has no real clock; a
      // constant keeps every id inside one watermark horizon
      .withColumn("ets", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    val out = StreamErrorHandling.dedupStreaming(stream, "text_hash", "ets", "1 hour")
    val q = out.writeStream.format("memory").queryName("sbe_dd")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("sbe_dd").select($"text_hash").as[String].collect()
    val want = SparkEntry.queries("d1_exact_dedup")(spark, sf)
      .select($"text_hash").as[String].collect()
    // same number of survivors (one per duplicate class), same classes —
    // WHICH copy survives is explicitly arbitrary in both
    assert(got.length == want.length)
    assert(got.toSet == want.toSet)
  }

  test("ST5 stream-stream interval join equals the batch binned interval join") {
    val dir = staged("events")
    def micros(c: String) = timestamp_micros(expr(s"$c div 1000"))
    val evs = fileStream(dir)
    // clicks in the 6 h BEFORE each error, as one self-joined stream
    val errS = evs.filter($"event_type" === "error")
      .select($"user_id".as("e_user"), $"event_id".as("e_id"), micros("ts").as("e_ts"))
    val clkS = evs.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"event_id".as("c_id"), micros("ts").as("c_ts"))
    val out = StreamErrorHandling.intervalJoin(
      errS, clkS, "e_user", "c_user", "e_ts", "c_ts",
      watermarkDelay = "1 hour", window = "6 hours")
    val q = out.writeStream.format("memory").queryName("sbe_ij")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("sbe_ij").select($"e_id", $"c_id")
      .as[(Long, Long)].collect().sorted.toSeq

    val ev = Tables.withNanosTs(spark.read.parquet(s"$dir/events.parquet"))
      .withColumn("tus", expr("ts div 1000"))
    val err = ev.filter($"event_type" === "error")
      .select($"user_id".as("e_user"), $"event_id".as("e_id"), $"tus".as("e_t"))
    val clk = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"event_id".as("c_id"), $"tus".as("c_t"))
    // c_t - e_t ∈ [-6h, 0] ⟺ clicks at most 6 h before the error
    val want = operators.IntervalJoin.binned(err, clk, "e_user", "c_user", "e_t", "c_t",
        lower = -21600000000L, upper = 0L)
      .select($"e_id", $"c_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got == want)
  }

  test("ST21 stream-stream LEFT OUTER interval join equals the batch binned outer join") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.withNanosTs(spark.read.parquet(s"$sf/events.parquet"))
      .withColumn("tus", expr("ts div 1000"))
    def rows(tpe: String) = ev.filter($"event_type" === tpe)
      .select($"user_id", $"event_id", timestamp_micros($"tus").as("ets"))
      .as[(Long, Long, java.sql.Timestamp)].collect().toSeq
    val lmem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val rmem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val out = StreamErrorHandling.intervalJoinOuter(
      lmem.toDF().toDF("e_user", "e_id", "e_ts"),
      rmem.toDF().toDF("c_user", "c_id", "c_ts"),
      "e_user", "c_user", "e_ts", "c_ts",
      watermarkDelay = "1 hour", window = "6 hours")
    val q = out.writeStream.format("memory").queryName("sbe_ijo")
      .outputMode("append").start()
    // batch 0: the whole corpus; then two sentinel batches on BOTH
    // streams (global watermark = min across inputs) push the horizon
    // past every real row — null emission lags eviction by one batch
    lmem.addData(rows("error"): _*); rmem.addData(rows("click"): _*)
    q.processAllAvailable()
    def sentinel(u: Long, d: String) = (u, -u, java.sql.Timestamp.valueOf(d))
    lmem.addData(sentinel(-1L, "2030-01-01 00:00:00"))
    rmem.addData(sentinel(-2L, "2030-01-01 00:00:00"))
    q.processAllAvailable()
    lmem.addData(sentinel(-3L, "2030-01-02 00:00:00"))
    rmem.addData(sentinel(-4L, "2030-01-02 00:00:00"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sbe_ijo").filter($"e_user" >= 0L)
      .select($"e_id", $"c_id").as[(Long, Option[Long])].collect()
      .sortBy(r => (r._1, r._2.getOrElse(Long.MinValue))).toSeq

    val err = ev.filter($"event_type" === "error")
      .select($"user_id".as("e_user"), $"event_id".as("e_id"), $"tus".as("e_t"))
    val clk = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"event_id".as("c_id"), $"tus".as("c_t"))
    val want = operators.IntervalJoin.binned(err, clk, "e_user", "c_user", "e_t", "c_t",
        lower = -21600000000L, upper = 0L, joinType = "left_outer")
      .select($"e_id", $"c_id").as[(Long, Option[Long])].collect()
      .sortBy(r => (r._1, r._2.getOrElse(Long.MinValue))).toSeq
    assert(want.exists(_._2.isEmpty), "fixture has no unmatched errors — vacuous")
    assert(got == want)
  }

  test("ST23 stream-stream FULL OUTER interval join equals batch binnedFullOuter") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.withNanosTs(spark.read.parquet(s"$sf/events.parquet"))
      .withColumn("tus", expr("ts div 1000"))
    def rows(tpe: String) = ev.filter($"event_type" === tpe)
      .select($"user_id", $"event_id", timestamp_micros($"tus").as("ets"))
      .as[(Long, Long, java.sql.Timestamp)].collect().toSeq
    val lmem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val rmem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val out = StreamErrorHandling.intervalJoinFullOuter(
      lmem.toDF().toDF("e_user", "e_id", "e_ts"),
      rmem.toDF().toDF("c_user", "c_id", "c_ts"),
      "e_user", "c_user", "e_ts", "c_ts",
      watermarkDelay = "1 hour", window = "6 hours")
    val q = out.writeStream.format("memory").queryName("sbe_ijf")
      .outputMode("append").start()
    lmem.addData(rows("error"): _*); rmem.addData(rows("click"): _*)
    q.processAllAvailable()
    def sentinel(u: Long, d: String) = (u, -u, java.sql.Timestamp.valueOf(d))
    lmem.addData(sentinel(-1L, "2030-01-01 00:00:00"))
    rmem.addData(sentinel(-2L, "2030-01-01 00:00:00"))
    q.processAllAvailable()
    lmem.addData(sentinel(-3L, "2030-01-02 00:00:00"))
    rmem.addData(sentinel(-4L, "2030-01-02 00:00:00"))
    q.processAllAvailable()
    q.stop()
    // sentinels never match real keys, so they surface only as their own
    // null-extended rows — strip both sides' sentinel emissions
    val got = spark.table("sbe_ijf")
      .filter(coalesce($"e_user", lit(0L)) >= 0L && coalesce($"c_user", lit(0L)) >= 0L)
      .select($"e_id", $"c_id").as[(Option[Long], Option[Long])].collect()
      .sortBy(r => (r._1.getOrElse(Long.MinValue), r._2.getOrElse(Long.MinValue))).toSeq

    val err = ev.filter($"event_type" === "error")
      .select($"user_id".as("e_user"), $"event_id".as("e_id"), $"tus".as("e_t"))
    val clk = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"event_id".as("c_id"), $"tus".as("c_t"))
    val want = operators.IntervalJoin.binnedFullOuter(err, clk,
        "e_user", "c_user", "e_t", "c_t", lower = -21600000000L, upper = 0L)
      .select($"e_id", $"c_id").as[(Option[Long], Option[Long])].collect()
      .sortBy(r => (r._1.getOrElse(Long.MinValue), r._2.getOrElse(Long.MinValue))).toSeq
    assert(want.exists(_._1.isEmpty), "fixture has no unmatched clicks — vacuous")
    assert(want.exists(_._2.isEmpty), "fixture has no unmatched errors — vacuous")
    assert(got == want)
  }

  test("ST7 session_window sessionize equals batch q26 per-user session stats") {
    val dir = staged("events")
    val stream = fileStream(dir)
      .withColumn("ets", timestamp_micros(expr("ts div 1000")))
    val out = StreamErrorHandling.sessionize(
      stream, "ets", "user_id", gap = "4 hours", watermarkDelay = "2 hours")
    val q = out.writeStream.format("memory").queryName("sbe_sess")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("sbe_sess")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"), sum($"n_events").as("n_events"),
        max($"n_events").as("longest"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = SparkEntry.queries("q26_sessions")(spark, sf)
      .select($"user_id", $"n_sessions", $"n_events", $"longest")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("ST12 funnelDetect equals batch q27; verdicts arrival-order independent") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamErrorHandling.FunnelVerdict
    val rows = Tables.load(spark, sf, "events")
      .select($"user_id", expr("ts div 1000").as("tus"), $"event_type")
      .as[(Long, Long, String)].collect().toSeq
    val maxTs = rows.map(_._2).max
    val day = 86400L * 1000000L

    // the corpus spans 30 days: a 60-day delay keeps every arrival
    // on-time however the batches are scattered; two far-future
    // sentinel triggers then walk the watermark past every real user
    // so their event-time timeouts fire and the verdicts flush
    def run(batches: Seq[Seq[(Long, Long, String)]], name: String)
        : Map[Long, (Long, Option[Long], Boolean)] = {
      val mem = MemoryStream[(Long, Long, String)]
      val ev = mem.toDF().toDF("user_id", "tus", "event_type")
        .withColumn("ets", timestamp_micros($"tus"))
      val out = StreamErrorHandling.funnelDetect(ev, "user_id", "ets", "tus",
        "event_type", "signup", "purchase", watermarkDelay = "60 days")
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      mem.addData(Seq((-1L, maxTs + 61 * day, "noise"))); q.processAllAvailable()
      mem.addData(Seq((-2L, maxTs + 122 * day, "noise"))); q.processAllAvailable()
      q.stop()
      spark.table(name).as[FunnelVerdict].collect()
        .filter(_.user_id >= 0)
        .map(v => v.user_id -> ((v.s0, v.p0, v.converted))).toMap
    }

    val got = run(Seq(rows), "sbe_funnel")
    val expected = rows.groupBy(_._1).flatMap { case (u, rs) =>
      val signups = rs.filter(_._3 == "signup").map(_._2)
      if (signups.isEmpty) None
      else {
        val s0 = signups.min
        val ps = rs.collect { case (_, t, "purchase") if t > s0 => t }
        val p0 = if (ps.isEmpty) None else Some(ps.min)
        Some(u -> ((s0, p0, p0.isDefined)))
      }
    }.toMap
    assert(got == expected)
    // aggregate equality with the oracle-verified q27 row
    val q27 = SparkEntry.queries("q27_funnel")(spark, sf)
      .as[(Long, Long, Long)].collect().head
    assert(got.size.toLong == q27._1)
    assert(got.values.count(_._3).toLong == q27._2)
    assert(got.values.flatMap(v => v._2.map(_ - v._1)).sum == q27._3)
    // arrival-order independence: the same events scattered over three
    // arbitrary triggers (signups often arriving AFTER their purchases)
    val scattered = rows.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
      .map(_._2.map(_._1))
    assert(run(scattered, "sbe_funnel3") == got)
  }

  test("ST28 attributionDetect equals batch q53; verdicts arrival-order independent") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamErrorHandling.AttributionVerdict
    val rows = Tables.load(spark, sf, "events")
      .select($"user_id", expr("ts div 1000").as("tus"), $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect().toSeq
    val maxTs = rows.map(_._2).max
    val day = 86400L * 1000000L

    def run(batches: Seq[Seq[(Long, Long, Long, String)]], name: String)
        : Set[AttributionVerdict] = {
      val mem = MemoryStream[(Long, Long, Long, String)]
      val ev = mem.toDF().toDF("user_id", "tus", "event_id", "event_type")
        .withColumn("ets", timestamp_micros($"tus"))
      val out = StreamErrorHandling.attributionDetect(ev, "user_id", "ets",
        "tus", "event_id", "event_type", touchType = "click",
        convType = "purchase", lookbackUs = 3600L * 1000000L,
        watermarkDelay = "60 days")
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      mem.addData(Seq((-1L, maxTs + 61 * day, -1L, "noise"))); q.processAllAvailable()
      mem.addData(Seq((-2L, maxTs + 122 * day, -2L, "noise"))); q.processAllAvailable()
      q.stop()
      spark.table(name).as[AttributionVerdict].collect()
        .filter(_.user_id >= 0).toSet
    }

    val got = run(Seq(rows), "sbe_attr")
    // FULL row equality with the oracle-verified batch q53 over the
    // same corpus (same lookback, same tie rules)
    val want = SparkEntry.queries("q53_attribution")(spark, sf)
      .select($"conv_id", $"user_id", $"conv_ts_us", $"touch_id",
        $"gap_us", $"attributed")
      .collect().map(r => AttributionVerdict(r.getLong(0), r.getLong(1),
        r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5)))
      .toSet
    assert(want.exists(!_.attributed), "fixture has no unattributed rows — vacuous")
    assert(want.exists(_.attributed), "fixture has no attributed rows — vacuous")
    assert(got == want)
    // arrival-order independence: clicks often arriving AFTER the
    // purchases they precede in event time
    val scattered = rows.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
      .map(_._2.map(_._1))
    assert(run(scattered, "sbe_attr3") == got)
  }

  test("ST34 burstDetect equals batch q55; episodes arrival-order independent") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamErrorHandling.BurstEpisode
    val rows = Tables.load(spark, sf, "events")
      .select($"user_id", $"ts")
      .as[(Long, Long)].collect().toSeq
    val maxUs = rows.map(_._2 / 1000).max
    val day = 86400L * 1000000L

    def run(batches: Seq[Seq[(Long, Long)]], name: String): Set[BurstEpisode] = {
      val mem = MemoryStream[(Long, Long)]
      val ev = mem.toDF().toDF("user_id", "tns")
        .withColumn("ets", timestamp_micros(expr("tns div 1000")))
      val out = StreamErrorHandling.burstDetect(ev, "user_id", "ets",
        "tns", s = 2.0, gamma = 0.5, watermarkDelay = "60 days")
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      mem.addData(Seq((-1L, (maxUs + 61 * day) * 1000L))); q.processAllAvailable()
      mem.addData(Seq((-2L, (maxUs + 122 * day) * 1000L))); q.processAllAvailable()
      q.stop()
      spark.table(name).as[BurstEpisode].collect()
        .filter(_.user_id >= 0).toSet
    }

    val got = run(Seq(rows), "sbe_burst")
    // FULL row equality with the oracle-verified batch q55 over the
    // same corpus (same s/gamma, same compiled DP)
    val want = SparkEntry.queries("q55_bursts")(spark, sf)
      .collect().map(r => BurstEpisode(r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(want.nonEmpty, "fixture yields no burst episodes — vacuous")
    assert(got == want)
    // arrival-order independence: each user's events scattered over
    // three triggers in arbitrary (non-chronological) order
    val scattered = rows.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
      .map(_._2.map(_._1))
    assert(run(scattered, "sbe_burst3") == got)
  }

  test("ST13 enrichToSink: per-trigger dim refresh; enrichment equals batch join") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tmp = Files.createTempDirectory("graft-sbe-enrich").toString
    val dimPath = s"$tmp/dim"

    // dim v1: users 1..2 tiered bronze
    Seq((1L, "bronze"), (2L, "bronze")).toDF("user_id", "tier")
      .write.mode("overwrite").parquet(dimPath)
    val mem = MemoryStream[(Long, Long)]
    val q = StreamErrorHandling.enrichToSink(
      mem.toDF().toDF("user_id", "amount"),
      dimPath, Seq("user_id"), s"$tmp/out", s"$tmp/ckpt")
    mem.addData((1L, 10L), (3L, 30L)); q.processAllAvailable()
    // dim REPUBLISHED between triggers: user 1 upgraded, user 3 appears
    Seq((1L, "gold"), (2L, "bronze"), (3L, "silver")).toDF("user_id", "tier")
      .write.mode("overwrite").parquet(dimPath)
    mem.addData((1L, 11L), (3L, 31L)); q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(s"$tmp/out")
      .select($"user_id", $"amount", $"tier")
      .as[(Long, Long, Option[String])].collect().toSet
    assert(got == Set(
      (1L, 10L, Some("bronze")), (3L, 30L, None), // trigger 1: dim v1
      (1L, 11L, Some("gold")), (3L, 31L, Some("silver")))) // trigger 2: v2
    // batch twin: the same enrichment of trigger-2 rows as a plain join
    val batch = Seq((1L, 11L), (3L, 31L)).toDF("user_id", "amount")
      .join(broadcast(spark.read.parquet(dimPath)), Seq("user_id"), "left_outer")
      .as[(Long, Long, Option[String])].collect().toSet
    assert(got.filter(r => r._2 % 10 == 1) == batch) // trigger-2 amounts end in 1
  }

  test("ST35 dsirGate scores equal oracle-verified p25 bit-for-bit; " +
      "threshold splits exactly") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = Tables.load(spark, sf, "documents")
    // fit batch-side on the full corpus (what p25 fits on)
    val nanos = graft.operators.Pipeline.dsirModelNanos(
      graft.operators.Pipeline.dsirModel(docs, isTarget = $"lang" === "en"))
    val tmp = Files.createTempDirectory("graft-sbe-dsir").toString
    val mem = MemoryStream[(Long, String)]
    val thr = 0.05
    val q = StreamErrorHandling.dsirGate(
      mem.toDF().toDF("doc_id", "text"), nanos, minLogWeight = thr,
      s"$tmp/kept", s"$tmp/rejected", s"$tmp/ckpt")
    val rows = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().toSeq
    // two triggers, arbitrary split
    val (t1, t2) = rows.partition(_._1 % 3 == 0)
    mem.addData(t1); q.processAllAvailable()
    mem.addData(t2); q.processAllAvailable()
    q.stop()
    val kept = spark.read.parquet(s"$tmp/kept")
      .select($"doc_id", $"n_tokens", $"log_weight")
      .as[(Long, Long, Double)].collect()
    val rejected = spark.read.parquet(s"$tmp/rejected")
      .select($"doc_id", $"n_tokens", $"log_weight")
      .as[(Long, Long, Double)].collect()
    assert(kept.nonEmpty && rejected.nonEmpty, "threshold must split")
    assert(kept.forall(_._3 >= thr) && rejected.forall(_._3 < thr))
    assert((kept ++ rejected).map(_._1).sorted.toSeq ==
      rows.map(_._1).sorted.toSeq)
    // BIT-FOR-BIT equality with the oracle-verified p25 top-25 values
    val scores = (kept ++ rejected).map(r => r._1 -> ((r._2, r._3))).toMap
    val p25 = SparkEntry.queries("p25_dsir_select")(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(p25.length == 25)
    p25.foreach { case (did, n, w) =>
      assert(scores(did) === ((n, w)), s"doc $did gate score != batch p25")
    }
  }
}
