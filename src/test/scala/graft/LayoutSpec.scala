package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("writeOptimized: partition dirs, pruned reads, file-size cap") {
    val dir = java.nio.file.Files.createTempDirectory("layout").toString
    val df = (0 until 1000)
      .map(i => (i.toLong, if (i % 3 == 0) "en" else "de", s"doc $i"))
      .toDF("doc_id", "lang", "text")
    Layout.writeOptimized(df, dir, partitionCols = Seq("lang"),
      sortCols = Seq("doc_id"), filesPerPartition = 2, maxRecordsPerFile = 100)

    val back = spark.read.parquet(dir)
    assert(back.count() === 1000L)
    // the filtered scan carries a partition filter -> directory pruning
    assert(Layout.partitionFilters(back.filter($"lang" === "en"))
      .exists(_.contains("lang")))
    // layout on disk: one dir per value; 667 'de' rows with a 100-row
    // cap -> at least 7 files, and no single file exceeds the cap
    def files(lang: String) = {
      val d = java.nio.file.Paths.get(dir, s"lang=$lang")
      val s = java.nio.file.Files.list(d).iterator()
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (s.hasNext) { val p = s.next().toString; if (p.endsWith(".parquet")) out += p }
      out.toSeq
    }
    assert(files("de").size >= 7)
    assert(files("de").forall(f => spark.read.parquet(f).count() <= 100L))
    // round-trip preserves data
    assert(back.agg(sum($"doc_id")).head.getLong(0) === (0L until 1000L).sum)
  }

  test("persisted IVF probe prunes to the probed cell directories") {
    // the s7 shape: inverted lists on disk partitioned by cell, probe
    // joins on the partition column -> the scan must NOT read every cell
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    val vecs = (0 until 64).map { i =>
      (i.toLong, i % 8, Array.tabulate(4)(d => (i * 4 + d).toFloat / 256f))
    }.toDF("vec_id", "label", "embedding")
    Layout.writeOptimized(vecs, dir, partitionCols = Seq("label"), sortCols = Seq("vec_id"))
    val idx = spark.read.parquet(dir)
    val cents = (0L until 8L).map(c =>
      (c, Seq.tabulate(4)(d => ((c * 8 + 3) * 4 + d).toDouble / 256.0)))
    val queries = broadcast(Seq((1000L, Seq(0.01, 0.02, 0.03, 0.04)))
      .toDF("qid", "qv"))
    val probed = graft.operators.Similarity.multiProbeTopK(
      idx, queries, cents, nprobe = 2, k = 3)
    val rows = probed.collect()
    assert(rows.nonEmpty && rows.length <= 3)
    // every scan of the index must carry a partition filter (static or
    // dynamic): reading all 8 cell dirs would defeat the index
    val filters = Layout.partitionFilters(probed)
    assert(filters.exists(_.contains("label")),
      s"index scan has no partition filter: ${probed.queryExecution.executedPlan}")
  }

  test("compactPartitions: only dirty dirs rewritten, content and sort survive") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    val df = (0 until 600)
      .map(i => (i.toLong, if (i % 3 == 0) "en" else "de", s"doc $i"))
      .toDF("doc_id", "lang", "text")
    // en dir: forced to >= 2 files; then a second single-file dir that
    // must NOT be touched
    Layout.writeOptimized(df, dir, partitionCols = Seq("lang"),
      sortCols = Seq("doc_id"), filesPerPartition = 4, maxRecordsPerFile = 50)
    def nFiles(lang: String): Int = {
      val d = java.nio.file.Paths.get(dir, s"lang=$lang")
      val s = java.nio.file.Files.list(d).iterator()
      var n = 0
      while (s.hasNext) { if (s.next().toString.endsWith(".parquet")) n += 1 }
      n
    }
    val before = Map("en" -> nFiles("en"), "de" -> nFiles("de"))
    assert(before.values.forall(_ >= 2), s"precondition: dirty dirs, got $before")
    val report = Layout.compactPartitions(spark, dir, sortCols = Seq("doc_id"))
      .map { case (d, b, a) => d -> ((b, a)) }.toMap
    // every dirty dir compacted to exactly one file, report matches disk
    assert(report("lang=en") == ((before("en"), 1)) && nFiles("en") == 1)
    assert(report("lang=de") == ((before("de"), 1)) && nFiles("de") == 1)
    val back = spark.read.parquet(dir)
    assert(back.count() === 600L)
    assert(back.agg(sum($"doc_id")).head.getLong(0) === (0L until 600L).sum)
    // in-file sort re-established: the single file is ordered by doc_id
    val enFile = java.nio.file.Files.list(java.nio.file.Paths.get(dir, "lang=en"))
      .iterator()
    var f: String = null
    while (enFile.hasNext) { val p = enFile.next().toString; if (p.endsWith(".parquet")) f = p }
    val ids = spark.read.parquet(f).select($"doc_id").as[Long].collect()
    assert(ids.sameElements(ids.sorted), "compacted file lost the doc_id sort")
    // a second pass finds nothing to do (all dirs now single-file)
    assert(Layout.compactPartitions(spark, dir, sortCols = Seq("doc_id")).isEmpty)
  }

  test("bloomPrefilter: no false negatives, most non-members dropped") {
    val corpus = (0 until 2000).map(i => s"hash$i").toDF("text_hash")
    val newBatch = ((1500 until 2500) ++ (10000 until 11000))
      .map(i => s"hash$i").toDF("text_hash")
    val kept = Dedup.bloomPrefilter(newBatch, corpus, "text_hash",
        expectedItems = 2000, fpp = 0.01)
      .as[String].collect().toSet
    // every true member survives (Bloom filters cannot false-negative)
    assert((1500 until 2000).forall(i => kept.contains(s"hash$i")))
    // non-members (hash2000.., hash10000..) are mostly dropped: 1500
    // non-members at fpp=0.01 -> expect ~15 leaks, allow generous slack
    val leaks = kept.size - 500
    assert(leaks >= 0 && leaks < 100, s"leaks=$leaks")
  }

  test("bloom index: point lookups prune to a superset of the true dirs, exact rows") {
    val dir = java.nio.file.Files.createTempDirectory("bloomidx").toString
    // 8 dirs of 500 disjoint keys each — doc_id is NOT the partition key
    val df = (0 until 4000)
      .map(i => (i.toLong, s"s${i / 500}", s"doc $i")).toDF("doc_id", "src", "text")
    df.write.mode("overwrite").partitionBy("src").parquet(dir)
    val indexed = Layout.writeBloomIndex(spark, dir, "doc_id",
      expectedItemsPerDir = 500, fpp = 0.01)
    assert(indexed.size == 8)
    // present key: selected dirs must include the true dir and prune most others
    val (sel, hit) = Layout.bloomPrunedLookup(spark, dir, "doc_id", 1234L)
    assert(sel.contains("src=s2"))        // 1234 / 500 = 2
    assert(sel.size <= 2, s"fpp 0.01 should not select $sel")
    assert(hit.select($"doc_id", $"src").as[(Long, String)].collect().toSeq ==
      Seq((1234L, "s2")))
    // absent key: no false negatives required, near-empty selection expected
    val (selAbsent, miss) = Layout.bloomPrunedLookup(spark, dir, "doc_id", 999999L)
    assert(selAbsent.size <= 1 && miss.count() == 0L)
    // rebuilding is an idempotent overwrite
    assert(Layout.writeBloomIndex(spark, dir, "doc_id", 500, 0.01).size == 8)
  }

  test("zone map: range scans prune to intersecting dirs only, exact rows") {
    val dir = java.nio.file.Files.createTempDirectory("zoneidx").toString
    // 8 dirs, each holding a contiguous 500-wide doc_id range — the
    // clustered-by-ingest-time shape zone maps exist for
    val df = (0 until 4000)
      .map(i => (i.toLong, s"s${i / 500}", s"doc $i")).toDF("doc_id", "src", "text")
    df.write.mode("overwrite").partitionBy("src").parquet(dir)
    Layout.writeZoneMap(spark, dir, Seq("doc_id"))
    // a range spanning two dirs selects exactly those two
    val (sel, got) = Layout.zonePrunedRange(spark, dir, "doc_id", 900L, 1100L)
    assert(sel == Seq("src=s1", "src=s2"), s"selected $sel")
    assert(got.select($"doc_id").as[Long].collect().sorted.toSeq ==
      (900L to 1100L).toSeq)
    // the pruned result equals the unpruned filter (exactness)
    val full = spark.read.parquet(dir)
      .filter($"doc_id" >= 900L && $"doc_id" <= 1100L)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(got.select($"doc_id").as[Long].collect().sorted.toSeq == full)
    // a range beyond every envelope reads nothing
    val (selNone, none) = Layout.zonePrunedRange(spark, dir, "doc_id", 50000L, 60000L)
    assert(selNone.isEmpty && none.count() == 0L)
    // rebuild is an idempotent overwrite
    Layout.writeZoneMap(spark, dir, Seq("doc_id"))
    val (sel2, _) = Layout.zonePrunedRange(spark, dir, "doc_id", 900L, 1100L)
    assert(sel2 == sel)
  }

  test("versioned commits: time travel, append by reference, crash leaves no bad version") {
    val root = java.nio.file.Files.createTempDirectory("vtab").toString
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"id").as[Long].collect().sorted.toSeq
    val v1 = Layout.commitVersion(Seq(1L, 2L, 3L).toDF("id"), root)
    val v2 = Layout.commitVersion(Seq(4L, 5L).toDF("id"), root)          // append
    val v3 = Layout.commitVersion(Seq(9L).toDF("id"), root, overwrite = true)
    assert((v1, v2, v3) == ((1L, 2L, 3L)))
    assert(Layout.listVersions(spark, root) == Seq(1L, 2L, 3L))
    assert(rows(Layout.readVersion(spark, root, Some(1L))) == Seq(1L, 2L, 3L))
    assert(rows(Layout.readVersion(spark, root, Some(2L))) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(rows(Layout.readVersion(spark, root)) == Seq(9L))
    // append carried v1's files by REFERENCE: v2's file set contains v1's
    val f1 = Layout.readVersion(spark, root, Some(1L)).inputFiles.toSet
    val f2 = Layout.readVersion(spark, root, Some(2L)).inputFiles.toSet
    assert(f1.subsetOf(f2) && f2.size > f1.size)
    // a crashed commit (staged data, no manifest) must not corrupt reads
    Seq(99L).toDF("id").write.mode("overwrite").parquet(s"$root/_stage_dead")
    assert(Layout.listVersions(spark, root) == Seq(1L, 2L, 3L))
    assert(rows(Layout.readVersion(spark, root)) == Seq(9L))
  }

  test("maintainClustered: delta-only reclustering, generations immutable, appends safe") {
    val root = java.nio.file.Files.createTempDirectory("inc-cluster").toString
    // ids map to scattered, independent 16³ grid coords (a modular-
    // cycling y = f(x) would make per-file y-spans irreducible for ANY
    // layout — the first version of this spec learned that)
    def mk(lo: Int, hi: Int) = (lo until hi).map { i =>
      val j = (i * 2654435761L) % 4096
      (i.toLong, (j / 256) % 16, (j / 16) % 16, j % 16)
    }.toDF("id", "x", "y", "z").repartition(2)
    def all(): Set[Long] = Layout.readClustered(spark, root)
      .select($"id").as[Long].collect().toSet

    // below threshold: appends accumulate, maintenance is a no-op
    Layout.appendDelta(mk(0, 100), root)
    assert(!Layout.maintainClustered(spark, root, Seq("x", "y", "z"),
      numFiles = 4, minDeltaFiles = 4))
    assert(all() == (0L until 100L).toSet)

    // threshold hit: the tail becomes one clustered generation
    Layout.appendDelta(mk(100, 200), root)
    assert(Layout.maintainClustered(spark, root, Seq("x", "y", "z"),
      numFiles = 4, minDeltaFiles = 4))
    assert(all() == (0L until 200L).toSet) // content-lossless
    val gen0 = spark.read.parquet(s"$root/base/gen_0").inputFiles.toSet
    assert(gen0.nonEmpty)

    // next cycle clusters ONLY the new tail; gen_0 files untouched
    Layout.appendDelta(mk(200, 300), root)
    Layout.appendDelta(mk(300, 400), root)
    assert(Layout.maintainClustered(spark, root, Seq("x", "y", "z"),
      numFiles = 4, minDeltaFiles = 4))
    assert(all() == (0L until 400L).toSet)
    assert(spark.read.parquet(s"$root/base/gen_0").inputFiles.toSet == gen0,
      "maintenance must never rewrite an existing generation")
    // the new generation is genuinely clustered: average per-file span
    // well under the full 0..15 range on the non-leading dims (an
    // append-ordered tail spans ~15 on both)
    val spans = spark.read.parquet(s"$root/base/gen_1")
      .groupBy(input_file_name())
      .agg((max($"y") - min($"y")).as("sy"), (max($"z") - min($"z")).as("sz"))
      .select($"sy", $"sz").as[(Long, Long)].collect()
    assert(spans.length == 4)
    assert(spans.map(_._1).sum / 4.0 <= 12.0, s"y spans: ${spans.toList}")
    assert(spans.map(_._2).sum / 4.0 <= 12.0, s"z spans: ${spans.toList}")
  }

  test("cloneVersion: deep isolates, shallow references; both diverge privately") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"id").as[Long].collect().sorted.toSeq
    val src = java.nio.file.Files.createTempDirectory("vtab-src").toString
    Layout.commitVersion(Seq(1L, 2L, 3L).toDF("id"), src) // v1
    Layout.commitVersion(Seq(4L, 5L).toDF("id"), src)     // v2 (append)

    // deep clone AT v1: its v1 equals src@v1, with its OWN file copies
    val deep = java.nio.file.Files.createTempDirectory("vtab-deep").toString
    assert(Layout.cloneVersion(spark, src, deep, Some(1L), deep = true) === 1L)
    assert(rows(Layout.readVersion(spark, deep)) == Seq(1L, 2L, 3L))
    assert(Layout.readVersion(spark, deep).inputFiles
      .forall(_.contains("vtab-deep")), "deep clone must not reference src files")

    // shallow clone at latest: equal content, ZERO files of its own
    val shal = java.nio.file.Files.createTempDirectory("vtab-shal").toString
    assert(Layout.cloneVersion(spark, src, shal, None, deep = false) === 1L)
    assert(rows(Layout.readVersion(spark, shal)) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(Layout.readVersion(spark, shal).inputFiles
      .forall(_.contains("vtab-src")), "shallow clone must reference src files")

    // clones diverge PRIVATELY: a commit on each lands in its own data
    // dir and the source never observes it
    Layout.commitVersion(Seq(7L).toDF("id"), deep)
    Layout.commitVersion(Seq(8L).toDF("id"), shal)
    assert(rows(Layout.readVersion(spark, deep)) == Seq(1L, 2L, 3L, 7L))
    assert(rows(Layout.readVersion(spark, shal)) == Seq(1L, 2L, 3L, 4L, 5L, 8L))
    assert(rows(Layout.readVersion(spark, src)) == Seq(1L, 2L, 3L, 4L, 5L))

    // source APPENDS don't disturb either clone (new commits = new files)
    Layout.commitVersion(Seq(6L).toDF("id"), src) // v3
    assert(rows(Layout.readVersion(spark, deep)) == Seq(1L, 2L, 3L, 7L))
    assert(rows(Layout.readVersion(spark, shal)) == Seq(1L, 2L, 3L, 4L, 5L, 8L))

    // a clone target with history is refused (never silently merged)
    intercept[IllegalArgumentException] {
      Layout.cloneVersion(spark, src, shal, None, deep = false)
    }
  }

  test("versioned commits: two interleaved committers land N+1 and N+2, nothing dropped") {
    val root = java.nio.file.Files.createTempDirectory("vtab-occ").toString
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"id").as[Long].collect().sorted.toSeq
    assert(Layout.commitVersion(Seq(1L, 2L).toDF("id"), root) === 1L)
    // committer A computes version 2, then — inside its race window,
    // between number computation and the claim — rival B commits and
    // takes v2. A must detect the conflict, re-read B's file list
    // (append semantics compose) and land at v3.
    var rivalVersion = -1L
    val won = new java.util.concurrent.atomic.AtomicBoolean(false)
    val a = Layout.commitVersion(Seq(10L, 11L).toDF("id"), root,
      preClaimHook = { _ =>
        if (won.compareAndSet(false, true)) {
          rivalVersion = Layout.commitVersion(Seq(20L).toDF("id"), root)
        }
      })
    assert(rivalVersion === 2L, "rival must have claimed v2")
    assert(a === 3L, "conflicted committer must retry and land at v3")
    assert(Layout.listVersions(spark, root) === Seq(1L, 2L, 3L))
    // both file sets fully readable — neither commit silently dropped
    assert(rows(Layout.readVersion(spark, root, Some(2L))) === Seq(1L, 2L, 20L))
    assert(rows(Layout.readVersion(spark, root, Some(3L)))
      === Seq(1L, 2L, 10L, 11L, 20L))
  }

  test("zOrderValue matches a bit-by-bit reference interleave") {
    def ref(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 31) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    // fixed edge cases + 200 seeded-random 31-bit pairs (a session is
    // required — Spark 4 function Columns stay unresolved until
    // analysis, so a no-Spark ScalaCheck property cannot eval them)
    val rnd = new scala.util.Random(42)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L),
      (12345L, 67890L), (2147483647L, 2147483647L), (1L << 30, 1L << 30)) ++
      Seq.fill(200)((rnd.nextLong() & 0x7FFFFFFFL, rnd.nextLong() & 0x7FFFFFFFL))
    val df = cases.toDF("a", "b")
      .select($"a", $"b", Layout.zOrderValue($"a", $"b").as("z"))
      .as[(Long, Long, Long)].collect()
    df.foreach { case (a, b, z) => assert(z === ref(a, b), s"interleave($a,$b)") }
    // and the interleave inverts: no information loss on either dim
    df.foreach { case (a, b, z) =>
      def deinterleave(off: Int): Long =
        (0 until 31).map(i => ((z >> (2 * i + off)) & 1L) << i).reduce(_ | _)
      assert(deinterleave(0) == a && deinterleave(1) == b, s"invert($a,$b)")
    }
  }

  test("writeZOrdered clusters BOTH dimensions per file; leading-sort only one") {
    // 4096 points on a 64×64 grid where x and y are independent — a
    // sort by x alone leaves y's per-file span at full range, z-order
    // shrinks both
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val df = (0 until 4096).map { i => (i / 64L, i % 64L) }.toDF("x", "y")
    Layout.writeZOrdered(df, dir, "x", "y", numFiles = 16)
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
      .select($"sx", $"sy").as[(Long, Long)].collect()
    assert(spans.length === 16)
    // 16 files over a 64×64 z-curve -> each file covers a 16×16 block:
    // per-file span ≤ 1/4 of the full 0..63 range on EACH dim (a plain
    // x-sort gives sy = 63 for every file)
    val (avgX, avgY) = (spans.map(_._1).sum / 16.0, spans.map(_._2).sum / 16.0)
    assert(avgX <= 20.0, s"x spans not clustered: avg $avgX")
    assert(avgY <= 20.0, s"y spans not clustered: avg $avgY")
    // content-lossless
    assert(spark.read.parquet(dir).agg(sum($"x" * 64L + $"y")).head.getLong(0)
      === (0L until 4096L).sum)
  }

  test("zOrderValueN: 3-D round-robin matches reference, inverts, n=2 equals zOrderValue") {
    def ref3(a: Long, b: Long, c: Long): Long = {
      var z = 0L
      for (j <- 0 until 21) {
        z |= ((a >> j) & 1L) << (3 * j)
        z |= ((b >> j) & 1L) << (3 * j + 1)
        z |= ((c >> j) & 1L) << (3 * j + 2)
      }
      z
    }
    val rnd = new scala.util.Random(7)
    val m = (1L << 21) - 1
    val cases = Seq((0L, 0L, 0L), (1L, 2L, 4L), (m, m, m), (m, 0L, 1L)) ++
      Seq.fill(200)((rnd.nextLong() & m, rnd.nextLong() & m, rnd.nextLong() & m))
    val got = cases.toDF("a", "b", "c")
      .select($"a", $"b", $"c",
        Layout.zOrderValueN(Seq($"a", $"b", $"c")).as("z"),
        Layout.zOrderValueN(Seq($"a", $"b")).as("z2"),
        Layout.zOrderValue($"a", $"b").as("z2ref"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    got.foreach { case (a, b, c, z, z2, z2ref) =>
      assert(z === ref3(a, b, c), s"interleave3($a,$b,$c)")
      assert(z2 === z2ref, "n=2 must delegate to the 2-D interleave")
      // inverts: no information loss on any of the three dims
      def deinterleave(off: Int): Long =
        (0 until 21).map(j => ((z >> (3 * j + off)) & 1L) << j).reduce(_ | _)
      assert(deinterleave(0) == a && deinterleave(1) == b && deinterleave(2) == c)
    }
  }

  test("writeZOrderedN clusters ALL THREE dimensions per file; leading-sort only one") {
    // 4096 points on a 16×16×16 grid, dims independent — an x-sort
    // leaves y and z spans at full range; 3-D z-order shrinks all three
    val dir = java.nio.file.Files.createTempDirectory("zorder3").toString
    val df = (0 until 4096).map { i => (i / 256L, (i / 16L) % 16L, i % 16L) }
      .toDF("x", "y", "z")
    Layout.writeZOrderedN(df, dir, Seq("x", "y", "z"), numFiles = 64)
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"),
        (max($"z") - min($"z")).as("sz"))
      .select($"sx", $"sy", $"sz").as[(Long, Long, Long)].collect()
    assert(spans.length === 64)
    // 64 files over a 16^3 z-curve -> each file covers a 4×4×4 block:
    // per-file span ≈ 3 of the 0..15 range on EACH dim (an x-sort
    // gives sy = sz = 15 for every file); ≤ 5 allows sampled
    // range-boundary straddle
    val (ax, ay, az) = (spans.map(_._1).sum / 64.0,
      spans.map(_._2).sum / 64.0, spans.map(_._3).sum / 64.0)
    assert(ax <= 5.0, s"x spans not clustered: avg $ax")
    assert(ay <= 5.0, s"y spans not clustered: avg $ay")
    assert(az <= 5.0, s"z spans not clustered: avg $az")
    // content-lossless
    assert(spark.read.parquet(dir).agg(sum($"x" * 256L + $"y" * 16L + $"z"))
      .head.getLong(0) === (0L until 4096L).sum)
  }

  test("eraseKeys rewrites ONLY the files containing the keys") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-erase").toString
    val data = s"$tmp/data"
    // range-partitioned by key: each file holds a known id range
    (1L to 900L).toDF("id").withColumn("payload", concat(lit("p"), $"id"))
      .repartitionByRange(3, $"id").write.parquet(data)
    val before = Layout.fingerprintFiles(spark, data)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(before.size == 3)

    // erase three ids that live in one range file
    val (rewritten, erased) = Layout.eraseKeys(spark, data, "id", Seq(5L, 7L, 9L))
    assert(erased == 3L && rewritten.size == 1)
    val after = Layout.fingerprintFiles(spark, data)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // untouched files byte-identical (same fingerprint), touched changed
    assert(after.keySet == before.keySet)
    (before.keySet - rewritten.head).foreach(f => assert(after(f) == before(f)))
    assert(after(rewritten.head)._1 == before(rewritten.head)._1 - 3)
    // the rows are gone, everything else intact
    val ids = spark.read.parquet(data).select($"id").as[Long].collect().toSet
    assert(!ids.exists(Set(5L, 7L, 9L)) && ids.size == 897)
    // erasing absent keys is a no-op
    assert(Layout.eraseKeys(spark, data, "id", Seq(99999L)) == ((Seq(), 0L)))
  }

  test("manifest audit: ok / modified / missing / unexpected all detected") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-manifest").toString
    val (data, man) = (s"$tmp/data", s"$tmp/manifest")
    (1L to 100L).toDF("v").repartition(3).write.parquet(data)
    Layout.writeManifest(spark, data, man)
    // pristine: everything ok
    val s0 = Layout.verifyManifest(spark, data, man)
      .select($"status").as[String].collect()
    assert(s0.length == 3 && s0.forall(_ == "ok"))
    // tamper: delete one file, modify another (rewrite with other rows),
    // drop an unexpected one in
    val files = new java.io.File(data).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length == 3)
    files(0).delete()
    Seq(999L).toDF("v").coalesce(1).write.mode("overwrite")
      .parquet(s"$tmp/stage")
    val staged = new java.io.File(s"$tmp/stage").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(staged.toPath, files(1).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    java.nio.file.Files.copy(staged.toPath,
      java.nio.file.Paths.get(s"$data/extra.parquet"))
    // Hadoop's LOCAL fs keeps .crc sidecars; out-of-band tampering
    // leaves them stale and the read fails on the sidecar instead of
    // reaching the audit (object stores have no such sidecar) — drop them
    new java.io.File(data).listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    val got = Layout.verifyManifest(spark, data, man)
      .select($"file_name", $"status").as[(String, String)].collect().toMap
    assert(got(files(0).getName) == "missing")
    assert(got(files(1).getName) == "modified")
    assert(got("extra.parquet") == "unexpected")
    assert(got.values.count(_ == "ok") == 1)
  }

  test("Ingest ledger: each landed file processed exactly once; idempotent rerun") {
    import graft.sources.Ingest
    val tmp = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val (data, ledger) = (s"$tmp/landing", s"$tmp/ledger")

    // land two files
    Seq(1L, 2L).toDF("v").coalesce(1).write.parquet(s"$data/b0")
    new java.io.File(s"$data/b0").listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$data/f1.parquet")))
    Seq(3L).toDF("v").coalesce(1).write.parquet(s"$data/b1")
    new java.io.File(s"$data/b1").listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$data/f2.parquet")))

    // run 1: both files pending, processed, committed
    val Some((df1, names1)) = Ingest.readPendingRows(spark, data, ledger)
    assert(names1 == Seq("f1.parquet", "f2.parquet"))
    assert(df1.as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    Ingest.commit(spark, ledger, names1)

    // run 2: nothing new -> no job at all
    assert(Ingest.readPendingRows(spark, data, ledger).isEmpty)

    // a third file lands: ONLY it is pending
    Seq(9L).toDF("v").coalesce(1).write.parquet(s"$data/b2")
    new java.io.File(s"$data/b2").listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$data/f3.parquet")))
    val Some((df3, names3)) = Ingest.readPendingRows(spark, data, ledger)
    assert(names3 == Seq("f3.parquet"))
    assert(df3.as[Long].collect().toSeq == Seq(9L))
    Ingest.commit(spark, ledger, names3)
    assert(Ingest.ledger(spark, ledger) ==
      Seq("f1.parquet", "f2.parquet", "f3.parquet"))
  }

  test("maintainClustered crash windows: rename is the commit point, no row read twice") {
    val root = java.nio.file.Files.createTempDirectory("crash-cluster").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mk(lo: Int, hi: Int) = (lo until hi).map { i =>
      val j = (i * 2654435761L) % 4096
      (i.toLong, (j / 256) % 16, (j / 16) % 16, j % 16)
    }.toDF("id", "x", "y", "z").repartition(2)
    def all(): Seq[Long] = {
      spark.catalog.refreshByPath(root)
      Layout.readClustered(spark, root).select($"id").as[Long]
        .collect().sorted.toSeq
    }

    // window A: crash BEFORE the rename — the staging dir exists with a
    // fully written clustered copy of the delta, but was never committed
    Layout.appendDelta(mk(0, 100), root)
    val tmp = new org.apache.hadoop.fs.Path(root, "base/_tmp_gen_dead")
    Layout.writeHilbert(mk(0, 100), tmp.toString, Seq("x", "y", "z"), 2)
    val os = fs.create(new org.apache.hadoop.fs.Path(tmp, "_consumed.txt"), false)
    try os.write("ignored".getBytes("UTF-8")) finally os.close()
    // the uncommitted staging copy is invisible: each row exactly once
    assert(all() == (0L until 100L).toSeq)
    // the next cycle garbage-collects it and commits the real generation
    assert(Layout.maintainClustered(spark, root, Seq("x", "y", "z"),
      numFiles = 2, minDeltaFiles = 1))
    assert(all() == (0L until 100L).toSeq)
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(root, "base"))
      .exists(_.getPath.getName.startsWith("_tmp_gen_")))

    // window B: crash AFTER the rename, BEFORE the delta delete —
    // simulate by snapshotting the delta files and restoring them after
    // a successful maintenance (as if the delete never ran)
    Layout.appendDelta(mk(100, 200), root)
    val deltaDir = new org.apache.hadoop.fs.Path(root, "delta")
    val saved = java.nio.file.Files.createTempDirectory("delta-save").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val deltaFiles = fs.listStatus(deltaDir)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet")).toSeq
    deltaFiles.foreach(f => org.apache.hadoop.fs.FileUtil.copy(fs, f.getPath,
      fs, new org.apache.hadoop.fs.Path(saved, f.getPath.getName), false, conf))
    assert(Layout.maintainClustered(spark, root, Seq("x", "y", "z"),
      numFiles = 2, minDeltaFiles = 1))
    deltaFiles.foreach(f => org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(saved, f.getPath.getName),
      fs, f.getPath, false, conf))
    // even BEFORE any sweep runs, reads skip the ledger-consumed copies
    assert(all() == (0L until 200L).toSeq,
      "a crash between generation commit and delta delete must not double-count")
    // the next cycle's stale sweep reclaims them (below threshold: no new gen)
    assert(!Layout.maintainClustered(spark, root, Seq("x", "y", "z"),
      numFiles = 2, minDeltaFiles = 99))
    assert(!fs.listStatus(deltaDir).exists(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet")))
    assert(all() == (0L until 200L).toSeq)
  }
}
