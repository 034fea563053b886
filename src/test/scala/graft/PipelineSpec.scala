package graft
// round-5 additions: snapshotDiff + qualityGate specs below

import graft.operators.Pipeline
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces every pattern match and counts them") {
    val df = Seq(
      (1L, "mail a@b.com and c.d+x@e.org, call +1-555-0199"),
      (2L, "no pii here"),
      (3L, "+1-555-0000 +1-555-1111")).toDF("id", "text")
    val out = Pipeline.redactPii(df, "text", Seq(
        "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
        "phone" -> "\\+1-555-[0-9]{4}"))
      .select($"id", $"n_email", $"n_phone", $"redacted")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 2, 1, "mail <EMAIL> and <EMAIL>, call <PHONE>")))
    assert(out(1) == ((2L, 0, 0, "no pii here")))
    assert(out(2) == ((3L, 0, 2, "<PHONE> <PHONE>")))
  }

  test("repetitionStats flags repetitive docs only") {
    val df = Seq(
      (1L, "a a a a a a a a a b"),       // dup_frac 0.8, top 0.9 -> flagged
      (2L, "one two three four five")).toDF("doc_id", "text") // all distinct
    val out = Pipeline.repetitionStats(df, 0.5, 0.5)
      .as[(Long, Long, Double, Double, Int)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 10L, 0.8, 0.9, 1)))
    assert(out(1) == ((2L, 5L, 0.0, 0.2, 0)))
  }

  test("packSequences chops per-shard cumulative tokens into budgeted bins") {
    // shard A: docs of 3,3,3 tokens, budget 5 -> start offsets 0,3,6 -> seqs 0,0,1
    val df = Seq(
      ("A", 1L, "x x x"), ("A", 2L, "y y y"), ("A", 3L, "z z z"),
      ("B", 4L, "w w w w w w")).toDF("source", "doc_id", "text")
    val out = Pipeline.packSequences(df, budget = 5)
      .select($"shard", $"doc_id", $"seq_id")
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(out.toSeq == Seq(("A", 1L, 0L), ("A", 2L, 0L), ("A", 3L, 1L), ("B", 4L, 0L)))
  }

  test("contamination finds train docs sharing an n-gram with the eval set") {
    val ev = Seq((100L, "alpha beta gamma delta end")).toDF("doc_id", "text")
    val tr = Seq(
      (1L, "xx alpha beta gamma delta end"), // shares 2 distinct 4-grams
      (2L, "alpha beta zz gamma delta"),     // no shared 4-gram
      (3L, "short")).toDF("doc_id", "text")  // < n tokens: no grams, no crash
    val out = Pipeline.contamination(tr, ev, n = 4)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L))
  }

  test("WordNGrams matches the split/slice/concat_ws HOF formulation") {
    import graft.functions.WordNGrams
    val docs = Seq("a b c d", "a a a", "x", "", "a  b c", "one two one two one")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3)) {
      val hof = docs.select($"doc_id", array_distinct(transform(
          when(size(split($"text", " ")) >= n,
            sequence(lit(1), size(split($"text", " ")) - (n - 1)))
            .otherwise(array().cast("array<int>")),
          i => concat_ws(" ", slice(split($"text", " "), i, lit(n))))).as("ts"))
        .as[(Long, Seq[String])].collect().toMap
      val native = docs.select($"doc_id", WordNGrams($"text", n).as("ts"))
        .as[(Long, Seq[String])].collect().toMap
      assert(native == hof, s"n=$n")
    }
  }

  test("stratifiedSample applies per-stratum cutoffs in one pass") {
    val df = (0L until 1000L).map(i => (if (i % 2 == 0) "en" else "de", i))
      .toDF("lang", "doc_id")
    val out = Pipeline.stratifiedSample(df, "lang", $"doc_id",
        cutoffs = Map("en" -> "10"), defaultCutoff = "80")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, enTotal, enSampled, _, enRate) = out("en")
    val (_, deTotal, deSampled, _, deRate) = out("de")
    assert(enTotal == 500 && deTotal == 500)
    // '10'/'80' hex prefixes ~ 6%/50% expected rates
    assert(enSampled > 0 && enSampled < deSampled)
    assert(enRate == enSampled.toDouble / 500 && deRate == deSampled.toDouble / 500)
    // deterministic: rerun yields identical counts
    val again = Pipeline.stratifiedSample(df, "lang", $"doc_id",
        cutoffs = Map("en" -> "10"), defaultCutoff = "80")
      .as[(String, Long, Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(again == Map("en" -> enSampled, "de" -> deSampled))
  }

  test("weightedSample: deterministic, weight-biased, excludes w<=0") {
    // half the keys carry 100x the weight — they must dominate the sample
    val df = (0L until 2000L).map(i => (i, if (i < 1000) 100.0 else 1.0))
      .toDF("id", "wt")
    val sample = Pipeline.weightedSample(df, $"id", $"wt", n = 100)
      .as[(Long, Double, Double)].collect()
    assert(sample.length === 100)
    val heavy = sample.count(_._1 < 1000)
    assert(heavy > 80, s"heavy=$heavy of 100")
    // repeatable draw
    val again = Pipeline.weightedSample(df, $"id", $"wt", n = 100)
      .as[(Long, Double, Double)].collect()
    assert(sample.map(_._1).toSeq === again.map(_._1).toSeq)
    // zero/negative weights never sampled
    val withZero = Pipeline.weightedSample(
      df.withColumn("wt", when($"id" >= 10, lit(0.0)).otherwise($"wt")),
      $"id", $"wt", n = 100).as[(Long, Double, Double)].collect()
    assert(withZero.forall(_._1 < 10) && withZero.length === 10)
  }

  test("quotaSample keeps exactly min(quota, n) per stratum, deterministically") {
    val df = (0L until 300L).map(i => (i, s"s${i % 3}")).toDF("id", "stratum")
    val out = Pipeline.quotaSample(df, "stratum",
      Map("s0" -> 7L, "s1" -> 250L, "s2" -> 0L), col("id"))
    val byStratum = out.groupBy("stratum").count().as[(String, Long)]
      .collect().toMap
    // s0: quota 7 of 100; s1: quota 250 > n=100 keeps all; s2: quota 0
    assert(byStratum == Map("s0" -> 7L, "s1" -> 100L))
    // monotone: a larger quota keeps a superset (same hash order)
    val small = Pipeline.quotaSample(df, "stratum", Map("s0" -> 3L), col("id"))
      .select("id").as[Long].collect().toSet
    val large = Pipeline.quotaSample(df, "stratum", Map("s0" -> 7L), col("id"))
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(large) && small.size == 3 && large.size == 7)
    // matches the brute-force rank-by-hash definition
    val brute = df.withColumn("h", md5(concat_ws("", lit("graft:"), col("id"))))
      .filter($"stratum" === "s0").orderBy($"h").limit(7)
      .select("id").as[Long].collect().toSet
    assert(large == brute)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val a = Seq((1L, "same"), (2L, "old text"), (3L, "gone")).toDF("doc_id", "text")
    val b = Seq((1L, "same"), (2L, "new text"), (4L, "fresh")).toDF("doc_id", "text")
    val got = Pipeline.snapshotDiff(a, b)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("qualityGate: per-rule verdicts and composite keep") {
    val docs = Seq(
      (1L, "the cat sat on a mat and it is fine today"),  // passes all
      (2L, "tiny"),                                        // fails min tokens
      (3L, "the !!! of ??? and ### is %%% a ,,, the cat") // fails punct
    ).toDF("doc_id", "text")
    val g = Pipeline.qualityGate(docs, minTokens = 5.0, maxPunctRatio = 0.1,
        minStopRatio = 0.01)
      .select($"doc_id", $"r_tokens", $"r_punct", $"keep")
      .as[(Long, Boolean, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(g(1L)._4, "doc 1 must pass")
    assert(!g(2L)._2 && !g(2L)._4, "doc 2 fails token floor")
    assert(!g(3L)._3 && !g(3L)._4, "doc 3 fails punct ratio")
  }

  test("vocabulary: top-k tokens per group via the TopK operator") {
    val docs = Seq(
      ("en", "a a a b b c"),
      ("en", "b d"),
      ("fr", "x y x")).toDF("lang", "text")
    val v = operators.TextAnalysis.vocabulary(docs, k = 2)
      .as[(String, String, Long)].collect().toSet
    assert(v == Set(("en", "a", 3L), ("en", "b", 3L), ("fr", "x", 2L), ("fr", "y", 1L)))
  }

  test("shuffleShard: complete, balanced-by-hash, dense positions, reproducible") {
    val df = spark.range(200).toDF("doc_id")
    val a = Pipeline.shuffleShard(df, $"doc_id", numShards = 4)
      .select($"doc_id", $"shard", $"pos")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.length == 200, "no rows gained or lost")
    assert(a.forall(r => r._2 >= 0 && r._2 < 4), "shard in range")
    // positions are dense 1..n within each shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // reproducible and independent of input partitioning
    val b = Pipeline.shuffleShard(df.repartition(7), $"doc_id", numShards = 4)
      .select($"doc_id", $"shard", $"pos")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("applyChangelog: upserts replace/insert, deletes remove, rest untouched") {
    val snap = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("doc_id", "text")
    val log = Seq(
      (2L, "upsert", "TWO"),   // update
      (4L, "upsert", "four"),  // insert
      (3L, "delete", null.asInstanceOf[String])).toDF("doc_id", "op", "text")
    val out = Pipeline.applyChangelog(snap, log)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "one"), (2L, "TWO"), (4L, "four")))
  }

  test("applyChangelog rejects unknown ops loudly (no silent delete)") {
    val snap = Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text")
    val bad = Seq((2L, "update", "TWO")).toDF("doc_id", "op", "text")
    val e = intercept[Throwable] {
      Pipeline.applyChangelog(snap, bad).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(e).exists(t => Option(t.getMessage).exists(_.contains("unknown op"))),
      e.toString)
  }

  test("applyChangelog roundtrip: diff(a,b) applied to a reproduces b") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "text")
    val b = Seq((2L, "y"), (3L, "Z2"), (9L, "new")).toDF("doc_id", "text")
    val diff = Pipeline.snapshotDiff(a, b).filter($"status" =!= "unchanged")
    val log = diff.join(b, Seq("doc_id"), "left")
      .select($"doc_id",
        when($"status" === "removed", lit("delete")).otherwise(lit("upsert")).as("op"),
        $"text")
    val merged = Pipeline.applyChangelog(a, log)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(merged.toSeq == Seq((2L, "y"), (3L, "Z2"), (9L, "new")))
  }

  test("scd2: equal runs collapse, re-emergence reopens, null transitions open versions") {
    val log = Seq(
      // key 1: A A B A -> versions A[10,30) B[30,40) A[40,null)
      (1L, Option("A"), 10L, 1L), (1L, Option("A"), 20L, 2L),
      (1L, Option("B"), 30L, 3L), (1L, Option("A"), 40L, 4L),
      // key 2: A null null A -> null transitions are versions too
      (2L, Option("A"), 10L, 5L), (2L, None, 20L, 6L),
      (2L, None, 30L, 7L), (2L, Option("A"), 40L, 8L)
    ).toDF("k", "v", "ts", "id")
    val out = Pipeline.scd2(log, Seq("k"), Seq("v"), "ts", "id")
      .select($"k", $"v", $"version", $"effective_from", $"effective_to", $"is_current")
      .as[(Long, Option[String], Int, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(out == Seq(
      (1L, Some("A"), 1, 10L, Some(30L), false),
      (1L, Some("B"), 2, 30L, Some(40L), false),
      (1L, Some("A"), 3, 40L, None, true),
      (2L, Some("A"), 1, 10L, Some(20L), false),
      (2L, None, 2, 20L, Some(40L), false),
      (2L, Some("A"), 3, 40L, None, true)))
  }

  test("ewma: exact recursive fold in order, input-order independent") {
    val rows = Seq((1L, 3L, 0L, 4.0), (1L, 1L, 0L, 8.0), (1L, 2L, 0L, 0.0),
      (2L, 1L, 0L, 5.0))
    // shuffled input: fold must follow (ts, tie), not arrival order
    val out = Pipeline.ewma(rows.toDF("k", "ts", "tie", "v"),
        Seq("k"), Seq("ts", "tie"), "v", alpha = 0.25)
      .select($"k", $"n_obs", $"last_value", $"ewma")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    // k=1 ordered values: 8, 0, 4 -> s1=8, s2=.25*0+.75*8=6, s3=.25*4+.75*6=5.5
    assert(out == Seq((1L, 3L, 4.0, 5.5), (2L, 1L, 5.0, 5.0)))
  }

  test("skyline2d: frontier only, duplicate keeps first tie, matches brute force") {
    val data = Seq(
      (1L, 10.0, 100L), (2L, 20.0, 50L), (3L, 30.0, 10L), // frontier staircase
      (4L, 25.0, 60L),  // dominated by 2 (cheaper and earlier)
      (5L, 10.0, 100L), // exact duplicate of 1 -> only id 1 kept
      (6L, 5.0, 200L),  // new cheapest -> frontier
      (7L, 30.0, 10L)   // duplicate of 3 -> only id 3 kept
    )
    val out = Pipeline.skyline2d(data.toDF("id", "x", "y"), "x", "y", "id",
        xLo = 0.0, xHi = 32.0, nBuckets = 4)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 2L, 3L, 6L))
    // brute-force cross check: dominated iff a lex-smaller row has y <= theirs
    val lex = data.sortBy(r => (r._2, r._3, r._1))
    val keep = lex.zipWithIndex.collect { case ((id, _, y), i)
      if !lex.take(i).exists(_._3 <= y) => id }.sorted
    assert(out == keep)
  }

  test("histogram: equi-width buckets, edge clamping, null filter, empty buckets absent") {
    val df = Seq[Option[Double]](Some(-1.0), Some(0.0), Some(1.5), Some(9.99),
      Some(10.0), Some(25.0), None).toDF("v")
    val out = Pipeline.histogram(df, "v", lo = 0.0, hi = 10.0, nBuckets = 5)
      .select($"bucket", $"bucket_lo", $"bucket_hi", $"n", $"sum_value")
      .as[(Long, Double, Double, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (0L, 0.0, 2.0, 3L, 0.5),     // -1 clamps up; 0 and 1.5 are in range
      (4L, 8.0, 10.0, 3L, 44.99))) // 9.99 in range; 10 and 25 clamp down
  }

  test("scd2 invariants hold on random logs: partition of the timeline, alternation") {
    val rnd = new scala.util.Random(77)
    val log = (1L to 400L).map { id =>
      (rnd.nextInt(8).toLong, s"v${rnd.nextInt(3)}", rnd.nextInt(1000).toLong, id)
    }
    val out = Pipeline.scd2(log.toDF("k", "v", "ts", "id"),
        Seq("k"), Seq("v"), "ts", "id")
      .select($"k", $"v", $"version", $"effective_from", $"effective_to")
      .as[(Long, String, Int, Long, Option[Long])]
      .collect().groupBy(_._1).view.mapValues(_.sortBy(_._3).toSeq)
    out.foreach { case (k, vs) =>
      // versions are 1..n dense
      assert(vs.map(_._3) == (1 to vs.size), s"key $k versions not dense")
      // exactly the last version is open; ranges are contiguous and ordered
      vs.init.foreach(v => assert(v._5.nonEmpty, s"key $k non-final open version"))
      assert(vs.last._5.isEmpty, s"key $k final version not open")
      vs.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._5.contains(b._4), s"key $k ranges not contiguous")
          assert(a._2 != b._2, s"key $k equal consecutive values not collapsed")
        case _ => ()
      }
    }
  }

  test("profile: one row per column with exact null/distinct/min/max") {
    val df = Seq(
      (Some(1L), Some("b")), (Some(2L), None),
      (Some(2L), Some("a")), (None, Some("a"))).toDF("id", "s")
    val out = Pipeline.profile(df, Seq("id", "s"))
      .as[(String, Long, Long, Long, String, String)].collect().sortBy(_._1)
    assert(out(0) == (("id", 4L, 1L, 2L, "1", "2")))
    assert(out(1) == (("s", 4L, 1L, 2L, "a", "b")))
  }

  test("temperatureMixSample: low-resource sources upweighted, deterministic") {
    // source A: 900 rows, B: 90, C: 10 — α=0.5 flattens the mix
    val df = ((0 until 900).map(i => ("A", i.toLong)) ++
      (900 until 990).map(i => ("B", i.toLong)) ++
      (990 until 1000).map(i => ("C", i.toLong))).toDF("source", "doc_id")
    def sampleStats(d: org.apache.spark.sql.DataFrame) =
      Pipeline.temperatureMixSample(d, "source", $"doc_id", targetFrac = 0.1)
        .groupBy($"source")
        .agg(first($"n_total").as("n_total"), first($"rate").as("rate"),
          sum($"keep".cast("long")).as("n_sampled"))
        .as[(String, Long, Double, Long)].collect().sortBy(_._1).toSeq
    // row-level contract: every input row comes back with its verdict
    val rows = Pipeline.temperatureMixSample(df, "source", $"doc_id", targetFrac = 0.1)
    assert(rows.count() == 1000)
    assert(rows.columns.toSet ==
      Set("source", "doc_id", "n_total", "rate", "keep"))
    val out = sampleStats(df)
    val bySrc = out.map(r => r._1 -> r).toMap
    // inclusion rates strictly favor the smaller sources
    assert(bySrc("C")._3 > bySrc("B")._3 && bySrc("B")._3 > bySrc("A")._3)
    assert(out.forall(r => r._3 <= 1.0 && r._3 > 0.0))
    // expected-count identity: Σ n_s · r_s = targetFrac · N when no rate
    // clamps at 1.0 (C's, the largest: 0.1·1000·√10/denom/10 ≈ 0.74)
    val expected = out.map(r => r._2 * r._3).sum
    assert(math.abs(expected - 100.0) < 1e-9, s"expected draws $expected")
    // deterministic under repartitioning
    assert(out == sampleStats(df.repartition(13)))
  }

  test("refreshAggState: batch folds reach the direct-aggregate fixed point") {
    val rows = (0 until 90).map(i => (i % 7L, i.toLong)).toDF("k", "x")
    // fold in three arbitrary batches
    val state = (0 until 3).foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
      (st, i) => Some(Pipeline.refreshAggState(st,
        rows.filter($"x" % 3 === i), keyCols = Seq("k"), sumCols = Seq("x")))
    }.get
    val folded = state.select($"k", $"n", $"sum_x")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val direct = rows.groupBy($"k").agg(count(lit(1)).as("n"), sum($"x").as("s"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(folded == direct)
    // an empty batch is a no-op on the state
    val after = Pipeline.refreshAggState(Some(state), rows.filter(lit(false)),
        keyCols = Seq("k"), sumCols = Seq("x"))
      .select($"k", $"n", $"sum_x").as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(after == folded)
  }

  test("leakageSafeSplit: clusters never straddle splits; singletons covered") {
    val docs = (0L until 100L).toDF("doc_id")
    // clusters: {0,1,2}, {10,11}, rest singletons
    val clus = Seq((0L, 0L), (1L, 0L), (2L, 0L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val out = Pipeline.leakageSafeSplit(docs, clus,
        Seq(("train", "8"), ("val", "c"), ("test", "g")))
      .select($"doc_id", $"cluster_id", $"split")
      .as[(Long, Long, String)].collect()
    assert(out.length == 100, "every document is assigned")
    val byDoc = out.map(r => r._1 -> r._3).toMap
    // the leakage property: same cluster -> same split
    assert(byDoc(0L) == byDoc(1L) && byDoc(1L) == byDoc(2L))
    assert(byDoc(10L) == byDoc(11L))
    // singletons cluster to themselves
    assert(out.filter(_._1 >= 50L).forall(r => r._2 == r._1))
    // all three splits are populated and the cutoffs roughly partition
    val counts = out.groupBy(_._3).view.mapValues(_.size).toMap
    assert(counts.keySet == Set("train", "val", "test"), counts.toString)
    assert(counts("train") > counts("test"), counts.toString)
  }

  test("compactLog keeps the latest record per key, with the tombstone contract") {
    // key A: v1 < v2 (winner v2); key B: winner is a tombstone -> gone;
    // key C: tombstone SUPERSEDED by a later record -> present (Kafka:
    // only the winning tombstone deletes)
    val log = Seq(
      ("A", 1L, 10L, "a1", false), ("A", 2L, 11L, "a2", false),
      ("B", 1L, 20L, "b1", false), ("B", 2L, 21L, "b2", true),
      ("C", 1L, 30L, "c1", true), ("C", 2L, 31L, "c2", false))
      .toDF("k", "ver", "id", "payload", "tomb")
    val out = Pipeline.compactLog(log, Seq("k"), Seq("ver", "id"),
        Seq("payload"), tombstone = Some($"tomb"))
      .select($"k", $"ver", $"id", $"payload", $"n_versions")
      .as[(String, Long, Long, String, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("A", 2L, 11L, "a2", 2L), ("C", 2L, 31L, "c2", 2L)))
    // without a tombstone predicate B survives with its latest payload
    val all = Pipeline.compactLog(log, Seq("k"), Seq("ver", "id"), Seq("payload"))
      .select($"k", $"payload").as[(String, String)].collect().sortBy(_._1)
    assert(all.toSeq == Seq(("A", "a2"), ("B", "b2"), ("C", "c2")))
    // order ties broken by the unique id: same ver, higher id wins
    val tied = Seq(("T", 1L, 1L, "lo"), ("T", 1L, 2L, "hi"))
      .toDF("k", "ver", "id", "payload")
    val w = Pipeline.compactLog(tied, Seq("k"), Seq("ver", "id"), Seq("payload"))
      .select($"payload").as[String].collect()
    assert(w.toSeq == Seq("hi"))
  }

  test("mergeCompacted is a monoid merge: incremental equals global") {
    val log = Seq(
      ("A", 1L, 10L, "a1"), ("A", 3L, 12L, "a3"), ("A", 2L, 11L, "a2"),
      ("B", 1L, 20L, "b1"), ("C", 5L, 30L, "c5"))
      .toDF("k", "ver", "id", "payload")
    val (keys, ord, pay) = (Seq("k"), Seq("ver", "id"), Seq("payload"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"k", $"ver", $"id", $"payload", $"n_versions")
        .as[(String, Long, Long, String, Long)].collect().sortBy(_._1).toSeq
    val global = canon(Pipeline.compactLog(log, keys, ord, pay))
    // split the log arbitrarily, compact each half, merge — same result
    val h1 = Pipeline.compactLog(log.filter($"id" % 2 === 0), keys, ord, pay)
    val h2 = Pipeline.compactLog(log.filter($"id" % 2 =!= 0), keys, ord, pay)
    assert(canon(Pipeline.mergeCompacted(h1, h2, keys, ord, pay)) == global)
    // commutes
    assert(canon(Pipeline.mergeCompacted(h2, h1, keys, ord, pay)) == global)
  }

  test("chunkDocuments: stride/window/tail semantics and reassembly") {
    // 10 tokens, window 4, stride 3 -> starts 0,3,6,9; last chunk length 1
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2L, "a b"))
      .toDF("doc_id", "text")
    val out = Pipeline.chunkDocuments(docs, window = 4, stride = 3)
      .select($"doc_id", $"chunk_id", $"start_tok", $"n_tok", $"chunk_text")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(c => (c._2, c._3, c._4)).toSeq ==
      Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L), (3L, 9L, 1L)))
    assert(d1.map(_._5).toSeq ==
      Seq("t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9", "t9"))
    // every token appears in ceil(window/stride) = 2 chunks except the
    // stride-boundary residue — just assert full coverage here
    val covered = d1.flatMap(_._5.split(" ")).toSet
    assert(covered == (0 until 10).map(i => s"t$i").toSet)
    // short doc: one chunk, whole text
    assert(out.filter(_._1 == 2L).map(c => (c._2, c._4, c._5)).toSeq ==
      Seq((0L, 2L, "a b")))
  }

  test("expectations: per-rule flags, null counts as violation, report adds up") {
    val df = Seq[(java.lang.Long, String)](
      (5L, "ok"), (500L, "ok"), (null, "ok"), (7L, "bad"))
      .toDF("qty", "status")
    val rules = Seq(
      "qty_small" -> ($"qty" < 100L),
      "status_ok" -> ($"status" === "ok"))
    val flagged = Pipeline.expectations(df, rules)
      .select($"qty", $"ok_qty_small", $"ok_status_ok", $"quarantined")
      .as[(Option[Long], Boolean, Boolean, Boolean)].collect()
    // null qty -> rule fails (contracts are assertions)
    assert(flagged.find(_._1.isEmpty).get._2 == false)
    assert(flagged.count(_._4) == 3) // 500 fails qty, null fails qty, 7 fails status
    val rep = Pipeline.expectationReport(df, rules)
      .as[(Long, Long, Long, Long)].collect().head
    assert(rep == ((4L, 3L, 2L, 1L)))
  }

  test("canonicalizeUrl: fragments, utm params, separators, case, trailing slash") {
    val cases = Seq(
      // utm-only query collapses entirely, dangling ? stripped
      ("https://Ex.COM/a?utm_source=x", "https://ex.com/a"),
      // utm first, real param second: separator healed
      ("https://ex.com/a?utm_a=1&id=3", "https://ex.com/a?id=3"),
      // real param first, trailing utm takes its separator
      ("https://ex.com/a?id=3&utm_a=1", "https://ex.com/a?id=3"),
      // consecutive utms between real params
      ("https://ex.com/a?id=1&utm_a=1&utm_b=2&z=9", "https://ex.com/a?id=1&z=9"),
      // fragment stripped, host lowercased, PATH case preserved
      ("HTTPS://EX.com/CaSe#frag", "https://ex.com/CaSe"),
      // trailing slash off, bare host unchanged
      ("https://ex.com/p/", "https://ex.com/p"),
      ("https://ex.com", "https://ex.com"))
    val out = cases.map(_._1).toDF("u")
      .select(Pipeline.canonicalizeUrl($"u")).as[String].collect()
    assert(out.toSeq == cases.map(_._2))
  }

  test("distinctSketch: merged per-group sketches equal the global estimate, near exact") {
    val df = (1L to 20000L).map(i => (s"g${i % 4}", i % 3000)).toDF("g", "v")
    val perGroup = Pipeline.distinctSketch(df, "g", "v")
    assert(perGroup.count() == 4)
    // merge-of-parts == sketch-of-whole (the mergeability contract)
    val merged = Pipeline.mergeDistinctSketches(perGroup)
      .as[Long].collect().head
    val whole = df.agg(hll_sketch_estimate(hll_sketch_agg($"v", lit(12))))
      .as[Long].collect().head
    assert(merged == whole)
    // and the estimate is within 5% of the exact distinct count
    val exact = 3000.0
    assert(math.abs(merged - exact) / exact < 0.05, s"estimate $merged vs $exact")
  }

  test("slidingDistinct: exact trailing-window distincts; HLL twin within bound") {
    // uneven day traffic, repeating users, a day-range GAP (days 7..9
    // missing — no output rows for absent days, and day 10's window
    // must look back ACROSS the gap), and null users (dropped)
    val rows = (for { d <- 0 to 20; u <- 0 until (d % 5) * 10 + 5 }
      yield (d.toLong, s"u${(u * 7 + d) % 37}"))
      .filterNot(r => r._1 >= 7 && r._1 <= 9)
    val df = (rows.map { case (d, u) => (d, Option(u)) } ++
      Seq((3L, Option.empty[String]))).toDF("day", "uid").repartition(8)
    val got = Pipeline.slidingDistinct(df, "day", "uid", windowDays = 7)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val presentDays = rows.map(_._1).distinct.sorted
    assert(got.keySet == presentDays.toSet) // gap days emit nothing
    for (d <- presentDays) {
      val n1 = rows.filter(_._1 == d).map(_._2).distinct.size.toLong
      val nw = rows.filter(r => r._1 >= d - 6 && r._1 <= d)
        .map(_._2).distinct.size.toLong
      assert(got(d) == ((n1, nw)), s"day $d: ${got(d)} vs ($n1, $nw)")
    }
    // the sketch twin tracks the exact counts within HLL error
    val est = Pipeline.slidingDistinctSketch(df, "day", "uid", windowDays = 7)
      .as[(Long, Long)].collect().toMap
    assert(est.keySet == presentDays.toSet)
    for (d <- presentDays) {
      val exact = got(d)._2.toDouble
      assert(math.abs(est(d) - exact) / exact < 0.05, s"day $d: ${est(d)} vs $exact")
    }
  }

  test("kFoldSplit: clusters never span folds; all docs assigned; deterministic") {
    // 30 clusters of varying size (incl. singletons without assignment)
    val docs = (1L to 100L).toDF("doc_id")
    val clus = (1L to 80L).map(i => (i, s"c${i % 30}")).toDF("doc_id", "cluster_id")
    val out = Pipeline.kFoldSplit(docs, clus, k = 4)
      .as[(Long, String, Long)].collect()
    assert(out.length == 100)
    assert(out.map(_._3).toSet.subsetOf((0L until 4L).toSet))
    // the leakage property: each cluster maps to exactly ONE fold
    out.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.map(_._3).distinct.length == 1, s"cluster $c spans folds")
    }
    // docs 81..100 have no assignment: their own cluster, still assigned
    assert(out.filter(_._1 > 80L).forall(r => r._2 == r._1.toString))
    // deterministic: a recompute gives the identical assignment
    val again = Pipeline.kFoldSplit(docs, clus, k = 4)
      .as[(Long, String, Long)].collect()
    assert(again.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
    // folds are hash-uniform-ish: every fold non-empty at this size
    assert(out.map(_._3).distinct.length == 4)
  }

  test("ksDrift: driver-exact two-sample KS; identical 0, disjoint 1, ties handled") {
    val rnd = new scala.util.Random(31)
    val xs = Seq.fill(300)(math.floor(rnd.nextDouble() * 40)) // heavy ties
    val ys = Seq.fill(200)(math.floor(rnd.nextDouble() * 40) + 8.0)
    def ks(a: Seq[Double], b: Seq[Double]): (Long, Long, Double) = {
      val got = Pipeline.ksDrift(a.toDF("v"), b.toDF("v"), "v")
        .as[(Long, Long, Double)].collect().head
      got
    }
    val got = ks(xs, ys)
    // driver brute force with the SAME ops: ECDF after each tie group
    val vals = (xs ++ ys).distinct.sorted
    val (na, nb) = (xs.size.toDouble, ys.size.toDouble)
    val expect = vals.map { v =>
      math.abs(xs.count(_ <= v) / na - ys.count(_ <= v) / nb) }.max
    assert(got == ((xs.size.toLong, ys.size.toLong, expect)))
    // identical samples: exactly zero; disjoint supports: exactly one
    assert(ks(xs, xs)._3 == 0.0)
    assert(ks(Seq(1.0, 2.0, 2.0), Seq(9.0, 10.0))._3 == 1.0)
  }

  test("madOutliers: driver-exact; median/MAD immune to poison a z-score monitor isn't") {
    val rnd = new scala.util.Random(17)
    val clean = (1 to 401).map(_ => ("a", 100.0 + rnd.nextDouble() * 10))
    val poisoned = (1 to 301).map(_ => ("b", 50.0 + rnd.nextDouble() * 4)) ++
      Seq(("b", 1e12), ("b", -1e12), ("b", 1e12))
    val df = (clean ++ poisoned).toDF("k", "v").repartition(8)
    val got = Pipeline.madOutliers(df, "k", "v", k = 5.0)
      .as[(String, Double, Double, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    def q50(xs: IndexedSeq[Double]) = {
      val pos = 0.5 * (xs.size - 1)
      val (lo, hi) = (xs(math.floor(pos).toInt), xs(math.ceil(pos).toInt))
      lo + (hi - lo) * (pos - math.floor(pos))
    }
    def brute(rows: Seq[Double]) = {
      val m = q50(rows.sorted.toIndexedSeq)
      val mad = q50(rows.map(x => math.abs(x - m)).sorted.toIndexedSeq)
      (m, mad, rows.size.toLong,
        rows.count(x => math.abs(x - m) > 5.0 * mad).toLong)
    }
    // bit-equal: the operator promises exactly the interpolation ops
    assert(got("a") == brute(clean.map(_._2)))
    assert(got("b") == brute(poisoned.map(_._2)))
    // the robustness point: ±1e12 poison leaves b's median/MAD in the
    // clean bulk (a mean/σ monitor would swallow the poison whole), and
    // the poison rows are EXACTLY the flagged set
    assert(got("b")._1 > 49 && got("b")._1 < 55, s"median ${got("b")._1}")
    assert(got("b")._2 < 5, s"mad ${got("b")._2}")
    assert(got("b")._4 == 3L)
    assert(got("a")._4 == 0L)
  }

  test("sketchOverlap: inclusion-exclusion estimates track exact intersections") {
    // a: 0..5999, b: 4000..9999 (overlap 2000), c: 20000..20999 (disjoint)
    val df = ((0L until 6000L).map(("a", _)) ++ (4000L until 10000L).map(("b", _))
      ++ (20000L until 21000L).map(("c", _))).toDF("g", "v")
    val out = Pipeline.sketchOverlap(df, "g", "v")
      .select($"ga", $"gb", $"overlap_est")
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(math.abs(out(("a", "b")) - 2000L) <= 300L, s"ab ${out(("a", "b"))}")
    assert(out(("a", "c")) <= 300L && out(("b", "c")) <= 300L)
  }

  test("freqSketch: merged CMS equals sketch-of-whole; one-sided heavy-hitter bound") {
    // skewed stream: value 7 is the heavy hitter (10k of 13k rows)
    val df = ((1L to 10000L).map(_ => ("a", 7L)) ++
      (1L to 3000L).map(i => (if (i % 2 == 0) "a" else "b", i % 100 + 100L)))
      .toDF("g", "v")
    val perGroup = Pipeline.freqSketch(df, "g", "v", eps = 0.001)
    assert(perGroup.count() == 2)
    val merged = Pipeline.mergeFreqSketches(perGroup)
      .select($"sketch").as[Array[Byte]].collect().head
    val whole = df.agg(count_min_sketch($"v", lit(0.001), lit(0.99), lit(42)))
      .as[Array[Byte]].collect().head
    // counter addition is exact: merged == sketch of the concatenated data
    assert(java.util.Arrays.equals(merged, whole))
    val n = 13000L
    val est7 = Pipeline.estimateFreq(merged, 7L)
    assert(est7 >= 10000L && est7 <= 10000L + (0.001 * n).toLong + 1)
    val est150 = Pipeline.estimateFreq(merged, 150L)
    assert(est150 >= 30L && est150 <= 30L + (0.001 * n).toLong + 1)
    assert(est7 > 100 * est150) // the heavy hitter is unmistakable
  }

  test("quantileSketch: per-group and merged estimates honor the rank-error bound") {
    val eps = 0.01
    // g=a holds 0..9999, g=b holds 10000..19999 — value == global rank,
    // so rank error is directly readable off the estimate
    val df = (0L until 20000L).map(i => (if (i < 10000) "a" else "b", i))
      .toDF("g", "v")
    val perGroup = Pipeline.quantileSketch(df, "g", "v", relativeError = eps)
    val rows = perGroup.select($"g", $"sketch", $"n_rows")
      .as[(String, Array[Byte], Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(rows("a")._2 == 10000L && rows("b")._2 == 10000L)
    // per-group median of g=a: rank 5000 of 0..9999, tolerance eps*n
    val medA = Pipeline.estimateQuantile(rows("a")._1, 0.5)
    assert(math.abs(medA - 5000.0) <= eps * 10000 + 1, s"median(a)=$medA")
    // g=b's p99 lives near 19900
    val p99b = Pipeline.estimateQuantile(rows("b")._1, 0.99)
    assert(math.abs(p99b - 19900.0) <= eps * 10000 + 1, s"p99(b)=$p99b")
    // merged sketch answers GLOBAL quantiles within the (2x post-merge)
    // bound without re-reading rows
    val merged = Pipeline.mergeQuantileSketches(perGroup)
      .select($"sketch").as[Array[Byte]].collect().head
    val gmed = Pipeline.estimateQuantile(merged, 0.5)
    assert(math.abs(gmed - 10000.0) <= 2 * eps * 20000 + 1, s"global median $gmed")
    val gp95 = Pipeline.estimateQuantile(merged, 0.95)
    assert(math.abs(gp95 - 19000.0) <= 2 * eps * 20000 + 1, s"global p95 $gp95")
    // null values are excluded, not folded in as zeros
    val withNulls = df.union(Seq(("a", null.asInstanceOf[java.lang.Long]))
      .map(t => (t._1, Option(t._2).map(_.toLong).getOrElse(0L))).toDF("g", "v")
      .withColumn("v", lit(null).cast("long")))
    val nr = Pipeline.quantileSketch(withNulls, "g", "v")
      .filter($"g" === "a").select($"n_rows").as[Long].collect().head
    assert(nr == 10000L)
  }

  test("canonicalizeUrl is idempotent over varied url shapes") {
    val urls = (for {
      host <- Seq("Ex.COM", "a.b.ex.com")
      path <- Seq("", "/p", "/p/", "/A/B")
      q <- Seq("", "?utm_a=1", "?id=1&utm_a=2", "?utm_a=1&id=2&utm_b=3", "?id=1")
      frag <- Seq("", "#x")
    } yield s"https://$host$path$q$frag").toDF("u")
    val once = urls.select(Pipeline.canonicalizeUrl($"u").as("c"))
    val twice = once.select(Pipeline.canonicalizeUrl($"c"))
      .as[String].collect()
    assert(twice.toSeq == once.as[String].collect().toSeq)
  }

  test("capPerDomain keeps the k smallest ids per domain; accounting matches") {
    val docs = (1L to 10L).map(i => (i, if (i <= 7) "big.com" else "small.org"))
      .toDF("doc_id", "source")
    val kept = Pipeline.capPerDomain(docs, "source", k = 3)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(kept.toSeq == Seq((1L, "big.com"), (2L, "big.com"), (3L, "big.com"),
      (8L, "small.org"), (9L, "small.org"), (10L, "small.org")))
    val acct = Pipeline.domainCapAccounting(docs, "source", k = 3)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(acct == Seq(("big.com", 7L, 3L, 4L), ("small.org", 3L, 3L, 0L)))
  }
  test("ffdPack: textbook FFD placement, bin-capacity invariant, oversize docs") {
    import spark.implicits._
    // toks [7,5,4,3] at budget 10: FFD places 7->b1, 5->b2, 4->b2, 3->b1
    def doc(id: Long, n: Int) = (id, "sh", (1 to n).map(i => s"w$i").mkString(" "))
    val out = operators.Pipeline.ffdPack(
      Seq(doc(1, 7), doc(2, 5), doc(3, 4), doc(4, 3)).toDF("doc_id", "source", "text"),
      budget = 10L)
      .select($"doc_id", $"bin").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))

    // invariant on a bigger deterministic corpus: no multi-doc bin over
    // budget, and an oversize doc sits alone in its own bin
    val docs = (1L to 60L).map(i => (i, s"s${i % 3}",
      (1 to (if (i == 7) 25 else (i * 13 % 9 + 1)).toInt)
        .map(j => s"t$j").mkString(" "))).toDF("doc_id", "source", "text")
    val packed = operators.Pipeline.ffdPack(docs, budget = 12L)
      .as[(String, Long, Long, Long)].collect()
    val byBin = packed.groupBy(r => (r._1, r._4))
    byBin.foreach { case ((sh, bin), rows) =>
      if (rows.length > 1)
        assert(rows.map(_._3).sum <= 12L, s"bin ($sh,$bin) over budget: $rows")
    }
    val oversize = packed.find(_._2 == 7L).get
    assert(oversize._3 === 25L)
    assert(byBin((oversize._1, oversize._4)).length === 1,
      "oversize doc must sit alone in its bin")
    // determinism
    val again = operators.Pipeline.ffdPack(docs, budget = 12L)
      .as[(String, Long, Long, Long)].collect()
    assert(packed.sortBy(r => (r._1, r._2)).toSeq ===
      again.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("doremiWeights: multiplicative-weights trace — uniform start, " +
    "excess-monotone ordering, smoothing floor, weights sum to 1") {
    val loss = Seq(("web", 2.0), ("code", 3.5), ("books", 2.5))
      .toDF("domain", "loss")
    val c = 0.015625
    val tr = Pipeline.doremiWeights(loss, rounds = 6, eta = 0.5, smoothing = c)
      .as[(Long, String, Double, Double)].collect()
    val byRound = tr.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(byRound.keySet == (0L to 6L).toSet)
    // round 0 is uniform
    byRound(0L).foreach(r => assert(math.abs(r._4 - 1.0 / 3) < 1e-12))
    // excess is loss - min(loss), constant across rounds
    val ex = byRound(0L).map(r => r._2 -> r._3).toMap
    assert(ex("web") == 0.0 && math.abs(ex("code") - 1.5) < 1e-12
      && math.abs(ex("books") - 0.5) < 1e-12)
    (0L to 6L).foreach { r =>
      val ws = byRound(r).map(_._4)
      assert(math.abs(ws.sum - 1.0) < 1e-9, s"round $r weights sum ${ws.sum}")
    }
    // the high-excess domain strictly gains weight every round and
    // dominates; the zero-excess domain decays but never below the
    // smoothing floor c/D
    val codeW = (0L to 6L).map(r => byRound(r).find(_._2 == "code").get._4)
    assert(codeW.sliding(2).forall(p => p(1) > p(0)), s"not monotone: $codeW")
    val webW = (0L to 6L).map(r => byRound(r).find(_._2 == "web").get._4)
    assert(webW.last < webW.head)
    assert(webW.forall(_ >= c / 3 - 1e-15))
    assert(byRound(6L).maxBy(_._4)._2 == "code")
  }

  test("dataConstrainedCard: repeat-decay accounting at the budget-implied epochs") {
    val u = Seq(("a", 100L), ("b", 300L)).toDF("key", "u_tokens")
    val r = Pipeline.dataConstrainedCard(u, budget = 800L, rStar = 15.4)
      .as[(String, Long, Double, Double, Double, Double)].collect()
      .map(x => x._1 -> x).toMap
    // epochs = 800/400 = 2.0 exactly, for every key
    assert(r("a")._3 == 2.0 && r("b")._3 == 2.0)
    assert(r("a")._4 == 200.0 && r("b")._4 == 600.0) // trained = u * epochs
    val decay = BigDecimal(math.exp((1.0 - 2.0) / 15.4))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r("a")._5 == 100.0 + 100.0 * 15.4 * (1.0 - decay))
    // second-epoch value is high but < 1: efficiency strictly in (0.5, 1)
    assert(r("a")._6 > 0.5 && r("a")._6 < 1.0)
    // efficiency is key-independent at a global epoch count (u factors
    // out mathematically; IEEE leaves a last-ulp difference)
    assert(math.abs(r("a")._6 - r("b")._6) < 1e-12)
    intercept[IllegalArgumentException] {
      Pipeline.dataConstrainedCard(u, budget = 0L)
    }
  }
}
