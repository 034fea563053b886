package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prefix.cumSums/rowNumbers must equal the global-window formulation
  * EXACTLY (long sums are split-point-independent), on inputs designed
  * to cross range-partition boundaries: the oracle SQL states the
  * plain window, so any divergence is silent red at scale.
  */
class PrefixSpec extends SparkSpec {
  import spark.implicits._

  test("cumSums equals the global window bit-for-bit; totals are the grand sums") {
    // keys deliberately clustered (runs of near-equal values) so range
    // partitions cut inside dense regions
    val df = (0 until 5000).map { i =>
      (((i * 2654435761L) % 997).toLong, (i % 13).toLong, (i % 7).toLong)
    }.toDF("k", "a", "b")
    val (got, totals) = graft.operators.Prefix.cumSums(df, Seq(col("k")),
      Seq("a" -> "cum_a", "b" -> "cum_b"), keep = Seq("k"))
    // `k` has duplicates and Prefix requires a TOTAL order for
    // row-level equality — use a deterministic unique key for that
    // comparison (monotonically_increasing_id would re-evaluate
    // differently between the two plans below)
    val dfT = (0 until 5000)
      .map(i => (i.toLong, (i % 13).toLong, (i % 7).toLong)).toDF("r", "a", "b")
    val (gotT, _) = graft.operators.Prefix.cumSums(
      dfT, Seq(col("r")),
      Seq("a" -> "cum_a", "b" -> "cum_b"), keep = Seq("r"))
    val wantT = dfT.select(col("r"),
      sum(col("a")).over(Window.orderBy(col("r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum_a"),
      sum(col("b")).over(Window.orderBy(col("r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum_b"))
    assert(gotT.orderBy("r").collect().toSeq ===
      wantT.orderBy("r").collect().toSeq)
    assert(totals === Map("cum_a" -> df.agg(sum("a")).head.getLong(0),
      "cum_b" -> df.agg(sum("b")).head.getLong(0)))
    assert(got.count() === 5000L)
  }

  test("rowNumbers equals row_number over the same total order") {
    val df = (0 until 3000)
      .map(i => (((i * 40503L) % 211).toLong, s"t$i")).toDF("n", "tok")
    val got = graft.operators.Prefix.rowNumbers(df,
      Seq(col("n").desc, col("tok").asc), alias = "r", keep = Seq("n", "tok"))
    val want = df.select(col("n"), col("tok"),
      row_number().over(Window.orderBy(col("n").desc, col("tok").asc))
        .cast("long").as("r"))
    assert(got.orderBy("r").collect().toSeq ===
      want.orderBy("r").collect().toSeq)
  }

  test("groupedCumSums equals the group-partitioned window bit-for-bit") {
    // 7 groups × ~700 rows each — the low-cardinality regime where the
    // plain partitionBy window is a 7-task bottleneck at scale
    val df = (0 until 5000)
      .map(i => ((i % 7).toString, i.toLong, (i % 11 + 1).toLong))
      .toDF("g", "r", "x")
    val got = graft.operators.Prefix.groupedCumSums(df, Seq("g"),
      Seq(col("r")), Seq("x" -> "cx"), keep = Seq("g", "r", "x"))
    val w = Window.partitionBy(col("g")).orderBy(col("r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.select(col("g"), col("r"), col("x"),
      sum(col("x")).over(w).as("cx"))
    assert(got.orderBy("g", "r").collect().toSeq ===
      want.orderBy("g", "r").collect().toSeq)
  }

  test("cumSums on empty and single-row inputs") {
    val empty = Seq.empty[(Long, Long)].toDF("k", "x")
    val (e, et) = graft.operators.Prefix.cumSums(empty, Seq(col("k")),
      Seq("x" -> "cx"), keep = Seq("k"))
    assert(e.count() === 0L && et === Map("cx" -> 0L))
    val one = Seq((7L, 3L)).toDF("k", "x")
    val (o, ot) = graft.operators.Prefix.cumSums(one, Seq(col("k")),
      Seq("x" -> "cx"), keep = Seq("k"))
    assert(o.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((7L, 3L)))
    assert(ot === Map("cx" -> 3L))
  }

  test("WavSamples: decoded PCM equals the synthesis's documented byte stream") {
    import graft.functions.{EncodeWavPcm16, WavSamples}
    val n = 700
    val got = Seq(Tuple1(n.toLong)).toDF("n")
      .select(WavSamples(EncodeWavPcm16($"n", lit("au:42")), 1 << 20).as("s"))
      .collect().head.getSeq[Int](0)
    // independent re-derivation: data byte j = md5("au:42:<j/16>")[j%16]
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = (0 until n).map { i =>
      def byteAt(j: Int): Int =
        md.digest(s"au:42:${j / 16}".getBytes("UTF-8"))(j % 16) & 0xff
      val v = byteAt(2 * i) | (byteAt(2 * i + 1) << 8)
      if (v >= 0x8000) v - 0x10000 else v
    }
    assert(got === expected)
    // maxSamples caps the allocation; non-WAV payloads are null
    val capped = Seq(Tuple1(n.toLong)).toDF("n")
      .select(WavSamples(EncodeWavPcm16($"n", lit("au:42")), 64).as("s"))
      .collect().head.getSeq[Int](0)
    assert(capped === expected.take(64))
    val notWav = Seq(Tuple1("plain text".getBytes("UTF-8"))).toDF("b")
      .select(WavSamples($"b", 64).as("s")).collect().head
    assert(notWav.isNullAt(0))
  }
}
