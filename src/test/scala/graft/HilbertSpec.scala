package graft

import org.apache.spark.sql.functions._

import graft.functions.HilbertIndex
import graft.sources.Layout

/** The Hilbert layout's correctness is provable without an oracle: a
  * Hilbert curve is a unit-step Hamiltonian path over the whole grid.
  * Exhaustive enumeration pins (a) bijectivity — indices are a complete
  * permutation of [0, 2^(n*bits)) — and (b) adjacency — consecutive
  * indices are L1-distance-1 grid neighbors. Essentially only a Hilbert
  * traversal satisfies both, so any transcription slip in the Skilling
  * transpose fails here. The x13 oracle row then covers the layout
  * write's content-losslessness over real data.
  */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  private def grid(n: Int, bits: Int): Seq[Array[Long]] = {
    val side = 1L << bits
    def gen(k: Int): Seq[List[Long]] =
      if (k == 0) Seq(Nil)
      else for (rest <- gen(k - 1); v <- 0L until side) yield v :: rest
    gen(n).map(_.toArray)
  }

  private def checkCurve(n: Int, bits: Int): Unit = {
    val pts = grid(n, bits)
    val total = 1L << (n * bits)
    val byIndex = pts.map(p => HilbertIndex.index(p, bits) -> p).sortBy(_._1)
    // bijective: every index in [0, total) hit exactly once
    assert(byIndex.map(_._1) == (0L until total), s"n=$n bits=$bits not a permutation")
    // unit-step: consecutive indices differ by exactly 1 in exactly one axis
    byIndex.sliding(2).foreach { case Seq((i, a), (_, b)) =>
      val diffs = a.zip(b).map { case (x, y) => math.abs(x - y) }
      assert(diffs.sum == 1 && diffs.max == 1,
        s"n=$n bits=$bits: step $i -> ${i + 1} is ${a.toList} -> ${b.toList}")
    }
  }

  test("hilbert index is a unit-step Hamiltonian path (exhaustive, 2-D and 3-D)") {
    checkCurve(2, 5) // 32×32 = 1024 points
    checkCurve(3, 3) // 8³ = 512 points
  }

  test("hilbert expression (codegen path) equals the static function") {
    val rnd = new scala.util.Random(11)
    val m3 = (1L << 21) - 1
    val cases = Seq((0L, 0L, 0L), (m3, m3, m3), (m3, 0L, 1L)) ++
      Seq.fill(200)((rnd.nextLong() & m3, rnd.nextLong() & m3, rnd.nextLong() & m3))
    val got = cases.toDF("a", "b", "c")
      .select($"a", $"b", $"c",
        Layout.hilbertValue(Seq($"a", $"b", $"c")).as("h3"),
        Layout.hilbertValue(Seq($"a", $"b")).as("h2"))
      .as[(Long, Long, Long, Long, Long)].collect()
    got.foreach { case (a, b, c, h3, h2) =>
      assert(h3 === HilbertIndex.index(Array(a, b, c), 21), s"h3($a,$b,$c)")
      assert(h2 === HilbertIndex.index(Array(a, b), 31), s"h2($a,$b)")
    }
    // null propagates, never a bogus index
    val withNull = Seq((Some(1L), None: Option[Long])).toDF("a", "b")
      .select(Layout.hilbertValue(Seq($"a", $"b")).as("h"))
      .as[Option[Long]].collect()
    assert(withNull.toSeq == Seq(None))
  }

  test("writeHilbert clusters ALL THREE dimensions per file; spans at the Morton level or tighter") {
    // same 16×16×16 grid as the writeZOrderedN spec: 64 files over 4096
    // points -> each file ≈ one 64-point curve segment ≈ a 4×4×4 block
    val dirH = java.nio.file.Files.createTempDirectory("hilbert3").toString
    val df = (0 until 4096).map { i => (i / 256L, (i / 16L) % 16L, i % 16L) }
      .toDF("x", "y", "z")
    Layout.writeHilbert(df, dirH, Seq("x", "y", "z"), numFiles = 64)
    def spans(dir: String): Array[(Long, Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"),
          (max($"z") - min($"z")).as("sz"))
        .select($"sx", $"sy", $"sz").as[(Long, Long, Long)].collect()
    val sh = spans(dirH)
    assert(sh.length === 64)
    val (ax, ay, az) = (sh.map(_._1).sum / 64.0, sh.map(_._2).sum / 64.0,
      sh.map(_._3).sum / 64.0)
    assert(ax <= 5.0, s"x spans not clustered: avg $ax")
    assert(ay <= 5.0, s"y spans not clustered: avg $ay")
    assert(az <= 5.0, s"z spans not clustered: avg $az")
    // the curve's selling point vs Morton: a contiguous index range is
    // CONNECTED, so the total per-file bounding volume is no worse
    val dirZ = java.nio.file.Files.createTempDirectory("morton3ref").toString
    Layout.writeZOrderedN(df, dirZ, Seq("x", "y", "z"), numFiles = 64)
    def vol(s: Array[(Long, Long, Long)]): Double =
      s.map { case (a, b, c) => (a + 1.0) * (b + 1.0) * (c + 1.0) }.sum
    assert(vol(sh) <= vol(spans(dirZ)) * 1.05,
      s"hilbert bounding volume ${vol(sh)} worse than morton ${vol(spans(dirZ))}")
    // content-lossless
    assert(spark.read.parquet(dirH).agg(sum($"x" * 256L + $"y" * 16L + $"z"))
      .head.getLong(0) === (0L until 4096L).sum)
  }
}
