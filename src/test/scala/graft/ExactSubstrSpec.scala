package graft

import org.apache.spark.sql.Row
import graft.operators.Dedup

/** Pins the ExactSubstr-class guarantee (VERDICT r9 task 3) at its
  * exact boundary, on a corpus where the shared-run lengths are
  * constructed, not sampled:
  *
  *  - a shared run of w+k−1 tokens is ALWAYS detected and ≥ k of its
  *    tokens trimmed from the non-canonical doc;
  *  - a shared run of k−1 tokens can never be detected (no complete
  *    k-gram exists inside it);
  *  - after trimming, no w+k−1-token verbatim stretch of a long shared
  *    run survives in the non-canonical doc (every such stretch
  *    contains a fully-interior winnowing window whose selection is
  *    shared, hence removed);
  *  - the canonical (smallest packed (doc_id, pos)) occurrence keeps
  *    its text.
  */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  private val k = 3
  private val w = 4
  private val L = w + k - 1 // 6: the guarantee boundary

  // 30 globally-unique base tokens; every filler token is also unique
  private val base = (1 to 30).map(i => s"a$i")
  private def filler(tag: String, n: Int) = (1 to n).map(i => s"$tag$i")

  private def trimmed(docs: Seq[(Long, String)]): Map[Long, Row] =
    Dedup.exactSubstrTrim(docs.toDF("doc_id", "text"), k, w)
      .collect().map(r => r.getLong(0) -> r).toMap

  test(s"shared run of exactly w+k-1 = $L tokens is always detected") {
    val run = base.slice(4, 4 + L) // a5..a10
    val out = trimmed(Seq(
      1L -> base.mkString(" "),
      2L -> (filler("f", 10) ++ run ++ filler("g", 10)).mkString(" ")))
    assert(out(1L).getLong(2) === 0L, "canonical doc must keep its text")
    assert(out(1L).getString(3) === base.mkString(" "))
    assert(out(2L).getLong(2) >= k.toLong,
      s"clone must lose >= $k tokens of the planted run: ${out(2L)}")
    // only run tokens can be removed (fillers are unique)
    val kept = out(2L).getString(3).split(" ").toSet
    assert(filler("f", 10).forall(kept) && filler("g", 10).forall(kept))
  }

  test(s"shared run of k-1 = ${k - 1} tokens is never touched") {
    val run = base.slice(4, 4 + k - 1)
    val out = trimmed(Seq(
      1L -> base.mkString(" "),
      3L -> (filler("p", 10) ++ run ++ filler("q", 10)).mkString(" ")))
    assert(out(3L).getLong(2) === 0L)
    assert(out(3L).getString(3) ===
      (filler("p", 10) ++ run ++ filler("q", 10)).mkString(" "))
  }

  test(s"no $L-token stretch of a long shared run survives trimming") {
    val run = base.slice(0, 20) // a1..a20 shared verbatim
    val out = trimmed(Seq(
      1L -> base.mkString(" "),
      4L -> (filler("x", 8) ++ run ++ filler("y", 8)).mkString(" ")))
    val kept = out(4L).getString(3).split(" ").toSet
    val survivors = run.map(kept.contains)
    val longestRun = survivors.foldLeft((0, 0)) { case ((cur, best), s) =>
      if (s) (cur + 1, math.max(cur + 1, best)) else (0, best)
    }._2
    assert(longestRun < L,
      s"a $longestRun-token verbatim stretch survived (guarantee: < $L)")
    assert(out(1L).getLong(2) === 0L, "canonical keeps everything")
  }

  test("within-doc repetition: later occurrence trimmed, first kept") {
    val run = base.slice(0, L)
    val text = (run ++ filler("m", 10) ++ run).mkString(" ")
    val out = trimmed(Seq(7L -> text))
    assert(out(7L).getLong(2) >= k.toLong, s"self-repeat must trim: ${out(7L)}")
    // the first occurrence's tokens survive: removal positions all sit
    // at or after the second occurrence's start
    val keptPrefix = out(7L).getString(3).split(" ").take(L).toSeq
    assert(keptPrefix === run, s"first occurrence must be intact: $keptPrefix")
  }

  test("docs shorter than k tokens pass through untouched") {
    val out = trimmed(Seq(9L -> "solo", 10L -> "two tokens"))
    assert(out(9L).getString(3) === "solo" && out(9L).getLong(2) === 0L)
    assert(out(10L).getString(3) === "two tokens")
  }
}
