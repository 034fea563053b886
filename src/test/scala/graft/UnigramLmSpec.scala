package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Unigram-LM tokenizer training (T-family, VERDICT r9 task 6) — the
  * T22 playbook applied to the SentencePiece-class trainer: roundtrip,
  * segmentability (single chars always in the vocab), held-out-word
  * behavior, and determinism of the EM + prune pipeline.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "alpha alpha beta alphabet"),
    (2L, "beta beta gamma alpha"),
    (3L, "alphabet gamma gamma beta alpha"),
    (4L, "delta alpha beta alphabet gamma")
  ).toDF("doc_id", "text")

  private lazy val vocab =
    TextAnalysis.unigramLmVocab(corpus, maxPieceLen = 4, seedSize = 30,
      emRounds = 2, vocabSize = 15).collect()

  test("every single character of the corpus is in the trained vocab") {
    val pieces = vocab.map(_.getString(0)).toSet
    val chars = "alphbetgmd".map(_.toString).toSet
    assert(chars.subsetOf(pieces), s"missing chars: ${chars -- pieces}")
  }

  test("viterbi segmentation roundtrips every corpus word") {
    val scores = vocab.map(r => r.getString(0) -> r.getDouble(2)).toMap
    val words = Seq("alpha", "beta", "gamma", "delta", "alphabet")
    words.foreach { w =>
      val seg = TextAnalysis.viterbiSegment(w, 4, scores)
      assert(seg.mkString("") === w, s"roundtrip broke: $w -> $seg")
      assert(seg.forall(scores.contains),
        s"segment used out-of-vocab piece: $w -> $seg")
    }
  }

  test("held-out word over known chars segments and roundtrips") {
    val scores = vocab.map(r => r.getString(0) -> r.getDouble(2)).toMap
    val seg = TextAnalysis.viterbiSegment("gadget", 4, scores)
    assert(seg.mkString("") === "gadget")
  }

  test("viterbi ties break to the smallest start (longest piece)") {
    // "ab" vs "a"+"b" with equal total score: the 2-char piece (start 0)
    // must win — the oracle's (v, -s) struct max states the same rule
    val sc = Map("ab" -> -2.0, "a" -> -1.0, "b" -> -1.0)
    assert(TextAnalysis.viterbiSegment("ab", 4, sc) === List("ab"))
  }

  test("missing pieces fall back without crashing, still roundtrip") {
    // 'x' is absent from the scores entirely
    val sc = Map("a" -> -1.0)
    val seg = TextAnalysis.viterbiSegment("axa", 2, sc)
    assert(seg.mkString("") === "axa")
  }

  test("training is deterministic: a second run is identical") {
    val again = TextAnalysis.unigramLmVocab(corpus, maxPieceLen = 4,
      seedSize = 30, emRounds = 2, vocabSize = 15).collect()
    assert(vocab.map(_.toString).sorted.toSeq ===
      again.map(_.toString).sorted.toSeq)
  }

  test("counts are positive integers and logp matches ln(n/total)") {
    val total = vocab.map(_.getLong(1)).sum.toDouble
    vocab.foreach { r =>
      assert(r.getLong(1) >= 1L)
      val expect = BigDecimal(math.log(r.getLong(1).toDouble / total))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(2) === expect, s"logp drifted for ${r.getString(0)}")
    }
  }

  test("unigramEncode: every token roundtrips through in-vocab pieces") {
    val vdf = TextAnalysis.unigramLmVocab(corpus, maxPieceLen = 4,
      seedSize = 30, emRounds = 2, vocabSize = 15)
    val pieces = vocab.map(_.getString(0)).toSet
    val enc = TextAnalysis.unigramEncode(corpus, vdf, maxPieceLen = 4)
      .collect()
    assert(enc.length === corpus.select(explode(split($"text", " ")))
      .count().toInt)
    enc.foreach { r =>
      val (word, ps) = (r.getString(2), r.getString(3).split("\\|").toSeq)
      assert(ps.mkString("") === word, s"roundtrip broke: $word -> $ps")
      assert(ps.forall(pieces), s"out-of-vocab piece in $word -> $ps")
      assert(r.getLong(4) === ps.length.toLong)
    }
  }

  test("likelihoodDeltas: removal cost is the with-vs-without re-segmentation gap") {
    // removing "ab" is cheap: the chars segment it nearly as well
    val cheap = TextAnalysis.likelihoodDeltas(
      Seq(("ab", 10L)), Map("ab" -> -1.0, "a" -> -0.6, "b" -> -0.6), 2)
    assert(math.abs(cheap("ab") - 10.0 * (-1.0 - (-1.2))) < 1e-12)
    // removing "cd" is expensive: its chars are rare
    val dear = TextAnalysis.likelihoodDeltas(
      Seq(("cd", 6L)), Map("cd" -> -2.0, "c" -> -4.0, "d" -> -4.0), 2)
    assert(math.abs(dear("cd") - 6.0 * (-2.0 - (-8.0))) < 1e-12)
    // a piece not used by any best segmentation has no entry (delta 0)
    assert(!cheap.contains("a") && !dear.contains("c"))
  }

  test("likelihood-delta prune CHOOSES DIFFERENT pieces than the count rank " +
      "(VERDICT r11 task 3): keeps the low-count expensive piece, drops the " +
      "high-count cheap one") {
    // Constructed divergence: token "ab" is FREQUENT (count 10) but its
    // chars also occur as frequent standalone words (15 each), so
    // re-segmenting "ab" -> "a","b" is cheap. Tokens "cd"/"ef" are less
    // frequent (6/8) but their chars occur ONLY inside them (EM floor
    // count 1), so removal costs ~the -1e9-free char path: huge delta.
    val docs = (
      Seq.fill(15)("a") ++ Seq.fill(15)("b") ++ Seq.fill(10)("ab") ++
      Seq.fill(8)("ef") ++ Seq.fill(6)("cd")
    ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    def train(prune: String) = TextAnalysis.unigramLmVocab(docs,
      maxPieceLen = 2, seedSize = 30, emRounds = 2, vocabSize = 8,
      prune = prune).collect()
    val byCount = train("count")
    val byDelta = train("likelihood")
    val countPieces = byCount.map(_.getString(0)).toSet
    val deltaPieces = byDelta.map(_.getString(0)).toSet
    // count mode keeps all three multis (ab outranks the floor-1 chars)
    assert(Set("ab", "cd", "ef").subsetOf(countPieces), s"count kept: $countPieces")
    // the count-rank witness: ab really does outcount cd in the trained table
    val n = byCount.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n("ab") > n("cd"),
      s"divergence witness broke: n(ab)=${n("ab")} !> n(cd)=${n("cd")}")
    // likelihood mode: 6 required chars + the 2 highest-delta multis —
    // ab is PRUNED despite its higher count; cd/ef survive
    assert(deltaPieces === Set("a", "b", "c", "d", "e", "f", "cd", "ef"),
      s"delta kept: $deltaPieces")
    // both modes still yield a usable tokenizer: every corpus word
    // roundtrips under the delta-pruned vocab
    val scores = byDelta.map(r => r.getString(0) -> r.getDouble(2)).toMap
    Seq("ab", "cd", "ef", "a", "b").foreach { w =>
      assert(TextAnalysis.viterbiSegment(w, 2, scores).mkString("") === w)
    }
  }

  test("soft EM CHOOSES A DIFFERENT vocabulary than hard EM (VERDICT r12 " +
      "task 6): posterior mass keeps the piece whose chars are rare, hard " +
      "EM keeps the higher-count piece whose mass it never splits") {
    // "ab" (10) outcounts "cd" (9), but a/b also occur standalone (15
    // each) so ab's posterior splits with the a+b path; c/d occur ONLY
    // inside cd, so cd keeps ~all its mass. Hard EM gives ab its full
    // 10 (Viterbi winner-takes-all) -> count prune at 3 slots keeps ab;
    // soft EM's expected counts rank cd above ab -> cd survives instead.
    val docs = (
      Seq.fill(15)("a") ++ Seq.fill(15)("b") ++ Seq.fill(10)("ab") ++
      Seq.fill(9)("cd")
    ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    def pieces(em: String) = TextAnalysis.unigramLmVocab(docs,
      maxPieceLen = 2, seedSize = 30, emRounds = 2, vocabSize = 3,
      em = em).collect().map(_.getString(0)).toSet
    val hard = pieces("hard")
    val soft = pieces("soft")
    assert(hard.contains("ab") && !hard.contains("cd"), s"hard kept: $hard")
    assert(soft.contains("cd") && !soft.contains("ab"), s"soft kept: $soft")
    // both keep the full required char set
    assert(Set("a", "b", "c", "d").subsetOf(hard & soft))
  }

  test("expectedPieceCounts: posterior mass sums to the word length bound " +
      "and splits proportionally to path probabilities") {
    // one word "ab", pieces ab (p=0.2) and a,b (p=0.4 each): path ab
    // has mass 0.2, path a+b has 0.16 -> posteriors 5/9 and 4/9
    val probs = Map("ab" -> 0.2, "a" -> 0.4, "b" -> 0.4)
    val ec = TextAnalysis.expectedPieceCounts("ab", 2, probs)
    assert(math.abs(ec("ab") - 0.2 / 0.36) < 1e-12)
    assert(math.abs(ec("a") - 0.16 / 0.36) < 1e-12)
    assert(math.abs(ec("b") - 0.16 / 0.36) < 1e-12)
    // unreachable word (no in-vocab cover) -> empty, never a crash
    assert(TextAnalysis.expectedPieceCounts("zz", 2, probs).isEmpty)
  }

  test("vocabSize prune keeps at most vocabSize multi-char pieces") {
    val multi = vocab.count(_.getString(0).length > 1)
    assert(vocab.length <= 15 + 10, s"vocab blew past prune: ${vocab.length}")
    assert(multi >= 1, "prune must retain some learned multi-char pieces")
  }
}
