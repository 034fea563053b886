package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All pure column
  * expressions (codegen'd, no UDFs) over per-row data — embarrassingly
  * parallel, no shuffle.
  */
object TextAnalysis {

  private def tokens(textCol: Column): Column = split(trim(textCol), "\\s+")

  /** Stopword-marker language ID: count marker tokens per language,
    * argmax with a minimum-evidence floor. The marker lists are tiny
    * n-gram/stopword heuristics (fastText-style signal, not a model).
    */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "es" -> Seq("el", "los", "las", "una", "y"))

  def markerCount(textCol: Column, words: Seq[String]): Column =
    size(filter(tokens(textCol), t => words.map(w => t === w).reduce(_ || _)))

  def languageId(textCol: Column, minEvidence: Int = 3): Column = {
    val counts = Seq("en", "fr", "de", "es").map(l => (l, markerCount(textCol, markers(l))))
    val best = greatest(counts.map(_._2): _*)
    // argmax with deterministic tie-break: first language in declared order
    counts.foldRight(lit("unk")) { case ((l, c), acc) =>
      when(c >= minEvidence && c === best, lit(l)).otherwise(acc)
    }
  }

  /** Quality metrics + a composite score. Per-row double arithmetic only
    * (deterministic); aggregate consumers should use decimal sums.
    */
  def qualityMetrics(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val txt = col(textCol)
    val nTok = size(tokens(txt)).cast("double")
    val nChar = length(txt).cast("double")
    val punct = size(regexp_extract_all(txt, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double")
    val stop = markerCount(txt, markers("en")).cast("double")
    docs.select(
      col(idCol).as("doc_id"),
      nChar.as("n_chars"),
      nTok.as("n_tokens"),
      ((nChar - nTok + lit(1.0)) / nTok).as("avg_word_len"),
      (punct / nChar).as("punct_ratio"),
      (stop / nTok).as("stopword_ratio"))
      .withColumn("quality_score",
        col("stopword_ratio") * 2.0 + when(col("avg_word_len") >= 3.0 && col("avg_word_len") <= 8.0, 0.5)
          .otherwise(0.0) - col("punct_ratio") * 3.0)
  }

  /** Token counts: whitespace tokens and a BPE-ish regex segmentation
    * (letter runs / digit runs / single non-alnum).
    */
  def tokenCounts(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      size(tokens(col(textCol))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col(textCol), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))
        .cast("long").as("re_tokens"))

  /** TF-IDF top terms per document. One shuffle for term counts, one
    * broadcast of the (tiny) document-frequency table, one window for
    * the per-doc top-k. `idf = ln((N+1)/(df+1))`.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("dfq"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // round(,6) here is zero-sign-safe: tf>=1 and df<=N so idf>=0, and the
    // idf=0 case is ln(exactly 1.0) = +0.0 in both JVM Math.log and libm —
    // a negative zero can never reach the round. Kept because it absorbs
    // last-ulp ln() differences between engines.
    val scored = toks
      .join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") *
        log((col("n_docs") + lit(1.0)) / (col("dfq") + lit(1.0))), 6))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("tok").asc)))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("tok"), col("tfidf"))
  }

  /** BM25 document scoring + top-k retrieval (Robertson/Spärck Jones —
    * the lexical-retrieval standard beside [[tfidfTopTerms]], and the
    * scorer real training pipelines use for quality-filtering and
    * contamination lookups): for each (qid, term) in `queryTerms`,
    * score(q, d) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))
    * with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) ≥ 0, and return
    * each query's best `k` documents.
    *
    * Scale shape: `queryTerms` broadcasts and PRUNES the postings
    * before anything is scored — only matched (doc, term) rows ever
    * shuffle, never a queries × corpus cross join; document lengths and
    * term document-frequencies are single hash aggregates off the same
    * tf frame; (N, total_len) is a 1-row broadcast; the per-query top-k
    * runs through TopKPerKey bounded heaps, not a window sort.
    *
    * Engine determinism (the codified toolkit): every count is an exact
    * integer; avgdl is ONE IEEE division of two exact longs; the ONE
    * transcendental — idf's ln, argument > 1 so no −0 hazard — is
    * round(9)ed before entering any product (the t31 rule); the
    * per-(q, d) sum over matched terms folds in SORTED order (the d20
    * sorted-fold pattern), so scores are bit-identical across engines
    * with NO tolerance compare.
    */
  def bm25TopDocs(docs: DataFrame, queryTerms: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    bm25TopDocsFromTf(termFrequencies(docs, textCol, idCol)
      .localCheckpoint(), // feeds postings, doc lengths, and df
      queryTerms, k, k1, b)

  /** The (doc_id, tok, tf) frame BM25 consumes — factored out so the
    * streaming maintainer (ST33) can keep exactly this frame as its
    * incremental store: tf of a union of disjoint-doc batches IS the
    * union of per-batch tfs, so scoring from the maintained store
    * equals the batch [[bm25TopDocs]] by construction.
    */
  private[graft] def termFrequencies(docs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))

  /** BM25 scoring + top-k off a prebuilt (doc_id, tok, tf) frame. */
  private[graft] def bm25TopDocsFromTf(tf: DataFrame, queryTerms: DataFrame,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1 && k1 >= 0 && b >= 0 && b <= 1, s"bad params: $k/$k1/$b")
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))
    val terms = queryTerms.select(col("term")).distinct()
    val dfreq = tf.join(broadcast(terms), tf("tok") === col("term"))
      .groupBy(col("tok")).agg(count(lit(1)).as("dfq"))
    val avgdl = col("total_len").cast("double") / col("n_docs").cast("double")
    val idf = round(log(lit(1.0) +
      (col("n_docs") - col("dfq") + lit(0.5)) / (col("dfq") + lit(0.5))), 9)
    val contrib = tf
      .join(broadcast(queryTerms.select(col("qid"), col("term"))),
        tf("tok") === col("term"))
      .join(dfreq, "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("doc_id"),
        (idf * (col("tf") * (lit(k1) + lit(1.0))) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl)))
          .as("contrib"))
    val scored = contrib.groupBy(col("qid"), col("doc_id"))
      .agg(aggregate(sort_array(collect_list(col("contrib"))), lit(0.0),
        (acc, x) => acc + x).as("score"))
    TopK.perKey(scored, Seq("qid"),
      Seq(TopK.desc("score"), TopK.asc("doc_id")), k)
  }

  /** Corpus vocabulary: top-k tokens per group by frequency — the
    * tokenizer-training precursor (what a BPE trainer consumes). The
    * count is ONE hash aggregate on (group, token) with map-side
    * partials; the per-group top-k then runs through the custom
    * TopKPerKey operator — bounded heaps instead of sorting the whole
    * vocabulary tail, and at 100 TB the tail IS the table (natural
    * language is Zipfian: most tokens are hapaxes that a window sort
    * would buffer and sort for nothing).
    */
  def vocabulary(docs: DataFrame, k: Int, groupCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    val counts = docs
      .select(col(groupCol).as("grp"), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("grp"), col("token")).agg(count(lit(1)).as("n"))
    TopK.perKey(counts, keys = Seq("grp"),
      orderBy = Seq(TopK.desc("n"), TopK.asc("token")), k = k)
  }

  /** Boilerplate detection: word-`n`-grams that appear in at least
    * `minDocFrac` of all documents (headers, footers, license blurbs,
    * navigation chrome — the text that survives exact AND near dedup
    * because the documents AROUND it differ). Per-doc grams are distinct
    * ([[Dedup.shingleSets]]), so one hash aggregate on the gram IS the
    * document frequency — map-side partials, one shuffle keyed by gram.
    * The corpus total is a 1-row broadcast crossJoin of an aggregate
    * over the same scan (AQE reuses nothing here — it is a separate
    * count-only scan, column-pruned to metadata at parquet level).
    */
  def boilerplateNGrams(docs: DataFrame, n: Int, minDocFrac: Double,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val grams = Dedup.shingleSets(docs, n, textCol, idCol)
      .select(col("doc_id"), explode(col("ts")).as("gram"))
    val total = docs.agg(count(lit(1)).as("n_total"))
    grams.groupBy(col("gram")).agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(total))
      .withColumn("doc_frac", col("n_docs").cast("double") / col("n_total"))
      .filter(col("doc_frac") >= minDocFrac)
      .select(col("gram"), col("n_docs"), col("doc_frac"))
  }

  /** Dictionary encoding: build the top-`vocabSize` token vocabulary by
    * global frequency (ties broken lexicographically, so ids are
    * deterministic) and re-encode every document as its token-id array
    * with out-of-vocabulary tokens mapped to `oovId` — the step between
    * tokenization and sequence packing ([[Pipeline]] `packSequences`).
    *
    * Scale shape: the global top-V is sort+limit, which Spark plans as
    * TakeOrderedAndProject (bounded per-partition heaps merged on the
    * driver — never a full vocabulary sort, and at 100 TB the Zipfian
    * tail IS the table); ids come from one row_number window over the
    * V-row result (single partition by construction — V is the fixed
    * vocab budget, not data-scaled); the dictionary broadcast-joins the
    * exploded token stream (V rows, explicitly `broadcast()`), and
    * documents reassemble with one hash aggregate on doc_id: collect
    * (pos, id) structs, sort in-row, project the ids out in order.
    */
  def encodeWithVocab(docs: DataFrame, vocabSize: Int, oovId: Long = -1L,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(vocabSize)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("token").asc)
    val dict = vocab.select(col("token"),
      (row_number().over(w) - 1).cast("long").as("tid"))
    toks.join(broadcast(dict), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("pos"),
        coalesce(col("tid"), lit(oovId)).as("tid")))).as("st"))
      .select(col("doc_id"),
        transform(col("st"), x => x.getField("tid")).as("token_ids"))
  }

  /** Unigram-LM commonness score — the CCNet-style "how much does this
    * document look like the corpus" quality proxy, made integer-exact:
    * corpus-wide token frequencies are joined back onto each document's
    * token stream and averaged. High scores = stopword-heavy common
    * prose; low scores = rare-token salad (OCR noise, code, spam) — the
    * per-document signal a perplexity filter thresholds on, without a
    * trained LM. All aggregation is BIGINT (`sum(tf)`, `count(*)`);
    * the only floating-point op is ONE final division, so the result is
    * bit-exact in any engine (the repo-wide invariant that keeps doubles
    * out of multi-row sums).
    *
    * Scale shape (verified in the AQE-final plan): the frequency table
    * aggregates behind ONE token-keyed exchange with map-side partials,
    * then BROADCASTS into the join, so the probe-side token stream flows
    * straight from the scan with no shuffle at all — total cost is one
    * token exchange (vocab-sized rows) + one doc_id exchange. If the
    * vocabulary outgrows the broadcast threshold at extreme scale, the
    * fallback token-keyed join's probe exchange is canonically identical
    * to the frequency build's, so AQE reuses it rather than re-shuffling.
    * Stopword keys are heavy (Zipf) but reduce map-side, and AQE
    * skew-split handles residual imbalance — no salting needed because
    * the per-key state is a counter, not a buffer.
    */
  def commonness(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("token"))
    val freq = toks.groupBy(col("token")).agg(count(lit(1)).as("tf"))
    toks.join(freq, "token")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("tf")).as("sum_tf"))
      .select(col("doc_id"), col("n_tokens"), col("sum_tf"),
        (col("sum_tf").cast("double") / col("n_tokens").cast("double")).as("commonness"))
  }

  /** Bigram novelty scoring — the bigram complement of [[commonness]]
    * and the signal the unigram proxy cannot see: a scrambled word
    * salad has perfectly common unigrams but corpus-unseen bigrams.
    * Per document, over its DISTINCT word bigrams (the one-pass
    * `WordNGrams` expression — no token materialization, no HOFs):
    * document frequency df(g) = #docs containing g is built by one
    * bigram-keyed hash aggregate (vocabulary-sized result, map-side
    * partials), then joined back onto the same exploded stream —
    * past the broadcast threshold the probe exchange is canonically
    * identical to the build's, so AQE reuses it (the t11 plan shape).
    * `n_rare` counts bigrams with df ≤ `rareDf`; sums stay BIGINT
    * end-to-end with exactly one double division per ratio — the
    * oracle matches bit-for-bit.
    */
  def bigramNovelty(docs: DataFrame, rareDf: Long = 2,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(rareDf >= 1, s"rareDf must be >= 1: $rareDf")
    val grams = docs.select(col(idCol).as("doc_id"),
      explode(graft.functions.WordNGrams(col(textCol), 2)).as("g"))
    val dfreq = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
    grams.join(dfreq, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum((col("df") <= rareDf).cast("long")).as("n_rare"),
        sum(col("df")).as("sum_df"))
      .select(col("doc_id"), col("n_bigrams"), col("n_rare"), col("sum_df"),
        (col("n_rare").cast("double") / col("n_bigrams").cast("double")).as("rare_frac"),
        (col("sum_df").cast("double") / col("n_bigrams").cast("double")).as("mean_df"))
  }

  /** BPE merge training over the word HISTOGRAM — the tokenizer-training
    * core. The classic at-scale trick: byte-pair merges never touch the
    * token stream; they run on the (word, count) histogram, which is
    * vocabulary-sized (Zipf: orders of magnitude below the corpus), so
    * each merge round is one small pair-count aggregate + a 1-row argmax
    * + a narrow per-word re-encode. Driver state = one merged pair per
    * round.
    *
    * Merge semantics are textbook BPE: per round, the highest-weight
    * adjacent symbol pair (ties: weight desc, pair lexicographic) merges
    * LEFT-TO-RIGHT within each word via a sequential fold — "a a a" with
    * pair (a,a) becomes "aa a", and the merged symbol cannot cascade
    * within the same round. The fold is expressed identically in Spark
    * (`aggregate` with a string accumulator) and any engine with a
    * sequential list_reduce, so merge decisions are bit-reproducible.
    *
    * Returns the post-merge symbol histogram (top `topK` by total
    * weight) — the frame a tokenizer's vocab file is cut from.
    */
  def bpeSymbolHistogram(docs: DataFrame, rounds: Int, topK: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(rounds >= 1 && topK >= 1, s"need rounds/topK >= 1: $rounds/$topK")
    val base = bpeBaseHistogram(docs, textCol).persist()
    try {
      val (sym, _) = bpeLoop(base, rounds)
      sym.select(col("n"), explode(split(col("sym"), " ")).as("symbol"))
        .groupBy(col("symbol")).agg(sum(col("n")).as("n_total"))
        .orderBy(col("n_total").desc, col("symbol").asc)
        .limit(topK)
        .localCheckpoint() // pin before unpersisting the histogram
    } finally { base.unpersist(); () }
  }

  /** The trained artifact of [[bpeSymbolHistogram]]'s loop: the ordered
    * merge list itself — what a tokenizer's merges.txt holds and what
    * [[bpeEncode]] consumes. Driver state is one (pair, rank) per
    * round, bounded by `rounds`.
    */
  def bpeMerges(docs: DataFrame, rounds: Int,
      textCol: String = "text", idCol: String = "doc_id"): Seq[(String, String)] = {
    require(rounds >= 1, s"need rounds >= 1: $rounds")
    val base = bpeBaseHistogram(docs, textCol).persist()
    try bpeLoop(base, rounds)._2 finally { base.unpersist(); () }
  }

  /** (word → space-joined chars, count) histogram the BPE loop runs on.
    * array_remove drops split's zero-width artifacts so the char list
    * matches a per-index construction.
    */
  private def bpeBaseHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .select(concat_ws(" ", array_remove(split(col("w"), ""), "")).as("sym"),
        col("n"))

  /** One merge round per iteration over the symbol histogram; returns
    * the post-merge frame and the ordered merge list. */
  private def bpeLoop(base: DataFrame, rounds: Int): (DataFrame, Seq[(String, String)]) = {
    var sym = base
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val a = split(col("sym"), " ")
      val pc = sym.select(col("n"),
          explode(zip_with(
            slice(a, lit(1), size(a) - 1), slice(a, lit(2), size(a) - 1),
            (x, y) => struct(x.as("x"), y.as("y")))).as("p"))
        .select(col("n"), col("p.x").as("x"), col("p.y").as("y"))
        .groupBy(col("x"), col("y")).agg(sum(col("n")).as("c"))
      val best = pc.orderBy(col("c").desc, col("x").asc, col("y").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (bx, by) = (best.head.getString(0), best.head.getString(1))
        merges += ((bx, by))
        sym = sym.withColumn("sym",
          aggregate(split(col("sym"), " "), lit(""), (acc, s) =>
            when(acc === lit(""), s)
              .when(s === lit(by) && acc === lit(bx), lit(bx + by))
              .when(s === lit(by) && acc.endsWith(lit(" " + bx)),
                concat(acc.substr(lit(1), length(acc) - lit(bx.length + 1)),
                  lit(" " + bx + by)))
              .otherwise(concat(acc, lit(" "), s))))
      }
      r += 1
    }
    (sym, merges.toSeq)
  }

  /** Apply an ordered merge list to ONE word — the imperative twin of
    * the training fold (left-to-right, non-cascading within a merge:
    * "a a a" under (a,a) becomes "aa a"), so encoding a training-corpus
    * word reproduces its training-time segmentation exactly.
    */
  private[graft] def applyBpeMerges(word: String,
      merges: Array[(String, String)]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    var mi = 0
    while (mi < merges.length) {
      val (x, y) = merges(mi)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        val s = syms(i)
        if (out.nonEmpty && out.last == x && s == y)
          out(out.length - 1) = x + y
        else out += s
        i += 1
      }
      syms = out.toArray
      mi += 1
    }
    syms
  }

  /** BPE ENCODING — apply a trained merge list to every word of the
    * corpus (the step between [[bpeMerges]] training and T10's id
    * assignment / P3's packing): each (doc, word) row becomes its
    * symbol sequence. The merge table is broadcast (rounds entries);
    * the encode is ONE scan-bound mapPartitions pass — per word
    * O(merges × word length), no shuffle, exactly how a production
    * tokenizer worker runs (no Catalyst expression exists for the
    * sequential merge recursion, the E-family typed-capture precedent).
    * Concatenating a word's symbols always reproduces the word
    * (merges only ever join adjacent symbols) — the spec's roundtrip
    * invariant — and re-aggregating encoded symbols equals the
    * training histogram.
    */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toArray)
    docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "word")))
      .select(col("doc_id"), col("pos").cast("int").as("pos"), col("word"))
      .as[(Long, Int, String)]
      .mapPartitions { it =>
        val ms = bc.value
        it.map { case (d, p, w) => (d, p, w, applyBpeMerges(w, ms).toSeq) }
      }
      .toDF("doc_id", "pos", "word", "symbols")
      .withColumn("n_symbols", size(col("symbols")).cast("long"))
  }

  /** WordPiece merge training (Schuster & Nakajima 2012; the BERT
    * tokenizer's training rule): identical loop shape to [[bpeMerges]]
    * — vocabulary-sized symbol histogram, one pair aggregate + 1-row
    * argmax per round — but the merge SCORE is the likelihood gain
    *   score(x,y) = count(x,y) / (count(x) · count(y))
    * instead of raw pair count: a pair merges when it co-occurs more
    * than its parts' frequencies predict, which prefers coherent
    * subwords over merely frequent ones (the published contrast with
    * BPE).
    *
    * Determinism: count(x,y), count(x), count(y) are exact BIGINTs;
    * the score is ONE double division of the exact pair count by the
    * exact product (≤ corpusTokens², < 2^63 — and the BIGINT→DOUBLE
    * cast is IEEE round-to-nearest on any engine), so the argmax
    * (score desc, then pair lexicographic) is engine-bit-exact — the
    * PMI exact-ratio discipline. Merge application within words is the
    * same left-to-right non-cascading fold as BPE.
    *
    * Scale: each round is TWO vocabulary-sized hash aggregates (pair
    * counts + symbol counts, both map-side combined) and a 1-row
    * TakeOrdered; driver state = one merge per round. The token stream
    * is touched ONCE to build the initial word histogram.
    *
    * Returns the merge trace: (rank, x, y, c, cx, cy, score).
    */
  def wordPieceMerges(docs: DataFrame, rounds: Int,
      textCol: String = "text"): DataFrame = {
    require(rounds >= 1, s"need rounds >= 1: $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = bpeBaseHistogram(docs, textCol).persist()
    val trace = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long, Long, Long, Double)]
    try {
      var sym = base
      var r = 0
      var exhausted = false
      while (r < rounds && !exhausted) {
        val a = split(col("sym"), " ")
        val pc = sym.select(col("n"),
            explode(zip_with(
              slice(a, lit(1), size(a) - 1), slice(a, lit(2), size(a) - 1),
              (x, y) => struct(x.as("x"), y.as("y")))).as("p"))
          .select(col("n"), col("p.x").as("x"), col("p.y").as("y"))
          .groupBy(col("x"), col("y")).agg(sum(col("n")).as("c"))
        val sc = sym.select(col("n"), explode(split(col("sym"), " ")).as("s"))
          .groupBy(col("s")).agg(sum(col("n")).as("cs"))
        val scored = pc
          .join(sc.select(col("s").as("x"), col("cs").as("cx")), Seq("x"))
          .join(sc.select(col("s").as("y"), col("cs").as("cy")), Seq("y"))
          .select(col("x"), col("y"), col("c"), col("cx"), col("cy"),
            (col("c").cast("double")
              / (col("cx") * col("cy")).cast("double")).as("score"))
        val best = scored
          .orderBy(col("score").desc, col("x").asc, col("y").asc)
          .limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          val b = best.head
          val (bx, by) = (b.getString(0), b.getString(1))
          trace += (((r + 1).toLong, bx, by, b.getLong(2), b.getLong(3),
            b.getLong(4), b.getDouble(5)))
          sym = sym.withColumn("sym",
            aggregate(split(col("sym"), " "), lit(""), (acc, s) =>
              when(acc === lit(""), s)
                .when(s === lit(by) && acc === lit(bx), lit(bx + by))
                .when(s === lit(by) && acc.endsWith(lit(" " + bx)),
                  concat(acc.substr(lit(1), length(acc) - lit(bx.length + 1)),
                    lit(" " + bx + by)))
                .otherwise(concat(acc, lit(" "), s))))
        }
        r += 1
      }
    } finally { base.unpersist(); () }
    trace.toSeq.toDF("rank", "x", "y", "c", "cx", "cy", "score")
  }

  /** WordPiece ENCODING — greedy longest-match-first against a trained
    * vocabulary (the BERT runtime algorithm, NOT merge application):
    * each word is segmented by repeatedly taking the LONGEST vocab
    * piece that prefixes the remainder, continuation pieces carrying
    * the `##` prefix; a word with an unmatchable remainder becomes
    * `[UNK]`. Vocabulary broadcast (vocab-sized driver state); the
    * encode is one scan-bound mapPartitions pass, O(len²) per word
    * worst-case — the reference implementation's own bound.
    */
  def wordPieceEncode(docs: DataFrame, vocab: Seq[String],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab.toSet)
    docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "word")))
      .select(col("doc_id"), col("pos").cast("int").as("pos"), col("word"))
      .as[(Long, Int, String)]
      .mapPartitions { it =>
        val v = bc.value
        it.map { case (d, p, w) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var start = 0
          var bad = false
          while (start < w.length && !bad) {
            var end = w.length
            var hit: String = null
            while (end > start && hit == null) {
              val raw = w.substring(start, end)
              val piece = if (start == 0) raw else "##" + raw
              if (v.contains(piece)) hit = piece else end -= 1
            }
            if (hit == null) bad = true
            else { out += hit; start = end }
          }
          val pieces = if (bad) Seq("[UNK]") else out.toSeq
          (d, p, w, pieces)
        }
      }
      .toDF("doc_id", "pos", "word", "pieces")
      .withColumn("n_pieces", size(col("pieces")).cast("long"))
  }

  /** Bigram language-model training: the corpus-wide conditional-
    * probability table P(w2 | w1) = c(w1,w2) / c(w1,·), thinned to the
    * top `topPerContext` transitions per context with at least
    * `minContext` outgoing bigrams. OCCURRENCE counts (every bigram
    * instance), not document frequency: pairs come from
    * `arrays_zip(slice, slice)` — codegen'd array ops, no interpreted
    * HOF lambdas — exploded into one (w1, w2) hash aggregate. The
    * context totals re-aggregate the bigram table (vocab-sized, never
    * the token stream), probabilities are ONE double division, and the
    * per-context thinning is the custom TopKPerKey operator — bounded
    * heaps against the Zipfian context fan-out, no window sort.
    */
  def bigramLm(docs: DataFrame, topPerContext: Int, minContext: Long,
      textCol: String = "text"): DataFrame = {
    val ts = split(trim(col(textCol)), "\\s+")
    val n1 = greatest(size(ts) - 1, lit(0))
    val pairs = arrays_zip(
      slice(ts, lit(1), n1).as("w1"), slice(ts, lit(2), n1).as("w2"))
    val bi = docs.select(explode(pairs).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    val ctx = bi.groupBy(col("w1")).agg(sum(col("c")).as("c_ctx"))
      .filter(col("c_ctx") >= minContext)
    val scored = bi.join(ctx, "w1")
      .select(col("w1"), col("w2"), col("c"), col("c_ctx"),
        (col("c").cast("double") / col("c_ctx").cast("double")).as("prob"))
    TopK.perKey(scored, Seq("w1"),
      Seq(TopK.desc("c"), TopK.asc("w2")), topPerContext)
  }

  /** PMI collocation mining — the classic lexical-association extractor
    * ("New York", "machine learning"): pointwise mutual information
    * `ln(c₁₂·N / (c₁·c₂))` over the bigram table and its own marginals,
    * thinned to the global top-k above a count floor (rare pairs have
    * degenerate PMI — the standard minCount guard).
    *
    * Float-safe ranking: rows are ORDERED by the exact ratio
    * `(c₁₂·N)/(c₁·c₂)` — both products are exact BIGINTs under 2^53,
    * so the division is one identical IEEE op on any engine, and ln's
    * monotonicity makes ratio-order = PMI-order without putting libm
    * in the sort key. The displayed `pmi` is round(ln(ratio), 9) — the
    * t5 rule: identical input double, round absorbs the ln ulp, and
    * ratio > 0 rules out the −0.0 hazard. Global top-k plans as
    * TakeOrderedAndProject (per-partition heaps), never a full sort.
    */
  def pmiCollocations(docs: DataFrame, minCount: Long, k: Int,
      textCol: String = "text"): DataFrame = {
    val ts = split(trim(col(textCol)), "\\s+")
    val n1 = greatest(size(ts) - 1, lit(0))
    val pairs = arrays_zip(
      slice(ts, lit(1), n1).as("w1"), slice(ts, lit(2), n1).as("w2"))
    val bi = docs.select(explode(pairs).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .localCheckpoint() // four consumers: marginals, total, scoring
    val left = bi.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val right = bi.groupBy(col("w2")).agg(sum(col("c12")).as("c2"))
    val tot = bi.agg(sum(col("c12")).as("n_bigrams"))
    val ratio = (col("c12") * col("n_bigrams")).cast("double") /
      (col("c1") * col("c2")).cast("double")
    bi.filter(col("c12") >= minCount)
      .join(left, "w1").join(right, "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        ratio.as("__r"), round(log(ratio), 9).as("pmi"))
      .orderBy(col("__r").desc, col("w1"), col("w2"))
      .limit(k)
      .drop("__r")
  }

  /** Interpolated Kneser–Ney bigram LM — the standard n-gram smoothing
    * (the serious upgrade beside [[bigramLm]]'s raw conditional MLE):
    *
    *   P_KN(w2|w1) = max(c(w1,w2)−d, 0)/c(w1·)
    *               + [d·N1+(w1·)/c(w1·)] · N1+(·w2)/N1+(··)
    *
    * — absolute discounting plus a CONTINUATION back-off: "w2's
    * probability in a novel context is how many contexts it follows,
    * not how often it occurs" (the 'San Francisco' fix: frequent-but-
    * one-context words stop leaking mass into every context).
    *
    * Everything derives from integer counts of ONE bigram table —
    * N1+(w1·) is the context's distinct-successor count, N1+(·w2) the
    * word's distinct-predecessor count, N1+(··) the distinct-bigram
    * total — so the probability is per-row double arithmetic from exact
    * BIGINTs: no float aggregate anywhere, engine-exact with the ops
    * mirrored in the oracle. The interpolation is exactly normalized
    * (Σ_w2 over the full vocab = 1; the spec pins it). Plan: one
    * (w1,w2) hash aggregate (pinned once — four consumers), two
    * vocab-sized roll-ups, one 1-row total broadcast, then the same
    * bounded-heap TopK thinning as [[bigramLm]].
    */
  def bigramKneserNey(docs: DataFrame, topPerContext: Int, minContext: Long,
      textCol: String = "text"): DataFrame = {
    val d = lit(0.75).cast("double")
    val ts = split(trim(col(textCol)), "\\s+")
    val n1 = greatest(size(ts) - 1, lit(0))
    val pairs = arrays_zip(
      slice(ts, lit(1), n1).as("w1"), slice(ts, lit(2), n1).as("w2"))
    val bi = docs.select(explode(pairs).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // four consumers below — one explode pass, ever
    val ctx = bi.groupBy(col("w1"))
      .agg(sum(col("c")).as("c_ctx"), count(lit(1)).as("n_follow"))
      .filter(col("c_ctx") >= minContext)
    val cont = bi.groupBy(col("w2")).agg(count(lit(1)).as("n_precede"))
    val tot = bi.agg(count(lit(1)).as("n_bigrams"))
    val pkn = greatest(col("c").cast("double") - d, lit(0.0)) /
        col("c_ctx").cast("double") +
      ((d * col("n_follow").cast("double")) / col("c_ctx").cast("double")) *
        (col("n_precede").cast("double") / col("n_bigrams").cast("double"))
    val scored = bi.join(ctx, "w1").join(cont, "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("c"), col("c_ctx"),
        col("n_follow"), col("n_precede"), pkn.as("p_kn"))
    TopK.perKey(scored, Seq("w1"),
      Seq(TopK.desc("c"), TopK.asc("w2")), topPerContext)
  }

  /** Interpolated Kneser–Ney TRIGRAM LM (T40) — [[bigramKneserNey]]
    * extended one order, the textbook three-level recursion
    * (Chen & Goodman 1999):
    *
    *   P(w3|w1w2) = max(c(w123)−D,0)/c(w12·)
    *              + [D·N1+(w12·)/c(w12·)] · P(w3|w2)
    *   P(w3|w2)   = max(c'(w2w3)−D,0)/c'(w2·)
    *              + [D·N1+(w2·)/c'(w2·)] · P_cont(w3)
    *   P_cont(w3) = N1+(·w3)/N1+(··)
    *
    * with the LOWER orders built from CONTINUATION (type) counts, not
    * raw counts — c'(w2w3) = distinct w1 preceding (w2,w3) — the
    * property that makes KN the strong baseline: a bigram frequent in
    * ONE trigram context stops leaking mass into all of them.
    *
    * Everything derives from integer roll-ups of ONE trigram table
    * (rows are distinct (w1,w2,w3), so COUNT(*) grouped by (w2,w3) IS
    * the distinct-predecessor count): probabilities are per-row double
    * arithmetic from exact BIGINTs, D = 0.75 binary-exact, ops
    * mirrored verbatim in the oracle — no float aggregate anywhere.
    * Plan: one explode → (w1,w2,w3) hash aggregate (pinned — five
    * consumers), three vocab-bounded roll-ups, one 1-row type total
    * broadcast, bounded-heap TopK per (w1,w2) context.
    */
  def trigramKneserNey(docs: DataFrame, topPerContext: Int,
      minContext: Long, textCol: String = "text"): DataFrame = {
    val d = lit(0.75).cast("double")
    val ts = split(trim(col(textCol)), "\\s+")
    val n2 = greatest(size(ts) - 2, lit(0))
    val triples = arrays_zip(
      slice(ts, lit(1), n2).as("w1"), slice(ts, lit(2), n2).as("w2"),
      slice(ts, lit(3), n2).as("w3"))
    val tri = docs.select(explode(triples).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"), col("p.w3").as("w3"))
      .groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // five consumers — one explode pass, ever
    val ctx12 = tri.groupBy(col("w1"), col("w2"))
      .agg(sum(col("c")).as("c12"), count(lit(1)).as("nf12"))
      .filter(col("c12") >= minContext)
    val cstar = tri.groupBy(col("w2"), col("w3"))
      .agg(count(lit(1)).as("cp"))
      .localCheckpoint() // three consumers of the type table
    val ctx2 = cstar.groupBy(col("w2"))
      .agg(sum(col("cp")).as("cpt"), count(lit(1)).as("nf2"))
    val cont3 = cstar.groupBy(col("w3")).agg(count(lit(1)).as("np3"))
    val tot = cstar.agg(count(lit(1)).as("n_types"))
    val pmid = greatest(col("cp").cast("double") - d, lit(0.0)) /
        col("cpt").cast("double") +
      ((d * col("nf2").cast("double")) / col("cpt").cast("double")) *
        (col("np3").cast("double") / col("n_types").cast("double"))
    val ptop = greatest(col("c").cast("double") - d, lit(0.0)) /
        col("c12").cast("double") +
      ((d * col("nf12").cast("double")) / col("c12").cast("double")) * pmid
    val scored = tri.join(ctx12, Seq("w1", "w2"))
      .join(cstar, Seq("w2", "w3")).join(ctx2, Seq("w2"))
      .join(cont3, Seq("w3")).crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("w3"), col("c"), col("c12"),
        col("nf12"), col("cp"), col("cpt"), col("nf2"), col("np3"),
        ptop.as("p_kn"))
    TopK.perKey(scored, Seq("w1", "w2"),
      Seq(TopK.desc("c"), TopK.asc("w3")), topPerContext)
  }

  /** Bigram-LM perplexity scoring — the CCNet-style quality filter:
    * documents are scored by how surprising they are under a bigram
    * language model trained on a (deterministic) train split of the
    * same corpus; high perplexity flags word salad / OCR garbage, very
    * low flags boilerplate. The LM is the [[bigramLm]] conditional
    * table WITHOUT thinning (scoring needs every seen transition):
    * lnp(w1,w2) = ln(c / c_ctx). Unseen bigrams (the held-out docs'
    * novelty) back off to a floor ln-prob of −ln(N_train + 1), so the
    * floor sharpens as the LM sees more data. Per doc:
    * H = −(Σ lnp)/n_bigrams (clamped at 0 — an all-prob-1 doc folds to
    * −0.0 and round() would keep DuckDB's sign), perplexity = exp(H).
    *
    * Plan: one (w1,w2) hash aggregate builds the LM (vocab²-bounded,
    * realistically Zipf-small), the probe stream left-joins it — past
    * the broadcast threshold both exchanges key on the same columns.
    * Determinism: the per-doc Σ lnp folds over the ASCENDING-sorted
    * ln-prob list and rounds to 6 decimals, absorbing last-ulp libm
    * ln/exp differences between engines (the t5/t14 precedent);
    * everything else is BIGINT or exact IEEE arithmetic. Docs with
    * fewer than 2 tokens have no bigrams and are absent from the
    * output (both engines drop them at the explode).
    */
  def bigramPerplexity(docs: DataFrame, trainFilter: Column,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val ts = split(trim(col(textCol)), "\\s+")
    val n1 = greatest(size(ts) - 1, lit(0))
    val pairs = arrays_zip(
      slice(ts, lit(1), n1).as("w1"), slice(ts, lit(2), n1).as("w2"))
    val bg = docs
      .select(col(idCol).as("doc_id"), trainFilter.as("is_train"),
        explode(pairs).as("p"))
      .select(col("doc_id"), col("is_train"),
        col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bi = bg.filter(col("is_train"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    val ctx = bi.groupBy(col("w1")).agg(sum(col("c")).as("c_ctx"))
    val lm = bi.join(ctx, "w1").select(col("w1"), col("w2"),
      log(col("c").cast("double") / col("c_ctx").cast("double")).as("lnp"))
    // 1-row train-mass total — broadcast into the probe scan (the
    // e19 now-anchor pattern); the +1 keeps the floor below any seen
    // transition's probability.
    val tot = bi.agg(sum(col("c")).as("n_train"))
    val scored = bg.join(lm, Seq("w1", "w2"), "left_outer")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        coalesce(col("lnp"),
          -log((col("n_train") + lit(1L)).cast("double"))).as("lnp_eff"),
        col("lnp").isNull.cast("long").as("unseen"))
    val sumLn = aggregate(sort_array(col("ls")), lit(0.0d), (a, x) => a + x)
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("unseen")).as("n_unseen"),
        collect_list(col("lnp_eff")).as("ls"))
      .select(col("doc_id"), col("n_bigrams"), col("n_unseen"),
        round(greatest(lit(0.0d),
          (lit(0.0d) - sumLn) / col("n_bigrams").cast("double")), 6)
          .as("cross_entropy"))
      // separate projection: CollapseProject never inlines the fold
      // into exp (multi-referenced non-cheap expressions stay pinned)
      .withColumn("perplexity", round(exp(col("cross_entropy")), 6))
  }

  /** CCNet perplexity bucketing (Wenzek et al., LREC 2020): score every
    * document with the [[bigramPerplexity]] LM and cut each LANGUAGE's
    * distribution into head / middle / tail at its own ⅓ and ⅔
    * interpolated percentiles — the published language-aware quality
    * tiering (a fixed global threshold would misrank low-resource
    * languages whose LMs are weaker everywhere).
    *
    * Determinism: perplexities are [[bigramPerplexity]]'s round(6)
    * values (order-independent sorted-fold sums); the two thresholds
    * come from the exact distributed-selection quantile (no per-key
    * sort — `Quantiles.interpolated`, the q48 machinery) with the
    * interpolation arithmetic `lo + (hi−lo)·(pos−floor(pos))` stated
    * identically in the oracle; bucket compares are on identical
    * doubles.
    *
    * Scale: perplexity is two corpus passes (LM fit + score);
    * thresholds are two aggregate passes + bucket-local sorts
    * (`Quantiles`); the per-language threshold frame (langs × 2 rows)
    * BROADCASTS into the labeling projection. The lang re-attach is an
    * explicit shuffle_hash doc-grain join (both sides corpus-sized,
    * the t35 no-silent-broadcast lesson), and the scored frame is
    * localCheckpoint-pinned because thresholds and labeling both read
    * it (two-branch rule).
    */
  def perplexityBuckets(docs: DataFrame, trainFilter: Column,
      langCol: String = "lang", textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val ppl = bigramPerplexity(docs, trainFilter, textCol, idCol)
    val withLang = ppl.as("p").hint("shuffle_hash")
      .join(docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"))
        .as("d").hint("shuffle_hash"), Seq("doc_id"))
    val cached = withLang.localCheckpoint()
    val th = Quantiles.interpolated(cached, "lang", "perplexity",
        Seq(1.0 / 3.0, 2.0 / 3.0))
      .groupBy(col("lang"))
      .agg(min(when(col("q") < 0.5, col("pct"))).as("t1"),
        max(when(col("q") >= 0.5, col("pct"))).as("t2"))
    cached.join(broadcast(th), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("perplexity"),
        when(col("perplexity") <= col("t1"), lit("head"))
          .when(col("perplexity") <= col("t2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Per-ROW Gopher verdict — [[gopherQualityFlags]]'s serving twin
    * for streams (the ST36 qualityScore precedent): the same exact
    * integer counts derived by in-row array folds instead of the
    * explode aggregate (token count, summed length via a long fold,
    * alphabetic/symbol counts via filter sizes, distinct stopwords via
    * array_intersect∘array_distinct, line stats on the split), so the
    * boolean verdict is BIT-EQUAL to the batch operator's `keep` for
    * the same document (integers all the way — spec-pinned). No
    * shuffle, no state: the live-gate shape.
    */
  def gopherKeepRow(text: Column, minWords: Long = 50L,
      maxWords: Long = 100000L,
      stopwords: Seq[String] = GopherStopwords): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (a, t) => a + length(t).cast("long"))
    val nAlpha = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val nSym = size(filter(toks,
      t => t === "#" || t === "..." || t === "…")).cast("long")
    val nStop = size(array_intersect(array_distinct(toks),
      array(stopwords.map(lit): _*))).cast("long")
    val lines = split(text, "\n")
    val nl = size(lines).cast("long")
    val nb = size(filter(lines, l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("•"))).cast("long")
    val ne = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…"))).cast("long")
    (n >= minWords && n <= maxWords) &&
      (sumLen >= lit(3L) * n && sumLen <= lit(10L) * n) &&
      (lit(10L) * nSym <= n) &&
      (lit(5L) * nAlpha >= lit(4L) * n) &&
      (nStop >= 2L) &&
      (lit(10L) * nb <= lit(9L) * nl) &&
      (lit(10L) * ne <= lit(3L) * nl)
  }

  /** Flesch readability scoring (Flesch 1948; Kincaid et al. 1975 —
    * the reading-ease / grade-level pair educational-quality corpus
    * filters still use): per document,
    *
    *   reading_ease = 206.835 − 1.015·(words/sentences)
    *                          − 84.6·(syllables/words)
    *   fk_grade     = 0.39·(words/sentences)
    *                + 11.8·(syllables/words) − 15.59
    *
    * Syllables use the standard vowel-group heuristic — max(1, number
    * of [aeiouy]+ runs per lowercased word) — stated identically on
    * any engine as a regexp count (no dictionary, the published
    * approximation). Sentences = terminal-punctuation runs [.!?]+,
    * floored at 1 (a punctuation-free document is one sentence).
    *
    * Determinism: words/syllables/sentences are exact integers; the
    * two rate terms are ONE double division each, and the formula
    * constants are CAST-literal decimals mirrored in the oracle (the
    * CLAUDE.md literal rule) — pure IEEE afterwards, no libm, no
    * rounding discipline needed.
    *
    * Scale: one explode → doc-grain map-side-combined aggregate (the
    * t38 shape); the sentence count rides the aggregate as MIN over a
    * per-row constant. Join-free.
    */
  def fleschReadability(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val nSent = greatest(
      size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))), lit(1))
      .cast("long")
    val w = col("w")
    val perDoc = docs
      .select(col(idCol).as("doc_id"), nSent.as("ns"),
        explode(tokens(col(textCol))).as("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(size(regexp_extract_all(lower(w), lit("[aeiouy]+"), lit(0)))
          .cast("long")).as("raw_syl"),
        sum(when(size(regexp_extract_all(lower(w), lit("[aeiouy]+"), lit(0)))
          === 0, 1L).otherwise(0L)).as("no_vowel"),
        min(col("ns")).as("n_sentences"))
    // per-word floor at 1 syllable: total = raw runs + one per
    // vowel-less word (exact integers, same floor the oracle states)
    perDoc.select(col("doc_id"), col("n_words"), col("n_sentences"),
        (col("raw_syl") + col("no_vowel")).as("n_syllables"))
      .withColumn("wps",
        col("n_words").cast("double") / col("n_sentences").cast("double"))
      .withColumn("spw",
        col("n_syllables").cast("double") / col("n_words").cast("double"))
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        (lit(206.835) - lit(1.015) * col("wps")
          - lit(84.6) * col("spw")).as("reading_ease"),
        (lit(0.39) * col("wps") + lit(11.8) * col("spw")
          - lit(15.59)).as("fk_grade"))
  }

  /** Per-document token Shannon entropy (nats) — the information-density
    * quality signal: word salad and keyword-stuffed spam sit at the
    * extremes of H = ln(n) - (Σ c·ln c)/n over per-document token counts
    * c. Plan: token explode → (doc, token) hash aggregate → doc-grain
    * aggregate — two shuffles on explicit keys, partial-agg friendly,
    * no per-token state past the first aggregate. Determinism: the
    * Σ c·ln c fold runs over counts sorted ascending (ties contribute
    * identical terms, so fold order within ties is immaterial) and the
    * result is rounded to 6 decimals to absorb last-ulp libm ln
    * differences between engines (the t5 precedent); H is clamped at 0
    * first — single-token-type docs can land at -1e-16, and round()
    * would keep DuckDB's -0.0 while Spark loses the sign.
    */
  def tokenEntropy(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val counts = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
    val n = col("n_tokens").cast("double")
    val sumClnc = aggregate(sort_array(col("cs")), lit(0.0d),
      (acc, c) => acc + c.cast("double") * log(c.cast("double")))
    counts.groupBy(col(idCol))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        collect_list(col("c")).as("cs"))
      .select(col(idCol), col("n_tokens"), col("n_distinct"),
        (col("n_distinct").cast("double") / n).as("ttr"),
        round(greatest(lit(0.0d), log(n) - sumClnc / n), 6).as("entropy"))
  }

  /** RAKE keyword extraction (Rose et al.): candidate phrases are the
    * maximal stopword-free token runs — found with the gaps-and-islands
    * trick (pos − row_number over non-stop tokens is constant within a
    * run; the R33 machinery, no regex splitting and its edge cases) —
    * scored by the classic degree/frequency word statistic: freq(w) =
    * occurrences of w across candidate phrases, deg(w) = Σ phrase
    * length over w's phrases (co-occurrence degree), word score =
    * deg/freq (ONE division), phrase score = Σ member word scores.
    * Top-k phrases per document through the TopKPerKey operator.
    *
    * Plan: one token explode + one doc-partitioned window for islands,
    * one vocab-sized word-stats aggregate joined back onto the word
    * stream, per-phrase Σ via ASCENDING-sorted fold + round(6) (the
    * t14 libm-free determinism — scores are rationals but the fold
    * order still must not depend on partitioning).
    */
  def rakeKeywords(docs: DataFrame, stopwords: Seq[String], k: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(stopwords.nonEmpty, "rake needs a stopword list")
    // No widenBy here: the word stream below is consumed by TWO branches
    // (word-stat build + score join), so a pre-repartition is planned
    // once per branch and the (doc_id,phrase,phrase_pos) aggregates
    // still add their own exchanges — measured 4 real exchanges -> 8 and
    // 2.16 -> 3.18 s at 32c when tried (r14; reverted per VERDICT r14).
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val phrases = toks.filter(!col("tok").isInCollection(stopwords))
      .withColumn("isl", col("pos") - row_number().over(byDoc))
      .groupBy(col("doc_id"), col("isl"))
      .agg(concat_ws(" ", array_sort(collect_list(struct(col("pos"), col("tok"))))
          .getField("tok")).as("phrase"),
        count(lit(1)).as("plen"),
        min(col("pos")).cast("long").as("phrase_pos"))
    val words = phrases.select(col("doc_id"), col("phrase"), col("plen"),
      col("phrase_pos"), explode(split(col("phrase"), " ")).as("w"))
    val stats = words.groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .withColumn("wscore", col("deg").cast("double") / col("freq").cast("double"))
    val sumScores = aggregate(sort_array(col("ws")), lit(0.0d), (a, x) => a + x)
    val scored = words.join(stats.select(col("w"), col("wscore")), "w")
      .groupBy(col("doc_id"), col("phrase"), col("phrase_pos"))
      .agg(collect_list(col("wscore")).as("ws"))
      .select(col("doc_id"), col("phrase"), col("phrase_pos"),
        round(sumScores, 6).as("score"))
    // identical phrases within a doc score identically: keep one row
    // with the occurrence count (classic RAKE candidates are a set)
    val dedup = scored.groupBy(col("doc_id"), col("phrase"))
      .agg(max(col("score")).as("score"), count(lit(1)).as("n_occ"),
        min(col("phrase_pos")).as("first_pos"))
    TopK.perKey(dedup, Seq("doc_id"),
      Seq(TopK.desc("score"), TopK.asc("phrase")), k)
  }

  /** Corpus drift: smoothed token-distribution KL divergence between
    * two corpus slices (snapshot N vs N+1, source A vs B) — the
    * distribution-level monitor beside D11's row-level diff: a corpus
    * can change every row while KL ≈ 0 (re-crawl) or change few rows
    * while KL spikes (a language/domain shift). Add-one smoothing over
    * the UNION vocabulary keeps every term finite; outputs both
    * directions plus the vocab/only-in-one counts.
    *
    * Determinism of a corpus-level Σ of libm terms (a GLOBAL sum, so
    * the per-doc sorted-fold pattern doesn't apply): each term
    * p·ln(p/q) is rounded to 9 decimals — absorbing last-ulp ln()
    * differences, the t5 discipline — then cast to DECIMAL(20,12),
    * whose sum is order-independent and exact; the total casts to
    * double at the END. The joined vocabulary frame is pinned
    * (localCheckpoint, vocab-sized) — the totals aggregate and the
    * term scan both read it.
    */
  def klDrift(docsA: DataFrame, docsB: DataFrame,
      textCol: String = "text"): DataFrame = {
    def counts(d: DataFrame, as: String) =
      d.select(explode(tokens(col(textCol))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as(as))
    val joined = counts(docsA, "ca").join(counts(docsB, "cb"), Seq("tok"),
      "full_outer").localCheckpoint()
    val totals = joined.agg(
      sum(coalesce(col("ca"), lit(0L))).as("na"),
      sum(coalesce(col("cb"), lit(0L))).as("nb"),
      count(lit(1)).as("vocab"),
      sum(when(col("cb").isNull, 1L).otherwise(0L)).as("n_only_a"),
      sum(when(col("ca").isNull, 1L).otherwise(0L)).as("n_only_b"))
    val pa = (coalesce(col("ca"), lit(0L)) + lit(1L)).cast("double") /
      (col("na") + col("vocab")).cast("double")
    val pb = (coalesce(col("cb"), lit(0L)) + lit(1L)).cast("double") /
      (col("nb") + col("vocab")).cast("double")
    def term(p: Column, q: Column) =
      round(p * log(p / q), 9).cast("decimal(20,12)")
    joined.crossJoin(broadcast(totals))
      .agg(sum(term(pa, pb)).cast("double").as("kl_ab"),
        sum(term(pb, pa)).cast("double").as("kl_ba"),
        max(col("na")).as("n_tokens_a"), max(col("nb")).as("n_tokens_b"),
        max(col("vocab")).as("vocab"),
        max(col("n_only_a")).as("n_only_a"), max(col("n_only_b")).as("n_only_b"))
  }

  /** Zipf rank–frequency fit — the corpus-statistics law every scaling
    * study plots: least squares of ln(freq) on ln(rank) over the
    * whole-corpus token histogram, returning the slope (≈ −1 for
    * natural language; the negated Zipf exponent), intercept and r².
    * Template-flooded or synthetic corpora bend the line — this is the
    * one-row monitor beside [[freqSpectrum]]'s full spectrum.
    *
    * Determinism: ranks tie-break (count desc, token asc) identically
    * in the oracle; per-term round(9) absorbs ln ulp and DECIMAL(20,12)
    * quantization makes each of the five regression sums exactly
    * order-independent (the t20 pattern); the closed-form combination
    * of the exact sums is a handful of double ops stated identically in
    * the oracle. Ranking is [[Prefix.rowNumbers]]' two-pass partitioned
    * prefix sum — vocabulary grows without bound at 100 TB, so even
    * the histogram must never fall into one global-window sort task
    * (the r8 x15/t26 audit; rows are never sorted either way).
    */
  def zipfFit(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val counts = docs.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val ranked = Prefix.rowNumbers(counts,
      Seq(col("n").desc, col("tok").asc), alias = "r", keep = Seq("n"))
    logLogFit(ranked, col("r"), col("n"),
      countAlias = "n_types",
      extraAggs = Seq(sum(col("n")) -> "n_tokens"))
  }

  /** Heaps' law fit — Zipf's companion: vocabulary growth V(n) ≈ K·n^β
    * (β ≈ 0.4–0.6 on natural language) over the corpus read in doc_id
    * order. One point per document: (cumulative tokens read, cumulative
    * distinct types seen). The β estimate is the capacity-planning
    * number for vocabularies/dictionary encodings at 100 TB — and a
    * dedup health check: heavy duplication flattens the curve early.
    *
    * Plan: token counts per doc (one aggregate), first-seen doc per
    * TYPE (one aggregate — distinct types appear once, at their min
    * doc), both folded to doc-cardinality frames, cumulative-summed by
    * [[Prefix.cumSums]]' two-pass partitioned prefix sum (the r8 fix:
    * doc cardinality IS billions at 100 TB, and the old doc-ordered
    * global window pushed every one of them through one sort task),
    * then the shared [[logLogFit]] tail with its documented
    * determinism (long cumsums are split-point-independent, so the
    * oracle's plain global window states identical values).
    */
  def heapsFit(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val tok = docs.select(col(idCol).as("d"),
      explode(tokens(col(textCol))).as("tok"))
    val perDoc = tok.groupBy(col("d")).agg(count(lit(1)).as("n_tok"))
    val newTypes = tok.groupBy(col("tok")).agg(min(col("d")).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("n_new"))
    val merged = perDoc.join(newTypes, Seq("d"), "left_outer")
      .select(col("d"), col("n_tok"), coalesce(col("n_new"), lit(0L)).as("n_new"))
    val points = Prefix.cumSums(merged, Seq(col("d")),
      Seq("n_tok" -> "cum_tok", "n_new" -> "cum_types"))._1
    logLogFit(points, col("cum_tok"), col("cum_types"),
      countAlias = "n_docs", extraAggs = Seq(
        max(col("cum_tok")) -> "n_tokens", max(col("cum_types")) -> "n_types"))
  }

  /** Shared log–log least-squares tail (Zipf t24, Heaps t26): per-point
    * round absorbs ln ulp, DECIMAL quantization makes the five
    * regression sums exactly order-independent (the t20 pattern), and
    * the closed form is a handful of double ops stated identically in
    * the oracles. Both inputs must be ≥ 1 (ln ≥ 0 — no −0.0 round
    * hazard, the documented precondition).
    *
    * Scale SIX, not twelve, on the term decimals — a hard-won ulp
    * lesson: the final DECIMAL→DOUBLE cast is only engine-identical
    * while `sum × 10^scale < 2^53` (then the unscaled integer is an
    * exact double and the ÷10^scale is ONE correct rounding on both
    * engines); at scale 12 the t26 Σxy needed 67 bits and DuckDB's
    * int128→double→÷10¹² DOUBLE-rOUNDED one ulp away from Spark's
    * single-rounded BigDecimal cast, which the closed form amplified
    * to 1e-13. Scale 6 bounds the integer at ~2^40 for these sums
    * (≤ ~10⁵ points × term ≤ ~300); the per-term resolution loss is
    * irrelevant to a statistical fit.
    */
  private def logLogFit(points: DataFrame, xRaw: Column, yRaw: Column,
      countAlias: String, extraAggs: Seq[(Column, String)]): DataFrame = {
    val x = round(log(xRaw.cast("double")), 9)
    val y = round(log(yRaw.cast("double")), 9)
    def dec(c: Column) = round(c, 6).cast("decimal(20,6)")
    val s = points.agg(
      count(lit(1)).as(countAlias),
      (extraAggs.map { case (c, n) => c.as(n) } ++ Seq(
        sum(dec(x)).cast("double").as("sx"),
        sum(dec(y)).cast("double").as("sy"),
        sum(dec(x * y)).cast("double").as("sxy"),
        sum(dec(x * x)).cast("double").as("sxx"),
        sum(dec(y * y)).cast("double").as("syy"))): _*)
    val nn = col(countAlias).cast("double")
    val cov = nn * col("sxy") - col("sx") * col("sy")
    val vx = nn * col("sxx") - col("sx") * col("sx")
    val vy = nn * col("syy") - col("sy") * col("sy")
    s.select(Seq(col(countAlias)) ++ extraAggs.map(a => col(a._2)) ++ Seq(
      (cov / vx).as("slope"),
      ((col("sy") - (cov / vx) * col("sx")) / nn).as("intercept"),
      (cov * cov / (vx * vy)).as("r2")): _*)
  }

  /** Token burstiness (Fano factor over the doc-count distribution,
    * zeros included): Var(c)/Mean(c) where c is the token's count per
    * document over ALL N docs. Content words are bursty (they pile
    * into the few docs about their topic: Fano ≫ 1), function words
    * are ~Poisson (Fano ≈ 1), and TEMPLATE/boilerplate tokens sit in
    * between with suspiciously uniform high rates — the corpus-health
    * signal df/tf alone can't give. With zeros the moments collapse to
    * two integer aggregates: T = Σc, S = Σc², and
    * Fano = S/T − T/N — exactly two double divisions and a subtraction
    * from exact BIGINTs, mirrored verbatim in the oracle. Top-k by
    * (burstiness desc, tok) — both engines compute the identical
    * doubles, so the order is total and stable cross-engine.
    */
  def burstiness(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", minOccurrences: Long = 5L,
      k: Int = 25): DataFrame = {
    val nDocs = docs.select(col(idCol)).count()
    val perDoc = docs.select(col(idCol).as("d"),
        explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("tok"), col("d")).agg(count(lit(1)).as("c"))
    perDoc.groupBy(col("tok"))
      .agg(sum(col("c")).as("t_total"), sum(col("c") * col("c")).as("s_sq"))
      .filter(col("t_total") >= minOccurrences)
      .select(col("tok"), col("t_total"),
        (col("s_sq").cast("double") / col("t_total").cast("double")
          - col("t_total").cast("double") / lit(nDocs).cast("double"))
          .as("burstiness"))
      .orderBy(col("burstiness").desc, col("tok").asc)
      .limit(k)
  }

  /** Moving-average type–token ratio (MATTR, Covington & McFall): the
    * mean over all w-token sliding windows of (distinct types in the
    * window)/w — the lexical-diversity score plain TTR can't give (TTR
    * falls with doc length by Heaps' law; the moving window removes
    * the length confound so scores compare across docs — a standard
    * LLM-corpus quality-gate input). Naive cost is O(n·w) set builds
    * per doc; this is the exact O(n) CONTRIBUTION form: token position
    * i (0-based; previous occurrence of the same type at p_i, −1 if
    * none) is the first occurrence of its type inside window start p
    * iff p > p_i, so it contributes to exactly the starts
    * p ∈ [max(i−w+1, p_i+1, 0), min(i, n−w)] — a closed-form count.
    * Σ over positions = Σ over windows of the window's distinct count.
    * One explode, one (doc, tok)-partitioned lag (per-doc bounded,
    * never global), one hash aggregate — all-integer until the final
    * division, stated identically in the oracle.
    */
  def mattr(docs: DataFrame, w: Int, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(w >= 1, s"window must be >= 1: $w")
    import org.apache.spark.sql.expressions.Window
    // widen before the split+explode CPU wall (the t23 lesson); Fence
    // pins the token array to one evaluation (size + posexplode would
    // each inline their own split)
    val tok = Dedup.widen(docs)
      .select(col(idCol).as("doc_id"),
        graft.functions.Fence(tokens(col(textCol))).as("__ts"))
      .select(col("doc_id"), size(col("__ts")).as("n"),
        posexplode(col("__ts")).as(Seq("pos", "tok")))
      .filter(col("n") >= w)
    val lagW = Window.partitionBy(col("doc_id"), col("tok")).orderBy(col("pos"))
    tok
      .withColumn("prev", coalesce(lag(col("pos"), 1).over(lagW), lit(-1)))
      .withColumn("contrib", greatest(
        least(col("pos"), col("n") - w)
          - greatest(col("pos") - (w - 1), col("prev") + 1, lit(0)) + 1,
        lit(0)))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).cast("long").as("n_tok"),
        (max(col("n")) - (w - 1)).cast("long").as("n_windows"),
        sum(col("contrib").cast("long")).as("sum_distinct"))
      .withColumn("mattr", col("sum_distinct").cast("double")
        / (col("n_windows") * w).cast("double"))
  }

  /** Token frequency-of-frequencies spectrum — the corpus-health
    * diagnostic behind Zipf/Heaps sanity checks and Good–Turing
    * smoothing: for each occurrence count c, how many distinct token
    * TYPES occur exactly c times, and how much token mass they carry.
    * A healthy natural-language corpus shows a long hapax tail
    * (n_types at c=1 around half the vocabulary); boilerplate-flooded
    * or template corpora collapse it. Two hash aggregates — token →
    * count (vocab-sized), then count → type-count (spectrum-sized,
    * tiny) — all BIGINT, bit-exact.
    */
  def freqSpectrum(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("n_types"))
      .select(col("c"), col("n_types"), (col("c") * col("n_types")).as("mass"))

  /** Good–Turing frequency re-estimation (t28) over the corpus token
    * histogram — the classical smoothed count r* = (r+1)·N_{r+1}/N_r
    * that [[freqSpectrum]]'s frequency-of-frequencies exists to feed:
    * tokens seen r times should be treated as if seen r* < r times,
    * with the shaved mass funding unseen events (P₀ = N₁/N, readable
    * off the c=1 row). Two vocab-then-spectrum-sized aggregates plus a
    * spectrum self-join on c+1; every r* is ONE IEEE division of exact
    * BIGINTs ((c+1)·N_{c+1} stays far under 2⁵³ at any real spectrum),
    * so the table is engine-bit-exact. r* is null where the spectrum
    * has a gap (N_{c+1} = 0 — the standard cutoff past which raw
    * counts are kept).
    */
  def goodTuring(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val spec = freqSpectrum(docs, textCol)
    val next = spec.select((col("c") - 1).as("c"), col("n_types").as("next_types"))
    spec.join(next, Seq("c"), "left")
      .select(col("c"), col("n_types"), col("mass"), col("next_types"),
        (((col("c") + 1) * col("next_types")).cast("double")
          / col("n_types").cast("double")).as("r_star"))
  }

  /** Deterministic hash sampling: keep rows whose salted md5 falls under
    * a hex-prefix cutoff — reproducible across engines and runs, the
    * right way to cut a stable x% slice of a 100 TB corpus (no RNG
    * state, re-runnable, stratifiable by any key).
    */
  def hashSample(df: DataFrame, keyCol: Column, cutoffHex: String, salt: String = "graft"): DataFrame =
    df.filter(md5(concat(lit(salt), lit(":"), keyCol.cast("string"))) < lit(cutoffHex))

  /** Document fingerprints: md5 of whitespace-normalized lowercase text,
    * plus a polynomial rolling hash over (first-char, length) of each
    * token — engine-reproducible integer math mod 1e9+7.
    */
  def fingerprints(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val norm = lower(regexp_replace(trim(col(textCol)), "\\s+", " "))
    val roll = aggregate(
      tokens(col(textCol)),
      lit(0L),
      (h, tok) => pmod(h * 131L + ascii(substring(tok, 1, 1)) * 31L + length(tok), lit(1000000007L)))
    docs.select(col(idCol).as("doc_id"),
      md5(norm).as("content_md5"),
      roll.as("rolling_hash"))
  }

  /** TRAINED language ID — the fastText idea in pure Spark, replacing
    * [[languageId]]'s fixed stopword markers with a model learned from
    * the corpus' own labels: char n-gram features under the hashing
    * trick (md5-derived bucket in a fixed `buckets`-wide space — the
    * model is bounded at `buckets × #langs` rows regardless of corpus
    * size, the property that lets it train on 100 TB), per-language
    * profile weights from a DETERMINISTIC doc_id-mod train fold, and
    * held-out scoring as score(doc, l) = Σ_grams count_train(bucket, l)
    * / total_train_grams(l) — each score ONE integer-ratio IEEE
    * division (num, den < 2^53), so ranking is engine-bit-exact: no
    * libm log-likelihoods, no tolerance compare. Prediction =
    * highest-scoring language, ties to the lexicographically smallest.
    *
    * Plan shape: gram counts collapse to (doc, bucket) grain BEFORE
    * joining the model (the join carries distinct buckets per doc, not
    * gram tokens); the model and per-language totals are
    * bucket-bounded and broadcast; one hash aggregate per stage.
    * Returns held-out predictions: (doc_id, lang, predicted).
    */
  def langIdTrained(docs: DataFrame, n: Int = 3, buckets: Int = 1 << 16,
      trainMod: Int = 10, trainFolds: Int = 8,
      textCol: String = "text", idCol: String = "doc_id",
      langCol: String = "lang"): DataFrame = {
    require(n >= 1 && buckets >= 2 && trainMod >= 2
      && trainFolds >= 1 && trainFolds < trainMod, "bad langIdTrained config")
    // widen BEFORE the gram explode: the md5-per-gram bucketing is the
    // CPU wall (chars × docs hashes) and a single-row-group parquet
    // input would pin it to one core
    val base = Dedup.widen(docs.filter(col(langCol).isNotNull)
      .filter(length(col(textCol)) >= n)
      .select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        col(textCol).as("t")))
    // one native per-row pass emits the bucket ids directly (md5 memoized
    // per distinct gram per row) — the interpreted transform+substring
    // HOF plus a per-occurrence md5 was the measured CPU wall here, and
    // no gram STRING ever leaves its row
    val hashed = base.select(col("doc_id"), col("lang"),
      explode(graft.functions.CharNGramBuckets(col("t"), n, buckets)).as("b"))
    val isTrain = pmod(col("doc_id"), lit(trainMod)) < trainFolds
    val model = hashed.filter(isTrain)
      .groupBy(col("lang").as("ml"), col("b")).agg(count(lit(1)).as("c"))
    val totals = model.groupBy(col("ml")).agg(sum(col("c")).as("d"))
    val langs = base.select(col("lang").as("ml")).distinct()
    val heldBuckets = hashed.filter(!isTrain)
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("m"))
    val numAgg = heldBuckets.join(broadcast(model), "b")
      .groupBy(col("doc_id"), col("ml")).agg(sum(col("m") * col("c")).as("num"))
    val heldDocs = base.filter(!isTrain).select(col("doc_id"), col("lang"))
    // per-doc argmax via min_by over a TOTAL ordering struct — map-side
    // partial argmax, one row per doc crosses the exchange (the
    // CLAUDE.md argmin/argmax rule; a row_number window would shuffle
    // doc × langs rows and sort). min over (−score, ml) = max score,
    // ties to the smallest ml — identical to the former window order
    // (score desc, ml asc). Negation is sign-safe: scores are ≥ 0 and
    // EVERY 0.0 negates to the same −0.0, so the order is untouched;
    // ml is unique per (doc, lang) row, making the struct a total order
    // (min_by on ties would otherwise be arrival-order-dependent).
    heldDocs.crossJoin(broadcast(langs))
      .join(numAgg, Seq("doc_id", "ml"), "left")
      .join(broadcast(totals), "ml")
      .select(col("doc_id"), col("lang"), col("ml"),
        (coalesce(col("num"), lit(0L)).cast("double") / col("d").cast("double"))
          .as("score"))
      .groupBy(col("doc_id"))
      .agg(min_by(struct(col("lang"), col("ml")),
        struct(negate(col("score")), col("ml"))).as("best"))
      .select(col("doc_id"), col("best.lang").as("lang"),
        col("best.ml").as("predicted"))
  }

  /** Spark's round() semantics on the driver (scala BigDecimal from the
    * double's shortest decimal repr, HALF_UP) — Viterbi piece scores
    * must round EXACTLY like the output logp column and the DuckDB
    * oracle's round(ln, 9) (the t27/t5 proven equivalence). */
  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** Viterbi best segmentation of one word under per-piece log scores:
    * dp[i] = max over s of dp[s] + score(w[s..i)), missing pieces at
    * −1e9 (a finite sentinel both engines state identically), ties →
    * SMALLEST start (the longest candidate piece), implemented as a
    * strict-> ascending scan — exactly the oracle's list_max over
    * (v, −s) structs. All arithmetic is double adds in recursion order,
    * so dp values are bit-identical across engines. Positions are CODE
    * POINTS, not UTF-16 units: Spark SQL substring/length and DuckDB
    * substr/len both count code points, so a java String.substring
    * segmentation would split surrogate pairs on an astral-plane word
    * and diverge from the seed inventory and the oracle (latent on the
    * ASCII testdata; review finding, round 10).
    */
  private[graft] def viterbiSegment(w: String, maxPieceLen: Int,
      scores: collection.Map[String, Double]): List[String] = {
    val cps = w.codePoints().toArray
    val n = cps.length
    def piece(s: Int, e: Int): String = new String(cps, s, e - s)
    val dp = new Array[Double](n + 1)
    val bp = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var best = Double.NegativeInfinity
      var bestS = -1
      var s = math.max(0, i - maxPieceLen)
      while (s < i) {
        val v = dp(s) + scores.getOrElse(piece(s, i), -1e9)
        if (v > best) { best = v; bestS = s }
        s += 1
      }
      dp(i) = best; bp(i) = bestS
      i += 1
    }
    var pos = n
    var out = List.empty[String]
    while (pos > 0) {
      val s = bp(pos)
      out = piece(s, pos) :: out
      pos = s
    }
    out
  }

  /** Viterbi BEST SCORE of one word — dp(n) of [[viterbiSegment]]'s
    * recursion without materializing backpointers. Used by the
    * likelihood-delta prune, which needs scores with and without a
    * candidate piece.
    */
  private[graft] def viterbiScore(w: String, maxPieceLen: Int,
      scores: collection.Map[String, Double]): Double = {
    val cps = w.codePoints().toArray
    val n = cps.length
    val dp = new Array[Double](n + 1)
    var i = 1
    while (i <= n) {
      var best = Double.NegativeInfinity
      var s = math.max(0, i - maxPieceLen)
      while (s < i) {
        val v = dp(s) + scores.getOrElse(new String(cps, s, i - s), -1e9)
        if (v > best) best = v
        s += 1
      }
      dp(i) = best
      i += 1
    }
    dp(n)
  }

  /** SentencePiece's prune metric under hard EM: for each MULTI-CHAR
    * piece p, the corpus-likelihood loss of removing it —
    * Σ_w n_w · (bestScore(w) − bestScore_without_p(w)), summed over the
    * words whose Viterbi-best segmentation uses p (for any other word
    * the with/without scores are identical, so the term is zero and the
    * re-segmentation is skipped). Pure driver-side function over the
    * vocabulary-sized word histogram: O(#words × pieces-per-best-seg)
    * extra Viterbi sweeps — the affordable O(vocab) cost the t31 plan's
    * own premise allows (VERDICT r11 task 3). Deterministic: words are
    * processed in sorted order, so the per-piece double accumulation
    * order is total.
    */
  private[graft] def likelihoodDeltas(words: Seq[(String, Long)],
      scores: Map[String, Double], maxPieceLen: Int): Map[String, Double] = {
    val acc = collection.mutable.HashMap.empty[String, Double]
    words.sortBy(_._1).foreach { case (w, n) =>
      val s = viterbiScore(w, maxPieceLen, scores)
      viterbiSegment(w, maxPieceLen, scores).distinct
        .filter(p => p.codePointCount(0, p.length) > 1)
        .foreach { p =>
          val without = viterbiScore(w, maxPieceLen, scores - p)
          acc.update(p, acc.getOrElse(p, 0.0) + n * (s - without))
        }
    }
    acc.toMap
  }

  /** Forward–backward posterior expected piece counts of ONE word
    * occurrence over its full segmentation lattice — the soft-EM
    * E-step quantity (Kudo 2018 §3.2; Baum–Welch on the piece
    * lattice): α(i) = Σ_s α(s)·p(piece[s,i)), β mirrored, and each
    * lattice edge contributes α(s)·p·β(i)/Z. Pieces absent from the
    * model have probability 0 (never a hard-EM −1e9 path — soft EM
    * weights ALL segmentations, impossible ones contribute nothing).
    * All loops run in index order, so the double accumulation order is
    * total and run-reproducible. Z = 0 (no in-vocab segmentation —
    * cannot happen while the char set rides the vocab) → empty map.
    */
  private[graft] def expectedPieceCounts(w: String, maxPieceLen: Int,
      probs: collection.Map[String, Double]): collection.Map[String, Double] = {
    val cps = w.codePoints().toArray
    val n = cps.length
    def piece(s: Int, e: Int): String = new String(cps, s, e - s)
    val alpha = new Array[Double](n + 1); alpha(0) = 1.0
    var i = 1
    while (i <= n) {
      var a = 0.0
      var s = math.max(0, i - maxPieceLen)
      while (s < i) { a += alpha(s) * probs.getOrElse(piece(s, i), 0.0); s += 1 }
      alpha(i) = a; i += 1
    }
    val beta = new Array[Double](n + 1); beta(n) = 1.0
    var s = n - 1
    while (s >= 0) {
      var b = 0.0
      var e = math.min(n, s + maxPieceLen)
      var j = s + 1
      while (j <= e) { b += probs.getOrElse(piece(s, j), 0.0) * beta(j); j += 1 }
      beta(s) = b; s -= 1
    }
    val z = alpha(n)
    val acc = collection.mutable.LinkedHashMap.empty[String, Double]
    if (z > 0) {
      var s2 = 0
      while (s2 < n) {
        val e = math.min(n, s2 + maxPieceLen)
        var i2 = s2 + 1
        while (i2 <= e) {
          val p = piece(s2, i2)
          val pe = probs.getOrElse(p, 0.0)
          if (pe > 0) {
            val post = alpha(s2) * pe * beta(i2) / z
            if (post > 0) acc.update(p, acc.getOrElse(p, 0.0) + post)
          }
          i2 += 1
        }
        s2 += 1
      }
    }
    acc
  }

  /** One soft-EM round over the word histogram: piece probabilities
    * from the current (possibly fractional) counts, then posterior
    * expected counts accumulated over words in SORTED order (total
    * double-accumulation order — the likelihoodDeltas discipline).
    * Chars that gather no mass keep the hard-EM floor of 1 so every
    * word stays segmentable next round.
    */
  private[graft] def softEmCounts(words: Seq[(String, Long)],
      counts: Map[String, Double], maxPieceLen: Int,
      chars: Set[String]): Map[String, Double] = {
    val total = counts.toSeq.sortBy(_._1).map(_._2).sum
    val probs: Map[String, Double] = counts.map { case (p, c) =>
      p -> math.exp(round9(math.log(c / total)))
    }
    val acc = collection.mutable.HashMap.empty[String, Double]
    words.sortBy(_._1).foreach { case (w, n) =>
      expectedPieceCounts(w, maxPieceLen, probs).foreach { case (p, ec) =>
        acc.update(p, acc.getOrElse(p, 0.0) + n * ec)
      }
    }
    chars.foreach { ch => if (acc.getOrElse(ch, 0.0) <= 0.0) acc.update(ch, 1.0) }
    acc.toMap
  }

  /** Unigram-LM tokenizer training (SentencePiece-class, Kudo 2018) —
    * the other tokenizer real pipelines train beside BPE (T12/T22):
    * seed a piece inventory from all ≤`maxPieceLen`-char substrings of
    * the word histogram (top `seedSize` by weighted count, single chars
    * always retained), then `emRounds` of hard EM — E-step: Viterbi
    * best segmentation of every distinct word under the current piece
    * log-probabilities; M-step: re-count pieces over the segmentations
    * (single chars floored at count 1 so every word stays segmentable)
    * — and a final prune to `vocabSize` pieces (chars always kept).
    *
    * Two prune modes (VERDICT r11 task 3):
    *  - `prune = "count"` (default, what the t31 oracle mirrors): keep
    *    the top `vocabSize` pieces by count rank, then union the single
    *    chars back in — a monotone PROXY for the likelihood delta on
    *    corpora where higher count ⇒ higher removal cost.
    *  - `prune = "likelihood"`: SentencePiece's actual metric — each
    *    multi-char piece is scored by the with-vs-without
    *    re-segmentation delta ([[likelihoodDeltas]]); all single chars
    *    are kept (a required-char set, as in SentencePiece) and the
    *    remaining `vocabSize − #chars` slots go to the highest-delta
    *    multi-char pieces (ties → higher count, then piece asc). This
    *    KEEPS a low-count piece whose removal would be expensive (no
    *    good alternative segmentation) over a high-count piece that
    *    segments cheaply into strong neighbors — the case where the
    *    count rank trains a different tokenizer (UnigramLmSpec pins a
    *    constructed divergence).
    *
    * Engine determinism (the T22 playbook): all counts are exact
    * integers; the ONE transcendental — ln(count/total) — is round(9)ed
    * BEFORE entering the dp sums ([[round9]] is bit-equal to Spark's
    * round and DuckDB's, t27 precedent; ln args are in (0,1) so no −0);
    * dp additions happen in recursion order on both engines; argmax
    * ties break to the smallest start. Seed/prune cuts are total-ORDER
    * deterministic (count desc, piece asc).
    *
    * Scale: the ONLY corpus-sized pass is the token histogram
    * (explode + map-side-partial hash agg, scan-bound). Everything
    * after runs on the vocabulary-sized word histogram
    * (localCheckpoint-pinned), with per-round driver collects of
    * piece-table size — the same metadata-scale collect class as
    * bpeMerges. Output: (piece, n, logp) ordered by piece.
    *
    * Two E-steps (`em`, VERDICT r12 task 6):
    *  - `em = "hard"` (default, what the t31 oracle mirrors): Viterbi
    *    best segmentation only — each word's full count goes to its
    *    single best piece sequence; counts stay exact integers.
    *  - `em = "soft"`: SentencePiece's actual forward–backward
    *    expectation ([[expectedPieceCounts]]) — every segmentation of
    *    every word contributes posterior mass, so a piece can retain
    *    count (and survive the prune) on the strength of SECOND-best
    *    paths hard EM zeroes out entirely (UnigramLmSpec pins a corpus
    *    where the two E-steps train different vocabularies). Runs
    *    driver-side on the word histogram (the likelihoodDeltas cost
    *    class) with sorted-order accumulation; output `n` is the
    *    expected count as DOUBLE.
    */
  def unigramLmVocab(docs: DataFrame, maxPieceLen: Int = 4,
      seedSize: Int = 60, emRounds: Int = 2, vocabSize: Int = 40,
      textCol: String = "text", prune: String = "count",
      em: String = "hard"): DataFrame = {
    require(maxPieceLen >= 1 && seedSize >= 1 && emRounds >= 1 && vocabSize >= 1,
      s"bad params: $maxPieceLen/$seedSize/$emRounds/$vocabSize")
    require(prune == "count" || prune == "likelihood",
      s"unsupported prune mode '$prune' (supported: count, likelihood)")
    require(em == "hard" || em == "soft",
      s"unsupported em mode '$em' (supported: hard, soft)")
    val spark = docs.sparkSession
    import spark.implicits._
    val L = maxPieceLen
    val wh = docs.select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .localCheckpoint() // vocabulary-sized; read once per EM round
    val seedc = wh.select(col("n"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)),
           |  i -> transform(sequence(1, least($L, length(w) - i + 1)),
           |    l -> substring(w, i, l))))""".stripMargin)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("n")).as("c"))
      .localCheckpoint() // feeds the top-N cut AND the char re-union
    val top0 = seedc.orderBy(col("c").desc, col("piece").asc).limit(seedSize)
      .localCheckpoint()
    val v0 = top0.unionByName(
      seedc.filter(length(col("piece")) === 1)
        .join(top0.select("piece"), Seq("piece"), "left_anti"))
    val charsAll = wh.select(explode(expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))")).as("piece"))
      .distinct().localCheckpoint()

    if (em == "soft") {
      // SentencePiece's ACTUAL E-step (VERDICT r12 task 6, closing the
      // hard-EM-only gap): posterior expected piece counts over every
      // word's full segmentation lattice instead of Viterbi-best-only
      // counts. Runs driver-side over the vocabulary-sized word
      // histogram — the same O(vocab) cost class the likelihood prune
      // already claims — with sorted-order accumulation everywhere, so
      // the (fractional) counts are run-reproducible. Output n is the
      // expected count as DOUBLE (the honest type; the oracle-checked
      // t31 row stays on hard EM's exact integers).
      val words = wh.select(col("w"), col("n")).as[(String, Long)]
        .collect().sortBy(_._1).toSeq
      val charsSet = charsAll.as[String].collect().toSet
      var counts: Map[String, Double] =
        v0.select(col("piece"), col("c")).as[(String, Long)].collect()
          .map { case (p, c) => p -> c.toDouble }.toMap
      for (_ <- 1 to emRounds)
        counts = softEmCounts(words, counts, L, charsSet)
      val isChar = (p: String) => p.codePointCount(0, p.length) == 1
      val pruned: Seq[(String, Double)] = prune match {
        case "count" =>
          // mirror the hard count prune: top vocabSize by (c desc,
          // piece asc), single chars unioned back in
          val top = counts.toSeq.sortBy { case (p, c) => (-c, p) }
            .take(vocabSize)
          (top ++ counts.toSeq.filter(e => isChar(e._1))).distinct
        case "likelihood" =>
          val total = counts.toSeq.sortBy(_._1).map(_._2).sum
          val scores = counts.map { case (p, c) =>
            p -> round9(math.log(c / total)) }
          val deltas = likelihoodDeltas(words, scores, L)
          val (charsE, multis) = counts.toSeq.partition(e => isChar(e._1))
          val slots = math.max(0, vocabSize - charsE.size)
          val kept = multis.map { case (p, c) => (p, deltas.getOrElse(p, 0.0), c) }
            .sortBy { case (p, d, c) => (-d, -c, p) }.take(slots)
            .map(_._1).toSet
          charsE ++ multis.filter(m => kept.contains(m._1))
      }
      val totf = pruned.sortBy(_._1).map(_._2).sum
      return pruned.sortBy(_._1)
        .map { case (p, c) => (p, c, round9(math.log(c / totf))) }
        .toDF("piece", "n", "logp")
    }

    def emRound(vocab: DataFrame): DataFrame = {
      val entries = vocab.select(col("piece"), col("c")).as[(String, Long)].collect()
      val total = entries.map(_._2).sum.toDouble
      val scores: Map[String, Double] = entries.map { case (p, c) =>
        p -> round9(math.log(c.toDouble / total))
      }.toMap
      val bc = spark.sparkContext.broadcast(scores)
      val counts = wh.select(col("w"), col("n")).as[(String, Long)]
        .mapPartitions { it =>
          val sc = bc.value
          it.flatMap { case (w, n) =>
            viterbiSegment(w, L, sc).map(p => (p, n)) }
        }.toDF("piece", "n")
        .groupBy(col("piece")).agg(sum(col("n")).as("c"))
        .localCheckpoint()
      counts.unionByName(
        charsAll.join(counts.select("piece"), Seq("piece"), "left_anti")
          .select(col("piece"), lit(1L).as("c")))
        .localCheckpoint()
    }
    var v = v0.localCheckpoint()
    for (_ <- 1 to emRounds) v = emRound(v)
    val vf = prune match {
      case "count" =>
        val topf = v.orderBy(col("c").desc, col("piece").asc).limit(vocabSize)
          .localCheckpoint()
        topf.unionByName(
          v.filter(length(col("piece")) === 1)
            .join(topf.select("piece"), Seq("piece"), "left_anti"))
          .localCheckpoint()
      case "likelihood" =>
        // SentencePiece-shaped prune: the vocab targets vocabSize TOTAL
        // — required chars first, remaining slots by removal cost.
        // Driver-side over the vocabulary-sized tables only.
        val entries = v.select(col("piece"), col("c")).as[(String, Long)].collect()
        val total = entries.map(_._2).sum.toDouble
        val scores = entries.map { case (p, c) =>
          p -> round9(math.log(c.toDouble / total)) }.toMap
        val words = wh.select(col("w"), col("n")).as[(String, Long)].collect()
        val deltas = likelihoodDeltas(words.toSeq, scores, L)
        val (chars, multis) = entries.partition { case (p, _) =>
          p.codePointCount(0, p.length) == 1 }
        val slots = math.max(0, vocabSize - chars.length)
        val keptMultis = multis
          .map { case (p, c) => (p, deltas.getOrElse(p, 0.0), c) }
          .sortBy { case (p, d, c) => (-d, -c, p) }
          .take(slots).map(_._1)
        val kept = chars.map(_._1).toSet ++ keptMultis
        v.filter(col("piece").isInCollection(kept)).localCheckpoint()
    }
    val totf = vf.agg(sum(col("c"))).as[Long].head().toDouble
    vf.select(col("piece"), col("c").as("n"),
      round(log(col("c").cast("double") / lit(totf)), 9).as("logp"))
  }

  /** Unigram-LM ENCODING — apply a trained [[unigramLmVocab]] to every
    * (doc, word) of the corpus, the T22-for-unigram step: each token
    * becomes its Viterbi-best piece sequence under the trained logp
    * scores. The vocab is collected once (vocabulary-sized) and
    * broadcast; encoding is ONE scan-bound mapPartitions pass, per word
    * O(maxPieceLen × length) with no shuffle — exactly how a
    * SentencePiece worker runs in production (the bpeEncode precedent:
    * no Catalyst expression for the dp recursion). Concatenating a
    * word's pieces always reproduces the word (segmentations are
    * partitions of it — the roundtrip invariant), and chars are always
    * in the trained vocab, so every word of the training corpus — and
    * any held-out word over its alphabet — encodes with finite score.
    */
  def unigramEncode(docs: DataFrame, vocab: DataFrame, maxPieceLen: Int = 4,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val scores: Map[String, Double] = vocab
      .select(col("piece"), col("logp")).as[(String, Double)]
      .collect().toMap
    val bc = spark.sparkContext.broadcast(scores)
    val L = maxPieceLen
    // widen: the compiled per-word Viterbi is the operator's CPU and a
    // 1-split scan would pin it (and the tokenize/explode) to one core
    // (measured ~0.9 s single-task at the bench anchor; no-op at scale)
    Dedup.widen(docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("__t")))
      .select(col("doc_id"),
        posexplode(tokens(col("__t"))).as(Seq("pos", "word")))
      .select(col("doc_id"), col("pos").cast("int").as("pos"), col("word"))
      .as[(Long, Int, String)]
      .mapPartitions { it =>
        val sc = bc.value
        it.map { case (d, p, w) =>
          val seg = viterbiSegment(w, L, sc)
          (d, p, w, seg.mkString("|"), seg.length.toLong)
        }
      }
      .toDF("doc_id", "pos", "word", "pieces", "n_pieces")
  }

  /** TextRank extractive summarization (Mihalcea & Tarau 2004) — the
    * unsupervised "pick the k most central sentences" pass a curation
    * pipeline runs for document previews, dedup exemplars and
    * training-mix cards. Sentences here are fixed `chunkTokens`-token
    * pseudo-sentences (this corpus has no punctuation; swap the
    * chunker for a real splitter and nothing else changes); the
    * within-document graph weights chunk pairs by
    * overlap / (ln(|a|+1) + ln(|b|+1)) (the paper's similarity with +1
    * smoothing so single-token chunks can't zero the denominator), and
    * `rounds` of damped weighted PageRank rank the chunks; top-`topK`
    * per document come back with their reconstructed text.
    *
    * Determinism (the d20 PageRank discipline, weighted): overlap and
    * chunk sizes are exact integers, each ln round(9)ed (generic
    * doubles — the t34 midpoint lesson), edge weight and the
    * out-weight normalizer ONE division each, the normalizer and every
    * per-round contribution sum a SORTED left fold (equal doubles are
    * interchangeable under +, so the multiset order is total) — the
    * oracle replays all `rounds` via list_sort/list_reduce and hashes
    * exactly, no tolerance compare. Isolated chunks keep the fixed
    * point (1 − d), built from the same ops on both engines (the d20
    * damping-constant lesson).
    *
    * Scale: every join and aggregate is keyed by (doc, chunk) or
    * (doc, token) — the pair join is WITHIN-document (bounded by a
    * document's own chunk count, the q26 argument; corpora grow by
    * adding documents), the per-round frames are chunk-grain, and the
    * edge-factor frame is localCheckpoint-pinned so `rounds`
    * iterations never stack recomputation (CLAUDE.md iterative
    * discipline). The only window is the per-document top-k rank over
    * ≤ chunks-per-doc rows.
    */
  def textRankSummary(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", chunkTokens: Int = 10, topK: Int = 2,
      damping: Double = 0.85, rounds: Int = 5,
      splitter: String = "fixed"): DataFrame = {
    require(chunkTokens >= 1 && topK >= 1 && rounds >= 1 &&
      damping > 0 && damping < 1, "bad textRank config")
    require(splitter == "fixed" || splitter == "sentence",
      s"splitter must be 'fixed' or 'sentence': $splitter")
    val base = lit(1.0) - lit(damping)
    // Chunking strategies (VERDICT r13 task 7): "fixed" cuts the token
    // stream every chunkTokens (the oracle row's shape — the driver
    // corpus has no punctuation); "sentence" is the punctuation/length
    // HYBRID — sentences split on [.!?]+whitespace become chunks, and a
    // sentence longer than chunkTokens subdivides fixed-width (the cap
    // keeps the within-doc pair graph bounded per chunk exactly as the
    // fixed mode does). Chunk ids in sentence mode are composite
    // (sidx·2²⁰ + piece) — TextRank needs distinct identities and a
    // deterministic document-order tie-break, not density.
    val tk = splitter match {
      case "fixed" =>
        docs.select(col(idCol).as("did"),
            posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
          .withColumn("chunk", (col("pos") / chunkTokens).cast("long"))
      case "sentence" =>
        docs.select(col(idCol).as("did"),
            posexplode(split(trim(col(textCol)), "(?<=[.!?])\\s+"))
              .as(Seq("sidx", "sent")))
          .select(col("did"), col("sidx"),
            posexplode(tokens(col("sent"))).as(Seq("pos", "tok")))
          .withColumn("chunk", col("sidx").cast("long") * lit(1L << 20) +
            (col("pos") / chunkTokens).cast("long"))
          .select(col("did"), col("pos"), col("tok"), col("chunk"))
    }
    val chunkText = tk.groupBy(col("did"), col("chunk"))
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        z => z.getField("tok"))).as("summary"))
    val dt = tk.select(col("did"), col("chunk"), col("tok")).distinct()
    val nd = dt.groupBy(col("did"), col("chunk"))
      .agg(count(lit(1)).as("nd"))
    // every join below is between CORPUS-GRAIN frames (token or chunk
    // grain — millions of rows): hint them shuffle_hash so a generous
    // autoBroadcastJoinThreshold can never "promote" a multi-million-row
    // frame into a driver-built broadcast table (measured: the 64MB
    // bench threshold broadcast the per-round rank frame at sf1 —
    // 4× slower than the same query at sf10 where it no longer fit)
    val ed = dt.as("a").join(dt.as("b").hint("shuffle_hash"),
        col("a.did") === col("b.did") && col("a.tok") === col("b.tok") &&
          col("a.chunk") =!= col("b.chunk"))
      .groupBy(col("a.did").as("did"), col("a.chunk").as("ca"),
        col("b.chunk").as("cb"))
      .agg(count(lit(1)).as("ov"))
    val wts = ed
      .join(nd.select(col("did"), col("chunk").as("ca"), col("nd").as("nda"))
        .hint("shuffle_hash"), Seq("did", "ca"))
      .join(nd.select(col("did"), col("chunk").as("cb"), col("nd").as("ndb"))
        .hint("shuffle_hash"), Seq("did", "cb"))
      .select(col("did"), col("ca"), col("cb"),
        (col("ov").cast("double")
          / (round(log((col("nda") + lit(1L)).cast("double")), 9)
            + round(log((col("ndb") + lit(1L)).cast("double")), 9))).as("w"))
    // COMPILED per-document PageRank (VERDICT r14 task 4, the q55
    // sequential-DP precedent, guide §2.4): the graph is WITHIN-document
    // (bounded by a doc's own chunk count — corpora scale by adding
    // documents), yet the declarative loop paid 2 corpus-wide exchanges
    // PER ROUND (score join + rank aggregate: 10 exchanges at rounds=5)
    // plus an interpreted sort_array/aggregate fold per group per round.
    // Collapse the normalizer + all `rounds` rounds into ONE
    // (did)-keyed collect and a compiled per-doc loop — exchange count
    // for the whole iteration: 10+2 → 1. Arithmetic is bit-identical to
    // the declarative form (the oracle replays it unchanged):
    //  - wsum / per-round contribution sums: ASCENDING-sorted left
    //    folds from 0.0 (java.util.Arrays.sort IS sort_array's double
    //    order; += IS the HOF's `acc + x`);
    //  - f = w / wsum, c = f·rank, rank' = base + damping·Σ — the same
    //    single double ops in the same association order;
    //  - round-r rank keys are the distinct TARGETS of edges whose
    //    source held a round-(r−1) rank, exactly the join→groupBy
    //    dataflow (symmetric edges make that every non-isolated chunk).
    val perDoc = wts.groupBy(col("did"))
      .agg(collect_list(struct(col("ca"), col("cb"), col("w"))).as("es"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      perDoc.schema("did"),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    def sortedFold(xs: Array[Double]): Double = {
      java.util.Arrays.sort(xs)
      var acc = 0.0
      var i = 0
      while (i < xs.length) { acc += xs(i); i += 1 }
      acc
    }
    val dampingL = damping; val roundsL = rounds
    val rank = perDoc.flatMap { r =>
      import scala.collection.mutable
      val baseL = 1.0 - dampingL // same ops as lit(1.0) - lit(damping)
      val es = r.getSeq[org.apache.spark.sql.Row](1)
      val bySrc = mutable.LongMap.empty[mutable.ArrayBuffer[(Long, Double)]]
      es.foreach { e =>
        bySrc.getOrElseUpdate(e.getLong(0), mutable.ArrayBuffer.empty) +=
          ((e.getLong(1), e.getDouble(2)))
      }
      // out-weight normalizer per source, then f = w/wsum per edge
      val edges = bySrc.iterator.flatMap { case (ca, out) =>
        val wsum = sortedFold(out.map(_._2).toArray)
        out.iterator.map { case (cb, w) => (ca, cb, w / wsum) }
      }.toArray
      var rk = mutable.LongMap.empty[Double]
      bySrc.keysIterator.foreach(ca => rk(ca) = 1.0)
      for (_ <- 1 to roundsL) {
        val contrib = mutable.LongMap.empty[mutable.ArrayBuffer[Double]]
        edges.foreach { case (ca, cb, f) =>
          rk.get(ca).foreach { rv =>
            contrib.getOrElseUpdate(cb, mutable.ArrayBuffer.empty) += f * rv
          }
        }
        val next = mutable.LongMap.empty[Double]
        contrib.foreach { case (cb, cs) =>
          next(cb) = baseL + dampingL * sortedFold(cs.toArray)
        }
        rk = next
      }
      val did = r.get(0)
      rk.iterator.map { case (v, rv) =>
        org.apache.spark.sql.Row(did, v, rv)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF("did", "v", "rank")
    val fin = nd.select(col("did"), col("chunk"))
      .join(rank.withColumnRenamed("v", "chunk").hint("shuffle_hash"),
        Seq("did", "chunk"), "left_outer")
      .withColumn("rank", coalesce(col("rank"), base))
    import org.apache.spark.sql.expressions.Window
    fin.withColumn("srank", row_number().over(
        Window.partitionBy(col("did"))
          .orderBy(col("rank").desc, col("chunk").asc)))
      .filter(col("srank") <= topK)
      .join(chunkText.hint("shuffle_hash"), Seq("did", "chunk"))
      .select(col("did").as(idCol), col("srank").cast("long").as("srank"),
        col("chunk"), col("rank"), col("summary"))
  }

  /** Trained model-based quality classifier — full-batch logistic
    * regression by gradient descent, the distributed shape MLlib's own
    * LogisticRegression runs (k rounds × ONE aggregate scan): the
    * fastText/DCLM-style "train a cheap classifier, gate the corpus
    * with it" stage expressed inside the engine. Features per document
    * are one-division exact ratios off a single (doc, token)-grain
    * aggregate — type-token ratio, max-token-frequency ratio, mean
    * token length — then STANDARDIZED ((x−μ)/σ, what makes plain GD
    * converge instead of bouncing on badly-conditioned raw scales);
    * label = any Boolean `isPositive` column.
    *
    * Determinism (the d20/t20 discipline, applied to GD): μ and σ come
    * from round(9)/DECIMAL(20,9) power sums (order-independent), σ via
    * IEEE sqrt (correctly rounded, engine-identical); per-row gradient
    * terms (sigmoid−y)·x_j are round(9)ed into DECIMAL(20,9) so each
    * round's gradient sum is exact; the weight update w − lr·(g/n) is
    * the same three double ops on the driver as in the oracle's SQL.
    * The sigmoid itself is deliberately NOT pre-rounded: rounding it to
    * the 1e-9 grid and then rounding grid-multiples again at the term
    * scale lands EXACTLY on decimal midpoints, where Spark's
    * shortest-repr HALF_UP and DuckDB's double-arithmetic round
    * disagree (~5% of rows — measured). Raw sigmoid keeps every term
    * generic, so the single round(9) decides identically; the residual
    * exp-ulp risk needs a libm disagreement to COINCIDE with a 5e-10
    * rounding boundary (JVM and C libm exp agreed on every tested
    * input; multiplicatively rare). Accuracy is an integer count at
    * the round's INPUT weights (round 1: all-zero weights ⇒ sigmoid
    * exactly 0.5 ⇒ all predicted positive — boundary-deterministic).
    *
    * Scale: one (doc, token) aggregate + one doc-grain aggregate build
    * features; standardization is a 1-row broadcast; each GD round is
    * one map-side-combined aggregate over the localCheckpoint-pinned
    * feature frame returning four decimal sums — rounds × one pass,
    * driver state is the 4-double weight vector. No shuffle grows with
    * rounds or corpus width.
    */
  /** The trained artifact [[trainQualityClassifier]] produces and a
    * per-ROW scorer consumes: weights over (1, x1, x2, x3) plus the
    * standardization constants — 10 doubles, the whole "model".
    */
  case class QualityModel(w: Array[Double], mu: Array[Double],
      sd: Array[Double])

  def trainQualityClassifier(docs: DataFrame, isPositive: Column,
      textCol: String = "text", idCol: String = "doc_id",
      rounds: Int = 4, lrate: Double = 2.0): DataFrame =
    trainQuality(docs, isPositive, textCol, idCol, rounds, lrate)._1

  /** [[trainQualityClassifier]]'s trained model — what a serving gate
    * (ST36) scores against.
    */
  def trainQualityModel(docs: DataFrame, isPositive: Column,
      textCol: String = "text", idCol: String = "doc_id",
      rounds: Int = 4, lrate: Double = 2.0): QualityModel =
    trainQuality(docs, isPositive, textCol, idCol, rounds, lrate)._2

  /** Shared feature stage of [[trainQuality]] / [[trainQualityNgram]]:
    * the corpus collapsed to per-doc distributional stats (TTR, max
    * token frequency ratio, mean token length), standardized against
    * exact decimal power sums. Returns the UNPINNED (did, y, x1, x2,
    * x3) frame plus (n, μ, σ).
    */
  /** The (did, y, __t) projection both trainers tokenize/hash: widened
    * BEFORE the CPU-heavy explode stages so a single-row-group parquet
    * scan doesn't pin tokenization + gram hashing to one core (the
    * measured t30/m9 idiom; a no-op at real scale). Both the stat and
    * the gram branch read the SAME widened subtree, so the exchange is
    * planned once and reused (one scan, one repartition).
    */
  private def qualityBase(docs: DataFrame, isPositive: Column,
      textCol: String, idCol: String): DataFrame =
    Dedup.widen(docs.select(col(idCol).as("did"),
      when(isPositive, lit(1.0)).otherwise(lit(0.0)).as("y"),
      col(textCol).as("__t")))

  private def standardizedStats(base: DataFrame)
      : (DataFrame, Long, Array[Double], Array[Double]) = {
    val tokc = base.select(col("did"), col("y"),
        explode(tokens(col("__t"))).as("tok"))
      .groupBy(col("did"), col("y"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .withColumn("tl", length(col("tok")).cast("long"))
    val raw = tokc.groupBy(col("did"), col("y"))
      .agg((count(lit(1)).cast("double") / sum(col("c")).cast("double")).as("r1"),
        (max(col("c")).cast("double") / sum(col("c")).cast("double")).as("r2"),
        (sum(col("c") * col("tl")).cast("double")
          / sum(col("c")).cast("double")).as("r3"))
    // SF bound (ADVICE r13, the t26 DECIMAL→DOUBLE cast budget): these
    // scale-9 power sums stay engine-identical on the final cast only
    // while |sum|·10⁹ < 2⁵³, i.e. ≲9·10⁶ summed magnitude. r1/r2 ∈
    // (0,1] are safe to ~9M docs; r3 (mean token length, ~5–10) and
    // r3² (~25–100) cross the budget first, around 10⁵–10⁶ docs —
    // sf10-magnitude corpora. Past that the 1-ulp cast split can reach
    // the intercept (the t26 lesson). Oracle-checked SFs (0.01/0.1)
    // sit far inside the bound; re-scale BOTH sides to round(·,6)/
    // DECIMAL(20,6) if a larger SF ever needs hash-exact oracle runs.
    def s1s2(c: Column) = Seq(
      sum(round(c, 9).cast("decimal(20,9)")),
      sum(round(c * c, 9).cast("decimal(20,9)")))
    val st = raw.agg(count(lit(1)).as("n"),
      s1s2(col("r1"))(0).as("a1"), s1s2(col("r1"))(1).as("b1"),
      s1s2(col("r2"))(0).as("a2"), s1s2(col("r2"))(1).as("b2"),
      s1s2(col("r3"))(0).as("a3"), s1s2(col("r3"))(1).as("b3"))
      .collect()(0)
    val nD = st.getLong(0).toDouble
    // μ = S1/n, σ = sqrt(S2/n − μ²) — mirrored verbatim in the oracle
    val mu = Array.tabulate(3)(j => st.getDecimal(1 + 2 * j).doubleValue / nD)
    val sd = Array.tabulate(3)(j =>
      math.sqrt(st.getDecimal(2 + 2 * j).doubleValue / nD - mu(j) * mu(j)))
    require(sd.forall(s => s > 0 && !s.isNaN),
      s"degenerate feature (zero variance): ${sd.mkString(",")}")
    val feats = raw.select(col("did"), col("y"),
        ((col("r1") - lit(mu(0))) / lit(sd(0))).as("x1"),
        ((col("r2") - lit(mu(1))) / lit(sd(1))).as("x2"),
        ((col("r3") - lit(mu(2))) / lit(sd(2))).as("x3"))
    (feats, st.getLong(0), mu, sd)
  }

  private def trainQuality(docs: DataFrame, isPositive: Column,
      textCol: String, idCol: String,
      rounds: Int, lrate: Double): (DataFrame, QualityModel) = {
    require(rounds >= 1 && rounds <= 20, s"rounds out of range: $rounds")
    val spark = docs.sparkSession
    val (feats0, n, mu, sd) =
      standardizedStats(qualityBase(docs, isPositive, textCol, idCol))
    val nD = n.toDouble
    // NO pre-checkpoint widen here, deliberately: this trainer's round
    // aggregate is 5 columns (~0.3 core-s at the bench anchor), so the
    // AQE-coalesced single partition costs less than the extra exchange
    // + AQE stage barriers would (measured: widening t34 cost +0.5 s
    // net). trainQualityNgram's buckets+5-column round IS widened —
    // see there.
    val feats = feats0.localCheckpoint()
    var w = Array(0.0, 0.0, 0.0, 0.0)
    val trace = Seq.newBuilder[(Int, Long, Double, Double, Double, Double)]
    for (r <- 1 to rounds) {
      val z = lit(w(0)) + lit(w(1)) * col("x1") +
        lit(w(2)) * col("x2") + lit(w(3)) * col("x3")
      // Fence pins the sigmoid to ONE evaluation per row — without it
      // CollapseProject inlines the exp into all five aggregates
      val scored = feats.withColumn("ph",
        graft.functions.Fence(lit(1.0) / (lit(1.0) + exp(-z))))
      val resid = col("ph") - col("y")
      def g(x: Column) = sum(round(resid * x, 9).cast("decimal(20,9)"))
      val row = scored.agg(
        g(lit(1.0)).as("g0"), g(col("x1")).as("g1"),
        g(col("x2")).as("g2"), g(col("x3")).as("g3"),
        sum(when((col("ph") >= lit(0.5)) === (col("y") === lit(1.0)), 1L)
          .otherwise(0L)).as("nc")).collect()(0)
      val gs = (0 to 3).map(i => row.getDecimal(i).doubleValue)
      w = Array.tabulate(4)(j => w(j) - lrate * (gs(j) / nD))
      trace += ((r, row.getLong(4), w(0), w(1), w(2), w(3)))
    }
    import spark.implicits._
    val traceDf = trace.result()
      .toDF("round", "n_correct", "w0", "w1", "w2", "w3")
      .select(col("round").cast("long").as("round"), col("n_correct"),
        col("w0"), col("w1"), col("w2"), col("w3"))
      .orderBy(col("round"))
    (traceDf, QualityModel(w, mu, sd))
  }

  /** A trained [[trainQualityNgram]] model: intercept+stat weights
    * `w` (4), bucket weights `wb` (`buckets`), the standardization
    * (μ, σ) and the gram config — buckets+10 driver doubles total,
    * bounded by the FIXED feature space, never the corpus.
    */
  case class NgramQualityModel(w: Array[Double], wb: Array[Double],
      mu: Array[Double], sd: Array[Double], n: Int, buckets: Int)

  def trainQualityNgramClassifier(docs: DataFrame, isPositive: Column,
      n: Int = 3, buckets: Int = 64, textCol: String = "text",
      idCol: String = "doc_id", rounds: Int = 4,
      lrate: Double = 2.0): DataFrame =
    trainQualityNgram(docs, isPositive, n, buckets, textCol, idCol,
      rounds, lrate)._1

  def trainQualityNgramModel(docs: DataFrame, isPositive: Column,
      n: Int = 3, buckets: Int = 64, textCol: String = "text",
      idCol: String = "doc_id", rounds: Int = 4,
      lrate: Double = 2.0): NgramQualityModel =
    trainQualityNgram(docs, isPositive, n, buckets, textCol, idCol,
      rounds, lrate)._2

  /** T36 — [[trainQuality]] upgraded to fastText-class HASHED N-GRAM
    * features (the published fastText/DCLM-style quality gate's actual
    * feature family, VERDICT r13 task 3): the three distributional
    * stats PLUS a `buckets`-wide hashed char-n-gram term-frequency
    * vector per document ([[graft.functions.CharNGramBuckets]] — T23's
    * hashing trick, so the feature space and the model stay FIXED at
    * buckets+4 weights at any corpus size; that is what lets real
    * quality signals — topic, boilerplate phrasing — reach a model the
    * 4-stat gate is provably blind to, spec-pinned). Same full-batch
    * logistic GD, same ONE-aggregate-per-round plan: the bucket
    * gradients ride the SAME aggregate scan as the stat gradients
    * (buckets+5 agg columns, map-side partial) — no second shuffle, no
    * explode in the round loop.
    *
    * Exactness: bucket features are integer-ratio divisions
    * (gram-count/total ∈ [0,1] — inside the DECIMAL cast budget at any
    * corpus size, unlike r3); the z bucket contribution folds zip_with
    * products in index order from 0.0 (left fold — DuckDB
    * list_reduce(list_prepend(0.0, …)) mirrors bit-for-bit); gradients
    * are round(·,9) DECIMAL(20,9) sums (the t34 discipline). Output
    * trace per round: (round, n_correct, w0..w3, wb_sum) with wb_sum
    * the index-ordered left fold of the bucket weights.
    */
  private def trainQualityNgram(docs: DataFrame, isPositive: Column,
      n: Int, buckets: Int, textCol: String, idCol: String,
      rounds: Int, lrate: Double): (DataFrame, NgramQualityModel) = {
    require(rounds >= 1 && rounds <= 20, s"rounds out of range: $rounds")
    require(buckets >= 2 && buckets <= 4096,
      s"buckets out of range for the one-aggregate gradient plan: $buckets")
    val spark = docs.sparkSession
    val base = qualityBase(docs, isPositive, textCol, idCol)
    val (stats, nDocs, mu, sd) = standardizedStats(base)
    val nD = nDocs.toDouble
    // hashed-gram term frequencies, collapsed to (doc, bucket) grain
    // then densified to a fixed-width array — the model join shape.
    // Reads the SAME widened base subtree as the stat branch: one scan,
    // one repartition, exchange reused. The explicit did-hash exchange
    // before the densify keeps the map-building + 64-slot transform at
    // cluster width (groupBy(did) reuses the partitioning — no second
    // exchange); AQE otherwise coalesced this tiny-byte CPU-dense stage
    // to ONE partition (measured 0.7 s single-task). A buckets-wide
    // conditional-sum single aggregate was measured SLOWER (O(buckets)
    // per gram row instead of O(1)): 5.1 s vs 3.6 s whole-query.
    val bc = base
      .select(col("did"),
        explode(graft.functions.CharNGramBuckets(col("__t"), n, buckets))
          .as("b"))
      .groupBy(col("did"), col("b")).agg(count(lit(1)).as("c"))
    // widenBy, not a bare repartition (ADVICE r14): REPARTITION_BY_NUM
    // is exempt from AQE resizing, so an unconditional fixed-width
    // exchange would NARROW an AQE-sized plan at real scale; the
    // leafSplits guard makes it a no-op once the scan arrives wide.
    val dense = Dedup.widenBy(bc, col("did"))
      .groupBy(col("did"))
      .agg(map_from_entries(collect_list(struct(col("b"), col("c"))))
          .as("__m"),
        sum(col("c")).as("__tot"))
      // tf × buckets ≈ unit scale under uniform hashing — the gram
      // features must be commensurate with the standardized stats or
      // GD chases stat noise for dozens of rounds (measured: unscaled
      // tf ~0.05 left the planted registry corpus at 65% after 4
      // rounds; scaled, it separates in 2). Exact ops: integer-ratio
      // division then one multiply by the integer constant.
      .select(col("did"), transform(sequence(lit(0L), lit(buckets - 1L)),
        i => coalesce(try_element_at(col("__m"), i), lit(0L)).cast("double")
          / col("__tot").cast("double") * lit(buckets.toDouble)).as("xb"))
    val zeroVec = array_repeat(lit(0.0), buckets)
    // same single-task pin as trainQuality (see there): widen to the
    // cluster before the checkpoint so the `rounds` gradient scans —
    // interpreted zip_with dot + buckets+5 decimal aggregates per row —
    // run at cluster width instead of on one AQE-coalesced partition
    val feats = Dedup.widenBy(stats.join(dense, Seq("did"), "left")
        .withColumn("xb", coalesce(col("xb"), zeroVec)), col("did"))
      .localCheckpoint()
    // COMPILED gradient rounds (VERDICT r14 task 3, the q55 precedent,
    // guide §1.2 "per-task work"): the declarative round was ONE
    // aggregate scan, but its per-row cost was an INTERPRETED
    // zip_with/aggregate dot over `buckets` slots plus buckets+5
    // round(·,9)→DECIMAL(20,9) aggregate columns — measured as the
    // dominant task CPU of the 4 GD jobs. The mapPartitions pass below
    // computes the identical numbers in compiled code:
    //  - dot: index-ordered left fold of xb(i)·wb(i) from 0.0 — the
    //    exact zip_with+aggregate association order;
    //  - z/ph: the same double-op association as the Column expression
    //    (((w0 + w1·x1) + w2·x2) + w3·x3) + dot; math.exp IS Catalyst's
    //    Exp (java.lang.Math.exp);
    //  - gradient terms: round(resid·x, 9) then the DECIMAL(20,9) cast,
    //    both via BigDecimal.valueOf + HALF_UP — bit-for-bit Catalyst's
    //    Round and Cast — summed as exact unscaled integers (the same
    //    order-independent exact sum the decimal aggregate ran); a term
    //    whose unscaled value exceeds Long is an ArithmeticException
    //    here exactly where DECIMAL(20,9) would overflow in the agg.
    // One job per round, map-side partials via mapPartitions+reduce, no
    // shuffle — the same distributed shape, ~buckets× less per-row CPU.
    val featRows = feats
      .select(col("y"), col("x1"), col("x2"), col("x3"), col("xb"))
      .queryExecution.toRdd
    def r9u(v: Double): Long = {
      val rd = java.math.BigDecimal.valueOf(v)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
      java.math.BigDecimal.valueOf(rd)
        .setScale(9, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    }
    var w = Array(0.0, 0.0, 0.0, 0.0)
    var wb = Array.fill(buckets)(0.0)
    val trace = Seq.newBuilder[(Int, Long, Double, Double, Double, Double, Double)]
    for (r <- 1 to rounds) {
      val wL = w; val wbL = wb; val nSlots = buckets + 4
      val (gs9, nc) = featRows.mapPartitions { it =>
        // exact unscaled-integer accumulation: long fast path, spill to
        // BigInteger on (astronomically rare) partition-sum overflow —
        // the decimal aggregate's sum was exact at DECIMAL(30,9), so
        // the compiled sum must not silently wrap either
        val lo = new Array[Long](nSlots)
        var big: Array[java.math.BigInteger] = null
        def add(i: Int, v: Long): Unit = {
          val s = lo(i) + v
          if (((lo(i) ^ s) & (v ^ s)) < 0L) {
            if (big == null) big = Array.fill(nSlots)(java.math.BigInteger.ZERO)
            big(i) = big(i).add(java.math.BigInteger.valueOf(lo(i)))
              .add(java.math.BigInteger.valueOf(v))
            lo(i) = 0L
          } else lo(i) = s
        }
        var ncAcc = 0L
        while (it.hasNext) {
          val row = it.next()
          val y = row.getDouble(0)
          val x1 = row.getDouble(1); val x2 = row.getDouble(2)
          val x3 = row.getDouble(3)
          val xb = row.getArray(4).toDoubleArray()
          var dot = 0.0
          var i = 0
          while (i < buckets) { dot += xb(i) * wbL(i); i += 1 }
          val z = wL(0) + wL(1) * x1 + wL(2) * x2 + wL(3) * x3 + dot
          val ph = 1.0 / (1.0 + math.exp(-z))
          val resid = ph - y
          add(0, r9u(resid))
          add(1, r9u(resid * x1)); add(2, r9u(resid * x2))
          add(3, r9u(resid * x3))
          i = 0
          while (i < buckets) { add(4 + i, r9u(resid * xb(i))); i += 1 }
          if ((ph >= 0.5) == (y == 1.0)) ncAcc += 1L
        }
        val tot = Array.tabulate(nSlots) { i =>
          val l = java.math.BigInteger.valueOf(lo(i))
          if (big == null) l else big(i).add(l)
        }
        Iterator.single((tot, ncAcc))
      }.reduce { (a, b) =>
        (Array.tabulate(nSlots)(i => a._1(i).add(b._1(i))), a._2 + b._2)
      }
      def gAt(i: Int): Double =
        new java.math.BigDecimal(gs9(i), 9).doubleValue()
      w = Array.tabulate(4)(j => w(j) - lrate * (gAt(j) / nD))
      wb = Array.tabulate(buckets)(b => wb(b) - lrate * (gAt(4 + b) / nD))
      val wbSum = wb.foldLeft(0.0)(_ + _)
      trace += ((r, nc, w(0), w(1), w(2), w(3), wbSum))
    }
    import spark.implicits._
    val traceDf = trace.result()
      .toDF("round", "n_correct", "w0", "w1", "w2", "w3", "wb_sum")
      .select(col("round").cast("long").as("round"), col("n_correct"),
        col("w0"), col("w1"), col("w2"), col("w3"), col("wb_sum"))
      .orderBy(col("round"))
    (traceDf, NgramQualityModel(w, wb, mu, sd, n, buckets))
  }

  /** Score ONE row's text against a trained [[NgramQualityModel]]
    * without any aggregate exchange — the serving/gate shape: per-row
    * stat folds ([[qualityScore]]'s), the same CharNGramBuckets gram
    * pass, a bounded in-row bucket-count fold, and the identical
    * index-ordered dot fold — bit-equal to batch scoring (spec-pinned).
    */
  def qualityScoreNgram(text: Column, model: NgramQualityModel): Column = {
    val bks = graft.functions.CharNGramBuckets(text, model.n, model.buckets)
    val counts = aggregate(bks,
      array_repeat(lit(0L), model.buckets),
      (acc, b) => transform(acc, (v, i) =>
        when(i.cast("long") === b, v + 1L).otherwise(v)))
    val tot = size(bks).cast("long")
    // tot == 0 (text shorter than n code points) mirrors the batch
    // left-join miss: an all-zero bucket vector, dot 0.0 — never NaN
    val dot = when(tot > 0L, aggregate(
      zip_with(counts, typedLit(model.wb.toSeq),
        (c, wv) => c.cast("double") / tot.cast("double")
          * lit(model.buckets.toDouble) * wv),
      lit(0.0), (acc, v) => acc + v)).otherwise(lit(0.0))
    val statZ = {
      val toks = tokens(text)
      val nTok = size(toks).cast("long")
      val sumLen = aggregate(toks, lit(0L), (a, t) => a + length(t).cast("long"))
      val nDistinct = size(array_distinct(toks)).cast("long")
      val maxFreq = aggregate(sort_array(toks),
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (s, t) => {
          val run = when(t === s.getField("prev"),
            s.getField("run") + 1L).otherwise(lit(1L))
          struct(t.as("prev"), run.as("run"),
            greatest(s.getField("best"), run).as("best"))
        },
        s => s.getField("best"))
      def std(rv: Column, j: Int) = (rv - lit(model.mu(j))) / lit(model.sd(j))
      lit(model.w(0)) +
        lit(model.w(1)) * std(nDistinct.cast("double") / nTok.cast("double"), 0) +
        lit(model.w(2)) * std(maxFreq.cast("double") / nTok.cast("double"), 1) +
        lit(model.w(3)) * std(sumLen.cast("double") / nTok.cast("double"), 2)
    }
    lit(1.0) / (lit(1.0) + exp(-(statZ + dot)))
  }

  /** Score ONE row's text against a trained [[QualityModel]] without
    * any aggregate — the shape a streaming gate needs (no shuffle, no
    * state). The per-row feature folds produce the IDENTICAL integers
    * the batch (doc, token) aggregate derives — token count, summed
    * token length, distinct-token count, max token frequency (a run
    * fold over the SORTED token array) — so the standardized features,
    * the z fold and the sigmoid are bit-equal to scoring the same
    * document batch-side (spec-pinned).
    */
  def qualityScore(text: Column, model: QualityModel): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (a, t) => a + length(t).cast("long"))
    val nDistinct = size(array_distinct(toks)).cast("long")
    // max run length in the sorted array == max token frequency
    val maxFreq = aggregate(sort_array(toks),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (s, t) => {
        val run = when(t === s.getField("prev"),
          s.getField("run") + 1L).otherwise(lit(1L))
        struct(t.as("prev"), run.as("run"),
          greatest(s.getField("best"), run).as("best"))
      },
      s => s.getField("best"))
    def std(r: Column, j: Int) = (r - lit(model.mu(j))) / lit(model.sd(j))
    val x1 = std(nDistinct.cast("double") / n.cast("double"), 0)
    val x2 = std(maxFreq.cast("double") / n.cast("double"), 1)
    val x3 = std(sumLen.cast("double") / n.cast("double"), 2)
    val z = lit(model.w(0)) + lit(model.w(1)) * x1 +
      lit(model.w(2)) * x2 + lit(model.w(3)) * x3
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Gopher's published English stopword screen (Rae et al. 2021,
    * appendix A1.1): a document must contain ≥ 2 distinct of these.
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher rule-based document filter (Rae et al. 2021, appendix
    * A1.1 — the published heuristic gate MassiveWeb was cleaned with,
    * since reused by C4-descendant corpora): per-document boolean
    * verdicts for each rule plus the composite `keep`.
    *
    * Rules (document-level):
    *  - word count within [minWords, maxWords];
    *  - mean word length within [3, 10] characters;
    *  - symbol-to-word ratio ("#" / "..." / "…" tokens) ≤ 0.1;
    *  - ≥ 80% of words contain at least one alphabetic character;
    *  - at least 2 DISTINCT stopwords from the Gopher list
    *    (the "no natural English" screen);
    *  - line-level: ≤ 90% of lines start with a bullet, ≤ 30% end in
    *    an ellipsis.
    *
    * Determinism: every ratio rule is stated as an exact INTEGER
    * cross-multiplication (5·n_alpha ≥ 4·n_words, not a double ≥ 0.8
    * compare), so the verdicts are engine-bit-exact with no rounding
    * discipline at all; the only double emitted is `mean_word_len`,
    * ONE division of two exact longs.
    *
    * Scale: one explode → doc-grain hash aggregate (map-side combined;
    * the line stats ride the same aggregate as MIN over a per-row
    * constant, so the corpus is scanned ONCE and only doc-grain rows
    * cross the exchange). The distinct-stopword count is a Spark
    * distinct-aggregate rewrite (Expand over the tiny stopword branch).
    *
    * `stopwords` defaults to the paper's English list; a corpus in
    * another language (or a synthetic one, like the registry row)
    * passes its own common-word list — the rule's intent is "contains
    * natural corpus-language", not those eight literals.
    */
  def gopherQualityFlags(docs: DataFrame, minWords: Long = 50L,
      maxWords: Long = 100000L,
      stopwords: Seq[String] = GopherStopwords, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val lines = split(col(textCol), "\n")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("•"))).cast("long")
    val nEllipsis = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…"))).cast("long")
    val w = col("w")
    val perDoc = docs
      .select(col(idCol).as("doc_id"), nLines.as("nl"), nBullet.as("nb"),
        nEllipsis.as("ne"), explode(tokens(col(textCol))).as("w"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(w).cast("long")).as("sum_len"),
        sum(when(w.rlike("[A-Za-z]"), 1L).otherwise(0L)).as("n_alpha"),
        sum(when(w === "#" || w === "..." || w === "…", 1L)
          .otherwise(0L)).as("n_sym"),
        count_distinct(when(w.isin(stopwords: _*), w)).as("n_stop"),
        min(col("nl")).as("n_lines"), min(col("nb")).as("n_bullet"),
        min(col("ne")).as("n_ellipsis"))
    perDoc.select(
      col("doc_id"), col("n_words"),
      (col("sum_len").cast("double") / col("n_words").cast("double"))
        .as("mean_word_len"),
      (col("n_words") >= minWords && col("n_words") <= maxWords)
        .as("f_word_count"),
      (col("sum_len") >= lit(3L) * col("n_words")
        && col("sum_len") <= lit(10L) * col("n_words")).as("f_mean_len"),
      (lit(10L) * col("n_sym") <= col("n_words")).as("f_symbol"),
      (lit(5L) * col("n_alpha") >= lit(4L) * col("n_words")).as("f_alpha"),
      (col("n_stop") >= 2L).as("f_stopwords"),
      (lit(10L) * col("n_bullet") <= lit(9L) * col("n_lines")).as("f_bullet"),
      (lit(10L) * col("n_ellipsis") <= lit(3L) * col("n_lines")).as("f_ellipsis"))
      .withColumn("keep",
        col("f_word_count") && col("f_mean_len") && col("f_symbol")
          && col("f_alpha") && col("f_stopwords") && col("f_bullet")
          && col("f_ellipsis"))
  }
}
