package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora.
  *
  * Scale design: every op is a declarative plan — tokenize/explode,
  * shuffle ONCE on the blocking key (band signature / source), then a
  * co-partitioned self-join for verification. No driver-side loops; all
  * hashing is md5 (codegen'd) so the same signatures are reproducible in
  * any engine.
  */
object Dedup {

  /** Fan a narrow input out to the cluster's parallelism before
    * CPU-heavy per-row stages (hashing/shingling). A single-row-group
    * parquet file arrives as ONE partition and would otherwise pin the
    * whole signature computation to one core; at real scale inputs have
    * ≥ defaultParallelism partitions and this is a no-op.
    */
  /** Split-count estimate used by [[widen]]/[[widenBy]]: file leaves
    * from the file index (bytes / maxPartitionBytes — no physical
    * planning just for a partition count), checkpoint/RDD leaves from
    * their (already materialized, free) RDD partition count, local test
    * relations as 1; anything else is assumed already wide.
    */
  private def leafSplits(df: DataFrame): Long = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val maxSplit = math.max(1L, spark.sessionState.conf.filesMaxPartitionBytes)
    df.queryExecution.optimizedPlan.collectLeaves().map {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.sizeInBytes / maxSplit + 1
          case _ => p.toLong
        }
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        math.max(1L, r.rdd.getNumPartitions.toLong)
      case _ => p.toLong // incl. LocalRelation: in-memory test frames
                         // keep widen() a no-op (spec plan stability)
    }.sum
  }

  /** Fan a narrow input out to the cluster's parallelism before
    * CPU-heavy per-row stages (hashing/shingling). A single-row-group
    * parquet file arrives as ONE partition and would otherwise pin the
    * whole signature computation to one core; at real scale inputs have
    * ≥ defaultParallelism partitions and this is a no-op.
    */
  private[graft] def widen(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (leafSplits(df) < p) df.repartition(p) else df
  }

  /** [[widen]]'s key-clustered sibling: fan a narrow input out to the
    * cluster BY `keys`, so every downstream operator clustered on those
    * keys (joins, groupBys on `keys` or a superset) reuses this ONE
    * exchange at full width instead of having its own exchange
    * AQE-coalesced to a single tiny-byte partition (which pins the
    * CPU-dense reducer side — pair verification, per-group folds — to
    * one core; measured on d37: two ~1.9 s single-task stages, 4.1 →
    * 1.1 s whole-query after). Same leaf-size heuristic as [[widen]]: a
    * no-op at real scale, where the scan already arrives ≥
    * defaultParallelism splits and AQE sizes the exchange itself.
    */
  private[graft] def widenBy(df: DataFrame, keys: Column*): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (leafSplits(df) < p) df.repartition(p, keys: _*) else df
  }

  /** Exact dedup: hash-groupBy on content. One shuffle on md5(text). */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Span-level dedup with reassembly — the C4-style sub-document pass:
    * documents are cut into fixed `spanTokens`-token spans, a span that
    * appears anywhere else in the corpus survives only at its globally
    * FIRST occurrence (min (doc_id, position)), and each document is
    * reassembled from its surviving spans in order. This removes the
    * repeated boilerplate that document-level dedup (d1/d2) cannot — the
    * documents AROUND a shared paragraph differ, so only the span
    * granularity catches it.
    *
    * Scale shape: span text crosses NO exchange. The span array is built
    * in-row (one `transform` over the token array); the global
    * first-occurrence argmin runs on (md5, doc_id·2²⁰+pos) — a single
    * packed-long `min` per hash, the map-side-partial argmin pattern —
    * and the keep-decision joins back on the hash carrying only (doc_id,
    * pos) pairs. Reassembly is one doc_id-keyed join that filters the
    * in-row span array by the kept positions. Two hash-keyed exchanges
    * (agg + join, canonically identical child ⇒ AQE ReusedExchange) and
    * one doc_id exchange, all narrow. Documents whose every span is
    * owned elsewhere drop out (nothing left to reassemble).
    *
    * Position packing bounds: pos < 2²⁰ spans per document and
    * doc_id < 2⁴³ — both generous at 100 TB (a 2²⁰-span doc at
    * spanTokens=5 is a 5M-token document).
    */
  def spanDedup(docs: DataFrame, spanTokens: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(spanTokens >= 1, s"spanTokens must be >= 1: $spanTokens")
    val k = spanTokens
    val arr = docs.select(col(idCol).as("doc_id"),
      split(trim(col(textCol)), "\\s+").as("a"))
    // Fence pins the span-array build to ONE evaluation per row —
    // without it InferFiltersFromGenerate inlines the whole transform
    // into size()/isnotnull() filters below the posexplode (3× per row)
    val withSpans = arr.select(col("doc_id"),
      graft.functions.Fence(
        expr(s"transform(sequence(0, ((size(a) + ${k - 1}) div $k) - 1), " +
          s"i -> concat_ws(' ', slice(a, i * $k + 1, $k)))")).as("sp"))
    val keyed = withSpans
      .select(col("doc_id"), posexplode(col("sp")).as(Seq("pos", "span")))
      .select(col("doc_id"), col("pos"), md5(col("span")).as("h"),
        (col("doc_id") * lit(1048576L) + col("pos")).as("okey"))
    val firsts = keyed.groupBy(col("h")).agg(min(col("okey")).as("keep_key"))
    val keptPos = keyed.join(firsts, "h")
      .filter(col("okey") === col("keep_key"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("keep_pos"))
    withSpans.join(keptPos, "doc_id")
      .select(col("doc_id"),
        size(col("sp")).cast("long").as("n_spans"),
        size(col("keep_pos")).cast("long").as("n_kept"),
        concat_ws(" ", transform(col("keep_pos"),
          p => element_at(col("sp"), p + 1))).as("text_out"))
  }

  /** Distinct word-`n`-shingle set per doc (n=1 → unigram token set).
    * Single-pass native expression (functions.WordNGrams) — same output
    * as the guarded `array_distinct(transform(sequence..., slice...))`
    * HOF formulation (short docs → empty set), none of its
    * interpreted-lambda cost.
    */
  def shingleSets(docs0: DataFrame, n: Int, textCol: String, idCol: String): DataFrame = {
    val docs = widen(docs0)
    docs.select(col(idCol).as("doc_id"),
      graft.functions.Fence(graft.functions.WordNGrams(col(textCol), n)).as("ts"))
  }

  /** MinHash signatures: for each of `numHashes` seeds s, the minimum of
    * md5(s + ":" + shingle) over the doc's shingle set — a bottom-1
    * MinHash per seeded hash family, reproducible across engines.
    *
    * Computed by the native [[graft.functions.MinHashSig]] expression in
    * one per-row pass: no token explode, no (doc, seed) shuffle — the
    * signature stage is scan-bound at any scale.
    */
  def minHashSignatures(docs: DataFrame, numHashes: Int, shingleSize: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    shingleSets(docs, shingleSize, textCol, idCol)
      .select(col("doc_id"),
        graft.functions.Fence(graft.functions.MinHashSig(col("ts"), numHashes)).as("sig"))
    // No isNotNull filter here: a filter on sig gets predicate-pushed BELOW
    // widen()'s repartition, recomputing the whole MinHashSig pass
    // single-threaded on the unwidened scan partition (measured 5-10× on
    // d2). Null sigs (docs with no shingles) cost nothing downstream:
    // posexplode(null) in lshBands generates zero band rows.

  /** LSH band signatures: hash `rowsPerBand` consecutive minhashes into
    * one band key (numBands rows per doc). Docs sharing any band key are
    * candidate near-duplicates.
    */
  def lshBands(sigs: DataFrame, rowsPerBand: Int): DataFrame =
    sigs.select(col("doc_id"),
        posexplode(expr(
          s"""transform(sequence(0, size(sig) div $rowsPerBand - 1),
             |  b -> md5(array_join(transform(slice(sig, b * $rowsPerBand + 1, $rowsPerBand),
             |                                x -> cast(x as string)), ',')))"""
            .stripMargin)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bandsig"))

  /** Probability that a pair at Jaccard similarity `s` collides in at
    * least one LSH band under (`bands`, `rowsPerBand`) — the standard
    * S-curve `1 − (1 − s^r)^b` (Mining of Massive Datasets, ch. 3).
    */
  def bandingCollisionProb(s: Double, bands: Int, rowsPerBand: Int): Double = {
    require(s >= 0 && s <= 1 && bands >= 1 && rowsPerBand >= 1)
    1.0 - math.pow(1.0 - math.pow(s, rowsPerBand), bands.toDouble)
  }

  /** A tuned banding: `numHashes = bands × rowsPerBand` minhashes,
    * with the S-curve guarantees it was chosen for made visible —
    * `recallAtThreshold` is the collision probability of a pair exactly
    * at the mining threshold (every pair ABOVE it collides with higher
    * probability: the S-curve is monotone in s), `collisionAtNoise` the
    * candidate-generation false-positive rate at the stated sub-threshold
    * similarity (pure verify-join cost, never a correctness issue —
    * verification is exact).
    */
  final case class BandingChoice(numHashes: Int, bands: Int, rowsPerBand: Int,
      recallAtThreshold: Double, collisionAtNoise: Double)

  /** Choose (bands, rowsPerBand) for a target threshold/recall instead
    * of hand-tuned constants: the cheapest banding — fewest total
    * minhashes, ties to the lowest noise-collision rate — whose S-curve
    * puts at least `targetRecall` collision probability on a pair AT
    * `threshold`. For each rowsPerBand r, the minimal band count is the
    * closed form b = ⌈ln(1−recall)/ln(1−θ^r)⌉; the scan over r ≤
    * `maxHashes` is exhaustive, so the choice is provably cost-minimal
    * within the budget. `noiseSimilarity` (default θ/2) is where the
    * false-positive rate is evaluated for tie-breaking — corpora whose
    * non-dup pairs sit close under θ should pass something tighter; a
    * `maxNoiseCollision` below 1.0 additionally EXCLUDES bandings whose
    * candidate FP rate at the noise similarity exceeds it (bounding the
    * verify-join bill a cheap-but-flat S-curve would otherwise run up).
    */
  def tuneBanding(threshold: Double, targetRecall: Double = 0.95,
      maxHashes: Int = 256, noiseSimilarity: Double = Double.NaN,
      maxNoiseCollision: Double = 1.0): BandingChoice = {
    require(threshold > 0 && threshold < 1, s"threshold in (0,1): $threshold")
    require(targetRecall > 0 && targetRecall < 1, s"recall in (0,1): $targetRecall")
    require(maxHashes >= 1, s"maxHashes >= 1: $maxHashes")
    val noise =
      if (noiseSimilarity.isNaN) threshold / 2
      else { require(noiseSimilarity >= 0 && noiseSimilarity < 1); noiseSimilarity }
    val feasible = (1 to maxHashes).flatMap { r =>
      val bMax = maxHashes / r
      val pr = math.pow(threshold, r)
      // smallest b with 1−(1−θ^r)^b ≥ recall (closed form, then a
      // float-edge check); tiny θ^r makes the form astronomically
      // large — compare in DOUBLE before narrowing so it can't overflow
      val bMin = math.ceil(math.log1p(-targetRecall) / math.log1p(-pr))
      if (!(bMin <= bMax.toDouble)) None // also rejects Inf/NaN
      else {
        var b = math.max(1, bMin.toInt)
        while (b <= bMax && bandingCollisionProb(threshold, b, r) < targetRecall)
          b += 1
        if (b <= bMax &&
            bandingCollisionProb(threshold, b, r) >= targetRecall &&
            bandingCollisionProb(noise, b, r) <= maxNoiseCollision)
          Some(BandingChoice(b * r, b, r,
            bandingCollisionProb(threshold, b, r),
            bandingCollisionProb(noise, b, r)))
        else None
      }
    }
    require(feasible.nonEmpty,
      s"no banding within $maxHashes hashes reaches recall $targetRecall " +
        s"at threshold $threshold under noise-collision cap " +
        s"$maxNoiseCollision — raise maxHashes or relax a constraint")
    feasible.minBy(c => (c.numHashes, c.collisionAtNoise))
  }

  /** [[minHashLsh]] parameterized by a tuned [[BandingChoice]]. */
  def minHashLsh(docs: DataFrame, banding: BandingChoice, threshold: Double,
      shingleSize: Int, textCol: String, idCol: String,
      maxBucket: Int): DataFrame =
    minHashLsh(docs, banding.numHashes, banding.rowsPerBand, threshold,
      shingleSize, textCol, idCol, maxBucket)

  /** [[minHashLshIncremental]] parameterized by a tuned [[BandingChoice]]. */
  def minHashLshIncremental(corpus: DataFrame, newDocs: DataFrame,
      banding: BandingChoice, threshold: Double, shingleSize: Int,
      textCol: String, idCol: String): DataFrame =
    minHashLshIncremental(corpus, newDocs, banding.numHashes,
      banding.rowsPerBand, threshold, shingleSize, textCol, idCol)

  /** Full MinHash+LSH near-dup pipeline: shingle → minhash → band →
    * bucket self-join → exact Jaccard verification at `threshold`.
    * The self-join shuffles both sides on (band, bandsig) — co-located;
    * verification joins token sets back on doc_id.
    */
  def minHashLsh(docs: DataFrame, numHashes: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.5, shingleSize: Int = 3,
      textCol: String = "text", idCol: String = "doc_id",
      maxBucket: Int = 10000): DataFrame = {
    val bands = lshBands(
      minHashSignatures(docs, numHashes, shingleSize, textCol, idCol), rowsPerBand)
    // candidates via bucket grouping, not a self-join: one shuffle on
    // (band, bandsig), pairs emitted inside each bucket — the signature
    // pipeline runs ONCE (a self-join would compute it per side).
    // Bucket sizes are the LSH skew unit; `maxBucket` drops pathological
    // buckets (a bucket of size m emits m²/2 pairs — one degenerate band
    // value would otherwise pin a single task and flood the verify join).
    // Dropped buckets are observable via [[oversizedLshBuckets]]; a giant
    // bucket means the banding is mistuned for the corpus.
    val buckets = bands.groupBy(col("band"), col("bandsig"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
    val cand = buckets.select(explode(expr(
        "flatten(transform(ids, (x, i) -> " +
          "transform(slice(ids, i + 2, size(ids)), y -> struct(x AS da, y AS db))))"))
        .as("p"))
      .select(col("p.da"), col("p.db"))
      .distinct()
    val tsets = shingleSets(docs, shingleSize, textCol, idCol)
    verifyJaccard(cand, tsets, threshold)
  }

  /** Monitoring twin of [[minHashLsh]]'s bucket cap: the (band, bandsig)
    * buckets that exceed `maxBucket` docs and were therefore excluded
    * from candidate generation. Run/log this alongside the dedup job to
    * detect mistuned banding instead of silently skipping pairs.
    */
  def oversizedLshBuckets(docs: DataFrame, numHashes: Int = 16, rowsPerBand: Int = 4,
      shingleSize: Int = 3, textCol: String = "text", idCol: String = "doc_id",
      maxBucket: Int = 10000): DataFrame =
    lshBands(minHashSignatures(docs, numHashes, shingleSize, textCol, idCol), rowsPerBand)
      .groupBy(col("band"), col("bandsig"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxBucket)

  /** Incremental near-dup: which NEW docs duplicate the EXISTING corpus?
    * The corpus side is banded once (in production: precomputed and
    * stored); only the new batch is signed per run, then candidates are
    * a bands-join restricted to (corpus, new) pairs — the daily-ingest
    * shape of dedup at 100 TB, where re-comparing the whole corpus to
    * itself every day is not an option.
    */
  def minHashLshIncremental(corpus: DataFrame, newDocs: DataFrame,
      numHashes: Int = 16, rowsPerBand: Int = 4, threshold: Double = 0.5,
      shingleSize: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val cb = lshBands(minHashSignatures(corpus, numHashes, shingleSize, textCol, idCol), rowsPerBand)
    val nb = lshBands(minHashSignatures(newDocs, numHashes, shingleSize, textCol, idCol), rowsPerBand)
    val cand = cb.as("a").join(nb.as("b"),
        col("a.band") === col("b.band") && col("a.bandsig") === col("b.bandsig"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    val tsets = shingleSets(corpus, shingleSize, textCol, idCol)
      .union(shingleSets(newDocs, shingleSize, textCol, idCol))
    verifyJaccard(cand, tsets, threshold)
  }

  /** Persist the LSH band index of a corpus as a BUCKETED table — the
    * disk-serving complement of [[minHashLshIncremental]] (the s7
    * pattern applied to dedup): the corpus is shingled, minhashed and
    * banded ONCE at ingest, and every later batch probes the stored
    * (band, bandsig) rows instead of re-running the signature pipeline
    * over 100 TB. Bucketing by the join key means the probe join plans
    * with ZERO exchange on the index side — the bucketed write IS the
    * index's shuffle, paid once (the x4 argument); a small daily batch
    * can alternatively broadcast into the index scan.
    */
  def writeLshIndex(corpus: DataFrame, table: String, path: String,
      numHashes: Int = 16, rowsPerBand: Int = 4, shingleSize: Int = 3,
      buckets: Int = 8, textCol: String = "text", idCol: String = "doc_id"): Unit = {
    lshBands(minHashSignatures(corpus, numHashes, shingleSize, textCol, idCol),
        rowsPerBand)
      // one task per bucket -> one file per bucket, not tasks × buckets
      // slivers (the x4 discipline)
      .repartition(buckets, col("band"), col("bandsig"))
      .write.format("parquet")
      .bucketBy(buckets, "band", "bandsig").sortBy("band", "bandsig")
      .option("path", path).saveAsTable(table)
    // Record the banding parameters ON the table: a probe with
    // different parameters produces silently-wrong candidates (missed
    // or spurious dups), so [[probeLshIndex]] validates these and
    // fails fast instead.
    corpus.sparkSession.sql(s"ALTER TABLE $table SET TBLPROPERTIES (" +
      s"'graft.lsh.numHashes'='$numHashes'," +
      s"'graft.lsh.rowsPerBand'='$rowsPerBand'," +
      s"'graft.lsh.shingleSize'='$shingleSize')")
  }

  /** Probe a [[writeLshIndex]] table with a new batch: the batch alone
    * is signed per run (incremental cost ∝ batch size), candidates come
    * from the (band, bandsig) equi-join against the stored index — the
    * bucketed side contributes no exchange — and only the corpus docs
    * that actually appear in a candidate pair are re-read for exact
    * Jaccard verification (left-semi on the candidate id list), so
    * verification cost scales with the candidate set, never the corpus.
    * Same result as [[minHashLshIncremental]] over (corpus, batch) —
    * the fixed point the oracle states.
    */
  def probeLshIndex(newDocs: DataFrame, corpus: DataFrame, table: String,
      numHashes: Int = 16, rowsPerBand: Int = 4, threshold: Double = 0.5,
      shingleSize: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // Fail fast on banding mismatch: compare against the parameters
    // [[writeLshIndex]] recorded (legacy tables without the properties
    // are tolerated — nothing to validate against).
    val props = newDocs.sparkSession.sql(s"SHOW TBLPROPERTIES $table")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    Seq("numHashes" -> numHashes, "rowsPerBand" -> rowsPerBand,
        "shingleSize" -> shingleSize).foreach { case (k, v) =>
      props.get(s"graft.lsh.$k").foreach { stored =>
        require(stored == v.toString,
          s"LSH index $table was written with $k=$stored but probed with " +
            s"$k=$v — a banding mismatch silently corrupts candidate pairs")
      }
    }
    val idx = newDocs.sparkSession.table(table)
    val nb = lshBands(
      minHashSignatures(newDocs, numHashes, shingleSize, textCol, idCol), rowsPerBand)
    // hint("merge"): pin the bucketed SMJ shape (exchange-free index
    // side) — without it Catalyst would broadcast the small batch side,
    // which is ALSO a fine at-scale plan (zero shuffle anywhere) but
    // makes the spec's exchange-count assertion nondeterministic
    val cand = idx.as("a").hint("merge")
      .join(nb.as("b"), col("a.band") === col("b.band")
        && col("a.bandsig") === col("b.bandsig"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    val corpusCand = corpus.join(cand.select(col("da")).distinct(),
      corpus(idCol) === col("da"), "left_semi")
    val tsets = shingleSets(corpusCand, shingleSize, textCol, idCol)
      .union(shingleSets(newDocs, shingleSize, textCol, idCol))
    verifyJaccard(cand, tsets, threshold)
  }

  /** Persist a VERIFIED near-dup pair list — the [[writeLshIndex]]
    * pattern extended one step: the band index amortizes CANDIDATE
    * generation across ingest batches; the pair store amortizes the
    * whole shingle→candidate→verify pipeline across its many
    * consumers (connected components, dedup apply, PageRank ranking,
    * purity/triangle audits, leakage-safe splits — each otherwise
    * re-pays the full pipeline per job). The pair list is tiny
    * relative to the corpus (near-dup pairs, not documents), so the
    * store is a cheap parquet table; the mining parameters ride a
    * `_pair_params.json` sidecar so [[readPairStore]] can fail fast
    * when a consumer assumes a different mining configuration
    * (the probeLshIndex discipline).
    */
  // minimal JSON string escaping for the flat string-map sidecar — a
  // param value containing `"` or `\` must not produce an unparseable
  // sidecar (which would silently skip the very validation it exists for)
  private def jsonEsc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c => c.toString
  }

  private def jsonUnesc(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) { b += s.charAt(i + 1); i += 2 }
      else { b += s.charAt(i); i += 1 }
    }
    b.toString
  }

  def writePairStore(pairs: DataFrame, path: String,
      params: Map[String, String] = Map.empty): Unit = {
    pairs.write.mode("overwrite").parquet(path)
    val spark = pairs.sparkSession
    val p = new org.apache.hadoop.fs.Path(path, "_pair_params.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val json = params.toSeq.sorted
      .map { case (k, v) => s""""${jsonEsc(k)}":"${jsonEsc(v)}"""" }
      .mkString("{", ",", "}")
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Read a [[writePairStore]] table, validating the recorded mining
    * parameters against what the caller expects (mismatch = silently
    * wrong dedup semantics downstream, so it throws instead). Stores
    * without a sidecar — or expectations not recorded — pass through;
    * an UNPARSEABLE sidecar fails loudly (a corrupt sidecar silently
    * skipping validation is exactly the mismatch it exists to prevent).
    */
  def readPairStore(spark: org.apache.spark.sql.SparkSession, path: String,
      expect: Map[String, String] = Map.empty): DataFrame = {
    if (expect.nonEmpty) {
      val p = new org.apache.hadoop.fs.Path(path, "_pair_params.json")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) {
        val in = fs.open(p)
        val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        val str = """"((?:[^"\\]|\\.)*)""""
        val fullRe = s"""\\{(?:$str:$str(?:,$str:$str)*)?\\}""".r
        require(fullRe.pattern.matcher(json.trim).matches(),
          s"pair store $path has an unparseable _pair_params.json sidecar " +
            s"— refusing to consume unvalidated pairs: $json")
        val kvRe = s"$str:$str".r
        val stored = kvRe.findAllMatchIn(json.trim)
          .map(m => jsonUnesc(m.group(1)) -> jsonUnesc(m.group(2))).toMap
        expect.foreach { case (k, v) =>
          stored.get(k).foreach { sv =>
            require(sv == v,
              s"pair store $path was mined with $k=$sv but consumed " +
                s"expecting $k=$v — downstream dedup semantics would differ")
          }
        }
      }
    }
    spark.read.parquet(path)
  }

  /** Exact Jaccard over candidate pairs given per-doc token sets.
    *
    * Computed by a token-level join, not per-pair array intersection: the
    * pair list is fanned out once per left-side token and matched against
    * the right side on (doc, token), so intersection sizes come from a
    * hash-aggregate — no quadratic re-scan of token arrays per pair, and
    * every step is a shuffle-hash plan that survives 100× scale-up.
    */
  def verifyJaccard(pairs: DataFrame, tokenSets: DataFrame, threshold: Double): DataFrame = {
    // tokens join/shuffle as 8-byte xxhash64 keys, not 20-30-byte gram
    // strings: per-doc grams are distinct so intersection counts are
    // preserved (a cross-gram collision needs ~2^32 grams PER DOC PAIR
    // to matter — the corpus-level birthday bound doesn't apply because
    // only same-pair grams are ever compared). The set SIZE rides each
    // exploded row through the join and comes out of the same aggregate
    // (max = the one value) — a separate sizes frame would re-plan the
    // expensive shingle scan and add two more joins.
    val toks = tokenSets.select(col("doc_id"), size(col("ts")).as("n"),
        explode(col("ts")).as("g"))
      .select(col("doc_id"), col("n"), xxhash64(col("g")).as("tok"))
    // token×token join is SHUFFLE_HASH by hint: Catalyst's size estimate
    // for the exploded token table sits under the broadcast threshold, but
    // the real in-memory HashedRelation is the whole corpus' shingles —
    // driver-built, GC-heavy (the round-1 d2 bench variance), and a
    // non-starter at real scale. The pair list IS broadcast-able.
    pairs
      .join(toks.as("ta"), col("da") === col("ta.doc_id"))
      .join(toks.as("tb").hint("shuffle_hash"),
        col("db") === col("tb.doc_id") && col("ta.tok") === col("tb.tok"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).as("i"), max(col("ta.n")).as("na"), max(col("tb.n")).as("nb"))
      .select(col("da"), col("db"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash fingerprint (bitsigns of per-bit hash-parity sums over the
    * token set). `nBits` ≤ 32 — bit b is derived from the b-th hex digit
    * of md5(token), so the fingerprint is engine-reproducible.
    *
    * One native per-row pass ([[graft.functions.SimHashSig]]) — no
    * token × bit explode, no shuffle: scan-bound at any scale. Docs with
    * an empty token set produce a null fingerprint and are dropped (the
    * explode/unnest formulations never emit them either); the filter sits
    * ABOVE the non-deterministic Fence so it cannot be pushed below
    * widen() and recompute the signature pass single-threaded.
    */
  def simHash(docs: DataFrame, nBits: Int = 32,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    shingleSets(docs, 1, textCol, idCol)
      .select(col("doc_id"),
        graft.functions.Fence(graft.functions.SimHashSig(col("ts"), nBits)).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** SimHash near-dup via Hamming LSH (the Google-style complement of
    * MinHash banding): the `nBits`-bit fingerprint splits into `bands`
    * equal integer slices; by pigeonhole, any pair within Hamming
    * distance < `bands` matches EXACTLY in at least one slice, so an
    * equi-join on (band, slice-value) finds every such pair without an
    * all-pairs scan, and the cheap `bit_count(xor)` verify co-located
    * after the join is exact. All keys are integer bit-slices of the
    * signature long — no strings ever shuffle (the signature pipeline
    * runs once; candidates deduplicate before the verify).
    *
    * Scale note: a band slice has `nBits / bands` bits, so bucket
    * count is 2^(nBits/bands) — size nBits for the corpus, within this
    * signature's two-digest 63-bit ceiling ([[graft.functions.SimHashSig]]
    * derives bits 1–32 from md5(token) hex digits and bits 33–63 from a
    * second digest md5(token ∥ '#'); 63 keeps the banded BIGINT
    * sign-clear on every engine, and nBits ≤ 63 is enforced, never
    * silently truncated — the d14-vs-d34 capacity lesson: 8-bit slices
    * saturate at 256 buckets/band once corpus ≫ bands·2⁸, while 21-bit
    * slices of the same pipeline stay linear; [[autoHammingBanding]]
    * sizes the width from a corpus-count estimate so a caller cannot
    * instantiate a saturated banding without an explicit override;
    * beyond 63 bits use the two-long [[hammingNearDup2]]). Bucket skew
    * is bounded the same way as MinHash LSH: near-identical corpora
    * concentrate in few buckets, and the verify stays cheap because it
    * is one xor per candidate pair, not a token join.
    */
  def simHashNearDup(docs: DataFrame, nBits: Int = -1, bands: Int = -1,
      maxHamming: Int = 3, textCol: String = "text", idCol: String = "doc_id",
      maxBucket: Int = 10000, targetLoad: Int = 16): DataFrame = {
    // Default path DERIVES the banding from the corpus count (VERDICT
    // r13 task 2 — the d14/m6 saturation lesson made load-bearing): a
    // caller who does not pin (nBits, bands) explicitly CANNOT
    // instantiate a saturated banding — [[autoHammingBanding]] sizes
    // slices for the count and THROWS when the 63-bit budget cannot
    // afford an unsaturated banding at this hamming bound (use the
    // two-digest [[hammingNearDup2]] path, or pin constants explicitly
    // to accept the quadratic as a labeled baseline). The count is one
    // driver action over `docs` — pass a pinned/cheap frame or explicit
    // parameters if the input is an expensive derivation.
    if (nBits < 0 || bands < 0) {
      require(nBits < 0 && bands < 0,
        s"derive BOTH nBits and bands or pin both: nBits=$nBits bands=$bands")
      val auto = autoHammingBanding(math.max(1L, docs.count()), maxHamming,
        nBitsMax = 63, targetLoad = targetLoad)
      require(!auto.saturated,
        s"auto-sized banding is SATURATED: hamming<=$maxHamming needs " +
          s"${auto.bands} bands and the 63-bit SimHash budget affords only " +
          s"${auto.sliceBits}-bit slices (${1L << auto.sliceBits} buckets/band) " +
          "for this corpus - widen the signature (hammingNearDup2 over a " +
          "two-digest sig) or pass explicit (nBits, bands) to accept a " +
          "saturated banding as a labeled baseline")
      return simHashNearDup(docs, auto.nBits, auto.bands, maxHamming,
        textCol, idCol, maxBucket, targetLoad)
    }
    require(nBits >= 1 && nBits <= 63,
      s"nBits must be in [1, 63] (SimHashSig's two-digest md5-hex " +
        s"derivation; 63 keeps conv()'s long sign-bit-clear): $nBits")
    require(nBits % bands == 0, s"bands ($bands) must divide nBits ($nBits)")
    require(maxHamming < bands,
      s"detection is only guaranteed for hamming < bands: $maxHamming >= $bands")
    val w = nBits / bands
    val mask = (1L << w) - 1L
    def slice(sig: Column, b: Int) =
      shiftrightunsigned(sig, nBits - w * (b + 1)).bitwiseAND(lit(mask))
    // candidates via a band-key SELF-JOIN, not d2's bucket grouping:
    // this corpus has near-identical clusters of hundreds of docs, and
    // an in-bucket HOF pair expansion is interpreted AND serializes
    // each m²/2 bucket onto one task (measured 10.5 s vs 1.5 s here) —
    // the hash join distributes the same m² work and both sides read
    // ONE exchange (AQE ReusedExchange; the signature pipeline runs
    // once). `maxBucket` drops degenerate band values (a bucket of m
    // docs emits m²/2 candidates) via a broadcast anti-join; the count
    // pass re-runs the scan-bound signature projection once — the
    // price of the guard, noise next to the quadratic join. Dropped
    // buckets are observable via [[oversizedHammingBuckets]].
    val banded = bandedSimHash(docs, nBits, bands, textCol, idCol)
    val oversized = banded.groupBy(col("bkey")).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket).select(col("bkey"))
    val pruned = banded.join(broadcast(oversized), Seq("bkey"), "left_anti")
    // emit each pair ONLY from its first matching band (for every
    // earlier band the slices must differ) — exactly-once without a
    // candidate-set distinct, whose exchange would otherwise dominate
    // (a few bit ops per candidate vs shuffling every duplicate match)
    val firstBand = (0 until bands - 1).map { bp =>
      (col("a.band") <= bp) || (slice(col("a.sig"), bp) =!= slice(col("b.sig"), bp))
    }.reduceOption(_ && _).getOrElse(lit(true))
    pruned.as("a")
      .join(pruned.as("b").hint("shuffle_hash"),
        col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id")
          && firstBand)
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        expr("bit_count(a.sig ^ b.sig)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Winnowing fingerprints (Schleimer–Wilkerson–Aiken, the MOSS
    * algorithm): per document, hash every word k-gram (first 8 md5 hex
    * digits — engine-agnostic 32-bit values), slide a window of `w`
    * consecutive hashes and keep each window's MINIMUM — the selected
    * set is a position-independent fingerprint with the winnowing
    * guarantee: any shared token run of length ≥ w+k−1 shares at least
    * one fingerprint. All per-row array expressions (no token
    * explode); documents shorter than k tokens have no grams and are
    * absent. Output: distinct (doc_id, fp) rows.
    */
  def winnowFingerprints(docs: DataFrame, k: Int = 3, w: Int = 4,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(w >= 1, s"w must be >= 1: $w")
    val toks = split(trim(col(textCol)), "\\s+")
    val hashes = transform(sequence(lit(1), size(col("__t")) - (k - 1)),
      i => conv(substring(md5(concat_ws(" ", slice(col("__t"), i, lit(k)))), 1, 8),
        16, 10).cast("long"))
    // widen: the md5 gram pipeline is the operator's CPU (measured
    // 1.15 s single-task on the 1-split bench scan); Fence pins the
    // token array to one evaluation — pushdown otherwise inlines the
    // split() into the size() filter AND keeps it in the projection
    // (the t30 duplication class)
    widen(docs.select(col(idCol).as("doc_id"),
        graft.functions.Fence(toks).as("__t")))
      .filter(size(col("__t")) >= k)
      .select(col("doc_id"), hashes.as("__h"))
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), greatest(size(col("__h")) - (w - 1), lit(1))),
          j => array_min(slice(col("__h"), j, lit(w)))))).as("fp"))
  }

  /** MOSS-style similarity report over [[winnowFingerprints]]: pairs
    * of documents sharing ≥ `minShared` fingerprints, with the count.
    * Fingerprints in more than `maxDf` documents are dropped before
    * pairing (ubiquitous boilerplate would otherwise both flood the
    * report and make the self-join quadratic in its df) — so the join
    * cost is bounded by Σ df² over surviving fingerprints ≤ maxDf ×
    * corpus fingerprint count. The fingerprint frame is pinned
    * (localCheckpoint — id+long rows): the df-filter count pass and
    * both join sides read it instead of re-running the md5 gram
    * pipeline.
    */
  def winnowMatches(docs: DataFrame, k: Int = 3, w: Int = 4,
      maxDf: Int = 50, minShared: Long = 2,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // pin the fingerprint frame ALREADY CLUSTERED on fp at cluster
    // width: the df-count aggregate and both self-join sides are
    // keyed on fp, so they read the checkpoint's partitioning directly
    // — zero post-checkpoint exchanges (previously the join's implicit
    // exchange was AQE-coalesced to one partition, single-tasking the
    // pair probe)
    val fps = widenBy(winnowFingerprints(docs, k, w, textCol, idCol),
      col("fp")).localCheckpoint()
    val common = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select(col("fp"))
    val pruned = fps.join(broadcast(common), Seq("fp"), "left_anti")
    pruned.as("a")
      .join(pruned.as("b").hint("shuffle_hash"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Hamming-LSH near-dup over an ARBITRARY precomputed bit signature
    * — the generic core of [[simHashNearDup]]'s pigeonhole banding,
    * exposed for signatures that don't come from text (the multimodal
    * perceptual hash, externally-computed fingerprints): any pair
    * within hamming < `bands` agrees exactly on one bit-slice, so a
    * slice equi-join finds ALL such pairs; `bit_count(xor)` verifies.
    * Same scale shape as d14: long band keys, shuffle-hash self-join,
    * first-matching-band emission (exactly-once, no candidate
    * distinct), `maxBucket` guard against degenerate slices. `sigCol`
    * must be a 64-bit long; for nBits < 64 the signature's high bits
    * must be zero.
    */
  def hammingNearDup(sigs: DataFrame, nBits: Int = 64, bands: Int = -1,
      maxHamming: Int = 3, idCol: String = "doc_id", sigCol: String = "sig",
      maxBucket: Int = 10000, targetLoad: Int = 16): DataFrame = {
    require(nBits >= 2 && nBits <= 64, s"nBits must be in [2, 64]: $nBits")
    // Default path derives `bands` from the corpus count (VERDICT r13
    // task 2): the tightest pigeonhole (smallest divisor of nBits
    // >= maxHamming+1 — fewest bands = widest slices = most buckets)
    // and a refusal to run saturated — if even the widest affordable
    // slice expects > targetLoad docs/bucket, the SIGNATURE is too
    // narrow for this corpus at this hamming bound (the m6 case):
    // widen it ([[hammingNearDup2]]) or pin `bands` explicitly to
    // accept the quadratic as a labeled baseline. One count() action
    // over `sigs` — pass a pinned frame (the call sites localCheckpoint
    // their signature frames already) or explicit bands.
    if (bands < 0) {
      val b = (maxHamming + 1 to nBits).find(nBits % _ == 0).getOrElse(
        throw new IllegalArgumentException(
          s"no band count in [${maxHamming + 1}, $nBits] divides nBits=$nBits"))
      val w = nBits / b
      val n = math.max(1L, sigs.count())
      val need = math.max(1L, (n + targetLoad - 1) / targetLoad)
      val wIdeal = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(need - 1))
      require(w >= wIdeal,
        s"auto-sized banding is SATURATED: hamming<=$maxHamming over a " +
          s"$nBits-bit signature affords $w-bit slices (${1L << w} " +
          s"buckets/band) but $n docs need ~2^$wIdeal buckets - widen the " +
          "signature (hammingNearDup2) or pass explicit bands to accept a " +
          "saturated banding as a labeled baseline")
      return hammingNearDup(sigs, nBits, b, maxHamming, idCol, sigCol,
        maxBucket, targetLoad)
    }
    require(nBits % bands == 0, s"bands ($bands) must divide nBits ($nBits)")
    require(maxHamming < bands,
      s"detection is only guaranteed for hamming < bands: $maxHamming >= $bands")
    val w = nBits / bands
    val mask = if (w == 64) -1L else (1L << w) - 1L
    def slice(sig: Column, b: Int) =
      shiftrightunsigned(sig, nBits - w * (b + 1)).bitwiseAND(lit(mask))
    val banded = sigs
      .select(col(idCol).as("doc_id"), col(sigCol).cast("long").as("sig"))
      .select(col("doc_id"), col("sig"), posexplode(
        array((0 until bands).map(b => lit(b.toLong * (mask + 1L)) +
          slice(col("sig"), b)): _*))
        .as(Seq("band", "bkey")))
    val oversized = banded.groupBy(col("bkey")).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket).select(col("bkey"))
    val pruned = banded.join(broadcast(oversized), Seq("bkey"), "left_anti")
    val firstBand = (0 until bands - 1).map { bp =>
      (col("a.band") <= bp) || (slice(col("a.sig"), bp) =!= slice(col("b.sig"), bp))
    }.reduceOption(_ && _).getOrElse(lit(true))
    pruned.as("a")
      .join(pruned.as("b").hint("shuffle_hash"),
        col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id")
          && firstBand)
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        expr("bit_count(a.sig ^ b.sig)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Hamming-LSH near-dup over a TWO-long wide signature — the
    * capacity extension of [[hammingNearDup]] past 64 bits (the m6
    * lesson: a 63-bit signature under a hamming ≤ 7 pigeonhole forces 8
    * bands of ~8-bit slices = 256 buckets/band, which saturates once
    * the corpus outgrows bands·2⁸ and turns Σ|bucket|² quadratic; two
    * digests double the bit budget so the SAME hamming bound affords
    * 14-bit slices = 16k buckets/band). The signature is the
    * concatenation V = hi·2^nBitsLo + lo with `nBitsHi`/`nBitsLo` ≤ 63
    * sign-clear bits per long; band b is bits
    * [nBits − w(b+1), nBits − w·b) of V, extracted across the long
    * boundary where it straddles. Pigeonhole exactness, shuffle shape
    * (long band keys, shuffle-hash self-join, first-matching-band
    * emission, broadcast `maxBucket` anti-join) and the verify
    * (`bit_count(hi⊕hi) + bit_count(lo⊕lo)`) are [[hammingNearDup]]'s,
    * unchanged — only the slice arithmetic widens.
    */
  def hammingNearDup2(sigs: DataFrame, nBitsHi: Int = 63, nBitsLo: Int = 63,
      bands: Int = -1, maxHamming: Int = 7, idCol: String = "doc_id",
      sigHiCol: String = "sig_hi", sigLoCol: String = "sig_lo",
      maxBucket: Int = 10000, targetLoad: Int = 16): DataFrame = {
    require(nBitsHi >= 1 && nBitsHi <= 63, s"nBitsHi must be in [1, 63]: $nBitsHi")
    require(nBitsLo >= 1 && nBitsLo <= 63, s"nBitsLo must be in [1, 63]: $nBitsLo")
    val nBits = nBitsHi + nBitsLo
    // count-derived default bands, same policy as [[hammingNearDup]];
    // the slice-width ceiling here is 62 (sign-clear long band key)
    if (bands < 0) {
      val b = (maxHamming + 1 to nBits)
        .find(c => nBits % c == 0 && nBits / c <= 62).getOrElse(
          throw new IllegalArgumentException(
            s"no band count >= ${maxHamming + 1} divides nBits=$nBits " +
              "with slice width <= 62"))
      val w = nBits / b
      val n = math.max(1L, sigs.count())
      val need = math.max(1L, (n + targetLoad - 1) / targetLoad)
      val wIdeal = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(need - 1))
      require(w >= wIdeal,
        s"auto-sized banding is SATURATED: hamming<=$maxHamming over the " +
          s"$nBits-bit two-long signature affords $w-bit slices but $n docs " +
          s"need ~2^$wIdeal buckets - widen the signature or pass explicit " +
          "bands to accept a saturated banding as a labeled baseline")
      return hammingNearDup2(sigs, nBitsHi, nBitsLo, b, maxHamming, idCol,
        sigHiCol, sigLoCol, maxBucket, targetLoad)
    }
    require(nBits % bands == 0, s"bands ($bands) must divide nBits ($nBits)")
    require(maxHamming < bands,
      s"detection is only guaranteed for hamming < bands: $maxHamming >= $bands")
    val w = nBits / bands
    require(w <= 62, s"slice width must fit a sign-clear long key: $w")
    val mask = (1L << w) - 1L
    // slice b = (V >>> s) & mask with s = nBits − w(b+1); V's bit p is
    // lo's bit p for p < nBitsLo, else hi's bit p − nBitsLo
    def slice(hi: Column, lo: Column, b: Int): Column = {
      val s = nBits - w * (b + 1)
      val bits =
        if (s >= nBitsLo) shiftrightunsigned(hi, s - nBitsLo)
        else if (s + w <= nBitsLo) shiftrightunsigned(lo, s)
        else shiftleft(hi, nBitsLo - s).bitwiseOR(shiftrightunsigned(lo, s))
      bits.bitwiseAND(lit(mask))
    }
    val banded = sigs
      .select(col(idCol).as("doc_id"), col(sigHiCol).cast("long").as("hi"),
        col(sigLoCol).cast("long").as("lo"))
      .select(col("doc_id"), col("hi"), col("lo"), posexplode(
        array((0 until bands).map(b => lit(b.toLong * (mask + 1L)) +
          slice(col("hi"), col("lo"), b)): _*))
        .as(Seq("band", "bkey")))
    val oversized = banded.groupBy(col("bkey")).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket).select(col("bkey"))
    val pruned = banded.join(broadcast(oversized), Seq("bkey"), "left_anti")
    val firstBand = (0 until bands - 1).map { bp =>
      (col("a.band") <= bp) ||
        (slice(col("a.hi"), col("a.lo"), bp) =!= slice(col("b.hi"), col("b.lo"), bp))
    }.reduceOption(_ && _).getOrElse(lit(true))
    pruned.as("a")
      .join(pruned.as("b").hint("shuffle_hash"),
        col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id")
          && firstBand)
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        (expr("bit_count(a.hi ^ b.hi)") + expr("bit_count(a.lo ^ b.lo)"))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Capacity auto-sizing for Hamming banding (the [[tuneBanding]] idea
    * applied to the pigeonhole family, VERDICT r12 task 5): given a
    * corpus-count ESTIMATE, the hamming bound to detect, and the bit
    * budget the signature affords, choose (nBits, bands, sliceBits) so
    * the banding cannot be instantiated saturated. bands = maxHamming+1
    * (the tightest pigeonhole that keeps detection exact); sliceBits is
    * the smallest width giving an expected uniform bucket load ≤
    * `targetLoad` (2^w ≥ corpus / targetLoad), clamped to the budget
    * w ≤ nBitsMax / bands. A clamped result is HONEST saturation — the
    * signature is too narrow for the corpus at this hamming bound (m6's
    * 63-bit/hamming-7 case) — and `saturated` reports it so the caller
    * widens the signature ([[hammingNearDup2]], a second digest) rather
    * than shipping a quadratic banding unknowingly. nBits = bands ·
    * sliceBits uses the signature's TOP bits (the slice formulas in
    * both consumers already read from the high end).
    */
  final case class HammingBanding(nBits: Int, bands: Int, sliceBits: Int,
      saturated: Boolean)
  def autoHammingBanding(corpusCount: Long, maxHamming: Int,
      nBitsMax: Int = 63, targetLoad: Int = 16): HammingBanding = {
    require(corpusCount >= 1, s"corpusCount must be >= 1: $corpusCount")
    require(maxHamming >= 0, s"maxHamming must be >= 0: $maxHamming")
    val bands = maxHamming + 1
    require(bands <= nBitsMax,
      s"hamming bound needs more bands than the signature has bits: " +
        s"$bands > $nBitsMax")
    val wMax = nBitsMax / bands
    // smallest w with 2^w * targetLoad >= corpusCount (expected uniform
    // load <= targetLoad), floor 1
    val need = math.max(1L, (corpusCount + targetLoad - 1) / targetLoad)
    // ceil(log2(need)) via bit arithmetic — no libm in a sizing contract
    val wIdeal = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(need - 1))
    val w = math.min(math.max(wIdeal, 1), wMax)
    HammingBanding(bands * w, bands, w, saturated = wIdeal > wMax)
  }

  /** (doc_id, sig, band, bkey) band rows shared by [[simHashNearDup]]
    * and its monitoring twin: one long key per (band, slice) — band
    * index in the high bits so distinct bands never collide.
    */
  private def bandedSimHash(docs: DataFrame, nBits: Int, bands: Int,
      textCol: String, idCol: String): DataFrame = {
    val w = nBits / bands
    val mask = (1L << w) - 1L
    simHash(docs, nBits, textCol, idCol)
      .select(col("doc_id"), conv(col("simhash"), 2, 10).cast("long").as("sig"))
      .select(col("doc_id"), col("sig"), posexplode(
        array((0 until bands).map(b => lit(b.toLong * (mask + 1L)) +
          shiftrightunsigned(col("sig"), nBits - w * (b + 1)).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "bkey")))
  }

  /** Monitoring twin of [[simHashNearDup]]'s bucket cap (the
    * [[oversizedLshBuckets]] pattern): band buckets exceeding
    * `maxBucket` docs, which candidate generation skipped. A non-empty
    * result means the banding is mistuned for the corpus (slices too
    * narrow, or a degenerate constant prefix) — log it beside the dedup
    * job rather than silently missing pairs.
    */
  def oversizedHammingBuckets(docs: DataFrame, nBits: Int = 32, bands: Int = 4,
      textCol: String = "text", idCol: String = "doc_id",
      maxBucket: Int = 10000): DataFrame =
    bandedSimHash(docs, nBits, bands, textCol, idCol)
      .groupBy(col("bkey")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxBucket)

  /** N-gram Jaccard near-dup with blocking: pairs inside the same block
    * (e.g. source) compared on word n-gram sets. Blocking bounds the
    * quadratic term to per-block sizes — at 100 TB the block is the unit
    * of shuffle, never the full corpus.
    */
  def ngramJaccard(docs0: DataFrame, n: Int, blockCol: String, threshold: Double,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val docs = widen(docs0)
    val grams = docs.select(col(idCol).as("doc_id"), col(blockCol).as("blk"),
      graft.functions.Fence(graft.functions.WordNGrams(col(textCol), n)).as("ts"))
    // token-join formulation (see verifyJaccard): one shuffle on
    // (block, gram), pair counts from hash aggregation. The block is
    // FOLDED INTO the gram hash — `xxhash64(blk, g)` — so the Σ m²
    // self-join keys, shuffles and compares a single 8-byte long
    // instead of a (block string, gram hash) pair; a cross-block false
    // match needs the same ~2^32-grams-per-doc-pair collision as any
    // same-block one (the per-pair birthday bound of verifyJaccard's
    // comment covers both). Unlike verifyJaccard, the set size does NOT
    // ride the token rows here: this self-join IS the Σ m² hot path on
    // both sides, and widening it costs more than the (small) sizes
    // joins against the aggregated pair list save — measured ≈10% on
    // d4/d8/d9/d10; the extra linear shingle scan for `sizes` is noise
    // next to the quadratic join.
    // widenBy(tok): the self-join's exchange, made explicit at cluster
    // width — both sides reuse it (one exchange either way); implicit,
    // AQE coalesced it to one partition and the Σ m² probe ran
    // single-task (measured: a 1.0 s one-task stage at the bench anchor)
    val toks = widenBy(
      grams.select(col("doc_id"), col("blk"), explode(col("ts")).as("g"))
        .select(col("doc_id"), xxhash64(col("blk"), col("g")).as("tok")),
      col("tok"))
    val sizes = grams.select(col("doc_id"), size(col("ts")).as("n"))
    // same shuffle-hash forcing as verifyJaccard: never broadcast the
    // exploded gram table on a misleading size estimate
    val inter = pairIntersections(toks)
    inter
      .join(sizes.as("sa"), col("da") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("db") === col("sb.doc_id"))
      .select(col("da"), col("db"),
        (col("i").cast("double") / (col("sa.n") + col("sb.n") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Shared Σ m² pair-intersection core of [[ngramJaccard]] /
    * [[ngramContainment]]: the folded-token self-join, then per-pair
    * intersection counts as a COMPILED partial + wide final (VERDICT
    * r14 task 6). The hash aggregate's map-side partial combined fine,
    * but its FINAL merge ran on the AQE-coalesced (da,db) exchange —
    * ONE task holding the whole pair map, measured as 2 × ~0.85 s
    * single-task stages at the bench anchor (the broadcast size joins
    * + threshold filter ride the same coalesced stage). The
    * mapPartitions below IS the partial (bounded map, flush-at-cap —
    * duplicate partial rows are summed by the final, exactly the
    * hash-agg fallback semantics), and widenBy pins the pair exchange
    * at cluster width so the final sum, the size joins and the filter
    * all run wide. At real scale widenBy no-ops and the shape is the
    * original AQE-sized exchange; partial counts, not raw pair rows,
    * cross it either way.
    */
  private def pairIntersections(toks: DataFrame): DataFrame = {
    val joined = toks.as("ta").join(toks.as("tb").hint("shuffle_hash"),
        col("ta.tok") === col("tb.tok")
          && col("ta.doc_id") < col("tb.doc_id"))
      .select(col("ta.doc_id").as("da"), col("tb.doc_id").as("db"))
    val pairSchema = org.apache.spark.sql.types.StructType(Seq(
      joined.schema("da").copy(name = "da"),
      joined.schema("db").copy(name = "db"),
      org.apache.spark.sql.types.StructField("c",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val partials = joined.mapPartitions { it =>
      val cap = 1 << 20
      def chunk(): Iterator[org.apache.spark.sql.Row] =
        if (!it.hasNext) Iterator.empty
        else {
          val m = new java.util.HashMap[(Any, Any), java.lang.Long](1 << 12)
          while (it.hasNext && m.size < cap) {
            val r = it.next()
            m.merge((r.get(0), r.get(1)), java.lang.Long.valueOf(1L),
              (a, b) => java.lang.Long.valueOf(a.longValue + b.longValue))
          }
          val es = m.entrySet().iterator()
          val drained = new Iterator[org.apache.spark.sql.Row] {
            def hasNext: Boolean = es.hasNext
            def next(): org.apache.spark.sql.Row = {
              val e = es.next()
              org.apache.spark.sql.Row(e.getKey._1, e.getKey._2,
                e.getValue.longValue)
            }
          }
          drained ++ chunk() // Iterator.++ is lazy: one live chunk map
        }
      chunk()
    }(org.apache.spark.sql.Encoders.row(pairSchema))
    widenBy(partials, col("da"), col("db"))
      .groupBy(col("da"), col("db")).agg(sum(col("c")).as("i"))
  }

  /** Soft dedup — keep every duplicate, DOWN-WEIGHT it: each doc gets
    * training weight `1/|its cluster|`, so a 40-copy boilerplate page
    * contributes one document's worth of gradient in total instead of
    * 40 (or instead of 1 arbitrary survivor with 39 discarded — hard
    * dedup's information loss when copies carry distinct metadata).
    * Σ weights per cluster is exactly 1 by construction; Σ over the
    * corpus is the "effective dataset size" every data-mixing decision
    * actually wants. One size aggregate + one broadcast-or-shuffle join
    * keyed by cluster — no pair pipeline needed when assignments come
    * from upstream dedup (d8/d27) or from exact hashing.
    */
  def softDedupWeights(docs: DataFrame, clusterCol: Column,
      idCol: String = "doc_id"): DataFrame = {
    val assigned = docs.withColumn("cluster_id", clusterCol.cast("string"))
    val sizes = assigned.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    assigned.join(sizes, "cluster_id")
      .withColumn("weight",
        lit(1.0).cast("double") / col("cluster_size").cast("double"))
  }

  /** MinHash estimator CALIBRATION over within-block pairs: for every
    * agreeing-hash count m (estimate m/k), the pair count and POOLED
    * exact Jaccard (ratio of integer sums) — the audit that justifies
    * trusting k hashes before a corpus-scale dedup run; a calibrated
    * estimator tracks m/k ≈ pooled J, hash-family bugs or shingle
    * skew bend the curve.
    *
    * NEVER materializes the quadratic pair set (the naive form ran
    * 8.8 s at sf0.1 / 62 s at sf1; this one rides three hash
    * aggregates + two collision-bounded joins):
    *   - m ≥ 1 pairs from a (block, seed, minhash)-keyed self-join —
    *     only docs whose signatures actually collide meet;
    *   - their exact intersections from the d4-style folded-token
    *     equi-join (same xxhash64 fold, same documented ~2⁻³² per-pair
    *     collision caveat), left-joined so an m ≥ 1, i = 0 pair keeps
    *     i = 0;
    *   - the whole m = 0 remainder in CLOSED FORM from per-block
    *     totals: Σ C(n_blk, 2) pairs, Σ_tok C(df, 2) total
    *     intersection mass, Σ_blk (n_blk − 1)·Σ|ts| total size mass —
    *     minus the m ≥ 1 contributions. All-integer; the two output
    *     doubles are single divisions an oracle states identically
    *     (the oracle itself states the plain quadratic semantics).
    */
  def minHashCalibration(docs: DataFrame, blockCol: String,
      numHashes: Int = 16, shingleSize: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val f = shingleSets(docs, shingleSize, textCol, idCol)
      .join(docs.select(col(idCol).as("doc_id"), col(blockCol).as("blk")),
        "doc_id")
      .withColumn("sig", graft.functions.Fence(
        graft.functions.MinHashSig(col("ts"), numHashes)))
      .filter(col("sig").isNotNull)
      .select(col("doc_id"), col("blk"), col("sig"), col("ts"),
        size(col("ts")).cast("long").as("n"))
      .localCheckpoint() // feeds four consumers below
    // m >= 1 pairs: seed-level signature collisions
    val seeded = f.select(col("doc_id"), col("blk"),
      posexplode(col("sig")).as(Seq("s", "mh")))
    val mPairs = seeded.as("a")
      .join(seeded.as("b").hint("shuffle_hash"),
        col("a.blk") === col("b.blk") && col("a.s") === col("b.s")
          && col("a.mh") === col("b.mh")
          && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("m"))
    // exact intersections for pairs that share any shingle (d4 shape)
    val toks = f.select(col("doc_id"), col("blk"), explode(col("ts")).as("g"))
      .select(col("doc_id"), xxhash64(col("blk"), col("g")).as("tok"))
    val iPairs = toks.as("ta")
      .join(toks.as("tb").hint("shuffle_hash"),
        col("ta.tok") === col("tb.tok")
          && col("ta.doc_id") < col("tb.doc_id"))
      .groupBy(col("ta.doc_id").as("da"), col("tb.doc_id").as("db"))
      .agg(count(lit(1)).as("i"))
    val sized = mPairs
      .join(iPairs, Seq("da", "db"), "left_outer")
      .join(f.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(f.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .select(col("m"), coalesce(col("i"), lit(0L)).as("i"),
        (col("na") + col("nb")).as("ab"))
      .localCheckpoint() // pair-cardinality frame, two consumers
    val grouped = sized.groupBy(col("m"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("i")).as("sum_inter"),
        (sum(col("ab")) - sum(col("i"))).as("sum_union"))
    // the m = 0 remainder: closed-form block totals minus the m >= 1 mass
    val blockTotals = f.groupBy(col("blk"))
      .agg(count(lit(1)).as("nb"), sum(col("n")).as("sumn"))
      .agg(sum(expr("nb * (nb - 1) div 2")).as("tot_pairs"),
        sum((col("nb") - 1) * col("sumn")).as("tot_ab"))
    val totInter = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .agg(coalesce(sum(expr("df * (df - 1) div 2")), lit(0L)).as("tot_i"))
    val m1Totals = sized.agg(count(lit(1)).as("n1"),
      coalesce(sum(col("i")), lit(0L)).as("i1"),
      coalesce(sum(col("ab")), lit(0L)).as("ab1"))
    val zero = blockTotals.crossJoin(broadcast(totInter))
      .crossJoin(broadcast(m1Totals))
      .select(lit(0L).as("m"),
        (col("tot_pairs") - col("n1")).as("n_pairs"),
        (col("tot_i") - col("i1")).as("sum_inter"),
        ((col("tot_ab") - col("ab1")) - (col("tot_i") - col("i1")))
          .as("sum_union"))
      .filter(col("n_pairs") > 0L)
    grouped.unionByName(zero)
      .select(col("m"),
        (col("m").cast("double") / lit(numHashes.toDouble)).as("est_jaccard"),
        col("n_pairs"), col("sum_inter"), col("sum_union"),
        (col("sum_inter").cast("double") / col("sum_union").cast("double"))
          .as("pooled_jaccard"))
  }

  /** EXACT global similarity join via prefix filtering (the
    * PPJoin/AllPairs idea, Xiao et al. / Bayardo et al.): every pair
    * with word-set Jaccard ≥ `threshold`, with NO blocking and NO
    * probabilistic recall loss — the exact complement of MinHash-LSH
    * (d2) and of [[ngramJaccard]]'s block-bounded join.
    *
    * The pruning theorem: order every doc's token set by one global
    * total order (document frequency asc, token asc) and keep only the
    * first `len − ⌈θ·len⌉ + 1` tokens as its PREFIX; any pair with
    * J ≥ θ has overlap ≥ θ·max(|a|,|b|), which forces at least one
    * shared token inside BOTH prefixes. So candidates = pairs sharing a
    * prefix token — a superset of the answer — then one exact
    * verification per candidate. Rare-first ordering is the scale
    * lever: the hot self-join keys on the RAREST θ-fraction of each
    * doc's tokens, so bucket sizes are document frequencies of rare
    * tokens, not of stopwords — at 100 TB the candidate volume is
    * Σ_rare df², orders below the Σ df² a naive token join pays.
    * Verification joins the full sorted-token arrays back to only the
    * candidate pairs. One vocab-sized frequency aggregate, one
    * token-keyed candidate shuffle, candidate-bounded verify.
    */
  def prefixJaccardJoin(docs0: DataFrame, n: Int, threshold: Double,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(threshold > 0.0 && threshold < 1.0, s"threshold in (0,1): $threshold")
    val docs = widen(docs0)
    // n-gram shingles (distinct, the d4 representation): n ≥ 2 is also
    // the selectivity lever — prefix pruning leans on RARE set elements,
    // and n-gram document frequencies fall off orders faster than word
    // frequencies (a stopword-heavy corpus makes unigram prefixes
    // near-useless; measured 7× on the synthetic corpus)
    // shingles fold to 8-byte longs before the heavy shuffles (the
    // ngramJaccard trick): frequency agg, ordering join, per-doc sort
    // and verification all move longs, never gram strings. Verified
    // Jaccard equals true-set Jaccard up to the same per-pair ~2^-32
    // hash-collision bound ngramJaccard documents.
    val tok = docs.select(col(idCol).as("id"),
      explode(graft.functions.Fence(
        graft.functions.WordNGrams(col(textCol), n))).as("g"))
      .select(col("id"), xxhash64(col("g")).as("tok"))
    val freq = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val ordered = tok.join(freq, "tok")
      .groupBy(col("id"))
      .agg(transform(sort_array(collect_list(struct(col("df"), col("tok")))),
        x => x("tok")).as("ts"))
      .withColumn("len", size(col("ts")))
      .withColumn("plen",
        col("len") - ceil(lit(threshold) * col("len")).cast("int") + 1)
      .localCheckpoint() // three consumers; the token-sort runs once
    val pref = ordered.select(col("id"), col("len"),
        posexplode(slice(col("ts"), lit(1), col("plen"))))
      .withColumnRenamed("col", "tok") // (id, len, pos 0-based, tok)
    // Two exactness-preserving PPJoin prunes INSIDE the join condition:
    // (1) length filter: J ≥ θ forces min(len) ≥ θ·max(len) — kills the
    //     long-vs-short pairs skewed shared tokens generate;
    // (2) positional filter (Xiao et al., round 9): J ≥ θ ⟺ the overlap
    //     o satisfies o·(1+θ) ≥ θ·(la+lb), and at a shared token at
    //     0-based positions (pa, pb) the overlap is bounded by
    //     min(la−pa, lb−pb) — both arrays are sorted by ONE global
    //     order, so every shared token ranked above this one sits
    //     strictly after BOTH positions. A true pair always survives
    //     via its globally-smallest shared token (which the prefix
    //     theorem puts inside both prefixes, and where the bound is
    //     loosest); candidate rows a tail shared token generates may
    //     individually fail the bound, but dropping them only removes
    //     DUPLICATE (da, db) rows ahead of the distinct. The 1e-9 slack
    //     keeps a borderline 1-ulp double rounding from ever dropping a
    //     pair the exact-arithmetic verify stage would keep — slack only
    //     ADMITS candidates, never loses one.
    val posBound = least(col("a.len") - col("a.pos"),
      col("b.len") - col("b.pos")).cast("double")
    val cand = pref.as("a").join(pref.as("b").hint("shuffle_hash"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id")
          && least(col("a.len"), col("b.len")).cast("double")
             >= lit(threshold) * greatest(col("a.len"), col("b.len")).cast("double")
          && posBound * lit(1.0 + threshold)
             >= lit(threshold) * (col("a.len") + col("b.len")).cast("double")
                - lit(1e-9))
      .select(col("a.id").as("da"), col("b.id").as("db")).distinct()
    cand
      .join(ordered.select(col("id").as("da"), col("ts").as("ta"),
        col("len").as("la")), "da")
      .join(ordered.select(col("id").as("db"), col("ts").as("tb"),
        col("len").as("lb")), "db")
      .withColumn("__i", size(array_intersect(col("ta"), col("tb"))))
      .select(col("da"), col("db"),
        (col("__i").cast("double") / (col("la") + col("lb") - col("__i")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Asymmetric near-duplicate detection: n-gram CONTAINMENT. A wire
    * story embedded verbatim in a longer page has Jaccard
    * |A∩B|/|A∪B| ≈ |B|/|A| — diluted below any usable symmetric
    * threshold — but containment |A∩B|/|B| ≈ 1. Emits, once per
    * (smaller-id, larger-id) pair, BOTH directional scores
    * (`contain_a` = fraction of A's grams inside B, `contain_b` vice
    * versa) where either clears the threshold. Plan shape is exactly
    * [[ngramJaccard]]'s Σ m² token self-join — one shuffle on the
    * folded `xxhash64(block, gram)` long — so the same 100×-scale
    * argument (and the same per-doc-pair hash-collision caveat)
    * applies; only the final per-pair arithmetic differs.
    */
  def ngramContainment(docs0: DataFrame, n: Int, blockCol: String,
      threshold: Double, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val docs = widen(docs0)
    val grams = docs.select(col(idCol).as("doc_id"), col(blockCol).as("blk"),
      graft.functions.Fence(graft.functions.WordNGrams(col(textCol), n)).as("ts"))
    // widenBy(tok): same explicit cluster-width self-join exchange as
    // ngramJaccard (r14) — without it AQE coalesces the join to one
    // partition and the Σ m² probe + compiled partial run single-task
    // (measured: a 2.1 s one-task job at the bench anchor, d18 only)
    val toks = widenBy(
      grams.select(col("doc_id"), col("blk"), explode(col("ts")).as("g"))
        .select(col("doc_id"), xxhash64(col("blk"), col("g")).as("tok")),
      col("tok"))
    val sizes = grams.select(col("doc_id"), size(col("ts")).as("n"))
    val inter = pairIntersections(toks)
    inter
      .join(sizes.as("sa"), col("da") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("db") === col("sb.doc_id"))
      .select(col("da"), col("db"),
        (col("i").cast("double") / col("sa.n")).as("contain_a"),
        (col("i").cast("double") / col("sb.n")).as("contain_b"))
      .filter(greatest(col("contain_a"), col("contain_b")) >= threshold)
  }

  /** Content-defined chunking (the rsync/LBFS/backup-dedup technique):
    * a position ends a chunk when the hash of the `window` bytes ending
    * there satisfies `hash % divisor == 0` — boundaries depend only on
    * LOCAL content, so inserting or deleting bytes early in a document
    * shifts nothing downstream once the window re-synchronizes. This is
    * the shift-ROBUST complement of [[spanDedup]]'s fixed-size spans
    * (which break on any offset change); expected chunk length is
    * `divisor` bytes. All per-row array expressions — the boundary
    * scan, the chunk slicing and the chunk hashing never leave the row,
    * so the operator is scan-bound at any corpus size (the m6/d23 CPU
    * class); Fence pins the boundary array to one evaluation (starts
    * and ends both read it).
    *
    * Returns one row per chunk: (doc_id, chunk_idx, chunk_hash,
    * chunk_len). Identical md5-prefix arithmetic reproduces the
    * boundaries in any engine.
    */
  def cdcChunks(docs0: DataFrame, window: Int = 8, divisor: Int = 64,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    require(divisor >= 1, s"divisor must be >= 1: $divisor")
    val docs = widen(docs0)
    val len = length(col("__t"))
    def winHash(p: Column) =
      pmod(conv(substring(md5(col("__t").substr(p - (window - 1), lit(window))),
        1, 8), 16, 10).cast("long"), lit(divisor.toLong))
    val bounds = when(len >= window + 1,
        filter(sequence(lit(window), len - 1), p => winHash(p) === 0L))
      .otherwise(expr("array()").cast("array<int>"))
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .select(col("doc_id"), col("__t"),
        graft.functions.Fence(bounds).as("__b"))
      .select(col("doc_id"),
        posexplode(zip_with(
          concat(array(lit(0)), col("__b")),
          concat(col("__b"), array(len)),
          (s, e) => col("__t").substr(s + 1, e - s))).as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx"),
        md5(col("chunk")).as("chunk_hash"),
        length(col("chunk")).cast("long").as("chunk_len"))
  }

  /** Apply a near-dup pair list to the corpus with the deterministic
    * "keep the earliest" policy: any document having a smaller-id
    * near-duplicate neighbor is dropped (pairs are emitted as
    * `da < db`, so the drop set is exactly `distinct(db)`). One
    * anti-join on the id — the pair list is orders of magnitude smaller
    * than the corpus and broadcast-eligible at any realistic dup rate.
    */
  def dropLaterDuplicates(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    docs.join(pairs.select(col("db")).distinct(),
      docs(idCol) === col("db"), "left_anti")

  /** Bloom-filter prefilter for incremental exact dedup: gate the new
    * batch on a corpus-key Bloom filter BEFORE any join — at 100 TB the
    * daily batch is mostly novel content, so the cheap
    * no-false-negative membership test drops the bulk of it without
    * shuffling the corpus. Survivors (true dups + fpp false positives)
    * go through the exact join as usual.
    *
    * The filter is built by one corpus aggregation (`stat.bloomFilter`),
    * shipped as broadcast BYTES, and deserialized once per partition —
    * a mapPartitions pass (one of the few justified ones: there is no
    * Catalyst expression for an arbitrary broadcast sketch probe).
    */
  /** ExactSubstr-class dedup (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better"): remove VERBATIM cross-document
    * passages from non-canonical occurrences — trim the matched
    * passage, not the whole document. Detection is positional
    * winnowing (Schleimer–Wilkerson–Aiken) over word `k`-grams with
    * window `w`, hashed by the d23-proven engine-agnostic md5-hex
    * prefix; per window the RIGHTMOST minimum hash is selected, a rule
    * that depends only on the window's own hashes, so selections
    * inside a shared run are identical in every document containing it.
    *
    * GUARANTEE (stated for the §2 row, exercised at the boundary by
    * ExactSubstrSpec): any shared token run of length L ≥ w+k−1 has at
    * least one window of w gram hashes fully inside it, hence at least
    * one SHARED selected fingerprint — detection is certain, and ≥ k
    * tokens of the run are trimmed from every non-canonical occurrence.
    * Interior coverage is much stronger: consecutive winnowing
    * selections are ≤ w gram positions apart, so after trimming, no
    * verbatim shared stretch longer than w−k tokens survives in the
    * run's interior (edges contribute < w+k−1 tokens each). A run of
    * L < k tokens shares no k-gram and is never touched. Canonical =
    * globally smallest (doc_id, position) occurrence of the
    * fingerprint, packed into one long (doc_id·2²⁰+pos, the d12
    * bounds: pos < 2²⁰, doc_id < 2⁴³).
    *
    * Scale shape — the reason this is the dedup mode that works at
    * 100 TB where pair-mining can't: NO pair join anywhere. Fingerprint
    * selection is per-row array expressions on the widened scan
    * (Fence-pinned, one evaluation); then one groupBy(fp) argmin (map-
    * side partial min, one row per distinct fingerprint crosses the
    * wire), one fp-keyed join of occurrences against winners (output =
    * occurrence count, never df²), one doc_id-keyed join to rebuild
    * text. Cost is linear in selected fingerprints ≈ corpus grams/w·2,
    * independent of how many documents share a passage.
    *
    * Output: every input document (untouched docs keep their text) as
    * (doc_id, n_tokens, n_removed, text_out), removal = union of
    * [p, p+k−1] token spans over its non-canonical fingerprints.
    */
  def exactSubstrTrim(docs0: DataFrame, k: Int = 3, w: Int = 4,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(w >= 1, s"w must be >= 1: $w")
    val toks = tokenFrame(docs0, textCol, idCol)
      .localCheckpoint() // consumed by the fingerprint pass AND the
                         // rebuild join; re-running the scan+split per
                         // branch would double the corpus read
    val sel = winnowOccurrences(toks, k, w)
    val canon = sel.groupBy(col("fp")).agg(min(col("okey")).as("keep_key"))
    val removals = sel.join(canon, "fp")
      .filter(col("okey") =!= col("keep_key"))
      .select(col("doc_id"), col("p"))
    trimByRemovals(toks, removals, k)
  }

  /** (doc_id, t) token-array frame on the widened scan — the shared
    * front of [[exactSubstrTrim]] and its streaming face (ST31). */
  private[graft] def tokenFrame(docs0: DataFrame,
      textCol: String, idCol: String): DataFrame =
    widen(docs0).select(col(idCol).as("doc_id"),
      graft.functions.Fence(split(trim(col(textCol)), "\\s+")).as("t"))

  /** Positional winnowing occurrences over a [[tokenFrame]]: one row
    * per SELECTED k-gram — (doc_id, p, fp, okey) with p the 1-based
    * gram position, fp the gram's 32-bit md5-prefix hash and okey the
    * packed (doc_id, p) total order. Gram hashes (1-based), then per-
    * window rightmost argmin: the reversed-slice array_position finds
    * the LAST index holding the window minimum, mirrored verbatim in
    * the DuckDB oracle. */
  private[graft] def winnowOccurrences(toks: DataFrame,
      k: Int, w: Int): DataFrame =
    toks.filter(size(col("t")) >= k)
      .select(col("doc_id"),
        graft.functions.Fence(expr(
          s"""transform(sequence(1, size(t) - ${k - 1}),
             |  i -> cast(conv(substring(md5(concat_ws(' ', slice(t, i, $k))), 1, 8), 16, 10) as bigint))"""
            .stripMargin)).as("h"))
      // Fence the positions array too: the explode child is an
      // O(grams×w) deterministic transform, and InferFiltersFromGenerate
      // would otherwise inline a copy into the isnotnull/size filter it
      // plants below the Generate — doubling the dominant per-row work
      // (the e7/d2 duplication class; review finding, round 10)
      .select(col("doc_id"), col("h"), explode(graft.functions.Fence(
        array_distinct(expr(
        s"""transform(sequence(1, greatest(size(h) - ${w - 1}, 1)),
           |  j -> j + least($w, size(h) - j + 1)
           |    - array_position(reverse(slice(h, j, least($w, size(h) - j + 1))),
           |        array_min(slice(h, j, least($w, size(h) - j + 1)))))"""
          .stripMargin)))).as("p"))
      .select(col("doc_id"), col("p").cast("int").as("p"),
        element_at(col("h"), col("p").cast("int")).as("fp"),
        (col("doc_id") * lit(1048576L) + col("p")).as("okey"))

  /** Apply (doc_id, p) gram removals to a [[tokenFrame]]: the union of
    * [p, p+k−1] token spans drops out, every input doc appears in the
    * output (untouched docs keep their text). */
  private[graft] def trimByRemovals(toks: DataFrame, removals: DataFrame,
      k: Int): DataFrame = {
    val removedIdx = removals
      .groupBy(col("doc_id"))
      .agg(sort_array(array_distinct(flatten(collect_list(
        sequence(col("p"), col("p") + lit(k - 1)))))).as("rem"))
    toks.join(removedIdx, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("t")).cast("long").as("n_tokens"),
        coalesce(size(col("rem")), lit(0)).cast("long").as("n_removed"),
        when(col("rem").isNull, concat_ws(" ", col("t")))
          .otherwise(concat_ws(" ", transform(
            filter(sequence(lit(1), size(col("t"))),
              i => !array_contains(col("rem"), i)),
            i => element_at(col("t"), i)))).as("text_out"))
  }

  /** Edit-distance-1 variant mining over a vocabulary via
    * symmetric-delete blocking (the SymSpell family): every term emits
    * itself plus its single-character-deletion neighborhood as join
    * keys, and any pair at Levenshtein ≤ 1 provably shares a key —
    * equal-length pairs differ in one position, so deleting that
    * position from EACH yields the same string; length-±1 pairs make
    * the shorter term itself a deletion of the longer. The key join is
    * therefore a SUPERSET of the answer (no recall loss), verified by
    * one exact codegen'd `levenshtein` per candidate.
    *
    * Scale shape: a term of length L emits L+1 keys, so the blocking
    * frame is Σ(L+1) ≈ (avg_len+1)·|vocab| rows and the ONE shuffle is
    * keyed by deletion strings; vocabulary is corpus-SUBLINEAR (Heaps'
    * law), so at 100 TB this runs on a frame orders of magnitude below
    * the corpus. Bucket degeneracy comes only from very short terms
    * (deleting from 2-char terms funnels into shared 1-char keys) —
    * the `minLen` floor removes them, the same observable-cap
    * discipline as LSH's maxBucket. Never a pairwise scan: the naive
    * |vocab|² Levenshtein join the oracle states is exactly what this
    * avoids.
    *
    * Output: one row per unordered ed≤1 pair, oriented variant →
    * canonical by (df desc, term asc) — the normalization direction a
    * noisy-text pipeline applies.
    */
  def editVariants(vocab: DataFrame, termCol: String = "term",
      dfCol: String = "df", minLen: Int = 3): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2: $minLen")
    val v = vocab
      .select(col(termCol).cast("string").as("__t"),
        col(dfCol).cast("long").as("__df"))
      .filter(length(col("__t")) >= minLen)
    val keyed = v.select(col("__t"), col("__df"),
      explode(array_union(array(col("__t")),
        transform(sequence(lit(1), length(col("__t"))), i =>
          concat(col("__t").substr(lit(1), i - 1),
            col("__t").substr(i + 1, length(col("__t"))))))).as("__k"))
      // vocabulary-scale frame consumed by BOTH join sides: without the
      // pin the whole upstream (often a corpus token count) derives
      // twice — the broadcast side diverges from the probe side, so
      // AQE's ReusedExchange can never kick in
      .localCheckpoint()
    val a = keyed.select(col("__k"), col("__t").as("ta"), col("__df").as("dfa"))
    val b = keyed.select(col("__k"), col("__t").as("tb"), col("__df").as("dfb"))
    val cand = a.join(b, Seq("__k"))
      .filter(col("ta") < col("tb"))
      .select(col("ta"), col("tb"), col("dfa"), col("dfb"))
      .distinct() // a pair can share several deletion keys
    val canonFirst = col("dfa") > col("dfb") ||
      (col("dfa") === col("dfb") && col("ta") < col("tb"))
    cand
      .filter(abs(length(col("ta")) - length(col("tb"))) <= 1)
      .filter(levenshtein(col("ta"), col("tb")) <= 1)
      .select(
        when(canonFirst, col("tb")).otherwise(col("ta")).as("variant"),
        when(canonFirst, col("ta")).otherwise(col("tb")).as("canonical"),
        when(canonFirst, col("dfb")).otherwise(col("dfa")).as("df_variant"),
        when(canonFirst, col("dfa")).otherwise(col("dfb")).as("df_canonical"))
  }

  def bloomPrefilter(newBatch: DataFrame, corpus: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = corpus.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val bytes = newBatch.sparkSession.sparkContext.broadcast(bos.toByteArray)
    val idx = newBatch.schema.fieldIndex(keyCol)
    val schema = newBatch.schema
    newBatch.mapPartitions { it =>
      val local = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bytes.value))
      it.filter(r => !r.isNullAt(idx) && local.mightContain(r.get(idx)))
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Blocked Levenshtein record linkage (D40) — the classic entity-
    * resolution shape (Fellegi–Sunter blocking + edit-distance verify):
    * candidate pairs come ONLY from equal blocking keys (a cheap
    * deterministic function of the record — sort key prefix, phonetic
    * code, length bucket), then each candidate pair is verified with
    * the exact Levenshtein distance ≤ `maxDist`. Complements D35's
    * symmetric-delete miner: that one guarantees distance-1 recall
    * with no pair join; this one takes an ARBITRARY caller-designed
    * block and an arbitrary distance budget, the general workhorse.
    *
    * Determinism: `levenshtein` is the textbook DP — identical exact
    * integers on any engine — and pairs order as (ida < idb).
    *
    * Scale: ONE shuffle on the block key, within-block pair join only
    * — cost Σ_b |b|² , controlled by the caller's key design; blocks
    * over `maxBlock` rows are DROPPED (the d2/d34 LSH cap discipline
    * — a degenerate key must not detonate a task) and surface via the
    * companion accounting query, never silently.
    */
  def blockedLevenshtein(df: DataFrame, blockKey: Column, maxDist: Int,
      nameCol: String = "name", idCol: String = "id",
      maxBlock: Long = 10000L): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    // widenBy(blk): every operator below — the size aggregate, the
    // size-cap join and the pair self-join — is clustered on blk, so
    // this ONE explicit exchange serves them all at cluster width; left
    // implicit, AQE coalesced the tiny-byte shuffle to one partition
    // and the pair-verify DP ran single-task (measured: 2×~1.9 s
    // one-task stages at the bench anchor, the whole query 4.1 s).
    val b = widenBy(df.select(col(idCol).as("id"), col(nameCol).as("nm"),
      blockKey.as("blk")), col("blk"))
    val sizes = b.groupBy(col("blk")).agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBlock)
    val kept = b.join(sizes.select(col("blk")).hint("shuffle_hash"), Seq("blk"))
    kept.as("a")
      .join(kept.as("b").hint("shuffle_hash"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("ida"), col("b.id").as("idb"),
        col("a.nm").as("name_a"), col("b.nm").as("name_b"),
        // banded DP: the threshold variant costs O(len·maxDist) per
        // pair instead of O(len²) and returns −1 over budget (exact
        // distance otherwise — the emitted dist is unchanged for every
        // surviving pair). Fence: the filter below would otherwise
        // inline the DP into a pushed-down predicate AND keep it in
        // the projection — the e7/d2 duplication trap, 2 evals/pair.
        graft.functions.Fence(
          levenshtein(col("a.nm"), col("b.nm"), maxDist)).as("dist"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
  }

  /** Cross-document CHUNK-grain exact dedup with reassembly — the
    * C4-style "remove duplicated spans across documents" cleanup
    * (Raffel et al. 2020 deduplicate at the three-sentence-span grain;
    * here the span is a fixed `chunkTokens`-token block, the t35
    * pseudo-sentence convention for this punctuation-free corpus).
    *
    * Each document splits into consecutive `chunkTokens`-token chunks
    * (last chunk may be short). A chunk's CANONICAL occurrence is the
    * globally smallest (doc_id, chunk_idx) holding its text; every
    * other occurrence is removed and the document reassembled from its
    * surviving chunks in order. Returns one row per input document:
    * (doc_id, n_chunks, n_kept, new_text) — new_text is '' when every
    * chunk was trimmed (never NULL).
    *
    * Scale: chunk rows = corpus tokens / chunkTokens; ONE md5-keyed
    * hash aggregate finds canonicals (map-side combined), ONE
    * shuffle_hash join back (both sides corpus-sized — never a
    * broadcast, the t35 lesson), ONE doc-grain aggregate reassembles.
    * The canonical key packs (doc_id, idx) into a single long —
    * `doc_id · maxChunksPerDoc + idx` — so the argmin is a plain MIN
    * (exact integers, engine-bit-exact); `maxChunksPerDoc` bounds the
    * longest document (require-checked, default 2^20 tokens/chunkTokens).
    */
  def chunkDedup(docs: DataFrame, chunkTokens: Int = 8,
      maxChunksPerDoc: Long = 1L << 20, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1: $chunkTokens")
    // Fence the token array: size() (the sequence bound) and slice()
    // (the chunk builder) would otherwise each inline their own
    // split() — the t30 duplication class, 2 tokenizations per doc
    val a = col("__a")
    val nCh = ceil(size(a).cast("double") / lit(chunkTokens.toDouble)).cast("int")
    val chunkList = transform(sequence(lit(0), greatest(nCh - 1, lit(0))),
      i => concat_ws(" ", slice(a, i * chunkTokens + 1, lit(chunkTokens))))
    val chunks = docs
      .select(col(idCol).cast("long").as("did"),
        graft.functions.Fence(split(trim(col(textCol)), "\\s+")).as("__a"))
      .select(col("did"), posexplode(chunkList).as(Seq("idx", "chunk")))
      .select(col("did"), col("idx").cast("long").as("idx"), col("chunk"),
        md5(col("chunk")).as("h"),
        (col("did") * maxChunksPerDoc
          + when(col("idx") < maxChunksPerDoc, col("idx").cast("long"))
            .otherwise(raise_error(concat(lit("chunkDedup: doc "),
              col("did").cast("string"),
              lit(s" exceeds maxChunksPerDoc=$maxChunksPerDoc"))))).as("occ"))
      // canon aggregate AND the join-back both consume the chunk frame:
      // unpinned, the scan+tokenize+explode pipeline plans TWICE
      .localCheckpoint()
    val canon = chunks.groupBy(col("h")).agg(min(col("occ")).as("canon_occ"))
    chunks.as("c")
      .join(canon.as("k").hint("shuffle_hash"), col("c.h") === col("k.h"))
      .select(col("c.did").as("did"), col("c.idx").as("idx"),
        col("c.chunk").as("chunk"),
        (col("c.occ") === col("k.canon_occ")).as("keep"))
      .groupBy(col("did"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        concat_ws(" ", transform(
          sort_array(collect_list(when(col("keep"),
            struct(col("idx"), col("chunk"))))),
          s => s.getField("chunk"))).as("new_text"))
      .select(col("did").as(idCol), col("n_chunks"), col("n_kept"),
        col("new_text"))
  }
}
