package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat media payloads as opaque `binary`
  * columns with typed metadata. Binary PPM (P6), PNG and JPEG images
  * and RIFF/WAVE PCM audio are REALLY decoded in pure JVM code
  * ([[graft.functions.DecodeMedia]] — no codec dependency); formats
  * this sandbox cannot parse keep the documented deterministic STUB so
  * the pipeline never crashes on an alien payload (it reports
  * `format = "unknown"` instead).
  */
object Multimodal {

  /** Formats with a REAL pixel decode behind them (gray64 populated):
    * lossless PPM/PNG (engine-independent, oracle-safe) plus JPEG
    * (per-JVM deterministic, golden-pinned in DctPhashSpec — see
    * [[graft.functions.DecodeMedia]]'s decodeJpeg scaladoc).
    */
  private[graft] val RealImageFormats = Seq("ppm", "png", "jpeg")

  /** A deterministic VALID binary-PPM payload built from pure string
    * expressions — the query-side image generator (the corpus ships no
    * real images): `P6\n<w> <h>\n255\n` + w·h·3 pixel bytes drawn from
    * a counter-SALTED ASCII md5 hex stream — md5(seed:0) ‖ md5(seed:1)
    * ‖ …, aperiodic by construction (repeating ONE digest makes every
    * image a 32-byte pattern whose 8×8 block means correlate across
    * documents — measured as accidental near-dup pairs in m6). Hex
    * chars ARE bytes, so an engine without binary math — the DuckDB
    * oracle — rebuilds the exact payload with string ops and agrees on
    * its md5. `reps` must satisfy 32·reps ≥ 3·w·h for the caller's
    * dimension bounds.
    */
  def ppmPayload(width: org.apache.spark.sql.Column,
      height: org.apache.spark.sql.Column,
      seed: org.apache.spark.sql.Column, reps: Int): org.apache.spark.sql.Column =
    concat(lit("P6\n"), width.cast("string"), lit(" "),
      height.cast("string"), lit("\n255\n"),
      concat((0 until reps).map(k =>
        md5(concat(seed, lit(s":$k")))): _*).substr(lit(1),
        (width * height * lit(3)).cast("int"))).cast("binary")

  /** Per-payload metadata: size, content hash, and the REAL header
    * decode — PPM images report their parsed (width, height) and one
    * frame; WAV audio reports its sample count as `n_frames`
    * (width/height null); unknown formats keep the deterministic STUB
    * derivation from leading bytes, flagged by `format`.
    */
  def binaryMetadata(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    // Fence pins the decode to ONE evaluation per row — the field
    // accessors below would otherwise each inline their own copy
    val dec = df.select(col(idCol).as("doc_id"), col(binCol).as("__b"),
      graft.functions.Fence(graft.functions.DecodeMedia(col(binCol))).as("__m"))
    // unsigned value of byte `n` via the hex dump — byte-level access that
    // survives arbitrary (non-UTF-8) media payloads, unlike a
    // binary→string cast, whose charset replacement mangles real bytes
    def byteAt(n: Int): org.apache.spark.sql.Column =
      coalesce(conv(substring(hex(col("__b")), 2 * n - 1, 2), 16, 10)
        .cast("int"), lit(0))
    val fmt = col("__m.format")
    dec.select(
      col("doc_id"),
      length(col("__b")).cast("long").as("byte_len"),
      md5(col("__b")).as("content_md5"),
      fmt.as("format"),
      when(fmt.isin(RealImageFormats: _*), col("__m.width"))
        .when(fmt === "wav", lit(null).cast("int"))
        .otherwise(byteAt(1) % 64 + 1).as("width"),
      when(fmt.isin(RealImageFormats: _*), col("__m.height"))
        .when(fmt === "wav", lit(null).cast("int"))
        .otherwise(byteAt(2) % 64 + 1).as("height"),
      when(fmt.isin(RealImageFormats: _*), lit(1L))
        .when(fmt === "wav", col("__m.n_samples"))
        .otherwise(expr("length(__b) div 1000") + 1L).as("n_frames"))
  }

  /** Deterministic frame sampling over a decoded payload: every
    * `stride`-th frame index with its REAL byte offset — WAV frames are
    * PCM samples at `data_offset + idx · block_align`, a PPM image is
    * one frame at its pixel-data offset, unknown formats keep the stub
    * length-proportional offsets. At scale the (doc, offset) rows feed
    * the batched extraction stage, which seeks into the payload
    * instead of decoding whole files.
    */
  def frameSample(df: DataFrame, binCol: String, idCol: String, stride: Int): DataFrame = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    val meta = df.select(col(idCol).as("doc_id"),
        length(col(binCol)).cast("long").as("byte_len"),
        graft.functions.Fence(graft.functions.DecodeMedia(col(binCol))).as("__m"))
      .select(col("doc_id"), col("byte_len"), col("__m.format").as("__fmt"),
        when(col("__m.format").isin(RealImageFormats: _*), lit(1L))
          .when(col("__m.format") === "wav", col("__m.n_samples"))
          .otherwise(expr("byte_len div 1000") + 1L).as("n_frames"),
        col("__m.data_offset").as("__doff"),
        col("__m.block_align").as("__ba"))
    meta
      .filter(col("n_frames") > 0L)
      .select(col("doc_id"), col("byte_len"), col("__fmt"), col("n_frames"),
        col("__doff"), col("__ba"),
        explode(sequence(lit(0L), col("n_frames") - 1L, lit(stride.toLong)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        when(col("__fmt") === "wav",
          col("__doff") + col("frame_idx") * col("__ba"))
          .when(col("__fmt").isin(RealImageFormats: _*), col("__doff"))
          .otherwise(col("frame_idx") * expr("byte_len div n_frames"))
          .as("byte_offset"))
  }

  /** Fixed-pixel-budget batch packing per decoded image shape — the
    * multimodal face of p3's concat-and-chop sequence packing: a GPU
    * decode/augment stage batches SAME-shape images (no re-padding),
    * and each (width, height) bucket packs its images into batches of
    * ≤ `budget` pixels by cumulative pixel count (the straddling image
    * overfills rather than splits — p3's documented semantics). Shapes
    * come from the REAL header decode (PPM/PNG only; other formats
    * drop out). Scale: shape buckets are LOW-cardinality (hundreds),
    * so a plain `Window.partitionBy(shape)` would push the corpus
    * through that many tasks — the cumulative count rides
    * [[Prefix.groupedCumSums]]' two-pass grouped prefix sum instead;
    * the oracle states the plain partitioned window (long sums are
    * split-point-independent).
    */
  def pixelPack(df: DataFrame, binCol: String, idCol: String,
      budget: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1: $budget")
    val meta = Dedup.widen(df)
      .select(col(idCol).as("doc_id"),
        graft.functions.Fence(graft.functions.DecodeMedia(col(binCol))).as("__m"))
      .filter(col("__m.format").isin(RealImageFormats: _*))
      .select(col("doc_id"), col("__m.width").as("width"),
        col("__m.height").as("height"),
        (col("__m.width").cast("long") * col("__m.height")).as("px"))
    Prefix.groupedCumSums(meta, groups = Seq("width", "height"),
        order = Seq(col("doc_id")), sums = Seq("px" -> "cum_px"),
        keep = Seq("doc_id", "width", "height", "px"))
      .withColumn("batch_id", expr(s"(cum_px - px) div ${budget}L"))
      .groupBy(col("width"), col("height"), col("batch_id"))
      .agg(count(lit(1)).as("n_images"), sum(col("px")).as("batch_pixels"))
      .withColumn("fill",
        col("batch_pixels").cast("double") / lit(budget.toDouble))
  }

  /** Per-window audio features over REALLY decoded PCM — the feature
    * stage an audio-training pipeline runs before any model sees a
    * clip: fixed-size sample windows with energy (Σ s², the loudness/
    * silence gate) and zero-crossing counts (the crude voiced/unvoiced
    * discriminator). Samples come from [[graft.functions.WavSamples]]
    * (16-bit PCM only; other payloads drop out, never crash). All
    * integer arithmetic — exact on any engine: the oracle re-derives
    * the synthesized byte stream analytically and states the same
    * window sums. Plan: widen (per-row decode is the CPU wall — the
    * t23 lesson), one projection (decode pinned to a single
    * evaluation), ONE interpreted zip_with pass building the
    * adjacent-crossing indicator array, then a codegen'd
    * posexplode + hash aggregate on (doc, window) — the
    * explode+hash-agg idiom from CLAUDE.md's measured-perf rules
    * (per-window HOF folds ran interpreted 4 passes over every
    * sample; this shape halved m9's bench time).
    */
  def audioWindowStats(df: DataFrame, binCol: String, idCol: String,
      window: Int, maxSamples: Int = 1 << 20): DataFrame = {
    require(window >= 2, s"window must be >= 2: $window")
    val smp = Dedup.widen(df)
      .select(col(idCol).as("doc_id"),
        graft.functions.Fence(
          graft.functions.WavSamples(col(binCol), maxSamples)).as("__smp"))
      .filter(col("__smp").isNotNull)
      .filter(size(col("__smp")) > 0)
    val n = size(col("__smp"))
    // indicator at 0-based position i = sign change between samples
    // (i, i+1); the final position pads 0 so the array aligns 1:1 with
    // the samples and one posexplode carries both
    val cr = concat(
      zip_with(
        slice(col("__smp"), lit(1), n - 1),
        slice(col("__smp"), lit(2), n - 1),
        (a, b) => when(a * b < 0, 1L).otherwise(0L)),
      array(lit(0L)))
    smp
      .select(col("doc_id"), col("__smp"), cr.as("__cr"))
      .select(col("doc_id"),
        posexplode(arrays_zip(col("__smp"), col("__cr"))).as(Seq("pos", "z")))
      .groupBy(col("doc_id"), expr(s"pos div $window").cast("long").as("win"))
      .agg(count(lit(1)).as("n_samples"),
        sum(col("z.__smp").cast("long") * col("z.__smp")).as("energy"),
        // a pair straddling a window boundary (pos is the window's last
        // sample) belongs to neither window's crossing count
        sum(when((col("pos") + 1) % window === 0, 0L)
          .otherwise(col("z.__cr"))).as("crossings"))
  }

  /** Energy-threshold activity segmentation over REALLY decoded PCM —
    * the clip-splitting stage an audio-training pipeline runs before
    * transcription/packing (VAD with an energy gate): fixed-size
    * windows are active when their mean square power clears
    * `minMeanSquare`, and maximal runs of active windows become
    * segments (start/end window, length, total energy). The run
    * grouping is the R33 gaps-and-islands trick (win − row_number is
    * constant within a run), so segments need one bounded per-clip
    * window function, never a sequential scan.
    *
    * Determinism: the gate is the ALL-INTEGER comparison
    * energy > minMeanSquare · n_samples (never a divided mean), and
    * every output is an exact integer — hash-exact on any engine.
    * Scale: [[audioWindowStats]]'s widen → decode → posexplode →
    * hash-aggregate plan plus ONE clip-keyed exchange; per-key state is
    * that clip's window count (bounded by clip length), the q26
    * argument — corpora grow by adding clips.
    */
  def activitySegments(df: DataFrame, binCol: String, idCol: String,
      window: Int, minMeanSquare: Long, maxSamples: Int = 1 << 20): DataFrame = {
    require(minMeanSquare > 0, s"minMeanSquare must be positive: $minMeanSquare")
    val w = audioWindowStats(df, binCol, idCol, window, maxSamples)
    val active = w.filter(col("energy") > lit(minMeanSquare) * col("n_samples"))
    val isl = active.withColumn("g", col("win") -
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("win"))))
    isl.groupBy(col("doc_id"), col("g"))
      .agg(min(col("win")).as("seg_start"), max(col("win")).as("seg_end"),
        count(lit(1)).as("n_windows"), sum(col("n_samples")).as("seg_samples"),
        sum(col("energy")).as("seg_energy"))
      .select(col("doc_id"), col("seg_start"), col("seg_end"),
        col("n_windows"), col("seg_samples"), col("seg_energy"))
  }

  /** Cut each detected activity segment out of its clip as a
    * STANDALONE valid WAV (M14 — the extraction stage after M13's
    * detection, what actually feeds a transcription/packing queue):
    * the segment's sample bytes are sliced straight out of the
    * original payload at the REALLY-decoded data_offset (never
    * re-synthesized) and re-wrapped in a canonical RIFF header by
    * [[graft.functions.WavWrap]], so decode∘extract == the original
    * slice — spec-pinned: the extracted payload re-decodes as 16-bit
    * PCM with exactly seg_samples samples EQUAL to the source clip's
    * sample range. Plan: the EXPENSIVE stage (widen → WavSamples full
    * sample extraction, inside [[activitySegments]]) runs exactly
    * once; the metadata/payload branch is a plain UN-widened second
    * scan — a ~44-byte header parse plus one codegen'd substr per row,
    * which neither needs the widen repartition nor re-extracts
    * samples, so payload bytes cross NO shuffle on this branch at all
    * (ADVICE r13: the previous shape widened and decode-planned the
    * payload twice).
    */
  def extractSegments(df: DataFrame, binCol: String, idCol: String,
      window: Int, minMeanSquare: Long, maxSamples: Int = 1 << 20): DataFrame = {
    val segs = activitySegments(df, binCol, idCol, window, minMeanSquare,
      maxSamples)
    val meta = df
      .select(col(idCol).as("doc_id"), col(binCol).as("__bin"),
        graft.functions.Fence(
          graft.functions.DecodeMedia(col(binCol))).as("__m"))
      .filter(col("__m.format") === "wav" && col("__m.bits") === 16 &&
        col("__m.channels") === 1)
      .select(col("doc_id"), col("__bin"),
        col("__m.data_offset").as("__off"),
        col("__m.sample_rate").as("__rate"),
        col("__m.block_align").cast("long").as("__ba"))
    segs.join(meta, Seq("doc_id"))
      .select(col("doc_id"), col("seg_start"), col("seg_end"),
        col("seg_samples"), col("seg_energy"),
        graft.functions.WavWrap(
          col("__bin").substr(
            (col("__off") + col("seg_start") * window * col("__ba")
              + lit(1L)).cast("int"),
            (col("seg_samples") * col("__ba")).cast("int")),
          col("__rate")).as("payload"))
  }

  /** MP4 / ISO-BMFF container metadata (M15 — VERDICT r13 task 4): the
    * [[binaryMetadata]] pattern for video containers via the REAL
    * [[graft.functions.Mp4Meta]] box walk — major brand, movie
    * timescale/duration (what frame-sampling needs to plan strides),
    * track count and the first track's presentation dims (what
    * shape-bucketed batching consumes). One pinned decode per row, a
    * plain scan-bound projection — no shuffle; non-MP4 payloads report
    * format = "unknown" with null fields (the never-crash contract).
    * Exact integer seconds-floor `duration_s` = duration div timescale
    * rides along for human-grain filtering without a double division.
    */
  def mp4Metadata(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val dec = df.select(col(idCol).as("doc_id"),
      graft.functions.Fence(graft.functions.Mp4Meta(col(binCol))).as("__m"))
    dec.select(col("doc_id"),
      col("__m.format").as("format"),
      col("__m.major_brand").as("major_brand"),
      col("__m.timescale").as("timescale"),
      col("__m.duration").as("duration"),
      col("__m.n_tracks").cast("long").as("n_tracks"),
      col("__m.width").cast("long").as("width"),
      col("__m.height").cast("long").as("height"))
      .withColumn("duration_s",
        when(col("timescale") > 0L, expr("duration div timescale"))
          .otherwise(lit(null).cast("long")))
  }

  /** JPEG/Exif metadata (M17) — [[graft.functions.ExifMeta]]'s marker
    * walk as a frame operator: byte order, Orientation (1–8, the flag
    * an image pipeline must honor before any resize — dropped
    * orientation is silently-rotated training data), Make, IFD0 entry
    * count; malformed payloads degrade to format = "unknown" with
    * null fields. Scan-bound projection, no shuffle — the M1/M15
    * class.
    */
  def exifMetadata(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val dec = df.select(col(idCol).as("doc_id"),
      graft.functions.Fence(graft.functions.ExifMeta(col(binCol))).as("__m"))
    dec.select(col("doc_id"),
      col("__m.format").as("format"),
      col("__m.byte_order").as("byte_order"),
      col("__m.orientation").cast("long").as("orientation"),
      col("__m.make").as("make"),
      col("__m.n_entries").cast("long").as("n_entries"))
  }

  /** Frame-sampling PLAN from container metadata (M16) — the step
    * between M15's box walk and an actual decoder: every valid video
    * gets a deterministic list of sample timestamps — one frame every
    * `stepSeconds`, capped at `maxFrames` per clip (uniform temporal
    * sampling, the standard pretraining-corpus frame-selection rule;
    * the cap bounds downstream decode work per clip so one 10-hour
    * video cannot dominate a batch). Emits one row per planned frame:
    * (doc_id, frame_idx, t_seconds, t_units) — t_units = t_seconds ·
    * timescale is what a real demuxer seeks to.
    *
    * All-integer arithmetic: n_frames = min(maxFrames,
    * duration_s div step + 1), timestamps are exact multiples —
    * engine-bit-exact with no double anywhere. Invalid/unknown
    * containers plan ZERO frames (no row), so the plan frame can feed
    * a decode stage unguarded.
    *
    * Scale: metadata-only — the payload column is read for the header
    * walk, the plan explode is bounded by maxFrames per clip, and no
    * shuffle happens at all (scan-stage projection + generate).
    */
  def frameSamplePlan(df: DataFrame, binCol: String, idCol: String,
      stepSeconds: Long = 10L, maxFrames: Int = 16): DataFrame = {
    require(stepSeconds >= 1 && maxFrames >= 1,
      s"bad sampling params: step=$stepSeconds maxFrames=$maxFrames")
    val meta = mp4Metadata(df, binCol, idCol)
    meta
      .filter(col("format") === "mp4" && col("duration_s").isNotNull
        && col("timescale") > 0L)
      .withColumn("n_frames",
        least(expr(s"duration_s div $stepSeconds") + 1L, lit(maxFrames.toLong)))
      .select(col("doc_id"), col("timescale"),
        posexplode(sequence(lit(0L), col("n_frames") - 1L))
          .as(Seq("frame_idx", "k")))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        (col("k") * stepSeconds).as("t_seconds"),
        (col("k") * stepSeconds * col("timescale")).as("t_units"))
  }

  /** Perceptual hash (aHash) over the STUB decode — the image near-dup
    * signature: 64 "pixels" sampled evenly through the payload bytes
    * (what a real 8×8 grayscale resize does to an image, minus the
    * codec), thresholded at their integer mean into a bit signature.
    * Bits 0–62 carry pixels 0–62; the sign bit stays CLEAR (pixel 63
    * joins the mean only) so 1<<i stays in BIGINT range on every
    * engine. Pure codegen'd expressions — one hex() per row pinned in
    * its own projection, 64 substr/conv samples, integer mean, no
    * shuffle; swap the sampling projection for a real decode UDF and
    * the rest of the pipeline (and its Hamming-LSH consumer) is
    * unchanged.
    */
  def perceptualHash(df: DataFrame, binCol: String, idCol: String): DataFrame =
    grayPixels(df, binCol, idCol)
      .select(col("doc_id"), aHashOf(col("__px")).as("phash"))

  /** Shared pixel pipeline of [[perceptualHash]] / [[perceptualHashWide]]:
    * (doc_id, __px) with __px the 64 grayscale samples — really decoded
    * block means for PPM/PNG, stub byte sampling otherwise.
    */
  private def grayPixels(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val b = col(binCol)
    // NO widen here, deliberately (A/B-measured): round-robin
    // repartitioning would move the PAYLOAD BYTES (plus the
    // sort-before-repartition pass over binary rows) just to
    // parallelize a decode that costs less than the exchange —
    // m6/m8/m12 measured 1.5-2x SLOWER with a widen in this spot.
    // The guide §8 rule in miniature: don't shuffle heavy opaque
    // payloads to save light per-row work.
    val step0 = df.select(col(idCol).as("doc_id"), b.as("__b"),
      graft.functions.Fence(graft.functions.DecodeMedia(b)).as("__m"))
    val step1 = step0.select(col("doc_id"), col("__m"),
      when(col("__m.format").isin(RealImageFormats: _*), lit(null).cast("string"))
        .otherwise(hex(col("__b"))).as("__hx"),
      length(col("__b")).cast("long").as("__len"))
    def pixAt(i: Int) = coalesce(
      conv(col("__hx").substr(
        (floor(col("__len").cast("double") * lit(i.toDouble) / lit(64.0d))
          * lit(2L) + lit(1L)).cast("int"),
        lit(2)), 16, 10).cast("long"),
      lit(0L))
    step1.select(col("doc_id"),
      when(col("__m.format").isin(RealImageFormats: _*), col("__m.gray64"))
        .otherwise(array((0 until 64).map(pixAt): _*)).as("__px"))
  }

  /** aHash of a 64-pixel array: bits 0–62 set when the pixel exceeds
    * the integer mean (>>6 of the sum); pixel 63 joins the mean only so
    * the sign bit stays clear (BIGINT shifts in range on every engine).
    */
  private def aHashOf(px: Column): Column = {
    val sum = (1 to 64).map(i => element_at(px, i)).reduce(_ + _)
    val mean = shiftright(sum, 6)
    (0 until 63)
      .map(i => when(element_at(px, i + 1) > mean, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
  }

  /** dHash of a 64-pixel array — the gradient (difference) hash, the
    * standard second spatial-domain digest beside aHash: bit i set when
    * pixel i+1 exceeds pixel i (63 adjacent pairs → 63 bits, sign
    * clear). Independent of the mean, so aHash ∥ dHash genuinely
    * carries more information than either alone.
    */
  private def dHashOf(px: Column): Column =
    (0 until 63)
      .map(i => when(element_at(px, i + 2) > element_at(px, i + 1),
        lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)

  /** Wide two-digest perceptual hash — the m6 capacity knob (the D36
    * recipe applied to images): the 63-bit aHash alone under a
    * hamming ≤ 7 pigeonhole forces 8-bit band slices = 256 buckets/band,
    * which saturates once the corpus outgrows bands·2⁸ (the measured
    * r12 m6 quadratic). aHash (hi) ∥ dHash (lo) = 126 bits affords
    * 9 × 14-bit slices = 16k buckets/band at the SAME hamming bound
    * through [[graft.operators.Dedup.hammingNearDup2]]. Identical pixel
    * pipeline — only the signature widens.
    */
  def perceptualHashWide(df: DataFrame, binCol: String, idCol: String): DataFrame =
    grayPixels(df, binCol, idCol)
      .select(col("doc_id"), aHashOf(col("__px")).as("phash_hi"),
        dHashOf(col("__px")).as("phash_lo"))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("batch_size", IntegerType),
    StructField("feat_dim", IntegerType),
    StructField("feat_l1", LongType)))

  /** Batched feature extraction over binary payloads — the Scala analog
    * of `mapInPandas`: payloads are processed per-partition in fixed-size
    * batches (the batch is where a real codec/model would amortize), and
    * each row reports the batch shape it was processed in. The "feature"
    * is a STUB: byte-histogram L1 mass over the first 256 bytes.
    */
  /** Declared-vs-derived metadata validation — the upload-manifest
    * audit every media ingest needs: producers DECLARE (length,
    * checksum) in a sidecar manifest; the payload says what it
    * actually is. One full-outer join of the derived metadata against
    * the manifest classifies every id exactly once, with the
    * precedence a triage queue wants: `missing_payload` (manifest
    * entry, no bytes — the failed-upload case) > `undeclared` (bytes, no
    * manifest — the orphan) > `malformed_manifest` (a manifest row
    * declaring only ONE of the two fields — a half-written sidecar must
    * never pass the checks it fails to state) > `len_mismatch`
    * (truncated/padded transfer) > `hash_mismatch` (corruption with the
    * right size — the one silent-data-corruption case a length check
    * misses) > `ok`. Comparisons are null-safe (`<=>`) so no NULL
    * declared field can ever fall through to `ok`; a manifest row with
    * BOTH fields null is indistinguishable from an absent row and
    * classifies `undeclared`.
    */
  def validateDeclaredMetadata(derived: DataFrame, declared: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    derived.join(declared, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("byte_len").isNull, "missing_payload")
          .when(col("decl_len").isNull && col("decl_md5").isNull, "undeclared")
          .when(col("decl_len").isNull || col("decl_md5").isNull,
            "malformed_manifest")
          .when(not(col("decl_len") <=> col("byte_len")), "len_mismatch")
          .when(not(col("decl_md5") <=> col("content_md5")), "hash_mismatch")
          .otherwise("ok").as("status"))

  def batchFeatures(df: DataFrame, binCol: String, idCol: String, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val bs = batch.size
          batch.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            val head = bytes.take(256)
            Row(id, bs, head.length, head.map(b => (b & 0xff).toLong).sum)
          }
        }
      }(enc)
  }
  private[operators] val dctCos: Array[Array[Double]] = Array(
    Array(1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0),
    Array(0.9807852804032304, 0.8314696123025452, 0.5555702330196023, 0.19509032201612833, -0.1950903220161282, -0.555570233019602, -0.8314696123025453, -0.9807852804032304),
    Array(0.9238795325112867, 0.38268343236508984, -0.3826834323650897, -0.9238795325112867, -0.9238795325112868, -0.38268343236509034, 0.38268343236509, 0.9238795325112865),
    Array(0.8314696123025452, -0.1950903220161282, -0.9807852804032304, -0.5555702330196022, 0.5555702330196018, 0.9807852804032304, 0.19509032201612878, -0.8314696123025451))

  /** REAL perceptual hash (pHash): 2D DCT-II over the decoder's 8×8
    * block-mean grayscale — the frequency-domain signature production
    * image dedup uses where aHash (m6) is the spatial-domain
    * approximation. The 16 low-frequency coefficients (u,v ∈ [0,3]²,
    * un-normalized — a positive per-coefficient scale never flips a
    * sign test) are computed as EXPLICIT 64-term dot products against
    * a LITERAL cosine table (17-significant-digit round-trip literals,
    * stated identically in the oracle SQL — no libm cos at query time,
    * so the doubles are bit-identical across engines); each AC
    * coefficient thresholds against the mean of all 15 (left-assoc
    * sum, /15.0), bit k = u·4+v set when above, DC bit 0 clear —
    * a 15-bit signature ready for [[graft.operators.Dedup
    * .hammingNearDup]] at nBits=16. Sum order is the same strict
    * left fold on both engines; g ≥ 1 everywhere rules the ±0.0
    * fold edge out (scaladoc'd because it is the one IEEE hazard).
    * Rows whose payload does not REALLY decode (format unknown) are
    * excluded — this operator is decode-or-nothing by design, the
    * stub fallback lives in [[perceptualHash]].
    */
  def dctPerceptualHash(df0: DataFrame, binCol: String, idCol: String): DataFrame = {
    // widen BEFORE the heavy per-row CPU (decode + 1024-term DCT): a
    // small-SF scan is one partition, and the whole pipeline would run
    // single-threaded on it (the d2/t30 lesson). Note the widen sits
    // ABOVE any expression the caller already attached to df0 — a
    // caller-synthesized payload column (the m11 test plant) is
    // computed pre-shuffle; real payloads come from storage, where the
    // scan itself is the parallel stage.
    val df = Dedup.widen(df0)
    val spark = df.sparkSession
    import spark.implicits._
    val dec = df.select(col(idCol).cast("long").as("doc_id"),
        graft.functions.Fence(graft.functions.DecodeMedia(col(binCol))).as("__m"))
      .filter(col("__m.format").isin(RealImageFormats: _*))
      .select(col("doc_id"), col("__m.gray64").as("g"))
    // the 16 dot products run as COMPILED Scala (first cut was 16
    // Catalyst trees of 64 interpreted terms each — measured 4.4 s
    // warm / 20+ s cold at sf0.1 for 5000 rows; this pass is 1024
    // compiled flops per row, scan-bound). Same doubles: java + and *
    // are what the interpreted Add/Multiply ran, the fold order is
    // unchanged, and the oracle needs no edit.
    dec.as[(Long, Seq[Long])].mapPartitions { it =>
      it.map { case (d, g) =>
        val px = g.toArray
        def coef(u: Int, v: Int): Double = {
          var acc = 0.0d
          var i = 0
          while (i < 64) {
            // same associativity as the SQL g*c1*c2 left chain
            acc += px(i).toDouble * dctCos(u)(i / 8) * dctCos(v)(i % 8)
            i += 1
          }
          acc
        }
        val ks = Array(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
        val cs = ks.map(k => coef(k / 4, k % 4))
        var sum = 0.0d
        cs.foreach(sum += _) // left-assoc chain, matches the oracle
        val mean = sum / 15.0d
        var bits = 0L
        var j = 0
        while (j < 15) {
          if (cs(j) > mean) bits |= 1L << ks(j)
          j += 1
        }
        (d, coef(0, 0).toLong, bits)
      }
    }.toDF("doc_id", "dc", "phash")
  }

}
