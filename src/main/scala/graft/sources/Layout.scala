package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scan-efficient table layout — at 100 TB the WRITE side decides the
  * read side's fate: partition directories give metadata-only pruning,
  * within-file sort gives parquet min/max row-group skipping and better
  * encodings, and file-size caps keep one task from producing a
  * monolith (or thousands of slivers) per partition.
  */
object Layout {

  /** Write `df` partitioned by `partitionCols`, clustered so each
    * partition directory is produced by a bounded number of tasks
    * (`filesPerPartition`), rows sorted by `sortCols` inside each file,
    * and at most `maxRecordsPerFile` rows per file.
    *
    * `repartition(partitionCols…, salt)` aligns tasks with output
    * directories — without it every task can hold rows of EVERY
    * partition value and a P-partition write fans out T×P files. The
    * salt bounds skew: a hot partition value still spreads over
    * `filesPerPartition` tasks.
    */
  def writeOptimized(df: DataFrame, path: String, partitionCols: Seq[String],
      sortCols: Seq[String], filesPerPartition: Int = 4,
      maxRecordsPerFile: Long = 1L << 22): Unit = {
    val salt = pmod(hash(sortCols.map(col): _*), lit(filesPerPartition))
    df.repartition(partitionCols.map(col) :+ salt: _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }

  /** Selective small-file compaction — the maintenance op that keeps a
    * streaming/incremental layout readable: every partition directory
    * whose parquet file count reaches `minFilesToCompact` is rewritten
    * to `targetFilesPerDir` files (re-sorted in-file so row-group
    * skipping survives), and healthy directories are NOT touched — at
    * 100 TB you cannot rewrite the table to fix the slivers last
    * night's trickle append left behind, you compact exactly the dirty
    * directories. Planning reads only file METADATA (KB of driver
    * state); each dirty dir is one bounded job reading just that dir,
    * and the swap (write aside → delete originals → rename in) keeps
    * the dir continuously readable except for the instant of the swap.
    * Independent dirs are embarrassingly parallel — schedule the loop
    * concurrently from a driver pool when dirty dirs are many.
    * Returns (partition_dir, files_before, files_after) per compacted
    * dir.
    */
  def compactPartitions(spark: SparkSession, root: String, sortCols: Seq[String],
      targetFilesPerDir: Int = 1, minFilesToCompact: Int = 2): Seq[(String, Int, Int)] = {
    require(targetFilesPerDir >= 1 && minFilesToCompact >= 2,
      s"need targetFilesPerDir >= 1 and minFilesToCompact >= 2")
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parts(d: org.apache.hadoop.fs.Path) =
      fs.listStatus(d).filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    fs.listStatus(rootPath).filter(_.isDirectory).toSeq.flatMap { d =>
      val files = parts(d.getPath)
      if (files.length < minFilesToCompact) None
      else {
        val tmp = new org.apache.hadoop.fs.Path(d.getPath.getParent,
          "." + d.getPath.getName + ".compacting")
        val read = spark.read.parquet(d.getPath.toString).coalesce(targetFilesPerDir)
        val sorted = if (sortCols.isEmpty) read
          else read.sortWithinPartitions(sortCols.map(col): _*)
        // the write MATERIALIZES the read before any original is deleted
        sorted.write.mode("overwrite").parquet(tmp.toString)
        files.foreach(f => fs.delete(f.getPath, false))
        parts(tmp).foreach(f =>
          fs.rename(f.getPath, new org.apache.hadoop.fs.Path(d.getPath, f.getPath.getName)))
        fs.delete(tmp, true)
        Some((d.getPath.getName, files.length, parts(d.getPath).length))
      }
    }
  }

  /** Per-partition-directory Bloom index (X16) — Delta/Iceberg-style
    * data skipping on plain parquet for NON-partition keys: each
    * partition dir gets a `_bloom/<dir>.bloom` sidecar built from ONE
    * bounded per-dir job (`stat.bloomFilter` — the x3 machinery), and
    * point lookups probe the KB-sized sidecars on the driver to read
    * only dirs that might contain the key. No false negatives — a
    * selected-dir set is always a superset of the true dirs — so the
    * pruned lookup is EXACT; fpp only costs extra dirs read. Sidecars
    * are idempotent overwrites; rebuild after compaction/erasure (the
    * same freshness contract as X12's manifest).
    */
  def writeBloomIndex(spark: SparkSession, root: String, keyCol: String,
      expectedItemsPerDir: Long, fpp: Double = 0.01): Seq[String] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(rootPath).filter(_.isDirectory)
      .filterNot(_.getPath.getName.startsWith("_")).toSeq.map { d =>
        val bf = spark.read.parquet(d.getPath.toString)
          .stat.bloomFilter(keyCol, expectedItemsPerDir, fpp)
        val out = new org.apache.hadoop.fs.Path(rootPath,
          s"_bloom/${d.getPath.getName}.bloom")
        val os = fs.create(out, true)
        try bf.writeTo(os) finally os.close()
        d.getPath.getName
      }
  }

  /** Bloom-pruned point lookup: probe every sidecar (driver-side, KB
    * each), then read ONLY the dirs whose filter might contain `key`
    * (basePath keeps the partition column). Returns the selected dir
    * names beside the frame so callers (and the spec) can assert the
    * pruning. An empty selection reads nothing.
    */
  def bloomPrunedLookup(spark: SparkSession, root: String, keyCol: String,
      key: Any): (Seq[String], DataFrame) = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bloomDir = new org.apache.hadoop.fs.Path(rootPath, "_bloom")
    val selected = fs.listStatus(bloomDir).filter(_.isFile).toSeq
      .filter { f =>
        val in = fs.open(f.getPath)
        try org.apache.spark.util.sketch.BloomFilter.readFrom(in)
          .mightContain(key)
        finally in.close()
      }
      .map(_.getPath.getName.stripSuffix(".bloom")).sorted
    val df =
      if (selected.isEmpty)
        spark.read.parquet(root).filter(lit(false))
      else
        spark.read.option("basePath", root)
          .parquet(selected.map(d => s"$root/$d"): _*)
          .filter(col(keyCol) === lit(key))
    (selected, df)
  }

  /** Per-partition-directory zone map (X19) — min/max data skipping on
    * plain parquet for RANGE predicates over non-partition keys, the
    * ordered complement of [[writeBloomIndex]]'s point lookups (what
    * Delta/Iceberg file statistics and classic warehouse zone maps do).
    * Built from ONE parallel scan: the `_metadata.file_path` hidden
    * column groups rows by partition dir, so the whole map is one
    * dir-grain aggregate — never one job per dir. Values keep their
    * own column types in the `_zonemap/` parquet sidecar (#dirs rows),
    * so pruning comparisons use the engine's type semantics, not
    * string round-trips. Idempotent overwrite; rebuild after
    * compaction/erasure (X12's freshness contract).
    */
  def writeZoneMap(spark: SparkSession, root: String,
      cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "zone map needs at least one column")
    // dir = the file's parent path RELATIVE to root ("" for files
    // sitting directly in root) — not the second-to-last path
    // component, which breaks on nested partitioning (a=1/b=2) and on
    // flat layouts. Root is qualified with the same FileSystem
    // machinery that renders `_metadata.file_path`, so prefix-stripping
    // is exact; [[writeZoneMap]] validates the strip after the write so
    // a mismatch fails HERE, not at scan time.
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val qualRoot = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
      .makeQualified(rootPath).toString
    val parent = regexp_replace(col("_metadata.file_path"), "/[^/]*$", "")
    val dir = when(length(parent) <= lit(qualRoot.length), lit(""))
      .otherwise(parent.substr(lit(qualRoot.length + 2), lit(Int.MaxValue)))
      .as("dir")
    spark.read.parquet(root)
      .select(dir +: cols.map(c => col(c)): _*)
      .groupBy(col("dir"))
      .agg(min(col(cols.head)).as(s"min_${cols.head}"),
        (Seq(max(col(cols.head)).as(s"max_${cols.head}")) ++
          cols.tail.flatMap(c =>
            Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))): _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$root/_zonemap")
    // Loud failure at build time: an unstripped qualified prefix in a
    // dir name means `$root/$dir` reconstruction would resolve nowhere.
    val bad = spark.read.parquet(s"$root/_zonemap")
      .filter(col("dir").contains(":")).select(col("dir")).collect()
    require(bad.isEmpty,
      s"zone-map dir derivation failed for root=$qualRoot: ${bad.mkString(",")}")
  }

  /** Zone-map-pruned range scan: dirs whose [min, max] envelope
    * intersects [lo, hi] are read (superset selection — min/max can
    * never exclude a dir that holds a matching row, so the pruned
    * result is EXACT); everything else is skipped without touching a
    * data byte. The dir selection itself is a #dirs-row frame filter,
    * so type coercion of `lo`/`hi` against the column follows engine
    * rules. Returns the selected dirs beside the frame (the
    * [[bloomPrunedLookup]] contract) so callers can assert pruning.
    */
  def zonePrunedRange(spark: SparkSession, root: String, keyCol: String,
      lo: Any, hi: Any): (Seq[String], DataFrame) = {
    val zm = spark.read.parquet(s"$root/_zonemap")
    val selected = zm.filter(col(s"max_$keyCol") >= lit(lo)
        && col(s"min_$keyCol") <= lit(hi))
      .select(col("dir")).collect().map(_.getString(0)).toSeq.sorted
    val df =
      if (selected.isEmpty)
        spark.read.parquet(root).filter(lit(false))
      else
        spark.read.option("basePath", root)
          // "" = files directly in root (flat layout)
          .parquet(selected.map(d => if (d.isEmpty) root else s"$root/$d"): _*)
          .filter(col(keyCol) >= lit(lo) && col(keyCol) <= lit(hi))
    (selected, df)
  }

  /** Versioned table commits + time travel on plain parquet (X18) —
    * the Delta/Iceberg ESSENCE without the format: a version is a
    * manifest (`_versions/v<N>.manifest`) listing exactly the data
    * files that comprise it. `append` commits write ONLY the new rows'
    * files and carry the previous version's file list forward by
    * reference — no data rewrite, metadata-only history — while
    * `overwrite` starts a fresh list (old files stay on disk, still
    * readable by older versions). The manifest is created AFTER its
    * data files land (X10's commit-after-write): a crash leaves orphan
    * data files, never a version pointing at missing data. Concurrent
    * writers are safe via optimistic concurrency — the manifest claims
    * its version number with create-no-overwrite and retries at the
    * next number on conflict (see the commit-point comment in the
    * body); X5 compaction / X13 erasure rewrite files in place and
    * invalidate older manifests, the X12 freshness contract.
    */
  def commitVersion(df: DataFrame, root: String,
      overwrite: Boolean = false,
      // test-only injection point: runs after a version number is
      // computed, before the claim — lets a spec deterministically
      // interleave a rival commit into the race window
      preClaimHook: Long => Unit = _ => ()): Long = {
    val spark = df.sparkSession
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val stage = new org.apache.hadoop.fs.Path(rootPath, s"_stage_$stamp")
    df.write.mode("overwrite").parquet(stage.toString)
    val dataDir = new org.apache.hadoop.fs.Path(rootPath, "data")
    fs.mkdirs(dataDir)
    val moved = fs.listStatus(stage)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-")).toSeq
      .map { f =>
        val name = s"$stamp-${f.getPath.getName}"
        fs.rename(f.getPath, new org.apache.hadoop.fs.Path(dataDir, name))
        name
      }
    fs.delete(stage, true)
    // Optimistic concurrency (the Delta-essence commit protocol): data
    // files land first under collision-free names; the manifest then
    // CLAIMS the next version number via create-no-overwrite — the
    // atomic commit point (NameNode-arbitrated on HDFS; LocalFS
    // approximates). A concurrent writer that claimed our number
    // surfaces as FileAlreadyExistsException: recompute the latest —
    // re-reading the WINNER's file list when appending, so appends
    // compose — and retry at N+1. Two interleaved committers land
    // N+1 and N+2; no commit is ever silently dropped or overwritten.
    var committed = -1L
    var attempts = 0
    while (committed < 0) {
      attempts += 1
      require(attempts <= 100,
        s"gave up claiming a version under $root after 100 conflicts")
      val latest = listVersions(spark, root).lastOption
      val prior =
        if (overwrite) Nil
        else latest.map(v => manifestFiles(fs, rootPath, v)).getOrElse(Nil)
      val version = latest.getOrElse(0L) + 1L
      preClaimHook(version)
      val mf = new org.apache.hadoop.fs.Path(rootPath,
        s"_versions/v$version.manifest")
      // lost-the-race is ONLY the create itself refusing to claim the
      // name; any later failure means WE created the file, and leaving
      // the partial write behind would commit a truncated manifest that
      // the N+1 retry then folds forward as prior — delete it and
      // propagate the genuine I/O failure instead
      val os =
        try fs.create(mf, false) // the CAS: never overwrite a version
        catch {
          // ONLY the explicit already-exists signal is a lost race
          // (LocalFS and HDFS both throw it); any other IOException
          // propagates — guessing "race" on a generic failure could
          // skip past a manifest WE half-created
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => null
        }
      if (os != null) {
        try {
          try os.write((prior ++ moved).mkString("\n").getBytes("UTF-8"))
          finally os.close()
        } catch {
          case e: Throwable =>
            try fs.delete(mf, false)
            catch { case _: java.io.IOException => () }
            throw e
        }
        committed = version
      }
    }
    committed
  }

  def listVersions(spark: SparkSession, root: String): Seq[Long] = {
    val dir = new org.apache.hadoop.fs.Path(root, "_versions")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).map(_.getPath.getName).toSeq
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toLong }
      .sorted
  }

  private def manifestFiles(fs: org.apache.hadoop.fs.FileSystem,
      rootPath: org.apache.hadoop.fs.Path, version: Long): Seq[String] = {
    val in = fs.open(new org.apache.hadoop.fs.Path(rootPath,
      s"_versions/v$version.manifest"))
    try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      .split("\n").toSeq.filter(_.nonEmpty)
    finally in.close()
  }

  /** Time travel: read the table AS OF `version` (default: latest).
    * Reads exactly the manifest's files. Entries are bare names under
    * `$root/data/` — except entries containing a path separator, which
    * are BY-REFERENCE paths into another table (shallow clones). */
  def readVersion(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = listVersions(spark, root)
    require(versions.nonEmpty, s"no committed versions under $root")
    val v = version.getOrElse(versions.last)
    require(versions.contains(v), s"unknown version $v (have $versions)")
    val files = manifestFiles(fs, rootPath, v)
      .map(n => if (n.contains("/")) n else s"$root/data/$n")
    spark.read.parquet(files: _*)
  }

  /** CLONE a versioned table at a version into a fresh root (Delta's
    * CLONE essence). `deep = true` byte-copies the version's files into
    * the clone's own data dir — full isolation, storage paid once per
    * clone. `deep = false` commits a manifest of BY-REFERENCE paths into
    * the source's data dir — zero data movement, the dev/test-branch
    * shape — with the standard shallow-clone contract: the clone pins
    * the source's FILES, so it survives source APPENDS (new commits add
    * new files) but a source erase/compaction that rewrites history
    * invalidates it (document, as Delta does for vacuum). Either way the
    * clone is a first-class table: its v1 equals `src@v`, later commits
    * diverge privately (appends land in the clone's own data dir; the
    * optimistic-concurrency protocol is inherited unchanged), and the
    * source never observes them.
    */
  def cloneVersion(spark: SparkSession, srcRoot: String, dstRoot: String,
      version: Option[Long] = None, deep: Boolean = true): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcPath = new org.apache.hadoop.fs.Path(srcRoot)
    val fs = srcPath.getFileSystem(conf)
    val versions = listVersions(spark, srcRoot)
    require(versions.nonEmpty, s"no committed versions under $srcRoot")
    val v = version.getOrElse(versions.last)
    require(versions.contains(v), s"unknown version $v (have $versions)")
    require(listVersions(spark, dstRoot).isEmpty,
      s"clone target $dstRoot already has commits")
    val files = manifestFiles(fs, srcPath, v)
    val dstPath = new org.apache.hadoop.fs.Path(dstRoot)
    val entries =
      if (!deep) files.map(n =>
        if (n.contains("/")) n // cloning a shallow clone keeps the ref
        else new org.apache.hadoop.fs.Path(srcPath, s"data/$n").toString)
      else {
        val dataDir = new org.apache.hadoop.fs.Path(dstPath, "data")
        fs.mkdirs(dataDir)
        files.map { n =>
          val from = if (n.contains("/")) new org.apache.hadoop.fs.Path(n)
            else new org.apache.hadoop.fs.Path(srcPath, s"data/$n")
          val name = from.getName
          org.apache.hadoop.fs.FileUtil.copy(fs, from, fs,
            new org.apache.hadoop.fs.Path(dataDir, name), false, conf)
          name
        }
      }
    fs.mkdirs(new org.apache.hadoop.fs.Path(dstPath, "_versions"))
    val mf = new org.apache.hadoop.fs.Path(dstPath, "_versions/v1.manifest")
    val os = fs.create(mf, false) // same CAS as commitVersion
    try os.write(entries.mkString("\n").getBytes("UTF-8")) finally os.close()
    1L
  }

  /** Partition filters of the frame's file scan — non-empty means the
    * read is metadata-pruned to the matching directories (NOTE:
    * `inputFiles` is NOT this; it lists the whole relation unpruned).
    */
  def partitionFilters(reader: DataFrame): Seq[String] =
    flattenPlan(reader.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.partitionFilters.map(_.sql)
    }.flatten

  /** 2-D Morton (z-order) interleave: bit i of `a` lands at bit 2i, bit
    * i of `b` at bit 2i+1, so sorting by the z-value clusters rows that
    * are close in BOTH dimensions — after a range-partitioned write,
    * every file covers a compact z-range ≈ a rectangle in (a, b) space,
    * and parquet min/max skipping prunes on EITHER column's predicate
    * (a plain sort clusters only its leading column; this is Delta's
    * OPTIMIZE ZORDER in plain Spark). Inputs are masked to 31 bits
    * (documented admissible range [0, 2^31); out-of-range values alias,
    * they never overflow), the output fits bit 61, and the whole
    * computation is 30 codegen'd shift/mask/or ops — exactly
    * reproducible in any engine with 64-bit integer ops.
    */
  def zOrderValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    def spread(x: org.apache.spark.sql.Column) = {
      val x0 = x.cast("long").bitwiseAND(lit(0x7FFFFFFFL))
      val x1 = x0.bitwiseOR(shiftleft(x0, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
      val x2 = x1.bitwiseOR(shiftleft(x1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
      val x3 = x2.bitwiseOR(shiftleft(x2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
      val x4 = x3.bitwiseOR(shiftleft(x3, 2)).bitwiseAND(lit(0x3333333333333333L))
      x4.bitwiseOR(shiftleft(x4, 1)).bitwiseAND(lit(0x5555555555555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** n-D Morton (z-order) interleave, round-robin: bit j of column k
    * lands at output bit `j*n + k`, each column masked to
    * `floor(63/n)` bits (n=3 → 21 bits/col, output fits bit 62; same
    * aliasing-never-overflow contract as the 2-D path). Real tables
    * prune on (tenant, day, key) — three-plus dimensions — which the
    * 2-D interleave can't cluster. n=2 delegates to [[zOrderValue]]'s
    * magic-mask spread (bit-identical layout: round-robin with n=2 IS
    * the even/odd interleave); general n builds the static
    * shift/mask/or chain per bit — all codegen'd integer ops,
    * reproducible on any 64-bit engine.
    */
  def zOrderValueN(cols: Seq[org.apache.spark.sql.Column])
      : org.apache.spark.sql.Column = {
    require(cols.size >= 2 && cols.size <= 8,
      s"z-order needs 2..8 columns: ${cols.size}")
    val n = cols.size
    if (n == 2) zOrderValue(cols(0), cols(1))
    else {
      val bitsPer = 63 / n
      cols.zipWithIndex.map { case (c, k) =>
        val x = c.cast("long").bitwiseAND(lit((1L << bitsPer) - 1))
        (0 until bitsPer).map { j =>
          shiftleft(shiftright(x, j).bitwiseAND(lit(1L)), j * n + k)
        }.reduce(_.bitwiseOR(_))
      }.reduce(_.bitwiseOR(_))
    }
  }

  /** [[writeZOrdered]] on n columns: one range-partitioned shuffle on
    * the n-D interleave, per-file clustering on EVERY listed dimension.
    */
  def writeZOrderedN(df: DataFrame, path: String, cols: Seq[String],
      numFiles: Int = 8): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1: $numFiles")
    df.withColumn("__z", zOrderValueN(cols.map(col)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** n-D Hilbert curve index over 2..8 columns, each masked to
    * `floor(63/n)` bits (same admissible-range contract as
    * [[zOrderValueN]]). Consecutive Hilbert indices are L1-distance-1
    * grid neighbors (HilbertSpec proves it exhaustively), so a
    * contiguous index range — one file after the clustered write — is a
    * CONNECTED region of the key space, where a Morton range can span
    * two far-apart rectangles across quadrant seams. Tighter per-file
    * min/max boxes on every dimension = more files skipped at 100 TB.
    */
  def hilbertValue(cols: Seq[org.apache.spark.sql.Column])
      : org.apache.spark.sql.Column = {
    require(cols.size >= 2 && cols.size <= 8,
      s"hilbert needs 2..8 columns: ${cols.size}")
    graft.functions.HilbertIndex(cols.map(_.cast("long")), 63 / cols.size)
  }

  /** [[writeZOrderedN]] with Hilbert clustering: one range-partitioned
    * shuffle on the curve index, per-file locality on every listed
    * dimension — the strictly-better curve at identical write cost.
    */
  def writeHilbert(df: DataFrame, path: String, cols: Seq[String],
      numFiles: Int = 8): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1: $numFiles")
    df.withColumn("__h", hilbertValue(cols.map(col)))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }

  /** Z-order-clustered write: range-partition on the interleaved value
    * (sampled range boundaries — balanced files regardless of the data
    * distribution), sort by it inside each file, write `numFiles`
    * files. One shuffle, same cost as any global sort — the clustering
    * quality on both dims is what the shuffle buys. LayoutSpec measures
    * it: per-file min/max spans shrink on BOTH columns vs a
    * single-column sort, which is the file-skipping win at 100 TB.
    */
  def writeZOrdered(df: DataFrame, path: String, aCol: String, bCol: String,
      numFiles: Int = 8): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1: $numFiles")
    df.withColumn("__z", zOrderValue(col(aCol), col(bCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Incremental clustering maintenance (the liquid-clustering /
    * LSM-ish OPTIMIZE shape): a table is a set of CLUSTERED generations
    * under `root/base/gen_*` plus an unclustered append tail under
    * `root/delta`. [[maintainClustered]] fires only once the tail holds
    * `minDeltaFiles` files, Hilbert-clusters JUST the tail into a new
    * generation, and deletes exactly the files it read — maintenance
    * cost is ∝ delta, existing generations are never rewritten (each is
    * internally clustered; cross-generation overlap is the accepted
    * LSM trade, collapsible any time by a full [[writeHilbert]] over
    * [[readClustered]]). Concurrent appends are safe: files that land
    * in the tail mid-maintenance are not in the listed set and survive
    * for the next cycle.
    */
  def appendDelta(df: DataFrame, root: String): Unit =
    df.write.mode("append").parquet(s"$root/delta")

  /** Commit one clustered generation with the LEDGER as the commit
    * point: the generation is written to a `base/_tmp_gen_*` staging
    * dir, its `_consumed.txt` ledger (the delta names it absorbed) is
    * written INSIDE it, and only then is the dir renamed to `gen_N` —
    * readers recognize a generation by the `gen_` prefix, so a crash
    * anywhere before the rename leaves the delta intact and an inert
    * staging dir that the next cycle garbage-collects; a crash AFTER
    * the rename leaves absorbed deltas on disk, which the next cycle's
    * ledger-driven stale sweep reclaims before reading anything — in
    * neither window can [[readClustered]] return a row twice.
    * Single concurrent maintainer assumed (concurrent APPENDS are safe;
    * a second maintainer could GC a first's live staging dir).
    */
  private def commitGeneration(spark: SparkSession, root: String,
      cols: Seq[String], numFiles: Int, df: DataFrame,
      consumedNames: Seq[String]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val baseDir = new org.apache.hadoop.fs.Path(root, "base")
    val fs = baseDir.getFileSystem(conf)
    fs.mkdirs(baseDir)
    // GC staging dirs a crashed cycle left behind — never committed,
    // their source deltas are still present and will be re-clustered
    fs.listStatus(baseDir)
      .filter(_.getPath.getName.startsWith("_tmp_gen_"))
      .foreach(d => fs.delete(d.getPath, true))
    val gen = fs.listStatus(baseDir).map(_.getPath.getName).toSeq
      .collect { case n if n.startsWith("gen_") => n.stripPrefix("gen_").toLong }
      .reduceOption(_ max _).map(_ + 1L).getOrElse(0L)
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new org.apache.hadoop.fs.Path(baseDir, s"_tmp_gen_$stamp")
    writeHilbert(df, tmp.toString, cols, numFiles)
    // ledger inside the staging dir — it becomes visible atomically
    // with the generation itself
    val ledger = new org.apache.hadoop.fs.Path(tmp, "_consumed.txt")
    val os = fs.create(ledger, false)
    try os.write(consumedNames.mkString("\n").getBytes("UTF-8"))
    finally os.close()
    val genPath = new org.apache.hadoop.fs.Path(baseDir, s"gen_$gen")
    require(fs.rename(tmp, genPath),
      s"failed to commit generation $genPath (rename refused)")
  }

  /** Run one maintenance cycle; returns true if a generation was
    * written (tail held at least `minDeltaFiles` parquet files).
    */
  def maintainClustered(spark: SparkSession, root: String, cols: Seq[String],
      numFiles: Int = 8, minDeltaFiles: Int = 4): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val deltaDir = new org.apache.hadoop.fs.Path(root, "delta")
    val fs = deltaDir.getFileSystem(conf)
    if (!fs.exists(deltaDir)) return false
    val consumed = consumedBatches(spark, root)
    val all = fs.listStatus(deltaDir)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet")).toSeq
    // finish any interrupted cleanup first — files named by some
    // generation's ledger are already durable inside it
    val (stale, files) = all.partition(f => consumed(f.getPath.getName))
    stale.foreach(f => fs.delete(f.getPath, false))
    if (files.size < minDeltaFiles) return false
    commitGeneration(spark, root, cols, numFiles,
      spark.read.parquet(files.map(_.getPath.toString): _*),
      files.map(_.getPath.getName))
    // remove exactly what was clustered — concurrent appends survive
    files.foreach(f => fs.delete(f.getPath, false))
    true
  }

  /** [[maintainClustered]] over WHOLE batch directories
    * (`root/delta/batch_*`, the streaming cluster-on-write layout) with
    * a consumed-batch ledger for exactly-once under crash replay:
    * each generation records the batch dirs it absorbed in
    * `_consumed.txt`, so (a) a maintenance re-run after a crash between
    * generation write and delta delete sees those batches as consumed
    * and only finishes the cleanup (idempotent), and (b) a replayed
    * streaming trigger can ask [[consumedBatches]] whether its batch is
    * already durable inside a generation and skip re-creating it (the
    * X10 ingest-ledger idea fused into the clustering maintenance).
    */
  def maintainClusteredBatches(spark: SparkSession, root: String,
      cols: Seq[String], numFiles: Int = 8,
      minDeltaBatches: Int = 4): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val deltaDir = new org.apache.hadoop.fs.Path(root, "delta")
    val fs = deltaDir.getFileSystem(conf)
    val consumed = consumedBatches(spark, root)
    val dirs = if (!fs.exists(deltaDir)) Seq.empty
      else fs.listStatus(deltaDir).toSeq
        .filter(d => d.isDirectory && d.getPath.getName.startsWith("batch_"))
    // finish any interrupted cleanup first — consumed dirs are already
    // durable inside a generation, their delta copy is garbage
    val (stale, fresh) = dirs.partition(d => consumed(d.getPath.getName))
    stale.foreach(d => fs.delete(d.getPath, true))
    if (fresh.size < minDeltaBatches) return false
    // ledger-inside-rename commit (see commitGeneration): a crash
    // before the rename leaves the batches unconsumed and an inert
    // staging dir; a crash after it leaves consumed-but-present
    // batches, which the stale sweep above reclaims next cycle
    commitGeneration(spark, root, cols, numFiles,
      spark.read.parquet(fresh.map(_.getPath.toString): _*),
      fresh.map(_.getPath.getName))
    fresh.foreach(d => fs.delete(d.getPath, true))
    true
  }

  /** Batch dirs already absorbed into some generation (union of the
    * per-generation ledgers). */
  def consumedBatches(spark: SparkSession, root: String): Set[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val baseDir = new org.apache.hadoop.fs.Path(root, "base")
    val fs = baseDir.getFileSystem(conf)
    if (!fs.exists(baseDir)) Set.empty
    else fs.listStatus(baseDir).toSeq
      .filter(_.getPath.getName.startsWith("gen_"))
      .flatMap { g =>
        val l = new org.apache.hadoop.fs.Path(g.getPath, "_consumed.txt")
        if (!fs.exists(l)) Nil
        else {
          val in = fs.open(l)
          try new String(
              org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
            .split("\n").toSeq.filter(_.nonEmpty)
          finally in.close()
        }
      }.toSet
  }

  /** The full table view: every clustered generation plus the
    * unclustered tail. */
  def readClustered(spark: SparkSession, root: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(conf)
    val baseDir = new org.apache.hadoop.fs.Path(root, "base")
    val gens = if (!fs.exists(baseDir)) Seq.empty[String]
      else fs.listStatus(baseDir).toSeq
        .filter(_.getPath.getName.startsWith("gen_")).map(_.getPath.toString)
    val deltaDir = new org.apache.hadoop.fs.Path(root, "delta")
    // the tail is either loose files (batch appendDelta) or batch_* dirs
    // (streaming cluster-on-write) — read whichever exist. Entries named
    // by a generation's ledger are that generation's rows awaiting an
    // interrupted cleanup sweep (maintenance crashed between its rename
    // commit and the delta delete) — reading them would double-count
    val consumed = consumedBatches(spark, root)
    val deltaPaths = if (!fs.exists(deltaDir)) Seq.empty[String]
      else fs.listStatus(deltaDir).toSeq
        .filterNot(e => consumed(e.getPath.getName)).collect {
        case f if f.isFile && f.getPath.getName.endsWith(".parquet") =>
          f.getPath.toString
        case d if d.isDirectory && d.getPath.getName.startsWith("batch_") &&
            fs.listStatus(d.getPath).exists(x => x.isFile &&
              x.getPath.getName.endsWith(".parquet")) =>
          d.getPath.toString
      }
    val paths = gens ++ deltaPaths
    require(paths.nonEmpty, s"no data under $root")
    spark.read.parquet(paths: _*)
  }

  /** Every node of a physical plan with AQE wrappers flattened:
    * AdaptiveSparkPlanExec / QueryStageExec hide their inner plans in
    * FIELDS, not children, so a plain `collect` never sees the real
    * scans/exchanges — the recurring trap when asserting on executed
    * plans. Shared by plan-inspection specs.
    */
  def flattenPlan(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    p.collect {
      case a: AdaptiveSparkPlanExec => a +: flattenPlan(a.executedPlan)
      case q: QueryStageExec => q +: flattenPlan(q.plan)
      case other => Seq(other)
    }.flatten
  }

  /** Right-to-erasure delete on a plain-parquet table: remove every row
    * whose `keyCol` is in `keys`, REWRITING ONLY THE FILES THAT CONTAIN
    * THEM — one `_metadata.file_name` probe scan finds the touched
    * files (on a layout clustered/z-ordered by the key that is a
    * handful of files, not the lake), each is read back minus the
    * erased rows and swapped in write-aside; untouched files keep
    * their bytes. This is the Delta-DELETE essence at 100 TB: the cost
    * scales with data CONTAINING the keys, never the table. Returns
    * (rewritten file names, erased row count). Erasure keys broadcast
    * (a deletion batch is small by nature).
    */
  def eraseKeys(spark: SparkSession, path: String, keyCol: String,
      keys: Seq[Any]): (Seq[String], Long) = {
    require(keys.nonEmpty, "no keys to erase")
    spark.catalog.refreshByPath(path)
    val keyLit = keys.map(lit)
    val touched = spark.read.parquet(path)
      .filter(col(keyCol).isin(keyLit: _*))
      .select(col("_metadata.file_name").as("f"))
      .groupBy(col("f")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    if (touched.isEmpty) (Seq.empty, 0L)
    else {
      val rootPath = new org.apache.hadoop.fs.Path(path)
      val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      touched.foreach { case (name, _) =>
        val file = new org.apache.hadoop.fs.Path(rootPath, name)
        val tmp = new org.apache.hadoop.fs.Path(rootPath, s".$name.erasing")
        // write-aside, then swap: the rewrite materializes fully before
        // the original is deleted — a crash leaves the original intact
        spark.read.parquet(file.toString)
          .filter(!col(keyCol).isin(keyLit: _*))
          .coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        fs.delete(file, false)
        fs.listStatus(tmp).toSeq
          .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
          .foreach(s => fs.rename(s.getPath,
            new org.apache.hadoop.fs.Path(rootPath, name)))
        fs.delete(tmp, true)
        // drop the LocalFS crc sidecar of the replaced file if present
        val crc = new org.apache.hadoop.fs.Path(rootPath, s".$name.crc")
        if (fs.exists(crc)) { fs.delete(crc, false); () }
      }
      spark.catalog.refreshByPath(path)
      (touched.map(_._1), touched.map(_._2).sum)
    }
  }

  /** Per-file content fingerprints of a parquet table: row count plus
    * an ORDER-INDEPENDENT content hash (`bit_xor` of the per-row
    * xxhash64 over all columns — no overflow semantics, any row order
    * inside the file yields the same fingerprint). Grouping by the
    * `_metadata.file_name` hidden column means one scan fingerprints
    * every file in parallel.
    */
  def fingerprintFiles(spark: SparkSession, path: String): DataFrame = {
    // the session-level FileStatusCache otherwise serves stale
    // listings/sizes for a path read earlier — an integrity audit must
    // see the filesystem as it IS
    spark.catalog.refreshByPath(path)
    val df = spark.read.parquet(path)
    val rowHash = xxhash64(df.columns.map(col).toIndexedSeq: _*)
    df.select(col("_metadata.file_name").as("file_name"), rowHash.as("h"))
      .groupBy(col("file_name"))
      .agg(count(lit(1)).as("n_rows"), bit_xor(col("h")).as("content_hash"))
  }

  /** Write the table's integrity MANIFEST: per-file fingerprints from
    * [[fingerprintFiles]], persisted beside the data. At 100 TB silent
    * corruption (bit rot, partial copies, a truncated replication) is a
    * when, not an if — the manifest is what lets an audit prove a
    * replica byte-equivalent without comparing bytes across sites.
    */
  def writeManifest(spark: SparkSession, path: String, manifestPath: String): Unit =
    fingerprintFiles(spark, path)
      .coalesce(1).write.mode("overwrite").parquet(manifestPath)

  /** Integrity audit: recompute fingerprints and diff against the
    * manifest. One full-outer join of two #files-sized frames; statuses
    * `ok` / `modified` (hash or count drifted) / `missing` (in manifest,
    * not on disk) / `unexpected` (on disk, not in manifest).
    */
  def verifyManifest(spark: SparkSession, path: String,
      manifestPath: String): DataFrame = {
    val now = fingerprintFiles(spark, path)
      .withColumnsRenamed(Map("n_rows" -> "rows_now", "content_hash" -> "hash_now"))
    val recorded = spark.read.parquet(manifestPath)
    recorded.join(now, Seq("file_name"), "full_outer")
      .withColumn("status",
        when(col("rows_now").isNull, lit("missing"))
          .when(col("n_rows").isNull, lit("unexpected"))
          .when(col("n_rows") === col("rows_now")
            && col("content_hash") === col("hash_now"), lit("ok"))
          .otherwise(lit("modified")))
      .select(col("file_name"), col("status"), col("n_rows"), col("rows_now"),
        col("content_hash"), col("hash_now"))
  }
}
