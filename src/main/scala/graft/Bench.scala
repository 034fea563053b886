package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, forcing full materialization through the noop
  * sink (count() would let Catalyst prune the computed columns), and
  * prints one JSON line.
  */
object Bench {

  /** Merge a bench run into the prior committed artifact — pure, so the
    * gating policy is spec-testable (BenchMergeSpec). Three rules:
    *
    *  1. STALE DROP: prior keys no longer in the registry are removed
    *    (a renamed query must not inflate the total forever).
    *  2. CONTENTION GATE: a run covering most of the registry whose
    *    MEDIAN per-query ratio vs the prior artifact exceeds
    *    `medianGate` is a uniformly-contended host, not 100 real
    *    regressions — the prior values are KEPT on overlap and only
    *    genuinely-new keys merge in. The old >2× per-query check
    *    provably misses a uniform 1.3× run (VERDICT r9 task 1); the
    *    median catches exactly that signature while staying blind to a
    *    few real regressions in an otherwise-quiet run.
    *  3. TAIL GATE (VERDICT r13 what's-wrong 1): even when the median
    *    passes, a FULL-registry run must not replace a previously-quiet
    *    key at >`tailGate`× its prior value — the r13 driver run passed
    *    the median at 1.03× while merging x15_ks_drift at 5.5× (the
    *    x-series runs last and caught the contention the median
    *    missed). Such keys KEEP the prior value with a loud warning;
    *    a genuine regression is accepted by re-measuring the key alone
    *    (partial runs are deliberate isolated re-measures and bypass
    *    this gate) or by listing it in `acceptDrift`
    *    (SPARK_GRAFT_BENCH_ACCEPT_DRIFT, comma-separated or "all").
    *  4. Otherwise this run wins on overlap, prior fills the gaps — a
    *    partial run can never shrink the baseline (ADVICE r8).
    *
    * @return (merged artifact, human-readable warnings)
    */
  def mergeRuns(prior: Map[String, Double], run: Map[String, Double],
      registry: Set[String], medianGate: Double = 1.15,
      tailGate: Double = 2.0, acceptDrift: Set[String] = Set.empty)
      : (Seq[(String, Double)], Seq[String]) = {
    val warnings = Seq.newBuilder[String]
    val stale = prior.keySet.diff(registry)
    if (stale.nonEmpty)
      warnings += s"dropped ${stale.size} stale prior key(s) not in the " +
        s"registry: ${stale.toSeq.sorted.mkString(", ")}"
    val livePrior = prior -- stale
    val ratios = run.toSeq.collect {
      case (k, v) if livePrior.get(k).exists(_ > 0.05) => v / livePrior(k)
    }.sorted
    val fullRegistryRun = registry.nonEmpty &&
      run.keySet.intersect(registry).size * 2 >= registry.size
    val contended = fullRegistryRun && ratios.size >= 20 && {
      val med = ratios(ratios.size / 2)
      val hit = med > medianGate
      if (hit) warnings += f"CONTENDED RUN: median per-query ratio $med%.3f " +
        f"vs prior exceeds $medianGate%.2f across ${ratios.size} queries - " +
        "keeping prior baseline on overlap; re-measure on a quiet host"
      hit
    }
    val acceptAll = acceptDrift.contains("all")
    val gatedRun =
      if (contended || !fullRegistryRun) run
      else run.map { case (k, v) =>
        livePrior.get(k) match {
          case Some(p) if p > 0.05 && v > tailGate * p &&
              !acceptAll && !acceptDrift(k) =>
            warnings += f"TAIL OUTLIER $k: $v%.3f s is >${tailGate}%.1fx the " +
              f"prior $p%.3f s in a median-clean full run - keeping the prior " +
              "value; re-measure the key alone (partial runs merge freely) or " +
              "set SPARK_GRAFT_BENCH_ACCEPT_DRIFT to accept"
            k -> p
          case _ => k -> v
        }
      }
    val merged =
      if (contended) (gatedRun ++ livePrior).toSeq.sortBy(_._1) // prior wins
      else (livePrior ++ gatedRun).toSeq.sortBy(_._1)           // run wins
    (merged, warnings.result())
  }

  val defaultSfDir = "/root/testdata/sf0.1"
  val defaultCpus = "32"

  /** Artifact path for a run — pure, spec-pinned (VERDICT r14 task 2):
    * a run at a foreign SF *or a foreign core count* with no explicit
    * SPARK_GRAFT_BENCH_OUT must NOT overwrite the committed default
    * artifact. The r14 driver's 8-core scaling run merged into the same
    * bench_out.json as the 32-core run (mergeRuns guarded cross-SF but
    * not cross-CPU), silently replacing the full 32-core per-query
    * record with 8-core times. Foreign runs divert to a suffixed
    * sibling (bench_out.<sf>.json / bench_out.c<cpus>.json).
    */
  def artifactPath(explicitOut: Option[String], sfDir: String,
      cpus: String): (String, Option[String]) =
    explicitOut match {
      case Some(p) => (p, None)
      case None =>
        val sfPart =
          if (sfDir != defaultSfDir) "." + sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
          else ""
        val cpuPart = if (cpus != defaultCpus) s".c$cpus" else ""
        if (sfPart.nonEmpty || cpuPart.nonEmpty) {
          val p = s"bench_out$sfPart$cpuPart.json"
          (p, Some(s"foreign run (sf=$sfDir cpus=$cpus) and " +
            s"SPARK_GRAFT_BENCH_OUT unset - redirecting the artifact to $p " +
            "so bench_out.json keeps the committed default baseline"))
        } else ("bench_out.json", None)
    }

  /** Parse a prior artifact into the merge/drift baseline — pure,
    * spec-pinned. An artifact measured at a different SF *or core
    * count* must not serve as the baseline: cross-SF would trip the
    * gate on ~10x ratios and then relabel old-SF times (review finding
    * r10); cross-CPU would grade a 32-core run against 8-core times
    * (VERDICT r14 what's-wrong 2). A prior with no "cpus" field
    * (pre-r15 artifact) is accepted with a warning — it cannot be
    * distinguished, and rejecting it would let a partial run shrink
    * the baseline.
    */
  def parsePrior(ref: String, sfDir: String, cpus: String)
      : (Map[String, Double], Seq[String]) = {
    val priorSf = """"sf":"([^"]*)"""".r.findFirstMatchIn(ref).map(_.group(1))
    val priorCpus = """"cpus":"?([0-9]+)"?""".r.findFirstMatchIn(ref).map(_.group(1))
    if (priorSf.exists(_ != sfDir))
      (Map.empty, Seq(s"prior artifact measured sf '${priorSf.get}' != " +
        s"current '$sfDir' - ignoring it (no merge, no drift compare); " +
        "set SPARK_GRAFT_BENCH_REF for cross-SF runs"))
    else if (priorCpus.exists(_ != cpus))
      (Map.empty, Seq(s"prior artifact measured at ${priorCpus.get} cpus != " +
        s"current $cpus - ignoring it (no merge, no drift compare); " +
        "set SPARK_GRAFT_BENCH_REF to compare across core counts"))
    else {
      // exponent-aware: a sub-millisecond time serialized as 9.5E-4
      // must not parse as 9.5 — since the r9 merge a mis-parse would
      // be written BACK into the artifact as a permanently inflated
      // drift baseline (values are also written in plain decimal now)
      val kv = """"([a-z0-9_]+)":([0-9.]+(?:[eE][-+]?[0-9]+)?)""".r
      val m = kv.findAllMatchIn(ref)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap - "value" - "cpus"
      val warn =
        if (priorCpus.isEmpty)
          Seq("prior artifact has no cpus field (pre-r15) - assuming it " +
            s"matches the current $cpus")
        else Seq.empty
      (m, warn)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", defaultSfDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val selected =
      if (args.nonEmpty) SparkEntry.queries.view.filterKeys(args.toSet).toMap
      else SparkEntry.queries

    // JVM/codegen warmup on the smallest SF so per-query numbers measure
    // the plan, not JIT compilation.
    selected.values.foreach { fn =>
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    // best-of-2 per query: the host CPU is time-shared, so single-shot
    // timings mix scheduler noise into the measurement; the min is the
    // steady-state cost of the plan.
    val results = selected.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      System.gc() // settle heap between queries: measure the plan, not
                  // the previous query's garbage
      var failed = false
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case t: Throwable =>
          failed = true
          System.err.println(s"[bench] $name failed: $t")
        }
        (System.nanoTime() - t0) / 1e9
      }
      // a failed query records NO time: its ~0.1 s wall clock is not a
      // measurement, and a broken full run (bad SF dir, regression)
      // would otherwise register as uniformly FASTER — sailing under
      // the one-sided contention gate and wiping the drift baseline
      // with fail-times (review finding, round 10)
      if (failed) None else Some(name -> times.min)
    }
    // A run at any SF or core count other than the committed baseline's
    // is FOREIGN — judged from the run itself (env vs defaults), not
    // from whatever prior file happened to load: a missing/unreadable
    // bench_out.json must not let an sf10 sweep or the driver's 8-core
    // scaling run write itself into the default artifact, and an
    // explicitly-foreign SPARK_GRAFT_BENCH_REF must not redirect a
    // legitimate default run's output away from bench_out.json
    // (ADVICE r11, VERDICT r14 task 2).
    val (outPath, pathWarn) =
      artifactPath(sys.env.get("SPARK_GRAFT_BENCH_OUT"), sfDir, cpus)
    pathWarn.foreach(w => System.err.println(s"[bench] $w"))
    // Drift self-check (VERDICT r7 task 5): the committed artifact is
    // what future rounds grade against, and a contended host can put a
    // 2-3× outlier into it silently (r7 shipped t23 at 7.09 s vs 3.29
    // isolated). Compare this run against the PRIOR committed artifact
    // (read BEFORE overwriting it) and flag every >2× per-query
    // regression loudly so a contended number never gets committed
    // unexamined. The default prior is the artifact this run is about
    // to overwrite — so a repeated foreign-SF sweep merges into its
    // SF-suffixed sibling instead of silently replacing it (ADVICE r11).
    val refPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_REF", outPath)
    val prior: Map[String, Double] = try {
      val ref = java.nio.file.Files.readString(java.nio.file.Paths.get(refPath))
      val (m, warns) = parsePrior(ref, sfDir, cpus)
      warns.foreach(w => System.err.println(s"[bench] prior $refPath: $w"))
      m
    } catch { case t: Throwable =>
      System.err.println(s"[bench] drift check skipped: $t"); Map.empty
    }
    if (prior.nonEmpty) {
      val drifted = results.filter { case (name, sec) =>
        prior.get(name).exists(p => p > 0.05 && sec > 2.0 * p)
      }
      drifted.foreach { case (name, sec) =>
        System.err.println(f"[bench] DRIFT $name: $sec%.2f s is >2x the " +
          f"committed ${prior(name)}%.2f s - re-measure isolated before committing")
      }
      if (drifted.isEmpty)
        System.err.println(s"[bench] drift check vs $refPath: clean " +
          s"(${results.size} queries, none >2x prior)")
    }

    // Merge + contention gate (pure logic in mergeRuns; VERDICT r9
    // task 1): a partial run can't shrink the baseline, a uniformly
    // contended full run can't replace it, and renamed queries don't
    // haunt the total under their old names.
    val acceptDrift = sys.env.get("SPARK_GRAFT_BENCH_ACCEPT_DRIFT")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val (merged, warnings) =
      mergeRuns(prior, results.toMap, SparkEntry.queries.keySet,
        acceptDrift = acceptDrift)
    warnings.foreach(w => System.err.println(s"[bench] $w"))
    // plain-decimal, locale-pinned serialization: Double.toString uses
    // scientific notation under 1e-3, and %f under a comma-decimal
    // locale would write 0,6 — invalid JSON (ADVICE r9)
    def dec(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))
    def jsonLine(m: Seq[(String, Double)]): String = {
      val qs = m.map { case (k, v) => "\"" + k + "\":" + dec(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${dec(m.map(_._2).sum)},"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus}"""
    }
    // Durable copy FIRST: the driver captures only a stdout TAIL, which
    // has truncated the per-query map in past rounds (BENCH_r06 lost
    // 94/160 times). The FILE gets the gated merge (the drift baseline
    // future rounds grade against); SPARK_GRAFT_BENCH_OUT overrides the
    // default repo-relative path (outPath chosen above, before the
    // prior was read, so the merge prior and the overwrite target
    // agree).
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath), jsonLine(merged) + "\n")
    catch { case t: Throwable => System.err.println(s"[bench] write $outPath failed: $t") }
    // The printed line is the RAW run, not the merge (VERDICT r14 task
    // 2): the tail gate protects the committed artifact from contended
    // outliers, but ground truth reported to the driver must never be
    // rewritten to a historical value — a genuine >2x regression has to
    // be visible in stdout. Printed LAST so a stdout tail keeps it.
    println(jsonLine(results))
    spark.stop()
  }
}
