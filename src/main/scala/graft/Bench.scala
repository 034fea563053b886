package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, forcing full materialization through the noop
  * sink (count() would let Catalyst prune the computed columns), and
  * prints one JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      System.gc() // settle heap between queries: measure the plan, not
                  // the previous query's garbage
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case t: Throwable => System.err.println(s"[bench] $name failed: $t") }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    // Drift self-check (VERDICT r7 task 5): the committed artifact is
    // what future rounds grade against, and a contended host can put a
    // 2-3× outlier into it silently (r7 shipped t23 at 7.09 s vs 3.29
    // isolated). Compare this run against the PRIOR committed artifact
    // (read BEFORE overwriting it) and flag every >2× per-query
    // regression loudly so a contended number never gets committed
    // unexamined.
    val refPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_REF", "bench_out.json")
    val prior: Map[String, Double] = try {
      val ref = java.nio.file.Files.readString(java.nio.file.Paths.get(refPath))
      // exponent-aware: a sub-millisecond time serialized as 9.5E-4
      // must not parse as 9.5 — since the r9 merge a mis-parse would
      // be written BACK into the artifact as a permanently inflated
      // drift baseline (values are also written in plain decimal now)
      val kv = """"([a-z0-9_]+)":([0-9.]+(?:[eE][-+]?[0-9]+)?)""".r
      kv.findAllMatchIn(ref)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap - "value"
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

    // The written artifact MERGES this run into the prior map (this
    // run wins on overlap) so a filtered or partial bench run can
    // never shrink the drift baseline — the r8 single-query re-measure
    // erased 186 reference times exactly this way (ADVICE r8).
    val merged = (prior ++ results.toMap).toSeq.sortBy(_._1)
    // plain-decimal serialization: Double.toString uses scientific
    // notation under 1e-3, which a naive reader truncates
    val qs = merged.map { case (k, v) => "\"" + k + "\":" + f"$v%.6f" }
      .mkString("{", ",", "}")
    val total = merged.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // Durable copy: the driver captures only a stdout TAIL, which has
    // truncated the per-query map in past rounds (BENCH_r06 lost 94/160
    // times). Write the full JSON to a file so the evidence survives;
    // SPARK_GRAFT_BENCH_OUT overrides the default repo-relative path.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    catch { case t: Throwable => System.err.println(s"[bench] write $outPath failed: $t") }
    spark.stop()
  }
}
