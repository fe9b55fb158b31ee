package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints one JSON line with per-query seconds.
  * A warmup pass (table reads + one tiny query) runs first so JVM/
  * codegen/class-load cost isn't attributed to the first timed query. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every table and run one end-to-end query
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    graft.core.Tables.events(spark, sfDir).count()
    SparkEntry.queries("o2_knn_exact")(spark, sfDir).count()

    // min of two timed runs per query: the host VM shows intermittent
    // multi-second scheduling stalls (measured: same query 0.6s..59s with
    // zero steal/PSI pressure); the min isolates engine cost from host
    // noise and is applied uniformly every round.
    // A failing query is reported as null (excluded from the total), not
    // as a fast fake timing; fatal errors (OOM etc.) propagate and kill
    // the bench rather than being misreported as coverage.
    // optional arg: comma-separated name substrings — run only matching
    // queries (same contract as ScaleProbe's filter; default = all)
    val nameFilter: String => Boolean = args.headOption match {
      case Some(pats) =>
        val ps = pats.split(',').map(_.trim).filter(_.nonEmpty)
        // empty/whitespace pattern arg = no filter (ScaleProbe's
        // contract) — never a silent 0-query "all green" run
        if (ps.isEmpty) _ => true else name => ps.exists(name.contains)
      case None => _ => true
    }
    val named = SparkEntry.queries.toSeq.filter(kv => nameFilter(kv._1))
      .sortBy(_._1)
    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"BENCH FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
            false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    // The host VM stalls the whole JVM for multi-second spans at random
    // (measured round 1: same query 0.6s..59s, zero steal/PSI). Timing
    // attempts back-to-back lets one stall poison every attempt of a
    // query, so: two FULL passes over all queries (minutes apart), min
    // per query, then one extra attempt for anything still > 1s.
    val passes = (1 to 2).map(_ => named.map { case (n, f) => n -> run(n, f) })
    val results = named.map { case (name, fn) =>
      val attempts0 = passes.map(_.toMap.apply(name))
      val attempts =
        if (attempts0.filter(_._2).map(_._1).minOption.exists(_ > 1.0))
          attempts0 :+ run(name, fn)
        else attempts0
      val good = attempts.filter(_._2).map(_._1)
      name -> (if (good.nonEmpty) Some(good.min) else None)
    }
    val qs = results.map { case (k, v) =>
      s"\"" + k + "\":" + v.map(_.toString).getOrElse("null")
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, None) => k }
    val total = results.flatMap(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    println(line)
    // persist the FULL per-query map as a repo artifact: the driver's
    // BENCH_r{N}.json keeps only a ~2 KB stdout tail, so round-over-
    // round per-query comparison needs the complete map on disk. Named
    // bench_full_r{N}.json with N = 1 + the highest committed
    // BENCH_r{N}.json (i.e. the round this run belongs to); override
    // with SPARK_GRAFT_BENCH_FULL, skipped when no repo root is found.
    // candidate roots: user.dir and every ancestor (a tool wrapper may
    // launch the JVM from a subdirectory) — derived, never a hardcoded
    // absolute path; SPARK_GRAFT_BENCH_FULL overrides outright
    val benchOut = sys.env.get("SPARK_GRAFT_BENCH_FULL").orElse {
      Iterator.iterate(
          new java.io.File(System.getProperty("user.dir", ".")).getAbsoluteFile
        )(_.getParentFile)
        .takeWhile(_ != null).take(16).toSeq
        .find(d => new java.io.File(d, "BENCH_r01.json").exists())
        .map { root =>
          val n = root.listFiles().map(_.getName)
            .collect { case s if s.startsWith("BENCH_r") && s.endsWith(".json") =>
              s.stripPrefix("BENCH_r").stripSuffix(".json").toIntOption.getOrElse(0)
            }.maxOption.getOrElse(0) + 1
          new java.io.File(root, f"bench_full_r$n%02d.json").getPath
        }
    }
    benchOut.foreach { path =>
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"BENCH full per-query map -> $path")
    }
    if (benchOut.isEmpty)
      System.err.println("BENCH full per-query map SKIPPED: no repo root " +
        "(BENCH_r01.json) found above user.dir and SPARK_GRAFT_BENCH_FULL unset")
    spark.stop()
  }
}
