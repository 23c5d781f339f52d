package graft.tools

/** Tier-level timing for the scaling audit: every gated query whose name
  * matches one of the prefixes, timed in ONE session (so session-memoized
  * builds are attributed to their first toucher, exactly like Bench), with
  * `reps` passes — pass 1 is the cold corpus read + memo build, later
  * passes are steady-state.
  *
  * `sbt "Test/runMain graft.tools.TimeMany <sfDir> <reps> <prefix,prefix,...>"`
  * prints one line per (query, rep) plus a per-query min summary.
  */
object TimeMany {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val prefixes = (if (args.length > 2) args(2) else "dedup_,knn_,emb_").split(",").toSeq
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.exists(n.startsWith))
    val best = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for (rep <- 1 to reps; name <- names) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[timemany] rep=$rep $name%-28s ${s}%7.2f s rows=$n")
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), s)
    }
    println("[timemany] === per-query best ===")
    best.foreach { case (n, s) => println(f"[timemany] best $n%-28s ${s}%7.2f s") }
    println(f"[timemany] total-best ${best.values.sum}%.2f s over ${best.size} queries")
    // merge this tier session's bests into target/tiers.json — the
    // tier-context artifact graft.Bench embeds as "tier_context" so
    // BENCH_r{N} carries comparable per-query numbers for sub-second
    // queries (full-suite sessions inflate them 1.3–2×, measured r8).
    // Opt-in (SPARK_GRAFT_TIERS=1): scaled-lake scaling probes reuse
    // TimeMany and must NOT write sf0.1-context numbers over the artifact.
    if (sys.env.get("SPARK_GRAFT_TIERS").contains("1")) try {
      val p = java.nio.file.Paths.get("target/tiers.json")
      val prior: Map[String, String] =
        if (java.nio.file.Files.exists(p))
          java.nio.file.Files.readString(p).trim.stripPrefix("{").stripSuffix("}")
            .split(",").filter(_.contains(":")).map { kv =>
              val i = kv.lastIndexOf(':')
              kv.take(i).trim.stripPrefix("\"").stripSuffix("\"") -> kv.drop(i + 1).trim
            }.toMap
        else Map.empty
      // BigDecimal, not f"%.3f": printf %f is default-locale-dependent
      // (comma decimals on de_DE/fr_FR JVMs would corrupt the artifact
      // and the BENCH line) — the same reason Bench.ms uses BigDecimal
      val merged = prior ++ best.map { case (n, s) =>
        n -> BigDecimal(s).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
      }
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, merged.toSeq.sorted
        .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))
      println(s"[timemany] merged ${best.size} tier bests into $p")
    } catch { case e: Throwable =>
      System.err.println(s"[timemany] tiers.json merge failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
