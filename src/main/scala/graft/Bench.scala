package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // Run-to-run variance on local[n] is ±20% (SURVEY §6b), so each query is
    // timed over N full passes and reported as the median. Passes iterate the
    // whole suite (not N back-to-back runs of one query) so session-level
    // caches behave the way a real pipeline session's would.
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val spark = GraftSession.local(cpus)
    // Warm the session (codegen, parquet reader, shuffle, broadcast paths)
    // so the first measured query isn't charged one-time setup. Warm against
    // the benchmarked sfDir itself — a fixed path might not exist wherever
    // Bench runs, silently skipping the warmup.
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }
    val names = SparkEntry.queries.keys.toSeq.sorted
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    for (pass <- 1 to runs) {
      // per-pass SEEDED shuffle of query order: a fixed order lets
      // session-level cache interactions (broadcast reuse, JIT warmth, the
      // memoized dedup pipelines) systematically flatter whichever query
      // happens to follow its warm-up neighbor; randomizing per pass turns
      // that bias into noise the median absorbs. Seeded by pass index so
      // runs stay reproducible.
      val order = new scala.util.Random(41 + pass).shuffle(names)
      for (name <- order if !errors.contains(name)) {
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, sfDir).count()
          times(name) = times.getOrElse(name, Vector()) :+ (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        }
      }
    }
    // lower median: an actually-observed time, not an interpolation
    def median(v: Vector[Double]): Double = v.sorted.apply((v.size - 1) / 2)
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // A failed query must be unmistakable: -1 in the queries map AND its
    // message in "errors" AND a non-zero exit — never a plausible-looking
    // fast time folded into the total.
    // ms precision keeps the line short enough for the driver's tail-capture
    // window (124 full-precision doubles overflowed it — BENCH_r*.json came
    // back with parsed:null every round).
    def ms(d: Double): String = BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = names.map { n =>
      val v = if (errors.contains(n)) "-1" else ms(median(times(n)))
      s"${jstr(n)}:$v"
    }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v.take(200))}" }
      .mkString("{", ",", "}")
    val total = names.filterNot(errors.contains).map(n => median(times(n))).sum
    // Tier-context numbers (the r8 VERDICT item 8): the full-suite session
    // inflates sub-second queries 1.3–2× vs a tier-only session (measured
    // r8 — shuffle/broadcast/cleaner churn scales with suite size), so
    // cross-round per-query comparisons should read the TIER-context
    // medians. graft.tools.TimeMany merges its tier-only-session bests
    // into target/tiers.json; Bench carries that artifact verbatim as
    // "tier_context" (absent when no tier sessions were run).
    val tierCtx = {
      val p = java.nio.file.Paths.get("target/tiers.json")
      // strict shape check, not a brace sniff: a malformed artifact spliced
      // verbatim would make the WHOLE durable bench line unparseable — the
      // exact parsed:null failure the ms-precision comment exists to avoid
      val shape = """\{"[A-Za-z0-9_]+":[0-9]+(\.[0-9]+)?(,"[A-Za-z0-9_]+":[0-9]+(\.[0-9]+)?)*\}""".r
      try {
        if (java.nio.file.Files.exists(p)) {
          val t = java.nio.file.Files.readString(p).trim
          if (shape.matches(t)) t else ""
        } else ""
      } catch { case _: Throwable => "" }
    }
    val tierField = if (tierCtx.nonEmpty) s""","tier_context":$tierCtx""" else ""
    // SEAL RUN (r13 — VERDICT item 8): the builder's one solo 3-pass run
    // is recorded as a durable summary artifact (SPARK_GRAFT_SEAL=1
    // writes it), and EVERY later Bench line — including the driver's
    // session-loaded per-round snapshot — carries it verbatim as "seal",
    // so cross-round comparisons diff the seal + tier bests directly
    // instead of reconstructing the load-band caveat from archaeology.
    val sealPath = java.nio.file.Paths.get("target/seal.json")
    if (sys.env.get("SPARK_GRAFT_SEAL").contains("1")) try {
      java.nio.file.Files.createDirectories(sealPath.getParent)
      // PER-KEY SPREAD (r15 — VERDICT item 8): [min, max] across the
      // seal's passes rides the durable artifact, so a cross-round
      // per-key claim carries its own noise bar (a "regression" inside
      // the previous seal's spread is load, not plans) — in seal.json
      // ONLY, never spliced into the bench line (281 keys × a pair
      // would overflow the driver's tail-capture window, the
      // parsed:null failure class).
      val spread = names.filterNot(errors.contains).map { n =>
        val v = times(n)
        s"${jstr(n)}:[${ms(v.min)},${ms(v.max)}]"
      }.mkString("{", ",", "}")
      java.nio.file.Files.writeString(sealPath,
        s"""{"value":${ms(total)},"runs":$runs,"n_queries":${names.size},""" +
          s""""n_errors":${errors.size},"sf":${jstr(sfDir)},""" +
          s""""spread":$spread}""")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] seal write failed: ${e.getMessage}")
    }
    val sealCtx = {
      // splice ONLY the summary prefix into the bench line — the spread
      // stays in the file artifact (size, see above); pre-r15 seals
      // without a spread splice whole
      val shape = ("""(\{"value":[0-9.]+,"runs":[0-9]+,"n_queries":[0-9]+,""" +
        """"n_errors":[0-9]+,"sf":"[^"\\]*")(,"spread":\{.*\})?\}""").r
      try {
        if (java.nio.file.Files.exists(sealPath)) {
          java.nio.file.Files.readString(sealPath).trim match {
            case shape(summary, _) => summary + "}"
            case _ => ""
          }
        } else ""
      } catch { case _: Throwable => "" }
    }
    val sealField = if (sealCtx.nonEmpty) s""","seal":$sealCtx""" else ""
    val line = s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"errors":$errs,"runs":$runs$tierField$sealField,"sf":"$sfDir"}"""
    // Durable copy first: even if stdout is truncated by the harness, the
    // structured per-query numbers survive as a file artifact.
    try {
      val out = java.nio.file.Paths.get("target/bench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, (line + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable => System.err.println(s"[bench] artifact write failed: ${e.getMessage}") }
    println(line)
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"[bench] ${errors.size} queries FAILED: ${errors.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
