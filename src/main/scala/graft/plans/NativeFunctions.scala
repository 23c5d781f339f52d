package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Single source of truth for every native function the library ships:
  * name → Catalyst builder. Consumed two ways —
  *  - [[register]] puts them in a session's FunctionRegistry (the route the
  *    Column wrappers use, idempotent per call), and
  *  - [[graft.GraftExtensions]] injects them at session BUILD time via
  *    `SparkSessionExtensions`, so a `spark-submit --conf
  *    spark.sql.extensions=graft.GraftExtensions` deployment gets the whole
  *    surface in `spark.sql(...)` without touching library code.
  *
  * Builders live here (not in each expression's companion) so the two
  * routes can never drift apart.
  */
object NativeFunctions {

  private def intArg(e: Expression, what: String): Int = e.eval(null) match {
    case n: Number => n.intValue()
    case other => throw new IllegalArgumentException(
      s"$what must be a literal int, got $other")
  }

  private def bad(name: String, want: String, got: Int): Nothing =
    throw new IllegalArgumentException(
      s"$name expects ($want) — got $got args")

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minhash_sig" -> {
      case Seq(c, n) => MinHashSig(c, intArg(n, "numPerms"))
      case other => bad("minhash_sig", "arr, numPerms", other.size)
    },
    "simhash_sig" -> {
      case Seq(c) => SimHashSig(c)
      case other => bad("simhash_sig", "arr", other.size)
    },
    "md5_simhash" -> {
      case Seq(c) => Md5SimHashSig(c)
      case other => bad("md5_simhash", "arr", other.size)
    },
    "md5_fingerprint" -> {
      case Seq(c) => Md5FingerprintExpr(c)
      case other => bad("md5_fingerprint", "arr", other.size)
    },
    "minhash_merge" -> {
      case Seq(c) => MinHashMerge(c).toAggregateExpression()
      case other => bad("minhash_merge", "sig", other.size)
    },
    "ngram_hashes" -> {
      case Seq(c, kk) => NgramHashesExpr(c, intArg(kk, "k"))
      case other => bad("ngram_hashes", "text, k", other.size)
    },
    "word_shingles" -> {
      case Seq(c, kk) => WordShinglesExpr(c, intArg(kk, "k"))
      case other => bad("word_shingles", "text, k", other.size)
    },
    "chargram_hashes" -> {
      case Seq(c, nn) => CharGramHashesExpr(c, intArg(nn, "n"))
      case other => bad("chargram_hashes", "text, n", other.size)
    },
    "ngram_minhash" -> {
      case Seq(c, kk, pp) => MinHashSigFromText(c, intArg(kk, "k"), intArg(pp, "numPerms"))
      case other => bad("ngram_minhash", "text, k, numPerms", other.size)
    },
    "ngram_minhash_md5" -> {
      case Seq(c, kk, pp) => Md5MinHashFromText(c, intArg(kk, "k"), intArg(pp, "numPerms"))
      case other => bad("ngram_minhash_md5", "text, k, numPerms", other.size)
    },
    "lsh_bands" -> {
      case Seq(c, bb, rr) => LshBandsExpr(c, intArg(bb, "bands"), intArg(rr, "rowsPerBand"))
      case other => bad("lsh_bands", "sig, bands, rowsPerBand", other.size)
    },
    "hyperplane_sigs" -> {
      case Seq(c, b, t) => HyperplaneSigsExpr(c, intArg(b, "bits"), intArg(t, "tables"))
      case other => bad("hyperplane_sigs", "vec, bits, tables", other.size)
    },
    "hyperplane_sigs_md5" -> {
      case Seq(c, b, t) =>
        HyperplaneSigsExpr(c, intArg(b, "bits"), intArg(t, "tables"), md5Planes = true)
      case other => bad("hyperplane_sigs_md5", "vec, bits, tables", other.size)
    },
    "derep" -> {
      case Seq(c) => DerepExpr(c)
      case other => bad("derep", "text", other.size)
    },
    "cosine_sim" -> {
      case Seq(a, b) => CosineSim(a, b)
      case other => bad("cosine_sim", "a, b", other.size)
    },
    "dot_prod" -> {
      case Seq(a, b) => DotProd(a, b)
      case other => bad("dot_prod", "a, b", other.size)
    },
    "sorted_intersect_count" -> {
      case Seq(a, b) => SortedIntersectCount(a, b)
      case other => bad("sorted_intersect_count", "a, b", other.size)
    },
    "vec_scale" -> {
      case Seq(a, s) => VecScale(a, s)
      case other => bad("vec_scale", "vec, scalar", other.size)
    },
    "project_planes" -> {
      case Seq(c, n) => ProjectPlanesExpr(c, intArg(n, "nPlanes"))
      case other => bad("project_planes", "vec, nPlanes", other.size)
    },
    "pq_encode" -> {
      case Seq(v, cb, mm) => PqEncodeExpr(v, cb, intArg(mm, "m"))
      case other => bad("pq_encode", "vec, codebook, m", other.size)
    },
    "pq_adc" -> {
      case Seq(q, cs, cb, mm) => PqAdcExpr(q, cs, cb, intArg(mm, "m"))
      case other => bad("pq_adc", "qvec, codes, codebook, m", other.size)
    },
    "nearest_centroid" -> {
      case Seq(a, b) => NearestCentroid(a, b)
      case other => bad("nearest_centroid", "emb, centroids", other.size)
    },
    "vec_sub" -> {
      case Seq(a, b) => VecSub(a, b)
      case other => bad("vec_sub", "a, b", other.size)
    },
    "vector_mean" -> {
      case Seq(c) => VectorMeanAgg(c).toAggregateExpression()
      case other => bad("vector_mean", "vec", other.size)
    },
    "topk" -> {
      case Seq(c, kk) => TopKAgg(c, intArg(kk, "k")).toAggregateExpression()
      case other => bad("topk", "struct(score, id), k", other.size)
    },
    "bottomk_distinct" -> {
      case Seq(c, kk) => BottomKDistinctAgg(c, intArg(kk, "k")).toAggregateExpression()
      case other => bad("bottomk_distinct", "key, k", other.size)
    },
    "freq_items" -> {
      case Seq(c, cap) => FreqItemsAgg(c, intArg(cap, "capacity")).toAggregateExpression()
      case other => bad("freq_items", "item, capacity", other.size)
    },
    "bloom_agg" -> {
      case Seq(c, bits, k) =>
        BloomFilterAgg(c, intArg(bits, "numBits"), intArg(k, "numHashes"))
          .toAggregateExpression()
      case other => bad("bloom_agg", "key, numBits, numHashes", other.size)
    },
    "bloom_contains" -> {
      // k lives in the bloom artifact's header — no separate arg to get wrong
      case Seq(b, v) => BloomMightContain(b, v)
      case other => bad("bloom_contains", "bloom, key", other.size)
    },
    "hll_distinct" -> {
      case Seq(c) => HllSketchAgg(c).toAggregateExpression()
      case other => bad("hll_distinct", "hash48", other.size)
    },
    "bitmap_distinct" -> {
      case Seq(c, m) =>
        BitmapDistinctAgg(c, intArg(m, "maxId")).toAggregateExpression()
      case other => bad("bitmap_distinct", "key, maxId", other.size)
    },
    "map_project_keys" -> {
      case Seq(m, ks) => MapProjectKeys(m, ks)
      case other => bad("map_project_keys", "map, keys", other.size)
    })

  // names THIS object registered, per session: distinguishes "ours, skip
  // quietly" from "foreign temp function squatting on our name, replace" —
  // existence alone can't tell them apart (ADVICE r4). Stopped sessions are
  // purged on every call (the SessionMemo posture).
  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), java.lang.Boolean]())

  /** Put every native function in the session's registry. Idempotent AND
    * quiet for OUR entries — re-registering logs a "replaced a previously
    * registered function" warning per call site, which a real deployment
    * would see five times per session (every Column-wrapper entry point
    * re-registers). A name that exists but was NOT registered here (a
    * stale or foreign temp function — say an old 3-arg `bloom_contains`
    * from a notebook session) is REPLACED, never silently shadowed. */
  def register(spark: SparkSession): Unit = {
    registered.removeIf(_._1.sparkContext.isStopped)
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (name, builder) =>
      val exists = reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name))
      if (!exists || !registered.contains((spark, name))) {
        reg.createOrReplaceTempFunction(name, builder, "built-in")
        registered.add((spark, name))
      }
    }
  }
}
