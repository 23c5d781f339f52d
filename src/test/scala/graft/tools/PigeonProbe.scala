package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off diagnostic for the pigeonhole near-dup join: times the direct
  * doc-level block join against the distinct-fp form on a scaled corpus
  * and prints candidate/pair/distinct-fp volumes, so a slope regression
  * can be attributed to DATA (block-bucket density) vs PLAN (join shape).
  * `sbt "Test/runMain graft.tools.PigeonProbe <sfDir> <modality>"` */
object PigeonProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val modality = if (args.length > 1) args(1) else "video"
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val feats = graft.operators.Multimodal.extractFeatures(spark,
        graft.operators.Multimodal.asMedia(
          graft.sources.Tables.sharded(spark, dir, "documents")))
      .filter(col("modality") === modality && col("phash") =!= 0L)
      .select(col("doc_id"), col("phash").as("fp"))
      .transform(graft.operators.Checkpointing.cut)

    val n = feats.count()
    val u = feats.select("fp").distinct().count()
    println(s"[probe] $modality docs=$n distinctFp=$u")

    def blocks = array((0 until 5).map { b =>
      struct(lit(b).as("blk"),
        shiftright(col("fp"), b * 13)
          .bitwiseAND(lit(if (b == 4) 4095L else 8191L)).as("bval"))
    }: _*)

    // direct doc-level (the pre-r5 shape)
    var t0 = System.nanoTime()
    val bkD = feats.select(col("doc_id"), explode(blocks).as("bk"))
    val candD = bkD.as("a").join(bkD.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val candDn = candD.count()
    val pairsD = candD.distinct()
      .join(feats.select(col("doc_id").as("doc_a"), col("fp").as("fp_a")), "doc_a")
      .join(feats.select(col("doc_id").as("doc_b"), col("fp").as("fp_b")), "doc_b")
      .filter(bit_count(col("fp_a").bitwiseXOR(col("fp_b"))) <= 4)
      .count()
    println(f"[probe] direct: cand=$candDn pairs=$pairsD ${(System.nanoTime()-t0)/1e9}%.1f s")

    // distinct-fp level (the r5 shape)
    t0 = System.nanoTime()
    val fps = feats.select("fp").distinct()
    val bkF = fps.select(col("fp"), explode(blocks).as("bk"))
    val candF = bkF.as("a").join(bkF.as("b"),
        col("a.bk") === col("b.bk") && col("a.fp") < col("b.fp"))
      .select(col("a.fp").as("fp_a"), col("b.fp").as("fp_b"))
    val candFn = candF.count()
    val fpPairs = candF.distinct()
      .filter(bit_count(col("fp_a").bitwiseXOR(col("fp_b"))) <= 4)
      .count()
    println(f"[probe] fp-level: cand=$candFn fpPairs=$fpPairs ${(System.nanoTime()-t0)/1e9}%.1f s")

    // 8-blocks-choose-4 combinatorial pigeonhole: hamming ≤ 4 leaves ≥ 4
    // of 8 byte-blocks intact, so the pair shares one of the C(8,4)=70
    // exact 4-block combination keys (32 significant bits per key)
    t0 = System.nanoTime()
    val combos = (0 until 8).combinations(4).toSeq.zipWithIndex
    val comboKeys = array(combos.map { case (idx, cid) =>
      idx.zipWithIndex.map { case (b, slot) =>
          shiftleft(shiftright(col("fp"), b * 8).bitwiseAND(lit(255L)), slot * 8)
        }.reduce(_.bitwiseOR(_))
        .bitwiseOR(lit(cid.toLong << 32)).as(s"k$cid")
    }: _*)
    val bkC = feats.select(col("doc_id"), explode(comboKeys).as("ck"))
    val candC = bkC.as("a").join(bkC.as("b"),
        col("a.ck") === col("b.ck") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val candCn = candC.count()
    val pairsC = candC.distinct()
      .join(feats.select(col("doc_id").as("doc_a"), col("fp").as("fp_a")), "doc_a")
      .join(feats.select(col("doc_id").as("doc_b"), col("fp").as("fp_b")), "doc_b")
      .filter(bit_count(col("fp_a").bitwiseXOR(col("fp_b"))) <= 4)
      .count()
    println(f"[probe] combo8c4: cand=$candCn pairs=$pairsC ${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
