package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column aggregations shared by queries and specs. */
object Embeddings {

  /** Per-label centroid: element-wise mean via posexplode → (label, dim)
    * agg — scales to any dimension/cardinality because no row ever holds
    * more than one (dim, value) pair inside the aggregation. */
  def labelCentroids(e: DataFrame, labelCol: String, vecCol: String): DataFrame =
    e.select(col(labelCol).as("label"), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy("label", "dim").agg(avg("x").as("cx"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("dim"), col("cx")))).as("pairs"))
      .select(col("label"),
        transform(col("pairs"), p => p.getField("cx")).as("centroid"))
}
