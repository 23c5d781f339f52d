package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for lake writes — the multi-column
  * locality tool next to [[PartitionedLake]] (coarse partition pruning) and
  * [[Bucketing]] (join co-location).
  *
  * A lake sorted on ONE column skips files beautifully for that column and
  * not at all for any other; a 100 TB events table queried by user AND by
  * time needs both. Interleaving the bits of the columns' normalized ranks
  * produces a 1-D sort key under which rows close in EVERY dimension land
  * in the same files, so parquet min/max footer stats prune file/row-group
  * reads for predicates on any interleaved column — the standard lake
  * clustering technique (the same idea ACID table formats expose as
  * `OPTIMIZE ... ZORDER BY`), here as a plain deterministic column
  * expression + range-partitioned sorted write that any Spark session can
  * run.
  *
  * Scale shape: one bounded min/max aggregate per clustered column (scan
  * metadata-cheap, result O(columns)), then a map-phase z-value column, a
  * range exchange on it, and in-partition sorts — no global sort, no
  * driver data. The z-value is pure bitwise arithmetic (shifts/ors), fully
  * codegen'd.
  */
object ZOrder {

  /** Morton z-value: each column scaled to a `bits`-bit integer rank by its
    * (min, max) range, then bit-interleaved (column j owns bit positions
    * j, j+k, j+2k, …). `bits × cols.size` must fit a long. Nulls rank 0 —
    * they cluster together at the curve's origin. */
  def zValue(cols: Seq[(Column, Double, Double)], bits: Int): Column = {
    require(cols.nonEmpty && bits >= 1 && bits * cols.size <= 63,
      s"zValue: ${cols.size} cols × $bits bits must fit a long")
    val k = cols.size
    val maxRank = (1L << bits) - 1
    val ranks = cols.map { case (c, lo, hi) =>
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      least(greatest(
        ((c.cast("double") - lit(lo)) / lit(span) * lit(maxRank.toDouble))
          .cast("long"), lit(0L)), lit(maxRank))
    }
    (0 until bits).flatMap { b =>
      ranks.zipWithIndex.map { case (r, j) =>
        shiftleft(shiftright(r, b).bitwiseAND(lit(1L)), b * k + j)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Write `df` to `path` clustered on `orderCols`' z-curve in `nFiles`
    * range slices. Column ranges come from one bounded min/max aggregate —
    * on parquet inputs that reads footers, not data pages. */
  def writeZOrdered(df: DataFrame, orderCols: Seq[String], path: String,
      nFiles: Int, bits: Int = 16): Unit = {
    val aggs = orderCols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"lo_$c"), max(col(c).cast("double")).as(s"hi_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    // validate every lo/hi cell: a min/max over zero rows OR over an
    // entirely-null column is null, and either way there is no range to
    // cluster that column on — fail with the column named, not an NPE
    orderCols.zipWithIndex.foreach { case (c, i) =>
      require(!r.isNullAt(2 * i) && !r.isNullAt(2 * i + 1),
        s"writeZOrdered: column '$c' has no non-null values (or input has no rows)") }
    val ranges = orderCols.zipWithIndex.map { case (c, i) =>
      (col(c), r.getDouble(2 * i), r.getDouble(2 * i + 1)) }
    df.withColumn("__z", zValue(ranges, bits))
      // range exchange + in-partition sort: each output file owns one
      // contiguous z-curve segment, so footer min/max stay tight on every
      // clustered column; the helper column is projected away after the
      // sort (projection preserves in-partition row order)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
