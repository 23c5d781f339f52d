package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over Array[Float] embedding columns, as higher-order column
  * functions (codegen-capable). Double accumulation for stability.
  */
object Vectors {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane LSH signature (Charikar '02): bit i = sign of the dot
    * product with pseudo-random hyperplane i. Hyperplanes are derived
    * deterministically from xxhash64(dim, plane) so every executor computes
    * identical planes with zero driver-side state or broadcast. Maps cosine
    * similarity to Hamming proximity on the signature. */
  def hyperplaneSig(vec: Column, bits: Int): Column =
    hyperplaneSigFrom(vec, bits, lit(0))

  /** L independent signatures (disjoint plane ranges) — multi-table LSH:
    * candidates agree on ANY table, trading bucket size for recall. */
  def hyperplaneSigs(vec: Column, bits: Int, tables: Int): Column =
    transform(sequence(lit(0), lit(tables - 1)),
      t => hyperplaneSigFrom(vec, bits, t))

  private def hyperplaneSigFrom(vec: Column, bits: Int, table: Column): Column = {
    val planes = sequence(lit(0), lit(bits - 1))
    val bitsArr = transform(planes, p0 => {
      val p = p0 + table * lit(bits)
      // component j of plane p in [-1,1): hash → uniform double
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, j) => x.cast("double") *
            ((pmod(xxhash64(j, p), lit(1000000L)).cast("double") / lit(500000.0)) - lit(1.0))),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1)).otherwise(lit(0))
    })
    aggregate(
      zip_with(bitsArr, sequence(lit(0), lit(bits - 1)),
        (b, i) => when(b === 1, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }
}
