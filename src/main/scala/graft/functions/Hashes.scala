package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MinHash / SimHash signatures as pure column expressions (higher-order
  * functions over arrays, all codegen-capable — no UDF inner loops).
  *
  * Scale: signatures are computed in the map phase, independently per row;
  * the only shuffles in the dedup pipelines are the band-bucket groupBys.
  */
object Hashes {

  /** MinHash signature: numPerms permutations simulated by re-hashing with
    * the permutation index; sig[i] = min over shingles of h_i(shingle).
    * Standard MinHash estimator (Broder '97).
    *
    * Perf: each shingle STRING is hashed exactly once; the numPerms
    * "permutations" re-hash the resulting 8-byte long (xxhash64(h, i)),
    * which is ~10× cheaper per slot than re-hashing the string. Higher-order
    * functions are interpreted (CodegenFallback), so per-eval cost matters.
    */
  def minhash(shingles: Column, numPerms: Int): Column = {
    val hashes = transform(shingles, s => xxhash64(s))
    transform(
      sequence(lit(0), lit(numPerms - 1)),
      i => array_min(transform(hashes, h => xxhash64(h, i))))
  }

  /** Estimated Jaccard from two signatures: fraction of agreeing slots. */
  def minhashSimilarity(sigA: Column, sigB: Column): Column =
    aggregate(
      zip_with(sigA, sigB, (a, b) => when(a === b, 1).otherwise(0)),
      lit(0),
      (acc, x) => acc + x
    ).cast("double") / size(sigA)

  /** LSH band keys: split the signature into `bands` rows of width
    * sig.len/bands and hash each row; docs sharing any band key become
    * candidates. Emitted as (bandIndex, bandHash) structs for exploding. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band"),
        xxhash64(concat_ws(",",
          transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), _.cast("string"))))
          .as("bucket")))

  /** 64-bit SimHash over tokens (Charikar '02): bit k of the result is the
    * sign of the sum over tokens of ±1 depending on bit k of the token hash.
    * Computed per-bit with higher-order functions, then folded into a Long. */
  def simhash(tokens: Column): Column = {
    // hash each token string once; the 64 bit-votes then only shift longs
    val hashes = transform(tokens, t => xxhash64(t))
    val bitVotes = transform(
      sequence(lit(0), lit(63)),
      k => aggregate(hashes, lit(0),
        (acc, h) => acc + when(call_function("shiftright", h, k).bitwiseAND(1) === 1, 1).otherwise(-1)))
    aggregate(
      zip_with(bitVotes, sequence(lit(0), lit(63)),
        (v, k) => when(v > 0, call_function("shiftleft", lit(1L), k)).otherwise(lit(0L))),
      lit(0L),
      (acc, b) => acc.bitwiseOR(b))
  }

}
