package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Winnowing document fingerprints (Schleimer et al., SIGMOD'03).
  *
  * k-gram hashes over the token stream, then the minimum hash of each
  * sliding window of `w` consecutive k-grams, deduplicated. Guarantees:
  * any shared substring of length ≥ w + k - 1 tokens contributes at
  * least one shared fingerprint, so near-identical documents share most
  * of their fingerprint sets while the set size stays ~n/w.
  *
  * Pure higher-order column expressions — computed map-side, no UDF,
  * no shuffle; the downstream near-dup join shuffles on exploded
  * fingerprint values exactly like MinHash bands.
  */
object Winnowing {

  /** Fingerprint set (sorted array<long>) for a whitespace-tokenized
    * text column. The sliding-window machinery runs in the codegen'd
    * [[WinnowFingerprints]] kernel — see its scaladoc for why the
    * higher-order formulation is quadratic.
    */
  def fingerprints(text: Column, k: Int = 3, w: Int = 4): Column =
    ArrayExprs.winnow(transform(split(text, " "), w0 => xxhash64(w0)), k, w)

  /** Jaccard similarity of two fingerprint sets. */
  def fingerprintSimilarity(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) / size(array_union(a, b))
}
