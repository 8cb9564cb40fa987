package graft.lake

/** Largest-prime-below utility — reference parity for
  * helpers/sieve.rs:4 `get_le_prime`: the reference sizes its
  * index-modulo bucket count as the largest prime at or below the
  * requested index size (prime moduli spread linear-probe clusters).
  * Parquet hash-prefix bucketing doesn't need primality — the hash is
  * already uniform — so here the prime count is an OPTION
  * ([[LakeParams.primeBuckets]]) and a derived rebalance candidate
  * ([[graft.operators.LakeOps.lakeRebalance]]), not a requirement.
  *
  * INTENTIONAL DIVERGENCE from the reference: helpers/sieve.rs bounds
  * its inner sieve with `while factor < q` (q = isqrt(limit)), which
  * skips sieving when factor == isqrt(limit) — so for odd-prime-SQUARE
  * limits it returns the composite limit itself (get_le_prime(9)=9,
  * 25=25, 49=49). This sieve is correct (9→7, 25→23, 49→47); a config
  * ported from the reference with such an indexSize therefore derives
  * a DIFFERENT (actually prime) bucket count here. Pinned in
  * Round21OpsSpec's exhaustive-to-2000 parity test, which necessarily
  * asserts the correct values, not the reference's off-by-one ones.
  */
object Sieve {

  /** The largest prime `p <= limit`. Plain sieve of Eratosthenes on a
    * BitSet — the driver-side call sites size bucket counts (≤ 1e6ish),
    * where this is microseconds; nothing here runs per-row.
    */
  def getLePrime(limit: Int): Int = {
    require(limit >= 2, s"no prime <= $limit")
    val composite = new java.util.BitSet(limit + 1)
    var p = 2
    while (p.toLong * p <= limit) {
      if (!composite.get(p)) {
        var m = p.toLong * p
        while (m <= limit) { composite.set(m.toInt); m += p }
      }
      p += 1
    }
    var r = limit
    while (composite.get(r)) r -= 1
    r
  }
}
