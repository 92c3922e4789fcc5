package graft.exprs

/** Shared DuckDB-SQL fragments for replaying the native 64-bit hash
  * kernels bit-exactly in HUGEINT arithmetic. Every oracle that re-derives
  * FNV-1a / SplitMix64 / Karp-Rabin values uses THESE definitions, so the
  * load-bearing wrapping-arithmetic tricks live in exactly one place
  * (previously three copies across dedup and multimodal oracles).
  *
  * Precondition shared by all per-character replays: the corpus is pure
  * ASCII, so `ascii(substring(s,i,1))` equals the UTF-8 byte the Scala
  * kernels hash — asserted early by `OracleParitySpec`.
  */
object OracleSql {
  /** 2^64 as a HUGEINT literal (the wrap modulus). */
  val M64 = "18446744073709551616::HUGEINT"

  /** 2^63 as a HUGEINT literal (the sign boundary). */
  val Half = "9223372036854775808::HUGEINT"

  /** `(z * c) % 2^64` for an arbitrary 64-bit constant `c`: split `c` into
    * 32-bit halves so no intermediate product overflows INT128
    * (`z*c` alone can reach 2^128 for the SplitMix64 multipliers). */
  def mulmod(z: String, c: Long): String = {
    val hi = c >>> 32
    val lo = c & 0xFFFFFFFFL
    s"(($z) * $lo + ((($z) % 4294967296) * $hi) % 4294967296 * 4294967296) % $M64"
  }

  /** Re-sign a HUGEINT in [0, 2^64) to its two's-complement BIGINT. */
  def signed(u: String): String =
    s"CAST(CASE WHEN ($u) >= $Half THEN ($u) - $M64 ELSE ($u) END AS BIGINT)"

  /** One FNV-1a 64 step over accumulator column `h`: xor the low byte with
    * `byteExpr`, multiply by the FNV prime, wrap. (The `h - h%256 + xor`
    * dance is xor-into-low-byte without DuckDB bit ops on HUGEINT.) */
  def fnvStep(byteExpr: String): String =
    s"((h - (h % 256) + xor(CAST(h % 256 AS BIGINT), $byteExpr)) * 1099511628211) % $M64"
}
