package graft.engine

/** DuckDB-SQL builders that replicate graft.functions.HashAlgos bit-exactly —
  * they let the CUSTOM hash expressions (FNV-1a 64, Murmur3 fmix64, MinHash,
  * SimHash) be verified by the DuckDB oracle gate instead of rows-only
  * checks.
  *
  * Mechanics: all arithmetic is HUGEINT (int128) carrying values in
  * [0, 2^64); multiplication mod 2^64 is split into 32-bit halves so the
  * int128 product cannot overflow; `x >>> 33` is floor-division by 2^33
  * (values are non-negative in this encoding); the final result converts to
  * the signed two's-complement BIGINT that Spark's LongType carries.
  *
  * Valid for ASCII text only (`ascii(substr(..))` yields code points, not
  * UTF-8 bytes) — the synthetic corpus is verified ASCII; the Scala side
  * hashes UTF-8 bytes and is the general implementation.
  */
object DuckHash {

  private val B32 = "4294967296::HUGEINT"
  private val M64 = "18446744073709551616::HUGEINT"

  /** (v * c) mod 2^64 without int128 overflow. v carries a value in
    * [0, 2^64); only the CONSTANT needs splitting: v*clo and v*chi are both
    * < 2^96 (< HUGEINT max 2^127), and (v*c) mod 2^64
    * = (v*clo + ((v*chi) mod 2^32)·2^32) mod 2^64 exactly — the high
    * product contributes only its low 32 bits once shifted. For constants
    * under 2^63 the product v*c < 2^127 fits outright and one multiply
    * suffices. (The r13 rewrite: the original split BOTH operands — three
    * multiplies and two extra mods per step — which dominated the sf1
    * oracle replicas' runtime.)
    */
  private def mulc(v: String, c: BigInt): String = {
    val chi = c >> 32
    val clo = c & 0xffffffffL
    if (c < (BigInt(1) << 63)) s"(($v) * ${c}::HUGEINT) % $M64"
    else s"(($v) * ${clo}::HUGEINT + ((($v) * ${chi}::HUGEINT) % $B32) * $B32) % $M64"
  }

  private def shift33(v: String): String =
    s"xor($v, ($v) // 8589934592::HUGEINT)"

  private val FnvOffset = BigInt("cbf29ce484222325", 16)
  private val FnvPrime = BigInt("100000001b3", 16)
  private val MixC1 = BigInt("ff51afd7ed558ccd", 16)
  private val MixC2 = BigInt("c4ceb9fe1a85ec53", 16)

  /** FNV-1a 64 of a string expression, as HUGEINT in [0, 2^64). */
  def fnv(x: String): String =
    s"""list_reduce(list_prepend(${FnvOffset}::HUGEINT,
       |    list_transform(range(1, length($x)+1),
       |      i -> CAST(ascii(substr($x, i, 1)) AS HUGEINT))),
       |  (acc, b) -> ${mulc("xor(acc, b)", FnvPrime)})""".stripMargin

  /** mix64(fnv(tok)) for every element of a list<string> expression. The
    * fmix64 stages run as chained list_transforms (inlining the 5 stages
    * into one expression would duplicate the fnv text 2^5 times).
    */
  def mixChain(listExpr: String): String = {
    var e = s"list_transform($listExpr, tok -> ${fnv("tok")})"
    e = s"list_transform($e, v -> ${shift33("v")})"
    e = s"list_transform($e, v -> ${mulc("v", MixC1)})"
    e = s"list_transform($e, v -> ${shift33("v")})"
    e = s"list_transform($e, v -> ${mulc("v", MixC2)})"
    s"list_transform($e, v -> ${shift33("v")})"
  }

  private val Golden = BigInt("9e3779b97f4a7c15", 16)

  /** Scalar fmix64 of a HUGEINT expression (textual inlining — the operand
    * is duplicated ~72×, so keep `e` short, e.g. a column or simple
    * arithmetic). Used to oracle the graft-gen synthetic source.
    */
  def mix64(e: String): String = {
    var v = shift33(e)
    v = mulc(v, MixC1)
    v = shift33(v)
    v = mulc(v, MixC2)
    shift33(v)
  }

  /** Full k-permutation MinHash signature over a pre-FNV'd element list
    * `base` (list<HUGEINT>): sig[i] = min over elements of
    * mix64(elem ^ (i·golden)), taken over SIGNED values exactly like the
    * Scala kernel. Returns list<BIGINT> of length k.
    */
  def sigK(base: String, k: Int): String = {
    val seed = mulc("CAST(i AS HUGEINT)", Golden)
    var e = s"list_transform($base, v -> xor(v, $seed))"
    e = s"list_transform($e, v -> ${shift33("v")})"
    e = s"list_transform($e, v -> ${mulc("v", MixC1)})"
    e = s"list_transform($e, v -> ${shift33("v")})"
    e = s"list_transform($e, v -> ${mulc("v", MixC2)})"
    e = s"list_transform($e, v -> ${shift33("v")})"
    s"""list_transform(range(0, $k), i ->
       |  list_min(list_transform($e, u -> ${signed("u")})))""".stripMargin
  }

  /** Unsigned [0,2^64) HUGEINT → signed two's-complement BIGINT. */
  def signed(u: String): String =
    s"CAST(CASE WHEN ($u) >= 9223372036854775808::HUGEINT" +
      s" THEN ($u) - $M64 ELSE ($u) END AS BIGINT)"

  /** MinHash component 0 (seed 0) over a pre-hashed list `hs`: the Scala
    * kernel takes the min over SIGNED longs, so convert before list_min.
    */
  def minhash0(hs: String): String =
    s"list_min(list_transform($hs, v -> ${signed("v")}))"

  /** SimHash64 over a pre-hashed list `hs`: per bit, majority vote of the
    * element hashes, as HUGEINT.
    */
  def simhash(hs: String): String =
    s"""list_sum(list_transform(range(0, 64), b ->
       |  CASE WHEN list_sum(list_transform($hs, h ->
       |      CASE WHEN (h // (1::HUGEINT << b)) % 2 = 1 THEN 1 ELSE -1 END)) > 0
       |  THEN (1::HUGEINT << b) ELSE 0::HUGEINT END))""".stripMargin
}
