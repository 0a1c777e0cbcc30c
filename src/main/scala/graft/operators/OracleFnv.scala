package graft.operators

/** DuckDB SQL fragments that re-derive graft's native `fnv1a64`
  * Catalyst expression bit-exactly (see graft.functions.Fnv1a64).
  *
  * DuckDB lacks the hash, but FNV-1a is a pure byte fold, so the oracle
  * hex()-encodes the UTF-8 bytes once and list_reduce-folds them in
  * HUGEINT with an explicit mod-2^64 after each multiply (DuckDB integer
  * arithmetic errors on overflow instead of wrapping like the JVM).
  * Verified bit-equal on empty, ASCII, and multi-byte UTF-8 inputs.
  */
private[graft] object OracleFnv {

  /** Unsigned FNV-1a 64 fold (HUGEINT) over a hex-encoded byte string
    * column/expression (i.e. `hex(encode(text_expr))`).
    */
  def fold(hexExpr: String): String =
    s"""list_reduce(
          list_prepend(CAST(14695981039346656037 AS HUGEINT),
            list_transform(range(0, length($hexExpr) // 2),
              i -> CAST(concat('0x', substr($hexExpr, 2*i + 1, 2)) AS BIGINT))),
          (a, b) -> (xor(a, CAST(b AS HUGEINT)) * 1099511628211)
                      % CAST(18446744073709551616 AS HUGEINT))"""

  /** Reinterpret an unsigned 64-bit HUGEINT as Java's signed Long. */
  def signed(h: String): String =
    s"""CAST(CASE WHEN $h >= CAST(9223372036854775808 AS HUGEINT)
               THEN $h - CAST(18446744073709551616 AS HUGEINT)
               ELSE $h END AS BIGINT)"""

  /** Signed fnv1a64 of a VARCHAR expression. NOTE: `textExpr` is
    * inlined textually several times (length + per-byte substr), so
    * single evaluation is up to DuckDB's common-subexpression handling
    * — precompute expensive expressions in a CTE column and pass the
    * column name here.
    */
  def ofText(textExpr: String): String =
    signed(fold(s"hex(encode($textExpr))"))
}
