package graft.operators

/** Morton (Z-order) interleave of two 16-bit bucketed dimensions — shared
  * by the `rel_zorder` layout query and Maintenance's z-ordered compaction.
  * Five shift/mask steps per dimension (the classic magic-number spread),
  * pure integer arithmetic that stays in whole-stage codegen; the DuckDB
  * form is the same program with `<<` operators, letting oracles rebuild
  * codes bit-for-bit.
  */
object ZOrder {

  private val masks = Seq(
    (16, 281470681808895L),      // 0x0000FFFF0000FFFF
    (8, 71777214294589695L),     // 0x00FF00FF00FF00FF
    (4, 1085102592571150095L),   // 0x0F0F0F0F0F0F0F0F
    (2, 3689348814741910323L),   // 0x3333333333333333
    (1, 6148914691236517205L))   // 0x5555555555555555

  private def spread(x: String, shl: (String, Int) => String): String =
    masks.foldLeft(s"(CAST(($x) AS BIGINT) & 65535)") { case (e, (n, m)) =>
      s"(($e | ${shl(e, n)}) & $m)"
    }

  /** Spark SQL text for the interleaved code of two expressions. */
  def mortonSql(a: String, b: String): String = {
    def shl(e: String, n: Int) = s"shiftleft($e, $n)"
    s"(${spread(a, shl)} | shiftleft(${spread(b, shl)}, 1))"
  }

  /** The identical integer program in DuckDB syntax. */
  def mortonDuckSql(a: String, b: String): String = {
    def shl(e: String, n: Int) = s"($e << $n)"
    s"(${spread(a, shl)} | (${spread(b, shl)} << 1))"
  }
}
