package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst `Generator` — the engine's UDTF surface (SURVEY §2.9:
  * the reference has no table functions at all, `00_utils.py:41-57` is its
  * single scalar UDF; table-valued generation is a north-star addition).
  *
  * `token_windows(text, size, stride) → rows (win_id, tok_start, tok_count,
  * win_text)`: fixed-size sliding token windows with overlap — the
  * long-document chunking step of a training-data pipeline (512-token
  * windows at 256 strides, scaled down for fixtures).
  *
  * Why a `Generator` rather than `explode(transform(sequence(...)))`: the
  * compositional spelling materializes the full window array per row before
  * exploding — O(tokens × size / stride) bytes resident per document, which
  * on a 1M-token document at 512/256 is ~2× the document resident as one
  * array value. A Generator's `eval` returns a lazy iterator that
  * `GenerateExec` drains row-at-a-time, so peak memory is one window
  * regardless of document length — the property that matters when the
  * corpus has heavy-tailed document sizes. `terminate()` is the UDTF
  * end-of-partition hook (unused here; empty by contract).
  *
  * Registered in [[GraftFunctions]], so it is callable from SQL as
  * `LATERAL VIEW token_windows(text, 8, 4) w AS win_id, ...` exactly like a
  * built-in generator; `LATERAL VIEW OUTER` null-row semantics for empty
  * documents come from `GenerateExec`, not this expression, and are spec-
  * pinned (`GeneratorUdtfSpec`).
  */
case class TokenWindows(text: Expression, size: Expression, stride: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, size, stride)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"token_windows expects string text, got ${text.dataType.catalogString}")
    else if (size.dataType != IntegerType || stride.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("token_windows size/stride must be int")
    else if (!size.foldable || !stride.foldable)
      TypeCheckResult.TypeCheckFailure(
        "token_windows size/stride must be constant (foldable)")
    else {
      val (sz, st) = (size.eval().asInstanceOf[Int], stride.eval().asInstanceOf[Int])
      if (sz <= 0 || st <= 0)
        TypeCheckResult.TypeCheckFailure("token_windows size/stride must be > 0")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def elementSchema: StructType = StructType(Seq(
    StructField("win_id", IntegerType, nullable = false),
    StructField("tok_start", IntegerType, nullable = false),
    StructField("tok_count", IntegerType, nullable = false),
    StructField("win_text", StringType, nullable = false)))

  @transient private lazy val winSize = size.eval().asInstanceOf[Int]
  @transient private lazy val winStride = stride.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) return Iterator.empty
    // Whitespace tokenization, empty tokens dropped (leading-space split
    // artifacts); identical to the oracle's regexp_split + filter.
    val toks = t.asInstanceOf[UTF8String].toString.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) return Iterator.empty
    new Iterator[InternalRow] {
      private var start = 0
      private var id = 0
      override def hasNext: Boolean = start < toks.length
      override def next(): InternalRow = {
        val n = math.min(winSize, toks.length - start)
        val row = InternalRow(
          id, start, n,
          UTF8String.fromString(toks.slice(start, start + n).mkString(" ")))
        start += winStride
        id += 1
        row
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TokenWindows =
    copy(text = newChildren(0), size = newChildren(1), stride = newChildren(2))
}
