package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Hamming distance between two bit vectors packed into `array<bigint>`
  * words — the scan kernel of binary-quantized vector search
  * ([[graft.operators.Bq]]): per word one XOR and one POPCNT, no array
  * allocation, fully inside whole-stage codegen.
  *
  * A native expression for the same reason as [[VecDot]]: the
  * `aggregate(zip_with(a, b, (x,y) -> bit_count(x ^ y)), …)` column
  * algebra is semantically identical but higher-order functions
  * evaluate their lambdas interpreted — one virtual call per word per
  * candidate pair, which dominates exactly the stage binary
  * quantization exists to make cheap.
  *
  * Null semantics mirror the column-fold formulation: null array,
  * length mismatch, or null word → null.
  */
case class HammingWords(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HammingWords.hamming(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("hammingRes")
      s"""java.lang.Integer $r = graft.functions.HammingWords.hamming($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingWords =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hamming_words"
}

object HammingWords {
  /** Called from generated code: Σ_w popcount(a[w] XOR b[w]). */
  def hamming(a: ArrayData, b: ArrayData): java.lang.Integer = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    java.lang.Integer.valueOf(s)
  }
}
