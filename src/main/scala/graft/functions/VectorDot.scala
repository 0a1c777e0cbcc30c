package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Sequential-fold dot product of two `array<double>` columns — the hot
  * kernel of every vector-similarity path (cosine scoring, hyperplane
  * projections, squared distances via `vec_dot(d, d)`).
  *
  * A native Catalyst expression WITH `doGenCode` for the same reason as
  * [[Fnv1a64]]: the `aggregate(zip_with(...))` column-algebra
  * formulation is semantically identical but higher-order functions
  * never enter whole-stage codegen — their lambdas evaluate
  * interpreted, one virtual call per element, which dominates the
  * runtime once candidate-pair counts reach the millions.
  *
  * Exact-parity contract: the fold is a strict left-to-right
  * `acc += a(i) * b(i)` — bit-identical to the
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` column fold it replaces
  * AND to DuckDB's `list_dot_product` (verified sequential), so every
  * oracle comparing cosines keeps matching to the last bit.
  *
  * Null semantics match the column-fold formulation: null array (or
  * mismatched lengths / null element) → null, so a malformed vector
  * surfaces as a null score rather than a wrong one.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecDotRes")
      s"""java.lang.Double $r = graft.functions.VecDot.dot($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object VecDot {
  /** Called from generated code. Strict left fold; null on length
    * mismatch or null element (mirrors zip_with/aggregate null
    * propagation).
    */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

object VectorDot {
  /** Register in the session's function registry (same pattern as
    * [[Fingerprint.register]]; also injected by GraftExtensions).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "built-in")

  /** Column API for the native dot product. */
  def vecDot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("vec_dot", a, b)
  }
}
