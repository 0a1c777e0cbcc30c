package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit rolling hash over a string's UTF-8 bytes — a
  * deterministic document fingerprint for near-dup bookkeeping.
  *
  * Implemented as a native Catalyst expression WITH `doGenCode` so it
  * participates in whole-stage codegen (a Scala UDF here would break
  * the codegen span and force row-at-a-time serialization on a 100 TB
  * scan path).
  */
case class Fnv1a64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = Fnv1a64.OffsetBasis
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * Fnv1a64.Prime
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Fnv1a64.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)

  override def prettyName: String = "fnv1a64"
}

object Fnv1a64 {
  final val OffsetBasis: Long = 0xcbf29ce484222325L
  final val Prime: Long = 0x100000001b3L

  /** Called from generated code. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = OffsetBasis
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * Prime
      i += 1
    }
    h
  }
}

object Fingerprint {
  /** Register the native expression in the session's function registry
    * (Spark 4's Column wraps ColumnNodes, so custom Expressions are
    * exposed through the registry + call_function, not Column ctors).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv1a64", exprs => Fnv1a64(exprs.head), "built-in")

  /** Column API for the native fingerprint expression. */
  def fnv1a64(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function("fnv1a64", c)
  }
}
