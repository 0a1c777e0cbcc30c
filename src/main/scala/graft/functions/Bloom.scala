package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter build + probe as native Catalyst machinery, for
  * semi-join pruning of a fact scan before its shuffle join.
  *
  * The scale story (the same one behind Spark's runtime row-level
  * filtering): when a selective dim-side filter leaves too many keys to
  * ship as a broadcast hash relation (100M keys ≈ GBs), a bloom filter
  * over those keys is ~10 bits/key (≈120 MB at 1% fp) — small enough to
  * broadcast — and pruning the fact side BEFORE the shuffle cuts the
  * exchange volume by the filter's selectivity. False positives are
  * eliminated by the join itself, so the final result is exact.
  *
  * Probes use Kirsch-Mitzenmacher double hashing: k positions
  * `h1 + i·h2` from two splitmix64-style mixes of the key — no per-probe
  * rehash, and deterministic across partitionings/retries.
  */
object GraftBloom {
  final val NumHashes = 5

  /** splitmix64 finalizer — avalanche mix of a long key. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def setBits(bits: Array[Byte], key: Long): Unit = {
    val m = bits.length.toLong * 8L
    val h1 = mix(key)
    val h2 = mix(key ^ 0xc2b2ae3d27d4eb4fL) | 1L
    var i = 0
    while (i < NumHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
      bits((pos >>> 3).toInt) = (bits((pos >>> 3).toInt) | (1 << (pos & 7L).toInt)).toByte
      i += 1
    }
  }

  /** Called from generated code. */
  def mightContain(bits: Array[Byte], key: Long): Boolean = {
    val m = bits.length.toLong * 8L
    val h1 = mix(key)
    val h2 = mix(key ^ 0xc2b2ae3d27d4eb4fL) | 1L
    var i = 0
    while (i < NumHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
      if ((bits((pos >>> 3).toInt) & (1 << (pos & 7L).toInt)) == 0) return false
      i += 1
    }
    true
  }
}

/** `bloom_build(key, numBits)` — aggregates long keys into a bloom
  * filter bit array (BinaryType). Partial state is the byte array
  * itself; merge is a bitwise OR, so the aggregate is fully mergeable
  * (map-side combine ships one array per task, never the keys).
  */
case class BloomBuildAgg(
    child: Expression,
    numBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(numBits >= 64 && (numBits & 7) == 0,
    s"bloom_build numBits must be a multiple of 8 and >= 64, got $numBits")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](numBits / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) GraftBloom.setBits(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "bloom_build"
}

/** `bloom_contains(bloom, key)` — probe, with `doGenCode` so the filter
  * stays inside the scan's whole-stage-codegen span (the hot path runs
  * once per fact row).
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_contains(bloom BINARY, key BIGINT): got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(bloom: Any, key: Any): Any =
    GraftBloom.mightContain(bloom.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) =>
      s"graft.functions.GraftBloom.mightContain($b, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bloom_contains"
}

/** `bloom_contains` over a BROADCAST filter — the large-filter path.
  * [[BloomMightContain]] with a `lit(bytes)` bloom embeds the bit array
  * in the plan as a Literal, which serializes into every task binary:
  * fine at 128 KB, a plan-bloat scale-killer at the ~120 MB a 100M-key
  * filter needs. This variant holds a `Broadcast` handle instead — the
  * task closure carries only the handle, executors fetch the bits once
  * via the block manager, and codegen caches `.value()` in a per-task
  * field so the hot probe loop touches a local byte[].
  */
case class BloomContainsBcast(
    bloom: org.apache.spark.broadcast.Broadcast[Array[Byte]],
    child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_contains_bcast(key BIGINT): got ${child.dataType.simpleString}")

  override protected def nullSafeEval(key: Any): Any =
    GraftBloom.mightContain(bloom.value, key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = classOf[org.apache.spark.broadcast.Broadcast[_]].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bloom, bcCls)
    val bits = ctx.addMutableState("byte[]", "bloomBits",
      v => s"$v = (byte[]) $bcRef.value();")
    defineCodeGen(ctx, ev, k =>
      s"graft.functions.GraftBloom.mightContain($bits, $k)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomContainsBcast = copy(child = newChild)

  override def prettyName: String = "bloom_contains_bcast"
}
