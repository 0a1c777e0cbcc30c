package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic per-group uniform sample of k strings, as a
  * `TypedImperativeAggregate`: keeps the k elements with the smallest
  * (fnv1a64, value) — equivalent in distribution to a uniform k-sample
  * but reproducible at any partitioning / retry (no RNG state; the
  * value tie-break makes even 64-bit hash collisions order-independent),
  * which Spark's reservoir-less aggregate set and nondeterministic
  * TABLESAMPLE cannot give. FNV-1a (not xxhash64) as the ordering hash
  * so an external SQL engine can reproduce the selection exactly — the
  * DuckDB oracle for `docs_sample_per_lang` re-derives it with a
  * list_reduce fold over the value's UTF-8 bytes.
  *
  * Buffer is a bounded size-k heap → partial aggregation ships k
  * (hash, value) pairs per group per task regardless of group size.
  * SQL name: `hash_sample(col, k)` (registered by [[graft.GraftExtensions]]).
  */
case class HashSample(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, String)]] {

  require(k > 0, s"hash_sample k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // max-heap on (hash, value): the root is the largest, evicted first
  private def ord: Ordering[(Long, String)] = Ordering.Tuple2[Long, String]

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, String)] =
    mutable.PriorityQueue.empty[(Long, String)](ord)

  private def insert(buf: mutable.PriorityQueue[(Long, String)],
      h: Long, v: String): Unit = {
    if (buf.size < k) buf.enqueue((h, v))
    else if (ord.compare((h, v), buf.head) < 0) { buf.dequeue(); buf.enqueue((h, v)) }
  }

  override def update(buf: mutable.PriorityQueue[(Long, String)],
      input: InternalRow): mutable.PriorityQueue[(Long, String)] = {
    val v = child.eval(input)
    if (v != null) {
      val u = v.asInstanceOf[UTF8String]
      val h = Fnv1a64.hashBytes(u.getBytes)
      insert(buf, h, u.toString)
    }
    buf
  }

  override def merge(a: mutable.PriorityQueue[(Long, String)],
      b: mutable.PriorityQueue[(Long, String)]): mutable.PriorityQueue[(Long, String)] = {
    b.foreach { case (h, v) => insert(a, h, v) }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Long, String)]): Any = {
    val sorted = buf.toSeq.sortBy { case (h, v) => (h, v) }
    new GenericArrayData(sorted.map(x => UTF8String.fromString(x._2)))
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (h, v) =>
      out.writeLong(h)
      val bytes = v.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, String)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val h = in.readLong()
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.enqueue((h, new String(b, "UTF-8")))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HashSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HashSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HashSample =
    copy(child = newChildren.head)

  override def prettyName: String = "hash_sample"
}
