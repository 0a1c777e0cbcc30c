package graft.sources

import java.io.{BufferedWriter, File, FileWriter}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter,
  DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write,
  WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType,
  StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `graft.sources.JsonlSink` — the WRITE half of the DataSource V2
  * story ([[GenSource]] is the read half): a JSON-lines batch sink
  * implementing the full commit protocol that makes distributed writes
  * exactly-once:
  *
  *  1. each task writes to a TEMP file named by (task, attempt) — a
  *     re-attempted task can never collide with its predecessor;
  *  2. task `commit()` returns a [[WriterCommitMessage]] naming the
  *     temp file (nothing is visible yet); `abort()` deletes it;
  *  3. the DRIVER's `BatchWrite.commit` renames every temp into place
  *     and then writes the `_graft_commit` manifest ATOMICALLY LAST —
  *     readers trust only manifested files, so a crash anywhere before
  *     the manifest leaves the table unchanged (all-or-nothing), and
  *     task retries are invisible (only committed messages rename);
  *  4. `BatchWrite.abort` removes stragglers.
  *
  * This is the same tmp→rename→manifest discipline [[VersionedLake]]
  * applies at the table level, here at the CONNECTOR level where the
  * framework drives the state machine. Local-FS rename stands in for
  * the object-store finalize step of a production sink.
  *
  * Schema support: BIGINT / DOUBLE / STRING fields (JSON-escaped per
  * RFC 8259 — the same escape set Verify's oracle dump uses; finite
  * doubles serialize via Java's shortest-round-trip repr, which Spark's
  * JSON reader parses back to the identical bit pattern; NaN/Infinity
  * have no RFC 8259 literal and serialize as null).
  *
  * SaveMode.Append is true append: part names carry a per-commit
  * generation (`part-g00001-…`) and each commit MERGES its file list
  * into the existing manifest, so successive writes to one path
  * accumulate rather than clobber.
  */
object JsonlSink {
  val ManifestName = "_graft_commit"
  private[sources] val GenPattern = """part-g(\d+)-""".r

  /** Files named by the current manifest — the only files a reader may
    * trust.
    */
  def committedFiles(dir: String): Seq[String] = {
    val mf = Paths.get(dir, ManifestName)
    if (!Files.exists(mf)) Seq.empty
    else Files.readAllLines(mf).asScala.toSeq.filter(_.nonEmpty)
      .map(f => new File(dir, f).getPath)
  }

  /** Gate: land a filtered order slice through the V2 commit protocol,
    * read back ONLY manifested files, and roll up — proving write
    * path, manifest discipline, and JSON round-trip in one row.
    */
  def jsonlRoundtrip(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val out = Scratch.dir("jsonl_sink")
    val orders = graft.Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 150000.0)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice"))
    orders.write.format("graft.sources.JsonlSink")
      .mode("append").save(out)
    val files = committedFiles(out)
    require(files.nonEmpty, s"no committed files under $out")
    spark.read.schema(orders.schema).json(files: _*)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        graft.operators.Medallion.dsum(col("o_totalprice")).as("revenue"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
  }

  val jsonlRoundtripSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
       FROM orders
       WHERE o_totalprice > 150000.0
       GROUP BY 1 ORDER BY 1"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] = Map(
    "jsonl_sink_roundtrip" -> ((s, d) =>
      jsonlRoundtrip(s, d)
        .orderBy(org.apache.spark.sql.functions.col("o_orderpriority"))))

  def oracles: Map[String, String] = Map(
    "jsonl_sink_roundtrip" -> jsonlRoundtripSql)

  private[sources] def escape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }
}

class JsonlSink extends TableProvider {
  // write-only source: schema comes from the dataframe being written
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new JsonlTable(properties.asScala.getOrElse("path",
      throw new IllegalArgumentException("JsonlSink requires a path")),
      schema)
  override def supportsExternalMetadata(): Boolean = true
}

private[sources] class JsonlTable(path: String, writeSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"jsonl_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new JsonlBatchWrite(path, info.schema())
      }
    }
}

private[sources] case class JsonlCommit(tmpName: String, rows: Long)
    extends WriterCommitMessage

private[sources] class JsonlBatchWrite(path: String, schema: StructType)
    extends BatchWrite {
  new File(path).mkdirs()
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new JsonlWriterFactory(path, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // APPEND, not overwrite: part names carry a per-commit generation so a
    // second write to the same path can never rename over files an earlier
    // commit already published, and the new file list MERGES into the
    // existing manifest. Generation = max existing generation + 1, parsed
    // from the manifest itself (deterministic; the V2 driver commit is the
    // single writer of this path within a job).
    val existing = {
      val mf = Paths.get(path, JsonlSink.ManifestName)
      if (Files.exists(mf))
        Files.readAllLines(mf).asScala.toSeq.filter(_.nonEmpty)
      else Seq.empty[String]
    }
    val gen = existing
      .flatMap(JsonlSink.GenPattern.findFirstMatchIn(_).map(_.group(1).toLong))
      .foldLeft(-1L)(math.max) + 1L
    val finals = messages.zipWithIndex.map {
      case (JsonlCommit(tmp, _), i) =>
        val fin = f"part-g$gen%05d-$i%05d.jsonl"
        Files.move(Paths.get(path, tmp), Paths.get(path, fin),
          StandardCopyOption.ATOMIC_MOVE)
        fin
      case (other, _) => throw new IllegalStateException(
        s"unexpected commit message: $other")
    }
    // manifest LAST: its atomic appearance IS the commit point; it names
    // the union of every committed generation's files
    val tmpMf = Paths.get(path, s".${JsonlSink.ManifestName}.tmp")
    Files.write(tmpMf, (existing ++ finals).mkString("\n").getBytes("UTF-8"))
    Files.move(tmpMf, Paths.get(path, JsonlSink.ManifestName),
      StandardCopyOption.ATOMIC_MOVE)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case JsonlCommit(tmp, _) =>
        Files.deleteIfExists(Paths.get(path, tmp)); ()
      case _ => ()
    }
}

private[sources] class JsonlWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new JsonlWriter(path, schema, partitionId, taskId)
}

private[sources] class JsonlWriter(path: String, schema: StructType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  // (partition, task) in the name: a retried task writes a DIFFERENT
  // temp file and the failed attempt's file is simply never committed
  private val tmpName = f"_tmp-$partitionId%05d-$taskId.jsonl"
  private val file = new File(path, tmpName)
  private var out: BufferedWriter = _
  private var rows = 0L
  private val fields = schema.fields

  override def write(row: InternalRow): Unit = {
    if (out == null) out = new BufferedWriter(new FileWriter(file))
    val b = new StringBuilder(64)
    b.append('{')
    var i = 0
    while (i < fields.length) {
      if (i > 0) b.append(',')
      b.append('"').append(fields(i).name).append("\":")
      if (row.isNullAt(i)) b.append("null")
      else fields(i).dataType match {
        case LongType => b.append(row.getLong(i))
        case DoubleType =>
          val d = row.getDouble(i)
          // RFC 8259 has no NaN/Infinity literal; serialize non-finite as
          // null so every emitted line is valid JSON
          if (java.lang.Double.isFinite(d)) b.append(d) else b.append("null")
        case StringType =>
          b.append('"')
            .append(JsonlSink.escape(row.getUTF8String(i).toString))
            .append('"')
        case dt => throw new IllegalArgumentException(
          s"JsonlSink supports bigint/double/string, got $dt " +
            s"for ${fields(i).name}")
      }
      i += 1
    }
    b.append('}')
    out.write(b.toString)
    out.newLine()
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    else file.createNewFile() // empty partition still lands a file
    JsonlCommit(tmpName, rows)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    Files.deleteIfExists(file.toPath)
    ()
  }

  override def close(): Unit = ()
}
