package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Testdata-layout fingerprint (r15 verdict task 3): the driver
  * REGENERATES /root/testdata each round and layout shifts (r15:
  * events.parquet collapsed to a single row group = a one-task scan;
  * timestamps flipped to µs) move sub-second pins uniformly with ZERO
  * code change. Stamping every bench artifact with per-table row
  * counts + row-group counts + file counts + bytes makes the next
  * regeneration shift machine-visible in the artifact diff instead of
  * requiring family-wide timing forensics (the r15 adjudication cost
  * a day). Footer reads only — metadata cost, no data scan, so the
  * stamp itself cannot perturb the timings it annotates.
  */
object Layout {

  val TableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Per-table `(rows, row_groups, files, bytes)` from parquet footers. */
  def fingerprint(spark: SparkSession,
      sfDir: String): Seq[(String, (Long, Int, Int, Long))] = {
    val conf = spark.sessionState.newHadoopConf()
    TableNames.flatMap { t =>
      try {
        val p = new Path(s"$sfDir/$t.parquet")
        val fs = p.getFileSystem(conf)
        if (!fs.exists(p)) None
        else {
          val st = fs.getFileStatus(p)
          val files =
            if (st.isDirectory)
              fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
            else Array(st)
          var rows = 0L; var rgs = 0; var bytes = 0L
          files.foreach { f =>
            val rdr = ParquetFileReader.open(
              HadoopInputFile.fromStatus(f, conf))
            try {
              val blocks = rdr.getFooter.getBlocks.asScala
              rgs += blocks.size
              rows += blocks.map(_.getRowCount).sum
            } finally rdr.close()
            bytes += f.getLen
          }
          Some(t -> ((rows, rgs, files.length, bytes)))
        }
      } catch { case e: Throwable =>
        System.err.println(s"[layout] $t fingerprint failed: $e")
        None
      }
    }
  }

  /** The fingerprint as a JSON object string for bench artifacts. */
  def json(spark: SparkSession, sfDir: String): String =
    fingerprint(spark, sfDir).map { case (t, (rows, rgs, files, bytes)) =>
      s""""$t":{"rows":$rows,"row_groups":$rgs,"files":$files,""" +
        s""""bytes":$bytes}"""
    }.mkString("{", ",", "}")
}
