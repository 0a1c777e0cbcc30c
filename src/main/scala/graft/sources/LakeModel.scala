package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The versioned lake's shared model types — commit outcomes, pending
  * writes, parsed manifests, and the two write-path exceptions. Moved
  * to package level in the r16 split of [[VersionedLake]] (aliases on
  * the object keep the `VersionedLake.X` paths working) so instances
  * stay plain top-level case classes with no outer pointer.
  */
object LakeModel {

  /** A writer lost the commit race to another writer whose changes
    * overlap its touched buckets — the table state it merged against is
    * stale in a way a rebase cannot repair. The caller retries the
    * whole merge against the new snapshot (plain [[upsert]] does
    * exactly that).
    */
  final class ConcurrentWriteConflict(msg: String)
    extends RuntimeException(msg)

  /** Outcome of a committed write: the version it landed as and how
    * many disjoint-bucket rebase rounds the commit loop needed (0 =
    * won the first CAS).
    */
  final case class CommitResult(version: Int, rebaseRounds: Int)

  /** A write batch (or an ADD CONSTRAINT over existing data) violated
    * a table CHECK constraint. The whole commit is rejected — ACID
    * atomicity: no partial batch ever lands.
    */
  final class ConstraintViolation(msg: String)
    extends RuntimeException(msg)

  /** A prepared-but-uncommitted write: the snapshot it merged against,
    * the buckets whose state it assumed, the manifest LINES that must
    * represent those buckets in the committed version (data files
    * and/or DV mappings — fixed at prepare time), and the physical
    * files it adopted (for cleanup if the commit conflicts; invisible
    * until a manifest references them).
    */
  final case class PendingCommit(baseVersion: Int, touched: Set[Int],
    ourLines: Seq[String], adopted: Seq[String],
    txn: Option[(String, Long)] = None,
    op: String = "MERGE",
    metaExtra: Seq[String] = Nil, // per-version meta lines (never carry)
    // table-property KEYS this commit re-stamps (ourLines carries the
    // new value): the carried-over old line is dropped, and a rebase
    // CONFLICTS if a concurrent winner changed the same key — the
    // row-id high-water mark needs exactly this read-modify-write
    // safety (two writers allocating from one hwm would collide)
    dropProps: Seq[String] = Nil)

  /** Parsed manifest: immutable data files, the per-file deletion
    * vector mapping (data file → DV sidecar holding (file_rel, pos)
    * position-deletes), and per-application transaction watermarks
    * (the Delta txnAppId/txnVersion idempotence ledger). Serialized as
    * plain data lines, `dv\t<data>\t<sidecar>` lines and
    * `txn\t<appId>\t<version>` lines.
    */
  final case class TableManifest(data: Seq[String], dv: Map[String, String],
      txn: Map[String, Long] = Map.empty,
      props: Map[String, String] = Map.empty,
      stats: Map[String, String] = Map.empty) {
    def lines: Seq[String] =
      data ++ dv.toSeq.sorted.map { case (d, s) => s"dv\t$d\t$s" } ++
        txn.toSeq.sorted.map { case (a, v) => s"txn\t$a\t$v" } ++
        props.toSeq.sorted.map { case (k, v) => s"prop\t$k\t$v" } ++
        stats.toSeq.sorted.map { case (f, p) => s"stats\t$f\t$p" }
    def allFiles: Seq[String] = data ++ dv.values.toSeq.distinct
    /** The table's bucket modulus — fixed at creation, carried in
      * every manifest: key→file pruning is only sound when every
      * writer hashes with the SAME modulus, so it is a TABLE property
      * (Delta table-properties style), not a per-call argument.
      */
    def numBuckets(fallback: Int): Int =
      props.get("numBuckets").map(_.toInt).getOrElse(fallback)
  }
}
