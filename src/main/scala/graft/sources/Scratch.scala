package graft.sources

/** Scratch locations for the registered sink-demonstration queries.
  *
  * Every invocation gets a FRESH directory: the gate's source data is
  * regenerated between rounds, so any fixture reused across runs
  * (keyed by path, hash, or _SUCCESS marker) eventually serves stale
  * data and fails the oracle while the code is correct. A unique path
  * per call removes staleness, path-hash collisions, and concurrent
  * writer races in one stroke; the cost is one extra small write per
  * invocation, and /tmp is ephemeral per host.
  */
private[graft] object Scratch {
  def dir(tag: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
}
