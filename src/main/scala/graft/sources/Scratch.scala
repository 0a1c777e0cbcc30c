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

  /** Delete graft scratch dirs older than `maxAgeMs` (mtime). Called at
    * harness startup so repeated gate/bench runs don't accumulate
    * abandoned lake tables in /tmp without bound; the age guard keeps a
    * concurrently-running harness's fresh dirs safe.
    */
  def sweep(maxAgeMs: Long = 2L * 60 * 60 * 1000): Unit = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val cutoff = System.currentTimeMillis() - maxAgeMs
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("graft_") &&
        f.lastModified() < cutoff)
      .foreach(f =>
        try org.apache.commons.io.FileUtils.deleteDirectory(f)
        catch { case _: java.io.IOException => () }) // best effort
  }
}
