package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Single-maintainer arbitration for the log-less table protocols
  * ([[SortedRunIndex.compact]], [[graft.llm.MmFeatures.compactBatches]]).
  *
  * The manifest-last swap discipline makes a CRASHED compaction safe (the
  * next reader completes or discards it), but two LIVE maintainers racing
  * the same root would both write `compact-tmp` and the root manifest —
  * undefined behavior. This lease makes the race a loud refusal instead:
  * the first maintainer atomically creates `.maintenance_lease` at the
  * table root (`FileSystem.create(overwrite = false)` — atomic
  * create-if-absent on HDFS; best-effort on a local FS, which is still a
  * sound narrowing: the unguarded protocol had the full compaction as its
  * race window); the second maintainer's create fails and it throws
  * [[MaintenanceLease.ConcurrentMaintenanceException]] naming the holder.
  * No queueing — maintenance is idempotent and cheap to retry, and a
  * refusal is diagnosable where a silent interleave is not (the round-9
  * `deleteWhere` active-writer refusal precedent).
  *
  * A maintainer that CRASHES while holding the lease leaves it behind;
  * the refusal message says exactly what to do (verify the holder is
  * dead, then [[MaintenanceLease.break]] — recovery of its half-finished
  * swap is automatic on the next read via the manifest protocol). A TTL
  * auto-break is deliberately absent: silently stealing a lease from a
  * slow-but-alive maintainer recreates the very race this exists to
  * prevent.
  */
object MaintenanceLease {

  final class ConcurrentMaintenanceException(msg: String)
      extends IllegalStateException(msg)

  private val LeaseName = ".maintenance_lease"

  /** Acquire the lease for `op` on `root` or throw loudly. Returns the
    * lease path; callers MUST [[release]] in a finally. */
  def acquire(fs: FileSystem, root: Path, op: String): Path = {
    val lease = new Path(root, LeaseName)
    val holder =
      s"op=$op pid=${ProcessHandle.current().pid()} " +
        s"host=${java.net.InetAddress.getLocalHost.getHostName} " +
        s"acquired=${java.time.Instant.now()}"
    def refuse(): Nothing = {
      val info =
        try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(fs.open(lease)),
          java.nio.charset.StandardCharsets.UTF_8)
        catch { case scala.util.control.NonFatal(_) => "<unreadable>" }
      throw new ConcurrentMaintenanceException(
        s"$op on $root refused: another maintainer holds the lease [$info]. " +
          s"If that maintainer crashed, verify it is dead and break the " +
          s"lease ($lease) — its half-finished swap recovers automatically " +
          "on the next read.")
    }
    if (fs.exists(lease)) refuse()
    val out =
      try fs.create(lease, false) // overwrite=false: create-if-absent
      catch { case _: java.io.IOException => refuse() }
    out.write(holder.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    lease
  }

  /** Release a lease acquired by this maintainer. */
  def release(fs: FileSystem, lease: Path): Unit = {
    fs.delete(lease, false)
    ()
  }

  /** Operator intervention: remove a dead maintainer's lease. */
  def break(fs: FileSystem, root: Path): Boolean =
    fs.delete(new Path(root, LeaseName), false)

  /** Is a maintainer (live or crashed) currently holding `root`?
    * Read-path recovery of a half-finished swap must gate on this: a
    * reader that cannot tell a crashed maintainer from a LIVE one mid-swap
    * would race the live one's rename and delete the merged batches' only
    * copy. A crashed holder leaves the lease behind, so recovery then
    * waits for the operator's [[break]] — the next cold read (or the next
    * leased compaction) completes the swap. */
  def isHeld(fs: FileSystem, root: Path): Boolean =
    fs.exists(new Path(root, LeaseName))
}
