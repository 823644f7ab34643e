package graft.api

/** Per-call unique scratch dirs, deleted when this JVM exits — repeated
  * Verify/Bench runs don't accumulate temp trees, callers get fresh
  * checkpoints, and concurrent processes can't clobber each other (a fixed
  * shared path would be wiped mid-run by the second process). Shared by
  * every operator that needs a transient on-disk staging area. */
object Scratch {
  def dir(name: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_$name")
    def del(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(del))
      f.delete(); ()
    }
    Runtime.getRuntime.addShutdownHook(new Thread(() => del(p.toFile)))
    p.toString
  }
}
