package graft.core

/** Small filesystem helpers shared by scratch-dir users. */
object Fs {
  /** Delete a directory tree (children before parents); missing entries
    * and races are tolerated. Does not follow symlinks (walk reports the
    * link itself, which is deleted, not its target's contents).
    */
  def deleteRecursively(path: String): Unit = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(root)) {
      // Files.walk holds a directory stream open until closed — leaking it
      // leaks a file descriptor per cleanup in a long-lived driver.
      val walk = java.nio.file.Files.walk(root)
      val entries = try walk.iterator().asScala.toSeq finally walk.close()
      entries.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  private val exitPaths = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val exitHook: Unit = Runtime.getRuntime.addShutdownHook(new Thread(() =>
    exitPaths.forEach(p => try deleteRecursively(p) catch { case _: Exception => () })))

  /** Register a scratch path for JVM-exit cleanup (idempotent; one hook
    * total, so repeated query invocations don't accumulate hooks). */
  def deleteOnExit(path: String): Unit = {
    exitHook
    exitPaths.add(path)
    ()
  }
}
