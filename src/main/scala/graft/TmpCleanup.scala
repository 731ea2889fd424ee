package graft

/** JVM-exit cleanup for the per-process derived stores (cellsStored /
  * cellsBucketed / labelsStored): every run writes its own copies under
  * java.io.tmpdir (paths are pid-keyed, so concurrent runs never clash),
  * and without a hook repeated bench/test runs accumulate orphaned
  * directories. Registration is idempotent; deletion is best-effort
  * (a half-deleted tree on a hard kill is re-keyed, never reused).
  */
object TmpCleanup {
  private val paths = scala.collection.concurrent.TrieMap.empty[String, Unit]

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      paths.keys.foreach(p => delete(new java.io.File(p)))))

  def register(path: String): Unit = {
    hookInstalled
    paths.put(path, ())
    ()
  }

  private def delete(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(delete)
    f.delete()
    ()
  }
}
