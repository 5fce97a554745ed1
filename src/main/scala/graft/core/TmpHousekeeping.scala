package graft.core

import java.io.File

/** Lifecycle management for the engine's scratch artifacts. Every
  * stored artifact the query layer persists (stats tables, IVF index
  * roots, staged stream sources/sinks, MV parquet dirs) lives under
  * `java.io.tmpdir` as `graft_<kind>_…_<applicationId>` and is keyed
  * to the owning Spark application. The per-call memo caches evict
  * stale ENTRIES when the application changes, but the directories
  * themselves used to outlive the JVM — repeated application runs
  * accumulated orphans. Two complementary mechanisms close that:
  *
  *  - a JVM shutdown hook (armed once per application id) deletes the
  *    CURRENT application's `graft_*_<appId>` dirs at exit — the
  *    normal-path cleanup, and always safe because the appId suffix
  *    is unique to this JVM's SparkContext;
  *  - an age-guarded sweep run at arm time deletes `graft_*` dirs
  *    belonging to OTHER application ids that have not been modified
  *    for ≥ [[StaleAfterMs]] — the crashed-run cleanup. The age guard
  *    is what keeps a concurrently RUNNING sibling application's live
  *    artifacts safe: its dirs are recent by construction.
  *
  * At 100 TB these artifacts live in a catalog / object store with
  * real retention policies; this is the local-scratch analog of that
  * retention discipline.
  */
object TmpHousekeeping {
  private val StaleAfterMs: Long = 2L * 60 * 60 * 1000
  @volatile private var armedFor: String = null

  private def graftDirs(): Array[File] = {
    val tmp = new File(sys.props("java.io.tmpdir"))
    val fs = tmp.listFiles()
    if (fs == null) Array.empty
    else fs.filter(f => f.isDirectory && f.getName.startsWith("graft_"))
  }

  private def deleteQuietly(f: File): Unit =
    try org.apache.commons.io.FileUtils.deleteDirectory(f)
    catch { case _: java.io.IOException => () }

  /** Idempotent per application id; cheap enough for hot paths (one
    * volatile read once armed). */
  def arm(appId: String): Unit = {
    if (armedFor == appId) return
    synchronized {
      if (armedFor == appId) return
      armedFor = appId
      val now = System.currentTimeMillis()
      graftDirs().foreach { d =>
        if (!d.getName.endsWith(s"_$appId") &&
            now - d.lastModified() >= StaleAfterMs)
          deleteQuietly(d)
      }
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        graftDirs().filter(_.getName.endsWith(s"_$appId"))
          .foreach(deleteQuietly)))
    }
  }
}
