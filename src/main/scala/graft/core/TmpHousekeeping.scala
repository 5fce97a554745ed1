package graft.core

import java.io.File

/** Lifecycle management for the engine's scratch artifacts. Every
  * stored artifact the query layer persists (stats tables, IVF index
  * roots, staged stream sources/sinks, MV parquet dirs) lives under
  * `java.io.tmpdir` as `graft_<kind>_…_<applicationId>` and is keyed
  * to the owning Spark application. The per-call memo caches evict
  * stale ENTRIES when the application changes, but the directories
  * themselves used to outlive the JVM — repeated application runs
  * accumulated orphans. Three cooperating mechanisms close that:
  *
  *  - a JVM shutdown hook (armed once per application id) deletes the
  *    CURRENT application's `graft_*_<appId>` dirs at exit — the
  *    normal-path cleanup, and always safe because the appId suffix
  *    is unique to this JVM's SparkContext;
  *  - a HEARTBEAT file (`graft_owner_<appId>`) touched on the hot
  *    path at most once per [[HeartbeatMs]] — proof the owning
  *    application is still alive, independent of its artifact dirs'
  *    mtimes (a memoized index built at minute 5 keeps its creation
  *    mtime forever, so artifact age says nothing about owner
  *    liveness);
  *  - an age-guarded sweep run at arm time: `graft_*` dirs belonging
  *    to OTHER application ids are deleted only when the owner's
  *    heartbeat is missing or ≥ [[StaleAfterMs]] old — a crashed or
  *    exited app stops heartbeating and its leftovers are collected,
  *    while a long-running sibling's stay safe for as long as it
  *    keeps running queries.
  *
  * At 100 TB these artifacts live in a catalog / object store with
  * real retention policies; this is the local-scratch analog of that
  * retention discipline.
  */
object TmpHousekeeping {
  private val StaleAfterMs: Long = 2L * 60 * 60 * 1000
  private val HeartbeatMs: Long = 60 * 1000
  @volatile private var armedFor: String = null
  @volatile private var lastBeat: Long = 0L

  private def tmpRoot = new File(sys.props("java.io.tmpdir"))

  private def graftDirs(): Array[File] = {
    val fs = tmpRoot.listFiles()
    if (fs == null) Array.empty
    else fs.filter(f => f.isDirectory && f.getName.startsWith("graft_"))
  }

  private def heartbeatFile(appId: String): File =
    new File(tmpRoot, s"graft_owner_$appId")

  private def deleteQuietly(f: File): Unit =
    try org.apache.commons.io.FileUtils.deleteDirectory(f)
    catch { case _: java.io.IOException => () }

  /** Idempotent per application id and cheap on hot paths (one
    * volatile read once armed; a throttled touch of the heartbeat). */
  def arm(appId: String): Unit = {
    if (armedFor == appId) { beat(appId); return }
    synchronized {
      if (armedFor == appId) return
      armedFor = appId
      beat(appId, force = true)
      val now = System.currentTimeMillis()
      graftDirs().foreach { d =>
        if (!d.getName.endsWith(s"_$appId")) {
          // owner app id = suffix after the last '_'
          val owner = d.getName.substring(d.getName.lastIndexOf('_') + 1)
          val hb = heartbeatFile(owner)
          val ownerAlive =
            hb.isFile && now - hb.lastModified() < StaleAfterMs
          if (!ownerAlive && now - d.lastModified() >= StaleAfterMs)
            deleteQuietly(d)
        }
      }
      // collect dead apps' heartbeat files too
      Option(tmpRoot.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.startsWith("graft_owner_") &&
          f.getName != heartbeatFile(appId).getName &&
          now - f.lastModified() >= StaleAfterMs)
        .foreach(f => { f.delete(); () })
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        graftDirs().filter(_.getName.endsWith(s"_$appId"))
          .foreach(deleteQuietly)
        heartbeatFile(appId).delete()
        ()
      }))
    }
  }

  private def beat(appId: String, force: Boolean = false): Unit = {
    val now = System.currentTimeMillis()
    if (force || now - lastBeat >= HeartbeatMs) {
      lastBeat = now
      val hb = heartbeatFile(appId)
      try {
        if (!hb.createNewFile()) { hb.setLastModified(now); () }
      } catch { case _: java.io.IOException => () }
    }
  }
}
