package graft.core

/** Naming for the engine's per-application scratch artifacts (see
  * [[TmpHousekeeping]] for their lifecycle). One definition so the
  * tag format cannot drift between operators. */
object Scratch {

  /** 8-hex content tag of an sf dir for scratch-root names: roots
    * memoized per (application, dir) MUST embed the dir identity, or
    * a second sf dir in the same application would rebuild into the
    * first's path and silently poison its still-cached entry. */
  def dirTag(dir: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(dir.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString

  /** The scratch root for one (kind, sf dir, application) triple:
    * `<tmp>/graft_<kind>_<tag>_<appId>` — the layout the shutdown
    * hook and the heartbeat sweep both key on. */
  def root(kind: String, dir: String, appId: String): java.io.File =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_${kind}_${dirTag(dir)}_$appId")
}
