package graft

/** Provenance stamp for every generated JSON artifact (bench snapshots,
  * profiler sweeps, replay summaries, lint reports): the git sha of the
  * working tree that produced the artifact, a wall-clock timestamp, and a
  * short protocol tag naming the measurement recipe. Recurring round nit:
  * a committed artifact whose producing binary can't be identified reads
  * as current evidence even when it predates the last fix it describes —
  * the sha (with a `-dirty` suffix when uncommitted edits exist) makes
  * stale artifacts detectable mechanically instead of by archaeology.
  */
object Provenance {

  private def git(args: String*): Option[String] =
    try {
      val p = new ProcessBuilder(("git" +: args): _*)
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes, "UTF-8").trim
      if (p.waitFor() == 0) Some(out) else None
    } catch { case _: Throwable => None }

  /** `<sha>` or `<sha>-dirty`; "unknown" outside a git checkout. Computed
    * once per JVM — a measurement run doesn't change the tree.
    */
  lazy val gitSha: String = {
    val sha = git("rev-parse", "HEAD").filter(_.matches("[0-9a-f]{40}"))
    val dirty = git("status", "--porcelain").exists(_.nonEmpty)
    sha.map(s => if (dirty) s + "-dirty" else s).getOrElse("unknown")
  }

  /** Explicit binary identity for snapshot-binary runs (env
    * `SPARK_GRAFT_BINARY_SHA`): `gitSha` resolves the CWD's git tree,
    * which is the WRONG identity when the running classes are a /tmp
    * snapshot of a known commit (A/B legs, soak/chaos re-stamps) or when
    * the cwd is outside the repo — those artifacts read `-dirty` or
    * `unknown` even though the binary is exactly a committed tree (r16
    * verdict). The runner that MADE the snapshot knows the sha; it
    * exports it and the artifact records it as `binary_sha` alongside
    * the tree-resolved `git_sha`.
    */
  lazy val binarySha: Option[String] =
    sys.env.get("SPARK_GRAFT_BINARY_SHA").map(_.trim).filter(_.nonEmpty)

  /** JSON fragment (no surrounding braces) to splice into an artifact:
    * `"git_sha":"…"[,"binary_sha":"…"],"epoch_ms":…,"protocol":"…"`.
    */
  def stamp(protocol: String): String =
    s""""git_sha":"$gitSha",""" +
      binarySha.map(s => s""""binary_sha":"$s",""").getOrElse("") +
      s""""epoch_ms":${System.currentTimeMillis()},"protocol":"$protocol""""
}
