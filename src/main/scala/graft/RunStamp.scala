package graft

/** Provenance stamp for every generated artifact: the git commit the run
  * executed on, with a `-dirty` suffix when the working tree differs from
  * HEAD. Round-13 post-mortem: the sf100 bench artifact was measured on
  * then-uncommitted code and proving that required timestamp forensics — a
  * SHA field in the JSON ends that permanently (VERDICT r13 "What's wrong"
  * #1). Failure never blocks the run: outside a git checkout the stamp is
  * "unknown".
  */
object RunStamp {
  private def exec(cmd: Seq[String]): Option[String] =
    try {
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(false).start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
      if (p.waitFor() == 0 && out.nonEmpty) Some(out) else None
    } catch { case _: Throwable => None }

  lazy val commit: String = {
    val sha = exec(Seq("git", "rev-parse", "--short=12", "HEAD")).getOrElse("unknown")
    // dirtiness scoped to the code that determines results — the bench
    // itself rewrites artifact files (BENCH_HISTORY_MINS.json) mid-run, and
    // those must not mark a clean-source run dirty. tools/ IS included: the
    // oracle compare (scale_verify.py) and data-gen scripts live there and
    // their state determines verdicts, while the bench only rewrites
    // root-level *.json artifacts, so tools/ cannot self-dirty a run.
    val dirty = exec(Seq("git", "status", "--porcelain", "--",
      "src", "build.sbt", "project", "tools"))
      .exists(_.nonEmpty)
    if (sha != "unknown" && dirty) s"$sha-dirty" else sha
  }
}
