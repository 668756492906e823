package graft

/** CI-shaped determinism guard: run the full Verify dump AND the DuckDB
  * cross-engine compare at BOTH sf0.01 and sf0.1 in one command, failing
  * loudly (nonzero exit) on any divergence at either scale.
  *
  *   sbt "runMain graft.Gate"
  *
  * Exists because single-scale checks have missed real bugs: the round-2
  * null-signature divergence only reproduced at sf0.1. The compare itself is
  * scripts/check.py (the local mirror of the driver's gate); this main just
  * sequences dump + compare per scale and turns any failure into exit 1.
  */
object Gate {
  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** Default scale dirs: `GRAFT_SCALE_DIRS` (colon-separated) if set;
    * otherwise the two driver-provided testdata scales, plus the pinned
    * sf1 artifact when it has been materialized (scripts/make_sf.py).
    */
  private def defaultScales: Seq[String] =
    sys.env.get("GRAFT_SCALE_DIRS").map(_.split(':').toSeq.filter(_.nonEmpty))
      .getOrElse {
        val base = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
        val sf1 = "/tmp/sf1"
        if (new java.io.File(s"$sf1/documents.parquet").exists) {
          // machine-state dependency, so say it out loud: a stale or
          // half-written sf1 from an interrupted make_sf.py would fail the
          // gate (or validate outdated data) with no hint why otherwise.
          // Pin scales explicitly with GRAFT_SCALE_DIRS to opt out.
          println(s"[gate] NOTICE: auto-including $sf1 (found on disk; " +
            "regenerate with scripts/make_sf.py, or set GRAFT_SCALE_DIRS " +
            "to pin scales explicitly)")
          base :+ sf1
        } else base
      }

  def main(args: Array[String]): Unit = {
    val scales = if (args.nonEmpty) args.toSeq else defaultScales
    var failed = false
    scales.foreach { sf =>
      val out = s"/tmp/gate_out_${new java.io.File(sf).getName}"
      println(s"[gate] verify dump: $sf -> $out")
      deleteRecursively(new java.io.File(out))
      Verify.main(Array(sf, out))
      // a query that CRASHES writes no output dir; check.py only compares
      // dirs that exist, so a missing dump must fail the gate explicitly
      // or a Spark-side regression would go green vacuously
      val missing = SparkEntry.queries.keys.toSeq.sorted
        .filterNot(n => new java.io.File(s"$out/$n").isDirectory)
      if (missing.nonEmpty) {
        System.err.println(
          s"[gate] MISSING DUMPS at $sf (query crashed?): ${missing.mkString(", ")}")
        failed = true
      }
      println(s"[gate] duckdb compare: $sf")
      val p = new ProcessBuilder("python3", "scripts/check.py", sf, out)
        .redirectErrorStream(true).start()
      val log = new String(p.getInputStream.readAllBytes())
      p.waitFor()
      // check.py's exit status is authoritative: it exits 1 on any FAIL,
      // including missing dumps — no output-substring matching
      val ok = p.exitValue() == 0
      println(log.linesIterator.filter(l => l.startsWith("FAIL") || l.startsWith("=="))
        .mkString("\n"))
      if (!ok) {
        System.err.println(s"[gate] DIVERGENCE at $sf — see compare output above")
        failed = true
      }
    }
    if (failed) sys.exit(1)
    println(s"[gate] all scales green: ${scales.mkString(", ")}")
  }
}
