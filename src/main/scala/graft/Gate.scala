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

  def main(args: Array[String]): Unit = {
    val scales = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
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
      val ok = p.exitValue() == 0 && log.contains(", 0 fail")
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
