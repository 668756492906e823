package graft.operators

import graft.vpts.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the LSH parameter tuner: the closed-form error area, the split
  * picks the SQL twin of q_dedup_lsh_tuned hardcodes, and the tuned
  * banding's recall relationship to the default (4,2) split.
  */
class LshTuneSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  test("error area closed form: (1,1) banding is analytic") {
    // P(s) = s  =>  err(t) = t^2 - t + 1/2 exactly
    for (t <- Seq(0.2, 0.5, 0.8)) {
      val expect = t * t - t + 0.5
      assert(math.abs(Dedup.lshErrorArea(t, 1, 1) - expect) < 1e-12,
        s"t=$t: ${Dedup.lshErrorArea(t, 1, 1)} != $expect")
    }
  }

  test("error area endpoints: never-collide and always-collide bounds") {
    // any banding's error area is within (0, 1) and I(1) decreasing in b
    for (b <- Seq(1, 2, 4, 8); t <- Seq(0.1, 0.5, 0.9)) {
      val e = Dedup.lshErrorArea(t, b, 8 / b)
      assert(e > 0.0 && e < 1.0, s"b=$b t=$t area=$e out of range")
    }
  }

  test("tuner picks: the documented threshold->split map over 8 slots") {
    // These pins keep qLshTuned's Spark banding and its hardcoded SQL
    // twin from drifting: the query calls lshTune(0.7, 8) at plan time.
    assert(Dedup.lshTune(0.15, 8) == ((8, 1)))
    assert(Dedup.lshTune(0.5, 8) == ((4, 2)))
    assert(Dedup.lshTune(0.7, 8) == ((2, 4)))
    assert(Dedup.lshTune(0.9, 8) == ((1, 8)))
  }

  test("tuner rejects slot counts outside the numerically exact range") {
    // past ~32 slots C(b,i) exceeds 2^53 and the alternating closed form
    // cancels catastrophically — the guard fails loudly instead of
    // returning a rounding-noise split
    intercept[IllegalArgumentException](Dedup.lshTune(0.5, 64))
    intercept[IllegalArgumentException](Dedup.lshTune(0.5, 0))
    intercept[IllegalArgumentException](Dedup.lshTune(1.0, 8))
    assert(Dedup.lshTune(0.5, 32)._1 * Dedup.lshTune(0.5, 32)._2 == 32)
  }

  test("tuner is monotone: rows per band never decrease with threshold") {
    val picks = Seq(0.05, 0.15, 0.3, 0.5, 0.65, 0.8, 0.95)
      .map(t => Dedup.lshTune(t, 8)._2)
    assert(picks == picks.sorted, s"rows not monotone in threshold: $picks")
  }

  test("tuned (2,4) banding is a subset of the default (4,2) candidates") {
    import spark.implicits._
    // A (2,4) band key is the concat of two adjacent (4,2) band keys, so
    // any (2,4) collision implies both underlying (4,2) bands collide —
    // tuned candidates (higher threshold) must be a subset of default ones
    // on any corpus without cap interference.
    val base = Seq.tabulate(40) { i =>
      (i.toLong, s"shared prefix words here plus unique tail token$i extra pad")
    }
    val dups = Seq(
      (100L, "an exact duplicate sentence that repeats verbatim across docs"),
      (101L, "an exact duplicate sentence that repeats verbatim across docs"),
      (102L, "an exact duplicate sentence that repeats verbatim across docs"))
    val dir = java.nio.file.Files.createTempDirectory("lsh-tuned").toString
    (base ++ dups).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val tuned = Dedup.qLshTuned(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val default = Dedup.qLshCandidates(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tuned.subsetOf(default), s"tuned pairs not in default: ${tuned -- default}")
    // exact duplicates collide in EVERY band under both splits
    val exact = Set((100L, 101L), (100L, 102L), (101L, 102L))
    assert(exact.subsetOf(tuned), s"missing exact-dup pairs: ${exact -- tuned}")
  }
}
