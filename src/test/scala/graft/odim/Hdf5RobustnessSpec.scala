package graft.odim

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Corrupt-input behavior: a truncated or bit-flipped file must fail fast
  * with an exception (never hang or return garbage silently) so the
  * failFast=false path can skip it cleanly.
  */
class Hdf5RobustnessSpec extends AnyFunSuite {

  private val fixture = Files.readAllBytes(Paths.get(
    "/root/reference/tests/data/vp/bewid/bewid_vp_20221113T023500Z_0xb.h5"))

  private def tryDecode(bytes: Array[Byte]): Either[Throwable, Int] =
    try {
      val r = OdimReader.checkVpOdim(OdimReader(bytes, "x.h5"))
      Right(graft.vpts.BirdProfile.fromOdim(r, "x.h5").levels.size)
    } catch { case t: Throwable => Left(t) }

  test("intact fixture decodes") {
    assert(tryDecode(fixture) == Right(25))
  }

  test("truncations fail fast with exceptions") {
    Seq(0, 4, 7, 8, 24, 64, 200, 1000, fixture.length / 2, fixture.length - 7)
      .foreach { n =>
        val res = tryDecode(java.util.Arrays.copyOf(fixture, n))
        assert(res.isLeft, s"truncation to $n bytes unexpectedly decoded: $res")
      }
  }

  test("random single-byte corruption never hangs (decodes or throws)") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val b = fixture.clone()
      val pos = rnd.nextInt(b.length)
      b(pos) = (b(pos) ^ (1 << rnd.nextInt(8))).toByte
      val t0 = System.nanoTime()
      tryDecode(b) // Either outcome is acceptable; must return promptly
      assert((System.nanoTime() - t0) / 1e9 < 10.0, s"slow decode after flip @$pos")
    }
  }
}
