package graft.operators

import graft.vpts.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit-normalization edge cases (ADVICE r7): a zero-norm embedding must
  * render as explicit zeros, not NaN folded through a non-ANSI cast.
  */
class NormalizeSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  test("zero-norm embeddings normalize to explicit zeros") {
    import spark.implicits._
    val e = Seq(
      (0L, Array.fill(4)(0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val rows = Similarity.unitNormalized(e).collect()
    assert(rows(0).getLong(1) == 0L)
    assert(rows(0).getString(2) == "0,0,0,0",
      s"zero vector rendered as ${rows(0).getString(2)}")
    // a genuine unit vector renders its scale on the hot axis
    val scale = graft.functions.EmbeddingFunctions.Scale.toLong
    assert(rows(1).getString(2) == s"$scale,0,0,0")
  }
}
