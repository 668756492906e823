package graft.operators

import graft.vpts.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PqTrainSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("Lloyd-trained PQ codebooks descend the quantization error and are deterministic") {
    val e = graft.Tables.embeddings(spark, sfDir)
    def err(iters: Int): Double = Similarity.pqQuantizationError(
      e, "vec_id", "embedding",
      Similarity.pqTrain(e, "vec_id", "embedding", k = 8, iters = iters))
    val e0 = err(0) // init codebooks: first-k subvectors
    val e1 = err(1)
    val e3 = err(3)
    // Lloyd descends (re-rounded integer means can wiggle the last ulp,
    // hence the epsilon); training must strictly beat the init books
    assert(e1 <= e0 * 1.001, s"round 1 rose: $e0 -> $e1")
    assert(e3 <= e1 * 1.001, s"round 3 rose: $e1 -> $e3")
    assert(e3 < e0 * 0.9, s"training barely moved: $e0 -> $e3")

    // bit-deterministic: training twice yields identical codebooks
    def booksSorted(): Seq[(Int, Long, Seq[Double])] =
      Similarity.pqTrain(e, "vec_id", "embedding", k = 8, iters = 2)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
        .toSeq.sortBy(t => (t._1, t._2))
    assert(booksSorted() == booksSorted())
  }

  test("pqAssign codes cover the codebook and every subspace") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val books = Similarity.pqTrain(e, "vec_id", "embedding", k = 4, iters = 2)
    val assigned = Similarity.pqAssign(
      // 4 subspaces of the 64-dim embedding
      e.select(col("vec_id").as("__id"),
        posexplode(array((0 until 4).map(j =>
          slice(graft.functions.EmbeddingFunctions.scaled(col("embedding")),
            j * 16 + 1, 16)): _*)).as(Seq("j", "subv"))),
      books)
    val rows = assigned.collect()
    val n = e.count()
    assert(rows.length == n * 4, "one code per (vector, subspace)")
    assert(rows.map(_.getInt(1)).toSet == Set(0, 1, 2, 3))
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 4))
    assert(rows.forall(_.getDouble(3) >= 0.0))
  }
}
