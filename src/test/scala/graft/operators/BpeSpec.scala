package graft.operators

import graft.vpts.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge learning: the distributed path (single corpus scan + vocab-table
  * merge loop) against the independent sequential reference, plus the
  * hand-computable Sennrich example and the greedy-merge edge cases.
  */
class BpeSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.functions.col

  private def learned(df: org.apache.spark.sql.DataFrame): Seq[(Int, String, String, Long)] =
    df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("hand-computed merges on the classic low/lower corpus") {
    import spark.implicits._
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val got = learned(Bpe.learnBpe(docs, 4))
    // pairs round 1: (l,o)=3 ties (o,w)=3 -> lex (l,o); then (lo,w)=3;
    // then (low,</w>)=2; then the 1-count tie breaks to (e,r)
    assert(got == Seq(
      (1, "l", "o", 3L),
      (2, "lo", "w", 3L),
      (3, "low", "</w>", 2L),
      (4, "e", "r", 1L)))
  }

  test("greedy non-overlapping merge: aaa yields [aa, a]") {
    import spark.implicits._
    // (a,a) counts every adjacent position (2 per "aaa"), but the merge is
    // greedy left-to-right: "aaa" -> [aa, a, </w>] — round 2 then ties
    // (aa,a)=3 with (a,</w>)=3 and lex order picks (a,</w>)
    val docs = Seq((1L, "aaa aaa aaa")).toDF("doc_id", "text")
    val got = learned(Bpe.learnBpe(docs, 2))
    assert(got.head == ((1, "a", "a", 6L)))
    assert(got(1) == ((2, "a", "</w>", 3L)))
    assert(got == Bpe.referenceBpe(Seq(("aaa", 3L)), 2))
  }

  test("distributed learner equals the sequential reference on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val got = learned(Bpe.learnBpe(docs, 12))
    val wc = Bpe.wordCounts(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = Bpe.referenceBpe(wc, 12)
    assert(got == want)
    assert(got.size == 12)
  }

  test("encode entry: native projection equals the sequential reference sample") {
    val got = Bpe.qBpeEncode(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got.nonEmpty)
    val staged = spark.read.parquet(Bpe.EncodeCheckDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    assert(got == staged)
    // encoding is lossless modulo the markers: stripping </w> and spaces
    // inside tokens reconstructs the original words
    got.take(20).foreach { case (id, bpe) =>
      assert(bpe.contains(Bpe.EndMark), s"doc $id lost its end markers")
    }
  }

  test("merge budget past exhaustion stops cleanly on both paths") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // "ab</w>" fully merges in 2 steps; asking for 10 must return 2
    val got = learned(Bpe.learnBpe(docs, 10))
    val want = Bpe.referenceBpe(Seq(("ab", 2L)), 10)
    assert(got == want)
    assert(got.size == 2)
  }
}
