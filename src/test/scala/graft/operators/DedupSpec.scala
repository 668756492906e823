package graft.operators

import graft.vpts.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew-safety invariant for the banded-LSH pair generators: a degenerate
  * hot bucket (mass-duplicate text -> one (band, key) bucket with B >>
  * MaxBucket ids, which would emit B(B-1)/2 pairs) is dropped entirely,
  * while ordinary small clusters still produce their pairs.
  */
class DedupSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  test("lsh candidate buckets are capped: hot bucket dropped, small cluster kept") {
    import spark.implicits._
    val hotText = "the same boilerplate text repeated verbatim in every row of this cluster"
    val dupText = "a small near duplicate cluster with its own distinct shingle stream here"
    val hot = (0L until 200L).map(i => (i, hotText))
    val small = (1000L until 1003L).map(i => (i, dupText))
    val dir = java.nio.file.Files.createTempDirectory("dedup-cap").toString
    (hot ++ small).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val pairs = Dedup.qLshCandidates(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    // the 200-dup bucket exceeds MaxBucket in every band -> zero pairs from it
    assert(pairs.forall { case (a, b) => a >= 1000L && b >= 1000L },
      s"hot-bucket pair leaked: ${pairs.filter(_._1 < 1000L).take(5).toSeq}")
    // the 3-doc cluster is within the cap -> all 3 ordered pairs present
    assert(pairs.toSet == Set((1000L, 1001L), (1000L, 1002L), (1001L, 1002L)))
    // global bound: no bucket may contribute more than MaxBucket^2/2 pairs
    assert(pairs.length <= Dedup.MaxBucket * (Dedup.MaxBucket - 1) / 2)
  }

  test("segment dedup drops only corpus-frequent segments and preserves word order") {
    import spark.implicits._
    // 'alpha beta gamma' appears (as a whole segment) in 4 docs -> boilerplate;
    // every other 3-word segment is unique -> kept verbatim in order
    val boiler = "alpha beta gamma"
    val docs = Seq(
      (1L, s"$boiler one two three four five six"),
      (2L, s"$boiler seven eight nine"),
      (3L, s"$boiler ten eleven twelve"),
      (4L, boiler), // every segment boilerplate -> survives with empty text
      (5L, "unique words only in this document right here")).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, w = 3, maxOcc = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((3L, 2L, "one two three four five six")))
    assert(out(2L) == ((2L, 1L, "seven eight nine")))
    assert(out(4L) == ((1L, 0L, ""))) // fully-boilerplate doc keeps its row
    assert(out(5L) == ((3L, 3L, "unique words only in this document right here")))
    // reassembly is the identity when nothing is dropped
    val ident = Dedup.segmentDedup(docs, w = 3, maxOcc = 100)
      .join(docs, Seq("doc_id"))
      .filter(col("clean_text") =!= col("text")).count()
    assert(ident == 0)
  }

  test("segment dedup: empty and whitespace-only docs keep their row (twin parity, both regimes)") {
    import spark.implicits._
    // split(' ', -1) keeps empty tokens exactly like DuckDB string_split:
    // '' -> [''] -> 1 segment '' ; ' ' -> ['',''] -> 1 segment ' '.
    // Neither segment recurs > maxOcc times here, so both are KEPT.
    for (cap <- Seq(4 << 20, 0)) { // broadcast regime, then join regime
      val docs = Seq(
        (1L, ""),
        (2L, " "),
        (3L, "regular words here")).toDF("doc_id", "text")
      val out = Dedup.segmentDedup(docs, w = 3, maxOcc = 2, broadcastMaxSet = cap)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(out.keySet == Set(1L, 2L, 3L), s"a doc vanished from the output (cap=$cap)")
      assert(out(1L) == ((1L, 1L, "")), s"cap=$cap")
      assert(out(2L) == ((1L, 1L, " ")), s"cap=$cap")
      assert(out(3L) == ((1L, 1L, "regular words here")), s"cap=$cap")
      // and when the empty segment IS corpus-frequent it drops like any other
      val many = (1L to 5L).map(i => (i, "")).toDF("doc_id", "text")
      val dropped = Dedup.segmentDedup(many, w = 3, maxOcc = 2, broadcastMaxSet = cap)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
      assert(dropped.length == 5 && dropped.forall(_ == ((1L, 0L, ""))), s"cap=$cap")
    }
  }

  test("segment dedup: broadcast and join regimes agree row-for-row on real docs") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val bcast = Dedup.segmentDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val joined = Dedup.segmentDedup(docs, broadcastMaxSet = 0).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(bcast == joined)
    assert(bcast.nonEmpty)
    // an undersized cap (1) must flip to the join regime, not truncate the set
    val capped = Dedup.segmentDedup(docs, broadcastMaxSet = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(capped == joined, "tiny broadcast cap must fall back, never truncate")
  }

  test("repeated spans: overlapping windows merge into maximal spans at any alignment") {
    import spark.implicits._
    // docs 1 and 2 share a 7-word passage at DIFFERENT word offsets (1 vs
    // 3) — exactly the case fixed segment boundaries miss; doc 3 is clean
    val passage = "lorem ipsum dolor sit amet consectetur adipiscing"
    val docs = Seq(
      (1L, s"intro $passage tail one"),
      (2L, s"a b c $passage"),
      (3L, "completely different words that never repeat anywhere else")
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs, k = 5, maxOcc = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // passage = 7 words -> 3 overlapping 5-windows; doc1 words 1..7,
    // doc2 words 3..9; each doc gets ONE merged span with 3 windows
    assert(spans == Set((1L, 1L, 7L, 3L), (2L, 3L, 9L, 3L)), s"got $spans")
    // within-doc repetition counts toward the occurrence threshold
    val selfRep = Seq((9L, "x y z q r extra words x y z q r")).toDF("doc_id", "text")
    val got = Dedup.repeatedSpans(selfRep, k = 5, maxOcc = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 4L), (7L, 11L)), s"got $got")
    // EXACTLY-abutting coverage merges: doc 20's flagged windows cover
    // [0,4] and [5,9] with no overlap and no gap -> ONE maximal span
    val abut = Seq(
      (20L, "a1 a2 a3 a4 a5 b1 b2 b3 b4 b5"),
      (21L, "a1 a2 a3 a4 a5 z1 z2 z3 z4"),
      (22L, "q1 q2 q3 q4 b1 b2 b3 b4 b5")).toDF("doc_id", "text")
    val merged = Dedup.repeatedSpans(abut, k = 5, maxOcc = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(merged == Set((20L, 0L, 9L, 2L), (21L, 0L, 4L, 1L), (22L, 4L, 8L, 1L)),
      s"got $merged")
  }

  test("suffix LRS: exact lengths, finds a short planted dup the k=5 windows miss, cap clamps") {
    import spark.implicits._
    // docs 1 and 2 share EXACTLY 4 words ("p1 p2 p3 p4") — below the
    // spans operator's k=5 window width, so the windowed form is blind
    // to it; the suffix form at minLen=4 reports it with its exact length
    val docs = Seq(
      (1L, "a b c p1 p2 p3 p4 d e f g h"),
      (2L, "x y p1 p2 p3 p4 z w v u"),
      (3L, "nothing here repeats anywhere else at all")).toDF("doc_id", "text")
    val winSpans = Dedup.repeatedSpans(docs, k = 5, maxOcc = 1).collect()
    assert(winSpans.isEmpty, s"k=5 windows should miss the 4-word dup: ${winSpans.toSeq}")
    val lrs = Dedup.suffixMatchLens(docs, minLen = 4, cap = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(lrs == Set((1L, 3L, 4L), (2L, 2L, 4L)), s"got $lrs")

    // exact attribution: a 7-word planted passage decays 7,6,5,4 as the
    // start slides right — the per-position TRUE maximal extent, which
    // window marking cannot attribute (it only knows "covered")
    val passage = "lorem ipsum dolor sit amet consectetur adipiscing"
    val exact = Seq(
      (10L, s"intro $passage tail one"),
      (11L, s"a b c $passage")).toDF("doc_id", "text")
    val got = Dedup.suffixMatchLens(exact, minLen = 4, cap = 32)
      .filter(col("doc_id") === 10L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 7L), (2L, 6L), (3L, 5L), (4L, 4L)), s"got $got")

    // cap clamps: two identical 12-word docs at cap=8 report 8 at pos 0
    val long = Seq(
      (20L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
      (21L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12")).toDF("doc_id", "text")
    val capped = Dedup.suffixMatchLens(long, minLen = 4, cap = 8)
      .filter(col("doc_id") === 20L && col("pos") === 0L)
      .collect().map(_.getLong(2)).toSeq
    assert(capped == Seq(8L), s"got $capped")

    // within-doc self-repeat counts: "r1 r2 r3 r4" twice in one doc
    val self = Seq((30L, "r1 r2 r3 r4 mid fill words r1 r2 r3 r4")).toDF("doc_id", "text")
    val selfGot = Dedup.suffixMatchLens(self, minLen = 4, cap = 32)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(selfGot == Set((0L, 4L), (7L, 4L)), s"got $selfGot")
  }

  test("suffix LRS equals the brute-force quadratic reference on a randomized corpus") {
    import spark.implicits._
    // deterministic pseudo-random corpus over a small vocabulary so
    // repeats occur at many lengths and alignments
    val rnd = new java.util.Random(7)
    val vocab = Array("a", "b", "c", "d", "e")
    val docs = (0L until 25L).map { id =>
      val n = 5 + rnd.nextInt(20)
      (id, Array.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val (minLen, cap) = (3, 6)
    // O((n·len)^2) reference: per position, max word-LCP against every
    // other position, capped
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1) }
    val positions = for ((id, w) <- toks; p <- w.indices) yield (id, p, w)
    def lcpAt(a: Array[String], i: Int, b: Array[String], j: Int): Int = {
      var l = 0
      while (l < cap && i + l < a.length && j + l < b.length && a(i + l) == b(j + l)) l += 1
      l
    }
    val expect = positions.flatMap { case (id, p, w) =>
      val best = positions.collect {
        case (id2, p2, w2) if (id2, p2) != (id, p) => lcpAt(w, p, w2, p2)
      }.max
      if (best >= minLen) Some((id, p.toLong, best.toLong)) else None
    }.toSet
    val got = Dedup.suffixMatchLens(docs.toDF("doc_id", "text"), minLen, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
    assert(expect.nonEmpty, "fixture produced no repeats — vocabulary too large")
  }

  test("suffix LRS: a degenerate boilerplate gram routes through the range-sorted path unchanged") {
    import spark.implicits._
    // 1500 copies of one 8-token disclaimer (distinct tokens, so no
    // within-boilerplate self-similarity muddies the expectation) + a
    // unique 2-token tail per doc: every all-boilerplate 5-gram occurs
    // 1500 times — far past any sane window-group cap
    val boiler = "standard legal disclaimer applies to this document entirely"
    val docs = (0L until 1500L)
      .map(i => (i, s"$boiler unique$i tail$i")).toDF("doc_id", "text")
    def run(degenCap: Int): Set[(Long, Long, Long)] =
      Dedup.suffixMatchLens(docs, minLen = 5, cap = 32, degenCap = degenCap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaWindow = run(Int.MaxValue) // everything through the window path
    val viaSorted = run(8) // the 1500-occ grams through the sorted walk
    assert(viaSorted == viaWindow,
      s"paths diverge: ${viaSorted.diff(viaWindow).take(3)} extra, " +
        s"${viaWindow.diff(viaSorted).take(3)} missing")
    // analytic expectation: a suffix at boilerplate offset p (0..3 carry
    // an all-boilerplate 5-gram) matches every other doc's same-offset
    // suffix for the remaining 8-p disclaimer tokens, and nothing longer
    val expect = (for (i <- 0L until 1500L; p <- 0 to 3)
      yield (i, p.toLong, (8 - p).toLong)).toSet
    assert(viaSorted == expect,
      s"missing=${(expect -- viaSorted).take(3)} extra=${(viaSorted -- expect).take(3)}")
  }

  test("prefix-doubling LRS: uncapped lengths equal a no-cap brute force; the cap is gone") {
    import spark.implicits._
    // a planted 40-token repeat — past the capped form's 32 — plus noise
    // docs with shorter repeats at several lengths and full-dup docs
    // (the identical-suffix plateau path)
    val run40 = (1 to 40).map(i => s"r$i").mkString(" ")
    val rnd = new java.util.Random(11)
    val vocab = Array("a", "b", "c", "d")
    val noise = (100L until 115L).map { id =>
      val n = 6 + rnd.nextInt(18)
      (id, Array.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val docs = (Seq(
      (1L, s"intro $run40 tail one"),
      (2L, s"x y z $run40 other end"),
      (3L, "dup dup body exactly equal here now"),
      (4L, "dup dup body exactly equal here now")) ++ noise)
      .toDF("doc_id", "text")
    val minLen = 3
    // UNCAPPED brute force: per position, max word-LCP vs every other
    val toks = docs.collect().map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val positions = for ((id, w) <- toks.toSeq; p <- w.indices) yield (id, p, w)
    def lcpAt(a: Array[String], i: Int, b: Array[String], j: Int): Int = {
      var l = 0
      while (i + l < a.length && j + l < b.length && a(i + l) == b(j + l)) l += 1
      l
    }
    val expect = positions.flatMap { case (id, p, w) =>
      val best = positions.collect {
        case (id2, p2, w2) if (id2, p2) != (id, p) => lcpAt(w, p, w2, p2)
      }.max
      if (best >= minLen) Some((id, p.toLong, best.toLong)) else None
    }.toSet
    val got = Dedup.suffixMatchLensFull(docs, minLen)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
    // the planted repeat reports its TRUE 40 at the run start — the
    // capped form clamps the same row to 32
    assert(got.contains((1L, 1L, 40L)), s"40-token repeat not exact: $got")
    val capped = Dedup.suffixMatchLens(docs, minLen, cap = 32)
      .filter(col("doc_id") === 1L && col("pos") === 1L)
      .collect().map(_.getLong(2)).toSeq
    assert(capped == Seq(32L), s"capped form should clamp to 32, got $capped")
    // full-dup docs: every position matches to end-of-doc (plateau path)
    assert(got.contains((3L, 0L, 7L)) && got.contains((4L, 2L, 5L)), s"$got")
  }

  test("boilerplate mask: merged repeated intervals, full-dup docs mask 100%") {
    import spark.implicits._
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      // the 10-token disclaimer at both ends, unique middle: two islands
      (1L, s"$boiler u1 u2 u3 u4 $boiler"),
      (2L, s"start $boiler mid1 mid2 $boiler"),
      (3L, "totally unique words with no repeats at all whatsoever"),
      (4L, "dup dup full body equal here"),
      (5L, "dup dup full body equal here")).toDF("doc_id", "text")
    val got = Dedup.boilerplateMask(docs, minLen = 5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // doc 1: 24 tokens, islands [0,10) and [14,24) -> 20 boiler tokens
    assert(got(0) == (1L, 24L, 20L, 2L, 20L * 1000000 / 24), s"${got(0)}")
    // doc 2: 23 tokens, islands [1,11) and [13,23) -> 20
    assert(got(1) == (2L, 23L, 20L, 2L, 20L * 1000000 / 23), s"${got(1)}")
    // doc 3: nothing repeats -> zeros
    assert(got(2) == (3L, 9L, 0L, 0L, 0L), s"${got(2)}")
    // docs 4/5: exact duplicates -> one island covering everything
    assert(got(3) == (4L, 6L, 6L, 1L, 1000000L), s"${got(3)}")
    assert(got(4) == (5L, 6L, 6L, 1L, 1000000L), s"${got(4)}")
    // the strip form applies the mask: kept tokens re-assemble in
    // position order; full-dup docs strip to EMPTY
    val stripped = Dedup.boilerplateStrip(docs, minLen = 5)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(stripped(0) == (1L, "u1 u2 u3 u4"), s"${stripped(0)}")
    assert(stripped(1) == (2L, "start mid1 mid2"), s"${stripped(1)}")
    assert(stripped(2)._2 ==
      "totally unique words with no repeats at all whatsoever", s"${stripped(2)}")
    assert(stripped(3) == (4L, "") && stripped(4) == (5L, ""), s"$stripped")
  }

  test("span clusters: docs chain through shared passages; sub-threshold shares stay apart") {
    import spark.implicits._
    // two distinct >=20-token passages; A-B share p1, B-C share p2 (so
    // {A,B,C} must chain transitively through B), D-E share p3; F shares
    // only a 6-token fragment with A (over the 5-token suffix floor,
    // under the 20-token span threshold) and must stay a singleton
    def toks(pfx: String, n: Int): String = (0 until n).map(i => s"$pfx$i").mkString(" ")
    val p1 = toks("alpha", 25)
    val p2 = toks("beta", 25)
    val p3 = toks("gamma", 25)
    val frag = toks("alpha", 6) // prefix of p1: a 6-token shared run
    val docs = Seq(
      (0L, s"${toks("fa", 30)} $p1"), // A
      (1L, s"$p1 ${toks("fb", 10)} $p2"), // B (richest of its cluster)
      (2L, s"$p2 ${toks("fc", 30)}"), // C
      (3L, s"${toks("fd", 8)} $p3"), // D
      (4L, s"$p3 ${toks("fe", 40)}"), // E (richest)
      (5L, s"${toks("ff", 12)} $frag ${toks("fg", 12)}") // F
    ).toDF("doc_id", "text")
    val labels = Dedup.spanSharingClusters(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(0L) == 0L && labels(1L) == 0L && labels(2L) == 0L,
      s"A,B,C should chain into component 0: $labels")
    assert(labels(3L) == 3L && labels(4L) == 3L,
      s"D,E should form component 3: $labels")
    assert(labels(5L) == 5L,
      s"F's 6-token fragment is below the ${Dedup.SpanShareMin}-token span threshold: $labels")
  }

  test("incremental dedup: existing wins, batch order breaks new-new ties, pruning changes nothing") {
    import spark.implicits._
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val other = "one two three four five six seven eight nine ten eleven"
    val unique = "unique words that match nothing else in this corpus here"
    val existing = Seq((10L, text), (11L, other)).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, text),    // dups an EXISTING doc (larger id!) -> dropped
      (2L, unique),  // novel -> kept
      (3L, unique),  // dups incoming id 2 -> dropped (smaller new id wins)
      (4L, "tiny")   // sub-k words, no signature -> kept
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalKept(existing, incoming, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L), s"got $kept")
    // an empty batch keeps nothing and never touches the corpus
    val none = Dedup.incrementalKept(existing,
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text")
    assert(none.count() == 0)
    // idempotence: re-ingesting the accepted batch against existing+accepted drops all
    val accepted = incoming.filter(col("doc_id").isin(2L, 4L))
    val again = Dedup.incrementalKept(
      existing.unionByName(accepted), accepted.select(
        (col("doc_id") + 100).as("doc_id"), col("text")), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // doc 102 (copy of 2) collides with accepted 2 -> dropped; 104 is
    // sub-k words (no signature) so it is kept again by design
    assert(again == Set(104L), s"got $again")
  }

  test("semantic dedup: drops only same-cluster near-dups, keepers are smaller ids") {
    import org.apache.spark.sql.functions.{col, min}
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dropped = Dedup.semanticDropList(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(dropped.nonEmpty, "no semantic dups found — fixture degenerate?")
    val assigned = graft.operators.Similarity.labelCentroidAssign(e)
      .select(col("vec_id"), col("assigned"))
      .collect().map(r => r.getLong(0) -> r.get(1).toString).toMap
    dropped.foreach { case (v, k, cos) =>
      assert(k < v, s"keeper $k not smaller than dropped $v")
      assert(cos > 0.3, s"pair ($k,$v) below threshold: $cos")
      assert(assigned(k) == assigned(v),
        s"cross-cluster drop: $k in ${assigned(k)}, $v in ${assigned(v)}")
    }
    // the globally smallest vec_id can never be dropped (no smaller keeper
    // exists) — the drop relation always points toward smaller ids
    val minVec = e.agg(min(col("vec_id"))).head().getLong(0)
    assert(!dropped.map(_._1).contains(minVec))
    // determinism
    val again = Dedup.semanticDropList(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(again == dropped.toSet)
  }

  test("sub-k-word docs (null minhash) never pair with each other") {
    // two docs shorter than ShingleK words have NULL signatures; a
    // null-keyed groupBy bucket would pair them (and diverge from the
    // oracle's null-dropping join) — they must produce no candidates
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dedup-null").toString
    Seq((1L, "too short"), (2L, "also short"), (3L, "ok length document here with words"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(Dedup.qLshCandidates(spark, dir).count() == 0)
    assert(Dedup.qDedupComponents(spark, dir).count() == 0)
  }

  test("component labels are transitive across candidate chains") {
    // three identical docs pair with each other (a chain suffices); all
    // must land in one component labeled by the smallest id
    import spark.implicits._
    val dup = "one more shared duplicate passage that minhashes identically in all copies"
    val solo = "completely different content that belongs to no cluster at all"
    val dir = java.nio.file.Files.createTempDirectory("dedup-cc").toString
    (Seq((5L, dup), (9L, dup), (11L, dup), (20L, solo)))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val comps = Dedup.qDedupComponents(spark, dir).collect()
    assert(comps.length == 1)
    assert(comps.head.getLong(0) == 5L)       // component = min id
    assert(comps.head.getLong(1) == 3L)       // all three members
    assert(comps.head.getString(2) == "5,9,11")
  }

  test("large-star/small-star clusters a diameter-5 chain into one component") {
    // a path graph 1-2-3-4-5-6 (diameter 5) provably splits under the old
    // fixed 3-round min-label propagation; the converged alternation must
    // produce ONE component labeled by the minimum
    import spark.implicits._
    val ids = (1L to 6L).toDF("id")
    val chain = (1L to 5L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = Dedup.componentLabels(ids, "id", chain, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels == (1L to 6L).map(_ -> 1L).toMap)

    // two components + a singleton, fed in reversed/mixed edge order
    val ids2 = (1L to 7L).toDF("id")
    val edges2 = Seq((4L, 3L), (1L, 2L), (6L, 5L), (3L, 2L)).toDF("a", "b")
    val labels2 = Dedup.componentLabels(ids2, "id", edges2, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels2 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("parameterized library API: maxBucket and threshold are real knobs") {
    import spark.implicits._
    val dup = "a small near duplicate cluster with its own distinct shingle stream here"
    val docs = ((0L until 3L).map(i => (i, dup)) :+ (9L, "something else entirely with different words"))
      .toDF("doc_id", "text")
    // default cap keeps the 3-doc cluster's 3 pairs; maxBucket=2 drops it
    val std = Dedup.lshCandidatePairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(std == Set((0L, 1L), (0L, 2L), (1L, 2L)))
    assert(Dedup.lshCandidatePairs(docs, "doc_id", "text", maxBucket = 2).count() == 0)
    // embedding near-dup: a looser cosine threshold can only widen the set
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val strict = Dedup.embeddingNearDupPairs(e, "vec_id", "embedding", threshold = 0.4).count()
    val loose = Dedup.embeddingNearDupPairs(e, "vec_id", "embedding", threshold = 0.1).count()
    assert(loose >= strict)
  }

  test("a pair whose FIRST matching band is a capped hot bucket stays dropped (both formulations)") {
    // Locks the deliberate recall trade of first-match emission under the
    // MaxBucket cap: docs 1,2 share band-0 key "HHHH" (a hot bucket, 70 >
    // MaxBucket members) AND band-1 key "ssss" (a 2-member bucket). Their
    // first matching band is 0, whose bucket is dropped — the band-1
    // emission must NOT resurrect the pair. Control docs 3,4 match only in
    // band 1 and must survive. Asserted against BOTH the Spark bucketPairs
    // operator and the oracle twin's CTE (candCteSql is ANSI window SQL,
    // runnable by Spark itself), so the two formulations cannot drift.
    import spark.implicits._
    val hot = (10L until 78L).map(i => (i, f"HHHH$i%04d"))
    val docs = (Seq((1L, "HHHHssss"), (2L, "HHHHssss"),
      (3L, "AAAAtttt"), (4L, "BBBBtttt")) ++ hot).toDF("doc_id", "carry")
    val exploded = docs.select(col("doc_id"), col("carry"),
      posexplode(array(substring(col("carry"), 1, 4), substring(col("carry"), 5, 4)))
        .as(Seq("band", "key")))
    def bandMatch(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column, bn: Int) =
      substring(a, 4 * bn + 1, 4) === substring(b, 4 * bn + 1, 4)
    val viaOperator = Dedup.bucketPairs(exploded, "doc_id", "carry", "doc_a", "doc_b", 2, bandMatch)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaOperator == Set((3L, 4L)), s"got $viaOperator")
    assert(!viaOperator.contains((1L, 2L)), "capped first-match pair resurrected by band 1")

    exploded.select(col("doc_id"), col("band"), col("key"))
      .createOrReplaceTempView("pin_bands")
    val viaSql = spark.sql(
      s"""WITH ${Dedup.candCteSql("(SELECT * FROM pin_bands)", "doc_id", "doc_a", "doc_b")}
         |SELECT doc_a, doc_b FROM cand""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSql == viaOperator, s"SQL twin diverged: $viaSql vs $viaOperator")
  }
}
