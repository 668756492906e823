package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
import graft.functions.EmbeddingFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a large-scale training-data pipeline: exact
  * (hash-groupBy), MinHash signatures, banded-LSH candidate pairs, SimHash,
  * n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design: signatures/fingerprints are computed as narrow codegen'd
  * projections (no shuffle, no UDF); the only shuffles are the final
  * group-by-hash or bucket-join, which key on short fixed-width strings. At
  * 100 TB the LSH band join replaces the quadratic all-pairs comparison with
  * a bucket-local one, and the same-source blocking in the Jaccard op is the
  * classic blocking-key pattern.
  */
object Dedup {

  /** Exact dedup: group documents by content hash; keeper = min doc_id.
    * (At 100 TB: one shuffle on a 32-char key, partial-agg'd map-side.)
    */
  def qDedupExact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper"))
      .orderBy(col("content_hash"))

  val qDedupExactSql: String =
    """SELECT md5(text) AS content_hash, count(*) AS n_copies,
      |  min(doc_id) AS keeper
      |FROM documents
      |GROUP BY 1
      |ORDER BY content_hash""".stripMargin

  private val ShingleK = 3

  /** Per-doc 8-slot minhash columns via the native Catalyst expression
    * (graft.plans.MinhashSigExpr — one compiled loop, 2 md5 calls per
    * shingle, no intermediate arrays). Values identical to the declarative
    * TextFunctions.minhashSig8(shingles(words(text), k)) and to the oracle.
    */
  private def withMinhashes(d: DataFrame): DataFrame = {
    val base = d.withColumn("mhs",
      graft.plans.MinhashSigExpr.minhashSig8Native(col("text"), ShingleK))
    (0 until 8).foldLeft(base) { (df, j) =>
      df.withColumn(s"mh$j", element_at(col("mhs"), j + 1))
    }
  }

  private val minhashCte: String = {
    val sh = shinglesSql("ws", ShingleK)
    val slots = (0 until 8).map { j =>
      s"${minhashSlotSql(if (j < 4) "h0" else "h1", j % 4)} AS mh$j"
    }.mkString(", ")
    s"""m AS (
       |  SELECT doc_id, $slots
       |  FROM (SELECT doc_id, ${md5ArraySql("sh", 0)} AS h0, ${md5ArraySql("sh", 1)} AS h1
       |        FROM (SELECT doc_id, $sh AS sh
       |              FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))))""".stripMargin
  }

  /** Per-document MinHash signature (8 hash slots over 3-word shingles).
    * Sorted BEFORE the signature projection: orderBy-after would make the
    * range partitioner's sampling pass execute the md5 fold twice.
    */
  def qMinhashSignature(s: SparkSession, dir: String): DataFrame = {
    val sig = concat_ws("|", (0 until 8).map(j => col(s"mh$j")): _*)
    withMinhashes(Tables.documents(s, dir).orderBy(col("doc_id")))
      .select(col("doc_id"), sig.as("minhash_sig"))
  }

  val qMinhashSignatureSql: String =
    s"""WITH $minhashCte
       |SELECT doc_id, concat_ws('|', ${(0 until 8).map(j => s"mh$j").mkString(", ")}) AS minhash_sig
       |FROM m
       |ORDER BY doc_id""".stripMargin

  /** Banded LSH: 8 minhash slots -> 4 bands of 2; docs sharing a band key
    * are candidate near-duplicates. The band explode is a narrow generate;
    * the candidate search is an equi-join on (band, key) — bucket-local,
    * never all-pairs.
    */
  def qLshCandidates(s: SparkSession, dir: String): DataFrame = {
    val d = withMinhashes(Tables.documents(s, dir))
    val bands = array((0 until 4).map { b =>
      struct(lit(b).as("band"),
        concat(col(s"mh${2 * b}"), col(s"mh${2 * b + 1}")).as("key"))
    }: _*)
    val exploded = d.select(col("doc_id"), explode(bands).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    // Bucket-collect instead of a self-join: one signature computation, one
    // shuffle on (band, key); within-bucket pairs are generated from the
    // (tiny) sorted doc list.
    val bucketed = exploded.groupBy(col("band"), col("key"))
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
      .filter(size(col("docs")) > 1)
    bucketed
      .select(explode(flatten(transform(col("docs"), (x, i) =>
        transform(slice(col("docs"), i + lit(2), size(col("docs"))),
          y => struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val qLshCandidatesSql: String = {
    val bandRows = (0 until 4).map { b =>
      s"SELECT doc_id, $b AS band, mh${2 * b} || mh${2 * b + 1} AS key FROM m"
    }.mkString("\n  UNION ALL ")
    s"""WITH $minhashCte,
       |bands AS ($bandRows)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Per-document 16-bit SimHash (majority vote over word-hash bits).
    * Sort-before-project: see qMinhashSignature.
    */
  def qSimhash(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).orderBy(col("doc_id"))
      .select(col("doc_id"), simhash16(words(col("text"))).as("simhash"))

  /** Full-width 64-bit SimHash via the native expression
    * (graft.plans.SimhashExpr: one compiled loop, one md5 per word).
    */
  def qSimhash64(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).orderBy(col("doc_id"))
      .select(col("doc_id"),
        graft.plans.SimhashExpr.simhash64(col("text")).as("simhash64"))

  val qSimhash64Sql: String =
    s"""SELECT doc_id, ${graft.plans.SimhashExpr.simhash64Sql("string_split(text, ' ')")} AS simhash64
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  val qSimhashSql: String =
    s"""SELECT doc_id, ${simhash16Sql("string_split(text, ' ')")} AS simhash
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  /** SimHash near-dup candidates: band the 64-bit signature into 4x16-bit
    * keys — any pair within hamming distance 3 shares at least one band
    * (pigeonhole), so the quadratic comparison collapses to 4 equi-joins.
    * Exact hamming via bit_count(xor) on the candidates only.
    */
  def qSimhashPairs(s: SparkSession, dir: String): DataFrame = {
    val sigs = Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.plans.SimhashExpr.simhash64(col("text")).as("sig"))
    val bands = sigs.select(col("doc_id"), col("sig"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("sig"), 16 * b).bitwiseAND(lit(0xFFFFL)).as("key"))
        }: _*)).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band").as("band"), col("bk.key").as("key"))
    val a = bands.as("a"); val b = bands.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 16)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val qSimhashPairsSql: String = {
    val sig = graft.plans.SimhashExpr.simhash64Sql("string_split(text, ' ')")
    val bandRows = (0 until 4).map { b =>
      s"SELECT doc_id, sig, $b AS band, (sig >> ${16 * b}) & 65535 AS key FROM sigs"
    }.mkString("\n  UNION ALL ")
    s"""WITH sigs AS (SELECT doc_id, $sig AS sig FROM documents),
       |bands AS ($bandRows)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  bit_count(xor(a.sig, b.sig)) AS hamming
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= 16
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** n-gram Jaccard similarity for same-source candidate pairs (blocking-key
    * join). inter/union are exact ints; jaccard is one division.
    */
  def qJaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        array_distinct(shingles(words(col("text")), ShingleK)).as("sh"))
    val sizes = d.select(col("doc_id"), size(col("sh")).as("n"))
    val ex = d.select(col("doc_id"), col("source"), explode(col("sh")).as("g"))
    val a = ex.as("a"); val b = ex.as("b")
    val inter = a.join(b, col("a.g") === col("b.g") && col("a.source") === col("b.source")
        && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("inter") / (col("sa.n") + col("sb.n") - col("inter"))).as("jaccard"))
      .filter(col("inter") >= 2)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val qJaccardPairsSql: String = {
    val sh = shinglesSql("ws", ShingleK)
    s"""WITH d AS (SELECT doc_id, source, list_distinct($sh) AS sh
       |           FROM (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents)),
       |sizes AS (SELECT doc_id, len(sh) AS n FROM d),
       |ex AS (SELECT doc_id, source, unnest(sh) AS g FROM d),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM ex a JOIN ex b ON a.g = b.g AND a.source = b.source AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, inter,
       |  inter / (sa.n + sb.n - inter) AS jaccard
       |FROM inter
       |JOIN sizes sa ON doc_a = sa.doc_id
       |JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE inter >= 2
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Embedding-cosine near-dup: same-label blocking, exact scaled-int cosine.
    */
  def qEmbeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val a = e.as("a"); val b = e.as("b")
    a.join(b, col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.label").as("label"),
        cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .filter(col("cos") > 0.3)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val qEmbeddingNearDupSql: String =
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
       |  ${cosineSql("a.embedding", "b.embedding")} AS cos
       |FROM embeddings a JOIN embeddings b
       |  ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE ${cosineSql("a.embedding", "b.embedding")} > 0.3
       |ORDER BY vec_a, vec_b""".stripMargin

  val entries: Seq[QueryDef] = Seq(
    QueryDef("q_dedup_exact", qDedupExact, Some(qDedupExactSql), bench = true),
    QueryDef("q_dedup_minhash_sig", qMinhashSignature, Some(qMinhashSignatureSql), bench = true),
    QueryDef("q_dedup_lsh_candidates", qLshCandidates, Some(qLshCandidatesSql), bench = true),
    QueryDef("q_dedup_simhash", qSimhash, Some(qSimhashSql)),
    QueryDef("q_dedup_simhash64", qSimhash64, Some(qSimhash64Sql)),
    QueryDef("q_dedup_simhash_pairs", qSimhashPairs, Some(qSimhashPairsSql)),
    QueryDef("q_dedup_jaccard_pairs", qJaccardPairs, Some(qJaccardPairsSql)),
    QueryDef("q_dedup_embedding_neardup", qEmbeddingNearDup, Some(qEmbeddingNearDupSql)),
  )
}
