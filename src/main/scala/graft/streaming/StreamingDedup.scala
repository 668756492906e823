package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate candidate mining: the incremental twin of
  * `Dedup.lshCandidatePairs` for a corpus that arrives as a stream (the
  * ingest side of a training-data pipeline, where waiting for a full batch
  * re-clustering per drop is the thing to avoid).
  *
  * Shape: the same narrow codegen'd projection as batch (native minhash
  * signature → 4×16-hex band keys), then ONE hash partition on (band, key)
  * into `flatMapGroupsWithState` whose per-bucket state is the member list
  * `(doc_id, carry)` capped at `maxBucket` — so state per key is bounded by
  * the same constant that bounds batch bucket work, and a new arrival emits
  * pairs against current members bucket-locally (never all-pairs).
  *
  * Pairs are born unique EXACTLY as in batch: a pair is emitted only from
  * its FIRST matching band, decided from the two carries alone
  * (`bandKey(a, b') == bandKey(b, b')` for any earlier band b'), so a pair
  * whose earliest shared band lives in some other bucket is suppressed
  * here — no cross-bucket dedup pass, no retraction, and the emitted set
  * equals batch `lshCandidatePairs` whenever no bucket exceeds the cap
  * (StreamingDedupSpec pins the equality).
  *
  * Documented divergence under the cap: batch drops an over-cap bucket
  * RETROACTIVELY (it sees the final size; zero pairs emitted), while a
  * stream cannot retract — this operator stops ADMITTING members once a
  * bucket is full, so pairs among the first `maxBucket` arrivals survive.
  * Same bounded-work guarantee, prospective instead of retrospective.
  *
  * State lifetime: candidate mining wants bucket membership for the whole
  * corpus ingest, so the default keeps state until the query ends
  * (NoTimeout) — bounded at maxBucket × key-cardinality like the batch
  * shuffle. A TTL'd deployment (continuous ingest over an unbounded
  * corpus) would add a watermark + EventTimeTimeout exactly like
  * [[Sessionize]]; the admission/emission logic is unchanged.
  */
object StreamingDedup {

  final case class BandArrival(doc_id: Long, ak: String, band: Int, key: String)
  final case class BucketState(members: List[(Long, String)])
  final case class CandPair(id_a: Long, id_b: Long)

  private val Bands = 4

  /** 16-hex band-b key of the 64-hex minhash key-concat carry. */
  private def bandKeyOf(ak: String, b: Int): String = ak.substring(16 * b, 16 * b + 16)

  /** docs: a (possibly streaming) DataFrame with `doc_id` and a text
    * column. Emits candidate pairs (id_a < id_b) incrementally.
    */
  def lshCandidatePairsStream(docs: DataFrame, textCol: String = "text",
      shingleK: Int = 3, maxBucket: Int = Dedup.MaxBucket): Dataset[CandPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bandRows = docs
      .withColumn("__mhs",
        graft.plans.MinhashSigExpr.minhashSig8Native(col(textCol), shingleK))
      .select(col("doc_id").cast("long").as("doc_id"),
        concat((1 to 8).map(j => element_at(col("__mhs"), j)): _*).as("ak"))
      // NULL signature (sub-k-word doc) → no band rows; when-gated
      // posexplode, same as batch (never filter on the expensive expr)
      .select(col("doc_id"), col("ak"),
        posexplode(when(col("ak").isNotNull,
          array((0 until Bands).map(b => substring(col("ak"), 16 * b + 1, 16)): _*)))
          .as(Seq("band", "key")))
      .as[BandArrival]

    bandRows.groupByKey(r => (r.band, r.key))
      .flatMapGroupsWithState[BucketState, CandPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((band, _), rows, state: GroupState[BucketState]) =>
          var members = state.getOption.map(_.members).getOrElse(Nil)
          val out = Seq.newBuilder[CandPair]
          // sort the micro-batch slice for deterministic admission under
          // the cap (batch sorts bucket structs the same way)
          rows.toSeq.sortBy(r => (r.doc_id, r.ak)).foreach { r =>
            if (members.size < maxBucket && !members.exists(_._1 == r.doc_id)) {
              members.foreach { case (mid, mak) =>
                // first-match emission: suppress if any EARLIER band also
                // matches — that band's bucket owns this pair
                val earlier = (0 until band).exists(b =>
                  bandKeyOf(mak, b) == bandKeyOf(r.ak, b))
                if (!earlier)
                  out += CandPair(math.min(mid, r.doc_id), math.max(mid, r.doc_id))
              }
              members = (r.doc_id, r.ak) :: members
            }
          }
          state.update(BucketState(members))
          out.result().iterator
      }
  }
}
