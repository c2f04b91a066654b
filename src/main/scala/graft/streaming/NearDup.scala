package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.streaming.Stateful.{DocBand, DupCandidate}

/** End-to-end streaming near-dup detection: MinHash signatures computed
  * MAP-SIDE per document (no aggregation, so it runs on an unbounded
  * stream without watermark state), banded into LSH buckets, then the
  * keyed keeper-state detector (Stateful.nearDupCandidates) emits
  * candidate pairs as they arrive.
  *
  * The signature math mirrors the batch operator (graft.ops.Dedup.
  * dedupMinhash: one md5 per token split into two halves a/b, K hashes by
  * Kirsch-Mitzenmacher h_i = a + i·b, min over the token multiset — the
  * min over a multiset equals the min over the set). The batch form
  * explodes tokens and relies on partial aggregation; here the min runs
  * inside transform/array_min per row because a streaming explode→groupBy
  * would need per-doc shuffle state. Same values either way (NearDupSpec
  * asserts bucket parity against the batch operator).
  *
  * Scale: signature+banding is a narrow projection; the only shuffle is
  * the bucket keying, which is exactly the batch band join's key. State
  * is one long per bucket.
  */
object NearDup {

  private val K = 8
  private val Bands = 4

  /** (doc_id, text) → one DocBand row per LSH band. */
  def bands(docs: DataFrame): Dataset[DocBand] = {
    import docs.sparkSession.implicits._
    // Signature via the codegen'd MinhashSig kernel (one token-array walk
    // per doc; the previous K interpreted transform/array_min lambdas
    // walked the array K times outside codegen).
    val withSig = docs.select(col("doc_id"),
      graft.functions.MinhashSig.sig(docs.sparkSession, split(col("text"), " "), K)
        .as("sig"))
    val bandKeys = (0 until Bands).map { b =>
      concat(lit(s"$b:"),
        md5(concat_ws(",", element_at(col("sig"), 2 * b + 1).cast("string"),
          element_at(col("sig"), 2 * b + 2).cast("string"))))
    }
    withSig
      .select(col("doc_id"), explode(array(bandKeys: _*)).as("bucket"))
      .select(col("bucket"), col("doc_id"))
      .as[DocBand]
  }

  /** The full pipeline: text stream in, candidate pairs out. */
  def candidates(docs: DataFrame): Dataset[DupCandidate] =
    Stateful.nearDupCandidates(bands(docs))
}
