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
    // a = first 48 bits of md5(tok), b = next 48; h_i = a + i*b; sig_i =
    // min over tokens — all inside one projection.
    def h(i: Int): String =
      s"""array_min(transform(split(text, ' '),
         |  t -> conv(substr(md5(t), 1, 12), 16, 10) +
         |       $i * conv(substr(md5(t), 13, 12), 16, 10)))""".stripMargin
    val sigCols = (0 until K).map(i => expr(h(i)).cast("long").as(s"h$i"))
    val withSig = docs.select(col("doc_id") +: sigCols: _*)
    val bandKeys = (0 until Bands).map { b =>
      concat(lit(s"$b:"),
        md5(concat_ws(",", col(s"h${2 * b}").cast("string"),
          col(s"h${2 * b + 1}").cast("string"))))
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
