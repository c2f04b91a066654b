package graft.ops

import org.apache.spark.sql.functions._
import graft.core.{Q, Tables => T}

/** Multimodal-column plumbing: treat assets as opaque BINARY columns with
  * typed metadata, and run decode / feature-extract / sample as
  * distributed per-row transforms.
  *
  * The container has no image/audio codecs, so the oracle-checked query
  * exercises the real Spark-side plumbing — binary encoding, byte
  * lengths, header inspection, strided sampling — over a deterministic
  * binary column synthesized from documents.text. The decode stub proper
  * (typed metadata struct + mapPartitions batch shape, the Scala
  * equivalent of a mapInPandas decode) lives in
  * graft.functions.MultimodalDecode and is covered by ScalaTest.
  */
object Multimodal {

  /** Binary-asset feature pass: byte length, 8-byte header, and a strided
    * "frame sample" (bytes 1/17/33 — substring past end-of-blob yields ''
    * in both engines, so short assets degrade identically). Narrow
    * per-row map; nothing shuffles but the presentation sort. */
  val multimodalDecode: Q = Q(
    "q_multimodal_decode",
    """SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |  substr(hex(encode(text)), 1, 16) AS head_hex,
      |  substr(hex(encode(text)), 1, 2) || substr(hex(encode(text)), 33, 2)
      |    || substr(hex(encode(text)), 65, 2) AS frame_sample
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val bin = encode(col("text"), "UTF-8")
    val hexs = hex(bin)
    T.documents(s, d)
      .select(col("doc_id"),
        octet_length(bin).as("n_bytes"),
        substring(hexs, 1, 16).as("head_hex"),
        concat(substring(hexs, 1, 2), substring(hexs, 33, 2), substring(hexs, 65, 2))
          .as("frame_sample"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(multimodalDecode)
}
