package graft.functions

import org.apache.spark.sql.Dataset

/** Typed multimodal decode plumbing (north star "multimodal columns").
  *
  * Assets travel as opaque BINARY columns with typed metadata; decode /
  * feature-extract / frame-sample run as partition-local batch transforms
  * — the Scala/Encoder equivalent of a Pandas `mapInPandas` decode: the
  * work is per-partition, batched, and never touches the driver.
  *
  * The container ships no image/audio codecs, so `decodeStub` derives
  * deterministic pseudo-features from the bytes (clearly marked; swap the
  * body for a real codec call in production). Everything around it —
  * schema, Encoders, batch iteration shape, partitioning — is the real
  * production plumbing and is what the tests cover.
  */
object MultimodalDecode {

  /** An asset row: opaque payload + typed metadata. */
  final case class Asset(asset_id: Long, media_type: String, bytes: Array[Byte])

  /** Extracted features: sizes, header, strided frame sample, pseudo-dims. */
  final case class AssetFeatures(
      asset_id: Long,
      media_type: String,
      n_bytes: Int,
      header_hex: String,
      frame_sample: Seq[Byte],
      width: Int,
      height: Int)

  /** STUB decode: a real implementation would hand `a.bytes` to a codec.
    * This deterministic stand-in reads pseudo-dimensions from the byte
    * content so tests have stable expectations. */
  private def decodeStub(a: Asset): AssetFeatures = {
    val header = a.bytes.take(8)
    val frameStride = math.max(1, a.bytes.length / 4)
    AssetFeatures(
      asset_id = a.asset_id,
      media_type = a.media_type,
      n_bytes = a.bytes.length,
      header_hex = header.map(b => f"${b & 0xff}%02X").mkString,
      frame_sample = a.bytes.indices.by(frameStride).take(4).map(a.bytes).toSeq,
      width = if (a.bytes.isEmpty) 0 else (a.bytes(0) & 0xff) + 1,
      height = if (a.bytes.length < 2) 0 else (a.bytes(1) & 0xff) + 1)
  }

  /** Distributed decode: partition-local, batched via the partition
    * iterator (the mapInPandas batch shape). No shuffle is introduced —
    * output partitioning follows input partitioning. */
  def decode(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(decodeStub))
  }

  /** STUB resize: a real implementation re-encodes via a codec. The
    * stand-in byte-subsamples the payload to ~targetBytes with a fixed
    * stride — deterministic, preserves the header bytes, and keeps the
    * same partition-local batch shape as decode. */
  def resize(assets: Dataset[Asset], targetBytes: Int): Dataset[Asset] = {
    require(targetBytes > 0, "targetBytes must be positive")
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      if (a.bytes.length <= targetBytes) a
      else {
        val stride = math.max(1, a.bytes.length / targetBytes)
        a.copy(bytes = a.bytes.indices.by(stride).map(a.bytes).toArray)
      }
    })
  }
}
