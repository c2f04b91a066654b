package graft.functions

import org.apache.spark.sql.Dataset

/** Typed multimodal decode plumbing (north star "multimodal columns").
  *
  * Assets travel as opaque BINARY columns with typed metadata; decode /
  * feature-extract / frame-sample run as partition-local batch transforms
  * — the Scala/Encoder equivalent of a Pandas `mapInPandas` decode: the
  * work is per-partition, batched, and never touches the driver.
  *
  * Decode is CAPABILITY-AWARE (round-6): each asset's media type is
  * probed against the JRE's javax.imageio registry — when a real reader
  * exists (PNG/JPEG/GIF/BMP ship with every JRE) the payload is decoded
  * and TRUE dimensions + pixel samples are emitted; when no codec exists
  * (audio/video/MIME types this container cannot decode) the
  * deterministic byte-derived stub keeps the pipeline total. Swapping a
  * richer codec set in (e.g. TwelveMonkeys on a real cluster) upgrades
  * coverage with zero plumbing changes — the schema, Encoders, batch
  * iteration shape and partitioning are identical on both branches.
  */
object MultimodalDecode {

  /** An asset row: opaque payload + typed metadata. */
  final case class Asset(asset_id: Long, media_type: String, bytes: Array[Byte])

  /** Extracted features: sizes, header, strided frame sample, dims.
    * `decoder` records which branch produced the row ("imageio" | "stub")
    * — a curation pipeline filters on it rather than guessing. */
  final case class AssetFeatures(
      asset_id: Long,
      media_type: String,
      n_bytes: Int,
      header_hex: String,
      frame_sample: Seq[Byte],
      width: Int,
      height: Int,
      decoder: String)

  /** One registry probe per (executor, media type) — ImageIO's reader
    * lookup walks the SPI registry; memoize it per JVM. */
  @transient private lazy val readerFor =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private def hasReader(mime: String): Boolean =
    readerFor.computeIfAbsent(mime,
      m => javax.imageio.ImageIO.getImageReadersByMIMEType(m).hasNext)

  /** Real decode via the JRE's ImageIO: true dimensions plus a 4-point
    * pixel sample (corners of the center quad — deterministic for a given
    * payload). None when the registry has no reader for the type or the
    * payload does not parse as that type (corrupt bytes fall back to the
    * stub rather than failing the partition). */
  private def decodeImageIo(a: Asset): Option[AssetFeatures] = {
    if (!a.media_type.startsWith("image/") || !hasReader(a.media_type)) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.bytes))
      if (img == null) return None
      val (w, h) = (img.getWidth, img.getHeight)
      val pts = Seq((0, 0), (w / 2, 0), (0, h / 2), (w / 2, h / 2))
      Some(AssetFeatures(
        asset_id = a.asset_id,
        media_type = a.media_type,
        n_bytes = a.bytes.length,
        header_hex = a.bytes.take(8).map(b => f"${b & 0xff}%02X").mkString,
        frame_sample = pts.map { case (x, y) => (img.getRGB(x, y) & 0xff).toByte },
        width = w,
        height = h,
        decoder = "imageio"))
    } catch {
      // ImageIO plugins throw RuntimeExceptions (IllegalArgument,
      // ArrayIndexOutOfBounds, NegativeArraySize…) on truncated or
      // malformed payloads, not just IOException — a curation pipeline
      // is fed untrusted bytes, so ANY decode failure falls back to the
      // stub rather than failing the whole partition.
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** STUB decode for payloads no available codec handles: deterministic
    * pseudo-dimensions from the byte content so tests have stable
    * expectations and the pipeline stays total. */
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
      height = if (a.bytes.length < 2) 0 else (a.bytes(1) & 0xff) + 1,
      decoder = "stub")
  }

  /** Distributed decode: partition-local, batched via the partition
    * iterator (the mapInPandas batch shape). No shuffle is introduced —
    * output partitioning follows input partitioning. Per asset: the
    * ImageIO branch when a codec exists, the stub otherwise. */
  def decode(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(a => decodeImageIo(a).getOrElse(decodeStub(a))))
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
