package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus feature extraction over batches.
  *
  * The *decode* step (real image/audio codecs) is STUBBED — the container
  * has no media libraries — behind [[FakeDecoder]], a deterministic fake.
  * Everything Spark-side is real: the asset schema, the binary column,
  * the partition-wise batched extraction (`mapPartitions` over a typed
  * Dataset — the Scala analog of `mapInPandas`: one iterator per
  * partition, arbitrary per-batch native calls, no per-row JVM↔native
  * round trips), and the columnar metadata path.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  final case class Asset(asset_id: Long, kind: String, content: Array[Byte])
  final case class AssetFeatures(asset_id: Long, kind: String, n_bytes: Long,
      content_hash: String, features: Array[Float])

  /** Wrap a text corpus as binary assets (the testdata has no media blobs;
    * utf-8 payloads exercise the identical plumbing).
    */
  def assetsFromText(df: DataFrame, idCol: String, textCol: String,
      kind: String = "text"): DataFrame =
    df.select(col(idCol).cast("long").as("asset_id"), lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("content"))

  /** The stubbed decoder: a real implementation would call an image/audio
    * library here, per partition, batching frames. The fake derives a
    * fixed-shape feature vector from the payload bytes deterministically.
    */
  object FakeDecoder {
    val FeatureDim = 8
    def decode(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        out(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** Partition-batched feature extraction: one decoder instantiation per
    * partition (where a real codec would load its native context once),
    * then a tight per-asset loop. Distributed, no driver involvement.
    */
  def extractFeatures(assets: DataFrame): Dataset[AssetFeatures] = {
    val enc = Encoders.product[AssetFeatures]
    val in = assets.as(Encoders.product[Asset])
    in.mapPartitions { it =>
      // per-partition setup: one digest instance reused (reset per row)
      // across the whole partition, like a real codec's native context.
      val md = java.security.MessageDigest.getInstance("MD5")
      val hexDigits = "0123456789abcdef".toCharArray
      it.map { a =>
        md.reset()
        val bytes = md.digest(a.content)
        val sb = new java.lang.StringBuilder(bytes.length * 2)
        var i = 0
        while (i < bytes.length) {
          val b = bytes(i) & 0xff
          sb.append(hexDigits(b >>> 4)).append(hexDigits(b & 0xf))
          i += 1
        }
        AssetFeatures(a.asset_id, a.kind, a.content.length.toLong, sb.toString,
          FakeDecoder.decode(a.content))
      }
    }(enc)
  }

  /** Frame/sample selection on the opaque payload: byte-range slices as a
    * stand-in for time/frame offsets (the real operator's shape: per-row
    * slicing pushed into codegen, no decode needed for sampling).
    */
  def sampleHead(assets: DataFrame, nBytes: Int): DataFrame =
    assets.withColumn("head_hex", lower(hex(expr(s"substring(content, 1, $nBytes)"))))

  /** Resize analog for opaque payloads: keep every `factor`-th byte —
    * the decode-free stand-in for image downsampling (a real pipeline
    * decodes, resizes with a codec, re-encodes inside this same
    * partition-batched loop; the Spark-side shape — typed mapPartitions,
    * new payload + updated metadata — is identical). Deterministic, so
    * downstream hashes stay gate-comparable.
    */
  def downsample(assets: DataFrame, factor: Int): Dataset[Asset] = {
    require(factor >= 1, "factor must be >= 1")
    val enc = Encoders.product[Asset]
    assets.as(enc).mapPartitions { it =>
      it.map { a =>
        val in = a.content
        // overflow-safe ceil division: (len + factor - 1) wraps for huge factors
        val n = if (in.length == 0) 0 else (in.length - 1) / factor + 1
        val out = new Array[Byte](n)
        var i = 0
        while (i < out.length) { out(i) = in(i * factor); i += 1 }
        Asset(a.asset_id, a.kind, out)
      }
    }(enc)
  }

  /** Frame extraction: fixed-length windows every `stride` bytes over the
    * opaque payload — one output row per (asset, frame) with the frame's
    * offset and content hash. A real video/audio decoder would seek codec
    * frame boundaries instead of byte strides; the Spark-side plumbing
    * (per-row window enumeration, explode to frame rows, per-frame hash,
    * all codegen'd — no UDF, no decode) is exactly this shape. Payloads
    * shorter than one frame yield a single truncated frame 0.
    */
  def frameSamples(assets: DataFrame, frameLen: Int, stride: Int): DataFrame = {
    require(frameLen > 0 && stride > 0, "frameLen and stride must be positive")
    val lastStart =
      greatest(lit(0L), floor((length(col("content")) - frameLen) / stride.toDouble).cast("long"))
    val frames = transform(sequence(lit(0L), lastStart), i =>
      struct(i.as("frame_idx"),
        (i * stride + 1).as("frame_off"),
        md5(substring(col("content"), (i * stride + 1).cast("int"), lit(frameLen))).as("frame_hash")))
    assets.select(col("asset_id"), explode(frames).as("f"))
      .select(col("asset_id"), col("f.frame_idx"), col("f.frame_off"), col("f.frame_hash"))
  }
}
