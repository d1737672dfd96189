package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus feature extraction over batches.
  *
  * The FULL-decode step (real image/audio codecs) is STUBBED — the
  * container has no media libraries — behind [[FakeDecoder]], a
  * deterministic fake. The HEADER decode is REAL: [[HeaderDecoder]]
  * parses PNG IHDR and JPEG SOF dimensions from raw bytes with no
  * library at all (public file-format knowledge — PNG spec §11.2.2,
  * JPEG/JFIF marker structure). Everything Spark-side is real: the
  * asset schema, the binary column, the partition-wise batched
  * extraction (`mapPartitions` over a typed Dataset — the Scala analog
  * of `mapInPandas`: one iterator per partition, arbitrary per-batch
  * native calls, no per-row JVM↔native round trips), and the columnar
  * metadata path.
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

  /** Real, dependency-free media header parsing: format sniff +
    * dimensions straight off the payload bytes. This is what a 100 TB
    * ingest actually runs FIRST — dimension/format filters drop
    * malformed or out-of-spec assets before any codec spends a
    * microsecond decoding pixels — and it needs no native library, so
    * it runs inside the same codegen-adjacent batched loop as the rest
    * of the extraction.
    *
    * Formats (public file-format structure, no library):
    *  - PNG: 8-byte signature `89 50 4E 47 0D 0A 1A 0A`; the first chunk
    *    is IHDR by spec, so width/height are the big-endian u32 pairs at
    *    offsets 16 and 20.
    *  - JPEG: `FF D8` SOI, then marker segments `FF mm len_hi len_lo …`;
    *    dimensions live in the first SOFn frame header (`C0-CF` minus
    *    `C4` DHT / `C8` JPG-extension / `CC` DAC): precision(1),
    *    height(u16 BE), width(u16 BE). The scan walks segment lengths,
    *    tolerates fill bytes (`FF FF …`), and stops at SOS/EOI — past
    *    SOS is entropy-coded data, and a well-formed frame header always
    *    precedes it.
    * Anything else — truncated, corrupt, or a format this parser does
    * not know — is `("unknown", None, None)`, never an exception: at
    * corpus scale malformed bytes are DATA, and the filter downstream
    * decides their fate.
    */
  object HeaderDecoder {
    private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def u16(b: Array[Byte], i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def u32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) | ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

    /** (format, width, height); dimensions are None for unknown/corrupt
      * payloads and for a PNG/JPEG whose header lies outside the bytes.
      */
    def decode(b: Array[Byte]): (String, Option[Int], Option[Int]) = {
      if (b.length >= 24 && PngSig.indices.forall(i => b(i) == PngSig(i)) &&
          b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
        val w = u32(b, 16)
        val h = u32(b, 20)
        // spec caps dimensions at 2^31-1; 0 is invalid
        if (w > 0 && w <= Int.MaxValue && h > 0 && h <= Int.MaxValue)
          ("png", Some(w.toInt), Some(h.toInt))
        else ("png", None, None)
      } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
        var i = 2
        while (i + 1 < b.length && (b(i) & 0xff) == 0xff) {
          // skip fill bytes: any number of FFs may pad before a marker
          var j = i
          while (j + 1 < b.length && (b(j + 1) & 0xff) == 0xff) j += 1
          val marker = if (j + 1 < b.length) b(j + 1) & 0xff else 0
          if (marker >= 0xc0 && marker <= 0xcf &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            // SOFn: FF Cn len(2) precision(1) height(2) width(2)
            if (j + 8 < b.length) {
              val h = u16(b, j + 5)
              val w = u16(b, j + 7)
              if (w > 0 && h > 0) return ("jpeg", Some(w), Some(h))
            }
            return ("jpeg", None, None)
          } else if (marker == 0xda || marker == 0xd9) {
            // SOS (entropy data follows) or EOI: no frame header seen
            return ("jpeg", None, None)
          } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
            i = j + 2 // standalone markers carry no length
          } else if (j + 3 < b.length) {
            val segLen = u16(b, j + 2)
            if (segLen < 2) return ("jpeg", None, None) // corrupt length
            i = j + 2 + segLen
          } else {
            return ("jpeg", None, None) // truncated before segment length
          }
        }
        ("jpeg", None, None)
      } else ("unknown", None, None)
    }
  }

  /** Typed header metadata row: dimensions are nullable (unknown format
    * or malformed header).
    */
  final case class AssetHeader(asset_id: Long, kind: String, n_bytes: Long,
      format: String, width: Option[Int], height: Option[Int])

  /** Partition-batched header extraction over the raw payloads — the
    * REAL decode path (see [[HeaderDecoder]]): same typed-mapPartitions
    * shape as [[extractFeatures]], shuffle-free, linear, no library.
    */
  def headerMeta(assets: DataFrame): Dataset[AssetHeader] = {
    val enc = Encoders.product[AssetHeader]
    assets.as(Encoders.product[Asset]).mapPartitions { it =>
      it.map { a =>
        val (fmt, w, h) = HeaderDecoder.decode(a.content)
        AssetHeader(a.asset_id, a.kind, a.content.length.toLong, fmt, w, h)
      }
    }(enc)
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
