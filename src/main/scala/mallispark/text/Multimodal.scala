package mallispark.text

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * The Spark-side plumbing is REAL (schema, batched per-partition
  * processing, deterministic partitioning); the media DECODE step is a
  * clearly-marked STUB — the container has no image/audio codecs — that
  * produces deterministic md5-derived features so tests are stable and
  * the pipeline shape (binary in → fixed-width feature vector out) is
  * exactly what a real decoder would slot into. */
object Multimodal {

  /** Typed metadata extracted scan-side without decoding: size, sha,
    * magic-byte sniffed kind. Pure Column exprs — codegen'd. */
  def mediaMetadata(bin: Column): Column = F.struct(
    F.length(bin).cast(LongType).as("n_bytes"),
    F.sha2(bin, 256).as("sha256"),
    F.when(F.hex(F.substring(bin, 1, 2)) === "FFD8", "jpeg")
      .when(F.hex(F.substring(bin, 1, 4)) === "89504E47", "png")
      .when(F.hex(F.substring(bin, 1, 4)) === "52494646", "riff")
      .otherwise("unknown").as("kind"))

  /** "Frame sampling" on the binary payload: n evenly-spaced fixed-width
    * byte windows (what a video frame sampler produces per keyframe).
    * Pure Column: array of binary slices. */
  def sampleWindows(bin: Column, n: Int, width: Int): Column = {
    val strideDen = math.max(n - 1, 1) // n=1: single window at offset 0
    F.transform(F.sequence(F.lit(0), F.lit(n - 1)), i =>
      F.substring(bin,
        (i * F.greatest((F.length(bin) - width) / strideDen, F.lit(1)) + 1)
          .cast(IntegerType),
        F.lit(width)))
  }

  final case class MediaRow(doc_id: Long, media: Array[Byte])
  final case class MediaFeatures(doc_id: Long, n_bytes: Long,
                                 features: Array[Float])

  /** Per-partition batched feature extraction — the Dataset analogue of
    * mapInPandas: one iterator per partition, constant memory, no
    * per-row closure dispatch in the hot loop beyond the decode call.
    *
    * ==== STUB ====
    * `decodeStub` stands in for a real image/audio decoder (none available
    * in this container). It is DETERMINISTIC (md5-derived), so tests and
    * oracles are stable. Replace with a real codec at deployment; the
    * schema, batch shape, and partitioning do not change. */
  def extractFeatures(df: DataFrame, id: String, binCol: String,
                      dims: Int = 8): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    implicit val encIn = Encoders.product[MediaRow]
    val typed = df.select(F.col(id).cast(LongType).as("doc_id"),
      F.col(binCol).as("media")).as[MediaRow]
    typed.mapPartitions { it =>
      // one digest instance per partition, reused across the batch
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { row =>
        val bytes = if (row.media == null) Array.empty[Byte] else row.media
        val h = md.digest(bytes) // STUB: real decode+embed goes here
        val feats = Array.tabulate(dims)(i =>
          ((h(i % h.length) & 0xff) / 255.0f))
        MediaFeatures(row.doc_id, bytes.length.toLong, feats)
      }
    }
  }

  /** Deterministic partition balancing for heavy binary payloads: salt by
    * content hash so hot keys (e.g. one giant host) spread evenly. */
  def balance(df: DataFrame, binCol: String, partitions: Int): DataFrame =
    df.repartition(partitions, F.pmod(F.xxhash64(F.col(binCol)),
      F.lit(partitions.toLong)))
}
