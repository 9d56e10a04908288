package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata alongside. The decode steps here
  * are STUBS (deterministic fakes derived from the bytes) retained to gate
  * the plumbing with byte-exact oracles; the REAL codec tier lives in
  * [[ImageCodec]] (JDK javax.imageio: PNG/JPEG) and [[AudioCodec]] (JDK
  * javax.sound.sampled: WAV PCM) behind the same mapPartitions shape.
  *
  * At 100 TB the binary column dominates I/O: keep it in its own Parquet
  * column (never inside a struct with hot columns) so metadata-only
  * queries prune it at the scan, and size
  * `spark.sql.files.maxPartitionBytes` for payload width, not row count.
  */
object BinaryOps {

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** STUB image decode: a real implementation would hand each partition's
    * byte buffers to a codec (e.g. via a JNI/FFM binding) in batches; here
    * the "decoded" dimensions are a fixed deterministic function of the
    * payload so tests and the oracle can verify the plumbing end-to-end.
    * The mapPartitions shape — iterator in, iterator out, no per-row JVM
    * object churn beyond the Row — is the part that carries to production.
    */
  def decodeImageMeta(spark: SparkSession, withBinary: DataFrame,
                      idCol: String, binCol: String): DataFrame = {
    val in = withBinary.select(col(idCol).cast(LongType), col(binCol))
    val enc = Encoders.row(imageMetaSchema)
    in.mapPartitions { it =>
      it.map { r =>
        val id    = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val n     = bytes.length.toLong
        // Deterministic fake decode (a real codec slots in here — see
        // ImageCodec for the JDK-imageio tier, gated separately): the
        // fake is a pure integer function of the payload, so the DuckDB
        // oracle replicates it bit-for-bit and the PLUMBING gets a full
        // hash-compare gate, which no real codec output could have.
        val width  = (n % 640L).toInt + 1
        val height = ((n * 7L) % 480L).toInt + 1
        val format = (n % 3L) match {
          case 0L => "png"
          case 1L => "jpeg"
          case _  => "webp"
        }
        Row(id, width, height, format, n)
      }
    }(enc)
  }

  /** STUB feature extraction: a real build hands each partition's payload
    * batch to a model/codec runtime; here each payload maps to a
    * deterministic `dim`-float vector so the Spark-side contract — binary
    * in, fixed-width float vector out, iterator-batched per partition — is
    * real and testable end-to-end. The fake is position-weighted byte sums
    * per lane, reduced mod 1000003: exact integer math (no float
    * accumulation, no wrapping 64-bit multiply), so an independent SQL
    * engine can replicate it bit-for-bit from the payload bytes, and every
    * feature value is an integer < 2^24 (exact in float32).
    */
  def extractFeatures(withBinary: DataFrame, idCol: String, binCol: String,
                      dim: Int): DataFrame = {
    val in = withBinary.select(col(idCol).cast(LongType), col(binCol))
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = Encoders.row(schema)
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // Deterministic fake inference (a model runtime slots in here):
        // exact integer math so the DuckDB oracle replicates it and the
        // batched-iterator contract gets a full hash-compare gate.
        val sums = new Array[Long](dim)
        var i = 0
        while (i < bytes.length) {
          sums(i % dim) += (bytes(i) & 0xff).toLong * (i + 1)
          i += 1
        }
        val feats = Array.tabulate(dim)(j => (sums(j) % 1000003L).toFloat)
        Row(id, feats.toSeq)
      }
    }(enc)
  }

  /** STUB resize: stride-samples every `stride`-th byte of the payload —
    * a real build would decode + rescale; the contract (binary -> smaller
    * binary, metadata preserved) is the tested part.
    */
  def resizePayload(withBinary: DataFrame, idCol: String, binCol: String,
                    stride: Int): DataFrame = {
    val in = withBinary.select(col(idCol).cast(LongType), col(binCol))
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("resized", BinaryType, nullable = false),
      StructField("orig_bytes", LongType, nullable = false)))
    val enc = Encoders.row(schema)
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val out = Array.range(0, bytes.length, stride).map(bytes(_))
        Row(id, out, bytes.length.toLong)
      }
    }(enc)
  }

  /** Frame sampling: slice a binary payload into fixed-size "frames" and
    * fingerprint each — pure codegen'd expressions (substr on binary is a
    * byte slice), exploded to one row per frame. `frameBytes` strides the
    * payload; payloads shorter than one frame yield no rows.
    */
  def sampleFrames(withBinary: DataFrame, idCol: String, binCol: String,
                   frameBytes: Int): DataFrame = {
    val n = length(col(binCol))
    val frames = when(n >= frameBytes,
        sequence(lit(0), (n / frameBytes).cast(IntegerType) - 1))
      .otherwise(array().cast(ArrayType(IntegerType)))
    withBinary.select(col(idCol), col(binCol), explode(frames).as("frame_idx"))
      .select(col(idCol),
        col("frame_idx"),
        md5(substr(col(binCol), col("frame_idx") * frameBytes + 1, lit(frameBytes))).as("frame_hash"))
  }
}
