package graft.multimodal

import java.io.ByteArrayInputStream
import javax.sound.sampled.AudioSystem

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL audio codec path via the JDK's `javax.sound.sampled`: WAV (RIFF
  * PCM) containers are parsed by the platform AudioSystem — format
  * metadata from the real parser, sample values from the PCM payload.
  * Same fixture strategy as [[ImageCodec]]: a deterministic 16-bit mono
  * pattern signal (s(i) = ((i*7 + doc_id) mod 4001) - 2000) whose decoded
  * sample count and EXACT integer sample sum an independent SQL engine
  * derives analytically.
  */
object AudioCodec {

  val SampleRate = 8000

  /** Deterministic fixture length in samples: [800, 1600). */
  def fixtureSamples(docId: Long): Int = (800 + Math.floorMod(docId, 800L)).toInt

  def fixtureSample(docId: Long, i: Int): Int =
    Math.floorMod(i * 7L + docId, 4001L).toInt - 2000

  /** RIFF/WAVE PCM16LE mono encoder — the 44-byte canonical header plus
    * little-endian samples (byte-deterministic, unlike image encoders). */
  private def encodeWav(docId: Long): Array[Byte] = {
    val n = fixtureSamples(docId)
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(SampleRate)
      .putInt(SampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) { buf.putShort(fixtureSample(docId, i).toShort); i += 1 }
    buf.array()
  }

  /** Fixture source: (doc_id, audio) with one real WAV payload per id.
    * Repartitioned up front for the same reason as
    * [[ImageCodec.encodeFixture]]: the pruned id scan collapses to few
    * splits, and the whole codec chain runs in this stage's tasks. */
  def encodeFixture(ids: DataFrame, idCol: String): DataFrame = {
    val in = ids.select(col(idCol).cast(LongType))
      .repartition(ids.sparkSession.sparkContext.defaultParallelism)
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("audio", BinaryType, nullable = false)))
    val enc = Encoders.row(schema)
    in.mapPartitions { it =>
      it.map(r => Row(r.getLong(0), encodeWav(r.getLong(0))))
    }(enc)
  }

  /** REAL decode: container metadata from AudioSystem's WAV parser plus
    * the exact integer sum of the decoded PCM16 samples. Output:
    * (doc_id, sample_rate, channels, bits, n_samples, sample_sum). */
  def decodeAudioMeta(withBinary: DataFrame, idCol: String, binCol: String): DataFrame = {
    val in = withBinary.select(col(idCol).cast(LongType), col(binCol))
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("bits", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("sample_sum", LongType, nullable = false)))
    val enc = Encoders.row(schema)
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
        try {
          val fmt = ais.getFormat
          val frames = ais.getFrameLength
          val data = ais.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(data)
            .order(if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                   else java.nio.ByteOrder.LITTLE_ENDIAN)
          var sum = 0L
          while (bb.remaining() >= 2) sum += bb.getShort.toLong
          Row(id, fmt.getSampleRate.toInt, fmt.getChannels,
            fmt.getSampleSizeInBits, frames, sum)
        } finally ais.close()
      }
    }(enc)
  }
}
