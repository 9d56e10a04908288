package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL image codec path (retires the BinaryOps decode stub's "no codec
  * libraries" limitation): the JDK ships complete PNG/JPEG/BMP/GIF codecs
  * in `javax.imageio`, so decode, feature extraction, and resize run
  * against actual image bytes — same `mapPartitions` plumbing as
  * [[BinaryOps]] (iterator in, iterator out, binary column isolated from
  * hot columns), now with a real decoder inside.
  *
  * Gate strategy: the fixture encodes a DETERMINISTIC pattern image per
  * doc (gray(x, y) = (x*31 + y*17 + doc_id) mod 256, dimensions derived
  * from doc_id), so an independent SQL engine can verify the DECODED
  * values analytically — dimensions and format for PNG and JPEG, exact
  * pixel sums for PNG (lossless round trip; JPEG is lossy so only its
  * metadata is gated).
  */
object ImageCodec {

  /** Deterministic fixture dimensions (bounded so the oracle's pixel-level
    * replication stays cheap): width in [16, 64], height in [16, 48]. */
  def fixtureWidth(docId: Long): Int = (16 + Math.floorMod(docId, 49L)).toInt
  def fixtureHeight(docId: Long): Int = (16 + Math.floorMod(docId * 3L, 33L)).toInt

  private def patternImage(docId: Long): BufferedImage = {
    val w = fixtureWidth(docId)
    val h = fixtureHeight(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = Math.floorMod(x * 31L + y * 17L + docId, 256L).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  // ImageIO defaults to DISK-backed stream caches — one temp file created
  // and deleted per encode/decode, which dominates the per-image cost for
  // small images. Heap-backed streams throughout; idempotent, applied at
  // class load on driver and executors alike (same JVM here, and the
  // object initializes wherever the lambdas run).
  ImageIO.setUseCache(false)

  private def encode(img: BufferedImage, format: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    if (!ImageIO.write(img, format, bos))
      throw new IllegalStateException(s"no ImageIO writer for format $format")
    bos.toByteArray
  }

  /** Fixture source: one real encoded image per input id — PNG for even
    * ids, JPEG for odd (two real codecs through one path). Output:
    * (doc_id, image). */
  def encodeFixture(ids: DataFrame, idCol: String): DataFrame = {
    // Fan the id list across the cluster BEFORE the codec chain: the
    // pruned id column collapses to one-or-few scan splits
    // (maxPartitionBytes is sized for data, not for CPU work per row), and
    // every downstream mapPartitions codec stage — encode, decode,
    // resize — runs in this stage's tasks. A real binary corpus arrives
    // pre-split by its payload bytes; a generated fixture must spread
    // itself.
    val in = ids.select(col(idCol).cast(LongType))
      .repartition(ids.sparkSession.sparkContext.defaultParallelism)
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("image", BinaryType, nullable = false)))
    val enc = Encoders.row(schema)
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val fmt = if (id % 2 == 0) "png" else "jpeg"
        Row(id, encode(patternImage(id), fmt))
      }
    }(enc)
  }

  private def readImage(bytes: Array[Byte]): (BufferedImage, String) = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext)
        throw new IllegalArgumentException("undecodable image payload")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        (reader.read(0), reader.getFormatName.toLowerCase)
      } finally reader.dispose()
    } finally iis.close()
  }

  /** REAL decode: dimensions + container format read from the bytes by the
    * JDK codec (not derived from the payload length like the declared
    * stub). Same output schema as [[BinaryOps.decodeImageMeta]]. */
  def decodeImageMeta(withBinary: DataFrame, idCol: String, binCol: String): DataFrame = {
    val in = withBinary.select(col(idCol).cast(LongType), col(binCol))
    val enc = Encoders.row(BinaryOps.imageMetaSchema)
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (img, fmt) = readImage(bytes)
        Row(id, img.getWidth, img.getHeight, fmt, bytes.length.toLong)
      }
    }(enc)
  }

  /** REAL pixel features: per-lane exact integer sums of the decoded gray
    * channel (lane = x mod dim) — every value < 64*48*255, exact in a
    * long and replicable analytically for the lossless PNG fixture.
    * Output: (doc_id, features: array<long>). */
  def pixelLaneSums(withBinary: DataFrame, idCol: String, binCol: String,
                    dim: Int): DataFrame = {
    val in = withBinary.select(col(idCol).cast(LongType), col(binCol))
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("features", ArrayType(LongType, containsNull = false), nullable = false)))
    val enc = Encoders.row(schema)
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (img, _) = readImage(r.getAs[Array[Byte]](1))
        val sums = new Array[Long](dim)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            sums(x % dim) += (img.getRGB(x, y) & 0xff).toLong
            x += 1
          }
          y += 1
        }
        Row(id, sums.toSeq)
      }
    }(enc)
  }

  // ---- multi-frame (animated GIF) tier ----------------------------------
  // The JDK has no video codec, but javax.imageio reads multi-frame
  // animated GIFs — the one JDK-native multi-frame container — so frame
  // SAMPLING (the operation a video pipeline runs per clip) can be real:
  // open the container, count frames, decode every stride-th frame,
  // reduce each to features. 8-bit grayscale round-trips losslessly
  // through GIF's 256-entry palette, so the oracle can verify decoded
  // pixel sums analytically, exactly as the PNG still tier does.

  /** Deterministic multi-frame fixture parameters: 2-5 frames of
    * bounded-size frames per doc. */
  def gifFrameCount(docId: Long): Int = 2 + Math.floorMod(docId, 4L).toInt
  def gifWidth(docId: Long): Int = (16 + Math.floorMod(docId, 17L)).toInt
  def gifHeight(docId: Long): Int = (16 + Math.floorMod(docId * 3L, 13L)).toInt

  /** Frame pattern: gray(x, y) = (x*31 + y*17 + doc_id + frame*53) mod
    * 256 — the still-image pattern plus a per-frame shift, so every
    * frame's content (and therefore its feature row) is distinct. */
  private def gifFrame(docId: Long, frame: Int): BufferedImage = {
    val w = gifWidth(docId)
    val h = gifHeight(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0,
          Math.floorMod(x * 31L + y * 17L + docId + frame * 53L, 256L).toInt)
        x += 1
      }
      y += 1
    }
    img
  }

  private def encodeAnimatedGif(frames: Seq[BufferedImage]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Fixture source: one real animated GIF per input id. Output:
    * (doc_id, video) — named for the role it plays (a multi-frame
    * container standing in for a clip). */
  def encodeGifFixture(ids: DataFrame, idCol: String): DataFrame = {
    val in = ids.select(col(idCol).cast(LongType))
      .repartition(ids.sparkSession.sparkContext.defaultParallelism)
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("video", BinaryType, nullable = false)))
    val enc = Encoders.row(schema)
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, encodeAnimatedGif(
          (0 until gifFrameCount(id)).map(f => gifFrame(id, f))))
      }
    }(enc)
  }

  /** REAL frame sampling: open the multi-frame container, count frames
    * with the codec (`getNumImages`), DECODE every `stride`-th frame and
    * reduce it to (dims, exact gray sum). One output row per sampled
    * frame: (doc_id, frame_idx, width, height, gray_sum, n_frames).
    * Iterator-in/iterator-out like every codec stage; flatMap because a
    * clip fans out to several rows.
    */
  def sampleGifFrames(withBinary: DataFrame, idCol: String, binCol: String,
                      stride: Int = 2): DataFrame = {
    require(stride >= 1, s"stride must be positive, got $stride")
    val in = withBinary.select(col(idCol).cast(LongType), col(binCol))
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("gray_sum", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false)))
    val enc = Encoders.row(schema)
    in.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val iis = ImageIO.createImageInputStream(
          new ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext)
            throw new IllegalArgumentException("undecodable multi-frame payload")
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            (0 until n by stride).map { i =>
              val img = reader.read(i)
              var sum = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  sum += (img.getRGB(x, y) & 0xff).toLong
                  x += 1
                }
                y += 1
              }
              Row(id, i, img.getWidth, img.getHeight, sum, n)
            }
          } finally reader.dispose()
        } finally iis.close()
      }
    }(enc)
  }

  /** REAL resize: decode, halve each dimension (floor, min 1) with
    * area-style smooth scaling, re-encode PNG. Output: (doc_id,
    * resized_width, resized_height, resized_bytes) — the interpolated
    * pixel values are codec-defined, so gates pin the decoded geometry and
    * payload presence, not the samples. */
  def resizeHalf(withBinary: DataFrame, idCol: String, binCol: String): DataFrame = {
    val in = withBinary.select(col(idCol).cast(LongType), col(binCol))
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("resized_width", IntegerType, nullable = false),
      StructField("resized_height", IntegerType, nullable = false),
      StructField("resized_bytes", LongType, nullable = false)))
    val enc = Encoders.row(schema)
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (img, _) = readImage(r.getAs[Array[Byte]](1))
        val rw = math.max(1, img.getWidth / 2)
        val rh = math.max(1, img.getHeight / 2)
        val scaled = new BufferedImage(rw, rh, BufferedImage.TYPE_INT_RGB)
        val g = scaled.createGraphics()
        try g.drawImage(
          img.getScaledInstance(rw, rh, java.awt.Image.SCALE_AREA_AVERAGING),
          0, 0, null)
        finally g.dispose()
        val bytes = encode(scaled, "png")
        Row(id, rw, rh, bytes.length.toLong)
      }
    }(enc)
  }
}
