package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.Tables
import graft.ops.{AsOf, BloomPrune, Merge, Normalize, Quality, Recall, Reshape, Summary, Windows}
import graft.text.{Dedup, TextAnalysis}
import graft.vector.Similarity
import graft.multimodal.BinaryOps

/** Gate registry — binary image/audio decode + feature plumbing.
  * Entries moved verbatim from the former monolithic [[Queries]];
  * [[Queries]] merges the family registries. */
private[graft] object QueriesMultimodal {

  import QueriesShared._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_decode_real" -> ((s, dir) => {
      val fix = graft.multimodal.ImageCodec.encodeFixture(
        t(s, dir, "documents").select(col("doc_id")), "doc_id")
      graft.multimodal.ImageCodec.decodeImageMeta(fix, "doc_id", "image")
        .select(col("doc_id"), col("width"), col("height"), col("format"))
    }),

    "multimodal_features_real" -> ((s, dir) => {
      val fix = graft.multimodal.ImageCodec.encodeFixture(
        t(s, dir, "documents").select(col("doc_id"))
          .where(col("doc_id") % 2 === 0), "doc_id") // PNG tier: lossless
      graft.multimodal.ImageCodec.pixelLaneSums(fix, "doc_id", "image", dim = 8)
        .select(col("doc_id") +:
          (0 until 8).map(j => col("features")(j).as(s"f$j")): _*)
    }),

    "multimodal_resize_real" -> ((s, dir) => {
      val fix = graft.multimodal.ImageCodec.encodeFixture(
        t(s, dir, "documents").select(col("doc_id")), "doc_id")
      graft.multimodal.ImageCodec.resizeHalf(fix, "doc_id", "image")
        .select(col("doc_id"), col("resized_width"), col("resized_height"),
          (col("resized_bytes") > 0).as("has_payload"))
    }),

    "multimodal_audio_meta" -> ((s, dir) => {
      val fix = graft.multimodal.AudioCodec.encodeFixture(
        t(s, dir, "documents").select(col("doc_id")), "doc_id")
      graft.multimodal.AudioCodec.decodeAudioMeta(fix, "doc_id", "audio")
    }),

    // REAL multi-frame sampling over animated GIF (the one JDK-native
    // multi-frame container): open the clip, count frames with the codec,
    // decode every 2nd frame, reduce to dims + exact gray sum — retires
    // the synthetic byte-slicing tier as the only frame-sampling path.
    "multimodal_frames_real" -> ((s, dir) => {
      val fix = graft.multimodal.ImageCodec.encodeGifFixture(
        t(s, dir, "documents").select(col("doc_id")), "doc_id")
      graft.multimodal.ImageCodec.sampleGifFrames(fix, "doc_id", "video", stride = 2)
    }),

    // ---- multimodal (plumbing stubs) --------------------------------------
    // Binary payload plumbing: utf-8 bytes of the text stand in for an
    // opaque media payload; fixed-stride frame sampling + per-frame hash.
    "multimodal_frames" -> ((s, dir) => {
      val withBin = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      BinaryOps.sampleFrames(withBin, "doc_id", "payload", frameBytes = 32)
        .select(col("doc_id"), col("frame_idx").cast(LongType).as("frame_idx"),
          col("frame_hash"))
    }),

    // STUB decode via mapPartitions: the fake dimensions are a pure
    // function of the payload byte length, so DuckDB replicates them from
    // strlen(text). Int32 fields cast to long at the gate surface (driver
    // dtype canonicalization).
    "multimodal_decode_meta" -> ((s, dir) => {
      val withBin = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      BinaryOps.decodeImageMeta(s, withBin, "doc_id", "payload")
        .select(col("doc_id"), col("width").cast(LongType).as("width"),
          col("height").cast(LongType).as("height"), col("format"), col("n_bytes"))
    }),

    // STUB feature-extract + resize plumbing: binary -> fixed-width float
    // vector; binary -> stride-sampled binary. The gate emits a DIGEST of
    // the vector (md5 over the exact integer lane values — a raw
    // array<float> is unhashable for the driver's pandas sorter); the
    // array-valued API stays in the library.
    "multimodal_features" -> ((s, dir) => {
      val withBin = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      val feats = BinaryOps.extractFeatures(withBin, "doc_id", "payload", dim = 8)
      val resized = BinaryOps.resizePayload(withBin, "doc_id", "payload", stride = 4)
      feats.join(resized, "doc_id")
        .select(col("doc_id"),
          md5(concat_ws(",",
            transform(col("features"), f => f.cast(IntegerType).cast(StringType))))
            .as("features_md5"),
          col("orig_bytes"),
          length(col("resized")).cast(LongType).as("resized_bytes"))
    }),

  )

  val oracleSql: Map[String, String] = Map(
    "multimodal_frames" ->
      """WITH b AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |f AS (SELECT doc_id, text, unnest(range(0, n // 32)) AS frame_idx FROM b WHERE n >= 32)
        |SELECT doc_id, frame_idx,
        |  md5(substring(text, CAST(frame_idx * 32 + 1 AS INT), 32)) AS frame_hash
        |FROM f""".stripMargin,

    // Spark's fixed HLL++ estimate is deterministic, so the tolerance
    // check is a stable boolean; the oracle emits the expected TRUE.
    "multimodal_decode_real" ->
      """SELECT doc_id,
        |  CAST(16 + doc_id % 49 AS INT) AS width,
        |  CAST(16 + (doc_id * 3) % 33 AS INT) AS height,
        |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
        |FROM documents""".stripMargin,

    // Exact gray-pattern lane sums over the lossless PNG tier:
    // gray(x, y) = (x*31 + y*17 + doc_id) mod 256, lane = x mod 8.
    "multimodal_features_real" ->
      """WITH d AS (SELECT doc_id, 16 + doc_id % 49 AS w, 16 + (doc_id * 3) % 33 AS h
        |           FROM documents WHERE doc_id % 2 = 0),
        |px AS (SELECT doc_id, h, unnest(range(0, w)) AS x FROM d),
        |pxy AS (SELECT doc_id, x, unnest(range(0, h)) AS y FROM px),
        |s AS (SELECT doc_id, x % 8 AS j,
        |        SUM((x * 31 + y * 17 + doc_id) % 256) AS f
        |      FROM pxy GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(MAX(CASE WHEN j = 0 THEN f END) AS BIGINT) AS f0,
        |  CAST(MAX(CASE WHEN j = 1 THEN f END) AS BIGINT) AS f1,
        |  CAST(MAX(CASE WHEN j = 2 THEN f END) AS BIGINT) AS f2,
        |  CAST(MAX(CASE WHEN j = 3 THEN f END) AS BIGINT) AS f3,
        |  CAST(MAX(CASE WHEN j = 4 THEN f END) AS BIGINT) AS f4,
        |  CAST(MAX(CASE WHEN j = 5 THEN f END) AS BIGINT) AS f5,
        |  CAST(MAX(CASE WHEN j = 6 THEN f END) AS BIGINT) AS f6,
        |  CAST(MAX(CASE WHEN j = 7 THEN f END) AS BIGINT) AS f7
        |FROM s GROUP BY 1""".stripMargin,

    // Animated-GIF frame sampling: frames 0, 2, 4 of the nf = 2 + id%4
    // frame clip; 8-bit gray round-trips the GIF palette losslessly, so
    // the per-frame gray sum is exact: sum over (x, y) of
    // (x*31 + y*17 + doc_id + frame*53) mod 256.
    "multimodal_frames_real" ->
      """WITH d AS (SELECT doc_id, 2 + doc_id % 4 AS nf,
        |             16 + doc_id % 17 AS w, 16 + (doc_id * 3) % 13 AS h
        |           FROM documents),
        |fr AS (SELECT doc_id, nf, w, h, unnest(range(0, nf, 2)) AS frame_idx FROM d),
        |px AS (SELECT doc_id, nf, w, h, frame_idx, unnest(range(0, w)) AS x FROM fr),
        |pxy AS (SELECT doc_id, nf, w, h, frame_idx, x, unnest(range(0, h)) AS y FROM px)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(SUM((x * 31 + y * 17 + doc_id + frame_idx * 53) % 256) AS BIGINT) AS gray_sum,
        |  CAST(nf AS INT) AS n_frames
        |FROM pxy GROUP BY doc_id, frame_idx, w, h, nf""".stripMargin,

    "multimodal_resize_real" ->
      """SELECT doc_id,
        |  CAST(greatest((16 + doc_id % 49) // 2, 1) AS INT) AS resized_width,
        |  CAST(greatest((16 + (doc_id * 3) % 33) // 2, 1) AS INT) AS resized_height,
        |  TRUE AS has_payload
        |FROM documents""".stripMargin,

    // WAV fixture: n = 800 + doc_id mod 800 samples of
    // s(i) = ((i*7 + doc_id) mod 4001) - 2000 at 8 kHz PCM16 mono.
    "multimodal_audio_meta" ->
      """WITH d AS (SELECT doc_id, 800 + doc_id % 800 AS n FROM documents),
        |i AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
        |s AS (SELECT doc_id,
        |        CAST(SUM((i * 7 + doc_id) % 4001 - 2000) AS BIGINT) AS sample_sum
        |      FROM i GROUP BY 1)
        |SELECT d.doc_id, CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
        |  CAST(16 AS INT) AS bits, CAST(d.n AS BIGINT) AS n_samples, s.sample_sum
        |FROM d JOIN s ON d.doc_id = s.doc_id""".stripMargin,

    // The stub decode dims are a pure function of payload byte length
    // (documents.text is ASCII: strlen == byte count).
    "multimodal_decode_meta" ->
      """WITH d AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n FROM documents)
        |SELECT doc_id, n % 640 + 1 AS width, (n * 7) % 480 + 1 AS height,
        |  CASE n % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
        |  n AS n_bytes
        |FROM d""".stripMargin,

    // Position-weighted byte sums per lane, mod 1000003 — exact integer
    // math replicated from the bytes (ord == byte value on ASCII text).
    "multimodal_features" ->
      """WITH d AS (SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS n FROM documents),
        |pos AS (SELECT doc_id, unnest(range(1, n + 1)) AS i, text FROM d),
        |s AS (SELECT doc_id, (i - 1) % 8 AS j,
        |        SUM(ord(substring(text, CAST(i AS INT), 1)) * i) AS sj
        |      FROM pos GROUP BY 1, 2),
        |grid AS (SELECT doc_id, unnest(range(0, 8)) AS j FROM d),
        |f AS (SELECT g.doc_id, g.j, CAST(COALESCE(s.sj, 0) % 1000003 AS BIGINT) AS fj
        |      FROM grid g LEFT JOIN s ON g.doc_id = s.doc_id AND g.j = s.j),
        |v AS (SELECT doc_id, list(fj ORDER BY j) AS fl FROM f GROUP BY 1)
        |SELECT d.doc_id,
        |  md5(array_to_string(list_transform(v.fl, x -> CAST(x AS VARCHAR)), ',')) AS features_md5,
        |  d.n AS orig_bytes,
        |  (d.n + 3) // 4 AS resized_bytes
        |FROM d JOIN v ON d.doc_id = v.doc_id""".stripMargin,

  )
}
