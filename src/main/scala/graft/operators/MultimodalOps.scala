package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import PipeData._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample operators over them.
  *
  * The decode step is a DETERMINISTIC STUB — this container has no image
  * or audio codecs, so "payloads" are synthesized (a parseable 8-byte
  * width/height header + an md5 body) and "decoding" parses that header /
  * derives frame hashes. Everything AROUND the stub is the real 100 TB
  * plumbing this surface exists to exercise: binary columns survive
  * parquet/shuffle untouched, metadata extraction is a codegen'd
  * projection (no UDF), per-frame explosion is a lateral view whose
  * output partitioning follows the input, and the one genuinely
  * imperative step (byte-level feature extraction) is `mapPartitions`
  * over Rows — the Scala analogue of a pandas-batch UDF: whole-partition
  * batches in, an iterator of typed results out. Swapping the stub for a
  * real JNI/codec call changes none of the dataflow.
  */
object MultimodalOps {

  /** Synthesized image corpus: 24-byte payload = 4-byte width, 4-byte
    * height (big-endian, hex-packed), 16-byte md5 body; dimensions are
    * deterministic functions of doc_id. */
  private def corpus(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      unhex(concat(
        lpad(hex(expr("64 + doc_id % 512")), 8, "0"),
        lpad(hex(expr("64 + (doc_id * 7) % 512")), 8, "0"),
        md5(col("text")))).as("img"))

  val all: List[Q] = List(

    // ---- metadata decode: parse the binary header ---------------------
    // The Spark side genuinely round-trips through the binary column
    // (hex -> substring -> conv); the oracle recomputes ground truth from
    // doc_id, so a corrupted pack/unpack would mismatch.
    Q("p_mm_metadata",
      (s, dir) => corpus(s, dir).select(
        col("doc_id"),
        expr("cast(conv(substring(hex(img), 1, 8), 16, 10) as bigint)").as("width"),
        expr("cast(conv(substring(hex(img), 9, 8), 16, 10) as bigint)").as("height"),
        length(col("img")).as("n_bytes")),
      Some("""SELECT doc_id, 64 + doc_id % 512 AS width,
             |       64 + (doc_id * 7) % 512 AS height,
             |       24 AS n_bytes
             |FROM documents""".stripMargin)),

    // ---- resize (stub): halve dimensions, fingerprint the thumb -------
    Q("p_mm_resize",
      (s, dir) => corpus(s, dir).select(
        col("doc_id"),
        expr("cast(conv(substring(hex(img), 1, 8), 16, 10) as bigint) div 2").as("new_w"),
        expr("cast(conv(substring(hex(img), 9, 8), 16, 10) as bigint) div 2").as("new_h"),
        md5(concat(hex(col("img")), lit(":thumb"))).as("thumb_hash")),
      Some("""SELECT doc_id,
             |  (64 + doc_id % 512) // 2 AS new_w,
             |  (64 + (doc_id * 7) % 512) // 2 AS new_h,
             |  md5(upper(lpad(to_hex(64 + doc_id % 512), 8, '0')
             |        || lpad(to_hex(64 + (doc_id * 7) % 512), 8, '0')
             |        || md5(text)) || ':thumb') AS thumb_hash
             |FROM documents""".stripMargin)),

    // ---- video frame sampling (stub): every 3rd of n frames -----------
    // Frame count is per-row metadata; the explode is a lateral view —
    // at scale the output inherits the scan partitioning, no shuffle.
    Q("p_mm_framesample",
      (s, dir) => corpus(s, dir)
        .withColumn("n_frames", expr("1 + doc_id % 10"))
        .select(col("doc_id"),
          explode(expr("filter(sequence(0, n_frames - 1), k -> k % 3 = 0)")).as("frame_idx"),
          col("img"))
        .withColumn("frame_hash",
          md5(concat(hex(col("img")), lit(":"), col("frame_idx"))))
        .select(col("doc_id"), col("frame_idx"), col("frame_hash")),
      Some("""WITH f AS (SELECT doc_id,
             |    upper(lpad(to_hex(64 + doc_id % 512), 8, '0')
             |      || lpad(to_hex(64 + (doc_id * 7) % 512), 8, '0')
             |      || md5(text)) AS h,
             |    unnest(range(1 + doc_id % 10)) AS frame_idx
             |  FROM documents)
             |SELECT doc_id, frame_idx, md5(h || ':' || frame_idx::VARCHAR) AS frame_hash
             |FROM f WHERE frame_idx % 3 = 0""".stripMargin)),

    // ---- audio chunking (stub): fixed windows + per-window energy -----
    // The audio-modality shape: one payload row explodes to fixed-length
    // sample windows (lateral view, no shuffle), and the per-window
    // "energy" is computed IN the row with higher-order functions
    // (transform over the window's byte offsets folded by aggregate) —
    // fully codegen-free of UDFs. A real pipeline swaps the hex-byte
    // slice for PCM frames; the explode + in-row fold dataflow is
    // unchanged. 16-byte body = 4 windows of 4 bytes.
    Q("p_mm_audio_chunks",
      (s, dir) => corpus(s, dir)
        .withColumn("body", expr("substring(hex(img), 17, 32)"))
        .select(col("doc_id"), col("body"),
          explode(expr("sequence(0, 3)")).as("chunk"))
        .withColumn("energy", expr(
          """aggregate(transform(sequence(0, 3),
            |  i -> cast(conv(substring(body, 1 + 2 * (4 * chunk + i), 2), 16, 10) as bigint)),
            |  0L, (acc, x) -> acc + x)""".stripMargin))
        .select(col("doc_id"), col("chunk"), col("energy")),
      Some("""WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
             |c AS (SELECT doc_id, hx, unnest(range(4)) AS chunk FROM h)
             |SELECT doc_id, chunk,
             |  CAST(list_sum(list_transform(range(4), i ->
             |    (strpos('0123456789abcdef', substr(hx, 1 + 2 * (4 * chunk + i), 1)) - 1) * 16
             |    + (strpos('0123456789abcdef', substr(hx, 2 + 2 * (4 * chunk + i), 1)) - 1)))
             |    AS BIGINT) AS energy
             |FROM c""".stripMargin)),

    // ---- byte-level feature extraction via mapPartitions --------------
    // The pandas-batch-UDF analogue: whole partitions of binary payloads
    // in, typed feature rows out. The stub "features" are byte statistics
    // a real decoder would replace with pixel statistics. The mean is an
    // EXACT double (integer byte sum / 16 — a power-of-two division is
    // lossless in IEEE), so the oracle recomputes it bit-identically from
    // unhexed md5(text) bytes and the entry is fully hash-checked
    // (VERDICT r02 item 5: was rows-only).
    Q("p_mm_features",
      (s, dir) => {
        val sp = s
        import sp.implicits._
        corpus(s, dir)
          .select(col("doc_id"), col("img"))
          .as[(Long, Array[Byte])]
          .mapPartitions { rows =>
            rows.map { case (id, bytes) =>
              val body = bytes.drop(8)
              val mean = body.map(b => (b & 0xff).toLong).sum.toDouble / body.length
              val maxB = body.map(b => b & 0xff).max
              (id, mean, maxB, bytes.length)
            }
          }
          .toDF("doc_id", "mean_byte", "max_byte", "n_bytes")
      },
      Some("""WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
             |b AS (SELECT doc_id, list_transform(range(16), i ->
             |        (strpos('0123456789abcdef', substr(hx, 1 + i*2, 1)) - 1) * 16
             |        + (strpos('0123456789abcdef', substr(hx, 2 + i*2, 1)) - 1)) AS bytes
             |      FROM h)
             |SELECT doc_id,
             |       list_sum(bytes)::DOUBLE / 16 AS mean_byte,
             |       list_max(bytes) AS max_byte,
             |       24 AS n_bytes
             |FROM b""".stripMargin)),

    // ---- perceptual-hash slot: byte-4-gram simhash over the payload ---
    // The multimodal near-dup primitive: a 64-bit locality-sensitive
    // fingerprint computed directly ON THE BINARY COLUMN (byte 4-grams
    // of the payload = hex 8-grams at byte stride — the same tally
    // construction as DedupOps.simhash, applied to bytes instead of
    // words), so visually-near payloads hash to Hamming-near codes. A
    // real integration swaps the byte shingles for decoded-raster
    // features (pHash DCT coefficients) inside the SAME projection —
    // fingerprint width, banding, and the downstream Hamming join (see
    // p_dedup_simhash_pairs) are unchanged. Zero-shuffle until the
    // per-doc tally aggregation; no UDFs.
    Q("p_mm_phash",
      (s, dir) => {
        val feats = corpus(s, dir)
          .select(col("doc_id"), lower(hex(col("img"))).as("hx"))
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, 20), i -> substring(hx, 1 + 2 * i, 8))")).as("f"))
          .select(col("doc_id"), md5(col("f")).as("h"))
        val tallies = (0 until 64).map { j =>
          val digit = s"(instr('0123456789abcdef', substring(h, ${1 + j / 4}, 1)) - 1)"
          val shift = Seq(8, 4, 2, 1)(j % 4)
          sum(expr(s"2 * (($digit div $shift) % 2) - 1")).as(s"t$j")
        }
        feats.groupBy("doc_id").agg(tallies.head, tallies.tail: _*)
          .select(col("doc_id"),
            concat((0 until 64).map(j => when(col(s"t$j") > 0, "1").otherwise("0")): _*)
              .as("phash"))
      },
      Some("""WITH img AS (SELECT doc_id, lower(concat(
             |         lpad(to_hex(64 + doc_id % 512), 8, '0'),
             |         lpad(to_hex(64 + (doc_id * 7) % 512), 8, '0'),
             |         md5(text))) AS hx FROM documents),
             |feats AS (SELECT doc_id, substr(hx, 1 + 2 * i, 8) AS f
             |          FROM img, (SELECT unnest(range(21)) AS i)),
             |fc AS (SELECT doc_id, f, count(*) AS cnt FROM feats GROUP BY doc_id, f),
             |bits AS (SELECT doc_id, j,
             |           sum(cnt * (2 * ((strpos('0123456789abcdef',
             |                               substr(md5(f), 1 + (j // 4), 1)) - 1)
             |                           // (CASE j % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
             |                                          WHEN 2 THEN 2 ELSE 1 END) % 2) - 1)) AS tally
             |         FROM fc, (SELECT unnest(range(64)) AS j)
             |         GROUP BY doc_id, j)
             |SELECT doc_id,
             |       string_agg(CASE WHEN tally > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS phash
             |FROM bits GROUP BY doc_id""".stripMargin)),
  )
}
