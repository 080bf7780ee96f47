package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared readers/derivations for the training-data pipeline operators
  * (dedup, similarity, text analysis) over the driver's `documents` /
  * `embeddings` / `events` parquet tables.
  *
  * Cross-engine determinism rules used throughout the pipeline inventory
  * (every operator is verified against a DuckDB oracle that replays the
  * same computation, so each primitive must be bit-identical in both):
  *
  *   - Hashing is `md5` over identical argument strings — standard
  *     lowercase-hex MD5 in both engines; minhash minima are lexicographic
  *     minima over the hex strings (ASCII order, engine-independent).
  *   - Float math goes through 1e-6 fixed-point quantization: vectors
  *     become int64 arrays, dot products and norms are exact integer sums
  *     (order-free, so shuffle/partition layout can't perturb them), and
  *     only the final cosine divides through `double` with the identical
  *     expression on both sides (IEEE ops on identical inputs are
  *     bit-identical).
  *   - Aggregated doubles are never compared raw: anything built by a
  *     grouped float sum is quantized first for the same reason.
  */
private[operators] object PipeData {

  def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Content tag of a source dataset directory: MD5 over the resolved
    * path PLUS the (relative path, size, mtime) of every parquet file
    * under it — the srcTag discipline StreamingOps staging and
    * GraphLoader's id store already follow (ADVICE r04: IoOps scratch
    * dirs and the bucketed warehouse tables were keyed by path alone,
    * so a regenerated dataset at the same path could be served a stale
    * derived layout within a live session). Cheap: one directory walk
    * over a handful of files, no data read. */
  private[graft] def contentTag(dir: String, len: Int = 12): String = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir).toRealPath()
    val walk = java.nio.file.Files.walk(root)
    val fingerprint =
      try walk.iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .map(p => s"${root.relativize(p)}:${java.nio.file.Files.size(p)}:" +
          java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .toSeq.sorted.mkString("\n")
      finally walk.close()
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$root\n$fingerprint".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(len)
  }

  def embeddings(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Events table with `ts` normalized to TimestampType (a UTC instant —
    * every session here pins spark.sql.session.timeZone=UTC). The
    * driver's generator has shipped the column under two physical
    * layouts: TIMESTAMP(NANOS), which Spark 4 rejects without the
    * nanosAsLong legacy conf (read as raw int64 nanos, convert), and
    * plain timestamp[us], which reads natively as TimestampNTZ (naive
    * UTC micros — cast to the instant type). Both encode the same UTC
    * wall-clock values, so downstream operators and the DuckDB oracles
    * (which read the parquet natively as a timestamp either way) see
    * identical instants regardless of layout. */
  def events(s: SparkSession, dir: String): DataFrame = {
    // harmless when the layout is not nanos; required before the read
    // when it is (schema resolution itself throws otherwise)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** Documents split to a word array (texts are single-space separated). */
  def words(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), col("lang"), col("n_chars"),
      split(col("text"), " ").as("ws"))

  /** The distinct word-3-gram shingle set per document — the unit of all
    * set-similarity dedup. One narrow shuffle (the distinct); at cluster
    * scale this is the shared "shingle index" you materialize once and
    * reuse across the dedup family. */
  def shingles(s: SparkSession, dir: String): DataFrame =
    words(s, dir)
      .filter(size(col("ws")) >= 3) // Spark sequence(0, n) descends for n<0
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws)-3), i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2]))"))
        .as("shingle"))
      .distinct()

  /** Embeddings quantized to 1e-6 fixed point (int64) plus exact squared
    * norm. Quantization makes every downstream dot product an exact
    * integer — reproducible across engines, partitionings, and summation
    * orders, which raw float32 accumulation is not. */
  def quantized(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    embeddings(s, dir)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(round(cast(x as double) * 1000000, 0) as bigint))")
          .as("q"))
      .withColumn("nrm", expr("array_dot_long(q, q)"))
  }

  /** Exact cosine between two quantized vectors: integer dot (native
    * codegen'd expression — see graft.functions.ArrayDotLong), one double
    * division with the identical expression shape in the oracles. */
  def cosine(qa: String, na: String, qb: String, nb: String) = expr(
    s"cast(array_dot_long($qa, $qb) as double)" +
      s" / (sqrt(cast($na as double)) * sqrt(cast($nb as double)))")

  /** Idempotent content-fingerprinted bucketed table: builds (once per
    * dataset generation) a warehouse table bucketed+sorted on `key` and
    * returns its name. Extracted from q_join_bucketed so every op that
    * persists a co-location layout shares one implementation. The name
    * carries [[contentTag]] (ADVICE r04: regenerated data mints fresh
    * tables); stale-tag siblings are reaped exactly (ADVICE r05/r06:
    * base name + one 8-hex tag, catalog entry dropped before the dir). */
  def bucketedTable(s: SparkSession, base: String, dir: String, key: String,
      buckets: Int)(df: => DataFrame): String = {
    val name = s"${base}_${contentTag(dir, 8)}"
    if (!s.catalog.tableExists(name)) {
      val wh = java.net.URI.create(s.conf.get("spark.sql.warehouse.dir")).getPath
      val sibling = java.util.regex.Pattern.compile(
        java.util.regex.Pattern.quote(s"${base}_") + "[0-9a-f]{8}")
      Option(new java.io.File(wh).listFiles()).getOrElse(Array.empty)
        .foreach { f =>
          if (sibling.matcher(f.getName).matches() && f.getName != name) {
            if (s.catalog.tableExists(f.getName))
              s.sql(s"DROP TABLE IF EXISTS ${f.getName}")
            org.apache.commons.io.FileUtils.deleteQuietly(f)
          }
        }
      val loc = new java.io.File(wh, name)
      if (loc.exists())
        org.apache.commons.io.FileUtils.deleteDirectory(loc)
      df.write.mode("overwrite").bucketBy(buckets, key)
        .sortBy(key).format("parquet").saveAsTable(name)
    }
    name
  }
}
