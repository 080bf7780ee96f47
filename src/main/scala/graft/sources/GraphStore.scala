package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.engine.PropertyGraph
import graft.lang.{BoolT, IntT, ListT, StringT, Normalize, Parser, Typing}

/** Persistent graph storage: one parquet dataset per node label and per
  * relation type, plus the schema serialized in MiniGQL's own declaration
  * syntax (`schema.gql`), so a stored graph round-trips through the
  * language front end it serves.
  *
  * Layout (the 100 TB shape — each label/relation is an independent
  * dataset a cluster can scan, prune, and join co-located):
  *
  *   dir/schema.gql
  *   dir/nodes/<label>/   — hash-repartitioned and sorted by id
  *   dir/edges/<src>_<rel>_<tgt>/ — repartitioned by src, sorted (src,dst)
  *
  * Sorting within files gives parquet min/max row-group stats, so id- and
  * src-keyed lookups prune row groups at scan time; the repartition keys
  * match the join keys the engine uses (id for attribute joins and
  * deletes, src for edge expansion).
  */
object GraphStore {

  /** Injective path component encoding: ASCII alnum passes through,
    * everything else (notably `_`, the separator) is percent-encoded as
    * UTF-8 bytes — each byte < 256, so always exactly two hex digits,
    * making the encoding prefix-free and therefore injective (ADVICE
    * r02/r03: variable-width `%<codepoint>` let `%2028` parse two ways,
    * and non-ASCII "letters" passed through unencoded). MiniGQL
    * identifiers are ASCII-alnum-only (lexer.mll:81), so for graphs
    * built through the language this is the identity. */
  private def enc(s: String): String =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).flatMap { b =>
      val c = b.toChar
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9'))
        c.toString
      else f"%%${b & 0xFF}%02X"
    }.mkString

  private def edgePath(dir: String, s: String, r: String, t: String): String =
    s"$dir/edges/${enc(s)}_${enc(r)}_${enc(t)}"

  /** `nextId` is the engine's post-query id counter (QueryResult.nextId):
    * without it a reloaded graph re-derives the counter from whatever the
    * caller passes, and a stale value COLLIDES new node ids with stored
    * ones (VERDICT r09 item 8). Persisted as a 1-line metadata file next
    * to the schema. */
  def save(g: PropertyGraph, nextId: Long, dir: String, partitions: Int = 32): Unit = {
    val header = schemaGql(g.schema)
    g.nodes.foreach { case (label, df) =>
      df.repartition(partitions, col("id")).sortWithinPartitions("id")
        .write.mode("overwrite").parquet(s"$dir/nodes/${enc(label)}")
    }
    g.edges.foreach { case ((s, r, t), df) =>
      df.repartition(partitions, col("src")).sortWithinPartitions("src", "dst")
        .write.mode("overwrite").parquet(edgePath(dir, s, r, t))
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "schema.gql"), header)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "next_id"),
      s"$nextId\n")
  }

  /** Returns (graph, nextId). A store written before the counter was
    * persisted derives nextId = max stored id + 1 — correct for any
    * densely- or sparsely-idd graph (new ids start above everything
    * stored), at the cost of one scan over the node frames' id columns. */
  def load(spark: SparkSession, dir: String): (PropertyGraph, Long) = {
    val header = java.nio.file.Files.readString(java.nio.file.Paths.get(dir, "schema.gql"))
    val schema = Typing.checkGraphTypes(Normalize.normalize(Parser.parse(header)).types)
      .fold(e => throw new IllegalArgumentException(s"stored schema invalid: $e"), identity)
    val g = PropertyGraph(
      schema,
      schema.nodeAttrs.keys.map { l =>
        l -> spark.read.schema(PropertyGraph.nodeSchema(schema, l))
          .parquet(s"$dir/nodes/${enc(l)}")
      }.toMap,
      schema.relTypes.map { case rt @ (s, r, t) =>
        rt -> spark.read.schema(PropertyGraph.edgeSchema(schema, rt))
          .parquet(edgePath(dir, s, r, t))
      }.toMap)
    val metaPath = java.nio.file.Paths.get(dir, "next_id")
    val nextId =
      if (java.nio.file.Files.exists(metaPath))
        java.nio.file.Files.readString(metaPath).trim.toLong
      else maxIdPlusOne(g)
    (g, nextId)
  }

  /** Legacy-store fallback: the smallest id that cannot collide. */
  private def maxIdPlusOne(g: PropertyGraph): Long =
    g.nodes.values.map { df =>
      df.agg(org.apache.spark.sql.functions.max(col("id"))).collect()(0) match {
        case row if row.isNullAt(0) => 0L // empty label frame
        case row                    => row.getLong(0) + 1L
      }
    }.foldLeft(0L)(math.max)

  // --- bucketed catalog variant (SURVEY §9.3(1) deployment knob) -----

  /** Catalog-safe table-name component: a lowercase alnum echo of the
    * label for readability plus an md5 fragment for injectivity —
    * catalog names are case-INsensitive and `[a-z0-9_]`-shaped, so the
    * percent-encoding used for paths (and label case itself) can't
    * carry the identity; the hash does. */
  private def tblComp(parts: String*): String = {
    val joined = parts.mkString("\u0000") // NUL never occurs in labels
    val readable = parts.map(_.toLowerCase.filter(c =>
      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9'))).mkString("_")
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(joined.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    s"${readable}_$h"
  }

  private def nodeTable(name: String, l: String): String =
    s"${name}_nodes_${tblComp(l)}"
  private def edgeTable(name: String, s: String, r: String, t: String): String =
    s"${name}_edges_${tblComp(s, r, t)}"
  private def schemaTable(name: String): String = s"${name}_schema"

  /** Drop-and-clear before saveAsTable: the in-memory catalog dies with
    * the session but the warehouse directory persists, and Spark refuses
    * a managed-table location it doesn't own (same discipline as the
    * RelOps bucketed-layout builder). */
  private def freshTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = new java.io.File(wh, table)
    if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
  }

  /** Save as BUCKETED catalog tables: nodes `bucketBy(id)`, edges
    * `bucketBy(src)` (equal bucket counts), both sorted within buckets.
    *
    * This is the recurring-query layout the plain parquet [[save]] can't
    * express (path-written parquet has no bucket metadata): a RE-LOADED
    * graph's match-edge / varpath expansions join a node scan bucketed
    * by `id` against an edge frame bucketed by `src` on equal bucket
    * counts — a bucket-aligned sort-merge join with NO exchange on
    * either side for the first hop, and no exchange on the EDGE side of
    * every later hop (only the re-keyed binding table moves). At 100 TB
    * that converts every pattern-match join from two table-sized
    * shuffles into at most one binding-table-sized one; StoreSpec
    * round-trips the data, PlanSpec pins the exchange shape. */
  def saveBucketed(g: PropertyGraph, nextId: Long, spark: SparkSession,
      name: String, buckets: Int = 32): Unit = {
    require(name.matches("[A-Za-z0-9_]+"), s"catalog-unsafe store name $name")
    g.nodes.foreach { case (label, df) =>
      val t = nodeTable(name, label)
      freshTable(spark, t)
      df.write.mode("overwrite").bucketBy(buckets, "id").sortBy("id")
        .format("parquet").saveAsTable(t)
    }
    g.edges.foreach { case ((s, r, t0), df) =>
      val t = edgeTable(name, s, r, t0)
      freshTable(spark, t)
      df.write.mode("overwrite").bucketBy(buckets, "src").sortBy("src", "dst")
        .format("parquet").saveAsTable(t)
    }
    val st = schemaTable(name)
    freshTable(spark, st)
    import spark.implicits._
    // the id counter rides the 1-row schema table (the catalog-side
    // twin of the path store's next_id file)
    Seq((schemaGql(g.schema), nextId)).toDF("gql", "next_id")
      .write.mode("overwrite").format("parquet").saveAsTable(st)
  }

  /** Load a [[saveBucketed]] graph from the session catalog; every frame
    * is a bucketed table scan, so the engine's id/src-keyed joins read
    * bucket-aligned. Returns (graph, nextId); a pre-counter store (1-column
    * schema table) falls back to max stored id + 1, like [[load]]. */
  def loadBucketed(spark: SparkSession, name: String): (PropertyGraph, Long) = {
    val meta = spark.table(schemaTable(name))
    val row = meta.collect()(0)
    val header = row.getString(0)
    val schema = Typing.checkGraphTypes(Normalize.normalize(Parser.parse(header)).types)
      .fold(e => throw new IllegalArgumentException(s"stored schema invalid: $e"), identity)
    val g = PropertyGraph(
      schema,
      schema.nodeAttrs.keys.map(l => l -> spark.table(nodeTable(name, l))).toMap,
      schema.relTypes.map { case rt @ (s, r, t) =>
        rt -> spark.table(edgeTable(name, s, r, t))
      }.toMap)
    val nextId =
      if (meta.columns.contains("next_id")) row.getLong(meta.columns.indexOf("next_id"))
      else maxIdPlusOne(g)
    (g, nextId)
  }

  /** Schema as MiniGQL declarations (the parser's own syntax). */
  def schemaGql(schema: Typing.Schema): String = {
    val nodes = schema.nodeAttrs.toSeq.sortBy(_._1).map { case (l, attrs) =>
      val as = attrs.map { case (f, tp) =>
        val t = tp match { case BoolT => "bool"; case IntT => "int"; case StringT => "string"
          case t: ListT => throw new IllegalStateException(s"undeclarable attr type $t") }
        s"$f $t"
      }.mkString(", ")
      s"(:$l {$as})"
    }
    val rels = schema.relTypes.toSeq.sorted.map { case rt @ (s, r, t) =>
      val attrs = schema.relAttrsOf(rt)
      val as =
        if (attrs.isEmpty) ""
        else attrs.map { case (f, tp) =>
          val t0 = tp match { case BoolT => "bool"; case IntT => "int"; case StringT => "string"
          case t: ListT => throw new IllegalStateException(s"undeclarable attr type $t") }
          s"$f $t0"
        }.mkString(" {", ", ", "}")
      s"(:$s) -[:$r$as]-> (:$t)"
    }
    (nodes ++ rels).mkString("", "\n", "\n")
  }
}
