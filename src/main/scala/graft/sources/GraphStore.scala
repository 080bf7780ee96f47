package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.engine.PropertyGraph
import graft.lang.{BoolT, IntT, StringT, Normalize, Parser, Typing}

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

  def save(g: PropertyGraph, dir: String, partitions: Int = 32): Unit = {
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
  }

  def load(spark: SparkSession, dir: String): PropertyGraph = {
    val header = java.nio.file.Files.readString(java.nio.file.Paths.get(dir, "schema.gql"))
    val schema = Typing.checkGraphTypes(Normalize.normalize(Parser.parse(header)).types)
      .fold(e => throw new IllegalArgumentException(s"stored schema invalid: $e"), identity)
    PropertyGraph(
      schema,
      schema.nodeAttrs.keys.map { l =>
        l -> spark.read.schema(PropertyGraph.nodeSchema(schema, l))
          .parquet(s"$dir/nodes/${enc(l)}")
      }.toMap,
      schema.relTypes.map { case rt @ (s, r, t) =>
        rt -> spark.read.schema(PropertyGraph.edgeSchema)
          .parquet(edgePath(dir, s, r, t))
      }.toMap)
  }

  /** Schema as MiniGQL declarations (the parser's own syntax). */
  def schemaGql(schema: Typing.Schema): String = {
    val nodes = schema.nodeAttrs.toSeq.sortBy(_._1).map { case (l, attrs) =>
      val as = attrs.map { case (f, tp) =>
        val t = tp match { case BoolT => "bool"; case IntT => "int"; case StringT => "string" }
        s"$f $t"
      }.mkString(", ")
      s"(:$l {$as})"
    }
    val rels = schema.relTypes.toSeq.sorted.map { case (s, r, t) =>
      s"(:$s) -[:$r]-> (:$t)"
    }
    (nodes ++ rels).mkString("", "\n", "\n")
  }
}
