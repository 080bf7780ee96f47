package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.lang._

/** Spark-native property graph: one DataFrame per declared node label and
  * one per declared relation type.
  *
  * This deliberately diverges from the reference's single node list + single
  * edge list (/root/reference/graphDB/lib/graphstruct.ml:4-8): per-label
  * frames turn every label scan (reference sem.ml:97-99, a full-list filter)
  * into a whole-table read with no filter at all, keep attribute columns
  * exactly typed per label, and let deletes touch only the relation types
  * whose declared endpoints can reference the deleted label. At 100 TB each
  * label/relation maps to its own (partitioned, bucketed) table — the layout
  * a distributed engine wants.
  *
  * Node frame schema: `id LONG` + one typed nullable column per declared
  * attribute. Edge frame schema: `src LONG, dst LONG` (relation label and
  * endpoint labels are carried by the map key; edges have no attributes,
  * matching the reference). Edge frames are kept deduplicated — the
  * reference's set semantics (graphstruct.ml:30-32).
  */
final case class PropertyGraph(
    schema: Typing.Schema,
    nodes: Map[String, DataFrame],
    edges: Map[(String, String, String), DataFrame])

object PropertyGraph {

  def sparkType(tp: AttribTp): DataType = tp match {
    case BoolT   => BooleanType
    case IntT    => LongType
    case StringT => StringType
    // lists are expression-level only (no list attribute declarations);
    // mapped for totality — with-bound collects never reach storage
    case ListT(el) => ArrayType(sparkType(el), containsNull = false)
  }

  def nodeSchema(schema: Typing.Schema, label: String): StructType =
    StructType(
      StructField("id", LongType, nullable = false) +:
        schema.nodeAttrs(label).map { case (f, tp) =>
          StructField(f, sparkType(tp), nullable = true)
        })

  /** Attribute-free edge frame shape (kept for relation types with no
    * declared attrs and for callers that only read endpoints). */
  val edgeSchema: StructType = StructType(Seq(
    StructField("src", LongType, nullable = false),
    StructField("dst", LongType, nullable = false)))

  /** Per-relation edge frame shape: `src, dst` + one typed nullable
    * column per declared edge attribute (round-10 edge properties). */
  def edgeSchema(schema: Typing.Schema, key: (String, String, String)): StructType =
    StructType(
      StructField("src", LongType, nullable = false) ::
        StructField("dst", LongType, nullable = false) ::
        schema.relAttrsOf(key).map { case (f, tp) =>
          StructField(f, sparkType(tp), nullable = true)
        })

  def empty(spark: SparkSession, schema: Typing.Schema): PropertyGraph = {
    def emptyDf(st: StructType): DataFrame =
      spark.createDataFrame(java.util.Collections.emptyList[Row](), st)
    PropertyGraph(
      schema,
      schema.nodeAttrs.keys.map(l => l -> emptyDf(nodeSchema(schema, l))).toMap,
      schema.relTypes.map(rt => rt -> emptyDf(edgeSchema(schema, rt))).toMap)
  }
}
