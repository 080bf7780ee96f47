package graft

import org.apache.spark.sql.Row
import graft.engine.Engine

/** Result sinks mirroring the reference's Display module
  * (/root/reference/graphDB/lib/display.ml): a LaTeX rendering of the
  * binding table (display.ml:92-113) and a Graphviz dot rendering of the
  * graph (display.ml:26-55). Pure string building over collected results
  * — these are terminal render sinks for human consumption, so a driver
  * collect is correct here (everything upstream stays distributed; the
  * reference additionally shells out to pdflatex/dot, which this
  * container doesn't have — emitting the .tex/.dot artifacts is the
  * engine-side contract).
  */
object Display {

  /** LaTeX table document (shape of display.ml:92-113: `l` column
    * format, `&`-joined header and rows, empty-table special case). */
  def tableTex(header: Seq[String], rows: Seq[Seq[Any]]): String = {
    val colFormat = if (header.isEmpty) "l" else "l" * header.length
    val body =
      if (header.isEmpty) "- \\\\ \\hline  -"
      else {
        val hdr = header.mkString("&") + "\\\\\n\\hline\n"
        val lines = rows.map(_.mkString("&")).mkString("\\\\\n")
        hdr + lines + "\n"
      }
    "\\documentclass{article}[12pt]\n\\begin{document}\n\\centering\n" +
      s"\\begin{tabular}{$colFormat}\n" + body + "\\end{tabular}\n\n  \\end{document}\n"
  }

  /** Graphviz digraph (shape of display.ml:26-55: box vertices labeled
    * `id:label{attr value, …}`, edges labeled with the relation name).
    * Deterministic order: nodes by id, edges by (src, label, dst). */
  def graphDot(r: Engine.QueryResult): String = {
    val sb = new StringBuilder("digraph G {\n")
    val nodes = r.graph.nodes.toSeq.sortBy(_._1).flatMap { case (label, df) =>
      val fields = df.schema.fields.toSeq.drop(1)
      df.collect().map { row =>
        val attrs = fields.flatMap { f =>
          Option(row.get(row.fieldIndex(f.name))).map {
            case s: String => s"${f.name} \\\"$s\\\""
            case v         => s"${f.name} $v"
          }
        }
        row.getLong(0) -> s"${row.getLong(0)}:$label{${attrs.mkString(", ")}}"
      }
    }.sortBy(_._1)
    nodes.foreach { case (id, lbl) =>
      sb ++= s"""  $id [shape=box, fontcolor=red, label="$lbl"];\n"""
    }
    val edges = r.graph.edges.toSeq.flatMap { case ((_, rl, _), df) =>
      df.collect().map(row => (row.getLong(0), rl, row.getLong(1)))
    }.sorted
    edges.foreach { case (s, rl, t) =>
      sb ++= s"""  $s -> $t [label="$rl"];\n"""
    }
    sb ++= "}\n"
    sb.result()
  }

  /** Binding table in collected, canonically ordered form. */
  def collectTable(r: Engine.QueryResult): (Seq[String], Seq[Seq[Any]]) = {
    val header = r.bindings.columns.toSeq
    val rows = r.bindings.collect().toSeq
      .map((row: Row) => row.toSeq)
      .sortBy(_.mkString("\u0000"))
    (header, rows)
  }
}
