package graft

import org.apache.spark.sql.SparkSession
import graft.engine.{Engine, PropertyGraph}

/** Batch CLI mirroring the reference driver
  * (/root/reference/graphDB/bin/main.ml:5-13, lib/interf.ml:61-68):
  * `runMain graft.Cli f <file.q>` parses, typechecks, executes, and prints
  * the resulting graph and binding table in canonical order (nodes by id,
  * edges by (src,label,dst), binding rows lexicographically — the
  * reference's list order is an implementation detail, SURVEY.md §5.2).
  */
object Cli {
  def main(args: Array[String]): Unit = args.toList match {
    case "f" :: file :: Nil =>
      val src = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file)))
      val spark = SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
        .appName("graft-cli")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      try {
        val r = Engine.runSource(spark, src)
        print(render(r))
      } finally spark.stop()
    case _ =>
      System.err.println("usage: graft.Cli f <file.q>")
      sys.exit(2)
  }

  def render(r: Engine.QueryResult): String = {
    val sb = new StringBuilder
    sb ++= "Graph nodes:\n"
    r.graph.nodes.toSeq.sortBy(_._1).foreach { case (label, df) =>
      df.orderBy("id").collect().foreach { row =>
        val attrs = df.schema.fields.toSeq.drop(1).flatMap { f =>
          Option(row.get(row.fieldIndex(f.name))).map(v => s"${f.name}=$v")
        }
        sb ++= s"  ${row.getLong(0)}:$label{${attrs.mkString(", ")}}\n"
      }
    }
    sb ++= "Graph edges:\n"
    r.graph.edges.toSeq.sortBy { case ((s, l, t), _) => (s, l, t) }.foreach {
      case ((_, rl, _), df) =>
        df.orderBy("src", "dst").collect().foreach { row =>
          sb ++= s"  (${row.getLong(0)}) -[:$rl]-> (${row.getLong(1)})\n"
        }
    }
    val cols = r.bindings.columns
    sb ++= s"Table [${cols.mkString(", ")}]:\n"
    r.bindings.collect().map(_.toSeq.mkString("  [", ", ", "]"))
      .sorted.foreach(l => sb ++= l + "\n")
    sb.result()
  }
}
