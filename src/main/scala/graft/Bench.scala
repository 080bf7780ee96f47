package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A failing query is recorded under "errors" (not
  * as a bogus fast timing — ADVICE/VERDICT r02: swallowing failures lets a
  * regression hide inside a good-looking bench) and the process exits
  * nonzero. SPARK_GRAFT_RUNS=N (default 1) times each query N times and
  * reports the per-query MEDIAN — BASELINE.md notes ±15% single-run
  * variance, so the driver or a human can ask for a 3-run median. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "1").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.foreach { case (name, fn) =>
      val samples = (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.next().take(200)
            None
        }
      }
      if (samples.nonEmpty) timings(name) = samples.sorted.apply(samples.size / 2)
    }
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val qs = timings.map { case (k, v) => s"\"${esc(k)}\":$v" }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"\"${esc(k)}\":\"${esc(v)}\"" }.mkString("{", ",", "}")
    val total = timings.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"runs":$runs,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
