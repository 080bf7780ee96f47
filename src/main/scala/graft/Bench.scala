package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A failing query is recorded under "errors" (not
  * as a bogus fast timing — ADVICE/VERDICT r02: swallowing failures lets a
  * regression hide inside a good-looking bench) and the process exits
  * nonzero. SPARK_GRAFT_RUNS=N (default 1) times each query N times and
  * reports the per-query MEDIAN — BASELINE.md notes ±15% single-run
  * variance, so the driver or a human can ask for a 3-run median.
  * SPARK_GRAFT_ONLY=a,b,c restricts to the named queries (dev loop). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "1").toInt.max(1)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
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
    // Alphabetical execution order: Map iteration order shifts whenever an
    // operator is added, which silently reassigns one-time warm-up costs
    // (loader cache fill, codegen, shuffle infra) to DIFFERENT queries
    // each round and makes per-query numbers incomparable across rounds
    // (r02→r03 "regressions" were order churn, not code). An explicit
    // SPARK_GRAFT_ONLY list keeps its given order (dev loop).
    val selected = only match {
      case Some(names) => names.flatMap(n => SparkEntry.queries.get(n).map(n -> _))
      case None        => SparkEntry.queries.toSeq.sortBy(_._1)
    }
    selected.foreach { case (name, fn) =>
      val samples = (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        val r =
          try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
          catch {
            case e: Throwable =>
              errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
                .linesIterator.next().take(200)
              None
          }
        // Release the query's leftover checkpoints (outside the timed
        // section): without this, blocks from 78 queries accumulate and
        // the back half of the run measures block-manager churn, not the
        // operators (isolated runs were 2-3× faster than in-sequence).
        Ckpt.drain()
        r
      }
      if (samples.nonEmpty) timings(name) = samples.sorted.apply(samples.size / 2)
    }
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    // 3-decimal (ms) precision keeps the whole line < ~2.5 KB for the full
    // inventory: the driver tail-captures sbt output, and full-precision
    // doubles pushed the line past the capture window in r02/r03
    // (BENCH_r0{2,3}.json "parsed": null — the line's HEAD was cut off).
    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = timings.map { case (k, v) => s"\"${esc(k)}\":${fmt(v)}" }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"\"${esc(k)}\":\"${esc(v)}\"" }.mkString("{", ",", "}")
    val total = timings.values.sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"errors":$errs,"runs":$runs,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
