package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** Restart-recovery of stateful Structured Streaming (VERDICT r05 item
  * 7): `p_stream_file_sink` pins exactly-once on the SINK side; this
  * pins the STATE side — a stateful query stopped mid-stream and
  * restarted against the same checkpoint must (a) not reprocess
  * committed batches and (b) resume its per-key state exactly where it
  * left off, so the union of both runs' emissions equals the
  * uninterrupted computation. That is the production recovery property:
  * a crashed executor/driver resumes from the offset log + state store,
  * not from zero.
  *
  * Shape: per-user running sequence numbers via flatMapGroupsWithState
  * (the p_stream_user_seq transform) over a file source. Phase A sees
  * only the early half of the events; the late half lands while the
  * query is down; phase B restarts on the same checkpoint and processes
  * just the new file, numbering each user's events FROM THE RECOVERED
  * COUNTER. Compared against a batch ROW_NUMBER over the whole table.
  */
class StreamRecoverySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Events with ts normalized to TimestampType (mirrors the operators'
    * PipeData.events — handles both the TIMESTAMP(NANOS) and the
    * timestamp[us] source layouts the driver's generator has shipped). */
  private def events = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Write `df` as a single parquet file at `dest`. */
  private def writeOne(df: org.apache.spark.sql.DataFrame,
      dest: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val tmp = dest.getParent.resolve(dest.getFileName.toString + "_tmp")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val listing = java.nio.file.Files.list(tmp)
    val part =
      try listing.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally listing.close()
    java.nio.file.Files.move(part, dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("stateful restart on the same checkpoint: no reprocessing, state resumes") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_recovery_")
    val src = root.resolve("src"); java.nio.file.Files.createDirectories(src)
    val ckpt = root.resolve("ckpt").toString

    val out = root.resolve("out").toString
    val mid = events.withColumn("__us", unix_micros(col("ts")))
      .stat.approxQuantile("__us", Array(0.5), 0.001)(0).toLong
    val early = events.filter(unix_micros(col("ts")) <= mid)
    val late = events.filter(unix_micros(col("ts")) > mid)
    val schema = events.schema

    writeOne(early, src.resolve("events_00.parquet"))

    // the memory sink refuses checkpoint recovery by design; the parquet
    // file sink is the fault-tolerant one (batch-atomic _spark_metadata
    // commits), so recovery is exercised through it
    def runPhase(): Unit = {
      val typed = spark.readStream.schema(schema).parquet(src.toString)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsl"))
        .as[(Long, Long, Long)]
      val seqd = typed.groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
          (user: Long, evs: Iterator[(Long, Long, Long)], state: GroupState[Long]) => {
            val base = state.getOption.getOrElse(0L)
            val ordered = evs.toSeq.sortBy(e => (e._3, e._2))
            state.update(base + ordered.size)
            ordered.iterator.zipWithIndex.map { case ((_, eid, _), i) =>
              (user, eid, base + i + 1)
            }
          })
      val q = seqd.toDF("user_id", "event_id", "seq")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }

    def sinkRows(): Array[(Long, Long, Long)] =
      spark.read.schema("user_id LONG, event_id LONG, seq LONG").parquet(out)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    try {
      runPhase()
      val a = sinkRows()
      // the late half lands while the query is DOWN
      writeOne(late, src.resolve("events_01.parquet"))
      runPhase()
      val all = sinkRows()
      val b = all.diff(a)

      // (a) no reprocessing: phase B emits only late-half events
      val earlyIds = early.select("event_id").collect().map(_.getLong(0)).toSet
      assert(b.forall { case (_, eid, _) => !earlyIds(eid) },
        "restart reprocessed an already-committed batch")
      assert(a.nonEmpty && b.nonEmpty)

      // (b) state resumed: A ∪ B equals the uninterrupted ROW_NUMBER
      val want = events
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsl"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).iterator.flatMap { case (u, es) =>
          es.sortBy(e => (e._3, e._2)).zipWithIndex.map { case ((_, eid, _), i) =>
            (u, eid, i + 1L)
          }
        }.toSet
      assert((a ++ b).toSet == want,
        "recovered state did not continue the uninterrupted numbering")
    } finally {
      org.apache.spark.sql.GraftShim.unloadStreamingState()
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }

  test("foreachBatch upsert: restart resumes from the offset log; replayed merge is idempotent") {
    import graft.operators.StreamingOps
    val root = java.nio.file.Files.createTempDirectory("graft_upsert_rec_")
    val src = root.resolve("src"); java.nio.file.Files.createDirectories(src)
    val ckpt = root.resolve("ckpt").toString
    val mid = events.withColumn("__us", unix_micros(col("ts")))
      .stat.approxQuantile("__us", Array(0.5), 0.001)(0).toLong
    val early = events.filter(unix_micros(col("ts")) <= mid)
    val late = events.filter(unix_micros(col("ts")) > mid)
    val schema = events.schema
    writeOne(early, src.resolve("events_00.parquet"))

    // the serving target survives across phases (in production it is a
    // durable table; the driver-held frame plays that role here)
    var target: org.apache.spark.sql.DataFrame = null
    var lastInc: org.apache.spark.sql.DataFrame = null
    def runPhase(): Int = {
      val q = spark.readStream.schema(schema).parquet(src.toString)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val inc = graft.Ckpt.eagerPartitioned(StreamingOps.upsertReduce(b))
          target = graft.Ckpt.eagerPartitioned(
            if (target == null) inc else StreamingOps.upsertMerge(target, inc))
          lastInc = inc
          ()
        }
        .start()
      try { q.awaitTermination(); q.recentProgress.count(_.numInputRows > 0) }
      finally q.stop()
    }

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3))).toSet

    try {
      runPhase()
      val afterA = rows(target)
      // the late half lands while the query is DOWN
      writeOne(late, src.resolve("events_01.parquet"))
      val batchesB = runPhase()
      // (a) restart did NOT reprocess the committed early file
      assert(batchesB == 1, s"phase B processed $batchesB data batches, expected 1 (late file only)")
      val afterB = rows(target)
      assert(afterB != afterA)
      // (b) final table state equals the batch latest-per-key over ALL events
      val want = SparkEntry.queries("p_events_latest")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3))).toSet
      assert(afterB == want, "recovered upsert diverged from the uninterrupted latest-per-key")
      // (c) a replayed micro-batch is a no-op: re-merging the already-
      // applied last batch changes nothing — the property that makes
      // foreachBatch's at-least-once replay after a crash exactly-once
      // in table state
      assert(rows(StreamingOps.upsertMerge(target, lastInc)) == afterB,
        "upsert merge is not idempotent under batch replay")
    } finally {
      org.apache.spark.sql.GraftShim.unloadStreamingState()
      graft.Ckpt.drain()
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }
}
