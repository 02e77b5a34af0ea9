package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal
import graft.streaming.{EventStream, StreamDiff}

/** Streaming + multimodal plumbing tests: the windowed transform runs
  * identically in batch and under a MemoryStream; stateful sessionization
  * emits sessions on event-time timeout; binary frame sampling keeps its
  * bounds.
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("streaming-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("hourlyCounts: stream over MemoryStream == batch over same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      ("2024-01-01 10:05:00", "click", 1.0),
      ("2024-01-01 10:55:00", "click", 2.0),
      ("2024-01-01 11:05:00", "view", 3.0),
      ("2024-01-01 10:20:00", "view", 4.0))
    def toDf(s: Seq[(String, String, Double)]) =
      s.toDF("raw_ts", "event_type", "value")
        .withColumn("ts", to_timestamp(col("raw_ts")))

    val batch = EventStream.hourlyCounts(toDf(rows))
      .orderBy("hour", "event_type").collect()

    val mem = MemoryStream[(String, String, Double)]
    val stream = EventStream.hourlyCounts(
      mem.toDF().toDF("raw_ts", "event_type", "value")
        .withColumn("ts", to_timestamp(col("raw_ts"))))
    val q = stream.writeStream.format("memory")
      .queryName("hourly").outputMode("complete").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("hourly")
        .orderBy("hour", "event_type").collect()
      assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
    } finally q.stop()
  }

  test("changelogReplay: cross-batch delete-then-upsert resurrects the key") {
    import spark.implicits._
    val snap = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val changes = Seq(
      (1L, "a", "D", 1L), // batch 1: delete key 1
      (1L, "a2", "U", 2L), // batch 2: re-upsert key 1 (must resurrect)
      (3L, "c", "I", 2L)) // batch 2: insert new key
      .toDF("k", "v", "__op", "__seq")
    val out = EventStream.changelogReplay(snap, changes, "__seq",
        chunks = 2, Seq("k"), "__op", "__seq")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a2", 2L -> "b", 3L -> "c"),
      s"incremental merges must equal the one-shot merge, got $out")
  }

  test("changelogReplay: per-batch write cost is O(touched partitions), not O(table)") {
    import spark.implicits._
    val snap = (1L to 200L).map(k => (k, s"v$k")).toDF("k", "v")
    val changes = Seq(
      (5L, "u5", "U", 1L), (6L, "u6", "U", 1L), // batch 1: 2 keys
      (300L, "i300", "I", 2L), (10L, "x", "D", 2L)) // batch 2: 2 keys
      .toDF("k", "v", "__op", "__seq")
    val stats = scala.collection.mutable.Buffer.empty[EventStream.CdcBatchStats]
    val out = EventStream.changelogReplay(snap, changes, "__seq",
        chunks = 2, Seq("k"), "__op", "__seq", buckets = 16,
        statsOut = Some(stats))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 200 && out(5L) == "u5" && out(6L) == "u6" &&
      out(300L) == "i300" && !out.contains(10L),
      "merged table must reflect exactly the applied changes")
    assert(stats.size == 2, s"one stats row per micro-batch, got $stats")
    stats.foreach { s =>
      assert(s.totalBuckets == 16)
      // each batch changes 2 keys → at most 2 of 16 partitions read or
      // rewritten; a full-table rewrite would touch all 16
      assert(s.touchedBuckets <= 2,
        s"batch rewrote ${s.touchedBuckets}/16 partitions for 2 changed keys")
      // files written bounded by touched partitions × shuffle width, not
      // by the table's partition count
      assert(s.filesWritten <= s.touchedBuckets * 4,
        s"batch wrote ${s.filesWritten} files for ${s.touchedBuckets} partitions")
    }
  }

  test("changelogReplay: a batch that empties the table leaves a readable empty table") {
    import spark.implicits._
    val snap = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((1L, "a", "D", 1L)).toDF("k", "v", "__op", "__seq")
    val out = EventStream.changelogReplay(snap, changes, "__seq",
      chunks = 1, Seq("k"), "__op", "__seq")
    assert(out.count() == 0L,
      "deleting the only key must yield an empty (not unreadable) table")
  }

  test("fileReplay2: empty slice keeps sources aligned; join == batch; rows conserved") {
    import spark.implicits._
    def evs(rows: Seq[(Long, Long, String)]) = rows
      .toDF("event_id", "user_id", "raw")
      .withColumn("ts", to_timestamp(col("raw")))
      .withColumn("ts_ms", col("ts").cast("long") * 1000)
      .drop("raw")
    // clicks exist only in the SECOND half of the time range → slice 0
    // of the click source is EMPTY and must still be written, or the
    // two file sequences drift out of band-alignment
    val clicks = evs(Seq((10L, 1L, "2024-01-01 12:00:00"),
      (11L, 2L, "2024-01-01 12:01:00")))
    val purchases = evs(Seq((20L, 1L, "2024-01-01 09:00:00"),
      (21L, 1L, "2024-01-01 12:05:00"),
      (22L, 2L, "2024-01-01 12:30:00"))) // 22 outside the 10-min window
      .withColumn("value", col("event_id").cast("double"))
    val out = EventStream.fileReplay2(clicks, purchases, "ts_ms",
        chunks = 2)((c, p) =>
        EventStream.intervalJoinStream(c.drop("ts_ms"), p.drop("ts_ms")))
      .select("event_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((10L, 21L)),
      s"expected the one in-window match, got $out")
  }

  test("enrichStream: stream-static join enriches per batch, inner semantics, broadcast") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "DE"), (2L, "FR")).toDF("cust_id", "nation")
    val mem = MemoryStream[(Long, Double)]
    val stream = EventStream.enrichStream(
      mem.toDF().toDF("user_id", "value"), dim, "user_id", "cust_id")
    val q = stream.writeStream.format("memory")
      .queryName("enriched").outputMode("append").start()
    try {
      mem.addData((1L, 10.0), (3L, 99.0)) // 3 has no dim row → dropped
      q.processAllAvailable()
      mem.addData((2L, 20.0)) // second batch re-joins the static side
      q.processAllAvailable()
      val got = spark.table("enriched")
        .select("user_id", "nation", "value").orderBy("user_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      assert(got.toSeq == Seq((1L, "DE", 10.0), (2L, "FR", 20.0)))
      assert(q.lastProgress.numInputRows == 1L)
      // the static side must ride a broadcast join inside the micro-batch
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
        q.explain()
      }
      assert(buf.toString("UTF-8").contains("BroadcastHashJoin"),
        s"dim join must broadcast, got:\n${buf.toString("UTF-8")}")
    } finally q.stop()
  }

  test("distinctUsersStream: HLL sketch stream == batch EXACTLY (order-free union)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // duplicate users within and across rows; two windows, two types
    val rows = Seq(
      ("2024-01-01 10:05:00", "click", 1L),
      ("2024-01-01 10:15:00", "click", 1L),
      ("2024-01-01 10:25:00", "click", 2L),
      ("2024-01-01 10:35:00", "view", 3L),
      ("2024-01-01 11:05:00", "click", 1L),
      ("2024-01-01 11:10:00", "click", 4L))
    def toDf(s: Seq[(String, String, Long)]) =
      s.toDF("raw_ts", "event_type", "user_id")
        .withColumn("ts", to_timestamp(col("raw_ts")))
    val batch = EventStream.distinctUsersStream(toDf(rows))
      .orderBy("hour", "event_type").collect()
    // tiny cardinalities: HLL is exact here — pin the true counts too
    assert(batch.map(r => (r.getString(1), r.getLong(2))).toSeq ==
      Seq(("click", 2L), ("view", 1L), ("click", 2L)))
    val mem = MemoryStream[(String, String, Long)]
    val stream = EventStream.distinctUsersStream(
      mem.toDF().toDF("raw_ts", "event_type", "user_id")
        .withColumn("ts", to_timestamp(col("raw_ts"))))
    val q = stream.writeStream.format("memory")
      .queryName("du_stream").outputMode("complete").start()
    try {
      // deliver in TWO out-of-order batches: union must not care
      mem.addData(rows.drop(3): _*)
      q.processAllAvailable()
      mem.addData(rows.take(3): _*)
      q.processAllAvailable()
      val streamed = spark.table("du_stream")
        .orderBy("hour", "event_type").collect()
      assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
    } finally q.stop()
  }

  test("sessionizeStream splits on in-trigger gaps immediately, matching batch semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.SessionEvent]
    val sessions = EventStream.sessionizeStream(mem.toDS(), gapMinutes = 30)
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_split").outputMode("append").start()
    try {
      val t0 = 1700000000000L
      // user 9: two events 2h apart arrive in the SAME trigger — the
      // first session must close mid-batch, not merge into one span
      mem.addData(EventStream.SessionEvent(9L, t0),
        EventStream.SessionEvent(9L, t0 + 2 * 60 * 60 * 1000))
      q.processAllAvailable()
      val out = spark.table("sessions_split").as[EventStream.Session].collect()
      assert(out.length == 1, s"expected the first session emitted in-batch, got ${out.toSeq}")
      assert(out.head.user_id == 9L && out.head.n_events == 1L &&
        out.head.start_ms == t0 && out.head.duration_ms == 0L)
    } finally q.stop()
  }

  test("sessionizeReplay over a batch frame == sessionizeBatch row-for-row") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "2024-01-01 10:00:00"), (2L, 1L, "2024-01-01 10:10:00"),
      (3L, 1L, "2024-01-01 12:00:00"), // > 30 min gap: user 1, session 2
      (4L, 2L, "2024-01-01 09:00:00"),
      (5L, 2L, "2024-01-01 09:29:00"), (6L, 2L, "2024-01-01 09:59:00"))
      .map { case (e, u, s) => (e, u, java.sql.Timestamp.valueOf(s)) }
      .toDF("event_id", "user_id", "ts")
    val batch = EventStream.sessionizeBatch(ev)
      .select("user_id", "session_id", "n_events", "start_ms", "end_ms",
        "duration_ms")
      .orderBy("user_id", "session_id").collect()
    val replay = EventStream.sessionizeReplay(ev, chunks = 2)
      .orderBy("user_id", "session_id").collect()
    assert(replay.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
  }

  test("sessionizeStream emits a session once the watermark passes the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.SessionEvent]
    val sessions = EventStream.sessionizeStream(mem.toDS(), gapMinutes = 30)
    val q = sessions.writeStream.format("memory")
      .queryName("sessions").outputMode("append").start()
    try {
      val t0 = 1700000000000L
      // user 7: two events 5 min apart → one session of 2
      mem.addData(EventStream.SessionEvent(7L, t0),
        EventStream.SessionEvent(7L, t0 + 5 * 60 * 1000))
      q.processAllAvailable()
      // advance event time far beyond gap so the watermark closes user 7
      mem.addData(EventStream.SessionEvent(8L, t0 + 3 * 60 * 60 * 1000))
      q.processAllAvailable()
      mem.addData(EventStream.SessionEvent(8L, t0 + 6 * 60 * 60 * 1000))
      q.processAllAvailable()
      val out = spark.table("sessions").as[EventStream.Session].collect()
      val u7 = out.filter(_.user_id == 7L)
      assert(u7.length == 1)
      assert(u7.head.n_events == 2L)
      assert(u7.head.duration_ms == 5 * 60 * 1000L)
    } finally q.stop()
  }

  test("sessionizeStream drops events beyond the watermark: emitted history never changes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.SessionEvent]
    val sessions = EventStream.sessionizeStream(mem.toDS(), gapMinutes = 30)
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_late").outputMode("append").start()
    try {
      val t0 = 1700000000000L
      // user 7: one session of 2 events
      mem.addData(EventStream.SessionEvent(7L, t0),
        EventStream.SessionEvent(7L, t0 + 5 * 60 * 1000))
      q.processAllAvailable()
      // advance the watermark hours past user 7's session and fire its
      // event-time timeout (two advancing batches, as the replay does)
      mem.addData(EventStream.SessionEvent(8L, t0 + 3 * 60 * 60 * 1000))
      q.processAllAvailable()
      mem.addData(EventStream.SessionEvent(8L, t0 + 6 * 60 * 60 * 1000))
      q.processAllAvailable()
      val before = spark.table("sessions_late")
        .as[EventStream.Session].collect().filter(_.user_id == 7L).toSeq
      assert(before.map(s => (s.n_events, s.duration_ms)) ==
        Seq((2L, 5 * 60 * 1000L)))
      // a genuinely LATE event (hours behind the watermark) must be
      // dropped by the watermark filter BEFORE it reaches state — no new
      // session, no mutation of the emitted one, in ANY later trigger
      mem.addData(EventStream.SessionEvent(7L, t0 + 10 * 60 * 1000))
      q.processAllAvailable()
      mem.addData(EventStream.SessionEvent(8L, t0 + 9 * 60 * 60 * 1000))
      q.processAllAvailable()
      val after = spark.table("sessions_late")
        .as[EventStream.Session].collect().filter(_.user_id == 7L).toSeq
      assert(after.map(s => (s.n_events, s.duration_ms)) == Seq((2L, 5 * 60 * 1000L)),
        s"late event past the watermark changed emitted history: $after")
    } finally q.stop()
  }

  test("transitionsStream: aggregated stream pairs == batch transitions, state is last-event only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      // user 1: a→b→a across two triggers; user 2: ts tie broken by id
      EventStream.TransEvent(1L, 1000L, 1L, "a"),
      EventStream.TransEvent(1L, 2000L, 2L, "b"),
      EventStream.TransEvent(2L, 1000L, 3L, "a"),
      EventStream.TransEvent(2L, 1000L, 4L, "b"))
    val late = EventStream.TransEvent(1L, 3000L, 5L, "a")
    val mem = MemoryStream[EventStream.TransEvent]
    val q = EventStream.transitionsStream(mem.toDS())
      .writeStream.format("memory").queryName("trans").outputMode("append")
      .start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      mem.addData(late) // crosses a trigger boundary: pairs with stored state
      q.processAllAvailable()
      val stream = spark.table("trans")
        .groupBy("prev_type", "next_type").count()
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val batch = graft.ops.EventAnalytics.transitions(
        (rows :+ late).toDF()
          .select(col("event_id"), col("user_id"),
            timestamp_micros(col("ts_us")).as("ts"), col("event_type")))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(stream == batch)
      assert(stream == Set(("a", "b", 2L), ("b", "a", 1L)))
    } finally q.stop()
  }

  test("funnelStream: stage-reached rows == batch funnelTimes across triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stages = Seq("signup", "view", "purchase")
    val sec = 1000000L
    val rows1 = Seq(
      // user 1 completes the funnel; the out-of-stage "x" is ignored
      EventStream.FunnelEvent(1L, 1 * sec, "signup"),
      EventStream.FunnelEvent(1L, 2 * sec, "x"),
      EventStream.FunnelEvent(1L, 3 * sec, "view"),
      // user 2: view BEFORE signup must not count as stage 2
      EventStream.FunnelEvent(2L, 1 * sec, "view"),
      EventStream.FunnelEvent(2L, 2 * sec, "signup"))
    val rows2 = Seq(
      // trigger 2: user 1 converts using state from trigger 1
      EventStream.FunnelEvent(1L, 10 * sec, "purchase"),
      // user 2's view arrives late but after signup — stage 2 fills now
      EventStream.FunnelEvent(2L, 11 * sec, "view"),
      // user 3 starts fresh in trigger 2
      EventStream.FunnelEvent(3L, 12 * sec, "signup"))
    val mem = MemoryStream[EventStream.FunnelEvent]
    val q = EventStream.funnelStream(mem.toDS(), stages,
      windowSec = Some(3600L))
      .writeStream.format("memory").queryName("funnel").outputMode("append")
      .start()
    try {
      mem.addData(rows1: _*); q.processAllAvailable()
      mem.addData(rows2: _*); q.processAllAvailable()
      val stream = spark.table("funnel")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val batch = graft.ops.EventAnalytics.funnelTimes(
        (rows1 ++ rows2).toDF()
          .select(col("user_id"),
            timestamp_micros(col("ts_us")).as("ts"), col("event_type")),
        stages, windowSec = Some(3600L))
        .select(col("user_id"),
          posexplode(col("stage_times")).as(Seq("pos", "t")))
        .filter(col("t").isNotNull)
        .select(col("user_id"), (col("pos") + 1).cast("int"),
          unix_micros(col("t")))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(stream == batch)
      assert(stream == Set(
        (1L, 1, 1 * sec), (1L, 2, 3 * sec), (1L, 3, 10 * sec),
        (2L, 1, 2 * sec), (2L, 2, 11 * sec),
        (3L, 1, 12 * sec)))
    } finally q.stop()
  }

  test("sessionizeBatch: gap splits sessions, counts and durations correct") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1L),
      (1L, "2024-01-01 10:10:00", 2L),
      (1L, "2024-01-01 11:00:00", 3L), // 50-min gap → new session
      (2L, "2024-01-01 10:00:00", 4L))
      .toDF("user_id", "raw_ts", "event_id")
      .withColumn("ts", to_timestamp(col("raw_ts")))
    val out = EventStream.sessionizeBatch(df).orderBy("user_id", "session_id")
      .collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2L)
    assert(out(0).getAs[Long]("duration_ms") == 10 * 60 * 1000L)
    assert(out(1).getAs[Long]("n_events") == 1L)
    assert(out(2).getAs[Long]("user_id") == 2L)
  }

  test("dedupStream drops repeated keys across micro-batches, bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val in = mem.toDF().toDF("content_hash", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = graft.streaming.EventStream
      .dedupStream(in, Seq("content_hash"), "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      mem.addData(("a", t0), ("a", t0 + 1000), ("b", t0))
      q.processAllAvailable()
      mem.addData(("a", t0 + 2000), ("c", t0 + 3000)) // later batch, same key
      q.processAllAvailable()
      val got = spark.table("dedup_stream").collect()
        .map(_.getString(0)).sorted.toSeq
      assert(got == Seq("a", "b", "c"))
    } finally q.stop()
  }

  test("HeavyHitters aggregate runs under streaming state (complete mode) == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val words = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(10)("c")
    val batch = words.toDF("w")
      .agg(graft.ops.TextAnalysis.heavyHitters(col("w"), 10).as("hh"))
      .collect().head.getMap[String, Long](0)
    val mem = MemoryStream[String]
    val q = mem.toDF().toDF("w")
      .agg(graft.ops.TextAnalysis.heavyHitters(col("w"), 10).as("hh"))
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("complete").start()
    try {
      // the sketch's partial state must survive the state store between
      // micro-batches (TypedImperativeAggregate serialize/merge path)
      val (first, second) = words.splitAt(30)
      mem.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("hh_stream").collect().head.getMap[String, Long](0)
      assert(streamed == batch, s"stream=$streamed batch=$batch")
    } finally q.stop()
  }

  test("intervalJoinStream: two MemoryStreams == the batch interval join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00").getTime
    def ts(minOffset: Int) = new java.sql.Timestamp(base + minOffset * 60000L)
    // clicks at t+0/t+5 for users 1,2; purchases inside and outside the
    // 10-minute window, plus a wrong-user purchase
    val clicks = Seq((100L, 1L, ts(0)), (101L, 2L, ts(5)))
    val purchases = Seq(
      (200L, 1L, ts(4), 10.0),   // match: click 100 (+4 min)
      (201L, 1L, ts(20), 20.0),  // no: outside window
      (202L, 2L, ts(5), 30.0),   // match: click 101 (+0 min)
      (203L, 3L, ts(6), 40.0))   // no: user without click
    val cDf = clicks.toDF("event_id", "user_id", "ts")
    val pDf = purchases.toDF("event_id", "user_id", "ts", "value")
    val batch = EventStream.intervalJoinStream(cDf, pDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(batch == Set((100L, 1L, 200L, 10.0), (101L, 2L, 202L, 30.0)))

    val cMem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val pMem = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val q = EventStream.intervalJoinStream(
      cMem.toDF().toDF("event_id", "user_id", "ts"),
      pMem.toDF().toDF("event_id", "user_id", "ts", "value"))
      .writeStream.format("memory").queryName("ij_stream")
      .outputMode("append").start()
    try {
      // clicks land a micro-batch before their purchases — the join
      // buffer must hold them until the matching side arrives
      cMem.addData(clicks.toIndexedSeq: _*)
      q.processAllAvailable()
      pMem.addData(purchases.toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("ij_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(streamed == batch, s"stream=$streamed batch=$batch")
    } finally q.stop()
  }

  test("AnnStream: streaming candidates == batch lshTopK candidate set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = corpus.filter(col("vec_id") < 5)
    // batch truth: same composition over the same rows
    val batch = graft.streaming.AnnStream.annCandidates(
      corpus, queries, "vec_id", "embedding", bits = 4, probes = 1)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
    // stream the corpus through in two micro-batches
    val rows = corpus.select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val in = mem.toDF().toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val q = graft.streaming.AnnStream.annCandidates(
      in, queries, "vec_id", "embedding", bits = 4, probes = 1)
      .writeStream.format("memory").queryName("ann_stream")
      .outputMode("append").start()
    try {
      val (first, second) = rows.splitAt(rows.length / 2)
      mem.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("ann_stream").collect()
        .map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
      assert(streamed == batch, s"stream=${streamed.size} batch=${batch.size}")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("nearDupDedupStream keeps first doc per simhash64 across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val in = mem.toDF().toDF("doc_id", "text", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = graft.streaming.EventStream
      .nearDupDedupStream(in, "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      val boiler = "the quick brown fox jumps over the lazy dog again and again"
      mem.addData((1L, boiler, t0), (2L, "completely different content here", t0))
      q.processAllAvailable()
      // identical doc in a later micro-batch → dropped by sketch state
      mem.addData((3L, boiler, t0 + 5000), (4L, "yet another novel document", t0 + 5000))
      q.processAllAvailable()
      val got = spark.table("neardup_stream").collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(1L, 2L, 4L))
      // batch/stream agreement: same op over the same rows as a batch df
      val batch = Seq((1L, boiler, t0), (2L, "completely different content here", t0),
        (3L, boiler, t0 + 5000), (4L, "yet another novel document", t0 + 5000))
        .toDF("doc_id", "text", "ts_ms")
        .withColumn("ts", timestamp_millis(col("ts_ms")))
        .withColumn("sh", graft.ops.Dedup.simhash64(col("text")))
      val batchKept = batch.groupBy("sh").agg(min("doc_id").as("doc_id"))
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(batchKept == got)
    } finally q.stop()
  }

  test("StreamDiff classifies keys across two streams like the batch diff") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    val memOld = MemoryStream[StreamDiff.TaggedRow]
    val memNew = MemoryStream[StreamDiff.TaggedRow]
    val out = StreamDiff.diff(memOld.toDS(), memNew.toDS(), quietMinutes = 10)
    val q = out.writeStream.format("memory")
      .queryName("stream_diff").outputMode("append").start()
    try {
      // k1 unchanged, k2 changed, k3 removed (old only), k4 added (new only);
      // k2 also tests last-write-wins on the new side
      memOld.addData(
        StreamDiff.TaggedRow("k1", "old", """{"v":1}""", t0),
        StreamDiff.TaggedRow("k2", "old", """{"v":2}""", t0),
        StreamDiff.TaggedRow("k3", "old", """{"v":3}""", t0))
      memNew.addData(
        StreamDiff.TaggedRow("k1", "new", """{"v":1}""", t0),
        StreamDiff.TaggedRow("k2", "new", """{"v":2}""", t0 + 1000),
        StreamDiff.TaggedRow("k2", "new", """{"v":99}""", t0 + 2000),
        StreamDiff.TaggedRow("k4", "new", """{"v":4}""", t0))
      q.processAllAvailable()
      // push the watermark far past every key's quiet gap
      memNew.addData(StreamDiff.TaggedRow("zz", "new", """{"v":0}""",
        t0 + 2 * 60 * 60 * 1000))
      q.processAllAvailable()
      memNew.addData(StreamDiff.TaggedRow("zz2", "new", """{"v":0}""",
        t0 + 4 * 60 * 60 * 1000))
      q.processAllAvailable()
      val got = spark.table("stream_diff").as[StreamDiff.DiffResult].collect()
        .filter(_.key.startsWith("k")).map(r => r.key -> r.status).toMap
      assert(got == Map("k1" -> "unchanged", "k2" -> "changed",
        "k3" -> "removed", "k4" -> "added"))
      val k2 = spark.table("stream_diff").as[StreamDiff.DiffResult].collect()
        .find(_.key == "k2").get
      assert(k2.new_payload == """{"v":99}""") // last write wins
    } finally q.stop()
  }

  test("VennDiff.counted is streaming-compatible: update-mode counts == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val oldRows = Seq(("a", 1), ("a", 1), ("b", 2))
    val newRows = Seq(("a", 1), ("c", 3))
    val batch = graft.ops.VennDiff.counted(
      oldRows.toDF("k", "v"), newRows.toDF("k", "v"))
      .orderBy("k", "v").collect()

    val memOld = MemoryStream[(String, Int)]
    val memNew = MemoryStream[(String, Int)]
    // identical code path: counted() is one union + one aggregate, which
    // Structured Streaming runs incrementally in update mode
    val streamed = graft.ops.VennDiff.counted(
      memOld.toDF().toDF("k", "v"), memNew.toDF().toDF("k", "v"))
    val q = streamed.writeStream.format("memory")
      .queryName("venn_stream").outputMode("complete").start()
    try {
      memOld.addData(oldRows: _*)
      memNew.addData(newRows: _*)
      q.processAllAvailable()
      val got = spark.table("venn_stream").orderBy("k", "v").collect()
      assert(got.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
    } finally q.stop()
  }

  test("multimodal: features deterministic, frames bounded and reassemblable") {
    import spark.implicits._
    val docs = Seq((1L, "a" * 600), (2L, "xy")).toDF("doc_id", "text")
    val media = Multimodal.mediaTable(docs)
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(1L).n_bytes == 600L)
    assert(feats(1L).byte_sum == 600L * 'a'.toLong)
    assert(feats(2L).byte_sum == 'x'.toLong + 'y'.toLong)
    assert(feats(1L).width == 16 + (feats(1L).byte_sum % 64).toInt)

    val frames = Multimodal.sampleFrames(media, frameBytes = 256,
      stride = 2, maxFrames = 16).collect()
    val f1 = frames.filter(_.doc_id == 1L).sortBy(_.frame_idx)
    // 600 bytes → 3 frames (0,1,2); stride 2 keeps 0 and 2
    assert(f1.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(f1.map(_.frame_len).toSeq == Seq(256, 88))
    assert(new String(f1.head.frame, "UTF-8") == "a" * 256)
  }

  test("multimodal: real PNG bytes decode to true dimensions via javax.imageio") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff8800) // non-trivial pixel so the encoder has content
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRow(1L, "image", png(40, 25)),
      Multimodal.MediaRow(2L, "image", png(7, 300)),
      Multimodal.MediaRow(3L, "image", "not an image".getBytes("UTF-8")))
      .toDS()
    val feats = Multimodal.extractImageFeatures(media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(1L).width == 40 && feats(1L).height == 25)
    assert(feats(2L).width == 7 && feats(2L).height == 300)
    // undecodable payload is kept and flagged, not dropped
    assert(feats(3L).width == -1 && feats(3L).height == -1)
    assert(feats(3L).n_bytes == 12L)
  }

  test("multimodal: perceptual dHash — real PNG decode, brightness invariance, banded pairs") {
    import spark.implicits._
    import graft.ops.Dedup
    // grayscale test pattern with a per-pixel luma function
    def png(luma: (Int, Int) => Int, w: Int = 90, h: Int = 80): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = luma(x, y) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val pattern = (x: Int, y: Int) => ((x * 7 + y * 13) % 97) * 2 // 0..192
    val media = Seq(
      (1L, png(pattern)),
      // uniform +10 brightness, no clipping: every cell mean shifts by
      // exactly +10, so all neighbor comparisons — and the dHash — are
      // IDENTICAL (the perceptual contract)
      (2L, png((x, y) => pattern(x, y) + 10)),
      // structurally different pattern
      (3L, png((x, y) => ((x * 29 + y * 3) % 89) * 2)),
      (4L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val hashed = media.select(col("doc_id"),
      graft.ops.Multimodal.dhashImage64(col("payload")).as("ph"))
    val h = hashed.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(h(4L).isEmpty, "undecodable payload must hash to null, not fail")
    assert(h(1L) == h(2L),
      s"uniform brightness shift must not change the dHash: ${h(1L)} vs ${h(2L)}")
    val cross = java.lang.Long.bitCount(h(1L).get ^ h(3L).get)
    assert(cross > 5, s"structurally different images too close: Hamming $cross")
    // the banded pair machinery composes over the image hash
    val pairs = Dedup.hamming64Pairs(
        hashed.filter(col("ph").isNotNull), "doc_id", "ph", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 0)), s"expected only the (1,2) pair: $pairs")
  }

  test("multimodal: real WAV bytes decode to true audio metadata via javax.sound") {
    import spark.implicits._
    def wav(sampleRate: Int, channels: Int, nFrames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, channels, true, false)
      val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", wav(16000, 1, 16000)), // 1 s mono
      Multimodal.MediaRow(2L, "audio", wav(44100, 2, 22050)), // 0.5 s stereo
      Multimodal.MediaRow(3L, "audio", "not audio".getBytes("UTF-8")))
      .toDS()
    val feats = Multimodal.extractAudioFeatures(media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(1L).sample_rate == 16000 && feats(1L).channels == 1)
    assert(feats(1L).n_frames == 16000L && feats(1L).duration_ms == 1000L)
    assert(feats(2L).sample_rate == 44100 && feats(2L).channels == 2)
    assert(feats(2L).duration_ms == 500L)
    // undecodable payload is kept and flagged, not dropped
    assert(feats(3L).sample_rate == -1 && feats(3L).duration_ms == -1L)
  }

  test("sessionizeStream under the RocksDB state store provider (SURVEY §8 scale path)") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    implicit val sqlCtx = spark.sqlContext
    graft.streaming.StateStores.useRocksDB(spark,
      // changelog checkpointing needs a fault-tolerant checkpoint dir;
      // the memory-sink temp checkpoint here is local, so exercise the
      // snapshot mode + the bounded-memory knob instead
      changelogCheckpointing = false, maxMemoryMB = 256L)
    try {
      val mem = MemoryStream[EventStream.SessionEvent]
      val sessions = EventStream.sessionizeStream(mem.toDS(), gapMinutes = 30)
      val q = sessions.writeStream.format("memory")
        .queryName("sessions_rocksdb").outputMode("append").start()
      try {
        val t0 = 1700000000000L
        // same scenario as the default-provider case: the provider is a
        // storage swap, answers must be identical
        mem.addData(EventStream.SessionEvent(7L, t0),
          EventStream.SessionEvent(7L, t0 + 5 * 60 * 1000))
        q.processAllAvailable()
        mem.addData(EventStream.SessionEvent(8L, t0 + 3 * 60 * 60 * 1000))
        q.processAllAvailable()
        mem.addData(EventStream.SessionEvent(8L, t0 + 6 * 60 * 60 * 1000))
        q.processAllAvailable()
        val out = spark.table("sessions_rocksdb")
          .as[EventStream.Session].collect()
        val u7 = out.filter(_.user_id == 7L)
        assert(u7.length == 1)
        assert(u7.head.n_events == 2L)
        assert(u7.head.duration_ms == 5 * 60 * 1000L)
        // prove RocksDB actually backed the state, not just that the
        // conf was set: the provider reports rocksdb* custom metrics
        val metricKeys = q.lastProgress.stateOperators.toSeq
          .flatMap(_.customMetrics.keySet.asScala)
        assert(metricKeys.exists(_.startsWith("rocksdb")),
          s"no rocksdb custom metrics in progress: $metricKeys")
      } finally q.stop()
    } finally graft.streaming.StateStores.useDefault(spark)
  }
}
