package graft.streaming

import graft.SparkSpec
import graft.core.{Ops, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll

/** Streaming semantics: the streaming windowed aggregate must agree
  * with its batch twin on the same data (read ↔ readStream symmetry),
  * and sessionization must produce gap-delimited sessions.
  */
class StreamingSpec extends SparkSpec with BeforeAndAfterAll {
  // Error-free-log CONTRACT, machine-checked: this suite's streams
  // historically leaked ERROR lines at teardown (shutdown-hook kills
  // in r7, a stop-mid-broadcast TorrentBroadcast line in r8) that
  // no assertion caught. The capture is installed for the whole
  // suite and asserted empty after the last stream stops.
  private var errCap: graft.ErrorLogCapture.Capture = _
  override def beforeAll(): Unit = {
    super.beforeAll()
    // scoped to the streaming/broadcast loggers: a late background
    // thread from an earlier suite's declared negative test (task-
    // level Executor/TaskSetManager lines) must not flake this
    // suite's zero-ERROR contract — those are the run-wide
    // GlobalErrorBudget's to account for
    errCap = graft.ErrorLogCapture.install(graft.ErrorLogCapture.StreamingLoggers)
  }
  // The shared session outlives this suite (one JVM across suites);
  // any stream a failed assertion left running would otherwise die
  // mid-plan in the SparkContext shutdown hook — the ERROR-log noise
  // that once shadowed the suite's green total.
  override def afterAll(): Unit = {
    spark.streams.active.foreach(_.stop())
    try {
      val errs = errCap.asSeq
      assert(errs.isEmpty,
        s"streaming suite logged ${errs.size} ERROR event(s):\n${errs.mkString("\n")}")
    } finally {
      graft.ErrorLogCapture.uninstall(errCap)
      super.afterAll()
    }
  }

  import spark.implicits._
  import StreamingOps._

  /** Stop a ProcessingTime-trigger query ON AN IDLE TICK: stopping
    * right after a sink poll can land inside the batch's tail, where
    * broadcast cleanup logs `ERROR TorrentBroadcast` even on a clean
    * stop — the one residual ERROR line in the r8 green log.
    * `isTriggerActive` false means the engine is between triggers;
    * poll up to 30 s (three 10 s trigger periods) then stop
    * regardless. The suite-level error capture asserts this actually
    * keeps the log clean. */
  private def stopOnIdleTick(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val idleBy = System.nanoTime() + 30L * 1000000000L
    while (q.status.isTriggerActive && System.nanoTime() < idleBy)
      Thread.sleep(50)
    q.stop()
  }

  private def eventsBatch = Tables.eventsWithTs(spark, "/root/testdata/sf0.001")
    .select(col("event_id"), col("ts_t"), col("user_id"), col("event_type"), col("value"))

  test("streaming windowedAgg == batch windowAgg on the same parquet") {
    // batch truth
    val batch = Ops.windowAgg(Tables.eventsWithTs(spark, "/root/testdata/sf0.001"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap

    // stream the same rows through a memory sink (complete mode so
    // the watermark needn't advance past the last window)
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    eventsBatch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(EventSchema).parquet(dir)
    val q = windowedAgg(stream).writeStream
      .outputMode("complete").format("memory").queryName("win_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish in 120 s")

    val got = spark.table("win_out").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got == batch)
  }

  test("typedEvents drops null-primitive rows a raw .as[Event] decode would die on") {
    // file-source schemas are force-nullable'd, so a null user_id
    // reaches the typed decode despite EventSchema's nullable=false —
    // typedEvents must drop that row and keep the stream alive
    val t0 = new java.sql.Timestamp(1600000000000L)
    val dir = java.nio.file.Files.createTempDirectory("graft-nullev").toString
    Seq[(java.lang.Long, java.sql.Timestamp, java.lang.Long, String, java.lang.Double)](
      (1L, t0, 10L, "click", 1.5),
      (2L, t0, null, "view", 2.5),   // null primitive → dropped
      (3L, t0, 30L, "click", null))  // null value → dropped
      .toDF("event_id", "ts_t", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(s"$dir/in")
    val q = typedEvents(spark.readStream.schema(EventSchema).parquet(s"$dir/in"))
      .toDF().writeStream.outputMode("append").format("memory")
      .queryName("typed_ev_out").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish in 120 s")
    val ids = spark.table("typed_ev_out").select("event_id").as[Long].collect().sorted
    assert(ids.sameElements(Array(1L)), s"expected only row 1, got ${ids.mkString(",")}")
  }

  test("dedupStream drops exact duplicates across micro-batches, keeps distinct texts") {
    val t0 = 1600000000000L
    def doc(id: Long, tMs: Long, text: String) =
      (id, new java.sql.Timestamp(t0 + tMs), text)
    // duplicates of "aaa" in the same and a later micro-batch (inside
    // the watermark window); "bbb"/"ccc" distinct
    val b1 = Seq(doc(1, 0, "aaa"), doc(2, 1000, "aaa"), doc(3, 2000, "bbb"))
    val b2 = Seq(doc(4, 60000, "aaa"), doc(5, 61000, "ccc"))
    val dir = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
    b1.toDF("doc_id", "ts_t", "text").coalesce(1).write.parquet(s"$dir/in")
    b2.toDF("doc_id", "ts_t", "text").coalesce(1).write.mode("append").parquet(s"$dir/in")

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts_t", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = StreamingOps.dedupStream(stream).writeStream
      .outputMode("append").format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish in 120 s")

    val out = spark.table("dedup_out").select("text").as[String].collect().sorted.toSeq
    assert(out == Seq("aaa", "bbb", "ccc"), s"got $out")
  }

  test("lshScreenForeachBatch: streamed near-dup screen == full banding restricted to fresh") {
    // corpus doc 1 / b1 doc 101 / b2 doc 201 share one text (exact-
    // dup chain across all three populations); corpus doc 2 / b2 doc
    // 202 are a one-word-edit near-dup pair; doc 3 and 203 are noise
    val longA = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val longB = (1 to 40).map(i => s"beta$i").mkString(" ")
    val corpus = Seq((1L, longB), (2L, longA), (3L, "completely unrelated noise text")).toDF("doc_id", "text")
    val b1 = Seq((101L, longB), (102L, "more unrelated filler words here")).toDF("doc_id", "text")
    val b2 = Seq((201L, longB), (202L, longA.replace("alpha7", "gamma7")),
                 (203L, "yet another distinct document")).toDF("doc_id", "text")

    val root = java.nio.file.Files.createTempDirectory("graft-lshscreen").toString
    // seed the persisted corpus side (plain parquet appends here; the
    // bucketed layout's exchange-free probe is plan-shape-tested in
    // DedupPropertySpec — this test is about the streaming protocol)
    graft.text.Dedup.minhashBandStore(corpus).write.parquet(s"$root/bands")
    graft.text.Dedup.minhashMembers(corpus).write.parquet(s"$root/members")
    b1.coalesce(1).write.parquet(s"$root/in")
    b2.coalesce(1).write.mode("append").parquet(s"$root/in")

    val emitted = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val body = StreamingOps.lshScreenForeachBatch(
      readBandStore = s => s.read.parquet(s"$root/bands"),
      readMembers = s => s.read.parquet(s"$root/members"),
      appendBandStore = (df, _) => df.write.mode("append").parquet(s"$root/bands"),
      appendMembers = (df, _) => df.write.mode("append").parquet(s"$root/members"),
      // collect() materializes before the admit step runs — the
      // ordering contract the scaladoc requires of emit
      emit = (df, _) => emitted.synchronized {
        emitted ++= df.collect().map(r => (r.getLong(0), r.getLong(1)))
      })
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$root/in")
      .writeStream.foreachBatch(body)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish in 120 s")

    // oracle: the one-shot batch screen of all fresh docs against the
    // corpus — order-insensitive (cross-batch pairs appear exactly
    // once regardless of micro-batch slicing)
    val expected = graft.text.Dedup
      .incrementalLshPairs(spark, corpus, b1.unionByName(b2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = emitted.toSet
    assert(got == expected, s"streamed screen diverged: got $got expected $expected")
    assert(emitted.size == emitted.toSet.size, "a pair was emitted twice")
    // non-vacuity: the exact-dup chain must produce the corpus-vs-b1,
    // corpus-vs-b2 AND b1-vs-b2 (cross-batch!) pairs, and the near-
    // dup edit must collide corpus doc 2 with b2 doc 202
    assert(Set((1L, 101L), (1L, 201L), (101L, 201L), (2L, 202L)).subsetOf(got))
    // the admitted store now holds corpus + both batches' band rows
    assert(spark.read.parquet(s"$root/members").count() == 8)

    // retry-proofness: re-running a batch body AFTER its admit has
    // fully landed (the worst retry case — the store already contains
    // the batch) must emit exactly the same pairs, not doubles
    val reEmitted = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val retryBody = StreamingOps.lshScreenForeachBatch(
      readBandStore = s => s.read.parquet(s"$root/bands"),
      readMembers = s => s.read.parquet(s"$root/members"),
      appendBandStore = (_, _) => (), // admission made a no-op for the replay
      appendMembers = (_, _) => (),
      emit = (df, _) => reEmitted.synchronized {
        reEmitted ++= df.collect().map(r => (r.getLong(0), r.getLong(1)))
      })
    retryBody(b2, 1L)
    val b2Pairs = got.filter { case (a, b) =>
      (200L to 299L).contains(a) || (200L to 299L).contains(b) }
    assert(reEmitted.toSet == b2Pairs,
      s"retried batch diverged: got ${reEmitted.toSet} expected $b2Pairs")
    assert(reEmitted.size == reEmitted.toSet.size, "retry emitted a pair twice")
  }

  test("lshScreenForeachBatch over the BUCKETED on-disk store survives a restart: cross-restart pairs exactly once, probe exchange-free") {
    // Composes three separately-tested pieces into the production
    // ingest claim (r12 ask): the streaming screen protocol (test
    // above, parquet paths), the bucketed band store's exchange-free
    // probe (DedupPropertySpec plan test), and bucketed PERSISTENCE
    // across a restart — two micro-batches through a real stream,
    // then a "restart" (a brand-new body with fresh reader closures,
    // the only state a cold stream start has), then a third batch.
    val longA = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val longB = (1 to 40).map(i => s"beta$i").mkString(" ")
    val corpus = Seq((1L, longB), (2L, longA),
      (3L, "completely unrelated noise text")).toDF("doc_id", "text")
    val b1 = Seq((101L, longB), (102L, "more unrelated filler words here")).toDF("doc_id", "text")
    val b2 = Seq((201L, longB), (202L, longA.replace("alpha7", "gamma7")),
                 (203L, "yet another distinct document")).toDF("doc_id", "text")
    val b3 = Seq((301L, longB), (302L, "post restart filler document")).toDF("doc_id", "text")

    val bandsTbl = "scr_bands"
    val membersTbl = "scr_members"
    graft.core.Warehouse.writeBucketed(
      graft.text.Dedup.minhashBandStore(corpus), bandsTbl, Seq("band", "bkey"), 8)
    graft.core.Warehouse.writeBucketed(
      graft.text.Dedup.minhashMembers(corpus), membersTbl, Seq("sig_key"), 8)

    val emitted = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    var lastScreen: org.apache.spark.sql.DataFrame = null
    def mkBody() = StreamingOps.lshScreenForeachBatch(
      readBandStore = s => s.table(bandsTbl),
      readMembers = s => s.table(membersTbl),
      appendBandStore = (df, _) =>
        graft.core.Warehouse.appendBucketed(df, bandsTbl, Seq("band", "bkey"), 8),
      appendMembers = (df, _) =>
        graft.core.Warehouse.appendBucketed(df, membersTbl, Seq("sig_key"), 8),
      emit = (df, bid) => emitted.synchronized {
        lastScreen = df
        emitted ++= df.collect().map(r => (r.getLong(0), r.getLong(1), bid))
      })

    // pre-restart life: b1, b2 through a real stream
    val root = java.nio.file.Files.createTempDirectory("graft-lshbucket").toString
    b1.coalesce(1).write.parquet(s"$root/in")
    b2.coalesce(1).write.mode("append").parquet(s"$root/in")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$root/in")
      .writeStream.foreachBatch(mkBody())
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish in 120 s")
    assert(spark.table(membersTbl).count() == 8,
      "both pre-restart batches must be admitted to the bucketed store")

    // restart: a NEW body (fresh closures, fresh validation state) —
    // everything it knows comes off the bucketed tables. The third
    // batch runs with broadcast off + AQE off so the probe plan can
    // be interrogated the way the DedupPropertySpec plan test does.
    val restarted = mkBody()
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      restarted(b3, 2L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }

    // cross-restart correctness: all emissions together == the
    // one-shot batch screen, every pair exactly once; the pairs that
    // BRIDGE the restart (b1/b2 docs vs b3 docs) exist only because
    // the persisted store carried them over, and appear once, in the
    // post-restart batch
    val pairs = emitted.map(e => (e._1, e._2))
    assert(pairs.size == pairs.toSet.size, "a pair was emitted twice across the restart")
    val expected = graft.text.Dedup
      .incrementalLshPairs(spark, corpus, b1.unionByName(b2).unionByName(b3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.toSet == expected, s"got ${pairs.toSet} expected $expected")
    val bridging = emitted.filter(e => e._2 >= 300L && e._1 < 300L)
    assert(bridging.map(e => (e._1, e._2)).toSet == Set((1L, 301L), (101L, 301L), (201L, 301L)),
      s"cross-restart pairs wrong: $bridging")
    assert(bridging.forall(_._3 == 2L), "bridging pairs must come from the post-restart batch")
    // post-restart store holds corpus + all three batches
    assert(spark.table(membersTbl).count() == 10)

    // plan shape: the restarted probe read the APPENDED band store
    // bucket-aware, with no shuffle exchange between the store scan
    // and the probe join (the compact form of DedupPropertySpec's
    // assertion, here proven on the post-restart, multi-append table)
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = lastScreen.queryExecution.executedPlan
    def cachedRoots(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collect {
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          m.relation.cachedPlan
      }.flatMap(cp => cp +: cachedRoots(cp))
    val roots = plan +: cachedRoots(plan)
    def readsStore(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.collectLeaves().exists {
        case s: FileSourceScanExec =>
          s.relation.location.rootPaths.exists(_.toString.contains(bandsTbl))
        case _ => false
      }
    val storeScans = roots.flatMap(_.collect {
      case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains(bandsTbl)) => s
    })
    assert(storeScans.nonEmpty, "restarted probe must read the persisted band store")
    assert(storeScans.forall(_.bucketedScan),
      "band-store scan must stay bucket-aware after bucketed appends")
    val probeStoreSides = roots.flatMap(_.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }).flatMap(_.children).filter { c =>
      readsStore(c) && c.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }.isEmpty
    }
    assert(probeStoreSides.nonEmpty, "expected a join reading the band store directly")
    for (side <- probeStoreSides)
      assert(side.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"store must flow exchange-free into the restarted probe join:\n$side")
  }

  test("lshScreenForeachBatch PairMode: colossal stored cluster admits in O(fresh) pairs under Star; Bounded quarantines un-admitted; default fails loudly") {
    import graft.text.{Dedup, PairMode, PairBudgetExceededException}
    // 400 stored copies of one text — the colossal corpus-side cluster
    // that makes a blind Full screen emit fresh×|cluster| pairs at
    // admission time (the 100-TB blind-caller scenario of the r13
    // verdict's ask #2)
    val longB = (1 to 40).map(i => s"beta$i").mkString(" ")
    val corpus = ((0L until 400L).map(i => (i, longB)) :+ ((900L, "completely unrelated noise")))
      .toDF("doc_id", "text")
    val fresh = Seq((1001L, longB), (1002L, "fresh unrelated filler")).toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-lshstar").toString
    Dedup.minhashBandStore(corpus).write.parquet(s"$root/bands")
    Dedup.minhashMembers(corpus).write.parquet(s"$root/members")
    def bands(s: org.apache.spark.sql.SparkSession) = s.read.parquet(s"$root/bands")
    def membersT(s: org.apache.spark.sql.SparkSession) = s.read.parquet(s"$root/members")

    // Full ground truth BEFORE any admission: the 400-member cluster
    // forces ≥400 pairs for the one duplicated fresh doc
    val fullBefore = Dedup.incrementalLshPairsAgainstStore(
        spark, bands(spark), membersT(spark), fresh)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fullBefore.size >= 400, s"fixture must be colossal, got ${fullBefore.size}")

    val emitted = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val starBody = StreamingOps.lshScreenForeachBatch(
      readBandStore = bands, readMembers = membersT,
      appendBandStore = (df, _) => df.write.mode("append").parquet(s"$root/bands"),
      appendMembers = (df, _) => df.write.mode("append").parquet(s"$root/members"),
      emit = (df, _) => emitted.synchronized {
        emitted ++= df.collect().map(r => (r.getLong(0), r.getLong(1)))
      },
      mode = PairMode.Star)
    starBody(fresh, 0L)
    // O(fresh), not fresh×|cluster|: the duplicated fresh doc links to
    // the stored cluster's rep (min corpus member = 0), once
    assert(emitted.contains((0L, 1001L)), s"missing the rep edge: $emitted")
    assert(emitted.size <= 5, s"Star screen must be O(fresh), got ${emitted.size} pairs")
    // the per-fresh-doc admit/drop verdict is EXACTLY Full's: the same
    // fresh docs are flagged (have ≥1 pair) under both modes
    def flaggedFresh(ps: Set[(Long, Long)]): Set[Long] =
      ps.flatMap(p => Seq(p._1, p._2)).filter(_ >= 1000L)
    assert(flaggedFresh(emitted.toSet) == flaggedFresh(fullBefore),
      s"star verdict diverged: ${flaggedFresh(emitted.toSet)} vs ${flaggedFresh(fullBefore)}")
    // Star admits normally
    assert(spark.read.parquet(s"$root/members").count() == 403)

    // Bounded + quarantine hook: the guard fires BEFORE expansion,
    // the hook gets the exact Full prediction, the batch is neither
    // emitted nor admitted, and the body returns normally (stream
    // lives on)
    val fresh2 = Seq((2001L, longB)).toDF("doc_id", "text")
    val fullNow = Dedup.incrementalLshPairsAgainstStore(
      spark, bands(spark), membersT(spark), fresh2).count()
    val quarantined = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    var emitCalls = 0
    val bndBody = StreamingOps.lshScreenForeachBatch(
      readBandStore = bands, readMembers = membersT,
      appendBandStore = (df, _) => df.write.mode("append").parquet(s"$root/bands"),
      appendMembers = (df, _) => df.write.mode("append").parquet(s"$root/members"),
      emit = (_, _) => emitCalls += 1,
      mode = PairMode.Bounded(10L),
      onBudgetExceeded = Some((e, b, bid) =>
        quarantined += ((e.predictedPairs, b.count(), bid))))
    bndBody(fresh2, 7L)
    assert(emitCalls == 0, "quarantined batch must not be emitted")
    assert(quarantined.toSeq == Seq((fullNow, 1L, 7L)),
      s"quarantine hook got $quarantined, expected predicted=$fullNow")
    assert(spark.read.parquet(s"$root/members").count() == 403,
      "quarantined batch must NOT be admitted (stays re-processable)")

    // no hook: the documented loud failure, still un-admitted
    val loudBody = StreamingOps.lshScreenForeachBatch(
      readBandStore = bands, readMembers = membersT,
      appendBandStore = (df, _) => df.write.mode("append").parquet(s"$root/bands"),
      appendMembers = (df, _) => df.write.mode("append").parquet(s"$root/members"),
      emit = (df, _) => df.count(),
      mode = PairMode.Bounded(10L))
    val ex = intercept[PairBudgetExceededException] { loudBody(fresh2, 8L) }
    assert(ex.predictedPairs == fullNow)
    assert(spark.read.parquet(s"$root/members").count() == 403)

    // catch-scope contract: a PairBudgetExceededException raised by
    // the CALLER'S emit (e.g. a downstream Bounded operator) is the
    // caller's own failure — it must propagate, not be misread as
    // this screen's verdict and silently drop the batch
    val emitBoom = new PairBudgetExceededException(123L, 1L, "downstreamOperator")
    var hookCalls = 0
    val emitFailBody = StreamingOps.lshScreenForeachBatch(
      readBandStore = bands, readMembers = membersT,
      appendBandStore = (df, _) => df.write.mode("append").parquet(s"$root/bands"),
      appendMembers = (df, _) => df.write.mode("append").parquet(s"$root/members"),
      emit = (_, _) => throw emitBoom,
      mode = PairMode.Star, // screen's own guard cannot fire
      onBudgetExceeded = Some((_, _, _) => hookCalls += 1))
    val propagated = intercept[PairBudgetExceededException] { emitFailBody(fresh2, 10L) }
    assert(propagated eq emitBoom, "emit's own exception must propagate unchanged")
    assert(hookCalls == 0, "the quarantine hook must not fire for emit failures")
    assert(spark.read.parquet(s"$root/members").count() == 403,
      "a failed emit must not admit the batch")

    // raised budget: bit-identical to the Full screen, admits
    val emitted3 = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val okBody = StreamingOps.lshScreenForeachBatch(
      readBandStore = bands, readMembers = membersT,
      appendBandStore = (df, _) => df.write.mode("append").parquet(s"$root/bands"),
      appendMembers = (df, _) => df.write.mode("append").parquet(s"$root/members"),
      emit = (df, _) => emitted3.synchronized {
        emitted3 ++= df.collect().map(r => (r.getLong(0), r.getLong(1)))
      },
      mode = PairMode.Bounded(fullNow))
    val fullNowPairs = Dedup.incrementalLshPairsAgainstStore(
        spark, bands(spark), membersT(spark), fresh2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    okBody(fresh2, 9L)
    assert(emitted3.toSet == fullNowPairs, "under-budget Bounded must equal Full")
    assert(spark.read.parquet(s"$root/members").count() == 404)
  }

  test("markovStream == batch markovTransitions; boundary transition emits once") {
    val t0 = 1600000000000L
    def ev(id: Long, tMs: Long, u: Long, typ: String) =
      (id, new java.sql.Timestamp(t0 + tMs), u, typ, 1.0)
    // user 1's A->B crosses the micro-batch boundary (B arrives in
    // batch 2 while A lives only in state); user 2 stays in batch 1
    val b1 = Seq(ev(1, 0, 1L, "A"), ev(2, 1000, 2L, "X"), ev(3, 2000, 2L, "Y"))
    val b2 = Seq(ev(4, 60000, 1L, "B"), ev(5, 61000, 1L, "A"))
    val dir = java.nio.file.Files.createTempDirectory("graft-markov").toString
    b1.toDF("event_id", "ts_t", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(s"$dir/in")
    b2.toDF("event_id", "ts_t", "user_id", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(s"$dir/in")

    val stream = spark.readStream.schema(EventSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = StreamingOps.markovStream(stream.as[StreamingOps.Event]).writeStream
      .outputMode("append").format("memory").queryName("markov_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish in 120 s")

    val got = spark.table("markov_out")
      .groupBy("from_type", "to_type").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // batch twin on the same rows (ts in ns for Tables-contract events)
    val batchEv = (b1 ++ b2).map(e => (e._1, e._2.getTime * 1000000L, e._3, e._4))
      .toDF("event_id", "ts", "user_id", "event_type")
    val batch = Ops.markovTransitions(batchEv).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == batch, s"streaming $got vs batch $batch")
    assert(got == Map(("A", "B") -> 1L, ("B", "A") -> 1L, ("X", "Y") -> 1L))
  }

  test("markovStream with a state TTL matches the default within the TTL window") {
    val t0 = 1600000000000L
    def ev(id: Long, tMs: Long, u: Long, typ: String) =
      (id, new java.sql.Timestamp(t0 + tMs), u, typ, 1.0)
    val rows = Seq(ev(1, 0, 1L, "A"), ev(2, 1000, 1L, "B"), ev(3, 2000, 2L, "X"),
      ev(4, 3000, 2L, "Y"), ev(5, 4000, 1L, "A"))
    val dir = java.nio.file.Files.createTempDirectory("graft-markov-ttl").toString
    rows.toDF("event_id", "ts_t", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(s"$dir/in")
    val stream = spark.readStream.schema(EventSchema).parquet(s"$dir/in")
    // one-hour TTL cannot fire inside the test: output must equal the
    // untimed operator's exactly (the TTL only bounds IDLE state)
    // NOTE: a ProcessingTimeTimeout query NEVER self-terminates, even
    // under Trigger.AvailableNow — Spark's shouldRunAnotherBatch is
    // unconditionally true for processing-time timeouts, so the engine
    // spins no-data batches to evaluate timeouts forever (and neither
    // awaitTermination nor processAllAvailable ever returns). The
    // round-7 form of this test (awaitTermination on AvailableNow)
    // left the query running until the JVM shutdown hook shot it
    // mid-plan — the suite-teardown INTERNAL_ERROR in the r7 logs.
    // Bounded drive pattern: poll the sink for the expected rows,
    // then stop() explicitly.
    // a 10 s trigger (vs AvailableNow's back-to-back batches) keeps
    // the engine IDLE between no-data ticks, so the stop() below
    // lands between batches instead of cancelling one mid-broadcast
    // (which logs an ERROR even on a clean stop)
    val q = StreamingOps.markovStream(stream.as[StreamingOps.Event],
        stateTtlMs = Some(3600L * 1000L)).writeStream
      .outputMode("append").format("memory").queryName("markov_ttl_out")
      .trigger(Trigger.ProcessingTime("10 seconds")).start()
    val want = Map(("A", "B") -> 1L, ("B", "A") -> 1L, ("X", "Y") -> 1L)
    try {
      def counts() = spark.table("markov_ttl_out")
        .groupBy("from_type", "to_type").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val deadline = System.nanoTime() + 120L * 1000000000L
      var got = counts()
      while (got != want && System.nanoTime() < deadline) {
        Thread.sleep(250); got = counts()
      }
      assert(got == want, s"TTL markov stream never produced $want, got $got")
    } finally stopOnIdleTick(q)
    intercept[IllegalArgumentException](
      StreamingOps.markovStream(stream.as[StreamingOps.Event], stateTtlMs = Some(0L)))
  }

  test("bloomScreen drops contaminated stream docs; batch twin identical; conservative") {
    import graft.text.Dedup
    val probes = Seq((100L, "en", "the quick brown fox jumps"))
      .toDF("doc_id", "lang", "text")
    val sketch = Dedup.probeSketch(probes, 3, 1L << 12)
    val docs = Seq(
      (1L, "prefix the quick brown fox jumps suffix"), // 3 probe trigrams -> dropped
      (2L, "quick brown cat sleeps all day"),          // clean -> kept
      (3L, "the quick brown dog barks"))               // 1 probe trigram -> dropped at maxHits=0
    val dir = java.nio.file.Files.createTempDirectory("graft-bscreen").toString
    docs.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/in")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = StreamingOps.bloomScreen(stream, sketch).writeStream
      .outputMode("append").format("memory").queryName("bscreen_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish in 120 s")
    val kept = spark.table("bscreen_out").select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L), s"got $kept")
    // batch twin on the same frame: identical keep set and hit counts
    val batch = StreamingOps.bloomScreen(docs.toDF("doc_id", "text"), sketch)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_bloom_hits"))).toSeq
    assert(batch == Seq((2L, 0L)))
    // maxHits=1 readmits the single-hit doc but never the verbatim one
    val loose = StreamingOps.bloomScreen(docs.toDF("doc_id", "text"), sketch, maxHits = 1)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(loose == Seq(2L, 3L))
    // null sketch (empty probe corpus) keeps everything, hits = 0
    val empty = Dedup.probeSketch(probes.filter(col("doc_id") < 0L), 3, 16L)
    val all = StreamingOps.bloomScreen(docs.toDF("doc_id", "text"), empty)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_bloom_hits"))).sorted.toSeq
    assert(all == Seq((1L, 0L), (2L, 0L), (3L, 0L)))
  }

  test("stream-stream interval join == batch twin; runs in true streaming mode") {
    // left = error events, right = click events of the same user
    // within 10 minutes after the error
    val errors = eventsBatch.filter(col("event_type") === "error")
    val clicks = eventsBatch.filter(col("event_type") === "click")
    val batch = intervalJoin(errors, clicks)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty, "fixture produced no interval matches — test is vacuous")

    val dir = java.nio.file.Files.createTempDirectory("graft-ssjoin").toString
    errors.write.mode("overwrite").parquet(s"$dir/l")
    clicks.write.mode("overwrite").parquet(s"$dir/r")
    val q = intervalJoin(
        spark.readStream.schema(EventSchema).parquet(s"$dir/l"),
        spark.readStream.schema(EventSchema).parquet(s"$dir/r"))
      .writeStream.outputMode("append").format("memory").queryName("ssjoin_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish in 120 s")

    val got = spark.table("ssjoin_out")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == batch,
      s"stream result diverged from batch twin: ${got.size} vs ${batch.size} pairs")
    // every matched pair respects the interval bound
    spark.table("ssjoin_out").select("lag_sec").as[Long].collect()
      .foreach(lag => assert(lag >= 0 && lag <= 600, s"lag $lag outside [0, 600]s"))
  }

  test("scd2Stream emits closing rows on change; batch scd2's closed rows are the twin") {
    val t0 = 1600000000000L
    def ev(id: Long, user: Long, tMs: Long, v: Double) =
      Event(id, new java.sql.Timestamp(t0 + tMs), user, "upd", v)
    // user 1: 5.0 (held), 7.0, back to 5.0 → two closed ranges;
    // user 2: single value → state only, nothing emitted
    val rows = Seq(
      ev(1, 1, 0, 5.0), ev(2, 1, 1000, 5.0), ev(3, 1, 2000, 7.0), ev(4, 1, 3000, 5.0),
      ev(5, 2, 500, 9.0))
    val dir = java.nio.file.Files.createTempDirectory("graft-scd2").toString
    rows.toDS().coalesce(1).write.mode("overwrite").parquet(dir)
    val q = scd2Stream(spark.readStream.schema(EventSchema).parquet(dir).as[Event])
      .writeStream.outputMode("append").format("memory").queryName("scd2_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish in 120 s")
    val got = spark.table("scd2_out").as[Scd2Closed].collect()
      .map(c => (c.user_id, c.value, c.valid_from_us, c.valid_to_us))
      .sortBy(x => (x._1, x._3)).toSeq
    val t0us = t0 * 1000L
    assert(got == Seq(
      (1L, 5.0, t0us, t0us + 2000000L),
      (1L, 7.0, t0us + 2000000L, t0us + 3000000L)))
    // batch twin: exactly the non-current rows of Ops.scd2
    val batchIn = rows.map(e => (e.user_id, e.event_id, e.ts_t.getTime * 1000000L, e.value))
      .toDF("user_id", "event_id", "ts", "value")
    val closed = Ops.scd2(batchIn).filter(!col("is_current")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("value"),
                 r.getAs[Long]("valid_from_us"), r.getAs[Long]("valid_to_us")))
      .sortBy(x => (x._1, x._3)).toSeq
    assert(closed == got)
  }

  test("scd2Stream ordering contract: in-batch events sort; cross-batch late events append") {
    val t0 = 1600000000000L
    def ev(id: Long, user: Long, tMs: Long, v: Double) =
      Event(id, new java.sql.Timestamp(t0 + tMs), user, "upd", v)
    // batch 1 delivers out-of-ORDER but same-batch events: the
    // per-batch sort repairs them
    val dir = java.nio.file.Files.createTempDirectory("graft-scd2o").toString
    Seq(ev(2, 1, 2000, 7.0), ev(1, 1, 0, 5.0)).toDS()
      .coalesce(1).write.parquet(s"$dir/b=1")
    // batch 2 delivers an event OLDER than applied state: documented
    // behavior is append-as-new (last-value state cannot reorder
    // history) — the batch rebuild is the authoritative fix
    Seq(ev(3, 1, 1000, 9.0)).toDS().coalesce(1).write.parquet(s"$dir/b=2")
    val q = scd2Stream(spark.readStream.schema(EventSchema).parquet(s"$dir/b=*").as[Event])
      .writeStream.outputMode("append").format("memory").queryName("scd2_ord")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish in 120 s")
    val got = spark.table("scd2_ord").as[Scd2Closed].collect()
      .map(c => (c.value, c.valid_from_us, c.valid_to_us)).sortBy(_._2).toSeq
    val us = (ms: Long) => (t0 + ms) * 1000L
    // file-source batching isn't guaranteed one-file-per-batch; both
    // legal outcomes are pinned: (a) separate batches → late 9.0
    // appends after 7.0; (b) one batch → full sort yields 5,9,7
    val separateBatches = Seq((5.0, us(0), us(2000)), (7.0, us(2000), us(1000)))
    val oneBatch = Seq((5.0, us(0), us(1000)), (9.0, us(1000), us(2000)))
    assert(got == separateBatches || got == oneBatch,
      s"unexpected emission sequence: $got")
  }

  test("sessionize: gap-delimited sessions with event-time timeout") {
    // positive epoch base: a ts equal to the initial watermark (0)
    // is filtered as late by definition
    val t0 = 1600000000000L
    def ev(id: Long, user: Long, tMs: Long, v: Double) =
      Event(id, new java.sql.Timestamp(t0 + tMs), user, "click", v)
    // user 1: two bursts separated by > gap; user 2: one burst
    val rows = Seq(
      ev(1, 1, 0, 1.0), ev(2, 1, 60000, 2.0),            // session A: 2 events
      ev(3, 1, 3 * 3600000L, 5.0),                        // session B (gap 3h)
      ev(4, 2, 1000, 7.0), ev(5, 2, 2000, 8.0),
      // sentinel far in the future advances the watermark so earlier
      // sessions time out and emit
      ev(99, 9, 100 * 3600000L, 0.0))
    // one file → one micro-batch: otherwise the future sentinel can
    // land in an earlier batch and watermark-drop the t=0 events
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toString
    rows.toDS().coalesce(1).write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(EventSchema).parquet(dir).as[Event]
    val q = sessionize(stream, gapMinutes = 30).writeStream
      .outputMode("append").format("memory").queryName("sess_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish in 120 s")

    val sess = spark.table("sess_out").as[Session].collect()
      .filter(_.user_id != 9).sortBy(s => (s.user_id, s.start_us))
    assert(sess.map(s => (s.user_id, s.n_events, s.total_value)).toSeq ==
      Seq((1L, 2, 3.0), (1L, 1, 5.0), (2L, 2, 15.0)))

    // batch twin: Ops.sessionize over the same events (ts in nanos)
    // produces the same (user, start, end, n) sessions — the
    // read ↔ readStream swap must not change the session definition
    val batchIn = rows.filter(_.user_id != 9)
      .map(e => (e.user_id, e.event_id, e.ts_t.getTime * 1000000L))
      .toDF("user_id", "event_id", "ts")
    val batch = graft.core.Ops.sessionize(batchIn, 30L * 60L * 1000000L).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
                 r.getAs[Long]("end_us"), r.getAs[Long]("n_events")))
      .sortBy(s => (s._1, s._2)).toSeq
    assert(batch == sess.map(s => (s.user_id, s.start_us, s.end_us, s.n_events.toLong)).toSeq)

    // declarative session_window twin (runs in batch mode too): same
    // (user, start, count) sessions as the gaps-and-islands batch op
    val sw = StreamingOps.sessionWindowAgg(
        rows.filter(_.user_id != 9).toDS().toDF()).collect()
      .map(r => (r.getAs[Long]("user_id"),
                 r.getAs[java.sql.Timestamp]("start_t").getTime * 1000L,
                 r.getAs[Long]("n_events")))
      .sortBy(s => (s._1, s._2)).toSeq
    assert(sw == batch.map(s => (s._1, s._2, s._4)))

    // and in TRUE streaming mode: session_window state merges across
    // the watermark and emits the same closed sessions (the sentinel
    // advances the watermark past every real session)
    val swq = StreamingOps.sessionWindowAgg(
        spark.readStream.schema(EventSchema).parquet(dir))
      .writeStream.outputMode("append").format("memory").queryName("sw_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(swq.awaitTermination(120000), "stream did not finish in 120 s")
    val streamed = spark.table("sw_out").collect()
      .map(r => (r.getAs[Long]("user_id"),
                 r.getAs[java.sql.Timestamp]("start_t").getTime * 1000L,
                 r.getAs[Long]("n_events")))
      .filter(_._1 != 9L)
      .sortBy(s => (s._1, s._2)).toSeq
    assert(streamed == batch.map(s => (s._1, s._2, s._4)))
  }

  test("driftBinStream + shared finisher == batch twin; closed-form KS endpoints") {
    import graft.core.Validate
    val nBins = 4
    // reference snapshot: uniform over 4 bins for type "a", skewed for "b"
    val ref = Seq(
      ("a", 0.0), ("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 0.0), ("b", 0.5), ("b", 0.75), ("b", 3.0))
      .toDF("event_type", "value")
    val (vmn, vmx, refDense) = Validate.driftReference(ref, "event_type", "value", nBins)
    assert(vmn == 0.0 && vmx == 3.0)
    val denseRows = refDense.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(denseRows.size == 2 * nBins, "scaffold must be dense per group")
    assert(denseRows(("a", 0L)) == (1L, 4L) && denseRows(("a", 3L)) == (1L, 4L))
    // 0.75*4/3 = 1.0 exactly, so b@0.75 lands in bin 1
    assert(denseRows(("b", 0L)) == (2L, 4L) && denseRows(("b", 1L)) == (1L, 4L))

    // serving stream: window 1 matches "a"'s reference exactly (D = 0);
    // window 2 for "a" sits entirely in the top bin (max drift); "b"
    // appears in window 1 only; out-of-range values must clamp
    val t0 = 1600000000000L
    val h = 3600000L
    def ev(id: Long, tMs: Long, typ: String, v: Double) =
      (id, new java.sql.Timestamp(t0 + tMs), id, typ, v)
    val serving = Seq(
      ev(1, 0, "a", 0.0), ev(2, 1000, "a", 1.0),
      ev(3, 2000, "a", 2.0), ev(4, 3000, "a", 3.0),
      ev(5, 4000, "b", -5.0), ev(6, 5000, "b", 99.0), // clamp to bins 0 and 3
      ev(7, h, "a", 3.0), ev(8, h + 1000, "a", 99.0))
      .toDF("event_id", "ts_t", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    serving.write.mode("overwrite").parquet(dir)

    val q = driftBinStream(
        spark.readStream.schema(EventSchema).parquet(dir), vmn, vmx, nBins, "1 hour")
      .writeStream.outputMode("complete").format("memory").queryName("drift_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish in 120 s")
    val streamedCounts = spark.table("drift_out")

    // batch twin: same binning expression, plain groupBy
    val batchCounts = serving
      .groupBy(date_format(window(col("ts_t"), "1 hour").getField("start"),
          "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type").as("grp"),
        Validate.binColumn(col("value"), vmn, vmx, nBins).as("bin"))
      .agg(count(lit(1)).as("cnt"))
    def finish(counts: org.apache.spark.sql.DataFrame) =
      Validate.ksAgainstReference(counts, refDense, nBins).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val streamed = finish(streamedCounts)
    val batch = finish(batchCounts)
    assert(streamed == batch, "stream and batch twins must agree exactly")

    // closed-form endpoints through the shared finisher
    val buckets = streamed.keys.map(_._1).toSeq.distinct.sorted
    assert(buckets.size == 2)
    assert(streamed((buckets.head, "a")) == (4L, 4L, 0L),
      "window matching the reference has zero KS gap")
    assert(streamed((buckets.last, "a")) == (2L, 4L, 6L),
      "all-top-bin window reaches cum gap |0*4 - 3*2| = 6")
    // b's clamped rows land in bins 0 and 3 (win [1,0,0,1] vs ref
    // [2,1,0,1]): cum gaps |4-4|=0, |4-6|=2, |4-6|=2, |8-8|=0 -> 2
    assert(streamed((buckets.head, "b")) == (2L, 4L, 2L),
      "out-of-range values clamp to the edge bins")
    assert(!streamed.contains((buckets.last, "b")), "no b rows in window 2")

    // sub-minute windows must stay DISTINCT buckets (regression: a
    // minute-precision label silently merged two 30 s windows that
    // start within the same minute, summing their populations)
    val serving30 = Seq(
      ev(20, 0, "a", 0.0), ev(21, 35000, "a", 1.0), ev(22, 55000, "a", 2.0))
      .toDF("event_id", "ts_t", "user_id", "event_type", "value")
    val dir30 = java.nio.file.Files.createTempDirectory("graft-drift30").toString
    serving30.write.mode("overwrite").parquet(dir30)
    val q30 = driftBinStream(
        spark.readStream.schema(EventSchema).parquet(dir30), vmn, vmx, nBins,
        windowDur = "30 seconds")
      .writeStream.outputMode("complete").format("memory").queryName("drift30_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q30.awaitTermination(120000), "stream did not finish in 120 s")
    val buckets30 = spark.table("drift30_out")
      .select("bucket").distinct().collect().map(_.getString(0)).sorted
    // +0 s, +35 s, +55 s land in three consecutive 30 s windows, the
    // last two of which START in the same minute — three distinct
    // second-precision labels, where a minute label would emit two
    assert(buckets30.length == 3 && buckets30.forall(_.length == 19),
      s"expected three second-precision buckets, got ${buckets30.toSeq}")
  }

  test("driftMonitorStream (EP composition): replayed fixture stream appends " +
      "per-window KS rows; restart from checkpoint appends nothing new") {
    import graft.Pipeline
    val nBins = 4
    // frozen reference snapshot — same distributions as the unit twin
    // test above, so the golden endpoints carry over
    val ref = Seq(
      ("a", 0.0), ("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 0.0), ("b", 0.5), ("b", 0.75), ("b", 3.0))
      .toDF("event_type", "value")

    val t0 = 1600000000000L
    val h = 3600000L
    def ev(id: Long, tMs: Long, typ: String, v: Double) =
      (id, new java.sql.Timestamp(t0 + tMs), id, typ, v)
    // window 1: "a" matches the reference (D = 0), "b" clamps its
    // out-of-range rows; window 2: "a" all-top-bin (max drift). The
    // far-future sentinel advances the watermark past both windows so
    // append mode finalizes them; its OWN window stays open and must
    // NOT be in the sink.
    val serving = Seq(
      ev(1, 0, "a", 0.0), ev(2, 1000, "a", 1.0),
      ev(3, 2000, "a", 2.0), ev(4, 3000, "a", 3.0),
      ev(5, 4000, "b", -5.0), ev(6, 5000, "b", 99.0),
      ev(7, h, "a", 3.0), ev(8, h + 1000, "a", 99.0),
      ev(99, 1000 * h, "a", 1.0))
      .toDF("event_id", "ts_t", "user_id", "event_type", "value")
    val base = java.nio.file.Files.createTempDirectory("graft-driftmon")
    val srcDir = base.resolve("src").toString
    val sinkDir = base.resolve("sink").toString
    val ckptDir = base.resolve("ckpt").toString
    serving.write.mode("overwrite").parquet(srcDir)

    def runOnce(): Unit = {
      val q = Pipeline.driftMonitorStream(
        spark.readStream.schema(EventSchema).parquet(srcDir),
        trainingSnapshot = ref, sinkDir = sinkDir, checkpointDir = ckptDir,
        nBins = nBins, windowDur = "1 hour", watermark = "10 minutes",
        trigger = Trigger.AvailableNow())
      assert(q.awaitTermination(120000), "stream did not finish in 120 s")
    }
    runOnce()

    def sinkRows() = spark.read.parquet(sinkDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val got = sinkRows()
    val buckets = got.keys.map(_._1).toSeq.distinct.sorted
    assert(buckets.size == 2,
      s"exactly the two finalized windows must reach the sink, got $buckets")
    assert(got((buckets.head, "a")) == (4L, 4L, 0L),
      "window matching the reference has zero KS gap")
    assert(got((buckets.head, "b")) == (2L, 4L, 2L),
      "out-of-range values clamp to the edge bins")
    assert(got((buckets.last, "a")) == (2L, 4L, 6L),
      "all-top-bin window reaches cum gap |0*4 - 3*2| = 6")
    assert(!got.contains((buckets.last, "b")), "no b rows in window 2")

    // restart from the checkpoint over the same source: exactly-once
    // means the append sink gains NOTHING
    runOnce()
    assert(sinkRows() == got, "restart must not duplicate sink rows")
    // the idempotency mechanism is visible in the layout: each batch
    // owns a batchId= partition it would overwrite on replay
    assert(spark.read.parquet(sinkDir).columns.contains("batchId"),
      "sink must be partitioned by micro-batch id")
  }

  test("driftMonitorStream honors non-default group/value/ts column names") {
    import graft.Pipeline
    // same distributions as the default-named test's window 1, under
    // renamed columns end to end: the reference must be learned on
    // `v` grouped by `g`, and the stream binned on the SAME columns
    // (a half-plumbed monitor would train on one column and bin on
    // another without erroring)
    val ref = Seq(
      ("a", 0.0), ("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 0.0), ("b", 0.5), ("b", 0.75), ("b", 3.0))
      .toDF("g", "v")
    val t0 = 1600000000000L
    val h = 3600000L
    val serving = Seq(
      (1L, new java.sql.Timestamp(t0), "a", 0.0),
      (2L, new java.sql.Timestamp(t0 + 1000), "a", 1.0),
      (3L, new java.sql.Timestamp(t0 + 2000), "a", 2.0),
      (4L, new java.sql.Timestamp(t0 + 3000), "a", 3.0),
      (5L, new java.sql.Timestamp(t0 + 4000), "b", -5.0),
      (6L, new java.sql.Timestamp(t0 + 5000), "b", 99.0),
      (99L, new java.sql.Timestamp(t0 + 1000 * h), "a", 1.0))
      .toDF("id", "t", "g", "v")
    val base = java.nio.file.Files.createTempDirectory("graft-driftmon-cols")
    val srcDir = base.resolve("src").toString
    val sinkDir = base.resolve("sink").toString
    serving.write.mode("overwrite").parquet(srcDir)
    val q = Pipeline.driftMonitorStream(
      spark.readStream.schema(serving.schema).parquet(srcDir),
      trainingSnapshot = ref, sinkDir = sinkDir,
      checkpointDir = base.resolve("ckpt").toString,
      nBins = 4, windowDur = "1 hour", watermark = "10 minutes",
      groupCol = "g", valueCol = "v", tsCol = "t",
      trigger = Trigger.AvailableNow())
    assert(q.awaitTermination(120000), "stream did not finish in 120 s")
    val got = spark.read.parquet(sinkDir).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("a") == (4L, 4L, 0L), s"group a golden KS row, got $got")
    assert(got("b") == (2L, 4L, 2L), s"group b golden KS row, got $got")
  }

  test("sessionize: a cross-batch late event widens the session, never regresses it") {
    val t0 = 1600000000000L
    def ev(id: Long, user: Long, tMs: Long, v: Double) =
      Event(id, new java.sql.Timestamp(t0 + tMs), user, "click", v)
    val dir = java.nio.file.Files.createTempDirectory("graft-sess-late").toString
    // batch 1: events at +0 and +20 min; watermark after it sits at
    // +20min - 30min (before t0), so the +5 min late event in batch 2
    // is admitted — it must NOT pull the session's end back to +5 min
    Seq(ev(1, 1, 0, 1.0), ev(2, 1, 20 * 60000L, 2.0)).toDS()
      .coalesce(1).write.mode("overwrite").parquet(dir)
    Seq(ev(3, 1, 5 * 60000L, 4.0),
        ev(99, 9, 100 * 3600000L, 0.0)).toDS() // sentinel advances watermark
      .coalesce(1).write.mode("append").parquet(dir)
    val q = sessionize(
        spark.readStream.schema(EventSchema).parquet(dir).as[Event], 30)
      .writeStream.outputMode("append").format("memory").queryName("sess_late_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish in 120 s")
    val sess = spark.table("sess_late_out").as[Session].collect()
      .filter(_.user_id == 1L)
    assert(sess.length == 1)
    assert(sess.head.start_us == t0 * 1000L &&
      sess.head.end_us == (t0 + 20 * 60000L) * 1000L &&
      sess.head.n_events == 3 && sess.head.total_value == 7.0,
      s"late in-gap event must fold into the session without regressing " +
        s"its bounds, got ${sess.head}")
  }

  test("sessionize: deeply-late events under a long watermark emit separate sessions") {
    val t0 = 1600000000000L
    def ev(id: Long, user: Long, tMs: Long, v: Double) =
      Event(id, new java.sql.Timestamp(t0 + tMs), user, "click", v)
    val dir = java.nio.file.Files.createTempDirectory("graft-sess-deep").toString
    // batch 1: open session at +100/+101 min
    Seq(ev(1, 1, 100 * 60000L, 1.0), ev(2, 1, 101 * 60000L, 2.0)).toDS()
      .coalesce(1).write.mode("overwrite").parquet(dir)
    // batch 2: +10/+12 min — more than the 30-min gap BEFORE the open
    // session's start, admitted only because the watermark delay
    // (1200 min) exceeds the gap; they must become their own closed
    // session (the batch twin's answer), NOT fold into [+100, +101].
    // Sentinel advances the watermark so the open session times out.
    Seq(ev(3, 1, 10 * 60000L, 4.0), ev(4, 1, 12 * 60000L, 8.0),
        ev(99, 9, 100 * 3600000L, 0.0)).toDS()
      .coalesce(1).write.mode("append").parquet(dir)
    val q = sessionize(
        spark.readStream.schema(EventSchema).parquet(dir).as[Event],
        gapMinutes = 30, watermarkMinutes = 1200)
      .writeStream.outputMode("append").format("memory").queryName("sess_deep_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish in 120 s")
    val sess = spark.table("sess_deep_out").as[Session].collect()
      .filter(_.user_id == 1L).sortBy(_.start_us)
    assert(sess.length == 2, s"expected an early and a main session, got ${sess.toSeq}")
    assert(sess(0).start_us == (t0 + 10 * 60000L) * 1000L &&
      sess(0).end_us == (t0 + 12 * 60000L) * 1000L &&
      sess(0).n_events == 2 && sess(0).total_value == 12.0, s"got ${sess(0)}")
    assert(sess(1).start_us == (t0 + 100 * 60000L) * 1000L &&
      sess(1).end_us == (t0 + 101 * 60000L) * 1000L &&
      sess(1).n_events == 2 && sess(1).total_value == 3.0, s"got ${sess(1)}")
  }

  test("sessionize: a deep-late event bridged to the open session by a same-batch " +
      "peer merges in (transitive gap rule), not split off") {
    val t0 = 1600000000000L
    def ev(id: Long, user: Long, tMs: Long, v: Double) =
      Event(id, new java.sql.Timestamp(t0 + tMs), user, "click", v)
    val dir = java.nio.file.Files.createTempDirectory("graft-sess-bridge").toString
    // batch 1: open session at +60 min
    Seq(ev(1, 1, 60 * 60000L, 1.0)).toDS()
      .coalesce(1).write.mode("overwrite").parquet(dir)
    // batch 2: +25 min and +31 min. +25 is 35 min before the open
    // session's start (> 30-min gap) — but +31 bridges it: 25→31 is
    // 6 min, 31→60 is 29 min, so the batch twin (transitive gap
    // split over the sorted timeline) puts ALL THREE in one session.
    // A distance-to-start peel would wrongly emit +25 alone.
    Seq(ev(2, 1, 25 * 60000L, 2.0), ev(3, 1, 31 * 60000L, 4.0),
        ev(99, 9, 100 * 3600000L, 0.0)).toDS() // watermark sentinel
      .coalesce(1).write.mode("append").parquet(dir)
    val q = sessionize(
        spark.readStream.schema(EventSchema).parquet(dir).as[Event],
        gapMinutes = 30, watermarkMinutes = 1200)
      .writeStream.outputMode("append").format("memory").queryName("sess_bridge_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish in 120 s")
    val sess = spark.table("sess_bridge_out").as[Session].collect()
      .filter(_.user_id == 1L)
    assert(sess.length == 1, s"bridged chain must be ONE session, got ${sess.toSeq}")
    assert(sess.head.start_us == (t0 + 25 * 60000L) * 1000L &&
      sess.head.end_us == (t0 + 60 * 60000L) * 1000L &&
      sess.head.n_events == 3 && sess.head.total_value == 7.0, s"got ${sess.head}")
  }

  test("scd2Stream: NaN runs extend one range (Spark-equality NaN semantics)") {
    val t0 = 1600000000000L
    def ev(id: Long, tMs: Long, v: Double) =
      Event(id, new java.sql.Timestamp(t0 + tMs), 1L, "set", v)
    val dir = java.nio.file.Files.createTempDirectory("graft-scd2-nan").toString
    Seq(ev(1, 0, Double.NaN), ev(2, 1000, Double.NaN), ev(3, 2000, 1.0)).toDS()
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val q = scd2Stream(spark.readStream.schema(EventSchema).parquet(dir).as[Event])
      .writeStream.outputMode("append").format("memory").queryName("scd2_nan_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish in 120 s")
    val closed = spark.table("scd2_nan_out").as[Scd2Closed].collect()
      .sortBy(_.valid_from_us)
    // batch semantics (=!=): NaN equals NaN, so the two NaN events are
    // ONE range closed when the value changes to 1.0 — not one
    // spurious closed row per NaN event
    assert(closed.length == 1, s"expected one closed NaN range, got ${closed.toSeq}")
    assert(closed.head.value.isNaN &&
      closed.head.valid_from_us == t0 * 1000L &&
      closed.head.valid_to_us == (t0 + 2000L) * 1000L)
  }

  test("streaming parameter validation fails fast") {
    val e = Seq.empty[Event].toDS()
    intercept[IllegalArgumentException] {
      StreamingOps.intervalJoin(e.toDF(), e.toDF(), withinMinutes = -5)
    }
    intercept[IllegalArgumentException] {
      StreamingOps.driftBinStream(e.toDF(), 0.0, 1.0, nBins = 0)
    }
    // a negative gap previously built a valid plan and killed the
    // RUNNING query when a timeout timestamp fell below the watermark
    intercept[IllegalArgumentException] {
      sessionize(e, gapMinutes = -5)
    }
    intercept[IllegalArgumentException] {
      StreamingOps.scd2Stream(e, stateTtlMs = Some(0L))
    }
  }

  test("scd2Stream with a (long) TTL emits the same closed rows as without") {
    val t0 = 1600000000000L
    def ev(id: Long, user: Long, tMs: Long, v: Double) =
      Event(id, new java.sql.Timestamp(t0 + tMs), user, "click", v)
    val dir = java.nio.file.Files.createTempDirectory("graft-scd2ttl").toString
    Seq(ev(1, 1, 0L, 5.0), ev(2, 1, 1000L, 5.0), ev(3, 1, 2000L, 7.0),
        ev(4, 1, 3000L, 5.0), ev(5, 2, 0L, 9.0)).toDS()
      .coalesce(1).write.mode("overwrite").parquet(dir)
    // ProcessingTimeTimeout queries never self-terminate under
    // AvailableNow (see markovStream TTL test) — poll the sink for
    // the expected rows, then stop()
    val q = StreamingOps.scd2Stream(
        spark.readStream.schema(EventSchema).parquet(dir).as[Event],
        stateTtlMs = Some(3600L * 1000L)).writeStream
      .outputMode("append").format("memory").queryName("scd2_ttl_out")
      .trigger(Trigger.ProcessingTime("10 seconds")).start()
    val want = Set((1L, 5.0, (t0 + 0L) * 1000L, (t0 + 2000L) * 1000L),
                   (1L, 7.0, (t0 + 2000L) * 1000L, (t0 + 3000L) * 1000L))
    try {
      def rows() = spark.table("scd2_ttl_out").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSet
      val deadline = System.nanoTime() + 120L * 1000000000L
      var got = rows()
      while (got != want && System.nanoTime() < deadline) {
        Thread.sleep(250); got = rows()
      }
      assert(got == want, s"TTL scd2 stream never produced $want, got $got")
    } finally stopOnIdleTick(q)
  }
}
