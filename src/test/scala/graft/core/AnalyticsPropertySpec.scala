package graft.core

import scala.util.Random
import graft.SparkSpec
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Randomized invariants for the round-5 analytics/warehouse
  * operators: each optimized implementation must satisfy the
  * defining algebraic property of its operator on arbitrary inputs.
  * Seeds are fixed — failures are reproducible.
  */
class AnalyticsPropertySpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff: applying the change feed to OLD reconstructs NEW (3 seeds)") {
    for (seed <- Seq(11, 12, 13)) {
      val rnd = new Random(seed)
      val old = (1L to 300L).map(k => (k, rnd.nextInt(5).toLong, rnd.nextInt(20).toDouble))
      // random evolution: drop ~10%, mutate ~20%, add ~10% fresh keys
      val next = old.filter(_ => rnd.nextInt(10) > 0)
        .map { case (k, a, b) =>
          if (rnd.nextInt(5) == 0) (k, a, b + 100.0) else (k, a, b) } ++
        (1001L to 1030L).map(k => (k, rnd.nextInt(5).toLong, rnd.nextInt(20).toDouble))
      val oldDf = old.toDF("k", "a", "b")
      val nextDf = next.toDF("k", "a", "b")
      val feed = Warehouse.snapshotDiff(oldDf, nextDf, Seq("k"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // replay: old minus removed/changed, plus new rows for added/changed
      val nextByK = next.map(t => t._1 -> t).toMap
      val rebuilt =
        old.filter(t => !feed.get(t._1).exists(c => c == "removed" || c == "changed")) ++
        feed.collect { case (k, c) if c == "added" || c == "changed" => nextByK(k) }
      assert(rebuilt.toSet == next.toSet, s"seed $seed: replay mismatch")
      // and no unchanged rows leak into the feed
      val unchanged = old.toSet.intersect(next.toSet).map(_._1)
      assert(feed.keySet.intersect(unchanged).isEmpty)
    }
  }

  test("markovTransitions: totals are consistent and pairs conserve (3 seeds)") {
    for (seed <- Seq(21, 22, 23)) {
      val rnd = new Random(seed)
      val ev = (1 to 400).map { i =>
        (i.toLong, rnd.nextLong(1000000) * 1000L, rnd.nextInt(7).toLong,
          Seq("a", "b", "c", "d")(rnd.nextInt(4)))
      }.toDF("event_id", "ts", "user_id", "event_type")
      val rows = Ops.markovTransitions(ev).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // Σ cnt within a from-group == that group's from_total
      rows.groupBy(_._1).foreach { case (from, grp) =>
        val total = grp.map(_._3).sum
        assert(grp.forall(_._4 == total), s"seed $seed: total mismatch for $from")
      }
      // Σ all counts == Σ_users (n_events - 1)
      val perUser = ev.groupBy("user_id").count().collect().map(_.getLong(1))
      assert(rows.map(_._3).sum == perUser.map(n => math.max(0L, n - 1)).sum)
    }
  }

  test("resampleFfill: grid sizes, coverage, and carried values (3 seeds)") {
    for (seed <- Seq(31, 32, 33)) {
      val rnd = new Random(seed)
      val ev = (1 to 300).map { i =>
        (i.toLong, (rnd.nextInt(500) * 10L + rnd.nextInt(10)) * 1000L,
          rnd.nextInt(10).toLong, rnd.nextInt(100).toDouble)
      }.toDF("event_id", "ts", "user_id", "value")
      val out = Ops.resampleFfill(ev, gridUs = 50L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val events = ev.collect().map(r =>
        (r.getLong(2), r.getLong(1) / 1000 / 50, r.getLong(1) / 1000, r.getLong(0), r.getDouble(3)))
      // per user: one row per slot in [min, max], no gaps
      events.groupBy(_._1).foreach { case (u, es) =>
        val (lo, hi) = (es.map(_._2).min, es.map(_._2).max)
        val slots = out.filter(_._1 == u).map(_._2).sorted.toSeq
        assert(slots == (lo to hi), s"seed $seed user $u: grid not dense")
      }
      // every filled value equals the user's latest (us, event_id)-max
      // event at or before the slot end
      out.foreach { case (u, slot, v) =>
        val eligible = events.filter(e => e._1 == u && e._2 <= slot)
        val expect = eligible.maxBy(e => (e._3, e._4))._5
        assert(v == expect, s"seed $seed user $u slot $slot")
      }
    }
  }

  test("invertedIndex == brute-force postings on random corpora (3 seeds)") {
    for (seed <- Seq(41, 42, 43)) {
      val rnd = new Random(seed)
      val docs = (1L to 150L).map { i =>
        val n = 1 + rnd.nextInt(8)
        (i, Seq.fill(n)(s"w${rnd.nextInt(12)}").mkString(" "))
      }
      val got = TextOps.invertedIndex(docs.toDF("doc_id", "text"), minDf = 3L, headLen = 4)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
      val brute = docs.flatMap { case (id, t) => t.split("\\s+").distinct.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted)
        .filter(_._2.size >= 3)
        .map { case (tok, ids) => tok -> (ids.size.toLong, ids.take(4).mkString(",")) }
        .toMap
      assert(got == brute, s"seed $seed")
    }
  }
}
