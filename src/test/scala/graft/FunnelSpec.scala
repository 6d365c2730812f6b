package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.dialect.{ChContext, ChFunctions}

/** Behavioral/funnel aggregates (functions/Funnel.scala): windowFunnel
  * level semantics (window from chain start, strict_increase),
  * sequenceMatch/sequenceCount pattern search, retention composition,
  * uniqUpTo saturation — all through the ClickHouse dialect, plus a
  * forced multi-partition run to pin the partial/final merge path.
  */
class FunnelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** events(user, ts-seconds, type) as a temp view `fev` with a real
    * TIMESTAMP column (epoch-second based for easy window math). */
  private def withEvents(rows: Seq[(Long, Long, String)])(body: => Unit): Unit = {
    val df = spark.createDataFrame(rows).toDF("user_id", "sec", "event_type")
      .selectExpr("user_id", "timestamp_seconds(sec) AS ts", "event_type")
    df.createOrReplaceTempView("fev")
    try body finally spark.catalog.dropTempView("fev")
  }

  private def sql(q: String) = {
    ChFunctions.register(spark)
    graft.dialect.Engine.execute(spark, q)
  }

  private def funnel(q: String): Map[Long, Int] =
    sql(q).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("windowFunnel carries the chain-start window across levels") {
    withEvents(Seq(
      // u1: full chain inside the window => 3
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      // u2: purchase lands past chain-start+window => 2
      (2L, 100L, "view"), (2L, 200L, "click"), (2L, 1200L, "purchase"),
      // u3: click before any view => 1 (view exists later, no click after)
      (3L, 100L, "click"), (3L, 200L, "view"),
      // u4: no relevant events at all => 0
      (4L, 100L, "error"),
      // u5: a LATER view restarts the window, rescuing the chain => 3
      (5L, 0L, "view"), (5L, 900L, "view"), (5L, 1000L, "click"),
      (5L, 1400L, "purchase")
    )) {
      val lvl = funnel("""
        SELECT user_id, windowFunnel(1000)(ts, event_type = 'view',
          event_type = 'click', event_type = 'purchase') AS lvl
        FROM fev GROUP BY user_id""")
      assert(lvl === Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0, 5L -> 3))
    }
  }

  test("windowFunnel strict_increase refuses equal-timestamp steps") {
    withEvents(Seq(
      (1L, 100L, "view"), (1L, 100L, "click"),
      (2L, 100L, "view"), (2L, 101L, "click")
    )) {
      val default = funnel("""
        SELECT user_id, windowFunnel(1000)(ts, event_type = 'view',
          event_type = 'click') AS lvl FROM fev GROUP BY user_id""")
      val strict = funnel("""
        SELECT user_id, windowFunnel(1000, 'strict_increase')(ts,
          event_type = 'view', event_type = 'click') AS lvl
        FROM fev GROUP BY user_id""")
      assert(default === Map(1L -> 2, 2L -> 2))
      assert(strict === Map(1L -> 1, 2L -> 2))
    }
  }

  test("windowFunnel strict_order cuts chains on interleaving events") {
    withEvents(Seq(
      // u1: view, click, ERROR, purchase — error interleaves (it IS a
      // funnel condition here), so strict_order stops at 2
      (1L, 100L, "view"), (1L, 200L, "click"),
      (1L, 300L, "error"), (1L, 400L, "purchase"),
      // u2: perfectly consecutive chain => 3
      (2L, 100L, "view"), (2L, 200L, "click"), (2L, 300L, "purchase")
    )) {
      def lvl(modes: String) = funnel(s"""
        SELECT user_id, windowFunnel(1000$modes)(ts,
          event_type = 'view', event_type = 'click',
          event_type = 'purchase', event_type = 'error') AS lvl
        FROM fev GROUP BY user_id""")
      assert(lvl("") === Map(1L -> 3, 2L -> 3))
      assert(lvl(", 'strict_order'") === Map(1L -> 2, 2L -> 3))
    }
  }

  test("windowFunnel strict_deduplication interrupts on a repeated condition") {
    withEvents(Seq(
      // view, click, VIEW AGAIN, purchase: the repeat kills the
      // level-2 chain before purchase can extend it => 2 (best seen)
      (1L, 100L, "view"), (1L, 200L, "click"),
      (1L, 300L, "view"), (1L, 400L, "purchase"),
      (2L, 100L, "view"), (2L, 200L, "click"), (2L, 300L, "purchase")
    )) {
      def lvl(modes: String) = funnel(s"""
        SELECT user_id, windowFunnel(1000$modes)(ts,
          event_type = 'view', event_type = 'click',
          event_type = 'purchase') AS lvl
        FROM fev GROUP BY user_id""")
      assert(lvl("") === Map(1L -> 3, 2L -> 3))
      assert(lvl(", 'strict_deduplication'") === Map(1L -> 2, 2L -> 3))
    }
  }

  test("windowFunnel merge across partitions equals single-partition run") {
    val rows = (0L until 400L).map { i =>
      val u = i % 7
      val t = i * 13 % 1000
      val ty = (i % 4) match {
        case 0 => "view"; case 1 => "click"; case 2 => "purchase"
        case _ => "error"
      }
      (u, t, ty)
    }
    withEvents(rows) {
      // the dialect path runs over however the view is partitioned;
      // force a many-partition copy and compare against a 1-partition run
      val one = spark.table("fev").coalesce(1)
      val many = spark.table("fev").repartition(8)
      def lvls(name: String) = funnel(s"""
        SELECT user_id, windowFunnel(500)(ts, event_type = 'view',
          event_type = 'click', event_type = 'purchase') AS lvl
        FROM $name GROUP BY user_id""")
      one.createOrReplaceTempView("fev_one")
      many.createOrReplaceTempView("fev_many")
      try assert(lvls("fev_one") === lvls("fev_many"))
      finally {
        spark.catalog.dropTempView("fev_one")
        spark.catalog.dropTempView("fev_many")
      }
    }
  }

  test("sequenceMatch finds ordered chains; adjacency is positional") {
    withEvents(Seq(
      // u1: view .. (error ignored) .. purchase => loose match, and the
      // view/purchase subsequence is adjacent too
      (1L, 100L, "view"), (1L, 150L, "error"), (1L, 200L, "purchase"),
      // u2: purchase before view => no match either way
      (2L, 100L, "purchase"), (2L, 200L, "view"),
      // u3: view, CLICK, purchase: loose matches, adjacency does not
      // (click satisfies condition 3 and sits between them)
      (3L, 100L, "view"), (3L, 150L, "click"), (3L, 200L, "purchase")
    )) {
      val loose = funnel("""
        SELECT user_id, sequenceMatch('(?1).*(?2)')(ts,
          event_type = 'view', event_type = 'purchase',
          event_type = 'click') AS m FROM fev GROUP BY user_id""")
      assert(loose === Map(1L -> 1, 2L -> 0, 3L -> 1))
      val adjacent = funnel("""
        SELECT user_id, sequenceMatch('(?1)(?2)')(ts,
          event_type = 'view', event_type = 'purchase',
          event_type = 'click') AS m FROM fev GROUP BY user_id""")
      assert(adjacent === Map(1L -> 1, 2L -> 0, 3L -> 0))
    }
  }

  test("sequenceCount counts non-overlapping matches left to right") {
    withEvents(Seq(
      (1L, 100L, "view"), (1L, 110L, "click"),
      (1L, 120L, "view"), (1L, 130L, "click"),
      (1L, 140L, "view"), // unpaired
      (2L, 100L, "click"), (2L, 110L, "view")
    )) {
      val c = sql("""
        SELECT user_id, sequenceCount('(?1)(?2)')(ts,
          event_type = 'view', event_type = 'click') AS c
        FROM fev GROUP BY user_id""")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(c === Map(1L -> 2L, 2L -> 0L))
    }
  }

  test("sequence pattern rejects unsupported syntax at plan time") {
    withEvents(Seq((1L, 100L, "view"))) {
      val e = intercept[Exception](sql("""
        SELECT sequenceMatch('(?1)[x](?2)')(ts,
          event_type = 'view', event_type = 'click') AS m
        FROM fev""").collect())
      assert(e.getMessage != null)
    }
  }

  test("sequence time constraints bound the gap between matched events") {
    withEvents(Seq(
      (1L, 100L, "view"), (1L, 150L, "click"),   // 50s gap
      (2L, 100L, "view"), (2L, 800L, "click")    // 700s gap
    )) {
      def m(pat: String) = funnel(s"""
        SELECT user_id, sequenceMatch('$pat')(ts,
          event_type = 'view', event_type = 'click') AS m
        FROM fev GROUP BY user_id""")
      assert(m("(?1)(?t<=600)(?2)") === Map(1L -> 1, 2L -> 0))
      assert(m("(?1)(?t>600)(?2)") === Map(1L -> 0, 2L -> 1))
      // constraint applies across a .* hop too
      assert(m("(?1)(?t<600).*(?2)") === Map(1L -> 1, 2L -> 0))
      // a time constraint with no consumed event before it (`.*` pins
      // no timestamp) or none after it is rejected at plan time, never
      // silently ignored / never-matching (ClickHouse raises too)
      intercept[Exception](m(".*(?t<=5)(?1)"))
      intercept[Exception](m("(?1)(?2)(?t<=5)"))
      intercept[Exception](m("(?1)(?t<=5).*"))
    }
  }

  test("retention composes max-ever flags gated on the first condition") {
    withEvents(Seq(
      (1L, 100L, "view"), (1L, 200L, "click"),
      (2L, 100L, "click"), (2L, 200L, "purchase"), // no view => all 0
      (3L, 100L, "view"), (3L, 200L, "purchase")
    )) {
      val r = sql("""
        SELECT user_id,
          arrayStringConcat(arrayMap(x -> toString(x),
            retention(event_type = 'view', event_type = 'click',
                      event_type = 'purchase')), ',') AS r
        FROM fev GROUP BY user_id""")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(r === Map(1L -> "1,1,0", 2L -> "0,0,0", 3L -> "1,0,1"))
    }
  }

  test("uniqUpTo is exact below the cap and saturates at N+1") {
    withEvents((1L to 20L).map(i => (i % 2, i * 10, s"t$i")) ++
               Seq((2L, 500L, "t1"), (2L, 510L, "t1"))) {
      val u = sql("""
        SELECT user_id, uniqUpTo(3)(event_type) AS u
        FROM fev GROUP BY user_id""")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // users 0 and 1 have 10 distinct types => saturate at 4;
      // user 2 has exactly 1 => exact
      assert(u === Map(0L -> 4L, 1L -> 4L, 2L -> 1L))
    }
  }

  test("funnel family runs on the sf0.001 fixture through the registry") {
    val dir = "/root/testdata/sf0.001"
    Seq("g17_retention", "g18_window_funnel", "g19_sequence_match",
        "g20_sequence_count", "g21_uniq_upto").foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      assert(df.count() > 0, name)
    }
  }
}
