package graft

import java.time.{Instant, ZoneOffset}

/** Brute-force reference checks for the finance family on a RANDOM
  * generated fixture (seeded): the DuckDB oracle proves engine-vs-engine
  * equality on the driver fixtures; these prove the declared queries
  * (run verbatim through `SparkEntry.queries` on a synthetic events dir)
  * against independent in-memory implementations of the math. */
class FinancePropertySpec extends SparkSpec {

  private case class Ev(id: Long, tsMicros: Long, user: Long, et: String, value: Double)

  private lazy val events: Seq[Ev] = {
    val rnd = new scala.util.Random(42)
    (1 to 5000).map { i =>
      Ev(i.toLong,
        1700000000000000L + rnd.nextInt(6 * 86400) * 1000000L + rnd.nextInt(1000) * 1000L,
        rnd.nextInt(20).toLong,
        Seq("a", "b", "c")(rnd.nextInt(3)),
        math.rint(rnd.nextDouble() * 100000) / 100.0)
    }
  }

  private lazy val dir: String = {
    val d = tempDir("fin-prop")
    val s = spark
    import s.implicits._
    events.map(e => (e.id, new java.sql.Timestamp(e.tsMicros / 1000), e.user, e.et, e.value, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def dec(v: Double): BigDecimal =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  test("ts_drawdown matches a brute-force decimal path computation") {
    val got = SparkEntry.queries("ts_drawdown")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    val byUser = events.groupBy(_.user)
    assert(got.keySet === byUser.keySet)
    byUser.foreach { case (u, evs) =>
      val path = evs.sortBy(e => (e.tsMicros, e.id))
      var cum = BigDecimal(0); var peak = BigDecimal(0); var dd = BigDecimal(0)
      var first = true
      path.foreach { e =>
        cum += dec(e.value)
        peak = if (first) cum else peak.max(cum)
        first = false
        dd = dd.max(peak - cum)
      }
      val (gotDd, gotPeak, gotN) = got(u)
      assert(gotN === evs.size.toLong)
      assert(gotDd === dd.toDouble, s"user $u drawdown")
      assert(gotPeak === peak.toDouble, s"user $u peak")
    }
  }

  test("ts_var_cvar matches brute-force tail selection") {
    val got = SparkEntry.queries("ts_var_cvar")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    val byKey = events.groupBy(e => (e.et,
      Instant.ofEpochMilli(e.tsMicros / 1000).atZone(ZoneOffset.UTC).toLocalDate.toString))
    assert(got.keySet === byKey.keySet)
    byKey.foreach { case (key, evs) =>
      val n = evs.size
      val k = math.ceil(0.05 * n).toLong.max(1L)
      val tail = evs.sortBy(e => (e.value, e.id)).take(k.toInt)
      val varV = tail.map(_.value).max
      val cvar = (tail.map(e => dec(e.value)).sum.toDouble / tail.size)
      val (gotN, gotK, gotVar, gotCvar) = got(key)
      assert(gotN === n.toLong && gotK === k, s"$key n/k")
      assert(gotVar === varV, s"$key VaR")
      assert(math.abs(gotCvar - cvar) < 1e-9, s"$key CVaR")
    }
  }

  test("ts_twap matches brute-force interval weighting") {
    val got = SparkEntry.queries("ts_twap")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getDouble(2), r.getLong(3)))).toMap
    val byKey = events.groupBy(e => (e.user,
      Instant.ofEpochMilli(e.tsMicros / 1000).atZone(ZoneOffset.UTC).toLocalDate.toString))
    byKey.foreach { case (key, evs) =>
      val ordered = evs.sortBy(e => (e.tsMicros, e.id))
      val intervals = ordered.sliding(2).collect {
        case Seq(a, b) => (a.value, b.tsMicros - a.tsMicros)
      }.toSeq
      val tsum = intervals.map(_._2).sum
      if (intervals.isEmpty || tsum == 0L)
        assert(!got.contains(key), s"$key should drop (no interval mass)")
      else {
        val wsum = intervals.map { case (v, dt) => dec(v) * BigDecimal(dt) }.sum
        val twap = wsum.toDouble / tsum.toDouble
        val (gotTwap, gotN) = got(key)
        assert(gotN === intervals.size.toLong, s"$key n_intervals")
        assert(math.abs(gotTwap - twap) < 1e-9, s"$key twap")
      }
    }
    assert(got.nonEmpty)
  }
}
