package graft.ops

import graft.SparkSpec

class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private def tsAtHour(h: Long) = new java.sql.Timestamp(h * 3600L * 1000L)

  test("binnedAcf: hand-computed alternating series (gaps are zeros), lag>grid NULL, pair counts") {
    // events at hours 0, 2, 4 (2 each) → dense grid y = [2,0,2,0,2],
    // N = 5, S1 = 6, S2 = 12
    val ev = Seq(0L, 0L, 2L, 2L, 4L, 4L).map(tsAtHour).toDF("ts")
    val got = Timeseries.binnedAcf(ev, "ts", maxLag = 6)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    // lag 1: num = 25·0 − 5·6·(12−2−2) + 4·36 = −96, den = 25·12 − 5·36
    // = 120 → −0.8 exactly
    assert(got(1L) === ((4L, Some(-800000000000L))))
    // lag 2: C₂ = 8, head = tail = 2 → num = 200 − 240 + 108 = 68 →
    // 68/120 = 0.5666… (the period-2 peak)
    assert(got(2L) === ((3L, Some(566666666667L))))
    // lag 4: C₄ = 4, head = 4, tail = 4 → num = 100 − 120 + 36 = 16 →
    // 16/120 = 0.1333…
    assert(got(4L) === ((1L, Some(133333333333L))))
    // lags at/past the grid length: no pairs, visible NULL
    assert(got(5L) === ((0L, None)))
    assert(got(6L) === ((0L, None)))
  }

  test("binnedAcf: constant series has undefined ACF (NULL, not a fake 1); NULL ts excluded") {
    val ev = ((0L to 3L).map(tsAtHour).map(Option(_)) :+
      Option.empty[java.sql.Timestamp]).toDF("ts")
    val got = Timeseries.binnedAcf(ev, "ts", maxLag = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2))))).toMap
    assert(got(1L) === ((3L, None)), "den = 0 on a constant grid")
    assert(got(2L) === ((2L, None)))
  }

  test("cusumChangepoint: hand-computed mean-shift peak; NULL ts excluded; empty input = no rows") {
    // hours 0,1,2 carry 3 events each, hours 3,4,5 carry 1 each:
    // y = [3,3,3,1,1,1], N = 6, Y = 12; s_scaled(t) = 6·P(t) − (t+1)·12
    // = [6, 12, 18, 12, 6, 0] — peak 18 at hour 2 (the shift boundary)
    val ev = (Seq.fill(3)(0L) ++ Seq.fill(3)(1L) ++ Seq.fill(3)(2L) ++
      Seq(3L, 4L, 5L)).map(tsAtHour).map(Option(_))
    val got = Timeseries.cusumChangepoint(
      (ev :+ Option.empty[java.sql.Timestamp]).toDF("ts"), "ts").collect()
    assert(got.length === 1)
    assert(got.head.getTimestamp(0) === tsAtHour(2L))
    assert((got.head.getLong(1), got.head.getLong(2), got.head.getLong(3)) ===
      ((18L, 6L, 12L)))
    assert(Timeseries.cusumChangepoint(
      Seq.empty[Option[java.sql.Timestamp]].toDF("ts"), "ts").count() === 0L)
  }

  test("markovTransitions + entropyRate: hand-computed kernel; ts ties break on event_id; NULL-type rows drop") {
    import java.sql.Timestamp
    val t0 = new Timestamp(1000L)
    val t1 = new Timestamp(2000L)
    // user 1: A→B→A→B (the 3rd/4th share a ts — event_id orders them);
    // user 2: A→A; a NULL-type row for user 2 drops BEFORE pairing
    val ev = Seq(
      (1L, t0, 10L, Option("A")), (1L, new Timestamp(1500L), 11L, Option("B")),
      (1L, t1, 12L, Option("A")), (1L, t1, 13L, Option("B")),
      (2L, t0, 20L, Option("A")), (2L, t1, 22L, Option("A")),
      (2L, new Timestamp(1500L), 21L, Option.empty[String]))
      .toDF("user_id", "ts", "event_id", "event_type")
    val cells = Timeseries.markovTransitions(ev, "user_id", "ts",
        "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(cells === Map(
      ("A", "B") -> ((2L, 3L, 666667L)),
      ("A", "A") -> ((1L, 3L, 333333L)),
      ("B", "A") -> ((1L, 1L, 1000000L))))
    // H = (2·round(log2(3/2)·1e12) + round(log2(3)·1e12) + 0) / 4
    val h = Timeseries.entropyRate(ev, "user_id", "ts",
      "event_type", "event_id").collect().head
    assert((h.getLong(0), h.getLong(1)) === ((4L, 2L)))
    val expect = math.round((2.0 * math.round(math.log(1.5) / math.log(2.0)
      * 1e12) + math.round(math.log(3.0) / math.log(2.0) * 1e12)) / 4.0)
    assert(h.getLong(2) === expect)
    // no transitions at all (every user has one event): no rows
    assert(Timeseries.entropyRate(
      Seq((1L, t0, 1L, Option("A"))).toDF("user_id", "ts", "event_id", "event_type"),
      "user_id", "ts", "event_type", "event_id").count() === 0L)
  }

  test("cusumChangepoint: gap extrema are caught at gap endpoints; |s| ties break to the earliest bin") {
    // 6 events at hour 0, 6 at hour 5: N = 6, Y = 12; observed candidates
    // s(0) = 6·6 − 12 = +24, s(5) = 0; the gap candidate at bin 4 is
    // 6·6 − 5·12 = −24 (the trough an observed-bins-only law would miss).
    // |24| ties |−24| → earliest bin (0, +24) wins deterministically.
    val ev = (Seq.fill(6)(0L) ++ Seq.fill(6)(5L)).map(tsAtHour).toDF("ts")
    val got = Timeseries.cusumChangepoint(ev, "ts").collect()
    assert(got.length === 1)
    assert(got.head.getTimestamp(0) === tsAtHour(0L))
    assert((got.head.getLong(1), got.head.getLong(2), got.head.getLong(3)) ===
      ((24L, 6L, 12L)))
  }

  test("permutationEntropy: monotone stream = 0, two-pattern stream = ln 2, stable tie-break, stream isolation") {
    import java.sql.Timestamp
    def ev(id: Long, user: Long, typ: String, sec: Long, v: Double) =
      (id, new Timestamp(sec * 1000L), user, typ, v)
    def run(rows: Seq[(Long, Timestamp, Long, String, Double)]) =
      Timeseries.permutationEntropy(
        rows.toDF("event_id", "ts", "user_id", "event_type", "value"),
        "user_id", "ts", "value", "event_type", "event_id")
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toMap
    // strictly increasing: every triple is the SAME pattern → H = 0
    val mono = run((1L to 5L).map(i => ev(i, 1L, "up", i, i.toDouble)))
    assert(mono("up") === ((3L, 1L, 0L, 0L)))
    // all-equal values: the positional tie-break makes ties ONE pattern
    // (the same one as strictly-increasing), not an arbitrary split
    val flat = run((1L to 4L).map(i => ev(i, 1L, "fl", i, 7.0)))
    assert(flat("fl") === ((2L, 1L, 0L, 0L)))
    // 1,3,2,4 → two triples, two distinct patterns → H = ln 2,
    // pe = ln2/ln6
    val mix = run(Seq(ev(1, 1, "mx", 1, 1.0), ev(2, 1, "mx", 2, 3.0),
      ev(3, 1, "mx", 3, 2.0), ev(4, 1, "mx", 4, 4.0)))
    val hPico = 2L * math.round(math.log(2.0) * 1e12) / 2L
    assert(mix("mx") === ((2L, 2L, hPico,
      math.round(hPico.toDouble / math.log(6.0) / 1e6))))
    // triples never straddle users or types: two 2-event streams → no rows
    val split = run(Seq(ev(1, 1, "s", 1, 1.0), ev(2, 1, "s", 2, 2.0),
      ev(3, 2, "s", 3, 3.0), ev(4, 2, "s", 4, 4.0)))
    assert(!split.contains("s"))
  }

  test("runsTest: hand-computed alternating and clumped streams, one-class streams drop") {
    import java.sql.Timestamp
    def ev(id: Long, user: Long, typ: String, sec: Long, v: Double) =
      (id, new Timestamp(sec * 1000L), user, typ, v)
    def run(rows: Seq[(Long, Timestamp, Long, String, Double)]) =
      Timeseries.runsTest(
        rows.toDF("event_id", "ts", "user_id", "event_type", "value"),
        "user_id", "ts", "value", "event_type", "event_id")
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    // {1,9,1,9,1}: median 1, x = FTFTF → R = 5, n1 = 2, n2 = 3:
    // μ = 2·6/5 + 1 = 3.4, σ² = 12·7/100 = 0.84
    val alt = run(Seq(ev(1, 1, "a", 1, 1.0), ev(2, 1, "a", 2, 9.0),
      ev(3, 1, "a", 3, 1.0), ev(4, 1, "a", 4, 9.0), ev(5, 1, "a", 5, 1.0)))
    val zAlt = math.round((5.0 - 3400000L.toDouble / 1.0e6)
      / math.sqrt(840000L.toDouble / 1.0e6) * 1.0e12)
    assert(alt("a") === ((1L, 5L, 3400000L, 840000L, Some(zAlt))))
    // {1,1,9,9}: median 5, x = FFTT → R = 2, μ = 3, σ² = 2/3
    val clump = run(Seq(ev(1, 1, "c", 1, 1.0), ev(2, 1, "c", 2, 1.0),
      ev(3, 1, "c", 3, 9.0), ev(4, 1, "c", 4, 9.0)))
    val zClump = math.round((2.0 - 3000000L.toDouble / 1.0e6)
      / math.sqrt(666667L.toDouble / 1.0e6) * 1.0e12)
    assert(clump("c") === ((1L, 2L, 3000000L, 666667L, Some(zClump))))
    assert(zAlt > 0 && zClump < 0,
      "alternation reads positive, clumping negative")
    // a stream entirely above/below its type median never qualifies:
    // {5,5,5} has n1 = 0 (median 5, strict >) → the type emits no row
    val flat = run(Seq(ev(1, 1, "f", 1, 5.0), ev(2, 1, "f", 2, 5.0),
      ev(3, 1, "f", 3, 5.0)))
    assert(!flat.contains("f"))
  }

  test("theilSenDaily: outlier day cannot move the median slope; exact intercept") {
    import java.sql.Timestamp
    // daily counts 10,12,14,16,100: 6 of 10 pairwise slopes are exactly
    // 2 → median slope 2; residuals y − 2x = 10×4 and 92 → intercept 10
    val counts = Seq(10, 12, 14, 16, 100)
    val rows = counts.zipWithIndex.flatMap { case (y, day) =>
      (0 until y).map { i =>
        (day.toLong * 1000 + i,
          new Timestamp((day.toLong * 86400L + i) * 1000L),
          1L, "e", 1.0)
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Timeseries.theilSenDaily(rows, "ts").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((5L, 10L)))
    assert(r.getDouble(2) === 2.0)
    assert(r.getDouble(3) === 10.0)
    // fewer than 2 observed days: no pairs, no row
    val one = Seq((1L, new Timestamp(1000L), 1L, "e", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(Timeseries.theilSenDaily(one, "ts").count() === 0L)
  }

  test("mannKendallDaily: exact S, tie-corrected variance, continuity z, degenerate NULL") {
    import java.sql.Timestamp
    def daily(counts: Seq[Int]) = counts.zipWithIndex.flatMap {
      case (y, day) => (0 until y).map { i =>
        (day.toLong * 1000 + i,
          new Timestamp((day.toLong * 86400L + i) * 1000L), 1L, "e", 1.0)
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    // strictly increasing counts over 5 days: S = C(5,2) = 10, no ties →
    // var18 = 5·4·15 = 300, z = (10 − 1)/√(300/18)
    val r = Timeseries.mannKendallDaily(daily(Seq(10, 12, 14, 16, 100)), "ts")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((5L, 10L, 300L)))
    assert(r.getLong(3) === math.round(9.0 / math.sqrt(300.0 / 18.0) * 1e12))
    // one tied pair of counts (10,10,12): S = 2, tie run t = 2 →
    // var18 = 3·2·11 − 2·1·9 = 48
    val r2 = Timeseries.mannKendallDaily(daily(Seq(10, 10, 12)), "ts")
      .collect().head
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2)) === ((3L, 2L, 48L)))
    assert(r2.getLong(3) === math.round(1.0 / math.sqrt(48.0 / 18.0) * 1e12))
    // decreasing trend: the continuity correction flips to S + 1;
    // no ties → var18 = 3·2·11 = 66
    val r3 = Timeseries.mannKendallDaily(daily(Seq(12, 11, 10)), "ts")
      .collect().head
    assert((r3.getLong(1), r3.getLong(2)) === ((-3L, 66L)))
    assert(r3.getLong(3) === math.round(-2.0 / math.sqrt(66.0 / 18.0) * 1e12))
    // all days tied: var18 = 0 → z NULL (no trend information)
    val r4 = Timeseries.mannKendallDaily(daily(Seq(7, 7, 7)), "ts")
      .collect().head
    assert((r4.getLong(1), r4.getLong(2)) === ((0L, 0L)))
    assert(r4.isNullAt(3))
  }

  test("pettittDaily: hand-checked split statistic, earliest argmax, flat-series K=0") {
    def tsAtDay(d: Long) = new java.sql.Timestamp(d * 86400L * 1000L)
    // two days of small values then two of large: U = (3,4,3,0) → K = 4
    // at day 1 (the last bin of the first segment); p = min(1, 2e^{-1.2})
    val shift = Seq((tsAtDay(0), 1L), (tsAtDay(1), 2L),
      (tsAtDay(2), 10L), (tsAtDay(3), 11L)).toDF("ts", "v")
    val r = Timeseries.pettittDaily(shift, "ts", "v").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((4L, 4L)))
    assert(r.getLong(2) === 4L)
    assert(r.getLong(3) === 1L)
    val pExp = math.min(1.0, 2.0 * math.exp(-6.0 * 16.0 / (64.0 + 16.0)))
    assert(r.getLong(4) === java.math.BigDecimal.valueOf(pExp * 1.0e12)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue)
    // a flat series has U_t = 0 everywhere: K = 0, p capped at 1
    val flat = Seq((tsAtDay(0), 5L), (tsAtDay(1), 5L), (tsAtDay(2), 5L))
      .toDF("ts", "v")
    val r2 = Timeseries.pettittDaily(flat, "ts", "v").collect().head
    assert(r2.getLong(2) === 0L && r2.getLong(4) === 1000000000000L)
    // monotone single-obs days: the reduction matches the direct
    // double sum (U_1 = 2, U_2 = 2, U_3 = 0)
    val up = Seq((tsAtDay(0), 10L), (tsAtDay(1), 20L), (tsAtDay(2), 30L))
      .toDF("ts", "v")
    val r3 = Timeseries.pettittDaily(up, "ts", "v").collect().head
    assert(r3.getLong(2) === 2L && r3.getLong(3) === 0L)
  }

  test("buishandDaily: hand-exact scaled partial sums, earliest max excursion, constant-series NULL") {
    def tsAtDay(d: Long) = new java.sql.Timestamp(d * 86400L * 1000L)
    // per-day sums y = (3,1,4,2): T·S = (2,−4,2,0) → max 2, min −4,
    // |S| peaks at day 1; s² = 5/3 → R/√T = 6/4/(s·2), Q/√T = 4/4/(s·2)
    val y = Seq((tsAtDay(0), 3L), (tsAtDay(1), 1L),
      (tsAtDay(2), 4L), (tsAtDay(3), 2L)).toDF("ts", "v")
    val r = Timeseries.buishandDaily(y, "ts", "v").collect().head
    assert(r.getLong(0) === 4L)
    assert((r.getDouble(1), r.getDouble(2)) === ((2.0, -4.0)))
    assert(r.getLong(3) === 1L)
    assert(r.getLong(4) === 580947501931L)
    assert(r.getLong(5) === 387298334621L)
    // per-day SUMS are the series: two events in one bin fold first
    val folded = Seq((tsAtDay(0), 1L), (tsAtDay(0), 2L), (tsAtDay(1), 1L),
      (tsAtDay(2), 4L), (tsAtDay(3), 2L)).toDF("ts", "v")
    val r2 = Timeseries.buishandDaily(folded, "ts", "v").collect().head
    assert(r2.getLong(4) === 580947501931L)
    // constant series: s² = 0 → NULL statistics, excursions all 0
    val flat = Seq((tsAtDay(0), 5L), (tsAtDay(1), 5L)).toDF("ts", "v")
    val rf = Timeseries.buishandDaily(flat, "ts", "v").collect().head
    assert(rf.getDouble(1) === 0.0 && rf.isNullAt(4) && rf.isNullAt(5))
    // single bin: T < 2 → NULL
    val one = Seq((tsAtDay(0), 5L)).toDF("ts", "v")
    assert(Timeseries.buishandDaily(one, "ts", "v").collect().head
      .isNullAt(4))
  }

  test("kpssDaily: hand-exact eta at lag 1 and 0, calendar-gap invariance, constant NULL") {
    def tsAtDay(d: Long) = new java.sql.Timestamp(d * 86400L * 1000L)
    // y = (1,2,3,4): T = 4, Y = 10 → ts = (−6,−8,−6,0), Σts² = 136;
    // es = (−6,−2,2,6): G₀ = 80, G₁ = 20 → S2(ℓ=1) = 2·80 + 2·20 = 200
    // → η = 136·2/(4·200) = 0.34 exactly
    val y = Seq((tsAtDay(0), 1L), (tsAtDay(1), 2L),
      (tsAtDay(2), 3L), (tsAtDay(3), 4L)).toDF("ts", "v")
    val r = Timeseries.kpssDaily(y, "ts", "v", lag = 1).collect().head
    assert(r.getLong(0) === 4L)
    assert((r.getDouble(1), r.getDouble(2)) === ((136.0, 200.0)))
    assert(r.getLong(3) === 340000000000L)
    // lag 0 degenerates to S2 = G₀ → η = 136/(4·80) = 0.425
    val r0 = Timeseries.kpssDaily(y, "ts", "v", lag = 0).collect().head
    assert(r0.getLong(3) === 425000000000L)
    // the law runs over the OBSERVED-bin sequence: calendar gaps do
    // not break the lag join (dense prefix-sum rank, not day deltas)
    val gap = Seq((tsAtDay(0), 1L), (tsAtDay(1), 2L),
      (tsAtDay(5), 3L), (tsAtDay(9), 4L)).toDF("ts", "v")
    val rg = Timeseries.kpssDaily(gap, "ts", "v", lag = 1).collect().head
    assert(rg.getLong(3) === 340000000000L)
    // constant series: every residual 0 → S2 = 0 → NULL
    val flat = Seq((tsAtDay(0), 5L), (tsAtDay(1), 5L)).toDF("ts", "v")
    assert(Timeseries.kpssDaily(flat, "ts", "v").collect().head
      .isNullAt(3))
  }

  test("bartelsRvn: trend reads RVN < 2, alternation > 2, tie midranks exact, degenerate NULLs") {
    def tsAtDay(d: Long) = new java.sql.Timestamp(d * 86400L * 1000L)
    // y = (1,2,3,4): mr2 = (2,4,6,8) → NM = 12, T·SRR − SR² = 80 →
    // RVN = 4·12/80 = 0.6 exactly; z < 0 (positive serial correlation)
    val up = Seq((tsAtDay(0), 1L), (tsAtDay(1), 2L),
      (tsAtDay(2), 3L), (tsAtDay(3), 4L)).toDF("ts", "v")
    val r = Timeseries.bartelsRvn(up, "ts", "v").collect().head
    assert(r.getLong(0) === 4L)
    assert(r.getLong(1) === 600000000000L && r.getLong(2) < 0L)
    // y = (1,9,2,8): mr2 = (2,8,4,6) → NM = 56 → RVN = 2.8; z > 0
    val alt = Seq((tsAtDay(0), 1L), (tsAtDay(1), 9L),
      (tsAtDay(2), 2L), (tsAtDay(3), 8L)).toDF("ts", "v")
    val r2 = Timeseries.bartelsRvn(alt, "ts", "v").collect().head
    assert(r2.getLong(1) === 2800000000000L && r2.getLong(2) > 0L)
    // tie run y = (5,5,9): midranks (3,3,6) → NM = 9, DN = 18 →
    // RVN = 3·9/18 = 1.5 exactly
    val tie = Seq((tsAtDay(0), 5L), (tsAtDay(1), 5L),
      (tsAtDay(2), 9L)).toDF("ts", "v")
    val r3 = Timeseries.bartelsRvn(tie, "ts", "v").collect().head
    assert(r3.getLong(1) === 1500000000000L)
    // constant (DN = 0) and T < 3 → NULL
    val flat = Seq((tsAtDay(0), 5L), (tsAtDay(1), 5L),
      (tsAtDay(2), 5L)).toDF("ts", "v")
    assert(Timeseries.bartelsRvn(flat, "ts", "v").collect().head
      .isNullAt(1))
    val two = Seq((tsAtDay(0), 1L), (tsAtDay(1), 2L)).toDF("ts", "v")
    assert(Timeseries.bartelsRvn(two, "ts", "v").collect().head
      .isNullAt(1))
  }

  test("durbinWatsonDaily: hand-exact DW, alternation near 4, constant NULL") {
    def tsAtDay(d: Long) = new java.sql.Timestamp(d * 86400L * 1000L)
    // y = (1,2,3,4): es = (−6,−2,2,6) → NM = 48, G0 = 80 → DW = 0.6
    val up = Seq((tsAtDay(0), 1L), (tsAtDay(1), 2L),
      (tsAtDay(2), 3L), (tsAtDay(3), 4L)).toDF("ts", "v")
    val r = Timeseries.durbinWatsonDaily(up, "ts", "v").collect().head
    assert(r.getLong(0) === 4L && r.getLong(1) === 600000000000L)
    // y = (1,9,1,9): es = (−16,16,−16,16) → DW = 3072/1024 = 3 exactly
    val alt = Seq((tsAtDay(0), 1L), (tsAtDay(1), 9L),
      (tsAtDay(2), 1L), (tsAtDay(3), 9L)).toDF("ts", "v")
    val r2 = Timeseries.durbinWatsonDaily(alt, "ts", "v").collect().head
    assert(r2.getLong(1) === 3000000000000L)
    // constant series and single bin → NULL
    val flat = Seq((tsAtDay(0), 5L), (tsAtDay(1), 5L)).toDF("ts", "v")
    assert(Timeseries.durbinWatsonDaily(flat, "ts", "v").collect().head
      .isNullAt(1))
  }

  test("seasonalMannKendall: within-month pairs only, seasonality cannot masquerade as trend, tie NULL") {
    def tsAt(d: Long, h: Long) =
      new java.sql.Timestamp(d * 86400L * 1000L + h * 3600L * 1000L)
    def events(spec: Seq[(Long, Int)]) =
      spec.flatMap { case (d, n) => (0 until n).map(h => Tuple1(tsAt(d, h))) }
        .toDF("ts")
    // Jan counts rise (10 → 11), Feb counts rise (1 → 2), but Feb is
    // FAR below Jan: within-month S = +2 (trend UP), while the plain
    // unconditioned form reads S = −2 (seasonal masking)
    val d = events(Seq((0L, 10), (1L, 11), (31L, 1), (32L, 2)))
    val r = Timeseries.seasonalMannKendall(d, "ts").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((4L, 2L)))
    assert(r.getLong(2) === 2L)
    val plain = Timeseries.mannKendallDaily(d, "ts").collect().head
    assert(plain.getLong(1) === -2L)
    // two-month rise with unit counts: S = 2, Var = 36/18 = 2 →
    // z = (2−1)/√2
    val u = events(Seq((0L, 1), (1L, 2), (31L, 1), (32L, 2)))
    val r2 = Timeseries.seasonalMannKendall(u, "ts").collect().head
    assert(r2.getLong(2) === 2L && r2.getLong(3) === 36L)
    assert(r2.getLong(4) === 707106781187L)
    // all days tied within the month → var18 = 0 → NULL z
    val tie = events(Seq((0L, 1), (1L, 1)))
    assert(Timeseries.seasonalMannKendall(tie, "ts").collect().head
      .isNullAt(4))
  }

  test("coxStuartDaily: half-offset sign pairs exact, odd middle dropped, tie NULL") {
    def tsAtDay(d: Long) = new java.sql.Timestamp(d * 86400L * 1000L)
    // (1,2,3,4): c = 2 → pairs (1,3)+ (2,4)+ → S⁺ = 2, n′ = 2,
    // z = 2/√2 = √2
    val up = Seq((tsAtDay(0), 1L), (tsAtDay(1), 2L),
      (tsAtDay(2), 3L), (tsAtDay(3), 4L)).toDF("ts", "v")
    val r = Timeseries.coxStuartDaily(up, "ts", "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 2L, 2L)))
    assert(r.getLong(3) === 1414213562373L)
    // descending halves → mirrored sign
    val dn = Seq((tsAtDay(0), 9L), (tsAtDay(1), 5L),
      (tsAtDay(2), 3L), (tsAtDay(3), 1L)).toDF("ts", "v")
    val r2 = Timeseries.coxStuartDaily(dn, "ts", "v").collect().head
    assert(r2.getLong(2) === 0L && r2.getLong(3) === -1414213562373L)
    // odd length drops the middle: (1, 9, 2) → the single pair (1,2)
    val odd = Seq((tsAtDay(0), 1L), (tsAtDay(1), 9L),
      (tsAtDay(2), 2L)).toDF("ts", "v")
    val r3 = Timeseries.coxStuartDaily(odd, "ts", "v").collect().head
    assert((r3.getLong(1), r3.getLong(2)) === ((1L, 1L)))
    assert(r3.getLong(3) === 1000000000000L)
    // all pairs tied → n′ = 0 → NULL; single bin → 0 pairs
    val tie = Seq((tsAtDay(0), 5L), (tsAtDay(1), 5L)).toDF("ts", "v")
    assert(Timeseries.coxStuartDaily(tie, "ts", "v").collect().head
      .isNullAt(3))
    val one = Seq((tsAtDay(0), 5L)).toDF("ts", "v")
    val r5 = Timeseries.coxStuartDaily(one, "ts", "v").collect().head
    assert(r5.getLong(0) === 1L && r5.getLong(1) === 0L && r5.isNullAt(3))
  }
}
