package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MixtureSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("epochCounts: head stratum runs once, tail strata scale up to the cap") {
    val counts = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMax = counts.values.max
    val epochs = Mixture.epochCounts(docs, "lang", maxEpochs = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(epochs.keySet === counts.keySet)
    val head = counts.maxBy(_._2)._1
    assert(epochs(head) === 1L, "largest stratum must run exactly one epoch")
    counts.foreach { case (lang, n) =>
      val want = math.min(4L, math.ceil(nMax.toDouble / n).toLong)
      assert(epochs(lang) === want, s"$lang: n=$n nMax=$nMax")
    }
  }

  test("upsampleEpochs: exact multiset — n_g * epochs_g rows per stratum, epochs 1..k") {
    val up = Mixture.upsampleEpochs(docs, "lang", maxEpochs = 4)
    val epochs = Mixture.epochCounts(docs, "lang", maxEpochs = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = up.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (lang, n) =>
      assert(got(lang) === n * epochs(lang), lang)
    }
    // every doc appears with the full dense epoch range of its stratum
    val bad = up.groupBy("doc_id", "lang")
      .agg(min("epoch").as("lo"), max("epoch").as("hi"), count(lit(1)).as("n"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("n"))
    assert(bad.count() === 0)
  }

  test("writeJsonl: partition layout + round-trip through a JSON reader") {
    val out = Files.createTempDirectory("graft-jsonl").toString
    val withSplit = Splits.withSplit(docs.select("doc_id", "lang", "n_chars"), "doc_id")
    TrainExport.writeJsonl(withSplit, out, partitionBy = Seq("split"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs === Set("split=train", "split=val", "split=test"))
    // payload lines are valid JSON carrying the non-partition columns
    val back = spark.read.json(s"$out/split=train/")
    assert(back.columns.sorted.toSeq === Seq("doc_id", "lang", "n_chars"))
    val wantTrain = withSplit.filter(col("split") === "train")
    assert(back.count() === wantTrain.count())
    assert(back.agg(sum("n_chars")).head.getLong(0) ===
      wantTrain.agg(sum("n_chars")).head.getLong(0))
  }

  test("waterfillAllocations: cap + redistribute, hand-checked") {
    import spark.implicits._
    // A saturates at 100; its shortfall flows to B
    val stats = Seq(("A", 100L, 1L), ("B", 1000L, 1L))
      .toDF("domain", "avail", "w")
    val r = Mixture.waterfillAllocations(stats, "domain", "avail", "w", budget = 600L)
      .collect().map(x => x.getString(0) -> (x.getLong(3), x.getBoolean(4))).toMap
    assert(r("A") === ((100L, true)), "small domain caps at availability")
    assert(r("B") === ((500L, false)), "overflow redistributes to the uncapped domain")

    // nothing saturates → pure weight-proportional split
    val loose = Seq(("A", 1000000L, 1L), ("B", 1000000L, 3L))
      .toDF("domain", "avail", "w")
    val r2 = Mixture.waterfillAllocations(loose, "domain", "avail", "w", budget = 400L)
      .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(r2 === Map("A" -> 100L, "B" -> 300L))

    // budget beyond the corpus → everything saturates at availability
    val r3 = Mixture.waterfillAllocations(stats, "domain", "avail", "w", budget = 99999L)
      .collect().map(x => x.getString(0) -> (x.getLong(3), x.getBoolean(4))).toMap
    assert(r3 === Map("A" -> ((100L, true)), "B" -> ((1000L, true))))

    // zero-weight domain: excluded from the waterline, allocates 0, and
    // cannot divide-by-zero the solve (the natural "present but off" row)
    val withOff = Seq(("A", 100L, 1L), ("B", 50L, 0L)).toDF("domain", "avail", "w")
    val r4 = Mixture.waterfillAllocations(withOff, "domain", "avail", "w", budget = 600L)
      .collect().map(x => x.getString(0) -> (x.getLong(3), x.getBoolean(4))).toMap
    assert(r4("B") === ((0L, false)), "zero-weight domain allocates nothing")
    assert(r4("A") === ((100L, true)), "positive-weight solve unaffected")

    // 100 TB regime: products pass 2^63 — decimal128 carries them
    val huge = Seq(("A", 20000000000000L, 900000L), ("B", 90000000000000L, 100000L))
      .toDF("domain", "avail", "w")
    val r5 = Mixture.waterfillAllocations(huge, "domain", "avail", "w",
        budget = 25000000000000L)
      .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    // nothing saturates: 25e12·0.9 = 22.5e12 ≤ 20e12? No — A caps at 20e12?
    // A's share 22.5e12 > avail 20e12 → A saturates; B gets the rest
    assert(r5("A") === 20000000000000L)
    assert(r5("B") === 5000000000000L)
    assert(r5.values.sum === 25000000000000L)
  }

  test("waterfillAllocations: domain bound is ENFORCED in-plan (Guards.boundedDomain)") {
    import spark.implicits._
    // 50 domains vs a bound of 40: the guard must fail the job with the
    // aggregate-upstream message BEFORE the waterline's single-task sort
    val many = (0 until 50).map(i => (f"d$i%02d", 100L + i, 1L))
      .toDF("domain", "avail", "w")
    val e = intercept[Exception] {
      Mixture.waterfillAllocations(many, "domain", "avail", "w",
        budget = 1000L, maxDomains = 40L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("catch-all")),
      s"expected the aggregate-upstream guard message, got: ${messages(e)}")
    // the same frame passes under the default bound, law intact
    val ok = Mixture.waterfillAllocations(many, "domain", "avail", "w",
      budget = 1000L)
    assert(ok.count() === 50L)
    assert(ok.agg(sum("alloc_tokens")).head.getLong(0) <= 1000L)
  }

  test("waterfillAllocations: invariants hold on random stats") {
    import spark.implicits._
    val rnd = new scala.util.Random(41L)
    for (trial <- 1 to 5) {
      val stats = (1 to 12).map(i =>
        (f"d$i%02d", 1L + rnd.nextInt(100000).toLong, 1L + rnd.nextInt(900000).toLong))
        .toDF("domain", "avail", "w")
      val totalAvail = 1L * stats.as[(String, Long, Long)].collect().map(_._2).sum
      val budget = (totalAvail * (trial * 17 % 100 + 1)) / 100
      val rows = Mixture.waterfillAllocations(stats, "domain", "avail", "w", budget)
        .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
          x.getLong(3), x.getBoolean(4)))
      val total = rows.map(_._4).sum
      assert(total <= budget, s"trial $trial: Σalloc $total > budget $budget")
      rows.foreach { case (d, avail, _, alloc, sat) =>
        assert(alloc >= 0 && alloc <= avail, s"trial $trial $d: alloc $alloc vs avail $avail")
        assert(!sat || alloc == avail, s"trial $trial $d: saturated but alloc < avail")
      }
      // the floors leave less than one token per domain on the table
      assert(budget - total <= rows.length || total == totalAvail,
        s"trial $trial: shortfall ${budget - total} too large")
    }
  }

  test("writeJsonl: gzip codec round-trips (the trainer-handoff compression path)") {
    val out = Files.createTempDirectory("graft-jsonl-gz").toString
    val withSplit = Splits.withSplit(docs.select("doc_id", "n_chars"), "doc_id")
    TrainExport.writeJsonl(withSplit, out, partitionBy = Seq("split"),
      codec = Some("gzip"))
    val files = new java.io.File(s"$out/split=train").listFiles()
      .filter(_.getName.endsWith(".gz"))
    assert(files.nonEmpty, "gzip codec should produce .gz part files")
    val back = spark.read.json(s"$out/split=train/") // text source decompresses by extension
    assert(back.count() === withSplit.filter(col("split") === "train").count())
  }

  test("temperatureWeights: alpha=1 proportional, alpha flattens, zero-token and NULL strata") {
    import spark.implicits._
    val rows = (1 to 90).map(i => ("big", "one two three four")) ++
      (1 to 10).map(i => ("small", "one two three four")) ++
      Seq(("empty", "   "), (null.asInstanceOf[String], "never counted"))
    val df = rows.toDF("src", "text")
    def weights(alpha: Double) = Mixture
      .temperatureWeights(df, "src", "text", alpha)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // alpha = 1: p proportional to token mass (360 vs 40 tokens -> 0.9/0.1)
    val p1 = weights(1.0)
    assert(p1("big")._1 === 360L && p1("small")._1 === 40L)
    assert(math.abs(p1("big")._3 - 900000000L) < 5L &&
      math.abs(p1("small")._3 - 100000000L) < 5L, s"alpha=1: $p1")
    // smaller alpha flattens the head: small stratum's share strictly grows
    val p07 = weights(0.7)
    val p03 = weights(0.3)
    assert(p07("small")._3 > p1("small")._3 && p03("small")._3 > p07("small")._3,
      s"flattening must be monotone in alpha: ${p1("small")._3} ${p07("small")._3} ${p03("small")._3}")
    // zero-token stratum carries zero weight; NULL stratum is excluded
    assert(p1("empty")._2 === 0L && p1("empty")._3 === 0L)
    assert(!p1.contains(null))
    // probabilities sum to ~1e9 (quantization residue only)
    Seq(p1, p07, p03).foreach { m =>
      val tot = m.values.map(_._3).sum
      assert(math.abs(tot - 1000000000L) < 10L, s"sum $tot")
    }
  }


  test("classBalance: EN saturates with class size, inverse-EN weights favor rare classes and sum to 1, NULL labels drop") {
    import spark.implicits._
    // classes: a x1, b x10, c x100 (+ null labels that must not count)
    val rows = (Seq.fill(1)("a") ++ Seq.fill(10)("b") ++ Seq.fill(100)("c"))
      .map(Option(_)) ++ Seq.fill(5)(Option.empty[String])
    val df = rows.toDF("label")
    val got = Mixture.classBalance(df, "label", beta = 0.9)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === Set("a", "b", "c"), "NULL labels dropped")
    val (na, ena, wa) = got("a"); val (nb, enb, wb) = got("b")
    val (nc, enc, wc) = got("c")
    assert((na, nb, nc) === ((1L, 10L, 100L)))
    // hand values at beta=0.9 (1-ulp tolerance on the exp chain):
    // EN(1)=1, EN(10)=(1-0.9^10)/0.1 = 6.5132..., EN(100) = 9.99973...
    assert(math.abs(ena - 1000000L) <= 1)
    assert(math.abs(enb - 6513216L) <= 1)
    assert(math.abs(enc - 9999734L) <= 1)
    // monotone saturation and rare-class-favoring weights
    assert(ena < enb && enb < enc)
    assert(wa > wb && wb > wc)
    // weights sum to 1e12 within per-label rounding
    assert(math.abs((wa + wb + wc) - 1000000000000L) <= 3)
  }
}
