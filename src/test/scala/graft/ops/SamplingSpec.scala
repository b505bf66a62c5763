package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("deterministic sample: rate approximately honored, exactly reproducible") {
    val n = docs.count()
    val s1 = Sampling.deterministicSample(docs, "doc_id", 0.3)
    val rate = s1.count().toDouble / n
    assert(rate > 0.15 && rate < 0.45, s"rate $rate far from 0.3")
    // same ids regardless of partitioning — a pure function of the row
    val s2 = Sampling.deterministicSample(docs.repartition(17), "doc_id", 0.3)
    assert(s1.select("doc_id").collect().map(_.getLong(0)).toSet ===
      s2.select("doc_id").collect().map(_.getLong(0)).toSet)
    // a sample at a higher rate is a SUPERSET (thresholds nest)
    val s3 = Sampling.deterministicSample(docs, "doc_id", 0.6)
    assert(s1.select("doc_id").collect().map(_.getLong(0)).toSet.subsetOf(
      s3.select("doc_id").collect().map(_.getLong(0)).toSet))
  }

  test("different salts draw (near-)independent subsets") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.5, salt = "a")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(docs, "doc_id", 0.5, salt = "b")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a !== b)
    val overlap = a.intersect(b).size.toDouble / math.max(1, a.size)
    assert(overlap > 0.25 && overlap < 0.75) // ≈ rate, not ≈ 1
  }

  test("stratified: per-stratum rates; unlisted strata dropped") {
    val out = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 0.0))
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enTotal = docs.filter($"lang" === "en").count()
    assert(byLang.getOrElse("en", 0L) === enTotal) // rate 1.0 keeps all
    assert(!byLang.contains("de")) // rate 0.0
    assert(byLang.keySet === Set("en")) // fr/zh/es unlisted → dropped
  }

  test("temperature sample: head stratum keeps ~base, tail keeps more; reproducible") {
    // skewed mixture: 200 of 'big', 50 of 'mid', 8 of 'tiny'
    val skewed = spark.range(258).select(
      col("id"),
      when(col("id") < 200, "big").when(col("id") < 250, "mid")
        .otherwise("tiny").as("dom"))
    val out = Sampling.temperatureSample(skewed, "id", "dom", base = 0.5)
    val byDom = out.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // largest stratum: rate = base = 0.5 exactly (threshold 8000)
    val bigRate = byDom.getOrElse("big", 0L).toDouble / 200
    assert(bigRate > 0.35 && bigRate < 0.65, s"big rate $bigRate far from 0.5")
    // mid: 0.5*sqrt(200/50) = 1.0 → everything survives, exactly
    assert(byDom.getOrElse("mid", 0L) === 50L)
    // tiny: 0.5*sqrt(200/8) = 2.5 → capped at 1, everything survives
    assert(byDom.getOrElse("tiny", 0L) === 8L)
    // pure function of the row: partitioning-independent subset
    val again = Sampling.temperatureSample(skewed.repartition(13), "id", "dom")
    assert(out.select("id").collect().map(_.getLong(0)).toSet ===
      again.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("temperature sample flattens a skewed mixture toward uniform") {
    val out = Sampling.temperatureSample(docs, "doc_id", "lang")
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def spread(m: Map[String, Long]) =
      m.values.max.toDouble / math.max(1L, m.values.min)
    assert(after.keySet === before.keySet) // no stratum disappears
    assert(spread(after) < spread(before), // head:tail ratio strictly shrinks
      s"spread ${spread(after)} not below ${spread(before)}")
  }

  test("fixedKPerStratum: exactly k per stratum, reproducible, hash-ordered") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, if (i % 4 == 0) "fr" else "en"))
      .toDF("id", "lang")
    val out = Sampling.fixedKPerStratum(df, "id", "lang", k = 10)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang === Map("en" -> 10L, "fr" -> 10L))
    // ranks are 1..k within each stratum
    assert(out.filter($"sample_rank" < 1 || $"sample_rank" > 10).isEmpty)
    // pure hash order: partitioning-independent membership AND ranks
    val again = Sampling.fixedKPerStratum(df.repartition(13), "id", "lang", k = 10)
    def keyed(d: org.apache.spark.sql.DataFrame) =
      d.select("id", "sample_rank").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keyed(out) === keyed(again))
    // a different salt draws a different committee
    val salted = Sampling.fixedKPerStratum(df, "id", "lang", k = 10, salt = "other")
    assert(keyed(out).keySet !== keyed(salted).keySet)
  }

  test("fixedKPerStratum: stratum smaller than k keeps all its rows") {
    import spark.implicits._
    val df = ((0L until 3L).map(i => (i, "rare")) ++
      (10L until 60L).map(i => (i, "big"))).toDF("id", "lang")
    val out = Sampling.fixedKPerStratum(df, "id", "lang", k = 5)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang === Map("rare" -> 3L, "big" -> 5L))
  }

  /** Scala replay of the Efraimidis–Spirakis key law — same md5 integer,
    * same uniform, same ln chain as the operator.
    */
  private def esKey(id: Long, w: Long, salt: String = "graft"): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = graft.functions.TextFns.hexBytes(
      md.digest((salt + id.toString).getBytes("UTF-8")))
    val h = Integer.parseInt(hex.substring(0, 4), 16).toDouble
    math.log((h + 0.5) / 65536.0) / w.toDouble
  }

  test("weightedSample reproduces the exact E-S draw of a Scala replay") {
    import spark.implicits._
    val rows = (1L to 200L).map(i => (i, 1L + (i % 7) * 100L))
    val got = Sampling.weightedSample(rows.toDF("id", "w"), "id", "w", k = 25)
      .select("id").collect().map(_.getLong(0)).toSet
    val want = rows.sortBy { case (id, w) => (-esKey(id, w), id) }
      .take(25).map(_._1).toSet
    assert(got === want)
  }

  test("weightedSample prefers heavy rows and stays deterministic") {
    import spark.implicits._
    val df = ((1L to 200L).map(i => (i, 1L)) ++
      (201L to 220L).map(i => (i, 100000L))).toDF("id", "w")
    val a = Sampling.weightedSample(df, "id", "w", k = 20)
      .select("id").collect().map(_.getLong(0)).toSet
    val heavy = a.count(_ > 200L)
    assert(heavy >= 15, s"only $heavy of 20 picks were 100000x-weighted rows")
    val b = Sampling.weightedSample(df, "id", "w", k = 20)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("weightedSample excludes non-positive and NULL weights; k beyond n keeps all") {
    import spark.implicits._
    val df = Seq((1L, Some(5L)), (2L, Some(0L)), (3L, Some(-2L)), (4L, None),
      (5L, Some(1L))).toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", k = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 5L))
  }

  test("poissonBootstrapCi: exact point mean, run-to-run determinism, ordered CI, empty input") {
    import spark.implicits._
    // 100 rows of value = id (1..100): point mean = 50.5 exactly
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "x")
    val r1 = Sampling.poissonBootstrapCi(df, "id", "x", replicas = 32)
      .collect().head
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) ===
      ((100L, 32L, 50500000L)))
    assert(r1.getLong(3) <= r1.getLong(4), "lo <= hi")
    assert(r1.getLong(3) < 50500000L && r1.getLong(4) > 50500000L,
      "a symmetric-ish bootstrap brackets the point estimate on this corpus")
    val r2 = Sampling.poissonBootstrapCi(df, "id", "x", replicas = 32)
      .collect().head
    assert(r1 === r2, "the md5 draw law is partition- and run-independent")
    // empty input: no rows, not a NULL-filled row
    assert(Sampling.poissonBootstrapCi(
      Seq.empty[(Long, Long)].toDF("id", "x"), "id", "x").count() === 0L)
    // the quantized threshold table is strictly increasing inside the grid
    val t = Sampling.poissonHThresholds
    assert(t.toSeq === t.toSeq.sorted && t.distinct.length === t.length)
    assert(t.last < 65535L, "weight 5 must remain drawable")
  }
}
