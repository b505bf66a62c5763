package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFns

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // planted corpus: (1,2) exact dups; (3,4) near-dups (one word changed);
  // 5 is a permutation of 3 (same bag of words, different order); 6 unrelated
  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"),
    (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"),
    (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu omega"),
    (5L, "xi nu mu lambda kappa iota theta eta zeta epsilon delta gamma beta alpha"),
    (6L, "completely different content about spark catalyst optimizer internals here")
  ).toDF("doc_id", "text")

  test("exact: collapses identical content, keeps min id") {
    val r = Dedup.exact(docs, "doc_id", "text")
    assert(r.count() === 5) // 6 docs, one exact-dup pair
    val dup = r.filter($"dup_count" === 2).head
    assert(dup.getAs[Long]("survivor_id") === 1L)
  }

  test("ngram jaccard: finds exact + near pairs, not permutation/unrelated") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // identical → jaccard 1.0
    assert(pairs.contains((3L, 4L))) // 1-word tail change → high 3-gram overlap
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L)) // permutation: no shared 3-grams
  }

  test("ngram containment: a wholly-embedded quote scores 1.0 where Jaccard misses it") {
    // doc 2 embeds doc 1's full text inside unrelated framing: every one
    // of doc 1's 3-grams recurs in doc 2, so overlap = shared/min = 1.0,
    // while jaccard = 4/17 ≈ 0.24 stays far under any dedup threshold
    val quote = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "intro words here then alpha beta gamma delta epsilon zeta and a " +
        "long unrelated tail of many extra tokens follows afterwards"),
      (3L, "completely different content with no shared trigrams at all")
    ).toDF("doc_id", "text")
    val got = Dedup.ngramContainmentPairs(quote, "doc_id", "text",
      shingleSize = 3, threshold = 0.9).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 2L)))
    assert((r.getLong(2), r.getLong(3)) === ((4L, 4L)), "shared = na = 4")
    assert(r.getDouble(5) === 1.0)
    // the same pair under the Jaccard law: below threshold (the miss)
    assert(Dedup.ngramJaccardPairs(quote, "doc_id", "text", 3, 0.5)
      .count() === 0L)
  }

  test("ngramDupMass: hand-computed boilerplate mass; intra-doc repeats don't count; empty corpus = no rows") {
    // doc 1 and 2 share exactly "a b c d e"; doc 3's 5-gram repeats
    // WITHIN the doc only (distinct-per-doc law: df = 1, not duplicated)
    val corpus = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e x"),
      (3L, "z z z z z z z z z z")
    ).toDF("doc_id", "text")
    val r = Dedup.ngramDupMass(corpus, "doc_id", "text", shingleSize = 5)
      .collect().head
    // df: {a b c d e: 2, b c d e f: 1, b c d e x: 1, z...z: 1}
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((4L, 5L, 2L, 400000000000L)))
    val empty = Seq((1L, "too short")).toDF("doc_id", "text")
    assert(Dedup.ngramDupMass(empty, "doc_id", "text", 5).count() === 0L)
  }

  test("minhash LSH: same verified pairs as exact ngram pass") {
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text",
      numHashes = 64, bands = 16, shingleSize = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh === exact)
  }

  test("minhash LSH: empty-shingle docs never pair, never crash (NULL/short text)") {
    // empty shingle sets all share the degenerate all-MaxValue signature —
    // they collide in EVERY band, and before the degenerate-pair exclusion
    // the Jaccard verify divided 0/0 (ANSI throw; NaN-match without ANSI)
    val docs = Seq(
      (1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]),
      (3L, "yes"), (4L, "no"), // shorter than the shingle size: empty sets
      (5L, "a real document with enough words to carry shingles here"),
      (6L, "a real document with enough words to carry shingles too"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!pairs.exists(p => p._1 <= 4L || p._2 <= 4L),
      "no-content docs must pair with nothing — not each other, not real docs")
    assert(pairs === Set((5L, 6L)), "real near-dups still verify")
    // cross-corpus arm: stored empty signatures meet incoming empty docs
    val survivors = Dedup.minhashAgainst(
        docs.filter($"doc_id" >= 3), docs.filter($"doc_id" <= 2),
        "doc_id", "text", threshold = 0.1)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors === Set(3L, 4L, 5L, 6L),
      "incoming docs must all survive an empty-signature reference")
  }

  test("minhash signature: identical docs agree, near docs mostly agree") {
    val sigs = docs.select($"doc_id", Dedup.minhashSignature($"text", 64, 3).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L))
    val agree34 = sigs(3L).zip(sigs(4L)).count { case (a, b) => a == b }
    assert(agree34 > 40, s"near-dup signature agreement $agree34/64") // E[agree] = j*64 ≈ 0.71*64
    val agree16 = sigs(1L).zip(sigs(6L)).count { case (a, b) => a == b }
    assert(agree16 < 10, s"unrelated signature agreement $agree16/64")
  }

  test("simhash: identical → distance 0; near → small; permutation → 0 (bag of words)") {
    val sh = docs.select($"doc_id", Dedup.simhash64($"text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) === 0)
    assert(ham(sh(3L), sh(4L)) <= 12, s"near-dup hamming ${ham(sh(3L), sh(4L))}")
    assert(ham(sh(3L), sh(5L)) === 0) // simhash is order-insensitive
    assert(ham(sh(1L), sh(6L)) > 12)
  }

  test("simhash64: Column expression and Scala twin agree bit-for-bit (md5 law)") {
    import spark.implicits._
    val texts = Seq("hello world", "the quick brown fox jumps", "", "   ",
      "a b a b a", "héllo ünïcode tøkens", "one")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = df.select($"doc_id", Dedup.simhash64($"text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === Dedup.simhash64Scala(t),
        s"expression/Scala twin diverge on '$t'")
    }
    // token-free text: all counts 0 ⇒ all bits set, on both paths
    assert(got(2L) === -1L && got(3L) === -1L)
    // cross-engine constant (computed independently with python hashlib
    // and replayed by the DuckDB oracle CTE): pins the md5 byte order,
    // bit orientation and sign-aggregate law against silent drift
    assert(got(0L) === 0x6fd4fe3dfc0e9ebeL, f"'hello world' sig ${got(0L)}%x")
  }

  test("simhash64 xxhash64 profile: twins agree, token hash IS the builtin, laws differ") {
    import spark.implicits._
    val texts = Seq("hello world", "the quick brown fox jumps", "", "   ",
      "a b a b a", "héllo ünïcode tøkens", "one")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // equivalence of shape: expression twin ≡ Scala twin under the
    // production profile, the exact law the md5 twin test pins
    val got = df.select($"doc_id",
        Dedup.simhash64($"text", Dedup.XxProfile).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val th = Dedup.tokenHasher(Dedup.XxProfile)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === Dedup.simhash64Scala(t, th),
        s"xxhash64 expression/Scala twin diverge on '$t'")
    }
    // the Scala token hasher IS Spark's builtin xxhash64 (seed 42) — the
    // property that makes the expression and object-boundary paths one law
    val tokens = Seq("hello", "world", "tøkens", "a")
    val builtin = tokens.toDF("t").select(xxhash64($"t")).as[Long].collect()
    tokens.zip(builtin).foreach { case (t, h) =>
      assert(th(t) === h, s"token hasher != builtin xxhash64 on '$t'")
    }
    // the two profiles are genuinely different hash laws (identical
    // signatures would mean the flag is dead code)...
    val md5Sigs = df.select($"doc_id", Dedup.simhash64($"text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(texts.indices.exists(i => got(i.toLong) != md5Sigs(i.toLong)))
    // ...that agree exactly where the signature law forces agreement:
    // token-free text (all counts 0 ⇒ all bits set) and identical texts
    assert(got(2L) === -1L && got(3L) === -1L)
  }

  test("simhash profile: planted recall 1.0 holds on the production profile too") {
    import spark.implicits._
    val planted = (0 until 20).flatMap { p =>
      val text = s"planted profile pair $p sharing identical content ${p * 13}"
      Seq((100L + p, text), (200L + p, text))
    } ++ (0 until 500).map(i => (1000L + i, s"unique filler $i variety ${i * 37}"))
    val pdf = planted.toDF("doc_id", "text")
    val got = Dedup.simhashPairs(pdf, "doc_id", "text",
        profile = Dedup.XxProfile)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0 until 20).foreach(p => assert(got.contains((100L + p, 200L + p)),
      s"planted pair $p missed under xxhash64 profile"))
  }

  test("simhash store: profile commits to meta; merges and against use the store's law") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("shprofile").toString
    val ref = (0 until 30).map(p =>
      (p.toLong, s"stored profile doc $p content ${p * 7}")).toDF("doc_id", "text")
    RefStore.writeSimhash(ref.filter($"doc_id" < 15), "doc_id", "text", dir,
      profile = Dedup.XxProfile)
    RefStore.mergeSimhash(ref.filter($"doc_id" >= 15), "doc_id", "text", dir)
    assert(RefStore.simhashProfile(spark, dir) === Dedup.XxProfile)
    // every stored signature replays under the committed law (merge did
    // NOT silently hash with md5)
    val th = Dedup.tokenHasher(Dedup.XxProfile)
    val stored = RefStore.loadSimhash(spark, dir)
      .as[(Long, Long)].collect().toMap
    ref.as[(Long, String)].collect().foreach { case (id, t) =>
      assert(stored(id) === Dedup.simhash64Scala(t, th))
    }
    // against-stored screens an identical incoming twin (Hamming 0)
    // under the store's law with no profile argument from the caller
    val incoming = Seq((500L, "stored profile doc 3 content 21"),
      (501L, "genuinely new text never stored")).toDF("doc_id", "text")
    val survivors = Dedup.simhashAgainstStored(incoming, dir, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(survivors === Set(501L))
  }

  test("simhash pairs: surfaces near + permuted pairs") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 12)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((3L, 5L))) // permutation — caught by simhash, missed by ngrams
  }

  test("rolling hash: order-sensitive; md5 fingerprint: whitespace-normalized") {
    val r = docs.select($"doc_id",
      TextFns.rollingHash($"text").as("rh"), TextFns.fingerprintMd5($"text").as("fp"))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getString(2))).toMap
    assert(r(1L) === r(2L))
    assert(r(3L)._1 !== r(5L)._1) // permutation changes rolling hash
    val ws = Seq((9L, "  the   quick\tbrown ")).toDF("doc_id", "text")
      .select(TextFns.fingerprintMd5($"text")).head.getString(0)
    val plain = Seq((9L, "the quick brown")).toDF("doc_id", "text")
      .select(TextFns.fingerprintMd5($"text")).head.getString(0)
    assert(ws === plain)
  }

  test("chunk dedup: shared chunks dropped, unique kept in order, dup docs collapse") {
    // size=4 chunks: "AAAA" is the boilerplate shared by docs 1 and 2;
    // doc 3 = doc 4 exactly (every chunk shared); doc 5 is all-unique
    val corpus = Seq(
      (1L, "AAAAbbbb"), // chunks AAAA|bbbb — AAAA shared with doc 2
      (2L, "AAAAcccc"),
      (3L, "ddddeeee"), // exact dup of 4 → both collapse to ""
      (4L, "ddddeeee"),
      (5L, "ffffgggg")
    ).toDF("doc_id", "text")
    val r = Dedup.chunkDedupDocs(corpus, "doc_id", "text", size = 4)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4))).toMap
    assert(r(1L)._1 === 2 && r(1L)._2 === 1) // one of two chunks survives
    assert(r(1L)._3 === 4) // clean text is just "bbbb"
    assert(r(3L)._2 === 0 && r(3L)._3 === 0) // exact dup: nothing survives
    assert(r(3L)._4 === r(4L)._4) // both collapse to the same (empty) witness
    assert(r(5L) === (2L, 2L, 8L,
      Seq(("x", "ffffgggg")).toDF("k", "t").select(md5($"t")).head.getString(0)))
    // reassembly preserves chunk order: clean hash of doc 1 == md5("bbbb")
    val bbbb = Seq(("x", "bbbb")).toDF("k", "t").select(md5($"t")).head.getString(0)
    assert(r(1L)._4 === bbbb)
  }

  test("chunk dedup: within-doc repeats survive (only cross-doc sharing drops)") {
    val corpus = Seq((1L, "AAAAAAAA"), (2L, "bbbbcccc")).toDF("doc_id", "text")
    val r = Dedup.chunkDedupDocs(corpus, "doc_id", "text", size = 4)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) === (2L, 2L)) // "AAAA" twice in ONE doc: both kept
  }

  test("minhashAgainst: near-copies of the reference drop, fresh and distant docs survive") {
    val boiler = ("the quarterly compliance report must be submitted through the " +
      "standard portal before the posted deadline each cycle ") * 4
    val incoming = Seq(
      (1L, boiler + "with one trailing edit appended here."), // near-dup of ref 100
      (2L, "entirely different content about migratory birds and their seasonal " +
        "routes across continents, long enough to carry many distinct shingles " +
        "of its own for the index."),
      (3L, null.asInstanceOf[String])) // no shingles → no candidates → survives
      .toDF("doc_id", "text")
    val reference = Seq(
      (100L, boiler),
      (101L, "reference corpus filler text that matches nothing incoming at all " +
        "but still contributes buckets to the banded index."))
      .toDF("doc_id", "text")
    // threshold 0.5: the repeated boiler collapses to ~18 distinct cyclic
    // shingles, so the trailing edit dilutes exact Jaccard to ~0.67
    val kept = Dedup.minhashAgainst(incoming, reference, "doc_id", "text",
      threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L))
  }

  test("bucket cap keeps a deterministic sample + observable drop count, not a silent full drop") {
    // 10 identical docs: every (band, bucket) holds all 10, far over a cap
    // of 3 — the old cap dropped the WHOLE bucket (zero pairs, silently)
    val clones = (1L to 10L)
      .map(i => (i, "same text cloned many times over for bucket capping checks"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(clones, "doc_id", "text",
      threshold = 0.9, maxBucket = 3)
    val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.nonEmpty, "capped bucket must still yield sampled candidates")
    // deterministic: the sample is hash-ordered, not partition-order luck
    val again = Dedup.minhashLshPairs(clones, "doc_id", "text",
      threshold = 0.9, maxBucket = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(again === got)
    // the drop is surfaced as an observed metric on the plan
    pairs.collect()
    val m = pairs.queryExecution.observedMetrics
      .collectFirst { case (k, v) if k.startsWith("graft_capped_lsh") => v }
    assert(m.nonEmpty, "graft_capped_lsh metric missing from the plan")
    assert(m.get.getAs[Long]("dropped_rows") > 0L)
    assert(m.get.getAs[Long]("capped_buckets") > 0L)
  }

  test("minhashAgainst: an over-full bucket no longer silently passes a known near-dup") {
    // 10 identical reference docs blow every shared bucket past the cap;
    // under the old drop-the-bucket cap the incoming copy SURVIVED
    val boiler = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " * 5
    val reference = (100L to 109L).map(i => (i, boiler)).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, boiler),
      (2L, "unrelated fresh content about entirely different subject matter " +
        "with plenty of distinct shingles of its own")).toDF("doc_id", "text")
    val kept = Dedup.minhashAgainst(incoming, reference, "doc_id", "text",
      threshold = 0.8, maxBucket = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L), "sampled bucket must still catch the exact copy")
  }

  test("exactAgainst: normalized duplicates of the reference drop; NULL text survives") {
    val incoming = Seq((1L, "Hello   World"), (2L, "fresh content"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val reference = Seq((100L, "hello world"), (101L, "other ref")).toDF("doc_id", "text")
    val kept = Dedup.exactAgainst(incoming, reference, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 1 collapses onto the reference under the whitespace/case law; a NULL
    // fingerprint never equi-matches, so 3 is kept (left_anti semantics)
    assert(kept === Set(2L, 3L))
  }

  test("exactAgainstBloom: exactly equal to exactAgainst, NULL text included") {
    val incoming = Seq((1L, "Hello   World"), (2L, "fresh content"),
      (3L, null.asInstanceOf[String]), (4L, "other  REF"),
      (5L, "brand new material")).toDF("doc_id", "text")
    val reference = Seq((100L, "hello world"), (101L, "other ref"),
      (102L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val exact = Dedup.exactAgainst(incoming, reference, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloomed = Dedup.exactAgainstBloom(incoming, reference, "doc_id", "text",
        expectedItems = 1000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact === Set(2L, 3L, 5L))
    assert(bloomed === exact, "bloom prefilter must not change the law")
  }

  test("exactAgainstBloom: a tiny saturated bloom (all-positives) still verifies exactly") {
    // expectedItems=1 at high fpp saturates the filter: every incoming row
    // takes the might-contain branch, so the exact verify join alone must
    // reproduce the law (false positives eliminated, nothing dropped)
    val incoming = Seq((1L, "dup one"), (2L, "new two"), (3L, "new three"))
      .toDF("doc_id", "text")
    val reference = (100L to 160L).map(i => (i, s"ref doc number $i"))
      .toDF("doc_id", "text").union(Seq((99L, "dup one")).toDF("doc_id", "text"))
    val kept = Dedup.exactAgainstBloom(incoming, reference, "doc_id", "text",
        expectedItems = 1L, fpp = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L))
  }

  test("duplicated spans negative control: a collision-free corpus is untouched") {
    // random hex content (huge alphabet — no 40-char run can recur by
    // chance): every doc must come back island-free and byte-identical
    val rnd = new scala.util.Random(19L)
    val docs = (0L until 40L).map { id =>
      (id, Seq.fill(300)(Integer.toHexString(rnd.nextInt())).mkString(" "))
    }.toDF("doc_id", "text")
    val out = Dedup.stripDuplicatedSpans(docs, "doc_id", "text")
    assert(out.filter(col("n_islands") > 0).isEmpty, "false-positive islands")
    val lens = out.select("doc_id", "clean_len").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).length.toLong).toMap
    assert(lens === want)
  }

  test("duplicated spans: alignment-free detection, unique docs untouched") {
    // the same ~300-char boilerplate run planted at DIFFERENT offsets in two
    // otherwise-unrelated documents — content anchors must still line up
    // (a fixed-stride scheme would need both copies in the same phase)
    val boiler = ("all your base stations belong to the colocated region " +
      "please subscribe to the daily newsletter for exclusive updates ") * 3
    val docA = "first document opens with its own words and numbers 12345. " +
      boiler + "then it trails off into unrelated content about gardens."
    val docB = "B-doc preamble of a deliberately different length!! " +
      boiler + "closing remarks differ completely here, mentioning ships."
    val docC = "entirely unique third document long enough to have many " +
      "anchors of its own but sharing no forty-char run with anything else."
    val corpus = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")

    val islands = Dedup.duplicatedSpanIslands(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = islands.groupBy(_._1)
    assert(byDoc.contains(1L) && byDoc.contains(2L), s"both copies flagged: $islands")
    assert(!byDoc.contains(3L), "unique doc must have no islands")
    // the island sits inside the boiler region (± span-length edge slack)
    // and covers most of the run's interior
    for ((id, off) <- Seq((1L, docA.indexOf(boiler)), (2L, docB.indexOf(boiler)))) {
      val covered = byDoc(id).map(i => i._3 - i._2).sum
      assert(covered >= boiler.length / 2, s"doc $id covered only $covered")
      assert(byDoc(id).forall(i => i._2 >= off - 40 && i._3 <= off + boiler.length + 40),
        s"island outside boiler region: ${byDoc(id).toList} vs offset $off")
    }

    // reassembly law: strip == independent driver-side excision of the islands
    val got = Dedup.stripDuplicatedSpans(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getString(4))).toMap
    val texts = Map(1L -> docA, 2L -> docB, 3L -> docC)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for ((id, text) <- texts) {
      val isl = byDoc.getOrElse(id, Array.empty[(Long, Long, Long)])
        .map(i => (i._2.toInt, i._3.toInt)).sortBy(_._1)
      val clean = isl.foldLeft((0, new StringBuilder)) { case ((pos, sb), (s, e)) =>
        (e, sb.append(text.substring(pos, s)))
      } match { case (pos, sb) => sb.append(text.substring(pos)).toString }
      assert(got(id)._1 === isl.length.toLong, s"doc $id n_islands")
      assert(got(id)._2 === clean.length.toLong, s"doc $id clean_len")
      assert(got(id)._3 === md5hex(clean), s"doc $id clean_hash")
    }
  }

  test("duplicated spans: non-BMP docs cut correctly (UTF-16 law end-to-end)") {
    // the shared run sits AFTER astral chars in doc 1, so every island
    // offset there is shifted in UTF-16 relative to codepoints — a
    // codepoint-counting excision (SQL substr) would cut the wrong text
    val boiler = ("emoji-proof boilerplate that recurs verbatim across both " +
      "documents and is longer than one span window by a margin ") * 3
    val docA = "🙂🚀 intro with astral chars 😀😁😂🤣 ahead of it: " + boiler +
      " tail A mentions gardens 🌍."
    val docB = "plain ascii preamble of the second document " + boiler +
      " tail B differs completely."
    val corpus = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val texts = Map(1L -> docA, 2L -> docB)

    val byDoc = Dedup.duplicatedSpanIslands(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(byDoc.contains(1L) && byDoc.contains(2L), s"both copies flagged: $byDoc")
    // structural law: no island boundary splits a surrogate pair
    for ((id, text) <- texts; (_, s0, e0) <- byDoc(id)) {
      val (s, e) = (s0.toInt, e0.toInt)
      assert(!(s > 0 && Character.isLowSurrogate(text.charAt(s)) &&
        Character.isHighSurrogate(text.charAt(s - 1))), s"island start $s mid-pair")
      assert(e >= text.length || !(Character.isLowSurrogate(text.charAt(e)) &&
        Character.isHighSurrogate(text.charAt(e - 1))), s"island end $e mid-pair")
    }

    // reassembly law under UTF-16 indexing: strip == Java-substring excision,
    // clean_len counts CODEPOINTS, and the planted payload is actually gone
    val got = Dedup.stripDuplicatedSpans(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getString(4))).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for ((id, text) <- texts) {
      val isl = byDoc(id).map(i => (i._2.toInt, i._3.toInt)).sortBy(_._1)
      val clean = isl.foldLeft((0, new StringBuilder)) { case ((pos, sb), (s, e)) =>
        (e, sb.append(text.substring(pos, s)))
      } match { case (pos, sb) => sb.append(text.substring(pos)).toString }
      assert(got(id)._1 === isl.length.toLong, s"doc $id n_islands")
      assert(got(id)._2 === clean.codePointCount(0, clean.length).toLong,
        s"doc $id clean_len")
      assert(got(id)._3 === md5hex(clean), s"doc $id clean_hash")
      assert(!clean.contains(boiler.substring(20, boiler.length - 20)),
        s"doc $id still contains the duplicated payload")
    }
  }

  test("cdcChunkOverlap: an embedded reference passage is caught wherever it lands; clean docs pass") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def words(n: Int, tag: String) = (1 to n).map(_ => tag + rnd.nextInt(100000)).mkString(" ")
    val passage = words(200, "p")
    val reference = Seq((100L, words(30, "r") + " " + passage + " " + words(30, "s")))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (1L, words(50, "a") + " " + passage + " " + words(5, "b")), // embeds the passage, shifted
      (2L, words(120, "z"))                                       // unrelated
    ).toDF("doc_id", "text")
    val got = Dedup.cdcChunkOverlap(incoming, reference, "doc_id", "text", minTokens = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.contains(1L), "the embedded passage must share interior CDC chunks")
    val (n, shared, frac) = got(1L)
    assert(shared >= 1L && shared <= n && frac > 0.0 && frac <= 1.0)
    assert(!got.contains(2L), "an unrelated doc must not appear")
  }

  test("shingle novelty law: boilerplate reads 0, unique text 1, half-copies in between") {
    val tmp = java.nio.file.Files.createTempDirectory("novelty").toString
    val boiler = "copy paste copy paste copy paste copy"
    Seq(
      (1L, boiler), (2L, boiler), (3L, boiler),            // shared everything → 0.0
      (4L, "a genuinely unique sentence about nothing"),   // all-unique → 1.0
      (5L, boiler + " plus a fresh unique tail here"),     // mixed → strictly between
      (6L, "one two"),                                     // < 3 tokens → no shingles
      (7L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.queries.Registry.qShingleNovelty(spark, tmp)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L)._3 === 0.0 && got(2L)._3 === 0.0 && got(3L)._3 === 0.0)
    assert(got(4L)._3 === 1.0)
    assert(got(5L)._3 > 0.0 && got(5L)._3 < 1.0,
      s"half-copy must sit strictly between: ${got(5L)}")
    assert(got(6L) === ((0L, 0L, 0.0)) && got(7L) === ((0L, 0L, 0.0)))
    // distinct-shingle law: 7 tokens → 5 triples but only 2 DISTINCT
    // ("copy paste copy", "paste copy paste") — repeats count once
    assert(got(1L)._1 === 2L, s"distinct shingles for boilerplate: ${got(1L)}")
  }

  test("dupInflation: per-stratum duplicate accounting under the normalized law") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello  World", "a"),   // dup of 2 under lower+ws-collapse
      (2L, "hello world", "a"),
      (3L, "unique one", "a"),
      (4L, "x y z", "b"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.dupInflation(docs, "text", "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getDouble(7))))
      .toMap
    // a: 3 docs, 2 distinct contents, 1 dup; 6 tokens total, 4 unique
    assert(got("a") === ((3L, 2L, 1L, 6L, 4L, 2L, 1.5)))
    assert(got("b") === ((1L, 1L, 0L, 3L, 3L, 0L, 1.0)))
  }

  test("dupInflation charges each stratum only for its OWN redundancy") {
    import spark.implicits._
    // same content in two strata: neither sees a duplicate
    val docs = Seq((1L, "shared text", "a"), (2L, "shared text", "b"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.dupInflation(docs, "text", "source")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got === Map("a" -> 0L, "b" -> 0L))
  }

  test("dupInflation: NULL-text rows are each their OWN keeper, never dups of each other") {
    import spark.implicits._
    // three NULL texts in one stratum share a NULL fingerprint; a grouped
    // NULL key would report 2 phantom dup docs — the law says 0 (the
    // ingest-side "NULL fp ⇒ keeper" convention)
    val docs = Seq(
      (1L, null.asInstanceOf[String], "a"),
      (2L, null.asInstanceOf[String], "a"),
      (3L, null.asInstanceOf[String], "a"),
      (4L, "real text", "a"), (5L, "real text", "a"))
      .toDF("doc_id", "text", "source")
    val r = Dedup.dupInflation(docs, "text", "source").collect().head
    // (stratum, n_docs, n_uniq, n_dup_docs, n_tokens, uniq_tokens, dup_tokens)
    assert(r.getLong(1) === 5L, "n_docs counts NULL rows")
    assert(r.getLong(2) === 4L, "n_uniq: 3 NULL singletons + 1 real content")
    assert(r.getLong(3) === 1L, "only the real-content copy is a dup")
    assert(r.getLong(4) === 4L && r.getLong(5) === 2L && r.getLong(6) === 2L)
  }

  // planted stop-shingle corpus for the df-cap law: 100 docs share exactly
  // ONE boilerplate trigram ("common boiler plate" — the adjacent unique
  // tokens keep every other shingle doc-private), and docs 1000/1001 are
  // identical 5-shingle texts whose FIRST shingle is rare (df = 2) while
  // their LAST is the hot boilerplate one (df = 102)
  private lazy val stopShingleDocs = {
    val boiler = (0L until 100L).map(i =>
      (i, s"common boiler plate u${i}a u${i}b"))
    val pair = Seq(
      (1000L, "rare gem stone marker common boiler plate"),
      (1001L, "rare gem stone marker common boiler plate"))
    (boiler ++ pair).toDF("doc_id", "text")
  }

  test("ngram df cap: a hot shingle stops generating candidates; found pairs stay value-exact") {
    // capped law (maxDf = 64): the boilerplate trigram (df = 102) is
    // dropped as a candidate generator, so the 100 boiler docs — whose
    // ONLY shared shingle is hot — emit NO pair even at threshold 0.1;
    // docs 1000/1001 pair via their rare shingles, and their jaccard is
    // 1.0 EXACTLY: the verify stage counts the capped hot shingle too
    val capped = Dedup.ngramJaccardPairs(stopShingleDocs, "doc_id", "text",
      shingleSize = 3, threshold = 0.1, maxDf = 64).collect()
    assert(capped.length === 1)
    assert((capped.head.getLong(0), capped.head.getLong(1)) === ((1000L, 1001L)))
    assert(capped.head.getDouble(2) === 1.0,
      "shared must count the hot shingle: values exact, recall capped")
    // cap lifted (maxDf ≥ 102): every hot-shingle pair appears —
    // C(100,2) = 4950 boiler-boiler (jaccard 1/5), 200 boiler×planted
    // (jaccard 1/7), + the planted pair
    val uncapped = Dedup.ngramJaccardPairs(stopShingleDocs, "doc_id", "text",
      shingleSize = 3, threshold = 0.1, maxDf = 1000)
    assert(uncapped.count() === 5151L)
  }

  test("ngram df cap: containment law shares the capped scaffold") {
    val got = Dedup.ngramContainmentPairs(stopShingleDocs, "doc_id", "text",
      shingleSize = 3, threshold = 0.9, maxDf = 64).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1)) === ((1000L, 1001L)))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((5L, 5L, 5L)),
      "shared/na/nb verify against FULL sets (hot shingle included)")
    assert(r.getDouble(5) === 1.0)
  }

  test("ngram dice: exact 2s/(na+nb) value, threshold boundary, capped scaffold") {
    import spark.implicits._
    // 4 shingles each, 3 shared → dice = 6/8 = 0.75, jaccard 3/5 = 0.6
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e g"))
      .toDF("doc_id", "text")
    val hit = Dedup.ngramDicePairs(docs, "doc_id", "text",
      shingleSize = 3, threshold = 0.7).collect()
    assert(hit.length === 1)
    val r = hit.head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 2L)))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((3L, 4L, 4L)))
    assert(r.getDouble(5) === 0.75)
    // the default 0.85 threshold excludes the same pair (prune bound is
    // monotone in shared, so the candidate never reaches the output)
    assert(Dedup.ngramDicePairs(docs, "doc_id", "text",
      shingleSize = 3).count() === 0L)
    // the planted stop-shingle corpus: identical docs survive the cap
    // with dice exactly 1.0 over FULL sets
    val capped = Dedup.ngramDicePairs(stopShingleDocs, "doc_id", "text",
      shingleSize = 3, threshold = 0.85, maxDf = 64).collect()
    assert(capped.length === 1)
    assert((capped.head.getLong(0), capped.head.getLong(1)) === ((1000L, 1001L)))
    assert(capped.head.getDouble(5) === 1.0)
  }

  test("winnowFingerprints: brute-force window replay, substring guarantee, short-doc empty, density") {
    import spark.implicits._
    val k = 5; val w = 4
    // independent replay: per-window scan with rightmost-min ties (the
    // engine runs a ring loop — different code path, same law)
    def naive(text: String): Set[(Long, Long)] = {
      val toks = TextFns.tokensScala(text.toLowerCase(java.util.Locale.ROOT))
      val m = toks.length - k + 1
      if (m < w) return Set.empty
      val md = java.security.MessageDigest.getInstance("MD5")
      val hs = (0 until m).map { i =>
        val hex = md.digest(toks.slice(i, i + k).mkString(" ")
          .getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.substring(0, 15), 16)
      }
      (0 to m - w).map { j =>
        val win = (j until j + w)
        val mn = win.map(hs).min
        val pos = win.filter(p => hs(p) == mn).max
        ((pos + 1).toLong, hs(pos))
      }.toSet
    }
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and runs far away today",
      "every corpus needs a second document with plenty of distinct words " +
        "to fingerprint reliably across windows",
      "short doc")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Dedup.winnowFingerprints(docs, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (id, a) =>
        id -> a.map(x => (x._2, x._3)).toSet }
    assert(got(0L) === naive(texts(0)))
    assert(got(1L) === naive(texts(1)))
    assert(!got.contains(2L), "docs shorter than w+k-1 tokens emit nothing")
    // the SIGMOD '03 guarantee: a shared run of ≥ w+k−1 words shares a
    // selected fingerprint
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val pair = Seq((10L, s"unique lead tokens here $shared"),
      (11L, s"$shared and a different tail entirely now")).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(pair, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val h10 = fps.filter(_._1 == 10L).map(_._2).toSet
    val h11 = fps.filter(_._1 == 11L).map(_._2).toSet
    assert((h10 & h11).nonEmpty, "shared 8-word run must share a fingerprint")
    // density: distinct positions per doc ≈ 2m/(w+1), never more than m−w+1
    val n0 = got(0L).size
    assert(n0 >= 1 && n0 <= texts(0).split(" ").length - k + 1 - w + 1)
  }
}
