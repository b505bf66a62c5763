package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tar-shard (WebDataset-style) export laws: byte-level ustar conformance,
  * deterministic member order, NULL-member skip, manifest accounting, and
  * write-twice byte identity. The parser here is written from the ustar
  * spec (not the writer) so the two can't share a bug.
  */
class TrainExportSpec extends SparkSpec {
  import spark.implicits._

  /** Independent minimal ustar reader: returns (name, body) in archive
    * order, validating the checksum and magic of every header.
    */
  private def readTar(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var off = 0
    var done = false
    while (!done && off + 512 <= bytes.length) {
      val name = new String(bytes, off, 100, "US-ASCII").takeWhile(_ != '\u0000')
      if (name.isEmpty) done = true // first zero block = end of archive
      else {
        val magic = new String(bytes, off + 257, 6, "US-ASCII")
        assert(magic == "ustar\u0000", s"bad magic at $off: ${magic.toList}")
        val stored = java.lang.Integer.parseInt(
          new String(bytes, off + 148, 8, "US-ASCII")
            .replace('\u0000', ' ').trim, 8)
        var sum = 0
        for (i <- 0 until 512)
          sum += (if (i >= 148 && i < 156) ' '.toInt else bytes(off + i) & 0xff)
        assert(stored == sum, s"checksum mismatch for $name")
        val size = java.lang.Integer.parseInt(
          new String(bytes, off + 124, 12, "US-ASCII")
            .replace('\u0000', ' ').trim, 8)
        out += name -> bytes.slice(off + 512, off + 512 + size)
        off += 512 + ((size + 511) / 512) * 512
      }
    }
    out.toSeq
  }

  private def docsDf = Seq(
    (0, "d00", "alpha text", """{"lang":"en"}"""),
    (0, "d01", "beta text", """{"lang":"de"}"""),
    (1, "d10", "gamma text", null),
    (1, "d11", "delta text", """{"lang":"fr"}"""),
    (2, "d20", "epsilon text", """{"lang":"en"}""")
  ).toDF("shard", "key", "text", "meta")

  test("writeTarShards: round-trips every member, in sorted sample order") {
    val dir = Files.createTempDirectory("tar-shards").toString
    val manifest = TrainExport.writeTarShards(docsDf, dir, "shard", "key",
      Seq("text" -> "txt", "meta" -> "json"))
    val m = manifest.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m.keySet === Set("shard-000000.tar", "shard-000001.tar", "shard-000002.tar"))
    assert(m("shard-000000.tar")._1 === 2L)
    assert(m("shard-000001.tar")._1 === 2L)
    assert(m("shard-000002.tar")._1 === 1L)

    val s0 = readTar(Files.readAllBytes(Paths.get(dir, "shard-000000.tar")))
    assert(s0.map(_._1) === Seq("d00.txt", "d00.json", "d01.txt", "d01.json"),
      "members must arrive key-sorted, sample-adjacent")
    assert(new String(s0.head._2, "UTF-8") === "alpha text")
    assert(new String(s0(1)._2, "UTF-8") === """{"lang":"en"}""")

    // NULL member is skipped, not emitted empty
    val s1 = readTar(Files.readAllBytes(Paths.get(dir, "shard-000001.tar")))
    assert(s1.map(_._1) === Seq("d10.txt", "d11.txt", "d11.json"))

    // manifest n_bytes is the true file size (headers + padding + trailer)
    for ((f, (_, b)) <- m)
      assert(Files.size(Paths.get(dir, f)) === b, s"manifest size drift for $f")
  }

  test("writeTarShards: non-ASCII keys survive as UTF-8 member names; NULL routing fails fast") {
    val dir = Files.createTempDirectory("tar-utf8").toString
    TrainExport.writeTarShards(
      Seq((0, "café", "x"), (0, "日本", "y")).toDF("shard", "key", "text"),
      dir, "shard", "key", Seq("text" -> "txt"))
    val names = readTar(Files.readAllBytes(Paths.get(dir, "shard-000000.tar")))
      .map { case (n, _) => new String(
        n.getBytes("US-ASCII").takeWhile(_ != 0), "US-ASCII") }
    // read back through the byte layer: the parser decodes US-ASCII, so
    // check the raw UTF-8 bytes survived un-mangled (no '?' fold)
    val raw = Files.readAllBytes(Paths.get(dir, "shard-000000.tar"))
    val first = new String(raw.take(100).takeWhile(_ != 0), "UTF-8")
    assert(Set(first) subsetOf Set("café.txt", "日本.txt"))
    assert(!first.contains("?"))
    assert(names.size === 2)

    val err = intercept[org.apache.spark.SparkException] {
      TrainExport.writeTarShards(
        Seq((Some(0), Option.empty[String], Some("x"))).toDF("shard", "key", "text"),
        Files.createTempDirectory("tar-null").toString,
        "shard", "key", Seq("text" -> "txt"))
    }
    assert(err.getMessage.contains("NULL key") ||
      Option(err.getCause).exists(_.getMessage.contains("NULL key")))
  }

  test("writeTarShards: byte-identical across runs; binary payloads exact") {
    val bin = Array.tabulate[Byte](700)(i => (i % 251).toByte) // crosses a 512 pad
    val df = Seq((7, "s0")).toDF("shard", "key")
      .withColumn("blob", lit(bin))
    val d1 = Files.createTempDirectory("tar-a").toString
    val d2 = Files.createTempDirectory("tar-b").toString
    TrainExport.writeTarShards(df, d1, "shard", "key", Seq("blob" -> "bin"))
    TrainExport.writeTarShards(df, d2, "shard", "key", Seq("blob" -> "bin"))
    val b1 = Files.readAllBytes(Paths.get(d1, "shard-000007.tar"))
    val b2 = Files.readAllBytes(Paths.get(d2, "shard-000007.tar"))
    assert(java.util.Arrays.equals(b1, b2), "export must be deterministic")
    val members = readTar(b1)
    assert(members.map(_._1) === Seq("s0.bin"))
    assert(java.util.Arrays.equals(members.head._2, bin))
    // 512 header + 700 body padded to 1024 + 1024 trailer
    assert(b1.length === 512 + 1024 + 1024)
  }

  test("writeTarShards: DUPLICATE keys still order deterministically (bytes tie-break)") {
    // two rows with the same (shard, key) but different payloads: without
    // the member-bytes sort tie-break their order would be attempt- and
    // partitioning-dependent, breaking the byte-determinism the rename
    // race and the manifest both rely on
    val rows = Seq((3, "dup", "payload-b"), (3, "dup", "payload-a"),
      (3, "zz", "tail"))
    val d1 = Files.createTempDirectory("tar-dup-a").toString
    val d2 = Files.createTempDirectory("tar-dup-b").toString
    TrainExport.writeTarShards(
      rows.toDF("shard", "key", "text").repartition(4), d1,
      "shard", "key", Seq("text" -> "txt"))
    TrainExport.writeTarShards(
      rows.reverse.toDF("shard", "key", "text").coalesce(1), d2,
      "shard", "key", Seq("text" -> "txt"))
    val b1 = Files.readAllBytes(Paths.get(d1, "shard-000003.tar"))
    val b2 = Files.readAllBytes(Paths.get(d2, "shard-000003.tar"))
    assert(java.util.Arrays.equals(b1, b2),
      "duplicate-key export must not depend on input order/partitioning")
    // tie order is by member bytes: payload-a before payload-b
    assert(readTar(b1).map(m => new String(m._2, "UTF-8")) ===
      Seq("payload-a", "payload-b", "tail"))
  }

  test("streaming tar shards: two-batch feed — deterministic bytes, exact manifests, no id collision") {
    val batch1 = Seq((0, "k1", "alpha"), (0, "k2", "beta"), (1, "k3", "gamma"))
    val batch2 = Seq((0, "k4", "delta"), (2, "k5", "epsilon"))
    def drive(tag: String): String = {
      val src = Files.createTempDirectory(s"tarstream-src-$tag").toString
      val out = Files.createTempDirectory(s"tarstream-out-$tag").toString
      val ckp = Files.createTempDirectory(s"tarstream-ckp-$tag").toString
      val df1 = batch1.toDF("shard", "key", "text")
      df1.coalesce(1).write.mode("append").parquet(src)
      val stream = spark.readStream.schema(df1.schema).parquet(src)
      val q = TrainExport.streamTarShards(
        stream, out, "shard", "key", Seq("text" -> "txt"), ckp)
      q.processAllAvailable()
      batch2.toDF("shard", "key", "text").coalesce(1)
        .write.mode("append").parquet(src)
      q.processAllAvailable(); q.stop()
      out
    }
    val out = drive("a")
    // ignore the local-FS checksum sidecars (.crc) the Hadoop
    // LocalFileSystem writes beside every file, and the underscore-hidden
    // protocol files (_BATCH_FP-*) loaders never see
    val names = new java.io.File(out).listFiles().map(_.getName)
      .filterNot(n => n.startsWith(".") || n.startsWith("_")).sorted.toSeq
    // batch id in the shard name = structurally impossible id collisions,
    // even though both batches carry a shard 0
    assert(names === Seq(
      "batch-000000-shard-000000.tar", "batch-000000-shard-000001.tar",
      "batch-000001-shard-000000.tar", "batch-000001-shard-000002.tar",
      "manifest-000000.tsv", "manifest-000001.tsv"))
    // manifests: sorted lines, sizes matching the committed files exactly
    val m0 = new String(Files.readAllBytes(Paths.get(out, "manifest-000000.tsv")), "UTF-8")
    assert(m0.split("\n").toSeq === Seq(
      s"batch-000000-shard-000000.tar\t2\t${Files.size(Paths.get(out, "batch-000000-shard-000000.tar"))}",
      s"batch-000000-shard-000001.tar\t1\t${Files.size(Paths.get(out, "batch-000000-shard-000001.tar"))}"))
    // member layout of a streamed shard is the batch writer's layout
    assert(readTar(Files.readAllBytes(Paths.get(out, "batch-000000-shard-000000.tar")))
      .map(_._1) === Seq("k1.txt", "k2.txt"))
    // the whole feed is byte-deterministic across independent drives
    val out2 = drive("b")
    names.foreach { n =>
      assert(java.util.Arrays.equals(
        Files.readAllBytes(Paths.get(out, n)), Files.readAllBytes(Paths.get(out2, n))),
        s"streamed artifact $n not byte-deterministic")
    }
    // at-least-once replay of a committed batch is a byte-identical no-op
    val before = names.map(n => n -> Files.readAllBytes(Paths.get(out, n))).toMap
    TrainExport.appendTarShards(batch2.toDF("shard", "key", "text"), 1L,
      out, "shard", "key", Seq("text" -> "txt"))
    names.foreach { n =>
      assert(java.util.Arrays.equals(before(n), Files.readAllBytes(Paths.get(out, n))),
        s"replay mutated $n")
    }
    // fresh-checkpoint-over-old-outDir collision: a committed batch id
    // arriving with DIFFERENT data must fail loudly BEFORE touching any
    // shard or manifest byte — the silent alternative is an overwritten
    // manifest describing bytes the standing "twin win" shards don't hold
    val err = intercept[IllegalArgumentException] {
      TrainExport.appendTarShards(
        Seq((0, "k9", "entirely different")).toDF("shard", "key", "text"), 1L,
        out, "shard", "key", Seq("text" -> "txt"))
    }
    assert(err.getMessage.contains("fingerprint mismatch"))
    names.foreach { n =>
      assert(java.util.Arrays.equals(before(n), Files.readAllBytes(Paths.get(out, n))),
        s"rejected collision mutated $n")
    }
  }
}
