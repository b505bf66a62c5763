package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL training-data export — the handoff format every trainer reads.
  *
  * One JSON object per line via `to_json(struct(...))` (codegen'd, no UDF),
  * written as text and directory-partitioned by the split/shard columns so a
  * trainer reads `split=train/shard=3/` straight from the layout without
  * scanning the rest. Shard files arrive in [[Splits.shuffleShards]] `pos`
  * order when the input is sorted within partitions, so the on-disk line
  * order IS the deterministic training order.
  *
  * Scale shape: a narrow per-row projection + a write partitioned by
  * low-cardinality columns — no shuffle beyond what the caller's ordering
  * already did. Compression comes from the standard text-sink codec option.
  */
object TrainExport {

  /** Write `df` as JSONL under `outDir`, one directory level per column in
    * `partitionBy` (those columns become directory keys and are NOT repeated
    * inside the JSON payload).
    */
  def writeJsonl(df: DataFrame, outDir: String,
      partitionBy: Seq[String] = Seq("split"), codec: Option[String] = None): Unit = {
    val payloadCols = df.columns.filterNot(partitionBy.contains)
      .map(col).toSeq
    val out = df.select(
      (partitionBy.map(col) :+ to_json(struct(payloadCols: _*)).as("value")): _*)
    val w = out.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*)
    codec.fold(w)(c => w.option("compression", c)).text(outDir)
  }

  /** WebDataset-style tar-shard export — the sequential-read handoff format
    * for multimodal training loaders: each sample is a run of adjacent tar
    * members sharing a basename (`<key>.txt`, `<key>.json`, `<key>.bin` …),
    * each shard one `shard-NNNNNN.tar` a loader streams front-to-back with
    * zero random IO.
    *
    * Distribution shape: one hash shuffle on the shard id co-locates each
    * shard in exactly one task (`repartition(shardCol)`), rows sorted within
    * partitions by (shard, key, member bytes) — the byte columns are the
    * final tie-break so even duplicate sample keys order deterministically —
    * making member order, and therefore shard bytes, DETERMINISTIC; a partition holding several shards rolls to a
    * new tar on each shard change. Headers are fixed-metadata ustar
    * (mtime 0, uid/gid 0, mode 644, dependency-free — same posture as the
    * CFB/XLSX codecs), so identical input produces byte-identical shards on
    * any cluster.
    *
    * `members` maps payload columns to member extensions, e.g.
    * `Seq("text" -> "txt", "meta" -> "json")`; string columns are written
    * UTF-8, binary columns as-is, NULL members are skipped (the WebDataset
    * missing-member convention). Sample keys may be any UTF-8 string (tar
    * names are raw bytes); NULL shard ids or keys fail fast with context —
    * routing columns are a data contract, not something to guess around.
    *
    * Tasks write dot-hidden per-attempt temp files and rename into place on
    * completion, so a retried or speculative attempt can never interleave
    * bytes into a final shard (and because shards are byte-deterministic, a
    * rename race between twin attempts is harmless — both wrote the same
    * bytes).
    *
    * Returns the collected per-shard manifest (shard_file, n_samples,
    * n_bytes) as a DataFrame — bounded by the shard count, and the write has
    * already happened exactly once when this returns.
    */
  def writeTarShards(df: DataFrame, outDir: String, shardCol: String,
      keyCol: String, members: Seq[(String, String)]): DataFrame =
    writeTarShardsCore(df, outDir, shardCol, keyCol, members,
      filePrefix = "", overwrite = true)

  private def writeTarShardsCore(df: DataFrame, outDir: String, shardCol: String,
      keyCol: String, members: Seq[(String, String)], filePrefix: String,
      overwrite: Boolean): DataFrame = {
    val spark = df.sparkSession
    val memberCols = members.map { case (c, ext) =>
      (col(c).cast(BinaryType)).as(s"_m_$c") -> ext
    }
    val prepared = df
      .select((Seq(col(shardCol).cast(IntegerType).as("_shard"),
        col(keyCol).cast(StringType).as("_key")) ++ memberCols.map(_._1)): _*)
      .repartition(col("_shard"))
      // member bytes as final sort keys: with DUPLICATE (_shard, _key) rows
      // a (shard, key) sort alone leaves tie order attempt-dependent, which
      // would break the byte-determinism the rename race and the manifest
      // both rely on — a losing attempt's manifest row could then describe
      // different bytes than the winner's committed file
      .sortWithinPartitions(
        (Seq(col("_shard"), col("_key")) ++
          members.map { case (c, _) => col(s"_m_$c") }): _*)
    val exts = members.map(_._2)
    // hadoopConfiguration isn't serializable; ship it as key-values so the
    // executor-side FileSystem sees the session's object-store credentials —
    // this sink writes to whatever outDir's scheme resolves to (local, HDFS,
    // s3a) through the same API the parquet sinks use.
    val confKv = {
      val it = spark.sparkContext.hadoopConfiguration.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }
    val bcConf = spark.sparkContext.broadcast(confKv)
    // overwrite semantics happen HERE, on the driver, before any task runs:
    // per-task deletes of final paths would race twin attempts (the reason
    // close() below never deletes dst). Everything is SCOPED to this call's
    // file prefix: the streaming append path (overwrite = false, per-batch
    // prefix) clears only its own stale temps — a replayed micro-batch must
    // never touch another batch's committed shards, and its own committed
    // shards are byte-identical by determinism, so they stand as twin wins.
    locally {
      val base = new org.apache.hadoop.fs.Path(outDir)
      val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val quoted = java.util.regex.Pattern.quote(filePrefix)
      val shardRe = quoted + "shard-\\d{6}\\.tar"
      // temps match the FULL dot-hidden shard-temp shape for THIS prefix —
      // a bare startsWith(".")/endsWith(".tmp") would let a batch-mode
      // overwrite (prefix "") delete a concurrent streaming batch's
      // in-flight temps and kill that micro-batch's renames
      val tmpRe = "\\." + shardRe + "\\.\\d+\\.tmp"
      if (fs.exists(base)) fs.listStatus(base).foreach { st =>
        val n = st.getPath.getName
        if ((overwrite && n.matches(shardRe)) || n.matches(tmpRe))
          fs.delete(st.getPath, false)
      }
    }
    val manifest = prepared.queryExecution.toRdd.mapPartitions { rows =>
      // InternalRow iteration: _shard int, _key UTF8String, members binary
      val conf = new org.apache.hadoop.conf.Configuration(false)
      bcConf.value.foreach { case (k, v) => conf.set(k, v) }
      val baseDir = new org.apache.hadoop.fs.Path(outDir)
      val fs = baseDir.getFileSystem(conf)
      fs.mkdirs(baseDir)
      // task-attempt commit protocol: write to a dot-hidden temp (unique per
      // attempt), rename into place on completion. A retried or speculative
      // attempt never interleaves bytes into a final shard; if the rename
      // loses a race the winner's file is byte-identical (the export is
      // deterministic), so the loser just discards its temp.
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      var cur = Int.MinValue
      var out: java.io.OutputStream = null
      var file: String = null
      var nSamples = 0L; var nBytes = 0L
      val acc = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      def close(): Unit = if (out != null) {
        out.write(new Array[Byte](1024)) // tar end-of-archive: two zero blocks
        out.close()
        val tmp = new org.apache.hadoop.fs.Path(baseDir, s".$file.$attempt.tmp")
        val dst = new org.apache.hadoop.fs.Path(baseDir, file)
        // NEVER delete dst: a twin attempt may have committed it, and shards
        // are byte-deterministic so an existing dst IS our bytes. Rename only
        // wins on a vacant slot; on failure, dst-present = twin won (drop our
        // temp), dst-absent = a real FS error that must fail the task loudly
        // rather than silently lose a shard the manifest reports.
        if (!fs.rename(tmp, dst)) {
          if (fs.exists(dst)) fs.delete(tmp, false)
          else throw new java.io.IOException(
            s"writeTarShards: rename $tmp -> $dst failed with no committed twin")
        }
        acc += ((file, nSamples, nBytes + 1024)); out = null
      }
      def roll(shard: Int): Unit = {
        close()
        cur = shard; nSamples = 0L; nBytes = 0L
        file = f"${filePrefix}shard-$shard%06d.tar"
        out = new java.io.BufferedOutputStream(fs.create(
          new org.apache.hadoop.fs.Path(baseDir, s".$file.$attempt.tmp"), true))
      }
      rows.foreach { r =>
        // fail fast with context on NULL routing columns: a NULL shard would
        // otherwise read as 0 from the unsafe row (silent misroute) and a
        // NULL key would NPE opaquely deep in the member writer
        require(!r.isNullAt(0) && !r.isNullAt(1),
          s"writeTarShards: NULL ${if (r.isNullAt(0)) "shard" else "key"} value " +
            "in input — every row must carry a non-null shard id and sample key")
        val shard = r.getInt(0)
        if (shard != cur || out == null) roll(shard)
        val key = r.getUTF8String(1).toString
        var i = 0
        while (i < exts.length) {
          if (!r.isNullAt(2 + i)) {
            val body = r.getBinary(2 + i)
            nBytes += Tar.writeMember(out, s"$key.${exts(i)}", body)
          }
          i += 1
        }
        nSamples += 1
      }
      close()
      acc.iterator
    }.collect()
    spark.createDataFrame(
      spark.sparkContext.parallelize(manifest.toSeq.map(Row.fromTuple), 1),
      StructType(Seq(StructField("shard_file", StringType, nullable = false),
        StructField("n_samples", LongType, nullable = false),
        StructField("n_bytes", LongType, nullable = false))))
  }

  /** One micro-batch of the STREAMING tar-shard export. Shard files carry
    * the batch id in their name (`batch-BBBBBB-shard-NNNNNN.tar`), which is
    * what makes incremental delivery exactly-once WITHOUT any mutable
    * ledger: ids can never collide across batches, and a replayed batch
    * (foreachBatch is at-least-once) rewrites byte-identical files under
    * the same names — the commit protocol treats the existing shard as the
    * deterministic twin's win. The per-shard manifest lands beside the
    * shards as `manifest-BBBBBB.tsv` (sorted `file\tsamples\tbytes` lines,
    * tmp→rename, idempotently rewritten on replay); the GLOBAL manifest is
    * simply the set of `manifest-*.tsv` files — append-by-new-file, never
    * append-in-place. Loaders reading `shard-*.tar` in name order get
    * batch-arrival order, the natural incremental training order.
    *
    * Lifecycle contract, ENFORCED (same `_BATCH_FP` protocol as the
    * guarded parquet ingest): shard names alone make SAME-data replays
    * no-ops, but a fresh checkpoint over an old outDir restarts batch ids
    * at 0 with DIFFERENT data — dst-present renames would then stand as
    * false "twin wins" while `manifest-<id>.tsv` is rewritten to describe
    * the new data, silently diverging manifest from shard bytes. Each
    * batch therefore records an order-independent content fingerprint
    * (`_BATCH_FP-<id>`, underscore-hidden from loaders) BEFORE any shard
    * byte lands; an existing fingerprint that doesn't match the arriving
    * batch fails loudly before anything is touched.
    */
  def appendTarShards(batch: DataFrame, batchId: Long, outDir: String,
      shardCol: String, keyCol: String,
      members: Seq[(String, String)]): DataFrame = {
    val prefix = f"batch-$batchId%06d-"
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
    // hash the BYTES the writer will emit (same binary cast), plus each
    // member's null flag so a NULL member can't alias an absent one and
    // position information survives xxhash64's null-skipping
    val fpCols = Seq(col(shardCol).cast(IntegerType),
      col(keyCol).cast(StringType)) ++
      members.flatMap { case (c, _) =>
        Seq(col(c).cast(BinaryType), col(c).isNull) }
    val fpVal = batch.agg(coalesce(
      sum(xxhash64(fpCols: _*).cast("decimal(38,0)")),
      lit(java.math.BigDecimal.ZERO))).head().getDecimal(0)
      .toBigInteger.toString
    val fpPath = new org.apache.hadoop.fs.Path(outDir, f"_BATCH_FP-$batchId%06d")
    if (fs.exists(fpPath)) {
      val in = fs.open(fpPath)
      val old = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      require(old == fpVal,
        s"appendTarShards: $outDir already holds a DIFFERENT batch $batchId " +
          "(fingerprint mismatch) — the outDir and checkpoint lifecycles are " +
          "coupled; pair a fresh checkpoint with a fresh outDir")
    } else {
      val out = fs.create(fpPath, true)
      try out.write(fpVal.getBytes("UTF-8")) finally out.close()
    }
    val manifest = writeTarShardsCore(batch, outDir, shardCol, keyCol, members,
      filePrefix = prefix, overwrite = false)
    val lines = manifest.collect()
      .map(r => s"${r.getString(0)}\t${r.getLong(1)}\t${r.getLong(2)}").sorted
    val name = f"manifest-$batchId%06d.tsv"
    val tmp = new org.apache.hadoop.fs.Path(outDir, s".$name.tmp")
    val dst = new org.apache.hadoop.fs.Path(outDir, name)
    val out = fs.create(tmp, true)
    try out.write((if (lines.isEmpty) "" else lines.mkString("", "\n", "\n"))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"appendTarShards: rename $tmp -> $dst failed")
    manifest
  }

  /** Continuous WebDataset delivery: compose the deterministic tar-shard
    * writer into a Structured Streaming sink. Each micro-batch commits its
    * own shard files + manifest via [[appendTarShards]]; the checkpoint
    * gives exactly-once batch ids, and the per-batch naming above turns
    * at-least-once replays into byte-identical no-ops.
    */
  def streamTarShards(stream: DataFrame, outDir: String, shardCol: String,
      keyCol: String, members: Seq[(String, String)],
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        appendTarShards(b, id, outDir, shardCol, keyCol, members); ()
      }
      .start()

  /** Minimal deterministic ustar writer (POSIX.1-1988 layout: 512-byte
    * header, NUL-padded octal fields, checksum computed with the checksum
    * field spaced out, body padded to the 512 boundary).
    */
  private[ops] object Tar {
    def writeMember(out: java.io.OutputStream, name: String,
        body: Array[Byte]): Long = {
      // tar names are raw bytes: encode UTF-8 (the python/GNU convention) so
      // non-ASCII sample keys survive instead of collapsing to '?' collisions
      val nameBytes = name.getBytes("UTF-8")
      require(nameBytes.length <= 100, s"tar member name too long: $name")
      val h = new Array[Byte](512)
      def put(off: Int, s: String): Unit = {
        val b = s.getBytes("US-ASCII"); System.arraycopy(b, 0, h, off, b.length)
      }
      System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
      put(100, "0000644" + "\u0000")            // mode
      put(108, "0000000" + "\u0000")            // uid
      put(116, "0000000" + "\u0000")            // gid
      put(124, f"${body.length}%011o" + "\u0000") // size
      put(136, "00000000000" + "\u0000")        // mtime: epoch, deterministic
      put(148, "        ")                      // chksum spaces for the sum
      h(156) = '0'                              // typeflag: regular file
      put(257, "ustar" + "\u0000" + "00")       // magic + version
      var sum = 0; var i = 0
      while (i < 512) { sum += h(i) & 0xff; i += 1 }
      put(148, f"$sum%06o" + "\u0000" + " ")
      out.write(h)
      out.write(body)
      val pad = (512 - body.length % 512) % 512
      if (pad > 0) out.write(new Array[Byte](pad))
      512L + body.length + pad
    }
  }
}
