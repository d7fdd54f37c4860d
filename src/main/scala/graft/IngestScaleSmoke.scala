package graft

import org.apache.spark.sql.functions._

/** Scale evidence for the r12 ingest/codec layer at ~100× the bench
  * SF: `.warc.gz` member-per-record archives (the Common Crawl
  * layout) decompressed + record-split + HTTP-parsed end to end,
  * baseline-JPEG entropy decode throughput, and WebDataset tar-shard
  * walks with the sample regroup — every assertion planted
  * arithmetic, so expected counts are exact.
  *
  * Run: `sbt "runMain graft.IngestScaleSmoke [nRecords] [nImages]"`.
  */
object IngestScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nRecords = args.headOption.map(_.toInt).getOrElse(200000)
    val nImages = args.drop(1).headOption.map(_.toInt).getOrElse(200000)
    val recsPerBlob = 20
    val nBlobs = nRecords / recsPerBlob
    val spark = GraftSession.builder("local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- rung 1: .warc.gz — one gzip member per record, 20 records
    // per archive blob; bodies fixed 64 chars (one plants the record
    // magic) so Content-Length sums are closed-form ----
    val id = col("id")
    val recId = (i: org.apache.spark.sql.Column) => id * recsPerBlob + i
    val bodyOf = (i: org.apache.spark.sql.Column) => rpad(
      concat(lit("body WARC/1.0 trap rec "), recId(i).cast("string"), lit(" ")),
      64, "x")
    val urlOf = (i: org.apache.spark.sql.Column) => concat(lit("https://h"),
      pmod(recId(i), lit(5000L)).cast("string"), lit(".com/doc"),
      recId(i).cast("string"))
    val memberArr = transform(sequence(lit(0L), lit(recsPerBlob - 1L)),
      i => graft.sources.Warc.gzMember(lit("response"), urlOf(i), bodyOf(i)))
    val archives = spark.range(nBlobs).toDF("id")
      .select(id.as("doc_id"),
        aggregate(memberArr, lit(Array.emptyByteArray),
          (acc, m) => concat(acc, m)).as("archive"))
      .repartition(64).cache()
    archives.count() // materialize synthesis outside the timing
    val gzBytes = archives.agg(sum(length(col("archive")))).head().getLong(0)

    val (gzAgg, tGz) = time {
      graft.sources.Warc.parseHttp(
          graft.sources.Warc.parseRecords(
            graft.sources.Warc.splitRecordsGz(archives, col("archive")),
            col("record")),
          col("body"))
        .agg(count(lit(1)).as("recs"),
          sum(col("content_length")).as("clen"),
          sum(when(col("length_ok"), 1L).otherwise(0L)).as("ok"),
          // bodies are not HTTP messages here: the parse must refuse
          // them all without refusing the records
          sum(when(col("http_valid"), 1L).otherwise(0L)).as("http"))
        .head()
    }
    val totalRecs = nBlobs.toLong * recsPerBlob
    assert(gzAgg.getLong(0) == totalRecs, s"records: ${gzAgg.getLong(0)} != $totalRecs")
    assert(gzAgg.getLong(1) == 64L * totalRecs, s"clen sum: ${gzAgg.getLong(1)}")
    assert(gzAgg.getLong(2) == totalRecs, "every record length_ok")
    assert(gzAgg.getLong(3) == 0L, "no body is a valid http message")
    println(f"GZ_WARC n=$totalRecs bytes=${gzBytes / 1e6}%.1fMB " +
      f"decode+split+parse=${tGz}%.1fs (${totalRecs / tGz / 1000}%.0fk rec/s)")

    // ---- rung 2: baseline-JPEG entropy decode throughput; planted
    // flat-tile sums make the decoded aggregate exactly computable ----
    val mode = (id % 3).cast("int")
    val tw = (lit(2L) + id % 3).cast("int")
    val th = (lit(1L) + expr("(id div 3) % 2")).cast("int")
    val ri = when(id % 2 === 1, lit(2)).otherwise(lit(0)).cast("int")
    val nT = tw * th
    val yOf = (t: org.apache.spark.sql.Column) =>
      pmod(id * 7 + t * 13, lit(256L)).cast("int")
    val tiles = when(mode === 0,
      transform(sequence(lit(0), nT - 1), t => yOf(t.cast("long"))))
      .otherwise(transform(sequence(lit(0), nT * 3 - 1), i => {
        val t = (i / 3).cast("long")
        when(i % 3 === 0, yOf(t))
          .when(i % 3 === 1, pmod(id * 5 + t * 11, lit(256L)).cast("int"))
          .otherwise(pmod(id * 3 + t * 17, lit(256L)).cast("int"))
      }))
    val side2 = when(mode === 2, lit(256L)).otherwise(lit(64L))
    val jpegs = spark.range(nImages).toDF("id")
      .select(id,
        org.apache.spark.sql.GraftColumnBridge.column(
          graft.expressions.JpegSynthEncode(
            org.apache.spark.sql.GraftColumnBridge.expression(tiles),
            org.apache.spark.sql.GraftColumnBridge.expression(
              array(tw, th, mode, ri)))).as("payload"),
        (nT.cast("long") * side2).as("expect_px"))
      .repartition(64).cache()
    jpegs.count()
    val jpegBytes = jpegs.agg(sum(length(col("payload")))).head().getLong(0)
    val expectPx = jpegs.agg(sum(col("expect_px"))).head().getLong(0)

    val (pxAgg, tJpeg) = time {
      jpegs.select(org.apache.spark.sql.GraftColumnBridge.column(
          graft.expressions.JpegPixelStats(
            org.apache.spark.sql.GraftColumnBridge.expression(col("payload"))))
          .as("st"))
        .agg(sum(element_at(col("st"), 1)).as("px"),
          sum(when(col("st").isNull, 1L).otherwise(0L)).as("bad"))
        .head()
    }
    assert(pxAgg.getLong(1) == 0L, s"decode failures: ${pxAgg.getLong(1)}")
    assert(pxAgg.getLong(0) == expectPx,
      s"decoded pixels: ${pxAgg.getLong(0)} != $expectPx")
    println(f"JPEG n=$nImages bytes=${jpegBytes / 1e6}%.1fMB decode=${tJpeg}%.1fs " +
      f"(${nImages / tJpeg / 1000}%.0fk img/s, ${expectPx / tJpeg / 1e6}%.1fM px/s)")

    // ---- rung 3: WebDataset shards — 20 samples × (jpg + cls) per
    // shard; the walk + the one keyed regroup + a real decode ----
    val nShards = math.max(1, nImages / 40)
    val sid = col("id")
    val sampleArr = flatten(transform(sequence(lit(0L), lit(19L)), i => {
      val stem = concat(lit("s"), (sid * 20 + i).cast("string"))
      val y = pmod(sid * 31 + i * 7, lit(256L)).cast("int")
      array(
        graft.sources.Wds.tarMember(concat(stem, lit(".jpg")),
          org.apache.spark.sql.GraftColumnBridge.column(
            graft.expressions.JpegSynthEncode(
              org.apache.spark.sql.GraftColumnBridge.expression(array(y, y)),
              org.apache.spark.sql.GraftColumnBridge.expression(
                array(lit(2), lit(1), lit(0), lit(0)))))),
        graft.sources.Wds.tarMember(concat(stem, lit(".cls")),
          pmod(sid + i, lit(10L)).cast("string")))
    }))
    val shards = spark.range(nShards).toDF("id")
      .select(sid.as("doc_id"),
        concat(aggregate(sampleArr, lit(Array.emptyByteArray),
          (acc, m) => concat(acc, m)),
          graft.sources.Wds.tarTerminator).as("shard"))
      .repartition(64).cache()
    shards.count()

    val (wdsAgg, tWds) = time {
      graft.sources.Wds.samples(shards, col("shard"))
        .select(col("n_members"),
          element_at(org.apache.spark.sql.GraftColumnBridge.column(
            graft.expressions.JpegPixelStats(
              org.apache.spark.sql.GraftColumnBridge.expression(
                element_at(col("parts"), "jpg")))), 1).as("px"))
        .agg(count(lit(1)).as("samples"), sum(col("n_members")).as("members"),
          sum(col("px")).as("px"))
        .head()
    }
    assert(wdsAgg.getLong(0) == nShards.toLong * 20, s"samples: ${wdsAgg.getLong(0)}")
    assert(wdsAgg.getLong(1) == nShards.toLong * 40, s"members: ${wdsAgg.getLong(1)}")
    assert(wdsAgg.getLong(2) == nShards.toLong * 20 * 128,
      s"decoded px: ${wdsAgg.getLong(2)}")
    println(f"WDS shards=$nShards samples=${nShards * 20} " +
      f"walk+regroup+decode=${tWds}%.1fs (${nShards * 20 / tWds / 1000}%.0fk samples/s)")

    // ---- rung 4: perceptual image dedup at scale — decode + dHash +
    // the keep-ledger; every consecutive pair shares a planted
    // pattern, so the expected group structure is exact ----
    val k4 = expr("(id div 2) * 2")
    val tiles4 = transform(sequence(lit(0), lit(71)),
      tt => conv(substring(md5(concat(lit("img|"), k4.cast("string"),
        lit("|"), tt.cast("string"))), 1, 2), 16, 10).cast("int"))
    val dupImgs = spark.range(nImages / 2).toDF("id")
      .select(id.as("doc_id"),
        org.apache.spark.sql.GraftColumnBridge.column(
          graft.expressions.JpegSynthEncode(
            org.apache.spark.sql.GraftColumnBridge.expression(tiles4),
            org.apache.spark.sql.GraftColumnBridge.expression(
              array(lit(9), lit(8), lit(0), lit(0)))))
          .as("payload"))
      .repartition(64).cache()
    dupImgs.count()
    val (ddAgg, tDedup) = time {
      graft.multimodal.Binary.imageDedup(dupImgs)
        .agg(count(lit(1)).as("rows"),
          sum(when(col("is_canonical"), 1L).otherwise(0L)).as("keepers"),
          max(col("n_copies")).as("max_copies"))
        .head()
    }
    val nImg4 = (nImages / 2).toLong
    assert(ddAgg.getLong(0) == nImg4, s"rows: ${ddAgg.getLong(0)}")
    // pairs (2m, 2m+1) collide and the md5-planted patterns are
    // distinct, so the group structure is EXACTLY the planted pairs
    assert(ddAgg.getLong(1) == (nImg4 + 1) / 2,
      s"keepers: ${ddAgg.getLong(1)} != ${(nImg4 + 1) / 2}")
    assert(ddAgg.getLong(2) == 2L, s"max group ${ddAgg.getLong(2)} != 2")
    println(f"IMG_DEDUP n=$nImg4 decode+dhash+ledger=${tDedup}%.1fs " +
      f"(${nImg4 / tDedup / 1000}%.0fk img/s, keepers=${ddAgg.getLong(1)})")

    // ---- rung 5: MP4 box walk throughput (pure metadata triage) ----
    val mp4s = graft.multimodal.Binary.Mp4.synthFromDocs(
      spark.range(nImages).toDF("id")
        .select(id.as("doc_id"), concat(lit("filler text for doc "),
          id.cast("string")).as("text")), invalidEvery = 10)
      .repartition(64).cache()
    mp4s.count()
    val (mpAgg, tMp4) = time {
      graft.multimodal.Binary.Mp4.parse(mp4s)
        .agg(sum(when(col("mp4_valid"), 1L).otherwise(0L)).as("valid"),
          sum(col("duration_ms")).as("ms"))
        .head()
    }
    val expectValid = nImages.toLong - (nImages.toLong + 9) / 10
    assert(mpAgg.getLong(0) == expectValid,
      s"mp4 valid: ${mpAgg.getLong(0)} != $expectValid")
    println(f"MP4 n=$nImages walk+parse=${tMp4}%.1fs " +
      f"(${nImages / tMp4 / 1000}%.0fk box-walks/s)")

    // ---- rung 6: ZIP archives — central-directory walk + CRC-verified
    // inflate, 10 entries per archive ----
    val nZips = nImages / 10
    val zid = col("id")
    val zNames = transform(sequence(lit(0L), lit(9L)),
      i => concat(lit("e"), i.cast("string"), lit("/f.txt")))
    val zDatas = transform(sequence(lit(0L), lit(9L)),
      i => rpad(concat(lit("entry "), (zid * 10 + i).cast("string"), lit(" ")),
        120, "z").cast("binary"))
    val zMethods = transform(sequence(lit(0L), lit(9L)),
      i => when(i % 2 === 0, 0).otherwise(lit(8)).cast("int"))
    val zips = spark.range(nZips).toDF("id")
      .select(zid.as("doc_id"),
        graft.sources.Zip.build(zNames, zDatas, zMethods).as("archive"))
      .repartition(64).cache()
    zips.count()
    val (zAgg, tZip) = time {
      graft.sources.Zip.entries(zips, col("archive"))
        .agg(count(lit(1)).as("n"), sum(length(col("entry_data"))).as("bytes"))
        .head()
    }
    assert(zAgg.getLong(0) == nZips.toLong * 10, s"zip entries: ${zAgg.getLong(0)}")
    assert(zAgg.getLong(1) == nZips.toLong * 10 * 120, s"zip bytes: ${zAgg.getLong(1)}")
    println(f"ZIP archives=$nZips entries=${nZips * 10} " +
      f"walk+inflate=${tZip}%.1fs (${nZips * 10 / tZip / 1000}%.0fk entries/s)")

    // ---- rung 7: mbox mailboxes — envelope split + header parse,
    // 10 messages per mailbox ----
    val nBoxes = nImages / 10
    val mid = col("id")
    val msgArr = transform(sequence(lit(0L), lit(9L)), i => concat(
      lit("From s"), (mid * 10 + i).cast("string"),
      lit("@x.com Thu Jan  1 00:00:00 2026\nFrom: u"),
      (mid * 10 + i).cast("string"),
      lit("@example.com\nSubject: m"), i.cast("string"),
      lit("\n\nbody "), rpad((mid * 10 + i).cast("string"), 40, "b")))
    val boxes = spark.range(nBoxes).toDF("id")
      .select(mid.as("doc_id"),
        array_join(msgArr, "\n").as("mbox"))
      .repartition(64).cache()
    boxes.count()
    val (mbAgg, tMbox) = time {
      graft.sources.Mbox.parseMessages(
          graft.sources.Mbox.messages(boxes, col("mbox")), col("message"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("from_addr").isNotNull, 1L).otherwise(0L)).as("hdrs"))
        .head()
    }
    assert(mbAgg.getLong(0) == nBoxes.toLong * 10, s"messages: ${mbAgg.getLong(0)}")
    assert(mbAgg.getLong(1) == nBoxes.toLong * 10, "every message has From:")
    println(f"MBOX boxes=$nBoxes messages=${nBoxes * 10} " +
      f"split+parse=${tMbox}%.1fs (${nBoxes * 10 / tMbox / 1000}%.0fk msg/s)")

    // ---- rung 8 (r13): JSONL parse throughput — the LLM-corpus wire
    // format; nRecords lines with nested metadata, 1-in-13 malformed
    val jid = col("id")
    val jlines = spark.range(nRecords).toDF("id")
      .select(jid.as("doc_id"),
        when(jid % 13 === 0, concat(lit("{\"id\": "), jid.cast("string"),
          lit(", \"text\": \"broken")))
        .otherwise(concat(
          lit("{\"id\": "), jid.cast("string"),
          lit(", \"text\": \"doc body "), rpad(jid.cast("string"), 80, "t"),
          lit("\", \"meta\": {\"lang\": \"en\", \"source\": \"s"),
          pmod(jid, lit(40L)).cast("string"),
          lit("\", \"score\": "), pmod(jid, lit(97L)).cast("string"),
          lit("}, \"tags\": [\"a\", \"b\"]}"))).as("line"))
      .repartition(64).cache()
    jlines.count()
    val (jAgg, tJsonl) = time {
      graft.sources.Jsonl.parse(jlines, col("line"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("json_ok"), 1L).otherwise(0L)).as("ok"),
          sum(col("score")).as("scores"))
        .head()
    }
    val expBad = (0L until nRecords.toLong).count(_ % 13 == 0)
    assert(jAgg.getLong(0) == nRecords.toLong, s"rows: ${jAgg.getLong(0)}")
    assert(jAgg.getLong(1) == nRecords.toLong - expBad,
      s"ok rows: ${jAgg.getLong(1)} (malformed must drop, not kill)")
    val expScores = (0L until nRecords.toLong).filter(_ % 13 != 0)
      .map(_ % 97).sum
    assert(jAgg.getLong(2) == expScores, "parsed scores must sum exactly")
    println(f"JSONL lines=$nRecords parse=${tJsonl}%.1fs " +
      f"(${nRecords / tJsonl / 1000}%.0fk lines/s)")

    // ---- rung 9 (r13): robots.txt parse — one robots file per host
    // (the natural grain: a crawl fetches ONE robots per host), the
    // full group/agent fold per file ----
    val nHosts = nImages / 10
    val rid = col("id")
    val robotsTxt = concat(
      lit("# host robots\nUser-agent: *\nDisallow: /private"),
      pmod(rid, lit(7L)).cast("string"),
      lit("\nAllow: /private"), pmod(rid, lit(7L)).cast("string"),
      lit("/pub\nUser-agent: botA\nDisallow: /a"),
      pmod(rid, lit(5L)).cast("string"),
      lit("\nUser-agent: botB\nDisallow: /b\n"))
    val robotsDf = spark.range(nHosts).toDF("id")
      .select(rid.as("doc_id"),
        concat(lit("h"), rid.cast("string"), lit(".example")).as("host"),
        robotsTxt.as("robots_txt"))
      .repartition(64).cache()
    robotsDf.count()
    val (rAgg, tRobots) = time {
      graft.ops.Curation.parseRobotsTxt(robotsDf, col("host"),
          col("robots_txt"), agent = "botA")
        .agg(count(lit(1)).as("n"),
          sum(when(col("allow"), 1L).otherwise(0L)).as("allows"))
        .head()
    }
    // per host: * group (2 rules) + botA group (1) = 3; botB excluded
    assert(rAgg.getLong(0) == nHosts.toLong * 3, s"rules: ${rAgg.getLong(0)}")
    assert(rAgg.getLong(1) == nHosts.toLong, "exactly the one Allow per host")
    println(f"ROBOTS hosts=$nHosts rules=${nHosts * 3} " +
      f"parse=${tRobots}%.1fs (${nHosts / tRobots / 1000}%.0fk hosts/s)")

    // ---- rung 10 (r15): VP8L (lossless WebP) decode throughput —
    // the engine's own encoder rotates coding lanes (simple codes /
    // full canonical / +LZ77 / +color cache), and the decoded pixel
    // total plus a planted red-channel sum are closed-form ----
    locally {
      val nWebp = nImages
      val w10 = (lit(4L) + id % 21).cast("int")
      val n10 = (lit(4L) + id % 21) * (lit(3L) + id % 13)
      val per = lit(1L) + id % 11
      val px10 = transform(sequence(lit(0L), n10 - 1), i => {
        val j = pmod(i, per)
        val r = pmod(lit(11L) * id + lit(17L) * j, lit(256L))
        val g = pmod(lit(7L) * id + lit(13L) * j, lit(256L))
        val b = pmod(lit(13L) * id + lit(19L) * j, lit(256L))
        shiftleft(lit(255), 24).bitwiseOR(shiftleft(r.cast("int"), 16))
          .bitwiseOR(shiftleft(g.cast("int"), 8)).bitwiseOR(b.cast("int"))
      })
      val cfg = (id % 4 + when(id % 4 === 3, (lit(1L) + id % 10) * 16)
        .otherwise(lit(0L)) + pmod(id, lit(2L)) * 256).cast("int")
      val webps = spark.range(nWebp).toDF("id")
        .select(id,
          org.apache.spark.sql.GraftColumnBridge.column(
            graft.expressions.Vp8lEncode(
              org.apache.spark.sql.GraftColumnBridge.expression(
                // lane 0 needs ≤2 symbols/channel only for the SIMPLE
                // path; writeCode falls back per tree, so one formula
                // serves all four lanes here
                px10),
              org.apache.spark.sql.GraftColumnBridge.expression(w10),
              org.apache.spark.sql.GraftColumnBridge.expression(cfg)))
            .as("payload"),
          n10.as("expect_px"),
          aggregate(transform(sequence(lit(0L), n10 - 1),
            i => pmod(lit(11L) * id + lit(17L) * pmod(i, per), lit(256L))),
            lit(0L), (acc, v) => acc + v).as("expect_r"))
        .repartition(64).cache()
      webps.count()
      val wBytes = webps.agg(sum(length(col("payload")))).head().getLong(0)
      val expPx = webps.agg(sum(col("expect_px"))).head().getLong(0)
      val expR = webps.agg(sum(col("expect_r"))).head().getLong(0)
      val (agg10, tWebp) = time {
        webps.select(org.apache.spark.sql.GraftColumnBridge.column(
            graft.expressions.WebpPixelStats(
              org.apache.spark.sql.GraftColumnBridge.expression(col("payload"))))
            .as("st"))
          .agg(sum(element_at(col("st"), 1)).as("px"),
            sum(element_at(col("st"), 2)).as("r"),
            sum(when(col("st").isNull, 1L).otherwise(0L)).as("bad"))
          .head()
      }
      assert(agg10.getLong(2) == 0L, s"VP8L decode failures: ${agg10.getLong(2)}")
      assert(agg10.getLong(0) == expPx,
        s"VP8L pixels: ${agg10.getLong(0)} != $expPx")
      assert(agg10.getLong(1) == expR,
        s"VP8L red sum: ${agg10.getLong(1)} != $expR")
      println(f"VP8L n=$nWebp bytes=${wBytes / 1e6}%.1fMB decode=${tWebp}%.1fs " +
        f"(${nWebp / tWebp / 1000}%.0fk img/s, ${expPx / tWebp / 1e6}%.1fM px/s)")
    }

    // ---- rung 11 (r15): TIFF IFD-walk throughput — the tenth triage
    // family; width/page/unit sums are doc_id arithmetic ----
    locally {
      val nTiff = nImages
      val tiffs = spark.range(nTiff).toDF("id")
        .select(id,
          org.apache.spark.sql.GraftColumnBridge.column(
            graft.expressions.TiffSynth(
              org.apache.spark.sql.GraftColumnBridge.expression(id)))
            .as("payload"),
          (lit(16L) + id % 240).as("expect_w"),
          when(id % 4 === 0, 2L).otherwise(1L).as("expect_ifds"))
        .repartition(64).cache()
      tiffs.count()
      val tBytes = tiffs.agg(sum(length(col("payload")))).head().getLong(0)
      val expW = tiffs.agg(sum(col("expect_w"))).head().getLong(0)
      val expIfds = tiffs.agg(sum(col("expect_ifds"))).head().getLong(0)
      val (agg11, tTiff) = time {
        tiffs.select(org.apache.spark.sql.GraftColumnBridge.column(
            graft.expressions.TiffMeta(
              org.apache.spark.sql.GraftColumnBridge.expression(col("payload"))))
            .as("m"))
          .agg(sum(col("m.width")).as("w"),
            sum(col("m.n_ifds")).as("ifds"),
            sum(when(col("m.header_consistent"), 0L).otherwise(1L)).as("bad"))
          .head()
      }
      assert(agg11.getLong(2) == 0L, s"TIFF inconsistencies: ${agg11.getLong(2)}")
      assert(agg11.getLong(0) == expW, s"TIFF widths: ${agg11.getLong(0)} != $expW")
      assert(agg11.getLong(1) == expIfds,
        s"TIFF pages: ${agg11.getLong(1)} != $expIfds")
      println(f"TIFF n=$nTiff bytes=${tBytes / 1e6}%.1fMB walk=${tTiff}%.1fs " +
        f"(${nTiff / tTiff / 1000}%.0fk files/s)")
    }

    // ---- rung 12 (r15): FLAC frame-decode throughput — the twelfth
    // family's sample tier; rice/LPC subframes across every coding
    // lane, per-row stats asserted against the closed-form sums ----
    locally {
      val nFlac = nImages
      val flacs = spark.range(nFlac).toDF("id")
        .select(id,
          org.apache.spark.sql.GraftColumnBridge.column(
            graft.expressions.FlacAudioSynth(
              org.apache.spark.sql.GraftColumnBridge.expression(id)))
            .as("payload"),
          (lit(96L) + (id % 5) * 32).as("expect_n"))
        .repartition(64).cache()
      flacs.count()
      val fBytes = flacs.agg(sum(length(col("payload")))).head().getLong(0)
      val expN = flacs.agg(sum(col("expect_n"))).head().getLong(0)
      // closed-form total sample_sum (the synth formulas, re-derived
      // column-side): frame 0 constant + varying tail, per channel
      val mM = when(id % 3 === 0, 160L).otherwise(2000L)
      val chC = lit(1L) + id % 2
      val nN = lit(96L) + (id % 5) * 32
      val expSumCol = aggregate(
        sequence(lit(0L), chC * nN - 1), lit(0L).cast("long"), (acc, i) => {
          val j = pmod(i, nN)
          val c = ((i - j) / nN).cast("long")
          acc + when(j < 64, pmod(id * 13 + c * 29, mM) - (mM / 2).cast("long"))
            .otherwise(pmod((id + 1) * 31 + c * 17 + j * 7, mM) -
              (mM / 2).cast("long"))
        })
      val expSum = spark.range(nFlac).toDF("id")
        .agg(sum(expSumCol)).head().getLong(0)
      val (agg12, tFlac) = time {
        flacs.select(org.apache.spark.sql.GraftColumnBridge.column(
            graft.expressions.FlacAudioStats(
              org.apache.spark.sql.GraftColumnBridge.expression(col("payload"))))
            .as("st"))
          .agg(sum(col("st.n_samples")).as("ns"),
            sum(col("st.sample_sum")).as("ssum"),
            sum(when(col("st.decode_ok") && col("st.matches_streaminfo"), 0L)
              .otherwise(1L)).as("bad"),
            sum(when(col("st.crc_ok"), 0L).otherwise(1L)).as("crcbad"))
          .head()
      }
      assert(agg12.getLong(2) == 0L, s"FLAC decode failures: ${agg12.getLong(2)}")
      assert(agg12.getLong(0) == expN, s"FLAC samples: ${agg12.getLong(0)} != $expN")
      assert(agg12.getLong(1) == expSum,
        s"FLAC sample sum: ${agg12.getLong(1)} != $expSum")
      assert(agg12.getLong(3) == (0L until nFlac).count(_ % 20 == 5).toLong,
        s"FLAC crc lane count: ${agg12.getLong(3)}")
      println(f"FLAC n=$nFlac bytes=${fBytes / 1e6}%.1fMB decode=${tFlac}%.1fs " +
        f"(${nFlac / tFlac / 1000}%.0fk files/s, ${expN / tFlac / 1e6}%.1fM smp/s)")
    }

    // ---- rung 13 (r15): Ogg-FLAC unwrap + frame-decode throughput —
    // page walk, CRC verification, cross-page packet reassembly, then
    // the same rice/LPC decode; per-row stats asserted in aggregate ----
    locally {
      val nOgg = nImages
      val oggs = spark.range(nOgg).toDF("id")
        .select(id,
          org.apache.spark.sql.GraftColumnBridge.column(
            graft.expressions.OggFlacSynth(
              org.apache.spark.sql.GraftColumnBridge.expression(id)))
            .as("payload"),
          (lit(96L) + (id % 5) * 32).as("expect_n"))
        .repartition(64).cache()
      oggs.count()
      val oBytes = oggs.agg(sum(length(col("payload")))).head().getLong(0)
      val expN = oggs.agg(sum(col("expect_n"))).head().getLong(0)
      val (agg13, tOgg) = time {
        oggs.select(org.apache.spark.sql.GraftColumnBridge.column(
            graft.expressions.OggFlacStats(
              org.apache.spark.sql.GraftColumnBridge.expression(col("payload"))))
            .as("st"))
          .agg(sum(col("st.n_samples")).as("ns"),
            sum(when(col("st.decode_ok"), 0L).otherwise(1L)).as("bad"),
            sum(when(col("st.pages_crc_ok"), 0L).otherwise(1L)).as("pagecrc"),
            sum(col("st.n_pages")).as("pages"))
          .head()
      }
      assert(agg13.getLong(1) == 0L, s"OggFLAC decode failures: ${agg13.getLong(1)}")
      assert(agg13.getLong(0) == expN, s"OggFLAC samples: ${agg13.getLong(0)} != $expN")
      assert(agg13.getLong(2) == (0L until nOgg).count(_ % 20 == 7).toLong,
        s"OggFLAC page-crc lane count: ${agg13.getLong(2)}")
      println(f"OGG_FLAC n=$nOgg bytes=${oBytes / 1e6}%.1fMB " +
        f"pages=${agg13.getLong(3)} unwrap+decode=${tOgg}%.1fs " +
        f"(${nOgg / tOgg / 1000}%.0fk files/s, ${expN / tOgg / 1e6}%.1fM smp/s)")
      oggs.unpersist(false)
    }

    // ---- rung 14 (r15): animated-GIF frame-walk throughput — every
    // frame LZW-decoded; totals asserted against the lane closed forms ----
    locally {
      val nGif = nImages
      val gifs = spark.range(nGif).toDF("id")
        .select(id,
          org.apache.spark.sql.GraftColumnBridge.column(
            graft.expressions.GifAnimSynth(
              org.apache.spark.sql.GraftColumnBridge.expression(id)))
            .as("payload"),
          (lit(1L) + id % 4).as("expect_frames"))
        .repartition(64).cache()
      gifs.count()
      val gBytes = gifs.agg(sum(length(col("payload")))).head().getLong(0)
      val expFrames = gifs.agg(sum(col("expect_frames"))).head().getLong(0)
      val (agg14, tGif) = time {
        gifs.select(org.apache.spark.sql.GraftColumnBridge.column(
            graft.expressions.GifFrames(
              org.apache.spark.sql.GraftColumnBridge.expression(col("payload"))))
            .as("g"))
          .agg(sum(col("g.n_frames")).as("frames"),
            sum(when(col("g.gif_valid"), 0L).otherwise(1L)).as("bad"),
            sum(col("g.total_delay_ms")).as("delay"))
          .head()
      }
      assert(agg14.getLong(1) == 0L, s"GIF walk failures: ${agg14.getLong(1)}")
      assert(agg14.getLong(0) == expFrames,
        s"GIF frames: ${agg14.getLong(0)} != $expFrames")
      println(f"GIF_FRAMES n=$nGif bytes=${gBytes / 1e6}%.1fMB " +
        f"frames=$expFrames walk+decode=${tGif}%.1fs " +
        f"(${nGif / tGif / 1000}%.0fk files/s, ${expFrames / tGif / 1000}%.0fk frames/s)")
      gifs.unpersist(false)
    }

    // ---- rung 15 (r15): lake-format triage throughput — Avro varint
    // walk + flat-record decode, Parquet thrift-compact footer walk,
    // ORC protobuf walk with real zlib chunk inflation ----
    locally {
      val nLake = nImages
      val lake = spark.range(nLake).toDF("id")
        .select(id,
          org.apache.spark.sql.GraftColumnBridge.column(
            graft.expressions.AvroSynth(
              org.apache.spark.sql.GraftColumnBridge.expression(id))).as("ap"),
          org.apache.spark.sql.GraftColumnBridge.column(
            graft.expressions.ParquetSynth(
              org.apache.spark.sql.GraftColumnBridge.expression(id))).as("pp"),
          org.apache.spark.sql.GraftColumnBridge.column(
            graft.expressions.OrcSynth(
              org.apache.spark.sql.GraftColumnBridge.expression(id))).as("op"))
        .repartition(64).cache()
      lake.count()
      val (agg15, tLake) = time {
        lake.select(
          org.apache.spark.sql.GraftColumnBridge.column(
            graft.expressions.AvroRecordStats(
              org.apache.spark.sql.GraftColumnBridge.expression(col("ap"))))
            .as("a"),
          org.apache.spark.sql.GraftColumnBridge.column(
            graft.expressions.ParquetMeta(
              org.apache.spark.sql.GraftColumnBridge.expression(col("pp"))))
            .as("p"),
          org.apache.spark.sql.GraftColumnBridge.column(
            graft.expressions.OrcMeta(
              org.apache.spark.sql.GraftColumnBridge.expression(col("op"))))
            .as("o"))
          .agg(
            sum(when(col("a.decode_ok"), col("a.n_records"))).as("arecs"),
            sum(col("p.num_rows")).as("prows"),
            sum(when(col("o.footer_decoded"), col("o.num_rows"))).as("orows"),
            sum(when(col("p.parquet_valid") && col("o.orc_valid") &&
              col("a.avro_valid"), 0L).otherwise(1L)).as("bad"))
          .head()
      }
      assert(agg15.getLong(3) == 0L, s"lake triage failures: ${agg15.getLong(3)}")
      val expPRows = (0L until nLake).map(d => 10 + d % 50).sum
      assert(agg15.getLong(1) == expPRows,
        s"parquet rows: ${agg15.getLong(1)} != $expPRows")
      println(f"LAKE n=${3L * nLake} files triage=${tLake}%.1fs " +
        f"(${3L * nLake / tLake / 1000}%.0fk files/s; avro recs=${agg15.getLong(0)} " +
        f"parquet rows=${agg15.getLong(1)} orc rows=${agg15.getLong(2)})")
      lake.unpersist(false)
    }

    // ---- rung 16 (r15): wire-framing + favicon + page-decode
    // throughput — zstd frame walk with XXH64 verification, ICO
    // decode through zlib/unfilter + DIB strides, parquet data-page
    // walk with real per-page decompression ----
    locally {
      def g(e: org.apache.spark.sql.catalyst.expressions.Expression) =
        org.apache.spark.sql.GraftColumnBridge.column(e)
      def x(c: org.apache.spark.sql.Column) =
        org.apache.spark.sql.GraftColumnBridge.expression(c)
      val nW = nImages
      val wire = spark.range(nW).toDF("id")
        .select(id,
          g(graft.expressions.ZstdMetaSynth(x(id))).as("zp"),
          g(graft.expressions.IcoSynth(x(id))).as("ip"),
          g(graft.expressions.ParquetFileSynth(x(id))).as("qp"))
        .repartition(64).cache()
      wire.count()
      val (agg16, tWire) = time {
        wire.select(
          g(graft.expressions.ZstdMeta(x(col("zp")))).as("z"),
          g(graft.expressions.IcoMeta(x(col("ip")))).as("i"),
          g(graft.expressions.ParquetPages(x(col("qp")))).as("q"))
          .agg(
            sum(col("z.uncompressed_bytes")).as("zbytes"),
            sum(when(col("z.checksum_ok"), 0L).otherwise(1L)).as("zbad"),
            sum(col("i.pixel_sum")).as("ipx"),
            sum(col("q.int64_sum")).as("qsum"),
            sum(when(col("z.zstd_valid") && col("i.ico_valid") &&
              col("q.pages_valid"), 0L).otherwise(1L)).as("bad"))
          .head()
      }
      assert(agg16.getLong(4) == 0L, s"wire triage failures: ${agg16.getLong(4)}")
      val expZBad = (0L until nW).count(_ % 20 == 9).toLong
      assert(agg16.getLong(1) == expZBad,
        s"zstd flipped-checksum lane: ${agg16.getLong(1)} != $expZBad")
      val expQSum = (0L until nW).map { d =>
        (0L until (5 + d % 11)).map(j => (3 * d + j) % 1000).sum
      }.sum
      assert(agg16.getLong(3) == expQSum,
        s"parquet page sums: ${agg16.getLong(3)} != $expQSum")
      println(f"WIRE n=${3L * nW} files decode=${tWire}%.1fs " +
        f"(${3L * nW / tWire / 1000}%.0fk files/s; zstd bytes=${agg16.getLong(0)} " +
        f"ico px=${agg16.getLong(2)} parquet sum=${agg16.getLong(3)})")
      wire.unpersist(false)
    }

    // ---- rung 17 (r15): transcript + cleaning + markup triage
    // throughput — SRT/WebVTT cue parse, mojibake repair (sloppy
    // cp1252 inverse), SVG root/element scan, AVIF FullBox-meta
    // walk, RFC 2047 mail-header decode ----
    locally {
      def g(e: org.apache.spark.sql.catalyst.expressions.Expression) =
        org.apache.spark.sql.GraftColumnBridge.column(e)
      def x(c: org.apache.spark.sql.Column) =
        org.apache.spark.sql.GraftColumnBridge.expression(c)
      val nT = nImages
      val fake = concat(lit("synthetic doc body text enough for the "),
        lit("forty-char prefixes and sixty-char splices "), id)
      val tri = spark.range(nT).toDF("id")
        .select(id,
          g(graft.expressions.SubtitleSynth(x(id), x(fake))).as("sub"),
          g(graft.expressions.MojibakeSynth(x(id), x(fake))).as("moj"),
          g(graft.expressions.SvgSynth(x(id), x(fake))).as("svg"),
          g(graft.expressions.AvifSynth(x(id))).as("av"),
          g(graft.expressions.MimeSynth(x(id), x(fake))).as("eml"))
        .repartition(64).cache()
      tri.count()
      val (agg17, tTri) = time {
        tri.select(
          g(graft.expressions.SubtitleCues(x(col("sub")))).as("s"),
          g(graft.expressions.MojibakeRepair(x(col("moj")))).as("m"),
          g(graft.expressions.SvgMeta(x(col("svg")))).as("v"),
          g(graft.expressions.AvifMeta(x(col("av")))).as("a"),
          g(graft.expressions.MailHeaders(x(col("eml")))).as("h"))
          .agg(
            sum(size(col("s.cues"))).as("cues"),
            sum(col("m.depth")).as("depth"),
            sum(col("v.n_shapes")).as("shapes"),
            sum(col("a.width")).as("aw"),
            sum(when(col("s").isNull || col("m").isNull ||
              col("v").isNull || col("a").isNull ||
              col("h.from_addr").isNull, 1L).otherwise(0L)).as("bad"))
          .head()
      }
      assert(agg17.getLong(4) == 0L, s"triage failures: ${agg17.getLong(4)}")
      val expCues = (0L until nT).map(d => 2 + d % 3).sum
      assert(agg17.getLong(0) == expCues,
        s"cue count: ${agg17.getLong(0)} != $expCues")
      val expDepth = (0L until nT).map(d => (d % 5) match {
        case 0 | 1 => 0L; case 3 => 2L; case _ => 1L
      }).sum
      assert(agg17.getLong(1) == expDepth,
        s"repair depth: ${agg17.getLong(1)} != $expDepth")
      val expShapes = (0L until nT).map(d =>
        d % 4 + (d + 1) % 3 + (if (d % 2 == 0) 1 else 0)).sum
      assert(agg17.getLong(2) == expShapes,
        s"svg shapes: ${agg17.getLong(2)} != $expShapes")
      val expAw = (0L until nT).map(d => 64 + d % 512).sum
      assert(agg17.getLong(3) == expAw,
        s"avif widths: ${agg17.getLong(3)} != $expAw")
      println(f"TRI n=${5L * nT} files decode=${tTri}%.1fs " +
        f"(${5L * nT / tTri / 1000}%.0fk files/s; cues=${agg17.getLong(0)} " +
        f"depth=${agg17.getLong(1)} shapes=${agg17.getLong(2)})")
      tri.unpersist(false)
    }

    println("INGEST_SCALE_SMOKE_OK")
    spark.stop()
  }
}
