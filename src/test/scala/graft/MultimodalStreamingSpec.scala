package graft

import graft.multimodal.{MediaRecord, Multimodal}
import org.apache.spark.sql.functions._

class MultimodalStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("multimodal: binary wrap + partition-local decode produce typed " +
    "features with correct hash and byte count") {
    val docs = Seq((0L, "hello world"), (1L, "tiny"), (2L, "video bytes"))
      .toDF("doc_id", "text")
    val media = Multimodal.toBinary(docs).as[MediaRecord]
    val feats = Multimodal.extractFeatures(media).collect()
      .sortBy(_.doc_id)
    assert(feats.map(_.mime).toSeq ==
      Seq("image/png", "audio/wav", "video/mp4"))
    assert(feats(0).n_bytes == 11L)
    // md5("hello world")
    assert(feats(0).content_hash == "5eb63bbbe01eeed093cb22bb8f5acdc3")
    assert(feats(0).width == 11 % 640 && feats(0).height == 11 % 480)
  }

  test("multimodal: realDecode decodes a real PNG via javax.imageio, " +
    "end-to-end through the partition-local batch stage") {
    // paint a 7x5 RGB image and encode it with the JDK's own PNG writer
    val img = new java.awt.image.BufferedImage(7, 5,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 7).foreach(x => (0 until 5).foreach(y =>
      img.setRGB(x, y, (x * 40) << 16 | (y * 50) << 8)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    // direct decode
    assert(Multimodal.realDecode("image/png", png) == (7, 5, 0.0))
    // through the Dataset mapPartitions stage with the real decoder
    val media = Seq(MediaRecord(42L, "image/png", png)).toDS()
    val f = Multimodal.extractFeatures(media, Multimodal.realImageDecode)
      .collect().head
    assert(f.width == 7 && f.height == 5 && f.n_bytes == png.length)
    // PNG bytes are not silently accepted as an MP4 container
    intercept[IllegalArgumentException](
      Multimodal.realDecode("video/mp4", png))
    intercept[IllegalArgumentException](
      Multimodal.realDecode("image/png", Array[Byte](1, 2, 3)))
  }

  test("multimodal: realDecode reads MP4 container metadata (width, " +
    "height, duration) from synthesized moov/mvhd/tkhd boxes, " +
    "end-to-end through the batch stage") {
    // build a minimal ISO-BMFF file with the JDK alone: ftyp, then
    // moov(mvhd v0 + trak(tkhd v0)) — 640x360 at 16.16 fixed point,
    // duration 2500 ticks on a 1000-tick/s timescale = 2.5 s
    def box(typ: String, content: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + content.length)
      bb.putInt(8 + content.length)
      bb.put(typ.getBytes("US-ASCII")).put(content)
      bb.array()
    }
    val mvhd = {
      val c = java.nio.ByteBuffer.allocate(100) // v0 mvhd content
      c.position(4 + 8) // version+flags, creation, modification
      c.putInt(1000)    // timescale
      c.putInt(2500)    // duration
      box("mvhd", c.array())
    }
    val tkhd = {
      val c = java.nio.ByteBuffer.allocate(84) // v0 tkhd content
      c.position(4 + 20 + 52) // version+flags, times/ids, layer..matrix
      c.putInt(640 << 16)     // width, 16.16 fixed point
      c.putInt(360 << 16)     // height
      box("tkhd", c.array())
    }
    val mp4 = box("ftyp", "isomiso2".getBytes("US-ASCII")) ++
      box("moov", mvhd ++ box("trak", tkhd))
    // direct parse
    assert(Multimodal.realDecode("video/mp4", mp4) == (640, 360, 2.5))
    // through the Dataset mapPartitions stage with the real decoder
    val media = Seq(MediaRecord(9L, "video/mp4", mp4)).toDS()
    val f = Multimodal.extractFeatures(media,
        p => Multimodal.realDecode("video/mp4", p))
      .collect().head
    assert(f.width == 640 && f.height == 360 && f.duration_s == 2.5 &&
      f.n_bytes == mp4.length)
    // an audio-only container (no visual trak) reports 0x0 + duration
    val m4a = box("ftyp", "M4A isom".getBytes("US-ASCII")) ++
      box("moov", mvhd)
    assert(Multimodal.realDecode("video/mp4", m4a) == (0, 0, 2.5))
    // truncated/corrupt boxes fail loudly
    intercept[IllegalArgumentException](
      Multimodal.realDecode("video/mp4", mp4.take(mp4.length - 4)))
    // a header-only mvhd must fail loudly, not read the next sibling
    // box's bytes as timescale/duration
    val shortMvhd = box("ftyp", "isomiso2".getBytes("US-ASCII")) ++
      box("moov", box("mvhd", Array.emptyByteArray) ++ box("trak", tkhd))
    intercept[IllegalArgumentException](
      Multimodal.realDecode("video/mp4", shortMvhd))
  }

  test("multimodal: realDecode parses a real WAV via javax.sound.sampled " +
    "(channels, sample rate, duration), end-to-end through the batch stage") {
    // synthesize 0.25 s of mono 16-bit PCM at 8 kHz and wrap it in a
    // RIFF/WAVE container with the JDK's own writer
    val rate = 8000f
    val frames = 2000 // 2000 frames / 8000 Hz = 0.25 s
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val pcm = new Array[Byte](frames * 2)
    (0 until frames).foreach { i =>
      val s = (math.sin(i * 0.1) * 3000).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    // direct decode: (channels, sample rate, duration)
    assert(Multimodal.realDecode("audio/wav", wav) == (1, 8000, 0.25))
    // through the Dataset mapPartitions stage with the real decoder
    val media = Seq(MediaRecord(7L, "audio/wav", wav)).toDS()
    val f = Multimodal.extractFeatures(media,
        p => Multimodal.realDecode("audio/wav", p))
      .collect().head
    assert(f.width == 1 && f.height == 8000 && f.duration_s == 0.25 &&
      f.n_bytes == wav.length)
    // garbage bytes are not silently accepted as audio
    intercept[Exception](
      Multimodal.realDecode("audio/wav", Array[Byte](1, 2, 3, 4)))
  }

  test("multimodal: dHash is an encoding-invariant perceptual hash — " +
      "same pixels hash equal across PNG/BMP, a local perturbation " +
      "moves few bits, distinct noise images differ") {
    import javax.imageio.ImageIO
    val png = Multimodal.synthImage("seed-a")
    // identical call → identical bytes → identical hash (determinism)
    assert(Multimodal.synthImage("seed-a").toSeq == png.toSeq)
    val h = Multimodal.dHash(png)
    // re-encode the SAME pixels as BMP: content hash (md5) changes,
    // perceptual hash doesn't — the property q25-style byte dedup lacks
    val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
    val bmpOut = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(img, "bmp", bmpOut))
    val bmp = bmpOut.toByteArray
    assert(bmp.toSeq != png.toSeq)
    assert(Multimodal.dHash(bmp) == h)
    // a small local perturbation (one brightened cell) flips few of
    // the 64 gradient-sign bits — near-dups stay Hamming-close
    val pert = ImageIO.read(new java.io.ByteArrayInputStream(png))
    pert.setRGB(3, 3, 0xffffff)
    val pertOut = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(pert, "png", pertOut))
    val hp = Multimodal.dHash(pertOut.toByteArray)
    val hamming = java.lang.Long.bitCount(h ^ hp)
    assert(hamming <= 8, s"perturbation moved $hamming of 64 bits")
    // distinct seeds → noise-independent pixels → different hashes
    assert(Multimodal.dHash(Multimodal.synthImage("seed-b")) != h)
    // garbage bytes fail loudly, matching realDecode
    intercept[IllegalArgumentException](
      Multimodal.dHash(Array[Byte](9, 9, 9)))
  }

  test("multimodal: resizeImage is a real bilinear thumbnail pass — " +
      "bounded dims, aspect preserved, never upscaled, deterministic, " +
      "and the distributed thumbnails() pass carries it per partition") {
    import javax.imageio.ImageIO
    // a 32×16 canvas from two stitched 16×16 synth tiles
    val a = ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.synthImage("tile-a")))
    val wide = new java.awt.image.BufferedImage(32, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = wide.createGraphics()
    g.drawImage(a, 0, 0, null); g.drawImage(a, 16, 0, null); g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(wide, "png", bos)
    val png = bos.toByteArray
    val thumb = Multimodal.resizeImage(png, 8)
    val timg = ImageIO.read(new java.io.ByteArrayInputStream(thumb))
    assert(timg.getWidth == 8 && timg.getHeight == 4,
      "longer edge bounded to 8, 2:1 aspect preserved")
    // determinism: same bytes in → same bytes out
    assert(Multimodal.resizeImage(png, 8).toSeq == thumb.toSeq)
    // never upscaled: a bound above the image is the identity size
    val same = ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.resizeImage(png, 100)))
    assert(same.getWidth == 32 && same.getHeight == 16)
    // garbage fails loudly
    intercept[IllegalArgumentException](
      Multimodal.resizeImage(Array[Byte](1, 2, 3), 8))
    // the distributed pass: per-row thumbnails with recorded dims
    import spark.implicits._
    val media = Seq(
      MediaRecord(1L, "image/png", png),
      MediaRecord(2L, "image/png", Multimodal.synthImage("tile-b"))).toDS()
    val out = Multimodal.thumbnails(media, 8).orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(2), r.getInt(3))).toSeq ==
      Seq((1L, 8, 4), (2L, 8, 8)))
    // the emitted bytes decode back to the recorded dims
    val t1 = ImageIO.read(new java.io.ByteArrayInputStream(
      out(0).getAs[Array[Byte]]("thumb")))
    assert(t1.getWidth == 8 && t1.getHeight == 4)
  }

  test("multimodal: audioFingerprint is a container-invariant energy " +
      "hash — same PCM fingerprints equal across WAV/AIFF, a local " +
      "perturbation moves few bits, distinct noise differs") {
    import javax.sound.sampled.{AudioFileFormat, AudioSystem}
    val wav = Multimodal.synthWav("seed-a")
    // determinism: same seed → byte-identical WAV
    assert(Multimodal.synthWav("seed-a").toSeq == wav.toSeq)
    val h = Multimodal.audioFingerprint(wav)
    // re-encode the SAME PCM as AIFF (big-endian container): byte hash
    // changes, energy fingerprint doesn't
    val ais = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val aiffOut = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.AIFF, aiffOut)
    val aiff = aiffOut.toByteArray
    assert(aiff.toSeq != wav.toSeq)
    assert(Multimodal.audioFingerprint(aiff) == h,
      "container re-encode moved the fingerprint")
    // zero one window's worth of samples in the PCM body: a local
    // edit flips few of the 64 contour bits (near-dups Hamming-close).
    // WAV data chunk starts at byte 44 for this canonical header.
    val pert = wav.clone()
    java.util.Arrays.fill(pert, 100, 164, 0.toByte)
    val hp = Multimodal.audioFingerprint(pert)
    val hamming = java.lang.Long.bitCount(h ^ hp)
    assert(hamming >= 1 && hamming <= 8,
      s"local perturbation moved $hamming of 64 bits")
    // distinct seeds → independent PCM → different fingerprints
    assert(Multimodal.audioFingerprint(Multimodal.synthWav("seed-b"))
      != h)
  }

  test("multimodal: frame sample plan fans out only video rows") {
    val docs = Seq((0L, "x" * 250), (2L, "y" * 250)).toDF("doc_id", "text")
    val media = Multimodal.toBinary(docs) // 0 → image, 2 → video
    val plan = Multimodal.frameSamplePlan(media, 100).collect()
    assert(plan.forall(_.getLong(0) == 2L))
    // 250 bytes / 100 → frames at offsets 0, 100, 200
    assert(plan.map(_.getInt(1)).sorted.toSeq == Seq(0, 1, 2))
  }

  test("mjpeg mp4: mux → demux round-trips every frame byte-exactly, " +
    "in order, across single- and multi-chunk layouts, and the " +
    "container metadata parse reads the same file") {
    val frames = (0 until 5).map(i => Multimodal.synthFrameJpeg(s"f$i"))
    // every frame is itself a decodable baseline JPEG (SOI marker)
    frames.foreach { f =>
      assert((f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8)
      assert(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f)) != null)
    }
    for (spc <- Seq(Int.MaxValue, 2, 1)) {
      val mp4 = Multimodal.synthMjpegMp4(frames, 16, 16, fps = 25,
        samplesPerChunk = spc)
      val back = Multimodal.videoFrames(mp4)
      assert(back.length == 5, s"spc=$spc")
      back.zip(frames).foreach { case (b, f) =>
        assert(java.util.Arrays.equals(b, f), s"spc=$spc")
      }
      // the same bytes satisfy the metadata path: 16×16, 5 frames at
      // 25 fps (timescale fps*1000, exact 1000-tick deltas) = 0.2 s
      assert(Multimodal.parseMp4Meta(mp4) == (16, 16, 0.2), s"spc=$spc")
    }
    // rates that don't divide 1000 (24/30/60 fps) must not drift: the
    // timescale derives from fps, so 5 frames at 30 fps is exactly 1/6 s
    val m30 = Multimodal.synthMjpegMp4(frames, 16, 16, fps = 30)
    val (_, _, d30) = Multimodal.parseMp4Meta(m30)
    assert(math.abs(d30 - 5.0 / 30.0) < 1e-12, s"got $d30")
    assert(Multimodal.videoFrames(m30).length == 5)
  }

  test("mjpeg mp4: non-JPEG codecs are a loud boundary, not a garbage " +
    "decode; corrupt sample tables fail loudly") {
    val frames = Seq(Multimodal.synthFrameJpeg("a"))
    val mp4 = Multimodal.synthMjpegMp4(frames, 16, 16)
    // patch the stsd sample-entry fourcc 'jpeg' → 'avc1' (H.264): the
    // demuxer must refuse — there is no JVM decoder for those frames
    def indexOf(hay: Array[Byte], needle: Array[Byte]): Int =
      hay.indices.indexWhere(i => i + needle.length <= hay.length &&
        needle.indices.forall(j => hay(i + j) == needle(j)))
    val avc1 = mp4.clone()
    val at = indexOf(avc1, "jpeg".getBytes("US-ASCII"))
    assert(at > 0, "fixture: stsd entry fourcc present")
    System.arraycopy("avc1".getBytes("US-ASCII"), 0, avc1, at, 4)
    val e = intercept[UnsupportedOperationException](
      Multimodal.videoFrames(avc1))
    assert(e.getMessage.contains("avc1"))
    // truncating the file under the mdat makes the sample range overrun
    intercept[IllegalArgumentException](
      Multimodal.videoFrames(java.util.Arrays.copyOfRange(mp4, 0, 40)))
    // garbage is not a video
    intercept[IllegalArgumentException](
      Multimodal.videoFrames(Array[Byte](1, 2, 3, 4)))
  }

  test("mjpeg mp4: planted duplicate frames survive the encode → demux " +
    "→ JPEG-decode → dHash round trip; distinct frames do not collide") {
    val seeds = Seq("s0", "s1", "s0", "s2") // frames 0 and 2 identical
    val mp4 = Multimodal.synthMjpegMp4(
      seeds.map(Multimodal.synthFrameJpeg), 16, 16)
    val hashes = Multimodal.videoFrames(mp4).map(Multimodal.dHash)
    assert(hashes(0) == hashes(2))
    assert(Set(hashes(0), hashes(1), hashes(3)).size == 3)
  }

  test("stream-stream watermarked self-join equals the batch self-join") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.StreamingHourly
      .streamStreamPairs(spark, dir).collect()
    val ev = graft.io.Sources.table(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        date_trunc("hour", col("ts")).as("hour"))
    val batch = ev.filter(col("user_id") < 5).as("a")
      .join(ev.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.hour") === col("b.hour") &&
          col("a.event_id") < col("b.event_id"))
      .select(col("a.user_id"), col("a.hour"),
        col("a.event_id").as("a_id"), col("b.event_id").as("b_id"))
      .orderBy("user_id", "hour", "a_id", "b_id").collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("append-mode session windows: each session is emitted exactly " +
      "once when the watermark passes its close, never re-emitted, and " +
      "closed sessions leave the state store") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val src = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = src.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("s"), col("w.end").as("e"),
        col("n_events"))
    val q = sessions.writeStream.format("memory")
      .queryName("append_sessions").outputMode("append").start()
    def emitted(): Seq[(Long, String, String, Long)] =
      spark.table("append_sessions")
        .orderBy("user_id", "s")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3))).toSeq
    try {
      // two user-1 events, 10 min apart → one session [10:00, 10:40)
      src.addData((1L, ts("2026-01-01 10:00:00")),
        (1L, ts("2026-01-01 10:10:00")))
      q.processAllAvailable()
      // watermark = 10:10 − 10 min = 10:00 < session end → withheld
      assert(emitted().isEmpty,
        "append mode must not emit a session the watermark hasn't closed")
      // a later event advances the watermark to 11:50 > 10:40 → the
      // user-1 session must now be emitted, exactly once
      src.addData((2L, ts("2026-01-01 12:00:00")))
      q.processAllAvailable()
      assert(emitted() ==
        Seq((1L, "2026-01-01 10:00:00.0", "2026-01-01 10:40:00.0", 2L)))
      // advance again: user-2's session closes and emits, user-1's is
      // NOT re-emitted (exactly-once), user-3's stays open in state
      src.addData((3L, ts("2026-01-01 14:00:00")))
      q.processAllAvailable()
      assert(emitted() == Seq(
        (1L, "2026-01-01 10:00:00.0", "2026-01-01 10:40:00.0", 2L),
        (2L, "2026-01-01 12:00:00.0", "2026-01-01 12:30:00.0", 1L)))
      // eviction: the state store holds only the OPEN session (user 3),
      // not every session ever seen — the property that bounds state on
      // an unbounded deployment (q100's documented COMPLETE-mode
      // tradeoff, now spec'd on the append path)
      val stateRows = q.recentProgress.reverse
        .flatMap(p => p.stateOperators.headOption)
        .headOption.map(_.numRowsTotal)
      assert(stateRows.contains(1L),
        s"state should hold exactly the one open session, got $stateRows")
    } finally {
      q.stop()
      spark.catalog.dropTempView("append_sessions")
    }
  }

  test("streaming hourly agg equals the batch aggregation") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.StreamingHourly
      .hourlyAgg(spark, dir).collect()
    val batch = graft.queries.CoreQueries.q24HourlyAgg(spark, dir).collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getAs[java.sql.Timestamp]("hour_ts") ==
        b.getAs[java.sql.Timestamp]("hour_ts"))
      assert(s.getAs[Long]("n_events") == b.getAs[Long]("n_events"))
      assert(math.abs(s.getAs[Double]("sum_value") -
        b.getAs[Double]("sum_value")) < 1e-9)
    }
  }

  test("flatMapGroupsWithState running aggregate: state persists across " +
      "micro-batch boundaries and the final value equals the batch agg") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.streaming.StreamingHourly
      .customStateRunning(spark, dir).collect()
    // the four time-ranged input files replay as four micro-batches;
    // an always-active user's key must have been updated more than
    // once — otherwise the "custom state" never crossed a batch
    // boundary and the test proves nothing
    val maxUpdates = got.map(_.getAs[Int]("n_updates")).max
    assert(maxUpdates > 1,
      s"no key was updated in more than one micro-batch ($maxUpdates)")
    val batch = graft.io.Sources.table(spark, dir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(coalesce(round(value * 100), 0) AS BIGINT)"))
          .as("cents"))
      .orderBy("user_id").collect()
    assert(got.length == batch.length)
    got.zip(batch).foreach { case (g, b) =>
      assert(g.getAs[Long]("user_id") == b.getAs[Long]("user_id"))
      assert(g.getAs[Long]("n_events") == b.getAs[Long]("n_events"))
      assert(g.getAs[Long]("cents") == b.getAs[Long]("cents"))
    }
  }
}
