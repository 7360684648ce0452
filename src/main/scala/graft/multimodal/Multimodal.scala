package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media object: opaque bytes + typed metadata. At 100 TB the payload
  * column stays opaque `binary` in parquet (never parsed by Catalyst);
  * only the decode stage touches the bytes, partition-local. */
case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])

/** Decoded per-object features. */
case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
                         content_hash: String, width: Int, height: Int,
                         duration_s: Double)

/** Multimodal-column plumbing for a training-data pipeline: treat
  * image/audio/video as opaque `binary` columns with typed metadata, and
  * run decode / feature-extraction as a partition-local batch stage.
  *
  * Decoding: all three modalities extract real metadata pure-JVM —
  * images through `javax.imageio`, audio through `javax.sound.sampled`,
  * video through the ISO-BMFF container parse ([[realDecode]] /
  * [[parseMp4Meta]]). [[fakeDecode]] remains only for the harness
  * corpus, whose payloads are utf-8 text bytes, not real media. The
  * Spark-side shape is identical either way and is what matters at
  * scale:
  *
  *   - schema: `binary` payload + string mime + typed feature columns;
  *   - execution: `Dataset[MediaRecord].mapPartitions` — the Scala
  *     analog of PySpark's `mapInPandas` batch UDF: one iterator per
  *     partition, so a decoder can amortize model/codec init across the
  *     whole batch instead of paying it per row;
  *   - partitioning: payloads never shuffle — features are derived in
  *     the same stage that scans the parquet, and only the (small)
  *     feature rows flow downstream.
  */
object Multimodal {

  // ImageIO's default stream cache spools every encode/decode through a
  // TEMP FILE — at corpus scale that is one disk round-trip per image
  // on the hot path (measured: q163's 50k-image pass superlinear at
  // sf1 until disabled). In-memory cache is strictly better for the
  // byte-array payloads this module handles. JVM-wide, set once.
  javax.imageio.ImageIO.setUseCache(false)

  /** Wrap a text corpus as binary media records (the harness has no real
    * image table; utf-8 bytes stand in for an encoded payload). */
  def toBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Deterministic fake decode: pseudo-metadata from the byte length.
    * Stands in for [[realDecode]] so tests exercise the full path. */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Double) = {
    val n = payload.length
    (n % 640, n % 480, (n % 3000) / 10.0)
  }

  /** The production decode hook, all pure-JVM:
    *
    *   - images via `javax.imageio` (PNG/JPEG/GIF/BMP ship with the
    *     JDK): (width, height, duration = 0);
    *   - audio via `javax.sound.sampled` (WAV/RIFF, AIFF, AU ship with
    *     the JDK): (channels, sample_rate_hz, duration_s) — the two int
    *     feature slots carry channel count and sample rate, documented
    *     on [[MediaFeatures]]'s producers;
    *   - video via [[parseMp4Meta]]: the MP4/ISO-BMFF CONTAINER carries
    *     presentation width/height and duration as plain big-endian
    *     fields (`moov/mvhd`, `moov/trak/tkhd`) — the same fields
    *     ffprobe reports, no codec required. Decoding FRAMES would need
    *     a codec this environment does not ship (ffmpeg/JNI in a real
    *     deployment, same mapPartitions shape); metadata does not.
    *
    * Anything undecodable fails loudly rather than fake a value. */
  def realDecode(mime: String, payload: Array[Byte]): (Int, Int, Double) =
    mime match {
      case m if m.startsWith("image/") =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null)
          throw new IllegalArgumentException(
            s"undecodable $mime payload (${payload.length} bytes)")
        (img.getWidth, img.getHeight, 0.0)
      case m if m.startsWith("audio/") =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          val frames = in.getFrameLength
          val dur =
            if (fmt.getFrameRate > 0 && frames >= 0)
              frames / fmt.getFrameRate.toDouble
            else 0.0
          (fmt.getChannels, fmt.getSampleRate.toInt, dur)
        } finally in.close()
      case m if m.startsWith("video/") => parseMp4Meta(payload)
      case other =>
        throw new UnsupportedOperationException(
          s"no $other decoder: images decode via javax.imageio, audio " +
            "via javax.sound.sampled, video metadata via the ISO-BMFF " +
            "container parse")
    }

  /** Minimal ISO BMFF (MP4/QuickTime/MOV) metadata parse — container
    * structure only, no codec. The format is a sequence of boxes, each
    * `[uint32 size][4-char type][payload]` big-endian (size 1 = 64-bit
    * size follows; size 0 = box runs to end of enclosure). Movie
    * duration lives in `moov/mvhd` (duration/timescale seconds) and the
    * presentation size in `moov/trak/tkhd` as 16.16 fixed-point —
    * plain integer fields, which is why ffprobe can report them without
    * touching a single coded frame, and why this engine can too.
    * Returns (width, height, duration_s); an MP4 with no visual track
    * (e.g. .m4a audio) yields width = height = 0. Garbage bytes fail
    * loudly (no `moov`), matching the image/audio decoders. */
  def parseMp4Meta(payload: Array[Byte]): (Int, Int, Double) = {
    val bb = java.nio.ByteBuffer.wrap(payload) // big-endian by default
    def u32(off: Int): Long = bb.getInt(off) & 0xffffffffL
    def find(from: Int, to: Int, typ: String): Option[(Int, Int)] =
      findBox(payload, from, to, typ)
    // every fixed-offset field read below is bounds-checked against its
    // OWN box first — a short mvhd/tkhd must fail loudly, not silently
    // read the next sibling box's bytes as timescale or width
    def requireContent(c: Int, end: Int, need: Int, box: String): Unit =
      if (end - c < need)
        throw new IllegalArgumentException(
          s"corrupt mp4: $box content ${end - c} bytes, need $need")
    val (moovC, moovEnd) = find(0, payload.length, "moov").getOrElse(
      throw new IllegalArgumentException(
        s"undecodable video payload (${payload.length} bytes): no moov box"))
    val (mvhdC, mvhdEnd) = find(moovC, moovEnd, "mvhd").getOrElse(
      throw new IllegalArgumentException("corrupt mp4: moov without mvhd"))
    // mvhd: version(1) flags(3), then v0: creation(4) modification(4)
    // timescale(4) duration(4); v1 widens the times to 8 bytes
    requireContent(mvhdC, mvhdEnd, 1, "mvhd")
    val mvhdV1 = (payload(mvhdC) & 0xff) == 1
    requireContent(mvhdC, mvhdEnd, if (mvhdV1) 32 else 20, "mvhd")
    val (timescale, duration) =
      if (mvhdV1)
        (u32(mvhdC + 4 + 16), bb.getLong(mvhdC + 4 + 20).toDouble)
      else (u32(mvhdC + 4 + 8), u32(mvhdC + 4 + 12).toDouble)
    val durS = if (timescale > 0) duration / timescale.toDouble else 0.0
    // first trak whose tkhd has a nonzero width = the visual track
    // (audio/hint tracks carry 0×0); tkhd after version+flags: v0 has
    // 20 bytes of times/ids, v1 32, then 52 bytes (reserved, layer,
    // volume, matrix) precede the 16.16 fixed-point width and height
    var (w, h) = (0, 0)
    var from = moovC
    while (w == 0 && from < moovEnd) {
      find(from, moovEnd, "trak") match {
        case None => from = moovEnd
        case Some((trakC, trakEnd)) =>
          find(trakC, trakEnd, "tkhd").foreach { case (tk, tkEnd) =>
            requireContent(tk, tkEnd, 1, "tkhd")
            val v1 = (payload(tk) & 0xff) == 1
            requireContent(tk, tkEnd, if (v1) 96 else 84, "tkhd")
            val whOff = tk + 4 + (if (v1) 32 else 20) + 52
            val tw = (u32(whOff) >> 16).toInt
            val th = (u32(whOff + 4) >> 16).toInt
            if (tw > 0) { w = tw; h = th }
          }
          from = trakEnd
      }
    }
    (w, h, durS)
  }

  /** First box of type `typ` in `payload[from, to)` →
    * (contentStart, boxEnd). ISO-BMFF box grammar: `[uint32 size]
    * [4cc type][payload]` big-endian; size 1 = a 64-bit size follows
    * the type; size 0 = the box runs to the end of its enclosure.
    * Shared by the metadata parse ([[parseMp4Meta]]) and the sample
    * -table walk ([[videoFrames]]). Malformed sizes fail loudly. */
  private def findBox(payload: Array[Byte], from: Int, to: Int,
                      typ: String): Option[(Int, Int)] = {
    val bb = java.nio.ByteBuffer.wrap(payload)
    def u32(off: Int): Long = bb.getInt(off) & 0xffffffffL
    var off = from
    while (off + 8 <= to) {
      val size0 = u32(off)
      if (size0 == 1L && off + 16 > to)
        throw new IllegalArgumentException(
          s"corrupt mp4: truncated 64-bit box header at offset $off")
      val (hdr, size) =
        if (size0 == 1L) (16, bb.getLong(off + 8))
        else if (size0 == 0L) (8, (to - off).toLong)
        else (8, size0)
      if (size < hdr || off + size > to)
        throw new IllegalArgumentException(
          s"corrupt mp4: box at offset $off overruns its enclosure")
      if (new String(payload, off + 4, 4, "US-ASCII") == typ)
        return Some((off + hdr, (off + size).toInt))
      off += size.toInt
    }
    None
  }

  // --- MJPEG-in-MP4: the pure-JVM video FRAME path ----------------------
  // Modern codecs (H.264/HEVC/AV1) have no JVM decoder, so frame decode
  // for them stays a loud codec boundary. But MJPEG — ISO-BMFF with a
  // 'jpeg' sample entry, every sample an independent baseline JPEG — is
  // a real, spec-valid video format (ISO/IEC 14496-12 sample tables +
  // ITU T.81 frames) that the JDK CAN fully decode. These two functions
  // close the loop: a writer that emits structurally-correct MP4 (the
  // same files parseMp4Meta reads), and a frame extractor that walks
  // the REAL sample tables (stsd/stsz/stsc/stco) to slice per-frame
  // byte ranges out of mdat — exactly how demuxers locate frames — then
  // hands each range to javax.imageio. Nothing is faked: a mismatched
  // stco offset or stsz size yields undecodable bytes and fails loudly.

  /** Encode JPEG frames as a minimal valid MJPEG MP4:
    * `[ftyp][mdat: frames concatenated][moov]` with full sample tables
    * (timescale `fps*1000`, stts fixed 1000-tick deltas — exact for
    * any fps, no integer-division drift — run-length stsc, per-sample
    * stsz,
    * absolute-offset stco). moov is written LAST so chunk offsets are
    * known — the classic non-faststart layout. `samplesPerChunk`
    * splits the samples into multiple chunks (each with its own stco
    * offset and an stsc run covering the short final chunk) — real
    * muxers interleave chunks, and the reader's table walk should be
    * exercised on that shape, not only the single-chunk degenerate.
    * Deterministic: same frames → same bytes. */
  def synthMjpegMp4(frames: Seq[Array[Byte]], width: Int, height: Int,
                    fps: Int = 25,
                    samplesPerChunk: Int = Int.MaxValue): Array[Byte] = {
    require(frames.nonEmpty, "synthMjpegMp4: need at least one frame")
    require(fps > 0, s"synthMjpegMp4: fps must be positive, got $fps")
    require(samplesPerChunk > 0, "synthMjpegMp4: samplesPerChunk >= 1")
    def be16(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def bytes(parts: Array[Byte]*): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      parts.foreach(out.write)
      out.toByteArray
    }
    def box(typ: String, parts: Array[Byte]*): Array[Byte] = {
      val content = bytes(parts: _*)
      bytes(be32(content.length + 8L),
        typ.getBytes("US-ASCII"), content)
    }
    def full(typ: String, version: Int, flags: Int,
             parts: Array[Byte]*): Array[Byte] =
      box(typ, bytes(Array(version.toByte,
        ((flags >> 16) & 0xff).toByte, ((flags >> 8) & 0xff).toByte,
        (flags & 0xff).toByte) +: parts: _*))
    val n = frames.length
    // timescale derived FROM fps so per-frame ticks are exact for any
    // rate: a fixed 1000 timescale truncates delta for 24/30/60 fps
    // (integer 1000/30 = 33) and the track duration drifts ~1 ms/frame
    val timescale = fps * 1000L
    val delta = 1000L // ticks per frame, exact by construction
    val duration = delta * n
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(512L),
      "isomiso2".getBytes("US-ASCII"))
    val mdat = box("mdat", frames: _*)
    val mdatContent = ftyp.length + 8L // first sample's absolute offset
    // chunking: contiguous groups of samplesPerChunk frames; chunk i
    // starts where the previous chunk's samples end
    val chunks = frames.grouped(samplesPerChunk).toVector
    val chunkOffsets = chunks.scanLeft(mdatContent)(
      (off, c) => off + c.map(_.length.toLong).sum).dropRight(1)
    // stsc run-length encoding of per-chunk sample counts: one run per
    // change (a short final chunk gets its own run, as muxers emit)
    val stscRuns = chunks.map(_.length).zipWithIndex
      .foldLeft(Vector.empty[(Int, Int)]) { case (acc, (spc, i)) =>
        if (acc.nonEmpty && acc.last._2 == spc) acc
        else acc :+ ((i + 1, spc))
      }
    // stsd 'jpeg' VisualSampleEntry: SampleEntry (6 reserved + dref
    // index) then the fixed visual fields — resolution 72dpi 16.16,
    // frame_count 1, 32-byte compressor name, depth 24, pre_defined -1
    val jpegEntry = box("jpeg",
      new Array[Byte](6), be16(1),
      be16(0), be16(0), be32(0), be32(0), be32(0),
      be16(width), be16(height),
      be32(0x00480000L), be32(0x00480000L), be32(0),
      be16(1), new Array[Byte](32), be16(24), be16(0xffff))
    val stbl = box("stbl",
      full("stsd", 0, 0, be32(1), jpegEntry),
      full("stts", 0, 0, be32(1), be32(n.toLong), be32(delta)),
      full("stsc", 0, 0, be32(stscRuns.length.toLong),
        bytes(stscRuns.map { case (first, spc) =>
          bytes(be32(first.toLong), be32(spc.toLong), be32(1))
        }: _*)),
      full("stsz", 0, 0, be32(0), be32(n.toLong),
        bytes(frames.map(f => be32(f.length.toLong)): _*)),
      full("stco", 0, 0, be32(chunkOffsets.length.toLong),
        bytes(chunkOffsets.map(be32): _*)))
    val minf = box("minf",
      full("vmhd", 0, 1, be16(0), be16(0), be16(0), be16(0)),
      box("dinf", full("dref", 0, 0, be32(1), full("url ", 0, 1))),
      stbl)
    val mdia = box("mdia",
      full("mdhd", 0, 0, be32(0), be32(0), be32(timescale),
        be32(duration), be16(0x55c4 /* 'und' */), be16(0)),
      full("hdlr", 0, 0, be32(0), "vide".getBytes("US-ASCII"),
        new Array[Byte](12), bytes("video".getBytes("US-ASCII"),
          Array(0.toByte))),
      minf)
    val tkhd = full("tkhd", 0, 7, be32(0), be32(0), be32(1), be32(0),
      be32(duration), new Array[Byte](8), be16(0), be16(0), be16(0),
      be16(0),
      // identity 3×3 transform in 16.16 / 2.30 fixed point
      be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
      be32(0), be32(0), be32(0), be32(0x40000000L),
      be32(width.toLong << 16), be32(height.toLong << 16))
    val mvhd = full("mvhd", 0, 0, be32(0), be32(0), be32(timescale),
      be32(duration), be32(0x00010000L), be16(0x0100), be16(0),
      new Array[Byte](8),
      be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
      be32(0), be32(0), be32(0), be32(0x40000000L),
      new Array[Byte](24), be32(2))
    bytes(ftyp, mdat, box("moov", mvhd, box("trak", tkhd, mdia)))
  }

  /** Extract the encoded frames of an MJPEG MP4 by walking its REAL
    * sample tables — the demuxer path, no codec: find the `vide`
    * track, require a JPEG sample entry in `stsd` (any other codec is
    * the loud boundary — no JVM decoder exists), then resolve every
    * sample's absolute byte range from `stco` (chunk offsets) ×
    * `stsc` (samples per chunk, run-length encoded) × `stsz`
    * (per-sample sizes; samples within a chunk are contiguous) and
    * slice `mdat`. Returns the frames in presentation order; each is
    * a standalone JPEG ready for `javax.imageio` ([[dHash]],
    * [[resizeImage]], …). Truncated tables or out-of-range offsets
    * fail loudly. */
  def videoFrames(payload: Array[Byte]): Vector[Array[Byte]] = {
    val bb = java.nio.ByteBuffer.wrap(payload)
    def u32(off: Int): Long = bb.getInt(off) & 0xffffffffL
    val (moovC, moovEnd) = findBox(payload, 0, payload.length, "moov")
      .getOrElse(throw new IllegalArgumentException(
        s"undecodable video payload (${payload.length} bytes): no moov"))
    // the video track: first trak whose mdia/hdlr handler is 'vide'
    var stbl: Option[(Int, Int)] = None
    var from = moovC
    while (stbl.isEmpty && from < moovEnd) {
      findBox(payload, from, moovEnd, "trak") match {
        case None => from = moovEnd
        case Some((tC, tEnd)) =>
          for ((mC, mEnd) <- findBox(payload, tC, tEnd, "mdia");
               (hC, hEnd) <- findBox(payload, mC, mEnd, "hdlr")
               if hEnd - hC >= 12 &&
                 new String(payload, hC + 8, 4, "US-ASCII") == "vide";
               (miC, miEnd) <- findBox(payload, mC, mEnd, "minf");
               sb <- findBox(payload, miC, miEnd, "stbl"))
            stbl = Some(sb)
          from = tEnd
      }
    }
    val (sC, sEnd) = stbl.getOrElse(throw new IllegalArgumentException(
      "mp4 has no video track sample table (no trak with a vide hdlr)"))
    def table(typ: String): (Int, Int) = findBox(payload, sC, sEnd, typ)
      .getOrElse(throw new IllegalArgumentException(
        s"corrupt mp4: sample table missing $typ"))
    // codec gate on the stsd entry fourcc
    val (stsdC, stsdEnd) = table("stsd")
    if (stsdEnd - stsdC < 16)
      throw new IllegalArgumentException("corrupt mp4: truncated stsd")
    val codec = new String(payload, stsdC + 12, 4, "US-ASCII")
    if (codec != "jpeg" && codec != "mjpa" && codec != "mjpb")
      throw new UnsupportedOperationException(
        s"no JVM decoder for video codec '$codec': frame decode is " +
          "implemented for MJPEG (jpeg/mjpa sample entries) only")
    // stsz: per-sample sizes (or one uniform size)
    val (szC, szEnd) = table("stsz")
    if (szEnd - szC < 12)
      throw new IllegalArgumentException("corrupt mp4: truncated stsz")
    val uniform = u32(szC + 4)
    val nSamples = u32(szC + 8).toInt
    val sizes: Int => Long =
      if (uniform != 0L) _ => uniform
      else {
        if (szEnd - szC < 12 + 4L * nSamples)
          throw new IllegalArgumentException(
            s"corrupt mp4: stsz table shorter than $nSamples entries")
        i => u32(szC + 12 + 4 * i)
      }
    // stco (32-bit) or co64 (64-bit) chunk offsets
    val (useCo64, (coC, coEnd)) =
      findBox(payload, sC, sEnd, "stco") match {
        case Some(t) => (false, t)
        case None => (true, table("co64"))
      }
    val nChunks = u32(coC + 4).toInt
    if (coEnd - coC < 8 + (if (useCo64) 8L else 4L) * nChunks)
      throw new IllegalArgumentException(
        s"corrupt mp4: chunk-offset table shorter than $nChunks entries")
    def chunkOff(i: Int): Long =
      if (useCo64) bb.getLong(coC + 8 + 8 * i) else u32(coC + 8 + 4 * i)
    // stsc runs: (firstChunk, samplesPerChunk); a run covers chunks
    // [firstChunk, next run's firstChunk)
    val (scC, scEnd) = table("stsc")
    val nRuns = u32(scC + 4).toInt
    if (scEnd - scC < 8 + 12L * nRuns)
      throw new IllegalArgumentException(
        s"corrupt mp4: stsc table shorter than $nRuns entries")
    val runs = (0 until nRuns).map(i =>
      (u32(scC + 8 + 12 * i).toInt, u32(scC + 12 + 12 * i).toInt))
    val out = Vector.newBuilder[Array[Byte]]
    var sample = 0
    var chunk = 1 // 1-based per spec
    while (sample < nSamples && chunk <= nChunks) {
      val perChunk = runs.reverse.collectFirst {
        case (first, spc) if first <= chunk => spc
      }.getOrElse(throw new IllegalArgumentException(
        s"corrupt mp4: no stsc run covers chunk $chunk"))
      var off = chunkOff(chunk - 1)
      var i = 0
      while (i < perChunk && sample < nSamples) {
        val len = sizes(sample)
        if (off < 0 || off + len > payload.length)
          throw new IllegalArgumentException(
            s"corrupt mp4: sample $sample range [$off, ${off + len}) " +
              s"outside the ${payload.length}-byte file")
        out += java.util.Arrays.copyOfRange(payload, off.toInt,
          (off + len).toInt)
        off += len
        sample += 1
        i += 1
      }
      chunk += 1
    }
    if (sample < nSamples)
      throw new IllegalArgumentException(
        s"corrupt mp4: chunks exhausted after $sample of $nSamples samples")
    out.result()
  }

  /** [[synthImage]]'s pixel field, JPEG-encoded — the frame synthesis
    * side of the MJPEG fixture. Deterministic (ImageIO's baseline
    * JPEG writer is canonical for TYPE_BYTE_GRAY at fixed quality):
    * same seed → byte-identical frame, so planted duplicate frames
    * survive the encode→demux→decode round trip bit-exactly. */
  def synthFrameJpeg(seed: String): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val px = new Array[Byte](256)
    var cur = seed.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < 256) {
      cur = md.digest(cur)
      System.arraycopy(cur, 0, px, i, math.min(16, 256 - i))
      i += 16
    }
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, 16, 16, px)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** [[realDecode]] as the payload-only function [[extractFeatures]]
    * takes, for an image-only media frame. */
  def realImageDecode(payload: Array[Byte]): (Int, Int, Double) =
    realDecode("image/png", payload)

  /** Partition-local feature extraction over the media records. The
    * decoder is a parameter so tests inject [[fakeDecode]] and a real
    * deployment injects [[realDecode]]. */
  def extractFeatures(media: Dataset[MediaRecord],
                      decode: Array[Byte] => (Int, Int, Double)
                        = fakeDecode): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init happens here (codec/model load, once per batch)
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val (w, h, d) = decode(r.payload)
        digest.reset()
        val hash = digest.digest(r.payload)
          .map(b => f"${b & 0xff}%02x").mkString
        MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong, hash,
          w, h, d)
      }
    }
  }

  /** Real bilinear resize of an encoded image to fit `maxDim` on its
    * longer edge (aspect preserved, never upscaled), re-encoded PNG —
    * the thumbnail/down-res step of a multimodal ingest, pure-JVM
    * (ImageIO decode → Graphics2D bilinear → ImageIO encode), so
    * unlike video FRAME decode this is a fully real path, no codec
    * boundary. Deterministic: PNG encoding is lossless and ImageIO's
    * writer is canonical for TYPE_INT_RGB, so same input bytes → same
    * output bytes (spec-pinned). Fails loudly on undecodable input —
    * the quarantine split (q207) is the caller's tool for dirty
    * corpora. */
  def resizeImage(payload: Array[Byte], maxDim: Int): Array[Byte] =
    resizeImageWithDims(payload, maxDim)._1

  /** [[resizeImage]] plus the output (width, height) — computed from
    * the same scale arithmetic that sized the canvas, NOT by
    * re-decoding the just-encoded PNG: in the distributed thumbnail
    * pass a decode-back purely to recover dimensions would double the
    * per-row codec cost. */
  def resizeImageWithDims(payload: Array[Byte], maxDim: Int)
  : (Array[Byte], Int, Int) = {
    require(maxDim >= 1, s"maxDim must be >= 1, got $maxDim")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, "resizeImage: undecodable image payload")
    val longEdge = math.max(img.getWidth, img.getHeight)
    val scale = math.min(1.0, maxDim.toDouble / longEdge)
    val w = math.max(1, math.round(img.getWidth * scale).toInt)
    val h = math.max(1, math.round(img.getHeight * scale).toInt)
    val out = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    (bos.toByteArray, w, h)
  }

  /** Batch thumbnail pass over an (id, payload) binary column:
    * mapPartitions — the right tool at the codec boundary (binary
    * decode has no Catalyst expression; one JVM-object decode context
    * per PARTITION, not per row) — emitting (doc_id, thumb, thumb_w,
    * thumb_h). Partitioning/batch shape is the production contract:
    * the payload bytes stream through one task, thumbnails are
    * emitted alongside the source id for the sink join, and nothing
    * is ever collected. */
  def thumbnails(media: Dataset[MediaRecord], maxDim: Int)
  : DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        // ONE decode per row: dims come from the resize arithmetic,
        // never from re-decoding the just-encoded thumbnail
        val (t, w, h) = resizeImageWithDims(r.payload, maxDim)
        (r.doc_id, t, w, h)
      }
    }.toDF("doc_id", "thumb", "thumb_w", "thumb_h")
  }

  /** Deterministic 16×16 grayscale PNG whose pixel bytes are the MD5
    * chain of `seed` — the synthesis side of the q163 perceptual-hash
    * fixture: same seed → byte-identical image, distinct seeds →
    * noise-independent pixel fields (so [[dHash]] values are 64
    * effectively-independent bits and cross-content collisions are
    * birthday-negligible). Real corpora skip this step — their bytes
    * arrive in the binary column; everything downstream of the PNG
    * bytes (decode, resample, hash) is the production path. */
  def synthImage(seed: String): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val px = new Array[Byte](256)
    var cur = seed.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < 256) {
      cur = md.digest(cur)
      System.arraycopy(cur, 0, px, i, math.min(16, 256 - i))
      i += 16
    }
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, 16, 16, px)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Difference hash (dHash) of an encoded image: decode via
    * javax.imageio (the [[realDecode]] path — any ImageIO-readable
    * format), area-average the luminance (Rec. 601 weights) onto a
    * 9×8 grid, emit one bit per horizontally-adjacent cell pair
    * (left < right) → a 64-bit fingerprint. The standard
    * perceptual-dedup primitive (Krawetz's dHash): byte-identical
    * images hash identically REGARDLESS of encoding (PNG vs BMP of
    * the same pixels collide by construction — that's the point:
    * content-hash dedup like q25's md5 misses re-encodes, dHash
    * doesn't), and near-duplicates land within small Hamming distance
    * so banding the 64 bits LSH-style scales pairing the q27 way.
    * Undecodable bytes fail loudly, matching [[realDecode]]. */
  def dHash(payload: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    if (img == null)
      throw new IllegalArgumentException(
        s"undecodable image payload (${payload.length} bytes)")
    val (w, h) = (img.getWidth, img.getHeight)
    val sum = new Array[Double](72) // 9 cols × 8 rows
    val cnt = new Array[Long](72)
    var y = 0
    while (y < h) {
      val gy = y * 8 / h
      var x = 0
      while (x < w) {
        val gx = x * 9 / w
        val rgb = img.getRGB(x, y)
        val lum = 0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        sum(gy * 9 + gx) += lum
        cnt(gy * 9 + gx) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        val l = sum(gy * 9 + gx) / cnt(gy * 9 + gx)
        val r = sum(gy * 9 + gx + 1) / cnt(gy * 9 + gx + 1)
        if (l < r) bits |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    bits
  }

  /** Deterministic single-pixel perturbation of an encoded image — the
    * near-duplicate synthesis for the q169 banded-Hamming fixture:
    * decode, nudge one pixel's gray level by +24 (clamped), re-encode.
    * A one-pixel edit moves one 9×8 grid cell's mean a few levels, so
    * [[dHash]] flips only the comparisons whose margin it crosses —
    * the planted pair lands within small, deterministic Hamming
    * distance of its source instead of colliding exactly (which is the
    * case [[q163]]-style equality grouping already covers). */
  def perturbImage(payload: Array[Byte]): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    val (x, y) = (img.getWidth / 3, img.getHeight / 3)
    val gray0 = img.getRGB(x, y) & 0xff
    val g = math.min(gray0 + 24, 255)
    img.setRGB(x, y, (0xff << 24) | (g << 16) | (g << 8) | g)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic 16-bit PCM mono WAV (8 kHz, 2080 samples) whose
    * sample words are the MD5 chain of `seed` — the audio sibling of
    * [[synthImage]]: same seed → byte-identical WAV, distinct seeds →
    * independent sample fields, so [[audioFingerprint]] bits are
    * effectively independent across contents. Real corpora skip this —
    * their bytes arrive in the binary column; decode → window →
    * fingerprint is the production path. */
  def synthWav(seed: String): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val nSamples = 2080
    val pcm = new Array[Byte](nSamples * 2)
    var cur = seed.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < pcm.length) {
      cur = md.digest(cur)
      System.arraycopy(cur, 0, pcm, i, math.min(16, pcm.length - i))
      i += 16
    }
    // Canonical 44-byte RIFF/WAVE header written directly —
    // AudioSystem.write consults the provider REGISTRY per call, which
    // serializes under executor-thread contention (measured: the q168
    // 50k-clip pass got SLOWER when fanned out to 32 threads until the
    // registry left the hot path). javax.sound remains the decode
    // fallback for non-WAV containers and the spec's AIFF re-encode.
    val bb = java.nio.ByteBuffer.allocate(44 + pcm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1 /* PCM */).putShort(1 /* mono */)
      .putInt(8000).putInt(8000 * 2 /* byte rate */)
      .putShort(2 /* block align */).putShort(16 /* bits */)
      .put("data".getBytes("US-ASCII")).putInt(pcm.length)
      .put(pcm)
    bb.array()
  }

  /** Energy-contour fingerprint of an encoded audio payload — the
    * audio analog of [[dHash]]: decode via javax.sound.sampled (any
    * AudioSystem-readable container: WAV, AIFF, AU), area-map the
    * sample stream onto 65 windows, take per-window RMS energy, emit
    * one bit per adjacent window pair (rms(j) < rms(j+1)) → a 64-bit
    * fingerprint. Byte-level container changes (WAV vs AIFF of the
    * same PCM, header metadata) do not move the fingerprint — which is
    * exactly what md5-of-bytes dedup misses — and near-duplicate audio
    * lands within small Hamming distance, so q27-style banding scales
    * the pairing. Window mapping is index-proportional (`j*n/65`), so
    * the fingerprint is length-robust the way dHash's 9×8 grid is
    * resolution-robust. Undecodable bytes fail loudly. */
  def audioFingerprint(payload: Array[Byte]): Long = {
    // hot path: direct RIFF/WAVE parse (registry-free, see synthWav);
    // anything else (AIFF, AU) goes through AudioSystem
    val (bytes, big) =
      if (payload.length > 44 &&
          payload(0) == 'R' && payload(1) == 'I' &&
          payload(2) == 'F' && payload(3) == 'F' &&
          payload(8) == 'W' && payload(9) == 'A' &&
          payload(10) == 'V' && payload(11) == 'E') {
        val bb = java.nio.ByteBuffer.wrap(payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var pos = 12
        var data: Array[Byte] = null
        var bits = -1
        while (data == null && pos + 8 <= payload.length) {
          val id = new String(payload, pos, 4, "US-ASCII")
          val len = bb.getInt(pos + 4)
          if (id == "fmt ") bits = bb.getShort(pos + 22).toInt
          else if (id == "data")
            data = java.util.Arrays.copyOfRange(payload, pos + 8,
              math.min(pos + 8 + len, payload.length))
          pos += 8 + len + (len & 1) // chunks are word-aligned
        }
        require(data != null, "WAV payload has no data chunk")
        require(bits == 16, s"fingerprint expects 16-bit PCM, got $bits")
        (data, false)
      } else {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16,
          s"fingerprint expects 16-bit PCM, got ${fmt.getSampleSizeInBits}")
        (ais.readAllBytes(), fmt.isBigEndian)
      }
    val n = bytes.length / 2
    val sumSq = new Array[Double](65)
    val cnt = new Array[Long](65)
    var i = 0
    while (i < n) {
      val lo = bytes(2 * i + (if (big) 1 else 0)) & 0xff
      val hi = bytes(2 * i + (if (big) 0 else 1)).toInt
      val s = ((hi << 8) | lo).toShort.toDouble
      val w = i * 65 / n
      sumSq(w) += s * s
      cnt(w) += 1
      i += 1
    }
    var bits = 0L
    var j = 0
    while (j < 64) {
      val l = math.sqrt(sumSq(j) / math.max(cnt(j), 1L))
      val r = math.sqrt(sumSq(j + 1) / math.max(cnt(j + 1), 1L))
      if (l < r) bits |= 1L << j
      j += 1
    }
    bits
  }

  /** Frame sampling plan for video payloads: one row per sampled frame
    * offset — pure expression (no decode), demonstrating how a sampling
    * stage fans out before per-frame decode. */
  def frameSamplePlan(media: DataFrame, everyNBytes: Int): DataFrame =
    media.filter(col("mime") === "video/mp4")
      .select(col("doc_id"),
        explode(sequence(lit(0),
          (octet_length(col("payload")) / everyNBytes).cast("int")))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * everyNBytes).as("byte_offset"))
}
