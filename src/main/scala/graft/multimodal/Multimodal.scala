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
  * Decoding: images decode for real through the JDK's `javax.imageio`
  * ([[realDecode]]); audio/video codecs are not present in this
  * environment, so [[fakeDecode]] is the deterministic stand-in that
  * keeps the full pipeline testable for them. The Spark-side shape is
  * identical either way and is what matters at scale:
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

  /** The production decode hook, all pure-JVM codecs:
    *
    *   - images via `javax.imageio` (PNG/JPEG/GIF/BMP ship with the
    *     JDK): (width, height, duration = 0);
    *   - audio via `javax.sound.sampled` (WAV/RIFF, AIFF, AU ship with
    *     the JDK): (channels, sample_rate_hz, duration_s) — the two int
    *     feature slots carry channel count and sample rate, documented
    *     on [[MediaFeatures]]'s producers;
    *   - video needs a codec this container does not ship (ffmpeg/JNI
    *     in a real deployment, same signature, everything around it —
    *     schema, partitioning, batching — unchanged); until then it
    *     fails loudly rather than fake a duration. */
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
      case other =>
        throw new UnsupportedOperationException(
          s"no $other codec in this environment — video decode needs " +
            "ffmpeg/JNI; images decode via javax.imageio, audio via " +
            "javax.sound.sampled")
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
