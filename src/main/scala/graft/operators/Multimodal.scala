package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by per-partition batch transforms.
  *
  * North-star extension. IMAGE decode is REAL — the JDK's `javax.imageio`
  * reads PNG/JPEG/GIF/BMP with no extra dependency, so image rows get true
  * width/height/pixel stats ([[decodeImage]]). AUDIO decode is REAL for the
  * formats the JDK ships codecs for — WAV/AIFF/AU via `javax.sound.sampled`
  * ([[decodeAudio]]): true sample rate, channel count, frame count and
  * sample RMS. Video codecs do not ship with the JDK, so that kind keeps a
  * deterministic byte-stat STUB (clearly marked below); everything
  * Spark-side — schema, typed Datasets, partition-wise batching, output
  * shape — is real and tested. Swapping the remaining stub for an ffmpeg
  * JNI call changes one function.
  *
  * Scale shape: `mapPartitions` keeps the decode batched per task (amortises
  * model/codec init once per partition, the same reason PySpark pipelines use
  * `mapInPandas`); upstream `repartition(n)` sizes the batches; the binary
  * payload never passes through a shuffle except when explicitly
  * repartitioned.
  */
object Multimodal {

  /** Typed media row: payload + envelope metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String,            // "image" | "audio" | "video"
      payload: Array[Byte],
      meta_width: Int,
      meta_height: Int,
      meta_sample_rate: Int)

  /** Extracted features per media row. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      byte_mean: Double,
      byte_entropy_q: Long,    // quantised entropy proxy (deterministic)
      thumb_width: Int,
      thumb_height: Int,
      decoded: Boolean,        // true iff a real codec parsed the payload
      img_width: Int,          // decoded dimensions (-1 when not decoded)
      img_height: Int,
      pixel_mean: Double,      // mean RGB channel value (-1.0 when not decoded)
      aud_sample_rate: Int,    // decoded audio stats (-1 when not decoded)
      aud_channels: Int,
      aud_frames: Long,
      aud_rms: Double)         // RMS over 16-bit PCM samples

  /** Decoded-image stats (real codec output). */
  final case class ImageStats(width: Int, height: Int, pixelMean: Double)

  /** REAL image decode via the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP —
    * zero new dependencies). Returns None when the payload is not a
    * decodable image, which routes the row to the byte-stat fallback. The
    * reader is instantiated per call; ImageIO's plugin registry lookup is
    * cached JVM-wide so per-row cost is the decode itself. */
  // ImageIO's default stream cache spills every payload to a temp FILE;
  // for in-memory byte[] decoding that is one create/write/delete per row.
  // JVM-wide setter, applied once on first decode per executor.
  private lazy val imageIoMemoryOnly: Boolean = {
    javax.imageio.ImageIO.setUseCache(false)
    true
  }

  def decodeImage(payload: Array[Byte]): Option[ImageStats] = {
    imageIoMemoryOnly: Unit
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException | _: RuntimeException => null }
    Option(img).map { im =>
      val w = im.getWidth
      val h = im.getHeight
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = im.getRGB(x, y)
          sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      ImageStats(w, h, sum.toDouble / (3.0 * w * h))
    }
  }

  /** Deterministic 2×2 RGB PNG whose pixel values derive from `seed` —
    * all four pixels are (seed%256, (seed*7)%256, (seed*13)%256). Lets a
    * query round-trip REAL payloads through the production decode and
    * compare exact pixel stats against an arithmetic oracle (q80): the
    * encoder's byte output may vary, but PNG is lossless so the DECODED
    * stats are a pure function of the seed. */
  def syntheticPng(seed: Long): Array[Byte] = {
    val r = (seed % 256).toInt
    val g = ((seed * 7) % 256).toInt
    val b = ((seed * 13) % 256).toInt
    val rgb = (r << 16) | (g << 8) | b
    val im = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    im.setRGB(0, 0, rgb); im.setRGB(1, 0, rgb)
    im.setRGB(0, 1, rgb); im.setRGB(1, 1, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  /** Decoded-audio stats (real codec output). */
  final case class AudioStats(sampleRate: Int, channels: Int, frames: Long,
                              rms: Double)

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU —
    * zero new dependencies). The stream is normalized to 16-bit signed
    * little-endian PCM first so the RMS math is uniform across encodings
    * (8-bit, big-endian, u-law). Returns None when the payload is not a
    * decodable audio file, routing the row to the byte-stat fallback. */
  def decodeAudio(payload: Array[Byte]): Option[AudioStats] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val raw =
      try AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException |
             _: java.io.IOException => null
      }
    Option(raw).flatMap { in =>
      try {
        val fmt = in.getFormat
        val ch = fmt.getChannels
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          fmt.getSampleRate, 16, ch, ch * 2, fmt.getSampleRate, false)
        val pcm = AudioSystem.getAudioInputStream(target, in)
        val bytes = pcm.readAllBytes()
        val samples = bytes.length / 2
        var sumSq = 0.0
        var i = 0
        while (i < samples) {
          val s = ((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff))
          sumSq += s.toDouble * s.toDouble
          i += 1
        }
        val frames = samples.toLong / math.max(ch, 1)
        if (frames <= 0) None
        else Some(AudioStats(fmt.getSampleRate.toInt, ch, frames,
          math.sqrt(sumSq / samples)))
      } catch { case _: Exception => None }
      finally in.close()
    }
  }

  /** Deterministic mono 16-bit 8 kHz WAV whose decoded stats derive from
    * `seed`: `160 + (seed%16)*10` frames of an alternating ±amplitude
    * square wave with `amplitude = (seed%1000)+100`. PCM is lossless, so
    * the DECODED frame count is the frame count and the sample RMS is
    * exactly the amplitude — an arithmetic oracle can predict both (q82),
    * mirroring [[syntheticPng]]/q80. */
  def syntheticWav(seed: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat,
      AudioInputStream, AudioSystem}
    val amp = ((seed % 1000) + 100).toInt
    val frames = (160 + (seed % 16) * 10).toInt
    val data = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val s = if (i % 2 == 0) amp else -amp
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** STUB decode for kinds whose codecs the JDK lacks (video), and the
    * fallback for undecodable image/audio payloads. Deterministic fake:
    * derives pixel-ish stats from the raw bytes so the pipeline is testable
    * end-to-end without codecs. */
  private def decodeStub(payload: Array[Byte]): (Double, Long) = {
    // ??? <- real codec call goes here (ffmpeg JNI for video)
    var sum = 0L
    var bits = 0L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      sum += b
      bits += java.lang.Integer.bitCount(b)
      i += 1
    }
    val n = math.max(payload.length, 1)
    (sum.toDouble / n, bits / n)
  }

  /** Resize stub: target thumbnail box preserving aspect ratio. Pure math —
    * real at any scale. */
  def thumbBox(w: Int, h: Int, box: Int = 64): (Int, Int) =
    if (w <= 0 || h <= 0) (0, 0)
    else if (w >= h) (box, math.max(1, math.round(box.toDouble * h / w).toInt))
    else (math.max(1, math.round(box.toDouble * w / h).toInt), box)

  /** Batched feature extraction over the media payload. Image rows run the
    * real ImageIO decode, audio rows the real javax.sound decode; when a
    * decode succeeds, thumbnail math uses the TRUE decoded dimensions
    * instead of the envelope metadata. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens once here (codec/model load in real impl)
      rows.map { r =>
        val (mean, entropyQ) = decodeStub(r.payload)
        val img = if (r.kind == "image") decodeImage(r.payload) else None
        val aud = if (r.kind == "audio") decodeAudio(r.payload) else None
        val (w, h) = img.map(s => (s.width, s.height))
          .getOrElse((r.meta_width, r.meta_height))
        val (tw, th) = thumbBox(w, h)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, mean,
          entropyQ, tw, th, img.isDefined || aud.isDefined,
          img.map(_.width).getOrElse(-1),
          img.map(_.height).getOrElse(-1),
          img.map(_.pixelMean).getOrElse(-1.0),
          aud.map(_.sampleRate).getOrElse(-1),
          aud.map(_.channels).getOrElse(-1),
          aud.map(_.frames).getOrElse(-1L),
          aud.map(_.rms).getOrElse(-1.0))
      }
    }
  }

  /** Build a synthetic media table from the documents corpus (text bytes as
    * the opaque payload) — real pipelines read parquet with true binary. */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        (pmod(col("doc_id"), lit(640)) + 1).cast("int").as("meta_width"),
        (pmod(col("doc_id") * 7, lit(480)) + 1).cast("int").as("meta_height"),
        lit(16000).as("meta_sample_rate"))
      .as[MediaRow]
  }

  /** End-to-end pipeline: synthesize → batch feature-extract → aggregate by
    * kind (the aggregation is where the shuffle lives, on a 3-value key —
    * fine because partial aggregation collapses it map-side). */
  def pipeline(docs: DataFrame): DataFrame = {
    val feats = extractFeatures(fromDocuments(docs))
    feats.groupBy(col("kind")).agg(
      count(lit(1)).as("n_media"),
      sum(col("n_bytes")).as("total_bytes"),
      avg(col("byte_mean")).as("avg_byte_mean"),
      sum(col("byte_entropy_q")).as("sum_entropy_q"),
      max(col("thumb_width")).as("max_thumb_w"),
      max(col("thumb_height")).as("max_thumb_h"),
      sum(col("decoded").cast("long")).as("n_decoded"))
  }
}
