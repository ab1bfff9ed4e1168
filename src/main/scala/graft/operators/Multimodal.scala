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
  * sample RMS. VIDEO decode is REAL for MJPEG-in-AVI — the RIFF container
  * is demuxed here and Motion-JPEG frames are ordinary JPEGs ImageIO reads
  * ([[decodeVideo]]): true dimensions, frame count, frame rate, duration,
  * first-frame pixel stats. Inter-frame codecs (H.264/VP9/AV1) ship no JDK
  * decoder — those payloads route to the deterministic byte-stat fallback;
  * swapping in an ffmpeg JNI call changes one function.
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
      byte_sum: Long,          // exact integer byte mass (oracle-exact)
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
      aud_rms: Double,         // RMS over 16-bit PCM samples
      vid_width: Int,          // demuxed video stats (-1 when not decoded)
      vid_height: Int,
      vid_frames: Int,
      vid_us_per_frame: Int,
      vid_duration_ms: Long,
      vid_pixel_mean: Double)  // decoded FIRST frame (JPEG — lossy)

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

  /** Deterministic `size`×`size` grayscale-pattern PNG:
    * `gray(x,y) = (seed·31 + x·7 + y·13) mod 256` on all three channels.
    * Like [[syntheticPng]] the ENCODED bytes may vary by encoder, but PNG
    * is lossless so decoded pixels are a pure function of (seed, x, y) —
    * an arithmetic oracle can predict any pixel-derived signature. */
  def syntheticPatternPng(seed: Long, size: Int = 8): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      size, size, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < size) {
      var x = 0
      while (x < size) {
        val g = (((seed * 31 + x * 7 + y * 13) % 256 + 256) % 256).toInt
        im.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  /** Perceptual average-hash of a decoded image as a row-major bit
    * STRING (`size²` chars of '0'/'1') — near-duplicate images (crops,
    * re-encodes, brightness shifts smaller than the mean gap) collide or
    * land within small Hamming distance. All-integer arithmetic:
    * per-pixel luma `(299r + 587g + 114b) div 1000` (exact identity on
    * gray pixels), block-average downsample when the image is an exact
    * multiple of `size`, strict `> mean` threshold on the integer mean —
    * every bit reproducible by an independent engine. Returns None when
    * the payload doesn't decode or the shape doesn't block-divide. */
  def averageHashBits(payload: Array[Byte], size: Int = 8)
      : Option[String] = {
    imageIoMemoryOnly: Unit
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException | _: RuntimeException => null }
    Option(img).filter(im =>
        im.getWidth >= size && im.getHeight >= size &&
        im.getWidth % size == 0 && im.getHeight % size == 0)
      .map { im =>
        val bw = im.getWidth / size
        val bh = im.getHeight / size
        val cell = new Array[Long](size * size)
        var y = 0
        while (y < im.getHeight) {
          var x = 0
          while (x < im.getWidth) {
            val rgb = im.getRGB(x, y)
            val luma = (((rgb >> 16) & 0xff) * 299 +
              ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            cell((y / bh) * size + (x / bw)) += luma
            x += 1
          }
          y += 1
        }
        var i = 0
        var sum = 0L
        val px = bw.toLong * bh
        while (i < cell.length) { cell(i) /= px; sum += cell(i); i += 1 }
        val mean = sum / (size * size)
        val sb = new java.lang.StringBuilder(size * size)
        i = 0
        while (i < cell.length) {
          sb.append(if (cell(i) > mean) '1' else '0'); i += 1
        }
        sb.toString
      }
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

  /** Decoded-video stats (real container demux + first-frame decode). */
  final case class VideoStats(width: Int, height: Int, nFrames: Int,
                              usPerFrame: Int, durationMs: Long,
                              firstFramePixelMean: Double)

  /** REAL video decode for MJPEG-in-AVI — the one video format the JDK
    * can fully handle with zero new dependencies: the AVI container is
    * plain RIFF (walked here), and Motion-JPEG frames are ordinary JPEGs
    * (`javax.imageio`). Header truth (dimensions, frame count, frame
    * rate, duration) comes from the demuxed `avih` chunk; pixel stats
    * from the decoded FIRST frame. Non-MJPEG codecs (H.264 etc.) ship no
    * JDK decoder — those payloads return None and route to the byte-stat
    * fallback, same contract as undecodable images/audio. */
  def decodeVideo(payload: Array[Byte]): Option[VideoStats] = {
    def u32(off: Int): Long =
      if (off + 4 > payload.length) -1L
      else ((payload(off) & 0xffL)) | ((payload(off + 1) & 0xffL) << 8) |
        ((payload(off + 2) & 0xffL) << 16) | ((payload(off + 3) & 0xffL) << 24)
    def cc(off: Int): String =
      if (off + 4 > payload.length) ""
      else new String(payload, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (payload.length < 24 || cc(0) != "RIFF" || cc(8) != "AVI ") return None
    var avih: Option[(Int, Int, Int, Int)] = None // us/frame, frames, w, h
    var firstFrame: Option[Array[Byte]] = None
    def walk(start: Int, end: Int): Unit = {
      var pos = start
      while (pos + 8 <= end && (avih.isEmpty || firstFrame.isEmpty)) {
        val ck = cc(pos)
        val sz = u32(pos + 4)
        if (sz < 0 || pos + 8 + sz > end) return // malformed size: abort
        val dataOff = pos + 8
        ck match {
          case "LIST" if sz >= 4 =>
            walk(dataOff + 4, dataOff + sz.toInt)
          case "avih" if sz >= 40 && avih.isEmpty =>
            avih = Some((u32(dataOff).toInt, u32(dataOff + 16).toInt,
              u32(dataOff + 32).toInt, u32(dataOff + 36).toInt))
          case "00dc" | "00db" if firstFrame.isEmpty && sz > 0 =>
            firstFrame = Some(java.util.Arrays.copyOfRange(
              payload, dataOff, dataOff + sz.toInt))
          case _ => ()
        }
        pos = dataOff + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
      }
    }
    walk(12, payload.length)
    avih.map { case (us, frames, w, h) =>
      val mean = firstFrame.flatMap(decodeImage).map(_.pixelMean)
        .getOrElse(-1.0)
      VideoStats(w, h, frames, us, frames.toLong * us / 1000L, mean)
    }
  }

  /** Deterministic MJPEG-AVI whose CONTAINER stats are pure functions of
    * `seed`: `3 + seed%5` frames at `20000 + (seed%10)×1000` µs/frame,
    * `(2+seed%7)×(2+seed%5)` solid-gray frames. JPEG is lossy, so pixel
    * means are spec-checked with tolerance; the header fields are exact
    * and the q103 oracle predicts them arithmetically (the q80/q82
    * scheme, applied to the demuxer). */
  def syntheticAvi(seed: Long): Array[Byte] = {
    val nFrames = (3 + seed % 5).toInt
    val usPerFrame = (20000 + (seed % 10) * 1000).toInt
    val w = (2 + seed % 7).toInt
    val h = (2 + seed % 5).toInt
    val gray = ((seed * 11) % 256).toInt
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rgb)
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "jpg", jb)
    val jpeg = jb.toByteArray
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      id.getBytes("ISO-8859-1") ++ le32(data.length) ++ data ++ pad
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("ISO-8859-1") ++ body)
    val avih = chunk("avih",
      le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(nFrames) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ Array.fill(16)(0.toByte))
    val movi = list("movi",
      Array.concat(Seq.fill(nFrames)(chunk("00dc", jpeg)): _*))
    val body = "AVI ".getBytes("ISO-8859-1") ++ list("hdrl", avih) ++ movi
    "RIFF".getBytes("ISO-8859-1") ++ le32(body.length) ++ body
  }

  /** Byte-stat fallback for payloads no JDK codec decodes (H.264 video,
    * exotic image/audio formats). Deterministic: derives pixel-ish stats
    * from the raw bytes so the pipeline is testable end-to-end. */
  private def decodeStub(payload: Array[Byte]): (Double, Long, Long) = {
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
    (sum.toDouble / n, sum, bits / n)
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
        val (mean, byteSum, entropyQ) = decodeStub(r.payload)
        val img = if (r.kind == "image") decodeImage(r.payload) else None
        val aud = if (r.kind == "audio") decodeAudio(r.payload) else None
        val vid = if (r.kind == "video") decodeVideo(r.payload) else None
        val (w, h) = img.map(s => (s.width, s.height))
          .orElse(vid.map(s => (s.width, s.height)))
          .getOrElse((r.meta_width, r.meta_height))
        val (tw, th) = thumbBox(w, h)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, mean,
          byteSum, entropyQ, tw, th,
          img.isDefined || aud.isDefined || vid.isDefined,
          img.map(_.width).getOrElse(-1),
          img.map(_.height).getOrElse(-1),
          img.map(_.pixelMean).getOrElse(-1.0),
          aud.map(_.sampleRate).getOrElse(-1),
          aud.map(_.channels).getOrElse(-1),
          aud.map(_.frames).getOrElse(-1L),
          aud.map(_.rms).getOrElse(-1.0),
          vid.map(_.width).getOrElse(-1),
          vid.map(_.height).getOrElse(-1),
          vid.map(_.nFrames).getOrElse(-1),
          vid.map(_.usPerFrame).getOrElse(-1),
          vid.map(_.durationMs).getOrElse(-1L),
          vid.map(_.firstFramePixelMean).getOrElse(-1.0))
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
