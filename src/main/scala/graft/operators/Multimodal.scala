package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling (north-star scope).
  *
  * Media are opaque `binary` columns plus typed metadata, processed
  * per-partition so a real decoder amortizes codec init across a batch.
  * IMAGE decode is real: [[ImageIoDecoder]] parses actual PNG/JPEG/GIF/
  * BMP bytes with the JDK's `javax.imageio` (no external deps) —
  * container sniffed from magic bytes, width/height from the decoded
  * raster, a 4-bucket mean-luminance feature from the pixels. Audio/
  * video codecs don't ship in the JDK, so those stay behind the same
  * [[Decoder]] SPI with [[StubDecoder]] as the deterministic stand-in.
  *
  * Scale: media rows are large — callers should store binaries in their
  * own parquet (or reference object-store paths) partitioned so one task
  * holds O(100 MB); `decode` is a `mapPartitions` (one decoder instance
  * per task, streaming iterator, no collect).
  */
object Multimodal {

  /** `javax.imageio` defaults to a DISK-backed stream cache: every
    * `ImageIO.read(InputStream)` / `ImageIO.write(..., OutputStream)`
    * spools the stream through a fresh temp FILE
    * (FileCacheImageInput/OutputStream) — three file create/write/
    * delete cycles per media row on this pipeline's encode→decode
    * round trips, pure overhead for in-memory byte arrays and a
    * disk-contention coupling between concurrent queries (guide §1:
    * the measured sf0.1 multimodal walls swung 1.5→5.3 s with battery
    * disk pressure). In-memory caching is semantically identical —
    * decoded pixels/bytes are unchanged. JVM-global, idempotent;
    * executors hit it on first use of any codec entry point below
    * (same JVM in local mode; object init per executor JVM on a
    * cluster). */
  private val _imageioMemCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Spread a small proxy-row frame across the session's cores before
    * a per-row codec kernel — see [[Spread.up]] (the rows here are
    * tiny id/dimension proxies; the heavy bytes are synthesized or
    * decoded AFTER the exchange). */
  def spreadForKernel(df: DataFrame): DataFrame = Spread.up(df)

  case class MediaRow(media_id: Long, content: Array[Byte], kind: String)
  case class MediaMeta(media_id: Long, kind: String, byte_len: Long,
                       width: Int, height: Int, n_frames: Int,
                       feature: Array[Float])

  /** Decoder SPI — swap in a real image/audio codec here. */
  trait Decoder extends Serializable {
    def decode(row: MediaRow): MediaMeta
  }

  /** STUB decoder: a deterministic fake standing in for a real codec
    * (image decode / resize / frame sampling). Derives plausible
    * dimensions and a tiny "feature" from the bytes so the pipeline
    * around it is fully exercisable and reproducible.
    */
  object StubDecoder extends Decoder {
    def decode(row: MediaRow): MediaMeta = {
      val len = row.content.length.toLong
      val w = (len % 640 + 1).toInt
      val h = ((len * 31) % 480 + 1).toInt
      val frames = (len / 100 + 1).toInt
      // fake feature: 4 byte-sum buckets — deterministic, content-sensitive
      val feat = new Array[Float](4)
      var i = 0
      while (i < row.content.length) {
        feat(i % 4) += (row.content(i) & 0xff) / 255.0f
        i += 1
      }
      MediaMeta(row.media_id, row.kind, len, w, h, frames, feat)
    }
  }

  /** REAL image decoder on the pure JDK: sniffs the container from its
    * magic bytes, decodes the raster with `javax.imageio.ImageIO`
    * (PNG/JPEG/GIF/BMP readers ship in every JRE), and reads
    * width/height from the decoded image — not from any metadata field,
    * so a truncated or mislabeled payload fails loudly instead of
    * passing fake dimensions through. Feature = 4 vertical-strip mean
    * luminances (deterministic: integer pixel math, fixed traversal).
    * ImageIO is headless-safe; one decoder instance per task via
    * [[decode]]'s mapPartitions. */
  object ImageIoDecoder extends Decoder {
    def sniff(b: Array[Byte]): String = {
      def at(i: Int): Int = if (i < b.length) b(i) & 0xff else -1
      if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "png"
      else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "jpeg"
      else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') "gif"
      else if (at(0) == 'B' && at(1) == 'M') "bmp"
      else "unknown"
    }

    def decode(row: MediaRow): MediaMeta = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(row.content))
      require(img != null,
        s"media_id=${row.media_id}: bytes are not a decodable image " +
          s"(sniffed '${sniff(row.content)}')")
      val (w, h) = (img.getWidth, img.getHeight)
      val feat = new Array[Float](4)
      val counts = new Array[Int](4)
      // bulk getRGB: one color-model conversion pass into an int[]
      // instead of w*h per-pixel getRGB calls (each of which pays a
      // ColorModel lookup + bounds checks); identical ARGB values.
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      var y = 0
      while (y < h) {
        val rowOff = y * w
        var x = 0
        while (x < w) {
          val rgb = px(rowOff + x)
          val lum = ((rgb >> 16 & 0xff) + (rgb >> 8 & 0xff) + (rgb & 0xff)) / 3
          val bucket = x * 4 / w
          feat(bucket) += lum / 255.0f
          counts(bucket) += 1
          x += 1
        }
        y += 1
      }
      var i = 0
      while (i < 4) { if (counts(i) > 0) feat(i) /= counts(i); i += 1 }
      MediaMeta(row.media_id, sniff(row.content), row.content.length.toLong,
        w, h, n_frames = 1, feat)
    }
  }

  /** Deterministic tiny-image PNG encoder (test-fixture side of the
    * real-decode round trip): a w×h RGB gradient keyed on `seed`,
    * compressed by the JDK's PNG writer. The BYTES are encoder-version-
    * dependent (deflate settings), but the decoded dimensions and pixels
    * are not — which is exactly what [[ImageIoDecoder]] extracts. */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // bulk setRGB (one raster store instead of w*h per-pixel calls);
    // pixel values unchanged.
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val g = ((x * 31 + y * 17 + seed) % 255).toInt & 0xff
        px(y * width + x) = g * 0x010101
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, width, height, px, 0, width)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  case class ResizedMeta(media_id: Long, width: Int, height: Int,
                         new_width: Int, new_height: Int,
                         nn_pixels_match: Boolean)

  /** REAL image resize on the pure JDK (the brief's decode → resize
    * step): decode, nearest-neighbor downscale to exact half dims
    * (floor, min 1) via Java2D, and VERIFY the resize semantics
    * in-engine — nearest-neighbor never blends, so every output pixel
    * must literally appear in its source 2×2 block (robust to the
    * implementation's rounding choice within the block). The oracle
    * reproduces the dimensional contract and the literal-true flag; the
    * pixel work itself has no SQL form — same design as the decode
    * batteries. `mapPartitions` is the right tool here: binary codecs
    * have no Catalyst Expression form, and the work is linear per row.
    */
  def resizeHalf(ds: Dataset[MediaRow]): Dataset[ResizedMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { row =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(row.content))
        if (img == null)
          throw new IllegalArgumentException(
            s"undecodable image bytes for media_id=${row.media_id}")
        val (w, h) = (img.getWidth, img.getHeight)
        val nw = math.max(1, w / 2)
        val nh = math.max(1, h / 2)
        val out = new java.awt.image.BufferedImage(
          nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
        g.drawImage(img, 0, 0, nw, nh, null)
        g.dispose()
        // bulk getRGB on both rasters (same per-pixel values as the
        // old getRGB(x, y) calls, one conversion pass each) — the
        // verification loop then runs over plain int arrays.
        val srcPx = img.getRGB(0, 0, w, h, null, 0, w)
        val outPx = out.getRGB(0, 0, nw, nh, null, 0, nw)
        var ok = true
        var y = 0
        while (y < nh && ok) {
          var x = 0
          while (x < nw && ok) {
            val p = outPx(y * nw + x) & 0xffffff
            var found = false
            var sy = 2 * y
            while (sy <= math.min(2 * y + 1, h - 1) && !found) {
              var sx = 2 * x
              while (sx <= math.min(2 * x + 1, w - 1) && !found) {
                found = (srcPx(sy * w + sx) & 0xffffff) == p
                sx += 1
              }
              sy += 1
            }
            ok = found
            x += 1
          }
          y += 1
        }
        ResizedMeta(row.media_id, w, h, nw, nh, ok)
      }
    }
  }

  case class AudioMeta(media_id: Long, kind: String, sample_rate: Int,
                       channels: Int, n_frames: Long, duration_ms: Long)

  /** REAL audio decode on the pure JDK: `javax.sound.sampled` parses
    * WAV/RIFF (and AU/AIFF) containers — sample rate, channel count and
    * frame length come from the actual parsed header, duration is
    * derived frame-count arithmetic. Undecodable bytes fail loudly
    * (same contract as [[ImageIoDecoder]]). Video stays behind the
    * [[Decoder]] SPI stub: the JDK ships no video codec. */
  object WavCodec {
    /** The JDK's audio file reader/writer SPI instances, resolved ONCE
      * per JVM. `AudioSystem.getAudioFileFormat`/`write` re-run the
      * provider lookup on EVERY call through a synchronized registry —
      * measured at sf0.1: 32 cores gave ~zero speedup over one core on
      * this kernel (every task serialized on the registry lock), while
      * the image path (no such per-call lookup) scaled ~13×. Caching
      * the provider list is guide §4.5 (heavyweight state once per
      * JVM, not per row); the parsing still runs through the same
      * platform `javax.sound.sampled.spi` implementations, tried in
      * provider order exactly like AudioSystem does. */
    private lazy val fileReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
      import scala.jdk.CollectionConverters._
      // The Gervill MIDI reader is probed LAST: its probe re-scans the
      // MIDI provider registry through a JVM-GLOBAL synchronized class
      // lock on EVERY call (jstack during the 32-thread kernel: 31
      // threads waiting on JSSecurityManager via SoftMidiAudioFileReader
      // → MidiSystem.getMidiFileReaders → JDK13Services.getProviders).
      // Each reader accepts only its own container magic (RIFF/.snd/
      // FORM/MThd), so probe order cannot change WHICH reader parses a
      // given input — only what a rejection costs.
      java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader])
        .asScala.toSeq
        .sortBy(_.getClass.getName.toLowerCase.contains("midi"))
    }
    private lazy val fileWriters: Seq[javax.sound.sampled.spi.AudioFileWriter] = {
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
        .asScala.toSeq
    }
    /** Deterministic 16-bit mono PCM WAV fixture: `nFrames` samples of
      * a seed-keyed integer waveform, containerized by the JDK's WAVE
      * writer. Decoded header fields are encoder-independent. */
    def encodeWav(nFrames: Int, sampleRate: Int, seed: Long): Array[Byte] = {
      val data = new Array[Byte](nFrames * 2)
      var i = 0
      while (i < nFrames) {
        val s = ((i * 31 + seed) % 251 - 125).toShort
        data(2 * i) = (s & 0xff).toByte
        data(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
      // first provider supporting WAVE — AudioSystem.write's own rule,
      // minus its per-call registry scan (see fileWriters)
      fileWriters.find(_.isFileTypeSupported(wave, ais)) match {
        case Some(w) => w.write(ais, wave, bos)
        case None => // no platform WAVE writer: fall back to the registry
          javax.sound.sampled.AudioSystem.write(ais, wave, bos)
      }
      bos.toByteArray
    }

    def decode(mediaId: Long, bytes: Array[Byte]): AudioMeta = {
      // same first-provider-that-parses rule as AudioSystem
      // .getAudioFileFormat, with the provider list cached (fileReaders)
      var aff: javax.sound.sampled.AudioFileFormat = null
      val it = fileReaders.iterator
      while (aff == null && it.hasNext) {
        try aff = it.next().getAudioFileFormat(
          new java.io.ByteArrayInputStream(bytes))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => ()
        }
      }
      if (aff == null)
        throw new IllegalArgumentException(
          s"media_id=$mediaId: bytes are not a decodable audio " +
            s"container")
      val fmt = aff.getFormat
      val rate = fmt.getSampleRate.toInt
      val frames = aff.getFrameLength.toLong
      AudioMeta(mediaId, aff.getType.toString.toLowerCase, rate,
        fmt.getChannels, frames, frames * 1000L / rate)
    }
  }

  /** Per-partition decode: one decoder per task, streaming. */
  def decode(ds: Dataset[MediaRow], decoder: Decoder = StubDecoder)
            (implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    ds.mapPartitions { it => it.map(decoder.decode) }
  }

  /** Frame sampling: one row per sampled frame index (every `step`th). */
  def sampleFrames(meta: DataFrame, step: Int): DataFrame =
    meta.select(col("media_id"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(step)))
        .as("frame_idx"))
}
