package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride through the engine
  * as opaque `binary` columns with a typed metadata struct, and
  * decode / feature-extract / frame-sample run as a batch-shaped
  * iterator-to-iterator `mapPartitions` over a typed Dataset — the
  * Scala analogue of `mapInPandas` (one decoder init per partition,
  * streaming through rows, no collect, no per-row UDF dispatch).
  *
  * ==== CODEC BOUNDARY ====
  * IMAGES decode for real: [[ImageCodec]] rides the JDK's own
  * `javax.imageio` (BMP and PNG readers/writers ship with every JVM —
  * no external dependency), so `q_image_decode`'s width/height/pixel
  * sums come from genuinely parsed image bytes, DEFLATE decompression
  * included on the PNG half. Audio/video codecs do NOT ship with the
  * JVM and aren't in this container, so [[MediaDecoder.decode]] for
  * those stays a clearly-marked deterministic byte-level fake
  * (checksum + length arithmetic). Swapping in a real audio codec
  * changes ONLY the body of `decode`; the engine-side contract —
  * schema, encoders, partition batching, aggregation — is identical
  * to the proven image path, and every output is integer-exact so
  * the DuckDB oracle can replay it.
  *
  * AUDIO also decodes for real as of round 14: [[AudioCodec]] rides
  * the JDK's own `javax.sound.sampled` (the RIFF/WAVE reader and
  * writer ship with every JVM), so `q_audio_decode`'s sample counts,
  * amplitude sums, and zero-crossing counts come from genuinely
  * parsed PCM bytes inside a genuine WAVE container. Only VIDEO
  * remains behind the fake seam (no video codec ships with the JVM
  * or this container).
  */
object Multimodal {

  /** One media payload: opaque bytes + typed metadata. */
  final case class MediaBlob(doc_id: Long, media_type: String, bytes: Array[Byte])

  /** Extracted features (all integer-exact for oracle replay). */
  final case class MediaFeatures(doc_id: Long, media_type: String,
                                 n_bytes: Long, checksum: Long, n_frames: Long)

  /** A resize plan: input dims → aspect-preserving output dims. */
  final case class MediaResize(doc_id: Long, media_type: String,
                               in_w: Long, in_h: Long, out_w: Long, out_h: Long)

  object MediaDecoder {
    /** STUB decode: real implementation would decompress/decode the
      * payload (??? in a codec-less container). Deterministic fake:
      * checksum = first 8 hex digits of md5(bytes); frame sampling =
      * one frame per started KiB-ish block (len/1000 + 1). */
    def decode(b: MediaBlob): MediaFeatures = {
      val md = MessageDigest.getInstance("MD5")
      val hex = md.digest(b.bytes).take(4).map(x => f"${x & 0xff}%02x").mkString
      MediaFeatures(b.doc_id, b.media_type,
        n_bytes = b.bytes.length.toLong,
        checksum = java.lang.Long.parseLong(hex, 16),
        n_frames = b.bytes.length.toLong / 1000L + 1L)
    }
  }

  object MediaResizer {
    /** Longest output side of the resize stub. Small enough that the
      * synthetic payload dims (6×8 … 23×25 at the test corpus) exercise
      * BOTH the downscale and the already-fits branch. */
    val MaxSide = 12L

    /** STUB resize plan: real implementation reads the codec's actual
      * dimensions and emits a scaled bitmap (the `???` in a codec-less
      * container); the fake derives dims from the byte length
      * (w = ⌊√n⌋, h = ⌈n/w⌉) and plans an aspect-preserving integer
      * downscale to [[MaxSide]]. All arithmetic is integer-exact (and
      * IEEE sqrt is correctly rounded, so both engines agree), which is
      * what lets DuckDB replay the plan bit-for-bit. */
    def plan(b: MediaBlob): MediaResize = {
      val n = math.max(b.bytes.length.toLong, 1L)
      val w = math.max(math.sqrt(n.toDouble).toLong, 1L)
      val h = (n + w - 1) / w
      val m = math.max(w, h)
      if (m <= MaxSide) MediaResize(b.doc_id, b.media_type, w, h, w, h)
      else MediaResize(b.doc_id, b.media_type, w, h,
        math.max(w * MaxSide / m, 1L), math.max(h * MaxSide / m, 1L))
    }
  }

  /** One real image payload: genuine BMP/PNG bytes + which container. */
  final case class ImageBlob(doc_id: Long, fmt: String, bytes: Array[Byte])

  /** Facts read from the DECODED raster (not the payload bytes):
    * dimensions and exact per-channel pixel sums. */
  final case class ImageFacts(doc_id: Long, fmt: String, width: Long,
                              height: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** The REAL codec seam: JDK `javax.imageio` BMP/PNG encode + decode.
    *
    * The pixel pattern is a closed form of (doc_id, x, y) — so the
    * DuckDB oracle can compute the expected channel sums INDEPENDENTLY
    * (it never sees the bytes), which makes the gate a true round-trip
    * proof: a decoder that misread BMP's bottom-up row order, its BGR
    * byte order, its 4-byte row padding, or PNG's DEFLATE stream
    * would shift pixels between rows/channels and break the sums. */
  object ImageCodec {
    /** Dims and per-channel values as closed forms of (doc_id, x, y).
      * Sides 8..16 keep payloads small while exercising BMP row
      * padding (odd widths → 4-byte pad) and non-square rasters. */
    def widthOf(id: Long): Int = (8 + id % 9).toInt
    def heightOf(id: Long): Int = (8 + id % 7).toInt
    def r(id: Long, x: Int, y: Int): Int = ((31 * id + 7 * x + 13 * y) % 256).toInt
    def g(id: Long, x: Int, y: Int): Int = ((17 * id + 5 * x + 11 * y) % 256).toInt
    def b(id: Long, x: Int, y: Int): Int = ((23 * id + 3 * x + 19 * y) % 256).toInt

    /** Render the pattern and ENCODE it through the JDK's real BMP or
      * PNG writer — the bytes are genuine container files any image
      * tool opens. */
    def encode(id: Long, fmt: String): Array[Byte] = {
      val (w, h) = (widthOf(id), heightOf(id))
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (r(id, x, y) << 16) | (g(id, x, y) << 8) | b(id, x, y))
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, fmt, out),
        s"no ImageIO writer for format $fmt")
      out.toByteArray
    }

    /** DECODE real bytes with the JDK reader and fold the raster to
      * integer-exact facts. Both containers are lossless, so the
      * decoded raster must reproduce the closed-form pattern exactly
      * regardless of which writer produced the bytes. */
    def decode(blob: ImageBlob): ImageFacts = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(blob.bytes))
      require(img != null, s"no ImageIO reader decoded doc ${blob.doc_id} (${blob.fmt})")
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      ImageFacts(blob.doc_id, blob.fmt,
        img.getWidth.toLong, img.getHeight.toLong, sr, sg, sb)
    }
  }

  /** Synthesize the image corpus: every 5th document carries a real
    * image payload, BMP and PNG alternating. Encoding happens in the
    * same iterator-to-iterator mapPartitions shape as decoding — one
    * codec context per partition, payload bytes never leave the
    * partition that made them. */
  def imageBlobs(s: SparkSession, dir: String): Dataset[ImageBlob] = {
    import s.implicits._
    graft.queries.Tables.t(s, dir, "documents")
      .filter($"doc_id" % 5 === 0)
      .select($"doc_id").as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // in-memory streams, no tmp spill
        it.map { id =>
          val fmt = if (id % 2 == 0) "bmp" else "png"
          ImageBlob(id, fmt, ImageCodec.encode(id, fmt))
        }
      }
  }

  /** Batch image decode, same shape as [[extractFeatures]]: reader
    * init per partition, rows stream through. */
  def decodeImages(blobs: Dataset[ImageBlob]): Dataset[ImageFacts] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map(ImageCodec.decode)
    }
  }

  /** CORRECTNESS query over the REAL codec path: encode → decode →
    * per-doc raster facts. The oracle recomputes every expected value
    * from the closed-form pattern without ever seeing the bytes, so a
    * hash match proves the JDK round-trip preserved every pixel. */
  def qImageDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decodeImages(imageBlobs(s, dir)).toDF()
      .orderBy($"doc_id")
  }

  /** Per-image perceptual-hash row: the 64-bit aHash carried as four
    * 16-bit band values (never one signed BIGINT — the sign bit would
    * diverge across engines' shift/overflow rules). */
  final case class ImageHash(img_id: Long, fmt: String,
                             h0: Int, h1: Int, h2: Int, h3: Int)

  /** Average-hash (aHash) of a decoded raster — the classic perceptual
    * image fingerprint: integer grayscale, 8×8 average-pool, bit =
    * cell mean above the mean-of-cell-means. All integer division, so
    * the DuckDB oracle replays it bit-for-bit from the closed-form
    * pixel pattern without ever seeing the bytes. */
  private[functions] def aHash(img: java.awt.image.BufferedImage): (Int, Int, Int, Int) = {
    val w = img.getWidth; val h = img.getHeight
    val sum = new Array[Long](64); val cnt = new Array[Long](64)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val gray = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
        val c = (y * 8 / h) * 8 + (x * 8 / w)
        sum(c) += gray; cnt(c) += 1
        x += 1
      }
      y += 1
    }
    val m = Array.tabulate(64)(c => sum(c) / cnt(c)) // w,h >= 8 → every cell hit
    val t = m.sum / 64
    def band(b: Int): Int = {
      var v = 0; var i = 0
      while (i < 16) { if (m(16 * b + i) > t) v |= 1 << i; i += 1 }
      v
    }
    (band(0), band(1), band(2), band(3))
  }

  /** The perceptual-dedup corpus: every base image ([[imageBlobs]]'s
    * ids and patterns), plus a PERTURBED TWIN for every 4th base — the
    * same pattern re-encoded with one low bit flipped on one channel
    * of one pixel, in the OTHER container format. Twins are what
    * perceptual dedup exists for: byte-identical dedup can never pair
    * them (different codec, different bytes), content hashing must. */
  private def phashBlobs(s: SparkSession, dir: String): Dataset[ImageBlob] = {
    import s.implicits._
    graft.queries.Tables.t(s, dir, "documents")
      .filter($"doc_id" % 5 === 0)
      .select($"doc_id").as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { id =>
          val fmt = if (id % 2 == 0) "bmp" else "png"
          val base = ImageBlob(id, fmt, ImageCodec.encode(id, fmt))
          if ((id / 5) % 4 == 1) {
            val twinFmt = if (id % 2 == 0) "png" else "bmp"
            val (w, h) = (ImageCodec.widthOf(id), ImageCodec.heightOf(id))
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val r0 = ImageCodec.r(id, x, y)
                val r = if (x == 0 && y == 0) r0 ^ 1 else r0
                img.setRGB(x, y, (r << 16) | (ImageCodec.g(id, x, y) << 8) |
                  ImageCodec.b(id, x, y))
                x += 1
              }
              y += 1
            }
            val out = new java.io.ByteArrayOutputStream()
            require(javax.imageio.ImageIO.write(img, twinFmt, out),
              s"no ImageIO writer for $twinFmt")
            Seq(base, ImageBlob(id + 1, twinFmt, out.toByteArray))
          } else Seq(base)
        }
      }
  }

  /** Perceptual image near-dup (q_image_phash): decode every payload
    * with the REAL JDK readers, aHash the rasters, and pair images at
    * hamming ≤ 3 via 16-bit band pigeonhole (4 bands — lossless for
    * d ≤ 3, the same guarantee as `q_simhash_pairs`; candidate volume
    * is bounded by the 2¹⁶-per-band signature space, never corpus²).
    * The planted twins are CROSS-FORMAT (BMP base, PNG twin or vice
    * versa) with one perturbed pixel, so a green gate proves the pair
    * came from decoded CONTENT — no byte-level shortcut exists. The
    * oracle replays grayscale → 8×8 pool → threshold → bands from the
    * closed-form pixel pattern without the bytes.
    *
    * Scale: decode + hash are per-partition map work on the payload
    * column (bytes never shuffle); only 8-byte signatures reach the
    * band exchange. */
  def qImagePhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = phashBlobs(s, dir)
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { blob =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(blob.bytes))
          require(img != null, s"no reader decoded img ${blob.doc_id}")
          val (h0, h1, h2, h3) = aHash(img)
          ImageHash(blob.doc_id, blob.fmt, h0, h1, h2, h3)
        }
      }.toDF()
    val bands = sigs.select($"img_id", $"fmt", $"h0", $"h1", $"h2", $"h3",
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"), col(s"h$b").as("bv"))): _*)).as("x"))
      .select($"img_id", $"fmt", $"h0", $"h1", $"h2", $"h3",
        $"x.band".as("band"), $"x.bv".as("bv"))
    // the standard per-bucket candidate cap: a degenerate fingerprint
    // (flat/black frames — all-zero envelope) would otherwise make one
    // bucket's pair expansion quadratic in corpus size; smallest-id-
    // first keep, mirrored in the oracle, worst case buckets × cap².
    val capped = bands
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy($"band", $"bv").orderBy($"img_id")))
      .filter($"rn" <= 128).drop("rn")
    capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.img_id") < col("b.img_id"))
      .select(col("a.img_id").as("doc_a"), col("b.img_id").as("doc_b"),
        col("a.fmt").as("fmt_a"), col("b.fmt").as("fmt_b"),
        (expr("bit_count(a.h0 ^ b.h0) + bit_count(a.h1 ^ b.h1) + " +
          "bit_count(a.h2 ^ b.h2) + bit_count(a.h3 ^ b.h3)")).cast("long").as("hamming"))
      .distinct()
      .filter($"hamming" <= 3)
      .orderBy($"doc_a", $"doc_b")
  }

  /** One real audio payload: genuine RIFF/WAVE bytes (JDK-encoded). */
  final case class AudioBlob(doc_id: Long, bytes: Array[Byte])

  /** Facts read from the DECODED sample stream (not the payload
    * bytes): all integer-exact so DuckDB can replay them. */
  final case class AudioFacts(doc_id: Long, n_samples: Long, sample_rate: Long,
                              channels: Long, sum_abs: Long, peak_abs: Long,
                              zero_cross: Long)

  /** The REAL audio codec seam: JDK `javax.sound.sampled` WAVE
    * encode + decode (the RIFF parser ships with every JVM — no
    * external dependency, and file I/O needs no audio device, so it
    * works headless).
    *
    * The PCM samples are a closed form of (doc_id, t) — a sawtooth
    * that wraps every ~24 samples — so the DuckDB oracle computes the
    * expected sums INDEPENDENTLY, never seeing the bytes. A decoder
    * that misread the RIFF chunk layout, the 16-bit sample width, the
    * little-endian byte order, or the data-chunk length would shift
    * or truncate samples and break sum_abs / peak_abs / zero_cross. */
  object AudioCodec {
    /** 8 kHz mono signed 16-bit little-endian PCM. */
    val Rate = 8000
    def nSamplesOf(id: Long): Int = (400 + id % 257).toInt
    /** Sample in [-2048, 2047]; stride 173 wraps the 4096-wide ramp
      * every ~24 samples, so zero_cross genuinely discriminates. */
    def sampleAt(id: Long, t: Int): Int =
      (((37 * id + 173 * t) % 4096) - 2048).toInt

    /** Render the waveform and ENCODE it through the JDK's real WAVE
      * writer — the bytes are a genuine RIFF container any audio tool
      * opens. */
    def encode(id: Long): Array[Byte] = {
      val n = nSamplesOf(id)
      val pcm = new Array[Byte](n * 2)
      var t = 0
      while (t < n) {
        val v = sampleAt(id, t)
        pcm(2 * t) = (v & 0xff).toByte
        pcm(2 * t + 1) = ((v >> 8) & 0xff).toByte
        t += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(Rate.toFloat, 16, 1,
        /* signed = */ true, /* bigEndian = */ false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out): Unit
      out.toByteArray
    }

    /** DECODE real bytes with the JDK's RIFF/WAVE reader and fold the
      * sample stream to integer-exact facts. PCM is lossless, so the
      * decoded stream must reproduce the closed-form waveform exactly. */
    /** [[encode]] with the t=0 sample's low bit flipped — a second,
      * independent encoder run of an almost-identical waveform (the
      * fingerprint twin; XOR keeps the value in [-2048, 2047]). */
    def encodePerturbed(id: Long): Array[Byte] = {
      val n = nSamplesOf(id)
      val pcm = new Array[Byte](n * 2)
      var t = 0
      while (t < n) {
        val v0 = sampleAt(id, t)
        val v = if (t == 0) v0 ^ 1 else v0
        pcm(2 * t) = (v & 0xff).toByte
        pcm(2 * t + 1) = ((v >> 8) & 0xff).toByte
        t += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(Rate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out): Unit
      out.toByteArray
    }

    def decode(blob: AudioBlob): AudioFacts = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(blob.bytes))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
        fmt.getChannels == 1, s"doc ${blob.doc_id}: unexpected WAVE format $fmt")
      val pcm = ais.readAllBytes()
      val n = pcm.length / 2
      var sumAbs = 0L
      var peak = 0L
      var zc = 0L
      var prevNeg = false
      var t = 0
      while (t < n) {
        val v = (((pcm(2 * t + 1) & 0xff) << 8) | (pcm(2 * t) & 0xff)).toShort.toInt
        val a = math.abs(v).toLong
        sumAbs += a
        if (a > peak) peak = a
        val neg = v < 0
        if (t > 0 && neg != prevNeg) zc += 1
        prevNeg = neg
        t += 1
      }
      AudioFacts(blob.doc_id, n.toLong, fmt.getSampleRate.toLong,
        fmt.getChannels.toLong, sumAbs, peak, zc)
    }
  }

  /** Per-clip acoustic-fingerprint row: 64 energy bits as four 16-bit
    * bands (same carrier rationale as [[ImageHash]]). */
  final case class AudioFp(snd_id: Long, h0: Int, h1: Int, h2: Int, h3: Int)

  /** Energy-envelope fingerprint of decoded PCM — the audio analogue
    * of [[aHash]]: 64 time frames, per-frame mean |amplitude|, bit =
    * frame energy above the mean-of-frame-means. Integer-exact, so the
    * oracle replays it from the closed-form waveform. */
  private[functions] def audioFingerprint(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val pcm = ais.readAllBytes()
    val n = pcm.length / 2
    val sum = new Array[Long](64); val cnt = new Array[Long](64)
    var t = 0
    while (t < n) {
      val v = (((pcm(2 * t + 1) & 0xff) << 8) | (pcm(2 * t) & 0xff)).toShort.toInt
      val f = t * 64 / n // n >= 400 → every frame non-empty
      sum(f) += math.abs(v); cnt(f) += 1
      t += 1
    }
    val m = Array.tabulate(64)(f => sum(f) / cnt(f))
    val thr = m.sum / 64
    def band(b: Int): Int = {
      var v = 0; var i = 0
      while (i < 16) { if (m(16 * b + i) > thr) v |= 1 << i; i += 1 }
      v
    }
    (band(0), band(1), band(2), band(3))
  }

  /** The acoustic-dedup corpus: every base clip plus, for every 4th
    * one, a PERTURBED TWIN (the same waveform re-encoded with one
    * sample's low bit flipped) — the "same recording, different
    * encoder run" pair byte-level dedup can never find. */
  private def audioFpBlobs(s: SparkSession, dir: String): Dataset[AudioBlob] = {
    import s.implicits._
    graft.queries.Tables.t(s, dir, "documents")
      .filter($"doc_id" % 5 === 1)
      .select($"doc_id").as[Long]
      .mapPartitions(_.flatMap { id =>
        val base = AudioBlob(id, AudioCodec.encode(id))
        if ((id / 5) % 4 == 1)
          Seq(base, AudioBlob(id + 1, AudioCodec.encodePerturbed(id)))
        else Seq(base)
      })
  }

  /** Acoustic near-dup (q_audio_fingerprint): decode every WAVE
    * payload with the real JDK reader, fingerprint the energy
    * envelope, pair clips at hamming ≤ 3 via the same 16-bit band
    * pigeonhole as [[qImagePhash]]. The planted twins differ by one
    * low-order sample bit across two independent encoder runs, so
    * pairing can only come from decoded CONTENT. Payload bytes never
    * shuffle — only 8-byte fingerprints reach the band exchange. */
  def qAudioFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = audioFpBlobs(s, dir)
      .mapPartitions(_.map { blob =>
        val (h0, h1, h2, h3) = audioFingerprint(blob.bytes)
        AudioFp(blob.doc_id, h0, h1, h2, h3)
      }).toDF()
    val bands = sigs.select($"snd_id", $"h0", $"h1", $"h2", $"h3",
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"), col(s"h$b").as("bv"))): _*)).as("x"))
      .select($"snd_id", $"h0", $"h1", $"h2", $"h3",
        $"x.band".as("band"), $"x.bv".as("bv"))
    // same per-bucket candidate cap as the image key: a degenerate
    // envelope (silence) must not make one bucket quadratic.
    val capped = bands
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy($"band", $"bv").orderBy($"snd_id")))
      .filter($"rn" <= 128).drop("rn")
    capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.snd_id") < col("b.snd_id"))
      .select(col("a.snd_id").as("doc_a"), col("b.snd_id").as("doc_b"),
        (expr("bit_count(a.h0 ^ b.h0) + bit_count(a.h1 ^ b.h1) + " +
          "bit_count(a.h2 ^ b.h2) + bit_count(a.h3 ^ b.h3)")).cast("long").as("hamming"))
      .distinct()
      .filter($"hamming" <= 3)
      .orderBy($"doc_a", $"doc_b")
  }

  /** Synthesize the audio corpus: the doc_id % 5 == 1 slice (disjoint
    * from the image slice) carries a real WAVE payload. Same
    * iterator-to-iterator shape as the image path — payload bytes
    * never leave the partition that made them. */
  def audioBlobs(s: SparkSession, dir: String): Dataset[AudioBlob] = {
    import s.implicits._
    graft.queries.Tables.t(s, dir, "documents")
      .filter($"doc_id" % 5 === 1)
      .select($"doc_id").as[Long]
      .mapPartitions(_.map(id => AudioBlob(id, AudioCodec.encode(id))))
  }

  /** CORRECTNESS query over the REAL audio path: encode → decode →
    * per-doc waveform facts. The oracle recomputes every expected
    * value from the closed-form waveform without ever seeing the
    * bytes, so a hash match proves the JDK WAVE round-trip preserved
    * every sample. */
  def qAudioDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    audioBlobs(s, dir)
      .mapPartitions(_.map(AudioCodec.decode))
      .toDF()
      .orderBy($"doc_id")
  }

  /** Batch feature extraction: the decoder is instantiated per
    * partition (cheap here, expensive for a real codec — which is why
    * mapPartitions, not map) and rows stream through it. */
  def extractFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // per-partition decoder init would go here (model load, codec ctx)
      it.map(MediaDecoder.decode)
    }
  }

  /** Documents as synthetic media blobs: payload = utf8 bytes of the
    * text, media type assigned round-robin. Stands in for reading real
    * image/audio/video binary columns from parquet. */
  def blobsFromDocuments(s: SparkSession, dir: String): Dataset[MediaBlob] = {
    import s.implicits._
    graft.queries.Tables.t(s, dir, "documents")
      .select($"doc_id",
        when($"doc_id" % 3 === 0, "image")
          .when($"doc_id" % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        $"text".cast("binary").as("bytes"))
      .as[MediaBlob]
  }

  /** CORRECTNESS query: blob → mapPartitions decode → per-type rollup. */
  def qMultimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    extractFeatures(blobsFromDocuments(s, dir)).toDF()
      .groupBy($"media_type")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_bytes").as("total_bytes"),
        sum($"checksum").as("sum_checksum"),
        sum($"n_frames").as("total_frames"))
      .orderBy($"media_type")
  }

  /** Frame sampling as a query: every 3rd frame index of each decoded
    * payload (deterministic doc_id % 50 sample keeps the output
    * result-sized). The frame table a downstream vision encoder would
    * consume; rows out ∝ frames in, per row — never corpus². The real
    * codec swap point is the same [[MediaDecoder]] boundary (a true
    * implementation emits actual frame offsets; resize rides the same
    * seam). */
  def qFrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Sample BEFORE decoding: the typed mapPartitions is an optimizer
    // barrier, so a post-decode filter would run every payload through
    // the (expensive, for a real codec) decoder and drop 49/50 of it.
    extractFeatures(blobsFromDocuments(s, dir).filter($"doc_id" % 50 === 0)).toDF()
      .select($"doc_id", $"media_type", $"n_frames",
        explode(expr("sequence(CAST(0 AS BIGINT), n_frames - 1, 3)")).as("frame_idx"))
      .orderBy($"doc_id", $"frame_idx")
  }

  /** Resize as a query: the per-partition resize pass (same
    * mapPartitions batching as decode — one codec context per
    * partition, payload bytes never shuffle) rolled up to pixel-volume
    * reduction per media type. */
  def qMediaResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    blobsFromDocuments(s, dir)
      .mapPartitions { it =>
        // per-partition codec/scaler init would go here
        it.map(MediaResizer.plan)
      }.toDF()
      .groupBy($"media_type")
      .agg(count(lit(1)).as("n_media"),
        sum($"in_w" * $"in_h").as("in_px"),
        sum($"out_w" * $"out_h").as("out_px"))
      .select($"media_type", $"n_media", $"in_px", $"out_px",
        expr("out_px * 10000 div in_px").as("reduction_bp"))
      .orderBy($"media_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_features" -> qMultimodalFeatures,
    "q_frame_sample" -> qFrameSample,
    "q_media_resize" -> qMediaResize,
    "q_image_decode" -> qImageDecode,
    "q_image_phash" -> qImagePhash,
    "q_audio_fingerprint" -> qAudioFingerprint,
    "q_audio_decode" -> qAudioDecode,
  )

  val oracles: Map[String, String] = Map(
    // Replays the stub decode in SQL: md5 prefix as the checksum,
    // octet_length as the byte count (payload = utf8 text bytes).
    "q_multimodal_features" ->
      """WITH feat AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio'
        |         ELSE 'video' END AS media_type,
        |    octet_length(encode(text)) AS n_bytes,
        |    CAST('0x' || substring(md5(text), 1, 8) AS BIGINT) AS checksum,
        |    octet_length(encode(text)) // 1000 + 1 AS n_frames
        |  FROM documents)
        |SELECT media_type, count(*) AS n_docs, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(sum(checksum) AS BIGINT) AS sum_checksum, CAST(sum(n_frames) AS BIGINT) AS total_frames
        |FROM feat GROUP BY media_type ORDER BY media_type""".stripMargin,
    "q_media_resize" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio'
        |         ELSE 'video' END AS media_type,
        |    greatest(CAST(floor(sqrt(CAST(octet_length(encode(text)) AS DOUBLE))) AS BIGINT), 1) AS w,
        |    octet_length(encode(text)) AS n
        |  FROM documents),
        |d2 AS (SELECT doc_id, media_type, w, CAST((n + w - 1) // w AS BIGINT) AS h FROM dims),
        |r AS (SELECT doc_id, media_type, w AS in_w, h AS in_h,
        |    CASE WHEN greatest(w, h) <= 12 THEN w ELSE greatest(w * 12 // greatest(w, h), 1) END AS out_w,
        |    CASE WHEN greatest(w, h) <= 12 THEN h ELSE greatest(h * 12 // greatest(w, h), 1) END AS out_h
        |  FROM d2)
        |SELECT media_type, count(*) AS n_media,
        |  CAST(sum(in_w * in_h) AS BIGINT) AS in_px, CAST(sum(out_w * out_h) AS BIGINT) AS out_px,
        |  CAST(sum(out_w * out_h) * 10000 // sum(in_w * in_h) AS BIGINT) AS reduction_bp
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    // Recomputes the closed-form pattern's dims and channel sums
    // WITHOUT the bytes: the only way Spark's answer matches is if
    // the JDK encode→decode round-trip (BMP bottom-up BGR rows with
    // 4-byte padding; PNG DEFLATE) reproduced every pixel exactly.
    // Replays the energy-envelope fingerprint from the closed-form
    // sawtooth (64 frames -> mean |amplitude| -> threshold -> bands);
    // the pairing is the same band pigeonhole as the image key.
    "q_audio_fingerprint" ->
      """WITH snds AS (
        |  SELECT doc_id AS snd_id, doc_id AS pat, 0 AS pert
        |  FROM documents WHERE doc_id % 5 = 1
        |  UNION ALL
        |  SELECT doc_id + 1, doc_id, 1
        |  FROM documents WHERE doc_id % 5 = 1 AND (doc_id // 5) % 4 = 1),
        |samp AS (
        |  SELECT snd_id, (t.t * 64) // (400 + pat % 257) AS f,
        |    abs(CASE WHEN pert = 1 AND t.t = 0
        |             THEN xor((37 * pat) % 4096 - 2048, 1)
        |             ELSE (37 * pat + 173 * t.t) % 4096 - 2048 END) AS a
        |  FROM snds, generate_series(0, 656) AS t(t)
        |  WHERE t.t < 400 + pat % 257),
        |frames AS (SELECT snd_id, f, sum(a) // count(*) AS m FROM samp GROUP BY 1, 2),
        |thr AS (SELECT snd_id, sum(m) // 64 AS t FROM frames GROUP BY 1),
        |bands AS (
        |  SELECT fr.snd_id, fr.f // 16 AS band,
        |    CAST(sum(CASE WHEN fr.m > th.t THEN 1 << (fr.f % 16) ELSE 0 END) AS INTEGER) AS bv
        |  FROM frames fr JOIN thr th USING (snd_id) GROUP BY 1, 2),
        |sig AS (
        |  SELECT snd_id,
        |    max(CASE WHEN band = 0 THEN bv END) AS h0,
        |    max(CASE WHEN band = 1 THEN bv END) AS h1,
        |    max(CASE WHEN band = 2 THEN bv END) AS h2,
        |    max(CASE WHEN band = 3 THEN bv END) AS h3
        |  FROM bands GROUP BY snd_id),
        |bexp AS (
        |  SELECT snd_id, 0 AS band, h0 AS bv FROM sig UNION ALL
        |  SELECT snd_id, 1, h1 FROM sig UNION ALL
        |  SELECT snd_id, 2, h2 FROM sig UNION ALL
        |  SELECT snd_id, 3, h3 FROM sig),
        |capped AS (SELECT snd_id, band, bv FROM (
        |  SELECT snd_id, band, bv,
        |    row_number() OVER (PARTITION BY band, bv ORDER BY snd_id) AS rn
        |  FROM bexp) WHERE rn <= 128),
        |cand AS (
        |  SELECT DISTINCT a.snd_id AS doc_a, b.snd_id AS doc_b,
        |    CAST(bit_count(xor(sa.h0, sb.h0)) + bit_count(xor(sa.h1, sb.h1))
        |       + bit_count(xor(sa.h2, sb.h2)) + bit_count(xor(sa.h3, sb.h3)) AS BIGINT)
        |      AS hamming
        |  FROM capped a JOIN capped b
        |    ON a.band = b.band AND a.bv = b.bv AND a.snd_id < b.snd_id
        |  JOIN sig sa ON sa.snd_id = a.snd_id
        |  JOIN sig sb ON sb.snd_id = b.snd_id)
        |SELECT doc_a, doc_b, hamming
        |FROM cand WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,
    // Replays the aHash from the closed-form pixel pattern (grayscale
    // -> 8x8 average pool -> mean-of-means threshold -> 16-bit bands),
    // never seeing the bytes; pairing is the same band pigeonhole.
    "q_image_phash" ->
      """WITH imgs AS (
        |  SELECT doc_id AS img_id, doc_id AS pat, 0 AS pert,
        |    CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS fmt
        |  FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 1, doc_id, 1,
        |    CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END
        |  FROM documents WHERE doc_id % 5 = 0 AND (doc_id // 5) % 4 = 1),
        |px AS (
        |  SELECT img_id, fmt,
        |    (gy.y * 8) // (8 + pat % 7) * 8 + (gx.x * 8) // (8 + pat % 9) AS c,
        |    (CASE WHEN pert = 1 AND gx.x = 0 AND gy.y = 0
        |          THEN xor((31 * pat) % 256, 1)
        |          ELSE (31 * pat + 7 * gx.x + 13 * gy.y) % 256 END
        |     + (17 * pat + 5 * gx.x + 11 * gy.y) % 256
        |     + (23 * pat + 3 * gx.x + 19 * gy.y) % 256) // 3 AS gray
        |  FROM imgs,
        |    generate_series(0, 15) AS gx(x),
        |    generate_series(0, 13) AS gy(y)
        |  WHERE gx.x < 8 + pat % 9 AND gy.y < 8 + pat % 7),
        |cells AS (SELECT img_id, fmt, c, sum(gray) // count(*) AS m
        |          FROM px GROUP BY img_id, fmt, c),
        |thr AS (SELECT img_id, sum(m) // 64 AS t FROM cells GROUP BY img_id),
        |bands AS (
        |  SELECT c.img_id, c.fmt, c.c // 16 AS band,
        |    CAST(sum(CASE WHEN c.m > t.t THEN 1 << (c.c % 16) ELSE 0 END) AS INTEGER) AS bv
        |  FROM cells c JOIN thr t ON t.img_id = c.img_id
        |  GROUP BY c.img_id, c.fmt, c.c // 16),
        |sig AS (
        |  SELECT img_id, fmt,
        |    max(CASE WHEN band = 0 THEN bv END) AS h0,
        |    max(CASE WHEN band = 1 THEN bv END) AS h1,
        |    max(CASE WHEN band = 2 THEN bv END) AS h2,
        |    max(CASE WHEN band = 3 THEN bv END) AS h3
        |  FROM bands GROUP BY img_id, fmt),
        |bexp AS (
        |  SELECT img_id, 0 AS band, h0 AS bv FROM sig UNION ALL
        |  SELECT img_id, 1, h1 FROM sig UNION ALL
        |  SELECT img_id, 2, h2 FROM sig UNION ALL
        |  SELECT img_id, 3, h3 FROM sig),
        |capped AS (SELECT img_id, band, bv FROM (
        |  SELECT img_id, band, bv,
        |    row_number() OVER (PARTITION BY band, bv ORDER BY img_id) AS rn
        |  FROM bexp) WHERE rn <= 128),
        |cand AS (
        |  SELECT DISTINCT a.img_id AS doc_a, b.img_id AS doc_b,
        |    sa.fmt AS fmt_a, sb.fmt AS fmt_b,
        |    CAST(bit_count(xor(sa.h0, sb.h0)) + bit_count(xor(sa.h1, sb.h1))
        |       + bit_count(xor(sa.h2, sb.h2)) + bit_count(xor(sa.h3, sb.h3)) AS BIGINT)
        |      AS hamming
        |  FROM capped a JOIN capped b
        |    ON a.band = b.band AND a.bv = b.bv AND a.img_id < b.img_id
        |  JOIN sig sa ON sa.img_id = a.img_id
        |  JOIN sig sb ON sb.img_id = b.img_id)
        |SELECT doc_a, doc_b, fmt_a, fmt_b, hamming
        |FROM cand WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,
    "q_image_decode" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS fmt,
        |    CAST(8 + doc_id % 9 AS BIGINT) AS width,
        |    CAST(8 + doc_id % 7 AS BIGINT) AS height
        |  FROM documents WHERE doc_id % 5 = 0),
        |dx AS (SELECT *, unnest(generate_series(0, width - 1)) AS x FROM dims),
        |px AS (SELECT *, unnest(generate_series(0, height - 1)) AS y FROM dx)
        |SELECT doc_id, fmt, width, height,
        |  CAST(sum((31 * doc_id + 7 * x + 13 * y) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((17 * doc_id + 5 * x + 11 * y) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((23 * doc_id + 3 * x + 19 * y) % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY 1, 2, 3, 4 ORDER BY doc_id""".stripMargin,
    // Recomputes the closed-form waveform's facts WITHOUT the bytes:
    // a match proves the JDK WAVE encode→decode round-trip (RIFF
    // chunks, 16-bit little-endian PCM) reproduced every sample.
    "q_audio_decode" ->
      """WITH ids AS (
        |  SELECT doc_id, CAST(400 + doc_id % 257 AS BIGINT) AS n
        |  FROM documents WHERE doc_id % 5 = 1),
        |tt AS (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS t FROM ids),
        |sv AS (SELECT doc_id, n, t,
        |    (37 * doc_id + 173 * t) % 4096 - 2048 AS v FROM tt),
        |z AS (SELECT doc_id, n, t, v,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY t) AS pv FROM sv)
        |SELECT doc_id, max(n) AS n_samples, CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
        |  CAST(max(abs(v)) AS BIGINT) AS peak_abs,
        |  CAST(sum(CASE WHEN pv IS NOT NULL AND ((v < 0) <> (pv < 0))
        |           THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross
        |FROM z GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_frame_sample" ->
      """WITH feat AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio'
        |         ELSE 'video' END AS media_type,
        |    octet_length(encode(text)) // 1000 + 1 AS n_frames
        |  FROM documents WHERE doc_id % 50 = 0)
        |SELECT doc_id, media_type, n_frames, unnest(generate_series(0, n_frames - 1, 3)) AS frame_idx
        |FROM feat
        |ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
