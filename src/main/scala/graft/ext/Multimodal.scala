package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` content
 * with a typed metadata struct.
 *
 * IMAGE decode is REAL: `javax.imageio` (PNG/JPEG/BMP/GIF) ships in every
 * standard JRE, so `extractFeatures` / `resize` / `imageStats` decode
 * actual pixels when the payload is a decodable image, falling back to the
 * deterministic byte-level path for opaque payloads. AUDIO decode is REAL
 * for RIFF PCM16 WAV (`decodeWav` / `audioStats` — WAV is header framing,
 * no codec needed). COMPRESSED audio and VIDEO kernels remain
 * DETERMINISTIC STUBS (no codecs in this container); their Spark-side
 * machinery — schema, partition-wise batching, column layout — is real
 * and tested.
 *
 * Scale notes: all transforms run as `mapPartitions` over binary batches —
 * one pass, no shuffle, no driver collection. Feature extraction emits
 * fixed-width Array[Float] matching what a real CNN/fbank extractor would
 * produce shape-wise.
 */
object Multimodal {

  // ImageIO defaults to FileCacheImage{Input,Output}Stream: every
  // encode/decode spills through a temp FILE even when the payload is an
  // in-memory byte array. At 32 concurrent decode tasks that is temp-file
  // churn bounded by disk latency, not CPU (measured: q74's 5k-image
  // decode pass regressed 0.4s -> 2.9s purely on temp-dir state). These
  // payloads are whole byte arrays by construction — cache in memory.
  // Runs in the object initializer so any executor that classloads a
  // kernel gets it before its first decode.
  javax.imageio.ImageIO.setUseCache(false)

  /** Real image decode; None for payloads no registered codec accepts. */
  private def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (bytes == null || bytes.isEmpty) None
    else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("format", StringType))))))

  /** Deterministic fake media: bytes derived from (id, text) — stands in
    * for real image/audio payloads so the pipeline is exercisable. */
  def synthesize(df: DataFrame, idCol: String, textCol: String,
                 modality: String = "image"): DataFrame = {
    val withContent = df.select(
      col(idCol).cast(LongType).as("media_id"),
      lit(modality).as("modality"),
      // fake payload: repeated sha2 of the text, truncated to a size
      // derived from the id — deterministic, variable-length
      substring(repeat(sha2(col(textCol), 256), 8),
        lit(1), (pmod(col(idCol), lit(512)) + 64).cast(IntegerType))
        .cast(BinaryType).as("content"))
    withContent.withColumn("meta", struct(
      (pmod(col("media_id"), lit(640)) + 32).cast(IntegerType).as("width"),
      (pmod(col("media_id"), lit(480)) + 32).cast(IntegerType).as("height"),
      lit(3).as("channels"),
      lit(16000).as("sample_rate"),
      lit(if (modality == "image") "png" else "wav").as("format")))
  }

  private val featureDim = 16

  /**
   * Feature extraction. Decodable images get a REAL normalized 16-bin
   * luminance histogram over decoded pixels (ITU-R BT.601 integer luma);
   * opaque payloads keep the deterministic byte-histogram fallback. A
   * production feature net would replace the histogram body only — the
   * mapPartitions batch shape is exactly the real pipeline's.
   */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val hist = new Array[Float](featureDim)
        decodeImage(bytes) match {
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val lum = (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
                  29 * (rgb & 0xff)) >> 8
                hist(math.min(lum * featureDim / 256, featureDim - 1)) += 1f
                x += 1
              }
              y += 1
            }
            val n = (w * h).toFloat
            var j = 0
            while (j < featureDim) { hist(j) /= n; j += 1 }
          case None if bytes != null && bytes.nonEmpty =>
            var i = 0
            while (i < bytes.length) {
              hist((bytes(i) & 0xff) % featureDim) += 1f
              i += 1
            }
            var j = 0
            while (j < featureDim) { hist(j) /= bytes.length; j += 1 }
          case None => ()
        }
        Row(id, hist.toSeq)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /**
   * Resize. Decodable images get a REAL nearest-neighbor pixel resize
   * (src pixel (x*srcW/w, y*srcH/h) — deterministic, so an oracle can
   * reproduce pixel values in closed form) re-encoded as PNG; opaque
   * payloads keep the deterministic byte re-sampling to w*h "pixels".
   */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val schema = media.schema
    val idI = schema.fieldIndex("media_id"); val moI = schema.fieldIndex("modality")
    val coI = schema.fieldIndex("content"); val meI = schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](coI)
        val m = r.getStruct(meI)
        decodeImage(bytes) match {
          case Some(img) =>
            val out = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                out.setRGB(x, y, img.getRGB(x * img.getWidth / w, y * img.getHeight / h))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            Row(r.getLong(idI), r.getString(moI), bos.toByteArray,
              Row(w, h, 3, m.get(3), "png"))
          case None =>
            val out = new Array[Byte](w * h)
            if (bytes != null && bytes.nonEmpty) {
              var i = 0
              while (i < out.length) {
                out(i) = bytes((i.toLong * bytes.length / out.length).toInt)
                i += 1
              }
            }
            Row(r.getLong(idI), r.getString(moI), out,
              Row(w, h, m.get(2), m.get(3), m.get(4)))
        }
      }
    }(RowEncoder.encoderFor(mediaSchema))
  }

  /**
   * Deterministic REAL PNGs: width = id%64+16, height = id%48+16, pixel
   * (x,y) channels r=(7x+13y+id)%256, g=(3x+5y+2id)%256, b=(x+y+3id)%256 —
   * closed-form, so a SQL oracle can verify true decoded dimensions and
   * channel sums without an image library.
   *
   */
  def synthesizeImages(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = mediaSchema
    val src = df.select(col(idCol).cast(LongType).as("media_id"))
    val idI = 0
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idI)
        val w = (id % 64 + 16).toInt
        val h = (id % 48 + 16).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val red = ((7L * x + 13L * y + id) % 256).toInt
            val g = ((3L * x + 5L * y + 2 * id) % 256).toInt
            val b = ((x.toLong + y + 3 * id) % 256).toInt
            img.setRGB(x, y, (red << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, "image", bos.toByteArray, Row(w, h, 3, null, "png"))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /**
   * TRUE decoded image stats — dimensions, band count, and per-channel
   * red sum come from actual pixel decode, not metadata (the gate proves
   * the decode path against a closed-form oracle). Null stats for
   * undecodable payloads.
   */
  def imageStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("sum_red", LongType)))
    val schema = media.schema
    val idI = schema.fieldIndex("media_id")
    val coI = schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idI)
        decodeImage(r.getAs[Array[Byte]](coI)) match {
          case Some(img) =>
            var sumRed = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                sumRed += (img.getRGB(x, y) >> 16) & 0xff
                x += 1
              }
              y += 1
            }
            Row(id, img.getWidth, img.getHeight, img.getRaster.getNumBands, sumRed)
          case None => Row(id, null, null, null, null)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /**
   * Per-image content signatures from one REAL decode pass — the image
   * twin of the text family's (content_hash, minhash) pair:
   *   - `pix_crc`: FNV-1a 64 over the full RGB scan — exact-pixel
   *     identity, independent of the container encoding (a PNG and a BMP
   *     of the same pixels collide on purpose).
   *   - `dhash`: 64-bit perceptual difference hash (public dHash recipe:
   *     9x8 nearest-neighbor BT.601 luma grid, one bit per horizontal
   *     neighbor pair) — stable under re-encode and small global
   *     brightness shifts, close in Hamming distance for visually-near
   *     images.
   * Null signatures for undecodable payloads. mapPartitions over opaque
   * binary (decode is imperative), one pass, no shuffle.
   */
  def imageSignatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("dhash", LongType),
      StructField("pix_crc", LongType)))
    val schema = media.schema
    val idI = schema.fieldIndex("media_id")
    val coI = schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idI)
        decodeImage(r.getAs[Array[Byte]](coI)) match {
          case Some(img) =>
            val w = img.getWidth; val h = img.getHeight
            var crc = 0xcbf29ce484222325L // FNV-1a 64 offset basis
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                var c = crc
                c = (c ^ ((rgb >> 16) & 0xffL)) * 0x100000001b3L
                c = (c ^ ((rgb >> 8) & 0xffL)) * 0x100000001b3L
                c = (c ^ (rgb & 0xffL)) * 0x100000001b3L
                crc = c
                x += 1
              }
              y += 1
            }
            // 9x8 grid -> 64 bits, row-major, bit = lum(x) > lum(x+1)
            val gw = 9; val gh = 8
            val lum = new Array[Int](gw * gh)
            var gy = 0
            while (gy < gh) {
              var gx = 0
              while (gx < gw) {
                val rgb = img.getRGB(gx * w / gw, gy * h / gh)
                lum(gy * gw + gx) = (77 * ((rgb >> 16) & 0xff) +
                  150 * ((rgb >> 8) & 0xff) + 29 * (rgb & 0xff)) >> 8
                gx += 1
              }
              gy += 1
            }
            var bits = 0L
            gy = 0
            while (gy < gh) {
              var gx = 0
              while (gx < gw - 1) {
                bits = (bits << 1) |
                  (if (lum(gy * gw + gx) > lum(gy * gw + gx + 1)) 1L else 0L)
                gx += 1
              }
              gy += 1
            }
            Row(id, w, h, bits, crc)
          case None => Row(id, null, null, null, null)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /**
   * Container-independent EXACT image dedup: pairs whose decoded pixels
   * are identical, via a single hash-join on (width, height, pix_crc) —
   * an 20-byte shuffle key per image regardless of image size, the same
   * slim-key discipline as the text exact dedup.
   */
  def imageExactDupPairs(media: DataFrame): DataFrame = {
    val sig = imageSignatures(media).filter(col("pix_crc").isNotNull)
      .select(col("media_id").as("id"), col("width"), col("height"),
        col("pix_crc"))
    val sig2 = sig.select(col("id").as("id2"), col("width"), col("height"),
      col("pix_crc"))
    sig.join(sig2, Seq("width", "height", "pix_crc"))
      .filter(col("id") < col("id2"))
      .select("id", "id2")
  }

  /**
   * Perceptual NEAR-dup image pairs: Hamming(dhash) <= maxHamming via the
   * simhashPairs pigeonhole — 4x16-bit chunks of the dHash band the
   * candidate join (maxHamming <= 3 guarantees a shared exact chunk), a
   * broadcast anti-join caps pathological buckets, and `bit_count`
   * verifies the full 64-bit distance on candidates only.
   */
  def imageNearDupPairs(media: DataFrame, maxHamming: Int = 2,
                        maxBucket: Int = 10000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "pigeonhole over 4 chunks covers maxHamming <= 3")
    val sig = imageSignatures(media).filter(col("dhash").isNotNull)
      .select(col("media_id").as("id"), col("dhash"))
    val chunked = sig.select(col("id"), col("dhash"),
        posexplode(array((0 until 4).map(i =>
          shiftrightunsigned(col("dhash"), i * 16)
            .bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "cval")
    val oversized = chunked.groupBy("chunk", "cval")
      .agg(count(lit(1)).as("_n")).filter(col("_n") > maxBucket)
      .select("chunk", "cval")
    val capped = chunked.join(broadcast(oversized),
      Seq("chunk", "cval"), "left_anti")
    capped
      .join(capped.select(col("chunk"), col("cval"), col("id").as("id2"),
        col("dhash").as("dhash2")), Seq("chunk", "cval"))
      .filter(col("id") < col("id2"))
      .select("id", "id2", "dhash", "dhash2").distinct()
      .filter(expr(s"bit_count(dhash ^ dhash2) <= $maxHamming"))
      .select("id", "id2")
  }

  /** Overflow report for [[imageNearDupPairs]]' pigeonhole bucket cap
    * (the uniform dedup-family interface — README "Overflow reports"):
    * (id, overflow_bands, total_bands), total_bands = 4;
    * overflow_bands == 4 marks images fully excluded from the candidate
    * join (route through the exact-dup pass or raise the cap). */
  def imageNearDupOverflow(media: DataFrame,
                           maxBucket: Int = 10000): DataFrame =
    Dedup.bandOverflowReport(
      imageSignatures(media).filter(col("dhash").isNotNull)
        .select(col("media_id").as("id"), col("dhash"))
        .select(col("id"),
          posexplode(array((0 until 4).map(i =>
            shiftrightunsigned(col("dhash"), i * 16)
              .bitwiseAND(lit(0xffffL))): _*)))
        .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "cval"),
      "chunk", "cval", maxBucket)

  /**
   * Deterministic REAL WAVs (RIFF PCM16 mono): n = id%400+100 samples at
   * 8 kHz, sample i = ((id*31 + i*7) % 2003) - 1001 — closed-form, so a
   * SQL oracle can verify true decoded sample statistics. WAV needs no
   * codec, only RIFF header framing, so unlike compressed audio this
   * path is fully real in a bare JRE.
   */
  def synthesizeWavs(df: DataFrame, idCol: String): DataFrame = {
    val src = df.select(col(idCol).cast(LongType).as("media_id"))
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = (id % 400 + 100).toInt
        Row(id, "audio", wavBytes(id, n, 8000), Row(null, null, 1, 8000, "wav"))
      }
    }(RowEncoder.encoderFor(mediaSchema))
  }

  private def wavBytes(id: Long, n: Int, rate: Int): Array[Byte] = {
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")); buf.putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")); buf.putInt(16)
    buf.putShort(1); buf.putShort(1)                  // PCM, mono
    buf.putInt(rate); buf.putInt(rate * 2)            // byte rate
    buf.putShort(2); buf.putShort(16)                 // block align, bits
    buf.put("data".getBytes("US-ASCII")); buf.putInt(dataLen)
    var i = 0
    while (i < n) {
      buf.putShort((((id * 31 + i * 7L) % 2003) - 1001).toShort); i += 1
    }
    buf.array()
  }

  /** splitmix64 finalizer (public-domain PRNG mix) over (id, i) — the
    * noise kernel for the near-dup gate media below. */
  private def mix64(id: Long, i: Long): Long = {
    var z = id * 0x9E3779B97F4A7C15L + i * 0xBF58476D1CE4E5B9L + 0x2545F4914F6CDD1DL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /**
   * Deterministic NOISE PNGs for the perceptual near-dup gates: same
   * dims as [[synthesizeImages]] but channels are splitmix64 noise in
   * [0, 200) + `shift`. Noise makes the 64 dHash bits near-independent
   * across ids (the closed-form gradient images produce near-monotone
   * luma ramps whose dHashes collide), so distinct ids sit ~32 bits
   * apart. A `shift`-ed twin adds exactly `shift` to every channel with
   * no clipping (values stay <= 199+shift <= 255 for shift <= 56), which
   * adds exactly `shift` to every BT.601 integer luma (the weights sum
   * to 256: (77+150+29)*s >> 8 = s) — so the twin's dHash is
   * BIT-IDENTICAL while every pixel differs.
   */
  def synthesizeNoiseImages(df: DataFrame, idCol: String,
                            shift: Int = 0): DataFrame = {
    require(shift >= 0 && shift <= 56, "shift must keep channels <= 255")
    val src = df.select(col(idCol).cast(LongType).as("media_id"))
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = (id % 64 + 16).toInt
        val h = (id % 48 + 16).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val m = mix64(id, y.toLong * w + x)
            val red = ((m & 0xffff) % 200).toInt + shift
            val g = (((m >>> 16) & 0xffff) % 200).toInt + shift
            val b = (((m >>> 32) & 0xffff) % 200).toInt + shift
            img.setRGB(x, y, (red << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, "image", bos.toByteArray, Row(w, h, 3, null, "png"))
      }
    }(RowEncoder.encoderFor(mediaSchema))
  }

  /**
   * Deterministic NOISE WAVs for the perceptual near-dup gate: same
   * framing as [[synthesizeWavs]] but samples are splitmix64 noise in
   * [-1001, 1001] scaled by `gain`. Noise gives each id a distinct
   * energy envelope (the closed-form WAVs are modular ramps — monotone
   * envelopes that collide under envelope hashing). `gain = -1` is a
   * phase inversion: every PCM sample differs but every frame ENERGY is
   * identical, so [[audioPerceptualSignatures]] is exactly invariant —
   * the canonical perceptually-identical transform the gate constructs.
   */
  def synthesizeNoiseWavs(df: DataFrame, idCol: String,
                          gain: Int = 1): DataFrame = {
    require(math.abs(gain) * 1001 < 32768, "gain would clip PCM16")
    val src = df.select(col(idCol).cast(LongType).as("media_id"))
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = (id % 400 + 100).toInt
        val dataLen = n * 2
        val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.put("RIFF".getBytes("US-ASCII")); buf.putInt(36 + dataLen)
        buf.put("WAVE".getBytes("US-ASCII"))
        buf.put("fmt ".getBytes("US-ASCII")); buf.putInt(16)
        buf.putShort(1); buf.putShort(1)
        buf.putInt(8000); buf.putInt(16000)
        buf.putShort(2); buf.putShort(16)
        buf.put("data".getBytes("US-ASCII")); buf.putInt(dataLen)
        var i = 0
        while (i < n) {
          val s = ((mix64(id, i) % 2003 + 2003) % 2003 - 1001).toInt
          buf.putShort((gain * s).toShort)
          i += 1
        }
        Row(id, "audio", buf.array(), Row(null, null, 1, 8000, "wav"))
      }
    }(RowEncoder.encoderFor(mediaSchema))
  }

  /** REAL RIFF/WAVE parse (PCM16 only): walks the chunk list, returns
    * (sampleRate, channels, samples). None for anything else. */
  private[ext] def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    if (bytes == null || bytes.length < 44) return None
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    if (tag() != "RIFF") return None
    buf.getInt() // riff size
    if (tag() != "WAVE") return None
    var rate = 0; var channels = 0; var bits = 0; var fmtOk = false
    var samples: Array[Short] = null
    while (buf.remaining() >= 8) {
      val id = tag(); val len = buf.getInt()
      if (len < 0 || len > buf.remaining()) return None
      id match {
        case "fmt " =>
          val fmt = buf.getShort(); channels = buf.getShort()
          rate = buf.getInt(); buf.getInt(); buf.getShort()
          bits = buf.getShort()
          fmtOk = fmt == 1 && bits == 16
          buf.position(buf.position() + (len - 16))
        case "data" =>
          samples = new Array[Short](len / 2)
          buf.asShortBuffer().get(samples)
          buf.position(buf.position() + len)
        case _ => buf.position(buf.position() + len)
      }
      // RIFF chunks are word-aligned: an odd-length chunk (LIST/INFO,
      // fact, ...) is followed by a pad byte that is NOT counted in len
      if ((len & 1) == 1 && buf.remaining() > 0)
        buf.position(buf.position() + 1)
    }
    if (fmtOk && samples != null) Some((rate, channels, samples)) else None
  }

  /**
   * Audio content signatures from one REAL PCM decode pass — the audio
   * twin of [[imageSignatures]]: FNV-1a 64 over the decoded sample
   * stream plus (n_samples, sample_rate). Container-independent exact
   * identity — two WAVs with different chunk layouts (or a future
   * lossless codec decoding to the same PCM) collide on purpose. Null
   * for undecodable payloads.
   */
  def audioSignatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_samples", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("pcm_crc", LongType)))
    val schema = media.schema
    val idI = schema.fieldIndex("media_id")
    val coI = schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idI)
        decodeWav(r.getAs[Array[Byte]](coI)) match {
          case Some((rate, _, samples)) =>
            var crc = 0xcbf29ce484222325L
            var i = 0
            while (i < samples.length) {
              val s = samples(i) & 0xffff
              crc = (crc ^ (s & 0xffL)) * 0x100000001b3L
              crc = (crc ^ ((s >> 8) & 0xffL)) * 0x100000001b3L
              i += 1
            }
            Row(id, samples.length, rate, crc)
          case None => Row(id, null, null, null)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Container-independent EXACT audio dedup: identical decoded PCM via a
    * single hash-join on the slim (n_samples, sample_rate, pcm_crc) key. */
  def audioExactDupPairs(media: DataFrame): DataFrame = {
    val sig = audioSignatures(media).filter(col("pcm_crc").isNotNull)
      .select(col("media_id").as("id"), col("n_samples"),
        col("sample_rate"), col("pcm_crc"))
    val sig2 = sig.select(col("id").as("id2"), col("n_samples"),
      col("sample_rate"), col("pcm_crc"))
    sig.join(sig2, Seq("n_samples", "sample_rate", "pcm_crc"))
      .filter(col("id") < col("id2"))
      .select("id", "id2")
  }

  /**
   * Perceptual audio signatures — the audio twin of the image dHash,
   * following the public chromaprint/acoustic-fingerprint recipe family
   * in its simplest banded form: the decoded PCM is split into 65 equal
   * time frames, each frame's ENERGY (sum of squared samples) is
   * computed, and bit j of the 64-bit signature is E(j) > E(j+1) — a
   * difference hash over the energy envelope. Comparing energies (not
   * amplitudes) makes the signature EXACTLY invariant under uniform
   * gain scaling and phase inversion — the canonical
   * perceptually-identical transforms — while distinct material yields
   * near-independent envelope bits. Null for undecodable payloads AND
   * for clips shorter than one sample per frame (< 65 samples): their
   * envelope is mostly empty frames, so unrelated short clips would
   * collapse onto near-identical low-entropy signatures and flood the
   * near-dup join with false positives — too short for envelope
   * semantics, excluded instead. One decode pass, mapPartitions, no
   * shuffle.
   */
  def audioPerceptualSignatures(media: DataFrame): DataFrame = {
    val frames = 65
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ahash", LongType)))
    val schema = media.schema
    val idI = schema.fieldIndex("media_id")
    val coI = schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idI)
        decodeWav(r.getAs[Array[Byte]](coI)) match {
          case Some((_, _, samples)) if samples.length < frames =>
            Row(id, null)
          case Some((_, _, samples)) =>
            val n = samples.length
            val e = new Array[Long](frames)
            var j = 0
            while (j < frames) {
              // frame j covers samples [j*n/frames, (j+1)*n/frames)
              var i = (j.toLong * n / frames).toInt
              val end = ((j + 1).toLong * n / frames).toInt
              var acc = 0L
              while (i < end) {
                val s = samples(i).toLong
                acc += s * s
                i += 1
              }
              e(j) = acc
              j += 1
            }
            var bits = 0L
            j = 0
            while (j < frames - 1) {
              bits = (bits << 1) | (if (e(j) > e(j + 1)) 1L else 0L)
              j += 1
            }
            Row(id, bits)
          case None => Row(id, null)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /**
   * Perceptual NEAR-dup audio pairs: Hamming(ahash) <= maxHamming via
   * the same 4x16-bit pigeonhole banding as [[imageNearDupPairs]] —
   * maxHamming <= 3 guarantees a shared exact chunk, a broadcast
   * anti-join caps pathological buckets (silence-heavy corpora collapse
   * onto few envelope shapes), and `bit_count` verifies the full 64-bit
   * distance on candidates only.
   */
  def audioNearDupPairs(media: DataFrame, maxHamming: Int = 2,
                        maxBucket: Int = 10000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "pigeonhole over 4 chunks covers maxHamming <= 3")
    val sig = audioPerceptualSignatures(media).filter(col("ahash").isNotNull)
      .select(col("media_id").as("id"), col("ahash"))
    val chunked = sig.select(col("id"), col("ahash"),
        posexplode(array((0 until 4).map(i =>
          shiftrightunsigned(col("ahash"), i * 16)
            .bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "cval")
    val oversized = chunked.groupBy("chunk", "cval")
      .agg(count(lit(1)).as("_n")).filter(col("_n") > maxBucket)
      .select("chunk", "cval")
    val capped = chunked.join(broadcast(oversized),
      Seq("chunk", "cval"), "left_anti")
    capped
      .join(capped.select(col("chunk"), col("cval"), col("id").as("id2"),
        col("ahash").as("ahash2")), Seq("chunk", "cval"))
      .filter(col("id") < col("id2"))
      .select("id", "id2", "ahash", "ahash2").distinct()
      .filter(expr(s"bit_count(ahash ^ ahash2) <= $maxHamming"))
      .select("id", "id2")
  }

  /** Overflow report for [[audioNearDupPairs]]' pigeonhole bucket cap —
    * the audio twin of [[imageNearDupOverflow]], same
    * (id, overflow_bands, total_bands) shape. */
  def audioNearDupOverflow(media: DataFrame,
                           maxBucket: Int = 10000): DataFrame =
    Dedup.bandOverflowReport(
      audioPerceptualSignatures(media).filter(col("ahash").isNotNull)
        .select(col("media_id").as("id"), col("ahash"))
        .select(col("id"),
          posexplode(array((0 until 4).map(i =>
            shiftrightunsigned(col("ahash"), i * 16)
              .bitwiseAND(lit(0xffffL))): _*)))
        .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "cval"),
      "chunk", "cval", maxBucket)

  /**
   * TRUE decoded audio stats — sample count, rate, exact amplitude sum
   * and peak come from a real PCM decode, not metadata. Zero-row stats
   * for undecodable payloads (mirrors imageStats' nulls).
   */
  def audioStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_samples", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("sum_amp", LongType),
      StructField("peak_amp", IntegerType)))
    val schema = media.schema
    val idI = schema.fieldIndex("media_id")
    val coI = schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idI)
        decodeWav(r.getAs[Array[Byte]](coI)) match {
          case Some((rate, _, samples)) =>
            var sum = 0L; var peak = 0
            var i = 0
            while (i < samples.length) {
              val s = samples(i).toInt
              sum += s
              if (math.abs(s) > peak) peak = math.abs(s)
              i += 1
            }
            Row(id, samples.length, rate, sum, peak)
          case None => Row(id, null, null, null, null)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** STUB frame sampling: n evenly-spaced byte windows ("frames"). */
  def sampleFrames(media: DataFrame, n: Int, frameSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val schema = media.schema
    val idI = schema.fieldIndex("media_id")
    val coI = schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](coI)
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else (0 until n).iterator.map { f =>
          val start = (f.toLong * bytes.length / n).toInt
          val end = math.min(start + frameSize, bytes.length)
          Row(r.getLong(idI), f, java.util.Arrays.copyOfRange(bytes, start, end))
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }
}
