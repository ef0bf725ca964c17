package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video travel as opaque `binary`
 * columns with a typed metadata struct. The Spark-side machinery (schema,
 * partition-parallel batch UDF shape, frame slicing) is real and tested.
 * Feature extraction has two equivalent paths: `byteFeatures` (native
 * column expressions, oracle-checked) and the partition-batched codec
 * slot. All three media families decode FOR REAL with zero added
 * dependencies via JDK-built-in codecs: [[decodeImageBatched]]
 * (PNG/BMP/GIF/JPEG pixels, `javax.imageio`), [[decodeAudioBatched]]
 * (WAV/AIFF/AU PCM, `javax.sound.sampled`), and [[decodeVideoBatched]]
 * (multi-frame animated GIF with temporal frame sampling). The generic
 * [[decodeBatched]] keeps the byte-statistics body as the clearly-marked
 * stand-in shape for codecs the JDK lacks (MP4/H.264, Opus, …): swap the
 * row body, keep the schema, batching and fallback contract.
 */
object Multimodal {

  // ImageIO's default stream cache is DISK-backed: every
  // createImageInputStream / ImageIO.write(..., OutputStream) call wraps
  // the in-memory bytes in a FileCache stream — one temp FILE created,
  // written, read and deleted PER ROW. All payloads here are in-memory
  // byte arrays (media columns), so the file cache is pure overhead —
  // measured 3.0 s → 0.4 s on the 32-task frames_video codec stage at
  // sf0.1. NOTE: this is a JVM-GLOBAL mutation that merely loading this
  // class performs — co-resident code using ImageIO on large streams
  // loses disk caching and buffers fully in memory. Embedders that need
  // the disk cache back opt out with
  // `-Dgraft.multimodal.imageioCache=true` (the codec slots then pay the
  // per-row temp files again); executors inherit the default because the
  // slot classes load lazily per executor JVM.
  if (!java.lang.Boolean.getBoolean("graft.multimodal.imageioCache"))
    javax.imageio.ImageIO.setUseCache(false)

  val MediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Largest canvas the video decoder will allocate (2^26 px ≈ 8K video
    * ×1.9, a 256 MB transient int raster): header-declared dimensions in a
    * crawled corpus are untrusted, and an unbounded allocation turns a
    * crafted 16-bit-field header into an OutOfMemoryError — an Error, not
    * caught by NonFatal — that fails the task. Over-cap payloads take the
    * byte-stats fallback like any other undecodable row. */
  private val MaxCanvasPixels: Long = 1L << 26

  /** Largest PCM buffer the audio resampler will allocate (256 MB ≈ 23
    * minutes of 48 kHz stereo 16-bit) — the audio analog of
    * [[MaxCanvasPixels]]: the header-declared sample rate is untrusted,
    * and dstFrames = srcFrames × target/src explodes when a crafted
    * header claims sampleRate=1 (multi-GB allocation → OutOfMemoryError
    * past NonFatal) or silently WRAPS through a bare `.toInt` (truncated
    * output stamped resampled=true). Over-cap payloads pass through
    * unchanged like every other undecodable row. */
  private val MaxPcmBytes: Long = 1L << 28

  /** Sum of per-pixel Rec. 601 luminance (0.299 R + 0.587 G + 0.114 B)
    * over a decoded raster — ONE copy shared by the image and video
    * decoders so the two features cannot drift. */
  private def lumaSum(im: java.awt.image.BufferedImage): Double = {
    var sum = 0.0
    var y = 0
    while (y < im.getHeight) {
      var x = 0
      while (x < im.getWidth) {
        val rgb = im.getRGB(x, y)
        sum += 0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    sum
  }

  /** Null-safe format from a possibly-null metadata struct: a crawled
    * corpus carries rows with no metadata at all, and the decode contract
    * is degrade-to-fallback, never an NPE'd task. */
  private def fmtOf(meta: Row): String =
    if (meta == null) null else meta.getString(0)

  /** Lock-free RIFF/WAVE codec for the plain PCM16LE shape — the hot path
    * of the audio slots. `javax.sound.sampled.AudioSystem` routes every
    * encode AND decode through a globally synchronized provider registry:
    * measured on this host, 32 threads decoding tiny WAVs achieve exactly
    * single-thread throughput (the whole codec stage serializes). The
    * common container needs none of that machinery; non-PCM16 WAVs and
    * every other container still take the JDK path (readPcm16 = None).
    * The writer's output is byte-identical to the JDK WaveFileWriter's
    * canonical 44-byte-header layout (MultimodalProps pins this), so
    * artifacts remain readable by any WAV consumer. */
  private[graft] object Wav {
    private val Riff = Array[Byte]('R', 'I', 'F', 'F')
    private val Wave = Array[Byte]('W', 'A', 'V', 'E')

    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def tag(b: Array[Byte], o: Int, t: Array[Byte]): Boolean =
      b(o) == t(0) && b(o + 1) == t(1) && b(o + 2) == t(2) && b(o + 3) == t(3)

    /** Parse a plain PCM16LE WAV: (sampleRate, channels, data-chunk
      * bytes), or None when the container is anything else (caller falls
      * back to the AudioSystem path — identical accepted-format surface,
      * identical PCM bytes for this shape since converting PCM16LE to
      * PCM16LE is the JDK's pass-through). */
    def readPcm16(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      if (bytes == null || bytes.length < 44 ||
        !tag(bytes, 0, Riff) || !tag(bytes, 8, Wave)) return None
      var off = 12
      var rate = -1; var ch = -1; var ok = false
      var data: Array[Byte] = null
      while (off + 8 <= bytes.length && (data == null || !ok)) {
        val size = u32(bytes, off + 4)
        val body = off + 8
        if (size < 0 || body + size > bytes.length) return None // truncated
        if (tag(bytes, off, Array[Byte]('f', 'm', 't', ' '))) {
          if (size < 16) return None
          val fmt = u16(bytes, body)
          val bits = u16(bytes, body + 14)
          ch = u16(bytes, body + 2)
          rate = u32(bytes, body + 4).toInt
          ok = fmt == 1 && bits == 16 && ch >= 1 && rate >= 1
          if (!ok) return None // PCM but not 16-bit, or esoteric: JDK path
        } else if (tag(bytes, off, Array[Byte]('d', 'a', 't', 'a'))) {
          data = java.util.Arrays.copyOfRange(bytes, body, (body + size).toInt)
        }
        off = body + size.toInt + (size.toInt & 1) // RIFF chunks pad to even
      }
      if (ok && data != null) Some((rate, ch, data)) else None
    }

    /** Canonical 44-byte-header PCM16LE WAV writer — the byte-for-byte
      * layout the JDK WaveFileWriter emits for this encoding. */
    def writePcm16(rate: Int, channels: Int, data: Array[Byte]): Array[Byte] = {
      val block = channels * 2
      val out = new Array[Byte](44 + data.length)
      def put(o: Int, t: Array[Byte]): Unit = System.arraycopy(t, 0, out, o, 4)
      def p16(o: Int, v: Int): Unit = {
        out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      }
      def p32(o: Int, v: Long): Unit = {
        out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
        out(o + 2) = ((v >> 16) & 0xff).toByte; out(o + 3) = ((v >> 24) & 0xff).toByte
      }
      put(0, Riff); p32(4, 36L + data.length); put(8, Wave)
      put(12, Array[Byte]('f', 'm', 't', ' ')); p32(16, 16L)
      p16(20, 1); p16(22, channels); p32(24, rate.toLong)
      p32(28, rate.toLong * block); p16(32, block); p16(34, 16)
      put(36, Array[Byte]('d', 'a', 't', 'a')); p32(40, data.length.toLong)
      System.arraycopy(data, 0, out, 44, data.length)
      out
    }
  }

  /** Compute-parallelism floor for the codec slots (optimization guide
    * §2.5 input skew / §2.6 idle capacity): codec work is CPU-bound per
    * ROW, not per byte, so a narrow input layout — one tiny single-row-
    * group parquet file, an unsplittable archive, a small id frame feeding
    * a synthesizer — serializes the whole partition-batched stage on a
    * handful of cores while the rest of the cluster idles. ONE helper for
    * the whole library: [[TextOps.spreadForCompute]] carries the
    * shuffle-boundary/subquery guard (probing `.rdd` on an adaptive plan
    * with exchanges materializes its query stages eagerly and the
    * subsequent action re-executes them — chained codec slots, where one
    * slot's output plan carries the previous slot's Repartition, hit
    * exactly that), the >= defaultParallelism identity branch for any
    * at-scale input, and the streaming identity. A private duplicate here
    * used to probe `.rdd` unguarded; it is gone. */
  private def spreadForCompute(df: DataFrame): DataFrame =
    TextOps.spreadForCompute(df)

  /** Decode a single image with the header-dim guard: width/height come
    * from the header and are bounded by [[MaxCanvasPixels]] BEFORE the
    * raster is allocated — `ImageIO.read`'s eager allocation would turn a
    * crafted multi-GB header claim into an OutOfMemoryError, an Error
    * NonFatal can't catch, failing the task instead of degrading. */
  private def readImageBounded(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        val (w, h) = (reader.getWidth(0), reader.getHeight(0))
        if (w < 1 || h < 1 || w.toLong * h > MaxCanvasPixels) None
        else Some(reader.read(0))
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Attach a fake media payload derived from a text column: the bytes are
    * the UTF-8 encoding (deterministic), the metadata is synthesized. */
  def withFakeMedia(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("media", encode(col(textCol), "UTF-8"))
      .withColumn("media_meta", struct(
        lit("fake/raw").as("format"),
        (length(col(textCol)) % 64 + 1).cast("int").as("width"),
        (length(col(textCol)) % 48 + 1).cast("int").as("height"),
        (length(col(textCol)) % 8 + 1).cast("int").as("n_frames")))

  /**
   * Byte-statistics features over the binary payload as NATIVE column
   * expressions — whole-stage codegen, pushdown-friendly, and expressible
   * in the DuckDB oracle. This is the default feature path; `decodeBatched`
   * below keeps the partition-batched shape for real codecs.
   */
  def byteFeatures(df: DataFrame, idCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      length(col("media")).as("byte_len"),
      graft.functions.VectorFunctions.byteMeanNative(col("media")).as("mean_byte"),
      col("media_meta").getField("format").as("format"))

  /**
   * Decode + feature-extract, batched per partition (the Scala analog of
   * `mapInPandas`: one iterator pass, no per-row task overhead, output
   * schema declared up front). STUB: features are byte statistics standing
   * in for pixel/sample decoding — a real build swaps the row body for an
   * image/audio codec call without touching the pipeline shape. Feature
   * values are identical to `byteFeatures` (asserted in BatchApiSpec).
   */
  def decodeBatched(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("byte_len", IntegerType),
      StructField("mean_byte", DoubleType),
      StructField("format", StringType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex("media")
    val metaIdx = df.schema.fieldIndex("media_meta")
    implicit val enc = RowEncoder.encoderFor(outSchema)
    spreadForCompute(df).mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val fmt = fmtOf(r.getStruct(metaIdx))
        // STUB decode: byte statistics stand in for pixel/sample decoding.
        if (bytes == null) Row(r.getLong(idIdx), null, null, fmt)
        else Row(r.getLong(idIdx), bytes.length,
          graft.functions.ByteMeanUtil.mean(bytes), fmt)
      }
    }
  }

  /**
   * REAL image decode in the same partition-batched codec slot, using the
   * JDK's built-in `javax.imageio` (PNG/BMP/GIF/JPEG readers ship with
   * every JRE — no external dependency, works headless). Rows whose
   * metadata format starts with `image/` are decoded to pixels: true
   * width/height
   * from the decoded raster and mean luminance (Rec. 601
   * 0.299 R + 0.587 G + 0.114 B over all pixels). Non-image formats and
   * undecodable payloads keep the byte-statistics fallback and report
   * `decoded = false` — the honest degradation, not an error, so one
   * pipeline handles mixed corpora; the fallback byte mean lives in its
   * own `mean_byte` column (like the audio/video decoders) so pixel
   * luminance and raw byte statistics — both 0-255 scaled — can never
   * blend in one aggregate. Header-declared dimensions are
   * bounded by [[MaxCanvasPixels]] BEFORE the raster allocates (see
   * [[readImageBounded]]). Per-row cost is linear in pixels; the
   * decode runs inside `mapPartitions` exactly like [[decodeBatched]], so
   * it distributes and batches identically at any scale.
   */
  def decodeImageBatched(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("byte_len", IntegerType),
      StructField("decoded", BooleanType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_luma", DoubleType),
      StructField("mean_byte", DoubleType),
      StructField("format", StringType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex("media")
    val metaIdx = df.schema.fieldIndex("media_meta")
    implicit val enc = RowEncoder.encoderFor(outSchema)
    spreadForCompute(df).mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val fmt = fmtOf(r.getStruct(metaIdx))
        val img =
          if (bytes != null && fmt != null && fmt.startsWith("image/"))
            // NonFatal, not just IOException: the JDK GIF/BMP/JPEG readers
            // throw RuntimeExceptions (AIOOBE, IllegalArgument,
            // NegativeArraySize) on truncated/corrupt payloads — a crawled
            // corpus WILL contain those, and the contract is the
            // byte-stats fallback, never a failed task
            try readImageBounded(bytes)
            catch { case scala.util.control.NonFatal(_) => None }
          else None
        img match {
          case Some(im) =>
            val (w, h) = (im.getWidth, im.getHeight)
            Row(r.getLong(idIdx), bytes.length, true, w, h,
              lumaSum(im) / (w.toLong * h), null, fmt)
          case None if bytes == null =>
            Row(r.getLong(idIdx), null, false, null, null, null, null, fmt)
          case None =>
            Row(r.getLong(idIdx), bytes.length, false, null, null, null,
              graft.functions.ByteMeanUtil.mean(bytes), fmt)
        }
      }
    }
  }

  /** Parse an audio container and convert to 16-bit signed little-endian
    * PCM (the JDK converter handles 8/24/32-bit and unsigned variants) —
    * ONE copy shared by the audio decoder and resampler so the two stages
    * cannot drift. Returns (sampleRate, channels, interleaved PCM16LE
    * bytes); callers wrap in the NonFatal degrade-to-fallback contract. */
  private def pcm16(bytes: Array[Byte]): (Int, Int, Array[Byte]) =
    // fast path first: the AudioSystem provider registry serializes EVERY
    // decode behind one global lock (measured: 32 executor threads run at
    // single-thread throughput), so the common container — plain PCM16LE
    // WAV — parses lock-free; anything else (AIFF/AU, 8/24/32-bit,
    // unsigned, float, compressed) takes the JDK converter exactly as
    // before, so the accepted-format surface is unchanged
    Wav.readPcm16(bytes).getOrElse {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val base = ais.getFormat
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          base.getSampleRate, 16, base.getChannels,
          base.getChannels * 2, base.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais)
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        var n = pcm.read(tmp)
        while (n > 0) { buf.write(tmp, 0, n); n = pcm.read(tmp) }
        (base.getSampleRate.toInt, base.getChannels, buf.toByteArray)
      } finally ais.close()
    }

  /**
   * REAL audio decode in the same partition-batched codec slot, using the
   * JDK's built-in `javax.sound.sampled` (WAV/AIFF/AU readers ship with
   * every JRE — no external dependency, works headless). Rows whose
   * metadata format starts with `audio/` are parsed and converted to
   * 16-bit signed PCM (the JDK converter handles 8/24/32-bit and unsigned
   * variants), yielding the true sample rate, channel count, per-channel
   * sample count, duration in seconds, and RMS amplitude normalized to
   * full scale (a full-scale square wave is 1.0, a full-scale sine
   * 1/√2). Non-audio formats and undecodable payloads keep the
   * byte-statistics fallback (`mean_byte`, `decoded = false`) — the same
   * honest degradation as [[decodeImageBatched]], so one pipeline handles
   * mixed corpora. Per-row cost is linear in samples; the decode runs
   * inside `mapPartitions` exactly like [[decodeBatched]], so it
   * distributes and batches identically at any scale.
   */
  def decodeAudioBatched(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("byte_len", IntegerType),
      StructField("decoded", BooleanType, nullable = false),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_samples", LongType),
      StructField("duration_s", DoubleType),
      StructField("rms", DoubleType),
      StructField("mean_byte", DoubleType),
      StructField("format", StringType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex("media")
    val metaIdx = df.schema.fieldIndex("media_meta")
    implicit val enc = RowEncoder.encoderFor(outSchema)
    spreadForCompute(df).mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val fmt = fmtOf(r.getStruct(metaIdx))
        val decoded: Option[(Int, Int, Long, Double)] =
          if (bytes != null && fmt != null && fmt.startsWith("audio/")) {
            try {
              val (sr, ch, data) = pcm16(bytes)
              var i = 0; var sumSq = 0.0; var cnt = 0L
              while (i + 1 < data.length) {
                // little-endian 16-bit signed, normalized to full scale
                val s = ((data(i) & 0xff) | (data(i + 1) << 8)).toShort
                val v = s / 32768.0
                sumSq += v * v; cnt += 1; i += 2
              }
              val rms = if (cnt > 0) math.sqrt(sumSq / cnt) else 0.0
              Some((sr, ch, cnt / ch, rms))
            } catch {
              // not an audio container / truncated / conversion unsupported
              // (incl. RuntimeExceptions from malformed headers): degrade,
              // never fail the task
              case scala.util.control.NonFatal(_) => None
            }
          } else None
        decoded match {
          case Some((sr, ch, ns, rms)) =>
            Row(r.getLong(idIdx), bytes.length, true, sr, ch, ns,
              if (sr > 0) ns.toDouble / sr else 0.0, rms, null, fmt)
          case None if bytes == null =>
            Row(r.getLong(idIdx), null, false, null, null, null, null,
              null, null, fmt)
          case None =>
            Row(r.getLong(idIdx), bytes.length, false, null, null, null, null,
              null, graft.functions.ByteMeanUtil.mean(bytes), fmt)
        }
      }
    }
  }

  /**
   * REAL audio sample-rate conversion in the same partition-batched codec
   * slot: rows whose metadata format starts with `audio/` decode to
   * 16-bit PCM (shared [[pcm16]] path) and resample to `targetRate` by an
   * EXPLICIT nearest-frame kernel — target frame j reads source frame
   * (j·srcRate)/targetRate, integer arithmetic over whole frames so
   * channels stay aligned and the output samples are a closed form of the
   * input (the q_resample_audio oracle reproduces the resampled RMS
   * exactly; the JDK's own rate converter is provider-dependent and not
   * guaranteed present) — then re-encode as a WAV container at the target
   * rate. Non-audio formats and undecodable or null payloads pass through
   * UNCHANGED with `resampled = false` — the same must-not-corrupt
   * degradation as [[resizeImageBatched]]. Output: (id, media,
   * media_meta, resampled) — a media frame, so resampling composes with
   * the decoders like any pipeline stage.
   */
  def resampleAudioBatched(df: DataFrame, idCol: String, targetRate: Int): DataFrame = {
    require(targetRate >= 1, s"targetRate=$targetRate must be >= 1")
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("media", BinaryType),
      StructField("media_meta", MediaMetaType),
      StructField("resampled", BooleanType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex("media")
    val metaIdx = df.schema.fieldIndex("media_meta")
    implicit val enc = RowEncoder.encoderFor(outSchema)
    spreadForCompute(df).mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val meta = r.getStruct(metaIdx)
        val fmt = fmtOf(meta)
        val converted: Option[Array[Byte]] =
          if (bytes != null && fmt != null && fmt.startsWith("audio/")) {
            try {
              val (sr, ch, data) = pcm16(bytes)
              val frameBytes = ch * 2
              val srcFrames = data.length / frameBytes
              val dstFramesL =
                if (sr < 1) -1L else srcFrames.toLong * targetRate / sr
              // bound BEFORE allocating (untrusted header rate — see
              // MaxPcmBytes); an over-cap or degenerate container takes
              // the pass-through path, never an OOM or a wrapped .toInt
              if (dstFramesL < 0 || dstFramesL * frameBytes > MaxPcmBytes) None
              else {
                val dstFrames = dstFramesL.toInt
                val out = new Array[Byte](dstFrames * frameBytes)
                var j = 0
                while (j < dstFrames) {
                  val s = ((j.toLong * sr) / targetRate).toInt
                  System.arraycopy(data, s * frameBytes, out, j * frameBytes, frameBytes)
                  j += 1
                }
                // lock-free writer (see [[Wav]]) — byte-identical container
                // to the AudioSystem path this replaced
                Some(Wav.writePcm16(targetRate, ch, out))
              }
            } catch { case scala.util.control.NonFatal(_) => None }
          } else None
        converted match {
          case Some(wav) =>
            Row(r.getLong(idIdx), wav, Row("audio/wav", null, null, null), true)
          case None =>
            Row(r.getLong(idIdx), bytes, meta, false)
        }
      }
    }
  }

  /** Resize the media payload to `w`×`h` — the resize stage of the media
    * pipeline with the same honest-stub semantics as the decode: a 1-D
    * nearest-neighbor byte resample (codegen'd `ByteResize`) stands in for
    * pixel-space interpolation, the metadata struct updates to the target
    * dimensions, and a real build swaps the expression for a codec-backed
    * one without touching schema or callers. */
  /** Deterministic PNG payloads for oracle-checked decode tests: pixel
    * (x, y) of row `id` is the gray value ((id*31 + x*7 + y*13) mod 256)
    * replicated to R=G=B (TYPE_INT_RGB avoids the JDK's linear-gray →
    * sRGB gamma conversion, so the decoded raster round-trips the formula
    * bit-exactly and the mean Rec. 601 luminance has a closed form a SQL
    * oracle reproduces). Encoded in the same partition-batched codec slot
    * the decoders use — synthesis distributes like any other stage. */
  def synthesizeImages(df: DataFrame, idCol: String, w: Int, h: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("media", BinaryType),
      StructField("media_meta", MediaMetaType)))
    val idIdx = df.schema.fieldIndex(idCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    spreadForCompute(df).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = (((id * 31 + x * 7 + y * 13) % 256) + 256) % 256
            img.setRGB(x, y, ((v << 16) | (v << 8) | v).toInt)
            x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        Row(id, baos.toByteArray, Row("image/png", w, h, 1))
      }
    }
  }

  /** Deterministic WAV payloads (16-bit signed PCM mono, little-endian):
    * sample i of row `id` is ((id*131 + i*17) mod 2000) − 1000 — the
    * closed form a SQL oracle mirrors for the decoded RMS. Same
    * partition-batched slot as [[synthesizeImages]]. */
  def synthesizeAudio(df: DataFrame, idCol: String, n: Int, rate: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("media", BinaryType),
      StructField("media_meta", MediaMetaType)))
    val idIdx = df.schema.fieldIndex(idCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    spreadForCompute(df).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val data = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = ((((id * 131 + i * 17) % 2000) + 2000) % 2000 - 1000).toShort
          data(2 * i) = (s & 0xff).toByte
          data(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        // lock-free writer (see [[Wav]]) — byte-identical container to the
        // AudioSystem path this replaced, without its global provider lock
        Row(id, Wav.writePcm16(rate, 1, data), Row("audio/wav", null, null, null))
      }
    }
  }

  /** Deterministic animated-GIF payloads — the multi-frame sibling of
    * [[synthesizeImages]]: frame `f`, pixel (x, y) of row `id` is the gray
    * value ((id*31 + f*97 + x*7 + y*13) mod 256), written as RGB gray.
    * The GIF writer derives an exact ≤256-entry palette from the used
    * grays, so the formula round-trips bit-exactly and the sampled-frame
    * mean luminance has a closed form a SQL oracle reproduces. (An
    * explicit 256-gray `IndexColorModel` was REJECTED: the JDK's GIF LZW
    * encoder corrupts the last row of small indexed frames — hence also
    * the ≥8×8 guard, the smallest shape verified bit-exact across ids and
    * frame counts.) Same partition-batched codec slot as the other
    * synthesizers. */
  def synthesizeVideos(df: DataFrame, idCol: String, w: Int, h: Int,
                       nFrames: Int): DataFrame = {
    require(nFrames >= 1, s"nFrames=$nFrames must be >= 1")
    require(w >= 8 && h >= 8,
      s"frames ${w}x$h: the JDK GIF encoder mangles tiny frames — use >= 8x8")
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("media", BinaryType),
      StructField("media_meta", MediaMetaType)))
    val idIdx = df.schema.fieldIndex(idCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    spreadForCompute(df).mapPartitions { rows =>
      // one writer per partition, reused across rows (writers are not
      // thread-safe but a partition is single-threaded); disposed by the
      // task-completion listener, which also covers early termination
      // (limit/take stops consuming) and mid-partition failures — paths a
      // drain-detecting iterator wrapper would leak on
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => writer.dispose()))
      rows.map { r =>
        val id = r.getLong(idIdx)
        val baos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
        try {
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nFrames) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = ((((id * 31 + f * 97 + x * 7 + y * 13) % 256) + 256) % 256).toInt
                img.setRGB(x, y, (v << 16) | (v << 8) | v)
                x += 1
              }
              y += 1
            }
            writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
          ios.flush()
        } finally ios.close()
        Row(id, baos.toByteArray, Row("video/gif", w, h, nFrames))
      }
    }
  }

  /** Per-frame GIF placement parsed from METADATA only (no pixel decode):
    * the frame's rect within the logical screen, whether it declares a
    * transparent index, and whether its disposal restores the background. */
  private final case class GifFrameMeta(x: Int, y: Int, w: Int, h: Int,
                                        transparent: Boolean, restoreBg: Boolean)

  private def gifChild(e: org.w3c.dom.Element, name: String): Option[org.w3c.dom.Element] = {
    val kids = e.getElementsByTagName(name)
    if (kids.getLength > 0) Some(kids.item(0).asInstanceOf[org.w3c.dom.Element])
    else None
  }

  private def gifFrameMeta(reader: javax.imageio.ImageReader, f: Int): GifFrameMeta = {
    val tree = reader.getImageMetadata(f)
      .getAsTree("javax_imageio_gif_image_1.0").asInstanceOf[org.w3c.dom.Element]
    val d = gifChild(tree, "ImageDescriptor").getOrElse(
      throw new IllegalStateException("GIF frame without an ImageDescriptor"))
    val gce = gifChild(tree, "GraphicControlExtension")
    GifFrameMeta(
      d.getAttribute("imageLeftPosition").toInt,
      d.getAttribute("imageTopPosition").toInt,
      d.getAttribute("imageWidth").toInt,
      d.getAttribute("imageHeight").toInt,
      gce.exists(_.getAttribute("transparentColorFlag").equalsIgnoreCase("TRUE")),
      gce.exists(_.getAttribute("disposalMethod") == "restoreToBackgroundColor"))
  }

  /** Frame-sample an animated GIF with COMPOSITING: real-world animated
    * GIFs are delta-optimized (each frame a sub-rectangle patching the
    * previous canvas, often with transparency), so raw per-frame rasters
    * would yield wrong luminance and dimensions. Frames composite onto a
    * logical-screen canvas (unpainted areas count as black — the GIF
    * background color is not modeled; `restoreToPrevious` disposal, rare
    * in practice, is treated as `doNotDispose`), and each sampled index
    * reads the composited canvas. Which frames must be rasterized is
    * decided from METADATA alone: a full-screen frame with no transparent
    * index covers the canvas, so each sample only decodes its delta chain
    * back to the nearest covering frame — for full-frame containers (the
    * synthesizer's shape) exactly the sampled frames decode, and frames
    * past the last sample are never read. The `sample` callback observes
    * each sampled composited canvas IN PLACE with its frame index (copy
    * before retaining — the canvas mutates between samples); returns
    * (width, height, n_frames, per-sample callback results). ONE core
    * shared by the feature face ([[sampleGif]] → luminance) and the
    * explode face ([[explodeFramesBatched]] → PNG per frame) so the two
    * cannot drift. */
  private def compositeGif[A](bytes: Array[Byte], every: Int)(
      sample: (java.awt.image.BufferedImage, Int) => A): Option[(Int, Int, Int, Seq[A])] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        // seekForwardOnly=false: getNumImages(true) must scan, then seek back
        reader.setInput(iis, false, false)
        if (!reader.getFormatName.equalsIgnoreCase("gif")) {
          // single-frame container labeled video/* (PNG/BMP/JPEG): decode
          // as a 1-frame video — frame 0 is always sampled. Dispatch on
          // the reader's format name, never on exceptions from the
          // GIF-specific metadata API. Header dims checked BEFORE read(0)
          // allocates the raster (same untrusted-header guard as the
          // canvas below).
          val (w, h) = (reader.getWidth(0), reader.getHeight(0))
          if (w < 1 || h < 1 || w.toLong * h > MaxCanvasPixels) return None
          val im = reader.read(0)
          return Some((w, h, 1, Seq(sample(im, 0))))
        }
        val n = reader.getNumImages(true)
        if (n < 1) return None
        // only frames up to the LAST SAMPLE are ever composited, so only
        // their descriptors are parsed; the LSD-missing fallback below is
        // the one (off-spec) case that needs every frame's extent
        val last = ((n - 1) / every) * every
        val metas = Array.tabulate(last + 1)(gifFrameMeta(reader, _))
        val (sw, sh) = Option(reader.getStreamMetadata)
          .map(_.getAsTree("javax_imageio_gif_stream_1.0")
            .asInstanceOf[org.w3c.dom.Element])
          .flatMap(gifChild(_, "LogicalScreenDescriptor"))
          .map(e => (e.getAttribute("logicalScreenWidth").toInt,
            e.getAttribute("logicalScreenHeight").toInt))
          .getOrElse {
            var mw = 0; var mh = 0
            (metas.iterator ++ ((last + 1) until n).iterator
              .map(gifFrameMeta(reader, _))).foreach { m =>
              mw = math.max(mw, m.x + m.w); mh = math.max(mh, m.y + m.h)
            }
            (mw, mh)
          }
        // header dims are UNTRUSTED (16-bit fields allow ~4.3e9-pixel
        // claims): bound the canvas BEFORE allocating, or a crafted
        // LogicalScreenDescriptor triggers a multi-GB int[] request whose
        // OutOfMemoryError escapes NonFatal and kills the task instead of
        // degrading to the byte-stats fallback
        if (sw < 1 || sh < 1 || sw.toLong * sh > MaxCanvasPixels) return None
        val covering = metas.map(m =>
          m.x == 0 && m.y == 0 && m.w == sw && m.h == sh && !m.transparent)
        val sampledIdx = 0 until n by every
        val needed = new scala.collection.mutable.BitSet(last + 1)
        sampledIdx.foreach { s =>
          var c = s
          while (c > 0 && !covering(c)) c -= 1
          (c to s).foreach(needed += _)
        }
        // per-frame ImageDescriptor dims are the SAME untrusted 16-bit
        // fields as the LSD: reader.read(f) eagerly allocates the frame
        // raster from them, so bound every frame that will be read
        if ((0 to last).exists(f =>
          needed(f) && metas(f).w.toLong * metas(f).h > MaxCanvasPixels))
          return None
        val canvas = new java.awt.image.BufferedImage(
          sw, sh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = canvas.createGraphics()
        try {
          val out = Seq.newBuilder[A]
          var f = 0
          while (f <= last) {
            if (needed(f)) {
              val m = metas(f)
              g.drawImage(reader.read(f), m.x, m.y, null)
              if (f % every == 0) out += sample(canvas, f)
              if (m.restoreBg) {
                g.setColor(java.awt.Color.BLACK)
                g.fillRect(m.x, m.y, m.w, m.h)
              }
            }
            f += 1
          }
          Some((sw, sh, n, out.result()))
        } finally g.dispose()
      } finally reader.dispose()
    } finally iis.close()
  }

  /** The feature face of [[compositeGif]]: (width, height, n_frames,
    * n_sampled, mean sampled-canvas Rec. 601 luminance). Package-private
    * so MultimodalProps can pit the cover-analysis frame skipping against
    * a pure sequential reference compositor over random containers. */
  private[graft] def sampleGif(bytes: Array[Byte], every: Int): Option[(Int, Int, Int, Int, Double)] =
    compositeGif(bytes, every)((canvas, _) => lumaSum(canvas)).map {
      case (sw, sh, n, sums) =>
        (sw, sh, n, sums.size, sums.sum / (sums.size.toLong * sw * sh))
    }

  /**
   * REAL video frame-sample + decode in the same partition-batched codec
   * slot: rows whose metadata format starts with `video/` are opened with
   * the JDK's multi-frame `javax.imageio` reader (animated GIF ships with
   * every JRE — the one genuine multi-frame container decodable with zero
   * added dependencies), every `every`-th frame is sampled (frames 0,
   * `every`, 2·`every`, … — the temporal sampling a training pipeline
   * runs before feature extraction), and the samples reduce to the
   * logical-screen dimensions, the container's total frame count, the
   * sampled count, and mean Rec. 601 luminance over the sampled
   * composited canvases. Delta-optimized containers (sub-rectangle
   * frames, transparency — the common real-world form) composite
   * correctly, and metadata-driven cover analysis keeps the decode cost
   * at the sampled frames for full-frame containers — see [[sampleGif]].
   * Single-frame containers labeled `video/…` (PNG/BMP/JPEG stills)
   * decode as 1-frame videos via format-name dispatch. Canvases are
   * bounded by [[MaxCanvasPixels]] BEFORE allocation — header dims in a
   * crawled corpus are untrusted. Non-video formats and undecodable or
   * null payloads keep the
   * byte-statistics fallback (`decoded = false`) — the same honest
   * degradation as [[decodeImageBatched]]. For MP4/H.264-class codecs
   * (not in the JDK) the slot shape is unchanged: swap the reader, keep
   * the schema, sampling and fallback contract. Per-row cost is linear
   * in composited pixels; distributes and batches like every other
   * codec-slot stage.
   */
  def decodeVideoBatched(df: DataFrame, idCol: String, every: Int): DataFrame = {
    require(every >= 1, s"every=$every must be >= 1")
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("byte_len", IntegerType),
      StructField("decoded", BooleanType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("n_sampled", IntegerType),
      StructField("mean_luma", DoubleType),
      StructField("mean_byte", DoubleType),
      StructField("format", StringType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex("media")
    val metaIdx = df.schema.fieldIndex("media_meta")
    implicit val enc = RowEncoder.encoderFor(outSchema)
    spreadForCompute(df).mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val fmt = fmtOf(r.getStruct(metaIdx))
        val decoded: Option[(Int, Int, Int, Int, Double)] =
          if (bytes != null && fmt != null && fmt.startsWith("video/"))
            // NonFatal like the image path: the GIF reader throws
            // RuntimeExceptions on truncated/corrupt payloads
            try sampleGif(bytes, every)
            catch { case scala.util.control.NonFatal(_) => None }
          else None
        decoded match {
          case Some((w, h, n, sampled, luma)) =>
            Row(r.getLong(idIdx), bytes.length, true, w, h, n, sampled,
              luma, null, fmt)
          case None if bytes == null =>
            Row(r.getLong(idIdx), null, false, null, null, null, null,
              null, null, fmt)
          case None =>
            Row(r.getLong(idIdx), bytes.length, false, null, null, null, null,
              null, graft.functions.ByteMeanUtil.mean(bytes), fmt)
        }
      }
    }
  }

  /**
   * REAL video frame EXTRACTION in the same partition-batched codec slot
   * — the explode face of [[decodeVideoBatched]]: every `every`-th frame
   * of a `video/…` payload composites (same [[compositeGif]] core: delta
   * frames, transparency, cover analysis, untrusted-header bounds) and is
   * re-encoded as its OWN `image/png` media row `(id, frame_idx, media,
   * media_meta)` — the frames-to-images step a multimodal training
   * pipeline runs before image featurization, composing directly with
   * [[decodeImageBatched]]/[[resizeImageBatched]]. Explode semantics for
   * degradation: non-video, undecodable and null payloads produce NO
   * rows (an exploder has no single fallback row to emit; gate on
   * [[decodeVideoBatched]]'s `decoded` flag first to count drops).
   * Output size is rows × sampled frames — bound `every` accordingly.
   */
  def explodeFramesBatched(df: DataFrame, idCol: String, every: Int): DataFrame = {
    require(every >= 1, s"every=$every must be >= 1")
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("media", BinaryType),
      StructField("media_meta", MediaMetaType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex("media")
    val metaIdx = df.schema.fieldIndex("media_meta")
    implicit val enc = RowEncoder.encoderFor(outSchema)
    spreadForCompute(df).mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val fmt = fmtOf(r.getStruct(metaIdx))
        val frames: Option[(Int, Int, Int, Seq[(Int, Array[Byte])])] =
          if (bytes != null && fmt != null && fmt.startsWith("video/"))
            try compositeGif(bytes, every) { (canvas, f) =>
              // encode INSIDE the callback: the canvas mutates between
              // samples, and the PNG bytes are the retained copy
              val baos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(canvas, "png", baos)
              (f, baos.toByteArray)
            } catch { case scala.util.control.NonFatal(_) => None }
          else None
        frames match {
          case Some((w, h, _, fs)) =>
            val id = r.getLong(idIdx)
            fs.map { case (f, png) =>
              Row(id, f, png, Row("image/png", w, h, 1))
            }
          case None => Nil
        }
      }
    }
  }

  /**
   * REAL pixel-space image resize in the same partition-batched codec
   * slot: rows whose metadata format starts with `image/` and decode
   * (header-dim-bounded, like [[decodeImageBatched]]) are resampled to
   * `w`×`h` by an EXPLICIT nearest-neighbor kernel — target pixel
   * (tx, ty) reads source pixel ((tx·sw)/w, (ty·sh)/h), integer
   * arithmetic, so the output raster is a closed form of the input (the
   * q_resize_image oracle reproduces the resized luminance exactly; a
   * library interpolator's sample positions would be
   * implementation-defined) — and re-encode as PNG with the metadata
   * struct updated to the target dimensions. Non-image formats and
   * undecodable or null payloads pass through UNCHANGED with
   * `resized = false` (the honest degradation — a resize stage must not
   * corrupt payloads it cannot decode; [[resizeStub]] remains the
   * clearly-marked byte-resample stand-in for codecs the JDK lacks).
   * Output: (id, media, media_meta, resized) — a media frame, so resize
   * composes with the decoders like any pipeline stage. Per-row cost is
   * linear in source + target pixels; distributes and batches like every
   * other codec-slot stage.
   */
  def resizeImageBatched(df: DataFrame, idCol: String, w: Int, h: Int): DataFrame = {
    require(w >= 1 && h >= 1, s"target ${w}x$h must be >= 1x1")
    require(w.toLong * h <= MaxCanvasPixels,
      s"target ${w}x$h exceeds MaxCanvasPixels ($MaxCanvasPixels)")
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("media", BinaryType),
      StructField("media_meta", MediaMetaType),
      StructField("resized", BooleanType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex("media")
    val metaIdx = df.schema.fieldIndex("media_meta")
    implicit val enc = RowEncoder.encoderFor(outSchema)
    spreadForCompute(df).mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val meta = r.getStruct(metaIdx)
        val fmt = fmtOf(meta)
        val img =
          if (bytes != null && fmt != null && fmt.startsWith("image/"))
            try readImageBounded(bytes)
            catch { case scala.util.control.NonFatal(_) => None }
          else None
        img match {
          case Some(im) =>
            val (sw, sh) = (im.getWidth, im.getHeight)
            val out = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var ty = 0
            while (ty < h) {
              val sy = (ty.toLong * sh / h).toInt
              var tx = 0
              while (tx < w) {
                out.setRGB(tx, ty, im.getRGB((tx.toLong * sw / w).toInt, sy))
                tx += 1
              }
              ty += 1
            }
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", baos)
            Row(r.getLong(idIdx), baos.toByteArray,
              Row("image/png", w, h, 1), true)
          case None =>
            Row(r.getLong(idIdx), bytes, meta, false)
        }
      }
    }
  }

  def resizeStub(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("media",
        graft.functions.VectorFunctions.byteResize(col("media"), lit(w * h)))
      .withColumn("media_meta", struct(
        col("media_meta").getField("format").as("format"),
        lit(w).as("width"), lit(h).as("height"),
        col("media_meta").getField("n_frames").as("n_frames")))

  /** Sample up to `n` equal-length frame slices out of the binary payload
    * — pure `substring` on binary, codegen'd, no decode required. */
  def frameSample(df: DataFrame, n: Int): DataFrame = {
    val total = length(col("media"))
    val frameLen = greatest(total / n, lit(1))
    df.withColumn("frames", filter(
      transform(sequence(lit(0), lit(n - 1)),
        i => col("media").substr((i * frameLen + 1).cast("int"), frameLen.cast("int"))),
      f => length(f) > 0))
  }
}
