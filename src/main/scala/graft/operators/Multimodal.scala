package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (BASELINE.json north-star surface):
  * image/audio/video as opaque BinaryType columns with typed metadata.
  *
  * The media codecs are NOT in this container, so the decode kernel is
  * a clearly-marked deterministic STUB; everything Spark-side — the
  * schema, the batched per-partition execution shape, partitioning, and
  * the feature-frame contract — is real and tested. Swapping
  * `decodeStub` for a JNI/FFI codec changes no plan shape.
  *
  * Scale notes: binary payloads ride in their own Parquet column, so
  * metadata-only queries never read bytes (column pruning); decode runs
  * via mapPartitions (one codec init per partition, the Scala analog of
  * a batched pandas-UDF), map-only — no shuffle.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

  /** width/height are DECODED from the payload for image rows (the PGM
    * parse, [[decodePgm]]) and 0 for the still-stubbed kinds.
    */
  case class MediaFeatures(media_id: Long, kind: String, width: Int,
                           height: Int, n_bytes: Long,
                           checksum: String, mean_byte: Double,
                           n_frames: Int, feature: Array[Float])

  /** Synthesize a media table from the documents table: payload =
    * UTF-8 bytes of the text (deterministic fake), metadata derived
    * from doc fields. Stands in for a real image/audio ingest.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      (pmod(col("doc_id"), lit(8)) * 160 + 320).cast("int").as("width"),
      (pmod(col("doc_id"), lit(8)) * 90 + 180).cast("int").as("height"),
      when(pmod(col("doc_id"), lit(3)) === 1, 16000).otherwise(44100)
        .cast("int").as("sample_rate"))

  /** 12-byte container header, the real-decode counterpart to the
    * stubbed pixel codec below: magic "GRFT" ‖ width:u16be ‖
    * height:u16be ‖ sample_rate:u32be, prepended to the payload. Built
    * from codegen'd Column ops only (hex→lpad→unhex produces the
    * big-endian byte string; concat on BinaryType concatenates bytes),
    * so at 100 TB the header attach is a map-only projection.
    */
  def withHeader(media: DataFrame): DataFrame = {
    def beBytes(c: Column, hexWidth: Int): Column =
      unhex(lpad(hex(c), hexWidth, "0"))
    media.withColumn("bytes",
      concat(
        encode(lit("GRFT"), "UTF-8"),
        beBytes(col("width"), 4),
        beBytes(col("height"), 4),
        beBytes(col("sample_rate"), 8),
        col("bytes")))
  }

  /** REAL header decode: parses magic/width/height/sample_rate back out
    * of the first 12 bytes of the `bytes` column — an actual binary
    * parse (substring on BinaryType slices bytes; hex→conv reads the
    * big-endian words), not metadata-column arithmetic. Everything is
    * codegen'd builtin Columns; a malformed blob (wrong magic) surfaces
    * as a non-"GRFT" magic rather than silently garbled fields, which
    * is the failure mode a real ingest wants visible. `n_bytes` is the
    * payload length with the 12-byte header excluded.
    */
  def decodeHeader(media: DataFrame): DataFrame = {
    def beInt(pos: Int, len: Int): Column =
      conv(hex(substring(col("bytes"), pos, len)), 16, 10).cast("int")
    media.select(
      col("media_id"), col("kind"),
      decode(substring(col("bytes"), 1, 4), "UTF-8").as("magic"),
      beInt(5, 2).as("width"),
      beInt(7, 2).as("height"),
      beInt(9, 4).as("sample_rate"),
      (length(col("bytes")) - 12).cast("int").as("n_bytes"))
  }

  /** STUB decode kernel — now demoted to the VIDEO kind only in terms
    * of realism coverage: IMAGE rows carry real P5 PGM payloads
    * ([[toPgm]]/[[decodePgm]]) and AUDIO rows have the real RIFF/WAVE
    * path ([[toWav]]/[[decodeWav]], gate m6). Video keeps this
    * deterministic fake (??? in production this calls ffmpeg via FFI;
    * no video lib exists in this container). Runs per-partition so a
    * real codec would init once per partition.
    */
  def decodeStub(row: MediaRow): MediaFeatures = {
    val bytes = row.bytes
    val mean = if (bytes.isEmpty) 0.0
    else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
    // fake 8-dim "embedding": byte histogram over 8 value buckets
    val hist = new Array[Float](8)
    bytes.foreach(b => hist(((b & 0xff) >> 5)) += 1f)
    val nFrames = row.kind match {
      case "video" => bytes.length / 64 // pretend 64-byte frames
      case "audio" => bytes.length / 32
      case _ => 1
    }
    MediaFeatures(row.media_id, row.kind, 0, 0, bytes.length.toLong,
      bytes.map("%02x".format(_)).mkString.take(16), mean, nFrames, hist)
  }

  /** Re-encode image rows as REAL binary images: P5 (raw-pixel) PGM —
    * `"P5\n" width " " height "\n255\n"` ASCII header followed by
    * width×height raw grayscale bytes. Pixels are the payload's first
    * 16·(len div 16) bytes laid out as a 16-wide raster (the tail that
    * doesn't fill a row is dropped; payloads under one row give a
    * 16×0 image). Fixed 5-digit header fields are valid PGM — any
    * standard viewer opens these blobs. All codegen'd Column ops:
    * map-only at 100 TB, and the non-image kinds pass through
    * untouched.
    */
  def toPgm(media: DataFrame): DataFrame = {
    val h = expr("length(bytes) div 16").cast("int")
    media
      .withColumn("bytes",
        when(col("kind") === "image",
          concat(
            encode(concat(lit("P5\n"),
              lpad(lit("16"), 5, "0"), lit(" "),
              lpad(h.cast("string"), 5, "0"), lit("\n255\n")), "UTF-8"),
            expr("substring(bytes, 1, 16 * (length(bytes) div 16))")))
          .otherwise(col("bytes")))
      .withColumn("width", when(col("kind") === "image", 16).otherwise(0))
      .withColumn("height", when(col("kind") === "image", h).otherwise(0))
  }

  /** REAL image decode: a whitespace-tolerant P5 PGM parser over the
    * raw payload bytes — magic check, three ASCII integers (width,
    * height, maxval), the single post-maxval whitespace byte, then
    * per-PIXEL byte arithmetic (sum/min/max + an 8-bucket intensity
    * histogram as the feature vector). Nothing is read from the row's
    * metadata columns — width/height in the output are what the BYTES
    * say, and every malformed case (bad magic, truncated raster,
    * non-255 maxval) fails loudly rather than yielding garbage.
    * This retires the image branch of [[decodeStub]]: the features for
    * image rows are now computed from actually-decoded pixel values.
    */
  def decodePgm(row: MediaRow): MediaFeatures = {
    val b = row.bytes
    require(b.length >= 2 && b(0) == 'P'.toByte && b(1) == '5'.toByte,
      s"media ${row.media_id}: not a P5 PGM (magic ${b.take(2).mkString(",")})")
    var i = 2
    def isWs(c: Byte) = c == ' ' || c == '\n' || c == '\r' || c == '\t'
    def readInt(): Int = {
      while (i < b.length && isWs(b(i))) i += 1
      require(i < b.length && b(i) >= '0' && b(i) <= '9',
        s"media ${row.media_id}: malformed PGM header at byte $i")
      var v = 0
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0'); i += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    require(maxval == 255, s"media ${row.media_id}: unsupported maxval $maxval")
    require(i < b.length && isWs(b(i)),
      s"media ${row.media_id}: missing raster separator")
    i += 1 // exactly ONE whitespace byte before the raster (PGM spec)
    val n = w * h
    require(b.length - i >= n,
      s"media ${row.media_id}: raster truncated (${b.length - i} of $n bytes)")
    var sum = 0L
    var mn = 255; var mx = 0
    val hist = new Array[Float](8)
    var j = 0
    while (j < n) {
      val v = b(i + j) & 0xff
      sum += v
      if (v < mn) mn = v
      if (v > mx) mx = v
      hist(v >> 5) += 1f
      j += 1
    }
    val mean = if (n > 0) sum.toDouble / n else 0.0
    val checksum = b.slice(i, i + math.min(8, n))
      .map("%02x".format(_)).mkString
    MediaFeatures(row.media_id, row.kind, w, h, n.toLong, checksum, mean,
      1, hist)
  }

  /** Re-encode audio rows as REAL audio files: canonical RIFF/WAVE
    * containers (8-bit unsigned mono PCM) — "RIFF" ‖ u32le size ‖
    * "WAVE" ‖ "fmt " chunk (PCM, 1 channel, the row's sample_rate,
    * 8 bits) ‖ "data" chunk holding the payload bytes as samples.
    * Every little-endian word is built from codegen'd Column byte ops
    * (hex → lpad → per-byte reorder → unhex), so the attach is a
    * map-only projection; any standard audio tool opens these blobs.
    * Non-audio kinds pass through untouched.
    */
  def toWav(media: DataFrame): DataFrame = {
    def le(c: Column, nBytes: Int): Column = {
      val hx = lpad(hex(c), nBytes * 2, "0")
      unhex(concat((0 until nBytes).map(i =>
        substring(hx, (nBytes - 1 - i) * 2 + 1, 2)): _*))
    }
    val n = length(col("bytes"))
    media.withColumn("bytes",
      when(col("kind") === "audio",
        concat(
          encode(lit("RIFF"), "UTF-8"), le(n + 36, 4),
          encode(lit("WAVE"), "UTF-8"),
          encode(lit("fmt "), "UTF-8"), le(lit(16), 4),
          le(lit(1), 2),                   // PCM
          le(lit(1), 2),                   // mono
          le(col("sample_rate"), 4),
          le(col("sample_rate"), 4),       // byte rate = rate·1·1
          le(lit(1), 2),                   // block align
          le(lit(8), 2),                   // bits per sample
          encode(lit("data"), "UTF-8"), le(n, 4),
          col("bytes")))
        .otherwise(col("bytes")))
  }

  case class WavFeatures(media_id: Long, sample_rate: Int, n_samples: Long,
                         amp_min: Int, amp_max: Int, amp_sum: Long,
                         crossings: Long)

  /** REAL audio decode: a chunk-walking RIFF/WAVE parser over the raw
    * payload bytes — validates the RIFF/WAVE magics, walks chunks to
    * find "fmt " (requiring PCM / mono / 8-bit; the sample RATE in the
    * output comes from the fmt chunk, not from metadata columns) and
    * "data", then computes per-SAMPLE statistics from the decoded
    * 8-bit PCM: min/max/Σ amplitude and the 100-level crossing count
    * (the zero-crossing analog for unsigned samples) — all integers,
    * so the DuckDB oracle replays them exactly. Malformed containers
    * (bad magic, missing chunks, truncated data, non-PCM format) fail
    * loudly. This retires the audio branch of [[decodeStub]]; only
    * video remains stubbed (no codec libs in this container).
    */
  def decodeWav(row: MediaRow): WavFeatures = {
    val b = row.bytes
    def u16(p: Int): Int =
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    def u32(p: Int): Long =
      (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
    def tag(p: Int): String = new String(b, p, 4, "US-ASCII")
    require(b.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      s"media ${row.media_id}: not a RIFF/WAVE container")
    var pos = 12
    var rate = -1
    var dataAt = -1
    var dataLen = -1L
    while (pos + 8 <= b.length && (rate < 0 || dataAt < 0)) {
      val id = tag(pos); val size = u32(pos + 4)
      id match {
        case "fmt " =>
          require(size >= 16, s"media ${row.media_id}: short fmt chunk")
          require(u16(pos + 8) == 1, s"media ${row.media_id}: not PCM")
          require(u16(pos + 10) == 1, s"media ${row.media_id}: not mono")
          require(u16(pos + 22) == 8, s"media ${row.media_id}: not 8-bit")
          rate = u32(pos + 12).toInt
        case "data" =>
          dataAt = pos + 8; dataLen = size
        case _ => () // unknown chunk: skip (the RIFF contract)
      }
      pos += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    require(rate >= 0, s"media ${row.media_id}: missing fmt chunk")
    require(dataAt >= 0, s"media ${row.media_id}: missing data chunk")
    require(dataAt + dataLen <= b.length,
      s"media ${row.media_id}: data chunk truncated")
    val n = dataLen.toInt
    var mn = 255; var mx = 0; var sum = 0L; var crossings = 0L
    var i = 0
    var prevHigh = false
    while (i < n) {
      val v = b(dataAt + i) & 0xff
      if (v < mn) mn = v
      if (v > mx) mx = v
      sum += v
      val high = v >= 100
      if (i > 0 && high != prevHigh) crossings += 1
      prevHigh = high
      i += 1
    }
    WavFeatures(row.media_id, rate, n.toLong,
      if (n == 0) 0 else mn, mx, sum, crossings)
  }

  /** Tile-grid layout for vision-encoder preprocessing: how a
    * width×height image splits into tileSize² patches (edge tiles
    * clamped) — the ViT patchification bookkeeping a multimodal
    * pipeline computes BEFORE any pixel is decoded, so it runs
    * metadata-only (the bytes column is never read; same pruning
    * contract as [[metaOnly]], pinned in MultimodalSpec). Pure
    * codegen'd integer arithmetic, map-only.
    */
  def tileGrid(media: DataFrame, tileSize: Int = 224): DataFrame =
    media.filter(col("kind") === "image")
      .select(col("media_id"), col("width"), col("height"),
        ceil(col("width").cast("double") / tileSize).cast("long")
          .as("tiles_x"),
        ceil(col("height").cast("double") / tileSize).cast("long")
          .as("tiles_y"))
      .withColumn("n_tiles", col("tiles_x") * col("tiles_y"))

  /** decode / feature-extract over the media table — the batched
    * narrow-transformation shape a real pipeline uses.
    */
  def extractFeatures(s: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import s.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // real impl: init the remaining (video) codec here, once per
      // partition; images decode for real via the PGM parser, audio
      // for real via decodeWav (the m6 gate's dedicated feature set)
      it.map(r => if (r.kind == "image") decodePgm(r) else decodeStub(r))
    }
  }

  /** REAL audio feature extraction over WAV-wrapped rows — the
    * [[decodeWav]] kernel per partition, audio rows only.
    */
  def extractWavFeatures(s: SparkSession, media: DataFrame): Dataset[WavFeatures] = {
    import s.implicits._
    media.filter(col("kind") === "audio").as[MediaRow]
      .mapPartitions(_.map(decodeWav))
  }

  /** "Frame sampling" for video rows: every `stride`-th byte as a
    * stand-in for every-Nth-frame extraction; array output demonstrates
    * the explode-ready batch shape.
    */
  def frameSample(media: DataFrame, stride: Int = 64): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        transform(
          sequence(lit(0L), floor((length(col("bytes")) - 1) / stride).cast("long")),
          i => substring(col("bytes"), (i * stride + 1).cast("int"), lit(1)))
          .as("frames"))
      .select(col("media_id"), size(col("frames")).as("n_frames"))

  /** Metadata-only scan — must not read the bytes column (verified by
    * plan inspection in tests: ReadSchema excludes `bytes`).
    */
  def metaOnly(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"), col("width"), col("height"))
}
