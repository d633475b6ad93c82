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

  /** STUB decode kernel for the AUDIO/VIDEO kinds — deterministic fake
    * standing in for the real codec (??? in production this calls
    * ffmpeg via FFI; there is no audio/video lib in this container).
    * IMAGE rows no longer come here: they carry a real P5 PGM payload
    * ([[toPgm]]) and go through the real [[decodePgm]] parser. Runs
    * per-partition so a real codec would init once per partition.
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
      // real impl: init the remaining (audio/video) codecs here, once
      // per partition; images decode for real via the PGM parser
      it.map(r => if (r.kind == "image") decodePgm(r) else decodeStub(r))
    }
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
