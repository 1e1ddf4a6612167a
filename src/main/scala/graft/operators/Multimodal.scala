package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded media item: opaque binary payload + typed metadata. */
final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

/** Metadata extracted by the (stubbed) decoder. */
final case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
    frame_count: Long, checksum: Long)

/** One sampled frame of a media payload. */
final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

/** Metadata decoded from a REAL RIFF/WAVE PCM payload. */
final case class WavMeta(doc_id: Long, sample_rate: Long, n_channels: Long,
    bits: Long, n_samples: Long, duration_ms: Long, abs_sum: Long)

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded per-partition through a typed
  * Dataset.
  *
  * The Spark-side plumbing is real — schema, encoders, partition-iterator
  * batch shape (the Scala analog of mapInPandas batches). Real codecs,
  * all zero-dependency: PCM WAV (byte-level RIFF), 24-bit BMP with
  * pixel resize, AVI container demux, grayscale PNG through the JDK's
  * DEFLATE, baseline JPEG through the JDK's ImageIO, and MJPEG video
  * pixel decode (AVI demux + per-frame JPEG — see
  * [[decodeMjpegFrames]]). What remains a clearly-marked DETERMINISTIC
  * STUB is only the genuinely library-bound INTER-frame video codecs
  * (H.264, VP9, …; plus the generic `decodeStub`
  * used by the oracle-facing pipeline-shape queries): `decodeStub`
  * derives metadata arithmetically from the payload; a production
  * build swaps in the real codec per media_type without touching the
  * surrounding plan.
  */
object Multimodal {

  /** Build a media table from documents: payload = UTF-8 bytes of text
    * standing in for encoded media; media_type alternates img/aud. */
  def toMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      when(col("doc_id") % 2 === 0, "img").otherwise("aud").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder — deterministic fake standing in for a real codec.
    * Real implementation: decode payload with an image/audio library and
    * emit true dimensions/frames. Kept pure and arithmetic so tests and
    * the DuckDB oracle can verify the pipeline end-to-end. */
  def decodeStub(row: MediaRow): MediaMeta = {
    val n = row.payload.length.toLong
    val frames = row.media_type match {
      case "img" => 1L                  // stills decode to one frame
      case "aud" => n / 50L + 1L        // fake 50-bytes-per-frame codec
      case _     => n / 100L + 1L
    }
    var sum = 0L
    var i = 0
    while (i < row.payload.length) {
      sum = (sum + (row.payload(i) & 0xffL)) % 1000000007L
      i += 1
    }
    MediaMeta(row.doc_id, row.media_type, n, frames, sum)
  }

  /** Decode a media table per partition (batched iterator — the executor
    * never materializes the whole partition). */
  def extractMetadata(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(decodeStub))
  }

  /** Sample every `every`-th fixed-size frame from each payload — the
    * frame-sampling stage of a video/audio pipeline. The 1→N flatMap is
    * the real plumbing; the "codec" is byte-slicing (STUB — a real build
    * decodes with a media library and emits actual frames). */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameBytes: Int = 50, every: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val nFrames = (r.payload.length + frameBytes - 1) / frameBytes
      (0 until nFrames).by(every).map { i =>
        val from = i * frameBytes
        val until = math.min(from + frameBytes, r.payload.length)
        Frame(r.doc_id, i, java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }
  }

  /** One resized media item: payload normalized to `targetBytes`. */
  final case class Resized(doc_id: Long, media_type: String, in_bytes: Long,
      out_bytes: Long, truncated: Boolean, payload: Array[Byte])

  /** Resize stage (STUB): normalize every payload to exactly
    * `targetBytes` — truncate long payloads, zero-pad short ones. A real
    * build decodes, rescales pixels/samples, and re-encodes; the plumbing
    * (binary in → fixed-size binary out, per-partition batches, typed
    * metadata alongside) is the production shape. */
  def resizeStub(spark: SparkSession, media: DataFrame,
      targetBytes: Int = 64): Dataset[Resized] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      val out = java.util.Arrays.copyOf(r.payload, targetBytes)
      Resized(r.doc_id, r.media_type, r.payload.length.toLong,
        targetBytes.toLong, r.payload.length > targetBytes, out)
    })
  }

  // ---- REAL codec: RIFF/WAVE PCM ------------------------------------
  //
  // PCM WAV needs no external library — the container is a RIFF header
  // plus little-endian integer samples — so unlike the image/video
  // stubs above, the audio path can be REAL end to end: a writer that
  // emits spec-conformant bytes, a parser that walks the chunk list of
  // ANY PCM WAV (not just ours), and exact integer statistics off the
  // decoded samples. The synthetic corpus payload is deterministic from
  // doc_id, which is what lets the DuckDB oracle verify the whole
  // encode→decode round trip arithmetically, byte-level parser
  // included.

  /** Encode mono 16-bit PCM samples as a spec-conformant WAV payload:
    * RIFF size header, `fmt ` chunk (PCM=1, channels, rate, byte rate,
    * block align, bits), `data` chunk, all little-endian. */
  def pcm16Wav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1).putShort(1) // PCM, mono
    bb.putInt(sampleRate).putInt(sampleRate * 2) // byte rate = rate×block
    bb.putShort(2).putShort(16) // block align, bits
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** REAL RIFF parser: walk the chunk list (any chunk order, unknown
    * chunks skipped — per spec), read the PCM format fields from
    * `fmt `, decode the 16-bit little-endian samples from `data`, and
    * return exact integer metadata (duration in truncated ms, Σ|sample|
    * as the energy statistic — integers, so the oracle can reproduce
    * them bit-for-bit). Rejects non-RIFF/non-PCM payloads loudly. */
  def decodeWav(docId: Long, payload: Array[Byte]): WavMeta = {
    def ascii(from: Int) = new String(payload, from, 4, "US-ASCII")
    require(payload.length >= 12 && ascii(0) == "RIFF" && ascii(8) == "WAVE",
      s"doc $docId: not a RIFF/WAVE payload")
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var rate = -1; var channels = -1; var bits = -1
    var dataFrom = -1; var dataLen = -1
    while (pos + 8 <= payload.length) {
      val id = ascii(pos)
      val len = bb.getInt(pos + 4)
      // len is an untrusted little-endian int: a negative value would
      // make the word-aligned step zero or negative and spin the walk
      // forever — reject loudly instead
      require(len >= 0, s"doc $docId: corrupt chunk length $len at $pos")
      id match {
        case "fmt " =>
          require(bb.getShort(pos + 8) == 1,
            s"doc $docId: not PCM (fmt ${bb.getShort(pos + 8)})")
          channels = bb.getShort(pos + 10)
          rate = bb.getInt(pos + 12)
          bits = bb.getShort(pos + 22)
        case "data" => dataFrom = pos + 8; dataLen = len
        case _ => // unknown chunk: skip (spec-conformant readers must)
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(rate > 0 && dataFrom >= 0, s"doc $docId: missing fmt/data chunk")
    require(bits == 16 && channels == 1,
      s"doc $docId: this decoder handles mono PCM-16, got $bits/$channels")
    val n = dataLen / 2
    var absSum = 0L
    var i = 0
    while (i < n) {
      absSum += math.abs(bb.getShort(dataFrom + 2 * i).toLong)
      i += 1
    }
    WavMeta(docId, rate.toLong, channels.toLong, bits.toLong, n.toLong,
      n.toLong * 1000L / rate, absSum)
  }

  /** Decoded PCM payload: sample rate + the raw 16-bit samples — the
    * parser half of [[decodeWav]] exposed for feature extractors
    * ([[Audio.melSpectrogram]]) that need the waveform itself, not
    * just its summary statistics. Same chunk-walking contract. */
  def pcmSamples(docId: Long, payload: Array[Byte]): (Int, Array[Short]) = {
    def ascii(from: Int) = new String(payload, from, 4, "US-ASCII")
    require(payload.length >= 12 && ascii(0) == "RIFF" && ascii(8) == "WAVE",
      s"doc $docId: not a RIFF/WAVE payload")
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var rate = -1; var channels = -1; var bits = -1
    var dataFrom = -1; var dataLen = -1
    while (pos + 8 <= payload.length) {
      val id = ascii(pos)
      val len = bb.getInt(pos + 4)
      require(len >= 0, s"doc $docId: corrupt chunk length $len at $pos")
      id match {
        case "fmt " =>
          require(bb.getShort(pos + 8) == 1,
            s"doc $docId: not PCM (fmt ${bb.getShort(pos + 8)})")
          channels = bb.getShort(pos + 10)
          rate = bb.getInt(pos + 12)
          bits = bb.getShort(pos + 22)
        case "data" => dataFrom = pos + 8; dataLen = len
        case _ => // unknown chunk: skip (spec-conformant readers must)
      }
      pos += 8 + len + (len & 1)
    }
    require(rate > 0 && dataFrom >= 0, s"doc $docId: missing fmt/data chunk")
    require(bits == 16 && channels == 1,
      s"doc $docId: this decoder handles mono PCM-16, got $bits/$channels")
    (rate, Array.tabulate(dataLen / 2)(i => bb.getShort(dataFrom + 2 * i)))
  }

  /** Deterministic synthetic waveform for doc_id — the formula the
    * oracle replays: n = 40 + doc_id%57 samples of
    * ((doc_id·31 + i·7) mod 2001) − 1000, all integer. */
  def synthSamples(docId: Long): Array[Short] = {
    val n = (40 + docId % 57).toInt
    Array.tabulate(n)(i => (((docId * 31 + i * 7) % 2001) - 1000).toShort)
  }

  /** A media table of REAL WAV payloads, one per document. */
  def toWavTable(spark: SparkSession, documents: DataFrame,
      sampleRate: Int = 8000): DataFrame = {
    import spark.implicits._
    documents.select("doc_id").as[Long]
      .mapPartitions(_.map(id =>
        MediaRow(id, "wav", pcm16Wav(sampleRate, synthSamples(id)))))
      .toDF()
  }

  /** Decode a WAV table per partition — the same typed-Dataset batch
    * shape as [[extractMetadata]], but through the REAL parser. */
  def extractWavMetadata(spark: SparkSession,
      media: DataFrame): Dataset[WavMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(r => decodeWav(r.doc_id, r.payload)))
  }

  // ---- REAL codec: 24-bit BMP ---------------------------------------
  //
  // Uncompressed BMP is the image analog of PCM WAV: two fixed headers
  // plus raw bottom-up BGR rows padded to 4 bytes — no library needed.
  // So the image path gets a REAL writer, a REAL parser, and a REAL
  // nearest-neighbor resize that decodes pixels, rescales, and
  // re-encodes — the operation resizeStub only mimed.

  /** Pixel accessor contract: (x, y) from the TOP-left, returns
    * (r, g, b) each 0..255. */
  type PixelFn = (Int, Int) => (Int, Int, Int)

  /** Encode a 24-bit uncompressed BMP: BITMAPFILEHEADER ("BM", size,
    * pixel offset 54) + BITMAPINFOHEADER (40 bytes) + bottom-up BGR
    * rows, each padded to a 4-byte boundary. */
  def bmp24(width: Int, height: Int, px: PixelFn): Array[Byte] = {
    val rowPad = (4 - (3 * width) % 4) % 4
    val rowLen = 3 * width + rowPad
    val dataLen = rowLen * height
    val bb = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var yStored = 0
    while (yStored < height) {
      val y = height - 1 - yStored // rows are stored bottom-up
      var x = 0
      while (x < width) {
        val (r, g, b) = px(x, y)
        bb.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var p = 0
      while (p < rowPad) { bb.put(0.toByte); p += 1 }
      yStored += 1
    }
    bb.array()
  }

  /** Decoded 24-bit BMP: dimensions + a top-down pixel accessor. */
  final case class Bmp(width: Int, height: Int, px: PixelFn)

  /** REAL BMP parser: validates the magic, reads the pixel offset and
    * the BITMAPINFOHEADER dims, requires uncompressed 24-bit, and
    * returns an accessor that undoes the bottom-up row order and the
    * row padding. Rejects anything else loudly. */
  def decodeBmp(docId: Long, payload: Array[Byte]): Bmp = {
    require(payload.length >= 54 &&
        payload(0) == 'B'.toByte && payload(1) == 'M'.toByte,
      s"doc $docId: not a BMP payload")
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val offset = bb.getInt(10)
    val width = bb.getInt(18)
    val height = bb.getInt(22)
    val bpp = bb.getShort(28)
    val compression = bb.getInt(30)
    require(bpp == 24 && compression == 0,
      s"doc $docId: this decoder handles uncompressed 24-bit BMP, " +
        s"got $bpp bpp compression $compression")
    require(height > 0, s"doc $docId: top-down BMPs not supported")
    val rowLen = 3 * width + (4 - (3 * width) % 4) % 4
    Bmp(width, height, (x, y) => {
      val at = offset + (height - 1 - y) * rowLen + 3 * x
      ((payload(at + 2) & 0xff), (payload(at + 1) & 0xff),
        (payload(at) & 0xff))
    })
  }

  /** REAL nearest-neighbor resize: decode, map each target pixel to
    * source (x·w/w2, y·h/h2) by integer division, re-encode. This is
    * the operation [[resizeStub]] stood in for — actual pixels move. */
  def resizeBmp(docId: Long, payload: Array[Byte], w2: Int,
      h2: Int): Array[Byte] = {
    val src = decodeBmp(docId, payload)
    bmp24(w2, h2, (x, y) => src.px(x * src.width / w2, y * src.height / h2))
  }

  /** Per-image exact statistics off decoded pixels. */
  final case class BmpMeta(doc_id: Long, width: Long, height: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  def bmpMeta(docId: Long, payload: Array[Byte]): BmpMeta = {
    val b = decodeBmp(docId, payload)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < b.height) {
      var x = 0
      while (x < b.width) {
        val (r, g, bl) = b.px(x, y)
        sr += r; sg += g; sb += bl
        x += 1
      }
      y += 1
    }
    BmpMeta(docId, b.width.toLong, b.height.toLong, sr, sg, sb)
  }

  /** Deterministic synthetic image for doc_id — the formula the oracle
    * replays. */
  def synthPixel(docId: Long): PixelFn = (x, y) =>
    (((docId + 3L * x + 5L * y) % 256L).toInt,
      ((docId * 7L + x + 2L * y) % 256L).toInt,
      ((x.toLong * y + docId) % 256L).toInt)

  /** Media table of REAL BMP payloads, one 8×6 image per document. */
  def toBmpTable(spark: SparkSession, documents: DataFrame,
      width: Int = 8, height: Int = 6): DataFrame = {
    import spark.implicits._
    documents.select("doc_id").as[Long]
      .mapPartitions(_.map(id =>
        MediaRow(id, "bmp", bmp24(width, height, synthPixel(id)))))
      .toDF()
  }

  /** Decode-resize-decode per partition: REAL resize on REAL pixels,
    * metadata of the result — the typed-Dataset batch shape
    * throughout. */
  def resizeBmpTable(spark: SparkSession, media: DataFrame, w2: Int,
      h2: Int): Dataset[BmpMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(r =>
      bmpMeta(r.doc_id, resizeBmp(r.doc_id, r.payload, w2, h2))))
  }

  // ---- Perceptual image dedup (average hash) --------------------------
  //
  // The multimodal member of the dedup family: near-duplicate IMAGES
  // found by a perceptual fingerprint, not byte equality (dd_exact's
  // territory) — re-encoded/perturbed copies of one image should
  // collapse. Average hash (aHash, the classical pHash-family baseline):
  // decode, gray, threshold each pixel against the image's integer mean,
  // pack the bits. Every step is integer arithmetic off the REAL BMP
  // decoder, so the oracle replays hash, banding, and Hamming verify
  // arithmetically from the synth formula.

  /** Near-duplicate image corpus: documents sharing doc_id % groups get
    * ONE base gray pattern; every 4th doc perturbs a single
    * doc_id-chosen pixel by +128 — a visually-near copy whose aHash is
    * within a few bits of its group's. */
  def synthGroupPixel(docId: Long, groups: Int): PixelFn = (x, y) => {
    val gid = docId % groups
    // group-specific SLOPES, not just offsets: a constant offset shifts
    // every gray equally, leaving the mean-threshold bits — and hence
    // the hash — identical across groups (observed: 97 groups, ~5
    // distinct hashes, 33k pairs); varying the x/y multipliers gives
    // each group its own bit pattern
    val base = (((gid % 13L + 2L) * 6L * x + (gid % 17L + 3L) * 10L * y +
      gid * 5L) % 256L).toInt
    val g =
      if (docId % 4L == 0L && x == (docId % 8L).toInt &&
          y == ((docId / 8L) % 6L).toInt) (base + 128) % 256
      else base
    (g, g, g)
  }

  /** BMP table of the near-duplicate image corpus. */
  def toBmpGroupTable(spark: SparkSession, documents: DataFrame,
      groups: Int = 97, width: Int = 8, height: Int = 6): DataFrame = {
    import spark.implicits._
    documents.select("doc_id").as[Long]
      .mapPartitions(_.map(id =>
        MediaRow(id, "bmp", bmp24(width, height, synthGroupPixel(id, groups)))))
      .toDF()
  }

  /** Average hash of a decoded BMP: gray = (r+g+b) DIV 3, integer mean
    * over all pixels (sum DIV n), bit (y·width + x) set iff gray >
    * mean. width·height ≤ 63 bits. */
  def aHashBmp(docId: Long, payload: Array[Byte]): Long = {
    val b = decodeBmp(docId, payload)
    require(b.width * b.height <= 63,
      s"doc $docId: aHash packs into one long, got ${b.width}x${b.height}")
    val grays = new Array[Int](b.width * b.height)
    var sum = 0L
    var y = 0
    while (y < b.height) {
      var x = 0
      while (x < b.width) {
        val (r, g, bl) = b.px(x, y)
        val gr = (r + g + bl) / 3
        grays(y * b.width + x) = gr
        sum += gr
        x += 1
      }
      y += 1
    }
    val mean = sum / grays.length
    grays.zipWithIndex.foldLeft(0L) { case (acc, (g, i)) =>
      if (g > mean) acc | (1L << i) else acc
    }
  }

  /** (doc_id, ahash) for a BMP media table — the decode+hash pass. */
  def aHashTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow]
      .map(r => (r.doc_id, aHashBmp(r.doc_id, r.payload)))
      .toDF("doc_id", "ahash")
  }

  /** EXACT Hamming-≤maxDist pairs over the hash table via the pigeonhole
    * band join (the dd_simhash discipline): split `bits` into maxDist+1
    * equal bands — any pair within maxDist differs in at most maxDist
    * bands, so at least one band matches exactly; candidates come from a
    * band equi-join (never an all-pairs product), the Hamming verify
    * filters false candidates. Guaranteed recall, shuffles ∝ band
    * postings. Hashes must be NON-NEGATIVE (bits ≤ 62 enforced;
    * [[aHashBmp]] guarantees it) — integer DIV on a negative hash
    * rounds toward zero, so the band split would no longer partition
    * the bit positions and the pigeonhole recall argument breaks. */
  def perceptualDupPairs(hashes: DataFrame, bits: Int,
      maxDist: Int): DataFrame = {
    val bands = maxDist + 1
    require(bits >= bands && bits <= 62,
      s"bits=$bits out of [$bands, 62] (hashes live in a signed long)")
    require(bits % bands == 0,
      s"bits=$bits must split evenly into ${bands} bands")
    val w = bits / bands
    def banded(idCol: String) = hashes.select(
        col("doc_id").as(idCol), col("ahash").as(s"${idCol}_h"),
        explode(expr(
          s"""transform(sequence(0, ${bands - 1}), b ->
              struct(b AS band, (ahash DIV shiftleft(CAST(1 AS BIGINT), b * $w))
                       % shiftleft(CAST(1 AS BIGINT), $w) AS bv))""")).as("bb"))
      .select(col(idCol), col(s"${idCol}_h"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
    banded("doc_a").join(banded("doc_b"), Seq("band", "bv"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "doc_a_h", "doc_b_h").distinct()
      .withColumn("hamming",
        bit_count(col("doc_a_h").bitwiseXOR(col("doc_b_h"))))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
  }

  // ---- REAL demux: AVI container ------------------------------------
  //
  // Video completes the trio at the CONTAINER level: AVI is RIFF (like
  // WAV), so writing and demuxing it — headers, stream declaration,
  // frame chunk boundaries — needs no codec. What stays stubbed,
  // honestly, is only the per-frame PIXEL decode (MJPG/H.264 genuinely
  // need a library); frame payloads stay opaque bytes, which is
  // exactly what a frame-sampling training pipeline ships to a decoder
  // fleet anyway.

  /** AVI metadata + demuxed frame boundaries. */
  final case class AviMeta(doc_id: Long, width: Long, height: Long,
      us_per_frame: Long, n_frames: Long)
  final case class AviFrame(doc_id: Long, frame_idx: Long, n_bytes: Long,
      checksum: Long)

  /** Encode a minimal spec-conformant AVI: RIFF('AVI ') → LIST(hdrl)
    * with the 56-byte main header and a LIST(strl) declaring one
    * 'vids'/'MJPG' stream → LIST(movi) with one '00dc' chunk per frame
    * (even-padded, per RIFF). Frame bytes are OPAQUE. */
  def aviMjpg(usPerFrame: Int, width: Int, height: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    def fourcc(s: String) = s.getBytes("US-ASCII")
    val moviBody = frames.flatMap { f =>
      val pad = if (f.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
      fourcc("00dc") ++ le32(f.length) ++ f ++ pad
    }.toArray
    val strf = fourcc("strf") ++ le32(40) ++
      le32(40) ++ le32(width) ++ le32(height) ++ le16(1) ++ le16(24) ++
      fourcc("MJPG") ++ le32(width * height * 3) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(0)
    val strh = fourcc("strh") ++ le32(56) ++
      fourcc("vids") ++ fourcc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(usPerFrame) ++ le32(1000000) ++ le32(0) ++
      le32(frames.length) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(width) ++ le16(height)
    val strl = fourcc("LIST") ++ le32(4 + strh.length + strf.length) ++
      fourcc("strl") ++ strh ++ strf
    val avih = fourcc("avih") ++ le32(56) ++
      le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(width) ++ le32(height) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = fourcc("LIST") ++ le32(4 + avih.length + strl.length) ++
      fourcc("hdrl") ++ avih ++ strl
    val movi = fourcc("LIST") ++ le32(4 + moviBody.length) ++
      fourcc("movi") ++ moviBody
    fourcc("RIFF") ++ le32(4 + hdrl.length + movi.length) ++
      fourcc("AVI ") ++ hdrl ++ movi
  }

  private def le32(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
  private def le16(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array()

  /** REAL AVI demuxer: validates RIFF/'AVI ', walks the chunk tree to
    * the main header (width/height/frame timing/count) and the movi
    * list's video chunks (ids ending 'dc'), returning the frame byte
    * ranges — every frame boundary comes from the container, no codec
    * involved. Unknown chunks are skipped per spec. */
  def demuxAvi(docId: Long,
      payload: Array[Byte]): (AviMeta, Seq[(Int, Int)]) = {
    def ascii(from: Int) = new String(payload, from, 4, "US-ASCII")
    require(payload.length >= 12 && ascii(0) == "RIFF" && ascii(8) == "AVI ",
      s"doc $docId: not a RIFF/AVI payload")
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var meta: Option[AviMeta] = None
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def walk(from: Int, until: Int): Unit = {
      var pos = from
      // clamp: a truncated file may declare list/chunk sizes past the
      // buffer — never read beyond what exists
      val end = math.min(until, payload.length)
      while (pos + 8 <= end) {
        val id = ascii(pos)
        val len = bb.getInt(pos + 4)
        // untrusted length: negative would step backwards/zero and
        // loop forever (same hazard as the WAV walker)
        require(len >= 0, s"doc $docId: corrupt chunk length $len at $pos")
        id match {
          case "LIST" => walk(pos + 12, pos + 8 + len) // skip the list type
          case "avih" =>
            meta = Some(AviMeta(docId, bb.getInt(pos + 8 + 32).toLong,
              bb.getInt(pos + 8 + 36).toLong, bb.getInt(pos + 8).toLong,
              bb.getInt(pos + 8 + 16).toLong))
          case fid if fid.endsWith("dc") =>
            require(pos + 8 + len <= payload.length,
              s"doc $docId: truncated frame chunk at $pos")
            frames += ((pos + 8, len))
          case _ => // unknown chunk: skip
        }
        pos += 8 + len + (len & 1) // even alignment
      }
    }
    walk(12, payload.length)
    val m = meta.getOrElse(
      sys.error(s"doc $docId: AVI without a main header"))
    require(frames.length == m.n_frames,
      s"doc $docId: header declares ${m.n_frames} frames, movi has ${frames.length}")
    (m, frames.toSeq)
  }

  /** Deterministic opaque frame bytes — the formula the oracle
    * replays. */
  def synthFrame(docId: Long, idx: Int): Array[Byte] = {
    val n = (20 + (docId + idx) % 13).toInt
    Array.tabulate(n)(j => ((docId * 7 + idx * 11 + j * 3) % 256).toByte)
  }

  /** Media table of REAL AVI payloads: 5 + doc_id%9 opaque frames each
    * at 100000 µs/frame, 32×24 declared dims. */
  def toAviTable(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    documents.select("doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val n = (5 + id % 9).toInt
        MediaRow(id, "avi",
          aviMjpg(100000, 32, 24, (0 until n).map(i => synthFrame(id, i))))
      })
      .toDF()
  }

  /** Demux + sample every `every`-th frame per partition: frame
    * boundaries from the REAL container walk, per-frame byte length
    * and an exact checksum of the opaque payload (the bytes a decoder
    * fleet would receive). */
  def sampleAviFrames(spark: SparkSession, media: DataFrame,
      every: Int): Dataset[AviFrame] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.flatMap { r =>
      val (meta, frames) = demuxAvi(r.doc_id, r.payload)
      frames.zipWithIndex.collect {
        case ((from, len), i) if i % every == 0 =>
          var sum = 0L
          var j = 0
          while (j < len) {
            sum = (sum + (r.payload(from + j) & 0xffL)) % 1000000007L
            j += 1
          }
          AviFrame(meta.doc_id, i.toLong, len.toLong, sum)
      }
    })
  }

  // ---- scene-cut detection over real BMP-in-AVI sequences ------------

  /** One frame transition: total abs channel diff vs the previous
    * frame, and the thresholded cut verdict. */
  final case class SceneDiff(doc_id: Long, frame_idx: Long,
      diff_sum: Long, is_cut: Boolean)

  /** Deterministic cut position for doc_id — scene B starts here. */
  def sceneCutAt(docId: Long): Int = 2 + (docId % 4).toInt

  /** Scene-synthesis pixel formula: a per-frame jitter (i mod 3) keeps
    * same-scene neighbors from being byte-identical, and a +50 channel
    * shift lands at the cut. The scene BASE is taken mod 200 so base +
    * shift + jitter ≤ 251 — nothing ever wraps mod 256. (The first
    * draft modded the whole sum by 256: a −2 jitter step then wrapped
    * the pixels sitting at 0/1 to 254/255, and for docs whose value
    * window covered that edge the jitter transition spiked to ~5 000 —
    * past the cut threshold, 550 cuts for 500 docs. Wrap-free, the
    * margins are exact: same-scene Σdiff ≤ 2·3·w·h, cut Σdiff ≥
    * 48·3·w·h — a 24× separation.) */
  def synthScenePixel(docId: Long, idx: Int): PixelFn = {
    val shift = if (idx >= sceneCutAt(docId)) 50L else 0L
    val jit = idx % 3
    (x, y) => (
      (((docId + 3L * x + 7L * y) % 200L) + shift + jit).toInt,
      (((docId * 5L + x + 2L * y) % 200L) + shift + jit).toInt,
      (((docId + x.toLong * y) % 200L) + shift + jit).toInt)
  }

  /** Media table of REAL AVI containers whose frames are REAL 24-bit
    * BMPs — 8 frames of a two-scene sequence per document. */
  def toSceneAviTable(spark: SparkSession, documents: DataFrame,
      width: Int = 16, height: Int = 10, nFrames: Int = 8): DataFrame = {
    import spark.implicits._
    documents.select("doc_id").as[Long]
      .mapPartitions(_.map { id =>
        MediaRow(id, "avi", aviMjpg(40000, width, height,
          (0 until nFrames).map(i =>
            bmp24(width, height, synthScenePixel(id, i)))))
      })
      .toDF()
  }

  /** SCENE-CUT DETECTION — the first video-curation pass (shot
    * segmentation before frame sampling, so a sampler draws per SCENE
    * instead of per timestamp): demux the real container, decode every
    * frame with the real BMP parser, and score each consecutive pair
    * by total absolute channel difference; a transition is a cut when
    * the MEAN per-channel diff clears `meanMilli`/1000. On the
    * synthetic two-scene sequences the margins are wide and exact:
    * same-scene jitter moves a pixel by ≤ 2 (wrap-free: the base mods
    * by 200, so base + shift + jitter ≤ 251 never exceeds a byte),
    * the scene shift moves every channel by ~50 — the
    * detector must fire exactly once per document, at
    * [[sceneCutAt]]. All sums are exact integers; the verdict is an
    * integer comparison. Per-partition decode at the binary-codec
    * seam, like every mm_* operator. */
  def sceneCuts(spark: SparkSession, media: DataFrame,
      meanMilli: Long = 10000L): Dataset[SceneDiff] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.flatMap { r =>
      val (_, frames) = demuxAvi(r.doc_id, r.payload)
      val bmps = frames.map { case (from, len) =>
        decodeBmp(r.doc_id,
          java.util.Arrays.copyOfRange(r.payload, from, from + len))
      }
      (1 until bmps.length).map { i =>
        val (a, b) = (bmps(i - 1), bmps(i))
        var s = 0L
        var y = 0
        while (y < a.height) {
          var x = 0
          while (x < a.width) {
            val (r1, g1, b1) = a.px(x, y)
            val (r2, g2, b2) = b.px(x, y)
            s += math.abs(r1 - r2) + math.abs(g1 - g2) + math.abs(b1 - b2)
            x += 1
          }
          y += 1
        }
        SceneDiff(r.doc_id, i.toLong, s,
          s * 1000L > meanMilli * 3L * a.width * a.height)
      }
    })
  }

  // ---- REAL codec: grayscale PNG ------------------------------------
  //
  // PNG is the one COMPRESSED format the JDK alone can do honestly:
  // java.util.zip ships DEFLATE (Inflater/Deflater) and CRC32, and the
  // rest of the spec is chunk framing plus the five scanline filters.
  // The writer cycles through ALL five filter types (one per row) so
  // the decoder's unfiltering — the genuinely tricky part of PNG — is
  // exercised in full; the decoder verifies every chunk CRC, inflates,
  // and reconstructs pixels per the spec. 8-bit grayscale keeps the
  // predictor arithmetic 1 byte per pixel.

  /** Decoded grayscale PNG: dimensions + top-down pixel accessor. */
  final case class GrayPng(width: Int, height: Int, px: (Int, Int) => Int)

  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def be32(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(v).array() // PNG ints are BE

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode an 8-bit grayscale PNG. Row y is filtered with type y%5 —
    * deliberately cycling None/Sub/Up/Average/Paeth so every decoder
    * path is real data, not dead code. */
  def pngGray(width: Int, height: Int, px: (Int, Int) => Int): Array[Byte] = {
    val raw = new java.io.ByteArrayOutputStream()
    var prev = new Array[Int](width)
    for (y <- 0 until height) {
      val row = Array.tabulate(width)(x => px(x, y) & 0xff)
      val f = y % 5
      raw.write(f)
      for (x <- 0 until width) {
        val left = if (x > 0) row(x - 1) else 0
        val up = if (y > 0) prev(x) else 0
        val upLeft = if (x > 0 && y > 0) prev(x - 1) else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, upLeft)
        }
        raw.write((row(x) - pred) & 0xff)
      }
      prev = row
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw.toByteArray); deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = be32(width) ++ be32(height) ++
      Array[Byte](8, 0, 0, 0, 0) // depth 8, gray, deflate, adaptive, none
    PngSig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", out.toByteArray) ++
      pngChunk("IEND", Array.empty)
  }

  /** REAL PNG decoder for 8-bit grayscale: signature + chunk walk with
    * CRC VERIFICATION on every chunk, IDAT concatenation, zlib
    * inflation, and per-row unfiltering of all five filter types.
    * Anything else — wrong color type, bad CRC, truncation — fails
    * loudly. */
  def decodePng(docId: Long, payload: Array[Byte]): GrayPng = {
    require(payload.length > 8 &&
        payload.take(8).sameElements(PngSig),
      s"doc $docId: not a PNG payload")
    val bb = java.nio.ByteBuffer.wrap(payload) // big-endian by default
    var pos = 8
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    while (pos + 12 <= payload.length) {
      val len = bb.getInt(pos)
      val typ = new String(payload, pos + 4, 4, "US-ASCII")
      require(pos + 12 + len <= payload.length,
        s"doc $docId: truncated $typ chunk")
      val crc = new java.util.zip.CRC32()
      crc.update(payload, pos + 4, 4 + len)
      require(crc.getValue.toInt == bb.getInt(pos + 8 + len),
        s"doc $docId: CRC mismatch in $typ")
      typ match {
        case "IHDR" =>
          w = bb.getInt(pos + 8); h = bb.getInt(pos + 12)
          require(payload(pos + 16) == 8 && payload(pos + 17) == 0,
            s"doc $docId: this decoder handles 8-bit grayscale PNG")
        case "IDAT" => idat.write(payload, pos + 8, len)
        case _ => // ancillary chunk: skip
      }
      pos += 12 + len
    }
    require(w > 0 && h > 0 && idat.size() > 0,
      s"doc $docId: missing IHDR/IDAT")
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val scan = new Array[Byte]((w + 1) * h)
    var got = 0
    var stalled = false
    while (got < scan.length && !inflater.finished() && !stalled) {
      val n = inflater.inflate(scan, got, scan.length - got)
      got += n
      // a short-but-CRC-valid IDAT (e.g. IHDR height larger than the
      // encoded rows) exhausts the zlib stream with finished() still
      // false; inflate then returns 0 forever — break and fail below
      stalled = n == 0 && inflater.needsInput()
    }
    inflater.end()
    require(got == scan.length, s"doc $docId: short IDAT stream")
    val pix = Array.ofDim[Int](h, w)
    for (y <- 0 until h) {
      val f = scan(y * (w + 1)) & 0xff
      for (x <- 0 until w) {
        val v = scan(y * (w + 1) + 1 + x) & 0xff
        val left = if (x > 0) pix(y)(x - 1) else 0
        val up = if (y > 0) pix(y - 1)(x) else 0
        val upLeft = if (x > 0 && y > 0) pix(y - 1)(x - 1) else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, upLeft)
          case other => sys.error(s"doc $docId: unknown filter $other")
        }
        pix(y)(x) = (v + pred) & 0xff
      }
    }
    GrayPng(w, h, (x, y) => pix(y)(x))
  }

  /** Media table of REAL PNG payloads: a 16×10 deterministic gradient
    * per document. */
  def toPngTable(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    documents.select("doc_id").as[Long]
      .mapPartitions(_.map(id => MediaRow(id, "png",
        pngGray(16, 10, (x, y) => ((id + 3L * x + 7L * y) % 256L).toInt))))
      .toDF()
  }

  /** Per-image exact statistics off DEFLATE-round-tripped pixels. */
  final case class PngMeta(doc_id: Long, width: Long, height: Long,
      px_sum: Long)

  def extractPngMetadata(spark: SparkSession,
      media: DataFrame): Dataset[PngMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      val p = decodePng(r.doc_id, r.payload)
      var s = 0L
      for (y <- 0 until p.height; x <- 0 until p.width) s += p.px(x, y)
      PngMeta(r.doc_id, p.width.toLong, p.height.toLong, s)
    })
  }

  // ---- REAL pixel codec: baseline JPEG via the JDK's ImageIO --------
  //
  // The zero-dependency constraint rules out third-party codec
  // libraries, but the JDK itself ships a baseline JPEG reader/writer
  // (javax.imageio) — so the JPEG path can be REAL end to end with no
  // external jar. The determinism caveat, documented honestly: JPEG
  // decode output is implementation-dependent (IDCT rounding differs
  // across JDK builds), so this path is property-tested with a pixel
  // tolerance rather than DuckDB-oracled — unlike the bit-exact
  // WAV/BMP/PNG trio above. Only video PIXEL decode (H.264 etc.)
  // remains a genuinely library-bound stub.

  /** Encode an 8-bit grayscale image as baseline JPEG at the given
    * quality through the JDK writer. */
  def jpegGray(w: Int, h: Int, px: (Int, Int) => Int,
      quality: Float = 0.95f): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      raster.setSample(x, y, 0, px(x, y) & 0xff)
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpg").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose()
    ios.close()
    out.toByteArray
  }

  final case class Jpeg(width: Int, height: Int, px: (Int, Int) => Int)

  /** Decode ANY JPEG the JDK reader handles (baseline + progressive)
    * to grayscale pixels (luma for color inputs). Rejects non-JPEG
    * payloads loudly — ImageIO returns null rather than throwing. */
  def decodeJpeg(docId: Long, payload: Array[Byte]): Jpeg = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, s"doc $docId: not a decodable image payload")
    val w = img.getWidth
    val h = img.getHeight
    val gray =
      if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) img
      else {
        val g = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val gr = g.createGraphics()
        gr.drawImage(img, 0, 0, null)
        gr.dispose()
        g
      }
    val raster = gray.getRaster
    Jpeg(w, h, (x, y) => raster.getSample(x, y, 0))
  }

  /** Per-image statistics off ImageIO-decoded pixels. px_sum is exact
    * FOR A GIVEN JDK but not across JDK builds (IDCT rounding) — keep
    * this out of the DuckDB-oracled registry; assert with tolerance. */
  final case class JpegMeta(doc_id: Long, width: Long, height: Long,
      px_sum: Long)

  def extractJpegMetadata(spark: SparkSession,
      media: DataFrame): Dataset[JpegMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      val j = decodeJpeg(r.doc_id, r.payload)
      var s = 0L
      for (y <- 0 until j.height; x <- 0 until j.width) s += j.px(x, y)
      JpegMeta(r.doc_id, j.width.toLong, j.height.toLong, s)
    })
  }

  /** Deterministic per-frame grayscale pattern — a SMOOTH moving
    * gradient (no wraparound edges: JPEG's DCT murders step
    * discontinuities, and the tests assert a small pixel tolerance). */
  def mjpegPixel(docId: Long, idx: Int): (Int, Int) => Int =
    (x, y) => math.min(255,
      40 + x * 3 + y * 2 + (docId % 16).toInt * 2 + idx * 5)

  /** Media table of REAL playable MJPEG AVIs: each '00dc' chunk is a
    * genuine JDK-encoded baseline JPEG of [[mjpegPixel]] — unlike
    * [[toAviTable]]'s opaque frames, these files are actual videos any
    * MJPEG-capable player decodes. */
  def toMjpegAviTable(spark: SparkSession, documents: DataFrame,
      w: Int = 32, h: Int = 24): DataFrame = {
    import spark.implicits._
    documents.select("doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val n = (3 + id % 4).toInt
        MediaRow(id, "mjpeg",
          aviMjpg(100000, w, h,
            (0 until n).map(i => jpegGray(w, h, mjpegPixel(id, i)))))
      })
      .toDF()
  }

  final case class MjpegFrame(doc_id: Long, frame_idx: Long, width: Long,
      height: Long, px_sum: Long)

  /** REAL video pixel decode for MJPEG: [[demuxAvi]]'s container walk
    * yields each frame's byte range and [[decodeJpeg]] turns the range
    * into pixels — video file to pixel values end to end with zero
    * external libraries. px_sum is JDK-build-dependent (IDCT
    * rounding), so this path is property-tested with a pixel tolerance
    * and never DuckDB-oracled — the same honesty contract as
    * [[extractJpegMetadata]]. With this, only INTER-frame video codecs
    * (H.264, VP9, …) remain library-bound stubs. */
  def decodeMjpegFrames(spark: SparkSession, media: DataFrame,
      every: Int = 1): Dataset[MjpegFrame] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.flatMap { r =>
      val (meta, frames) = demuxAvi(r.doc_id, r.payload)
      frames.zipWithIndex.collect {
        case ((from, len), i) if i % every == 0 =>
          val j = decodeJpeg(r.doc_id,
            java.util.Arrays.copyOfRange(r.payload, from, from + len))
          var s = 0L
          for (y <- 0 until j.height; x <- 0 until j.width) s += j.px(x, y)
          MjpegFrame(meta.doc_id, i.toLong, j.width.toLong,
            j.height.toLong, s)
      }
    })
  }

  // ---- REAL codec: GFV1 inter-frame (I + P-frame) video -------------
  //
  // The one genuinely library-bound hole in the video lane is the
  // ENTROPY CODING of H.264/VP9 (CABAC, arithmetic range coding) — but
  // inter-frame RECONSTRUCTION, the property that makes video "video"
  // (a frame is not decodable without the frames before it), needs no
  // library at all. GFV1 is a minimal I+P container exercising exactly
  // that: a full keyframe, then per-frame sparse pixel WRITES
  // (dirty-rect updates), so decoding frame k requires folding the
  // write lists of frames 1..k over the keyframe — random access does
  // not exist, the constraint every video pipeline schedules around
  // (and why real codecs re-key periodically). The state is
  // INTRA-RECORD (one payload column holds the clip), so the Spark
  // shape stays the embarrassingly-parallel per-record kernel; the
  // sequential dependency lives inside the fold, exactly as it does
  // inside a real decoder.
  //
  // Layout (little-endian): "GFV1", int32 w, h, n_frames; w·h bytes of
  // keyframe gray pixels; then per P-frame: int16 m, m × (int32 idx,
  // uint8 value) — SET pixel idx to value, applied in list order
  // (later writes in one frame win, like overlapping dirty rects).

  /** Encode a GFV1 clip from a keyframe and per-P-frame write lists. */
  def gfv1(w: Int, h: Int, key: Array[Byte],
      pframes: Seq[Seq[(Int, Int)]]): Array[Byte] = {
    require(key.length == w * h, "keyframe must be w*h bytes")
    val size = 16 + w * h + pframes.map(2 + _.size * 5).sum
    val bb = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GFV1".getBytes("US-ASCII"))
      .putInt(w).putInt(h).putInt(1 + pframes.size)
    bb.put(key)
    pframes.foreach { ws =>
      bb.putShort(ws.size.toShort)
      ws.foreach { case (idx, v) => bb.putInt(idx).put((v & 0xff).toByte) }
    }
    bb.array()
  }

  final case class PFrameStat(doc_id: Long, frame_idx: Long,
      checksum: Long, n_writes: Long)

  /** Decode a GFV1 payload by folding each P-frame's writes over the
    * reconstruction state, emitting per-frame exact integer stats
    * (checksum = Σ pixels AFTER that frame's writes; the keyframe
    * counts 0 writes). Rejects non-GFV1 payloads loudly. */
  def decodeGfv1(docId: Long, payload: Array[Byte]): Iterator[PFrameStat] = {
    require(payload.length >= 16 &&
      new String(payload, 0, 4, "US-ASCII") == "GFV1",
      s"doc $docId: not a GFV1 payload")
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val w = bb.getInt(4); val h = bb.getInt(8); val nf = bb.getInt(12)
    require(w > 0 && h > 0 && nf > 0 && payload.length >= 16 + w * h,
      s"doc $docId: corrupt GFV1 header ($w x $h x $nf)")
    val px = new Array[Int](w * h)
    var i = 0
    while (i < w * h) { px(i) = payload(16 + i) & 0xff; i += 1 }
    var sum = 0L; i = 0
    while (i < w * h) { sum += px(i); i += 1 }
    var pos = 16 + w * h
    val out = scala.collection.mutable.ArrayBuffer(
      PFrameStat(docId, 0L, sum, 0L))
    var f = 1
    while (f < nf) {
      val m = bb.getShort(pos); pos += 2
      var j = 0
      while (j < m) {
        val idx = bb.getInt(pos); val v = payload(pos + 4) & 0xff
        pos += 5
        require(idx >= 0 && idx < w * h,
          s"doc $docId: write outside the frame ($idx)")
        sum += v - px(idx) // incremental checksum — the fold IS the state
        px(idx) = v
        j += 1
      }
      out += PFrameStat(docId, f.toLong, sum, m.toLong)
      f += 1
    }
    out.iterator
  }

  /** Media table of GFV1 clips synthesized deterministically from
    * doc_id (the formulas the oracle replays): 8×6 keyframe
    * px(idx) = (doc_id + 3·(idx mod 8) + 7·(idx div 8)) mod 256;
    * 4 + doc_id mod 5 frames total; P-frame f carries
    * 1 + (doc_id + f) mod 4 writes, write j setting
    * idx = (doc_id·13 + f·31 + j·17) mod 48 to
    * (doc_id + f·5 + j·11) mod 256. */
  def toGfv1Table(spark: SparkSession, documents: DataFrame,
      w: Int = 8, h: Int = 6): DataFrame = {
    import spark.implicits._
    documents.select("doc_id").as[Long].mapPartitions(_.map { id =>
      val key = Array.tabulate(w * h)(i =>
        ((id + 3 * (i % w) + 7 * (i / w)) % 256).toByte)
      val nf = (4 + id % 5).toInt
      val pfs = (1 until nf).map { f =>
        val m = (1 + (id + f) % 4).toInt
        (0 until m).map { j =>
          (((id * 13 + f * 31 + j * 17) % (w * h)).toInt,
            ((id + f * 5 + j * 11) % 256).toInt)
        }
      }
      MediaRow(id, "gfv1", gfv1(w, h, key, pfs))
    }).toDF()
  }

  /** Decode a GFV1 table per partition — the inter-frame member of the
    * decode family. */
  def extractGfv1Stats(spark: SparkSession,
      media: DataFrame): Dataset[PFrameStat] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.flatMap(r =>
      decodeGfv1(r.doc_id, r.payload)))
  }

  /** Fixed-width feature vector per frame (STUB standing in for a real
    * embedding model: mean byte value + normalized length + head bytes).
    * The shape — binary in, Array[Float] out, batched per partition — is
    * what a model-server UDF needs. */
  def frameFeatures(spark: SparkSession, frames: Dataset[Frame], dims: Int = 8):
      Dataset[(Long, Int, Array[Float])] = {
    import spark.implicits._
    frames.mapPartitions(_.map { f =>
      val v = new Array[Float](dims)
      if (f.frame.nonEmpty) {
        v(0) = f.frame.map(b => (b & 0xff).toFloat).sum / f.frame.length
        v(1) = f.frame.length.toFloat
        var i = 0
        while (i < dims - 2 && i < f.frame.length) {
          v(i + 2) = (f.frame(i) & 0xff).toFloat
          i += 1
        }
      }
      (f.doc_id, f.frame_idx, v)
    })
  }
}
