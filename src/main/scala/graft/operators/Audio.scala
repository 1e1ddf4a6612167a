package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One mel band of one analysis frame: integer band energy plus its
  * portable log (the feature a training pipeline consumes). */
final case class MelFrame(doc_id: Long, frame_idx: Long, band: Long,
    energy: Long)

/** FIXED-POINT MEL-SPECTROGRAM over the real WAV lane — the audio
  * feature extractor the LLM-pipeline brief's audio story was missing
  * beyond decode/resample (mm_wav_decode stops at duration + Σ|sample|;
  * a speech-data curation pass filters and clusters on spectral
  * features, Davis & Mermelstein 1980's mel-cepstrum front end).
  *
  * Exactness strategy (the PortableLn discipline applied to DSP): a
  * float FFT would never oracle — libm sin/cos differ across engines in
  * the last ulp and an FFT compounds them — so every stage up to the
  * final log is INTEGER arithmetic on integer literals:
  *
  *  1. Framing: `Window`-sample frames every `Hop` samples (frames
  *     that would overrun the clip are dropped, standard STFT edge
  *     handling).
  *  2. DFT: re/im per bin k = Σ_t s[t]·T[k][t] with T = round(cos/sin
  *     · 2¹⁴) — the trig tables are computed ONCE on the JVM and
  *     shipped as the SAME integer literals to the Spark kernel and
  *     the DuckDB oracle text, so "which cosine library" can never
  *     matter. |re| ≤ 32·1000·2¹⁴ ≈ 5.2e8; re²+im² ≤ 5.5e17 — inside
  *     long, no overflow at any corpus size (bounds are per-frame,
  *     not per-corpus).
  *  3. Power: p[k] = (re² + im²) / 2²⁸ (integer division undoes the
  *     squared table scale; truncation is deterministic and mirrored
  *     by the oracle's `//`).
  *  4. Mel filterbank: `Bands` triangular filters on the mel scale
  *     (2595·log₁₀(1+f/700)) over the bin frequencies, quantized to
  *     /64 integer weights — again shared literals. Band energy
  *     E = Σ_k w[m][k]·p[k] ≤ 8·17·2e9 ≈ 2.7e11.
  *  5. log-mel = PortableLn(E + 1): the one non-integer step, through
  *     the repo's bit-identical-in-both-engines ln.
  *
  * Scale shape: the kernel is per-RECORD imperative DSP over a binary
  * payload (the decodeWav pattern) — embarrassingly parallel
  * mapPartitions, zero shuffles, cost ∝ bytes scanned; at 100 TB this
  * is a pure map stage whose output (docs × frames × bands rows) feeds
  * ordinary relational ops. Tables are built once per JVM (object
  * fields) and per-rate filterbanks memoized per partition — no
  * per-row trig, no broadcast needed (the closure ships ~1 KB of
  * literals). */
object Audio {

  /** STFT geometry: 32-sample frames, half-overlap, one-sided
    * spectrum (k = 0..16), 6 mel bands. Small because the synthetic
    * clips are 40–96 samples; the arithmetic bounds above hold for
    * any 16-bit input at this window. */
  val Window = 32
  val Hop = 16
  val Bins: Int = Window / 2 + 1
  val Bands = 6

  /** Trig table scale 2¹⁴ — power carries 2²⁸, undone at stage 3. */
  val TrigScale = 16384L
  val PowDiv: Long = TrigScale * TrigScale

  /** Mel filter weight scale. */
  val MelScale = 64L

  /** round(cos(2πkt/W)·2¹⁴) — the shared-literal DFT tables. */
  val CosQ: Array[Array[Long]] = Array.tabulate(Bins, Window)((k, t) =>
    math.round(math.cos(2.0 * math.Pi * k * t / Window) * TrigScale))
  val SinQ: Array[Array[Long]] = Array.tabulate(Bins, Window)((k, t) =>
    math.round(math.sin(2.0 * math.Pi * k * t / Window) * TrigScale))

  private def melOf(hz: Double): Double =
    2595.0 * math.log10(1.0 + hz / 700.0)
  private def hzOf(mel: Double): Double =
    700.0 * (math.pow(10.0, mel / 2595.0) - 1.0)

  /** Triangular mel filterbank for a sample rate, quantized to /64
    * integers: `Bands` filters with centers equally spaced on the mel
    * scale between 0 and Nyquist, each weighting the `Bins` DFT bin
    * frequencies k·rate/W. */
  def melWeights(rate: Int): Array[Array[Long]] = {
    val pts = (0 to Bands + 1).map(i =>
      hzOf(melOf(rate / 2.0) * i / (Bands + 1)))
    Array.tabulate(Bands, Bins) { (m, k) =>
      val f = k.toDouble * rate / Window
      val (lo, c, hi) = (pts(m), pts(m + 1), pts(m + 2))
      val w =
        if (f <= lo || f >= hi) 0.0
        else if (f <= c) (f - lo) / (c - lo)
        else (hi - f) / (hi - c)
      math.round(w * MelScale)
    }
  }

  /** The per-clip kernel: integer STFT power → mel band energies. */
  def melFrames(docId: Long, samples: Array[Short],
      melW: Array[Array[Long]]): Iterator[MelFrame] = {
    val n = samples.length
    if (n < Window) Iterator.empty
    else (0 until (n - Window) / Hop + 1).iterator.flatMap { f =>
      val p = Array.tabulate(Bins) { k =>
        var re = 0L; var im = 0L
        var t = 0
        while (t < Window) {
          val v = samples(f * Hop + t).toLong
          re += v * CosQ(k)(t); im += v * SinQ(k)(t)
          t += 1
        }
        (re * re + im * im) / PowDiv
      }
      (0 until Bands).iterator.map { m =>
        var e = 0L
        var k = 0
        while (k < Bins) { e += melW(m)(k) * p(k); k += 1 }
        MelFrame(docId, f.toLong, m.toLong, e)
      }
    }
  }

  /** Mel-spectrogram of a WAV media table: one row per
    * (doc, frame, band) with integer energy and PortableLn log-mel. */
  def melSpectrogram(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val frames = media.as[MediaRow].mapPartitions { it =>
      // per-rate filterbanks memoized per partition: weights depend on
      // the payload's own fmt-chunk rate, not an assumed constant
      val byRate =
        scala.collection.mutable.Map.empty[Int, Array[Array[Long]]]
      it.flatMap { r =>
        val (rate, s) = Multimodal.pcmSamples(r.doc_id, r.payload)
        melFrames(r.doc_id, s, byRate.getOrElseUpdate(rate, melWeights(rate)))
      }
    }.toDF()
    graft.functions.PortableLn.withLn(
        frames.withColumn("e1", expr("CAST(energy + 1 AS DOUBLE)")),
        "e1", "logmel")
      .select("doc_id", "frame_idx", "band", "energy", "logmel")
  }

  private def lit2d(a: Array[Array[Long]]): String =
    a.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

  /** The CTE pipeline of the DuckDB replay: synth waveform → the same
    * integer frames, DFT tables, power truncation, mel weights
    * (identical literals — this string embeds [[CosQ]]/[[SinQ]]/
    * [[melWeights]] verbatim), and the same PortableLn chain. The
    * final CTE ([[graft.functions.PortableLn.cteChainOut]] of "lnm")
    * has (doc_id, frame_idx, band, energy, logmel). */
  private def melCtesSql(rate: Int): String = {
    import graft.functions.PortableLn
    val cos = lit2d(CosQ)
    val sin = lit2d(SinQ)
    val mw = lit2d(melWeights(rate))
    s"""n AS (SELECT doc_id, 40 + doc_id % 57 AS ns FROM documents),
      fr AS (SELECT doc_id, f FROM n,
             LATERAL (SELECT unnest(generate_series(0, (ns - $Window) // $Hop)) AS f)),
      sm AS (SELECT doc_id, f, t,
               ((doc_id * 31 + (f * $Hop + t) * 7) % 2001) - 1000 AS s
             FROM fr, LATERAL (SELECT unnest(generate_series(0, ${Window - 1})) AS t)),
      dft AS (SELECT doc_id, f, k,
                sum(s * ($cos)[k + 1][t + 1]) AS re,
                sum(s * ($sin)[k + 1][t + 1]) AS im
              FROM sm, LATERAL (SELECT unnest(generate_series(0, ${Bins - 1})) AS k)
              GROUP BY doc_id, f, k),
      pw AS (SELECT doc_id, f, k,
               (re * re + im * im) // $PowDiv AS p FROM dft),
      mel AS (SELECT doc_id, f AS frame_idx, m AS band,
                CAST(sum(($mw)[m + 1][k + 1] * p) AS BIGINT) AS energy
              FROM pw, LATERAL (SELECT unnest(generate_series(0, ${Bands - 1})) AS m)
              GROUP BY doc_id, f, m),
      e0 AS (SELECT doc_id, frame_idx, band, energy,
               CAST(energy + 1 AS DOUBLE) AS e1 FROM mel),
      ${PortableLn.cteChainSql("e0", "e1", "logmel", "lnm")}"""
  }

  /** Oracle for [[melSpectrogram]]. */
  def melOracleSql(rate: Int = 8000): String =
    s"""WITH ${melCtesSql(rate)}
      SELECT doc_id, frame_idx, band, energy, logmel
      FROM ${graft.functions.PortableLn.cteChainOut("lnm")}"""

  // ---- MFCC: DCT-II of the log-mel ----------------------------------

  /** DCT-II basis value cos(π·c·(m+½)/Bands) — shipped as the same
    * double literal to both engines (PortableLn.dbl). */
  def dctCoef(c: Int, m: Int): Double =
    math.cos(math.Pi * c * (m + 0.5) / Bands)

  /** The shared-text MFCC coefficient expression: a LEFT-ASSOCIATED
    * sum of (b_m · coef) products over the pivoted band columns
    * b0..b5. Every op is an exactly-rounded IEEE multiply/add on the
    * same literals in the same parenthesization, so Spark and DuckDB
    * produce the same 64 bits — the PortableLn discipline applied to
    * the cepstral transform (Davis & Mermelstein 1980). */
  def mfccExprSql(c: Int): String =
    (0 until Bands).map(m =>
        s"(b$m * ${graft.functions.PortableLn.dbl(dctCoef(c, m))})")
      .reduce((a, b) => s"($a + $b)")

  /** MFCC features: one row per (doc, frame) with `Bands` cepstral
    * coefficients. The pivot is a bounded conditional agg (band is
    * 0..5 by construction — max over exactly one value per cell), and
    * the DCT is a per-row projection: still zero extra shuffles past
    * the pivot's ∝-rows groupBy. */
  def mfcc(spark: SparkSession, media: DataFrame): DataFrame = {
    val wide = melSpectrogram(spark, media)
      .groupBy("doc_id", "frame_idx")
      .agg(
        max(when(col("band") === 0, col("logmel"))).as("b0"),
        (1 until Bands).map(m =>
          max(when(col("band") === m, col("logmel"))).as(s"b$m")): _*)
    wide.select(
      col("doc_id") +: col("frame_idx") +:
        (0 until Bands).map(c => expr(mfccExprSql(c)).as(s"mfcc$c")): _*)
  }

  /** Oracle for [[mfcc]]: the mel CTEs + the same conditional-agg
    * pivot + the identical [[mfccExprSql]] texts. */
  def mfccOracleSql(rate: Int = 8000): String = {
    val bCols = (0 until Bands).map(m =>
      s"max(CASE WHEN band = $m THEN logmel END) AS b$m").mkString(", ")
    val cCols = (0 until Bands).map(c =>
      s"${mfccExprSql(c)} AS mfcc$c").mkString(",\n        ")
    s"""WITH ${melCtesSql(rate)},
      wide AS (SELECT doc_id, frame_idx, $bCols
               FROM ${graft.functions.PortableLn.cteChainOut("lnm")}
               GROUP BY doc_id, frame_idx)
      SELECT doc_id, frame_idx,
        $cCols
      FROM wide"""
  }

  // ---- Audio fingerprinting: constellation peak pairs ---------------

  /** One cell of the integer STFT power grid. */
  final case class PowerCell(doc_id: Long, frame_idx: Long, bin: Long,
      p: Long)

  /** The integer power grid (doc, frame, bin) → p — the [[melFrames]]
    * DFT stages without the filterbank, exposed for the fingerprinting
    * path (Wang 2003's constellation works on spectral peaks, not mel
    * energies). Same per-record map-stage shape. */
  def binPower(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.flatMap { r =>
      val (_, samples) = Multimodal.pcmSamples(r.doc_id, r.payload)
      val n = samples.length
      if (n < Window) Iterator.empty
      else (0 until (n - Window) / Hop + 1).iterator.flatMap { f =>
        (0 until Bins).iterator.map { k =>
          var re = 0L; var im = 0L
          var t = 0
          while (t < Window) {
            val v = samples(f * Hop + t).toLong
            re += v * CosQ(k)(t); im += v * SinQ(k)(t)
            t += 1
          }
          PowerCell(r.doc_id, f.toLong, k.toLong,
            (re * re + im * im) / PowDiv)
        }
      }
    }).toDF()
  }

  /** Max anchor→target frame distance for a fingerprint pair. */
  val FpMaxDt = 3

  /** One constellation fingerprint row (see [[fingerprints]]). */
  final case class FpRow(doc_id: Long, frame_idx: Long, ba: Long, bb: Long,
      dt: Long, rb: Long)

  /** [[fingerprints]] computed ENTIRELY inside the per-record kernel —
    * value-identical (pinned in AudioSpec), zero shuffles: a clip's
    * grid, peaks, and pairs never cross record boundaries, so the
    * relational form's two windows + self-join can collapse into the
    * same map stage that decodes the bytes. This is also the form a
    * STREAMING source needs — lag/lead windows don't exist on an
    * unbounded stream, but a per-record kernel runs on one unchanged
    * ([[graft.streaming.AudioMatchStream]]). */
  def fingerprintsKernel(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.flatMap { r =>
      val (_, samples) = Multimodal.pcmSamples(r.doc_id, r.payload)
      val n = samples.length
      if (n < Window) Iterator.empty
      else {
        val nf = (n - Window) / Hop + 1
        val p = Array.tabulate(nf, Bins) { (f, k) =>
          var re = 0L; var im = 0L
          var t = 0
          while (t < Window) {
            val v = samples(f * Hop + t).toLong
            re += v * CosQ(k)(t); im += v * SinQ(k)(t)
            t += 1
          }
          (re * re + im * im) / PowDiv
        }
        def at(f: Int, k: Int): Long =
          if (f < 0 || f >= nf || k < 0 || k >= Bins) -1L else p(f)(k)
        val peaks = for {
          f <- 0 until nf; k <- 0 until Bins
          v = p(f)(k)
          if v > 0 && v > at(f - 1, k) && v > at(f + 1, k) &&
            v > at(f, k - 1) && v > at(f, k + 1)
        } yield (f, k, v)
        val byFrame = peaks.groupBy(_._1)
        peaks.iterator.flatMap { case (f, ba, pa) =>
          (1 to FpMaxDt).iterator.flatMap { dt =>
            byFrame.getOrElse(f + dt, Nil).map { case (_, bb, pb) =>
              val rb =
                if (pa >= pb * 16) 4L
                else if (pa >= pb * 4) 3L
                else if (pa >= pb) 2L
                else if (pa * 4 >= pb) 1L
                else 0L
              FpRow(r.doc_id, f.toLong, ba.toLong, bb.toLong, dt.toLong, rb)
            }
          }
        }
      }
    }).toDF()
  }

  /** Audio fingerprints via the CONSTELLATION scheme (Wang 2003, the
    * Shazam paper): local spectral peaks — p strictly above all four
    * grid neighbors (integer comparisons, so both engines agree on
    * every peak) and above zero — paired anchor→target within
    * [[FpMaxDt]] frames forward. The fingerprint key is
    * (anchor bin, target bin, Δframe, power-ratio bucket); the ratio
    * bucket comes from integer cross-multiplied CASE thresholds
    * (≥16×, ≥4×, ≥1×, ≥¼×), never a float log. Returns one row per
    * pair: (doc_id, frame_idx = anchor frame, ba, bb, dt, rb).
    *
    * Scale shape: two windows partitioned by (doc, band)/(doc, frame)
    * — cardinality ∝ docs, never constant-domain — then one in-doc
    * equi-join on (doc, frame+dt). Key-space sizing caveat for
    * production corpora: 17 bins × 3 deltas × 5 ratio classes ≈ 4.3k
    * distinct keys is plenty for the match join at these SFs, but a
    * warehouse-scale library would widen the grid (larger window →
    * more bins) before relying on key selectivity — same df-cap
    * discipline as the text LSH family. */
  def fingerprints(spark: SparkSession, media: DataFrame): DataFrame = {
    val grid = binPower(spark, media)
    val byBand = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id", "bin").orderBy("frame_idx")
    val byFrame = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id", "frame_idx").orderBy("bin")
    val peaks = grid
      .withColumn("pf", coalesce(lag("p", 1).over(byBand), lit(-1L)))
      .withColumn("nf", coalesce(lead("p", 1).over(byBand), lit(-1L)))
      .withColumn("pb", coalesce(lag("p", 1).over(byFrame), lit(-1L)))
      .withColumn("nb", coalesce(lead("p", 1).over(byFrame), lit(-1L)))
      .filter(col("p") > 0L && col("p") > col("pf") && col("p") > col("nf") &&
        col("p") > col("pb") && col("p") > col("nb"))
      .select("doc_id", "frame_idx", "bin", "p")
    val anchors = peaks.select(col("doc_id"), col("frame_idx"),
        col("bin").as("ba"), col("p").as("pa"))
      .withColumn("dt", explode(array((1 to FpMaxDt).map(lit(_)): _*)))
      .withColumn("tf", col("frame_idx") + col("dt"))
    anchors.join(
        peaks.select(col("doc_id"), col("frame_idx").as("tf"),
          col("bin").as("bb"), col("p").as("pb2")),
        Seq("doc_id", "tf"))
      .select(col("doc_id"), col("frame_idx"), col("ba"), col("bb"),
        col("dt").cast("long").as("dt"),
        // integer cross-multiplied ratio classes — no float log
        when(col("pa") >= col("pb2") * 16, lit(4L))
          .when(col("pa") >= col("pb2") * 4, lit(3L))
          .when(col("pa") >= col("pb2"), lit(2L))
          .when(col("pa") * 4 >= col("pb2"), lit(1L))
          .otherwise(lit(0L)).as("rb"))
  }

  /** Offset-consistent duplicate matching over [[fingerprints]]: two
    * clips sharing ≥ `minMatches` fingerprint keys at ONE consistent
    * frame offset are the same recording time-shifted (the property
    * that makes the constellation robust to cropping — a copy missing
    * its first hop still aligns every surviving peak at one offset).
    * The match join is an equi-join on the fingerprint key; the offset
    * histogram is a groupBy — no product ever forms beyond key
    * collisions. Reports each pair's BEST alignment only (max
    * n_matches, smallest offset on ties): periodic audio aligns
    * passably at many offsets — identical chirp-class clips at every
    * multiple of the chirp period — and emitting the full histogram
    * both buries the answer and makes the output ∝ offsets × pairs
    * instead of ∝ pairs (measured at sf0.1: 111k histogram rows for
    * ~3k real pairs). The best-offset window partitions by the pair
    * key — cardinality ∝ pairs, never constant.
    * Returns (doc_a, doc_b, offset, n_matches). */
  def offsetMatches(fp: DataFrame, minMatches: Int): DataFrame = {
    val a = fp.select(col("doc_id").as("doc_a"),
      col("frame_idx").as("fa"), col("ba"), col("bb"), col("dt"), col("rb"))
    val b = fp.select(col("doc_id").as("doc_b"),
      col("frame_idx").as("fb"), col("ba"), col("bb"), col("dt"), col("rb"))
    // fully qualified: `Window` the geometry field shadows the import
    val byPair = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_a", "doc_b")
      .orderBy(col("n_matches").desc, col("offset").asc)
    a.join(b, Seq("ba", "bb", "dt", "rb"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("fa") - col("fb")).as("offset"))
      .groupBy("doc_a", "doc_b", "offset")
      .agg(count(lit(1)).as("n_matches"))
      .filter(col("n_matches") >= minMatches)
      .withColumn("rk", row_number().over(byPair))
      .filter(col("rk") === 1).drop("rk")
  }

  /** Snippet → library LOOKUP over fingerprints — the constellation's
    * production shape (Wang 2003 matches a QUERY against a stored
    * index; it does not all-pairs a corpus). All-pairs discovery over
    * this demo's 14-bin alphabet is inherently noisy-quadratic
    * (measured: 18% of sf0.1 pairs cleared the histogram threshold by
    * chance — a real deployment gets its precision from ~2³⁰ hash
    * keys, not from thresholds), while lookup is linear in the
    * library and argmax-precise: per query, the candidate with the
    * most key hits at ONE offset wins (ties → smallest candidate id,
    * then smallest offset — identical-audio library members are
    * genuinely indistinguishable, so the tie-break just makes the
    * answer deterministic). The join is keyed on the fingerprint; the
    * best-match window partitions by query — cardinality ∝ queries.
    * Returns (query_id, matched_doc, offset, n_matches). */
  def lookup(libraryFp: DataFrame, queryFp: DataFrame,
      minMatches: Int): DataFrame = {
    val q = queryFp.select(col("doc_id").as("query_id"),
      col("frame_idx").as("fq"), col("ba"), col("bb"), col("dt"), col("rb"))
    val l = libraryFp.select(col("doc_id").as("matched_doc"),
      col("frame_idx").as("fl"), col("ba"), col("bb"), col("dt"), col("rb"))
    // the snippet batch ≪ the library by contract — broadcast it so
    // the library side streams with no exchange
    bestPerQuery(broadcast(q).join(l, Seq("ba", "bb", "dt", "rb")),
      minMatches)
  }

  /** Histogram + argmax shared by [[lookup]]/[[lookupStored]]: input
    * is the joined (query_id, fq, matched_doc, fl, …) pair stream. */
  private def bestPerQuery(joined: DataFrame,
      minMatches: Int): DataFrame = {
    val byQuery = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("n_matches").desc, col("matched_doc").asc,
        col("offset").asc)
    joined
      .select(col("query_id"), col("matched_doc"),
        (col("fq") - col("fl")).as("offset"))
      .groupBy("query_id", "matched_doc", "offset")
      .agg(count(lit(1)).as("n_matches"))
      .filter(col("n_matches") >= minMatches)
      .withColumn("rk", row_number().over(byQuery))
      .filter(col("rk") === 1).drop("rk")
  }

  /** The fingerprint key packed to ONE long — bijective (ba, bb ≤ 16,
    * dt ≤ 3, rb ≤ 4), so an equi-join on `fpkey` equals the 4-column
    * join while giving the stored index a single bucket column. */
  def packKey(fp: DataFrame): DataFrame =
    fp.withColumn("fpkey",
      ((col("ba") * 17 + col("bb")) * 4 + col("dt")) * 5 + col("rb"))

  /** Materialize a corpus's fingerprint table ONCE per (tag, process):
    * extraction (decode → grid → peaks → pairs) is the expensive map
    * stage, and the production serving story runs it at ingest, not
    * per query batch (the bm25TopKStored discipline). Stored bucketed
    * by [[packKey]]'s fpkey so a non-broadcast-sized query batch can
    * co-locate on the join key with no library shuffle. `tag` must
    * uniquely identify the input corpus (callers embed the source
    * fingerprint — the sharedEdgesView freshness contract).
    *
    * Bucket count is the SERVE parallelism, not a storage detail: the
    * lookup's key expansion (snippet fp × library fp per shared key)
    * runs inside the bucketed scan's tasks, and 8 buckets on a
    * 32-core box measured 18 s where 32 buckets measure ~5 s at sf1 —
    * size it like shuffle partitions at the target scale (the
    * sharedKeyEdgesBucketed lesson, re-learned on the serve side). */
  def fingerprintIndex(spark: SparkSession, media: => DataFrame,
      tag: String, buckets: Int = 32): Unit =
    graft.sources.Bucketing.ensureBucketed(
      packKey(fingerprintsKernel(spark, media))
        .select("doc_id", "frame_idx", "fpkey"),
      s"g_audiofp_$tag",
      s"${graft.sources.Bucketing.processRoot}/audiofp_$tag",
      "fpkey", buckets)

  /** [[lookup]] served from the table [[fingerprintIndex]] built:
    * identical results (the stored-index contract) with the library's
    * extraction amortized across query batches. */
  def lookupStored(spark: SparkSession, queryFp: DataFrame, tag: String,
      minMatches: Int): DataFrame = {
    val l = spark.table(s"g_audiofp_$tag")
      .select(col("doc_id").as("matched_doc"),
        col("frame_idx").as("fl"), col("fpkey"))
    val q = packKey(queryFp)
      .select(col("doc_id").as("query_id"),
        col("frame_idx").as("fq"), col("fpkey"))
    bestPerQuery(broadcast(q).join(l, Seq("fpkey")), minMatches)
  }

  /** Tone tables for the fingerprint demo corpus: cosines at two
    * amplitudes (8000 / 6000 — the gap exercises the ratio classes),
    * shared-literal like [[CosQ]]. Max |sample| = 14000 < 2¹⁵. */
  val ToneQ: Array[Array[Long]] = Array.tabulate(Bins, Window)((k, t) =>
    math.round(math.cos(2.0 * math.Pi * k * t / Window) * 8000))
  val Tone2Q: Array[Array[Long]] = Array.tabulate(Bins, Window)((k, t) =>
    math.round(math.cos(2.0 * math.Pi * k * t / Window) * 6000))

  /** [[ToneQ]]/[[Tone2Q]] as DuckDB list literals for oracle texts. */
  def toneLitSql(): String = lit2d(ToneQ)
  def tone2LitSql(): String = lit2d(Tone2Q)

  /** The CHIRP clip for doc `id`: 160 + id%97 samples, two
    * simultaneous tones whose bins change every 16-sample block —
    * b1 keyed on id mod 11, b2 on id mod 13, so full-sequence
    * collisions (true duplicate audio) happen exactly for ids
    * congruent mod 143 and nowhere else. Blocks change per HOP, so a
    * one-hop crop aligns every copy frame with the original's next
    * frame — the shift-detection property the planted test pins.
    * All-integer synthesis (table lookups + one add) so the oracle
    * replays it verbatim. */
  def chirpSamples(id: Long): Array[Short] = {
    val n = (160 + id % 97).toInt
    Array.tabulate(n) { i =>
      val j = i / Hop
      val b1 = (1 + ((id % 11) * 3 + j * 7) % 13).toInt
      val b2 = (1 + ((id % 13) * 5 + j * 5) % 13).toInt
      (ToneQ(b1)(i % Window) + Tone2Q(b2)(i % Window)).toShort
    }
  }

  /** Oracle CTEs shared by the fingerprint queries: the mel pipeline's
    * pw grid (same literals) → peaks via the same lag/lead windows →
    * pairs via the dt series join → the same integer ratio classes.
    * `corpusCte` must define a CTE named `corpus`(doc_id, ns) giving
    * each clip's doc_id and sample count AND a CTE `sm0`(doc_id, i, s)
    * giving its samples — this lets queries plant shifted copies. */
  def fingerprintCtesSql(): String = {
    val cos = lit2d(CosQ)
    val sin = lit2d(SinQ)
    s"""fr AS (SELECT doc_id, f FROM corpus,
             LATERAL (SELECT unnest(generate_series(0, (ns - $Window) // $Hop)) AS f)),
      sm AS (SELECT fr.doc_id, fr.f, t.t, sm0.s
             FROM fr,
               LATERAL (SELECT unnest(generate_series(0, ${Window - 1})) AS t) t,
               sm0
             WHERE sm0.doc_id = fr.doc_id AND sm0.i = fr.f * $Hop + t.t),
      dft AS (SELECT doc_id, f, k,
                sum(s * ($cos)[k + 1][t + 1]) AS re,
                sum(s * ($sin)[k + 1][t + 1]) AS im
              FROM sm, LATERAL (SELECT unnest(generate_series(0, ${Bins - 1})) AS k)
              GROUP BY doc_id, f, k),
      pw AS (SELECT doc_id, f AS frame_idx, k AS bin,
               (re * re + im * im) // $PowDiv AS p FROM dft),
      nb AS (SELECT doc_id, frame_idx, bin, p,
               coalesce(lag(p) OVER (PARTITION BY doc_id, bin ORDER BY frame_idx), -1) AS pf,
               coalesce(lead(p) OVER (PARTITION BY doc_id, bin ORDER BY frame_idx), -1) AS nf,
               coalesce(lag(p) OVER (PARTITION BY doc_id, frame_idx ORDER BY bin), -1) AS pb,
               coalesce(lead(p) OVER (PARTITION BY doc_id, frame_idx ORDER BY bin), -1) AS nbv
             FROM pw),
      peaks AS (SELECT doc_id, frame_idx, bin, p FROM nb
                WHERE p > 0 AND p > pf AND p > nf AND p > pb AND p > nbv),
      fp AS (SELECT a.doc_id, a.frame_idx, a.bin AS ba, b.bin AS bb,
               d.dt, CASE WHEN a.p >= b.p * 16 THEN 4
                          WHEN a.p >= b.p * 4 THEN 3
                          WHEN a.p >= b.p THEN 2
                          WHEN a.p * 4 >= b.p THEN 1
                          ELSE 0 END AS rb
             FROM peaks a,
               LATERAL (SELECT unnest(generate_series(1, $FpMaxDt)) AS dt) d,
               peaks b
             WHERE b.doc_id = a.doc_id AND b.frame_idx = a.frame_idx + d.dt)"""
  }
}
