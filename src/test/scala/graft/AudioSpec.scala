package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Audio, Multimodal}

/** The mel front end's two non-oracle contracts: the PCM parser half
  * (pcmSamples) inverts the writer, and the fixed-point DFT/mel path
  * is a faithful quantization of the float reference — the oracle
  * proves Spark == DuckDB, this proves both == the actual transform. */
class AudioSpec extends AnyFunSuite {

  test("pcmSamples inverts pcm16Wav and agrees with decodeWav") {
    for (id <- Seq(0L, 7L, 56L, 1234L)) {
      val s = Multimodal.synthSamples(id)
      val (rate, got) = Multimodal.pcmSamples(id, Multimodal.pcm16Wav(8000, s))
      assert(rate == 8000)
      assert(got.toSeq == s.toSeq)
      val meta = Multimodal.decodeWav(id, Multimodal.pcm16Wav(8000, s))
      assert(meta.abs_sum == got.map(v => math.abs(v.toLong)).sum)
      assert(meta.n_samples == got.length.toLong)
    }
  }

  test("fixed-point mel energies track the float reference within 2%") {
    // a planted pure tone at bin 4 (1000 Hz at rate 8000, window 32):
    // the fixed-point path must reproduce the float mel energies to
    // quantization accuracy, and the 1000 Hz band must dominate
    val amp = 900.0
    val tone = Array.tabulate(64)(t =>
      math.round(amp * math.cos(2 * math.Pi * 4 * t / 32)).toShort)
    val melW = Audio.melWeights(8000)
    val got = Audio.melFrames(1L, tone, melW).toSeq
    // float reference: same frames, float DFT power, float weights
    def floatMel(f: Int, m: Int): Double = {
      (0 until Audio.Bins).map { k =>
        val (re, im) = (0 until Audio.Window).foldLeft((0.0, 0.0)) {
          case ((r, i), t) =>
            val v = tone(f * Audio.Hop + t).toDouble
            (r + v * math.cos(2 * math.Pi * k * t / Audio.Window),
             i - v * math.sin(-2 * math.Pi * k * t / Audio.Window))
        }
        (melW(m)(k).toDouble / Audio.MelScale) * (re * re + im * im)
      }.sum
    }
    got.foreach { r =>
      val ref = floatMel(r.frame_idx.toInt, r.band.toInt)
      // fixed point carries ×64 mel scale; undo before comparing
      val gotE = r.energy.toDouble / Audio.MelScale
      if (ref > 1e6)
        assert(math.abs(gotE - ref) / ref < 0.02,
          s"band ${r.band} frame ${r.frame_idx}: fixed $gotE vs float $ref")
    }
    // the tone's band (1000 Hz lives in one filter) dominates frame 0
    val frame0 = got.filter(_.frame_idx == 0L)
    val top = frame0.maxBy(_.energy)
    assert(melW(top.band.toInt)(4) > 0,
      s"dominant band ${top.band} carries no weight at bin 4")
    assert(top.energy > 10L * frame0.map(_.energy).sorted.apply(2),
      "tone energy does not dominate the off-bands")
  }

  test("fingerprint matching finds a hop-cropped copy at offset 1") {
    val spark = TestSpark.spark
    import spark.implicits._
    // chirp clips change tone bins per hop-sized block, so cropping one
    // hop aligns copy frame f with original frame f+1 exactly — the
    // constellation must report the pair at ONE consistent offset with
    // a dominant match count, and an unrelated clip must not pair with
    // either at that strength
    val orig = Audio.chirpSamples(123L)
    val media = Seq(
      graft.operators.MediaRow(1L, "wav", Multimodal.pcm16Wav(8000, orig)),
      graft.operators.MediaRow(2L, "wav",
        Multimodal.pcm16Wav(8000, orig.drop(Audio.Hop))),
      graft.operators.MediaRow(3L, "wav",
        Multimodal.pcm16Wav(8000, Audio.chirpSamples(456L)))
    ).toDF()
    val matches = Audio.offsetMatches(
        Audio.fingerprints(spark, media), minMatches = 8)
      .as[(Long, Long, Long, Long)].collect()
    val copyPair = matches.filter(m => m._1 == 1L && m._2 == 2L)
    assert(copyPair.exists(_._3 == 1L),
      s"cropped copy not matched at offset 1: ${matches.toSeq}")
    val best = copyPair.maxBy(_._4)
    assert(best._3 == 1L && best._4 >= 8L,
      s"offset 1 is not the dominant alignment: ${copyPair.toSeq}")
  }

  test("stored fingerprint index rebuilds when the corpus tag changes") {
    val spark = TestSpark.spark
    import spark.implicits._
    // the sharedEdgesView freshness contract applied to the audio
    // index: serving a stale fingerprint table after the corpus
    // changed must be impossible when the tag embeds the snapshot
    def mediaOf(ids: Seq[Long]) = ids.map(id =>
      graft.operators.MediaRow(id, "wav",
        Multimodal.pcm16Wav(8000, Audio.chirpSamples(id)))).toDF()
    val snippet = Audio.fingerprints(spark, Seq(
      graft.operators.MediaRow(900L, "wav",
        Multimodal.pcm16Wav(8000,
          Audio.chirpSamples(77L).drop(Audio.Hop)))).toDF())
    Audio.fingerprintIndex(spark, mediaOf(Seq(11L, 22L)), "audspec_v1")
    val miss = Audio.lookupStored(spark, snippet, "audspec_v1", 8)
      .collect()
    // 77 is not in the v1 library; nothing should clear the bar
    assert(!miss.exists(_.getLong(1) == 77L))
    Audio.fingerprintIndex(spark, mediaOf(Seq(11L, 22L, 77L)), "audspec_v2")
    val hit = Audio.lookupStored(spark, snippet, "audspec_v2", 8).collect()
    assert(hit.length == 1 && hit.head.getLong(1) == 77L &&
      hit.head.getLong(2) == -1L, // query frame f = source frame f+1
      s"snippet must resolve to 77 at offset -1 in v2: ${hit.toSeq}")
  }

  test("kernel fingerprints equal the relational form row-for-row") {
    val spark = TestSpark.spark
    import spark.implicits._
    val media = (Seq(5L, 77L, 123L).map(id =>
      graft.operators.MediaRow(id, "wav",
        Multimodal.pcm16Wav(8000, Audio.chirpSamples(id)))) :+
      graft.operators.MediaRow(900L, "wav",
        Multimodal.pcm16Wav(8000, Audio.chirpSamples(77L).drop(Audio.Hop))))
      .toDF()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "frame_idx", "ba", "bb", "dt", "rb")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap // multiset equality
    assert(rows(Audio.fingerprintsKernel(spark, media)) ==
      rows(Audio.fingerprints(spark, media)))
  }

  test("streaming snippets resolve against the stored index per micro-batch") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def clip(id: Long) = Multimodal.pcm16Wav(8000, Audio.chirpSamples(id))
    Audio.fingerprintIndex(spark,
      Seq(11L, 22L, 77L).map(id =>
        graft.operators.MediaRow(id, "wav", clip(id))).toDF(), "audstream_v1")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[graft.operators.MediaRow]
    mem.addData(
      graft.operators.MediaRow(901L, "wav",
        Multimodal.pcm16Wav(8000, Audio.chirpSamples(77L).drop(Audio.Hop))),
      graft.operators.MediaRow(902L, "wav",
        Multimodal.pcm16Wav(8000, Audio.chirpSamples(22L).drop(Audio.Hop))))
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val ck = java.nio.file.Files.createTempDirectory("audstream").toString
    val q = graft.streaming.AudioMatchStream.start(
        spark, mem.toDF(), "audstream_v1", minMatches = 8, ck) { m =>
      got ++= m.select("query_id", "matched_doc", "offset")
        .as[(Long, Long, Long)].collect()
      ()
    }
    q.awaitTermination(60000)
    assert(got.toSet == Set((901L, 77L, -1L), (902L, 22L, -1L)),
      s"streamed snippets misresolved: $got")
  }
}
