package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.media.Multimodal
import graft.media.Multimodal.MediaRecord

/** Real javax.sound.sampled decode path ([[Multimodal.decodeAudioBands]] /
  * extractAudioFeatures / synthPcmWav): round trips through the actual
  * WAV PCM codec, sample-exact feature math, stereo mixdown and
  * big-endian (AIFF) handling, and corrupt-payload tolerance — audio
  * decode is no longer a stub for PCM formats.
  */
class AudioDecodeSpec extends SparkSpec {
  import spark.implicits._

  /** The m7 sample formula, computed directly (no codec): expected band
    * means for the 256-sample synthetic mono WAV of `id`.
    */
  private def expectedBands(id: Long): Array[Double] = {
    val sums = new Array[Long](8)
    for (t <- 0 until 256)
      sums(t / 32) += java.lang.Math.floorMod(id * 31 + t * 7, 65536L) - 32768L
    sums.map(s => s / 32.0 / 32768.0)
  }

  test("WAV PCM round trip: decoded band means equal the sample formula") {
    val media = Multimodal.synthPcmWav(
      spark, Seq(1L, 2L, 42L).toDF("doc_id"), "doc_id")
    val rows = Multimodal.extractAudioFeatures(media, bands = 8)
      .collect().groupBy(_.media_id)
    assert(rows.keySet == Set(1L, 2L, 42L))
    rows.foreach { case (id, rs) =>
      assert(rs.forall(r => r.sample_rate == 8000 && r.n_samples == 256L))
      val got = rs.sortBy(_.j).map(_.feat)
      val exp = expectedBands(id)
      got.zip(exp).foreach { case (g, e) =>
        assert(g == e, s"id=$id got=$g exp=$e") // lossless → exact equality
      }
    }
  }

  test("stereo + big-endian (AIFF) decode: integer-exact channel mixdown") {
    // 4 frames, 2 channels: L = 1000·t, R = -1000·t − 2 → frame mean
    // = -1 exactly (integer mixdown), constant across both bands.
    val n = 4
    val pcm = new Array[Byte](n * 4)
    for (t <- 0 until n) {
      val l = 1000 * t
      val r = -1000 * t - 2
      pcm(4 * t) = ((l >> 8) & 0xff).toByte // big-endian
      pcm(4 * t + 1) = (l & 0xff).toByte
      pcm(4 * t + 2) = ((r >> 8) & 0xff).toByte
      pcm(4 * t + 3) = (r & 0xff).toByte
    }
    val fmt = new AudioFormat(16000f, 16, 2, true, true)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.AIFF, bos)
    val Some((sr, frames, feats)) =
      Multimodal.decodeAudioBands(bos.toByteArray, bands = 2)
    assert(sr == 16000 && frames == 4L)
    assert(feats.toSeq == Seq(-1.0 / 32768.0, -1.0 / 32768.0), feats.toSeq)
  }

  test("undecodable payloads are dropped, not fatal") {
    val junk = Seq(
      MediaRecord(1L, "text/plain", "not audio".getBytes("UTF-8")),
      MediaRecord(2L, "audio/wav", Array[Byte]()),
      MediaRecord(3L, "audio/wav", Array.fill[Byte](64)(0x7f)))
    val out = Multimodal.extractAudioFeatures(junk.toDS(), bands = 8).count()
    assert(out == 0L)
    // Mixed corpus: the real clip survives the same pass.
    val good = Multimodal.synthPcmWav(spark, Seq(9L).toDF("doc_id"), "doc_id")
      .collect().head
    val mixed = Multimodal.extractAudioFeatures(
      (junk :+ good).toDS(), bands = 8).collect()
    assert(mixed.length == 8 && mixed.forall(_.media_id == 9L))
  }

  test("m7 query on sf0.001: codec output matches the closed-form features") {
    val got = api.PipelineQueries.queries("m7_audio_decode")(spark, Sf001)
      .collect()
    assert(got.length == 500 * 8)
    got.take(32).foreach { r =>
      val id = r.getLong(0)
      val exp = expectedBands(id)(r.getLong(3).toInt)
      val expRounded = BigDecimal(exp)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getLong(1) == 8000L && r.getLong(2) == 256L)
      assert(r.getDouble(4) == expRounded,
        s"id=$id j=${r.getLong(3)} got=${r.getDouble(4)} exp=$expRounded")
    }
  }
}
