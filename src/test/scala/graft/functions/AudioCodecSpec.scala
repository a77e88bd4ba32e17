package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The audio half of the real multimodal seam: JDK javax.sound.sampled
  * WAVE encode + decode. The oracle gate (q_audio_decode) proves the
  * round-trip on sums; this spec pins it per-sample and proves the
  * bytes are a genuine RIFF/WAVE container, not a private
  * serialization. */
class AudioCodecSpec extends AnyFunSuite {
  import graft.functions.Multimodal.{AudioBlob, AudioCodec}

  test("encoded bytes are a genuine RIFF/WAVE container (magic numbers)") {
    val wav = AudioCodec.encode(42L)
    assert(new String(wav, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(wav, 8, 4, "US-ASCII") == "WAVE")
  }

  test("decode reproduces every PCM sample of the closed-form waveform") {
    for (id <- Seq(1L, 6L, 101L, 256L)) {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(AudioCodec.encode(id)))
      val pcm = ais.readAllBytes()
      assert(pcm.length / 2 == AudioCodec.nSamplesOf(id))
      for (t <- 0 until pcm.length / 2) {
        val v = (((pcm(2 * t + 1) & 0xff) << 8) | (pcm(2 * t) & 0xff)).toShort.toInt
        assert(v == AudioCodec.sampleAt(id, t), s"sample $t of doc $id")
      }
    }
  }

  test("decode facts fold the waveform exactly (hand-computed)") {
    val id = 16L
    val n = AudioCodec.nSamplesOf(id)
    val s = (0 until n).map(AudioCodec.sampleAt(id, _))
    val facts = AudioCodec.decode(AudioBlob(id, AudioCodec.encode(id)))
    assert(facts.n_samples == n && facts.sample_rate == 8000 && facts.channels == 1)
    assert(facts.sum_abs == s.map(v => math.abs(v).toLong).sum)
    assert(facts.peak_abs == s.map(v => math.abs(v).toLong).max)
    assert(facts.zero_cross ==
      (1 until n).count(t => (s(t) < 0) != (s(t - 1) < 0)))
    assert(facts.zero_cross > 5, "stride must wrap often enough to discriminate")
  }

  test("q_audio_decode runs the distributed path end-to-end at sf0.001") {
    val sp = graft.SparkTestSession.spark
    val rows = Multimodal.qAudioDecode(sp, "/root/testdata/sf0.001").collect()
    assert(rows.length == 100) // 500 docs, the doc_id % 5 == 1 slice
    val r = rows.find(_.getLong(0) == 6L).get
    assert(r.getLong(1) == AudioCodec.nSamplesOf(6L))
    assert(r.getLong(2) == 8000 && r.getLong(3) == 1)
  }
}
