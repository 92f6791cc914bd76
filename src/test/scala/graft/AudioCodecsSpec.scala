package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AudioCodecs
import graft.operators.AudioCodecs.{G711, ImaAdpcm}

/** G.711 µ-law/A-law + IMA ADPCM: table exactness, codec idempotence,
  * JDK cross-validation, WAV container roundtrips, decodeAudio chaining.
  */
class AudioCodecsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def testSignal(n: Int): Array[Short] =
    Array.tabulate(n)(i => (((i * 7919 + 131) % 65536) - 32768).toShort)

  // ---- G.711 -------------------------------------------------------------

  test("mu-law: encode(decode(b)) == b for all code words but negative zero") {
    (0 until 256).foreach { b =>
      val s = G711.decodeMu(b.toByte)
      // 0x7F is "-0": decodes to 0, which canonically re-encodes as +0
      // (0xFF) — the one many-to-one pair in the spec
      val expect = if (b == 0x7F) 0xFF.toByte else b.toByte
      assert(G711.encodeMu(s) == expect, s"code $b -> $s")
    }
  }

  test("A-law: encode(decode(b)) == b for all 256 code words") {
    (0 until 256).foreach { b =>
      val s = G711.decodeA(b.toByte)
      assert(G711.encodeA(s) == b.toByte, s"code $b -> $s")
    }
  }

  test("mu-law: published spot values (G.711 table anchors)") {
    // 0x7F/0xFF are the +/- zero codes; max magnitude code is 0x80
    assert(G711.decodeMu(0xFF.toByte) == 0)
    assert(G711.decodeMu(0x7F.toByte) == 0)
    assert(G711.decodeMu(0x80.toByte) == 32124)
    assert(G711.decodeMu(0x00.toByte) == -32124)
    assert(G711.encodeMu(0) == 0xFF.toByte)
    assert(G711.encodeMu(32767) == 0x80.toByte)
    assert(G711.encodeMu(-32768) == 0x00.toByte)
  }

  test("mu-law: quantization error bounded by half the segment step") {
    testSignal(4096).foreach { s =>
      val d = G711.decodeMu(G711.encodeMu(s))
      // segment step doubles per octave; worst step at top is 256
      assert(math.abs(d - s) <= 128 + math.abs(s.toInt) / 16,
        s"$s -> $d")
    }
  }

  test("mu-law decode agrees bit-exactly with the JDK's G.711 decoder") {
    val codes = Array.tabulate(256)(_.toByte)
    val wav = AudioCodecs.encodeWav(7, codes.map(G711.decodeMu), 8000)
    // decode the same mu-law WAV through javax.sound (independent impl)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(in.getFormat.getEncoding ==
      javax.sound.sampled.AudioFormat.Encoding.ULAW)
    val target = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
    val bytes = pcm.readAllBytes(); pcm.close()
    val jdk = Array.tabulate(bytes.length / 2)(i =>
      (((bytes(2 * i + 1): Int) << 8) | (bytes(2 * i) & 0xFF)).toShort)
    val ours = codes.map(c => G711.decodeMu(G711.encodeMu(G711.decodeMu(c))))
    assert(jdk.length == 256)
    (0 until 256).foreach { i =>
      assert(jdk(i) == ours(i), s"code $i: jdk ${jdk(i)} vs ours ${ours(i)}")
    }
  }

  // ---- IMA ADPCM ---------------------------------------------------------

  test("adpcm: first sample of every block is carried verbatim") {
    val s = testSignal(2035) // two 1017-sample blocks + 1
    val enc = ImaAdpcm.encodeMono(s, 1017)
    val dec = ImaAdpcm.decodeMono(enc, 1017, s.length)
    assert(dec(0) == s(0))
    assert(dec(1017) == s(1017))
    assert(dec.length == s.length)
  }

  test("adpcm: smooth signals reconstruct with small error, steps adapt") {
    val n = 3000
    val sine = Array.tabulate(n)(i =>
      (12000 * math.sin(i / 20.0)).toShort)
    val dec = ImaAdpcm.decodeMono(ImaAdpcm.encodeMono(sine, 1017), 1017, n)
    val rmse = math.sqrt(sine.zip(dec)
      .map { case (a, b) => (a - b).toDouble * (a - b) }.sum / n)
    assert(rmse < 300, s"rmse $rmse") // ~12-bit quality on smooth input
  }

  test("adpcm: decoder clamps and survives a hostile step-index header") {
    val enc = ImaAdpcm.encodeMono(testSignal(1017), 1017)
    enc(2) = 120.toByte // step index beyond 88 -> must clamp, not crash
    val dec = ImaAdpcm.decodeMono(enc, 1017, 1017)
    assert(dec.length == 1017)
  }

  // ---- WAV container roundtrips -----------------------------------------

  test("encodeWav/decodeWav roundtrip for all three tags") {
    val s = testSignal(2500)
    for (tag <- Seq(6, 7, 0x11)) {
      val wav = AudioCodecs.encodeWav(tag, s, 16000)
      val Some((f, rate, ch, ms)) = AudioCodecs.decodeWav(wav)
      assert(rate == 16000 && ch == 1, s"tag $tag")
      assert(f.length == 2500, s"tag $tag got ${f.length}")
      assert(ms == math.round(2500 * 1000.0 / 16000))
      // decoded samples are the companded/predicted values, in [-1, 1]
      assert(f.forall(v => v >= -1f && v <= 1f))
    }
  }

  test("decodeWav rejects PCM (JDK's job), stereo, and garbage") {
    val pcm = graft.operators.Multimodal.WavCodec
      .encodePcm16(testSignal(100), 8000, 1)
    assert(AudioCodecs.decodeWav(pcm).isEmpty)
    assert(AudioCodecs.decodeWav("not a wav at all".getBytes).isEmpty)
    assert(AudioCodecs.decodeWav(Array.emptyByteArray).isEmpty)
  }

  // ---- decodeAudio chaining ---------------------------------------------

  test("Multimodal.decodeAudio reaches G.711 and ADPCM payloads for real") {
    val s = testSignal(1600)
    val rows = Seq(
      ("mu", AudioCodecs.encodeWav(7, s, 16000)),
      ("al", AudioCodecs.encodeWav(6, s, 16000)),
      ("ad", AudioCodecs.encodeWav(0x11, s, 16000)),
      ("junk", "????".getBytes)).toDF("id", "payload")
    val out = graft.operators.Multimodal.decodeAudio(rows, "payload")
      .select(col("id"), size(col("samples")).as("n"), col("sample_rate"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out("mu") == ((1600, 16000)))
    assert(out("al") == ((1600, 16000)))
    assert(out("ad") == ((1600, 16000)))
    assert(out("junk") == ((256, 8000))) // stub fallback untouched
  }
}
