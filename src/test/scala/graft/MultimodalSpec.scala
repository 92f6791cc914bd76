package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, Similarity}

/** Multimodal plumbing: schemas, batch transforms, and the bridge into the
  * similarity operators. The codec is a deterministic stub (see
  * Multimodal.StubCodec); these tests pin the plumbing contracts.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  /** Synthesize a media table from document text bytes (no codecs here). */
  private lazy val media =
    Tables(spark, "/root/testdata/sf0.001", "documents")
      .limit(50)
      .select(col("doc_id").as("media_id"), lit("image").as("modality"),
        col("text").cast("binary").as("payload"))

  test("withMeta attaches the typed metadata struct with real sizes") {
    val df = Multimodal.withMeta(media, "payload", "jpeg")
    val got = df.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(got.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.mediaMetaType.fields.map(f => (f.name, f.dataType)).toSeq)
    val r = df.select(col("meta.size_bytes"), length(col("payload"))).head
    assert(r.getLong(0) == r.getInt(1).toLong)
  }

  test("decodeResize yields w*h pixel arrays, partition-local") {
    val out = Multimodal.decodeResize(media, "payload", 4, 4)
    val px = out.select("pixels").head.getSeq[Float](0)
    assert(px.length == 16)
    assert(px.forall(p => p >= 0f && p <= 1f))
    // deterministic: same payload -> same pixels
    val again = Multimodal.decodeResize(media, "payload", 4, 4)
      .select("pixels").head.getSeq[Float](0)
    assert(px == again)
  }

  test("decodeResize decodes a REAL PNG through ImageIO (not the stub)") {
    // 2×2 checkerboard: black/white/white/black
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xFFFFFF)
    img.setRGB(0, 1, 0xFFFFFF); img.setRGB(1, 1, 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray

    val df = Seq((1L, png)).toDF("media_id", "payload")
    // identity-size decode: exact luma values back out
    val full = Multimodal.decodeResize(df, "payload", 2, 2)
      .select("pixels").head.getSeq[Float](0)
    assert(full.length == 4)
    assert(full(0) == 0f && full(3) == 0f)
    assert(math.abs(full(1) - 1f) < 1e-3 && math.abs(full(2) - 1f) < 1e-3)
    // box-average downsample to 1×1: mean of the checkerboard = 0.5
    val one = Multimodal.decodeResize(df, "payload", 1, 1)
      .select("pixels").head.getSeq[Float](0)
    assert(math.abs(one.head - 0.5f) < 1e-3)
    // non-image payloads still flow through via the stub fallback
    val junk = Seq((2L, Array[Byte](1, 2, 3))).toDF("media_id", "payload")
    val px = Multimodal.decodeResize(junk, "payload", 4, 4)
      .select("pixels").head.getSeq[Float](0)
    assert(px.length == 16)
  }

  test("decodeAudio decodes a REAL WAV through javax.sound (not the stub)") {
    // synthesize a 440 Hz sine, 16-bit mono PCM at 8 kHz, 0.5 s, wrapped in
    // a RIFF/WAVE container by the JDK itself
    val rate = 8000f; val n = 4000
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (math.sin(2 * math.Pi * 440 * i / rate) * 16384).toShort
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED, rate, 16, 1, 2, rate, false)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray

    val df = Seq((1L, wav), (2L, "not audio".getBytes)).toDF("media_id", "payload")
    val out = Multimodal.decodeAudio(df, "payload").orderBy("media_id").collect()

    val real = out(0)
    assert(real.getInt(real.fieldIndex("sample_rate")) == 8000)
    assert(real.getInt(real.fieldIndex("audio_channels")) == 1)
    assert(real.getLong(real.fieldIndex("audio_ms")) == 500L)
    val samples = real.getSeq[Float](real.fieldIndex("samples"))
    assert(samples.length == n)
    // the decoded wave really is the sine we wrote (±1 lsb quantization)
    assert(math.abs(samples(0)) < 1e-3)
    for (i <- Seq(1, 5, 100, 1000))
      assert(math.abs(samples(i) - math.sin(2 * math.Pi * 440 * i / rate) / 2) < 1e-3,
        s"sample $i off: ${samples(i)}")
    // non-audio payload falls back to the deterministic stub shape
    val stub = out(1)
    assert(stub.getInt(stub.fieldIndex("sample_rate")) == 8000)
    assert(stub.getSeq[Float](stub.fieldIndex("samples")).length == 256)
  }

  test("encodePcm16 roundtrips through decodeWav (mono exact, stereo mono-mixed)") {
    val rnd = new scala.util.Random(7)
    val mono = Array.fill(500)(rnd.nextInt(65536).toShort)
    val Some((s1, r1, c1, ms1)) =
      Multimodal.WavCodec.decodeWav(Multimodal.WavCodec.encodePcm16(mono, 16000, 1))
    assert(r1 == 16000 && c1 == 1 && ms1 == math.round(500 * 1000.0 / 16000))
    // short -> float/32768 is exact at 16 bits: roundtrip must be EXACT
    assert(s1.length == 500 && s1.indices.forall(i => s1(i) == mono(i) / 32768f))

    val left = Array.fill(300)(rnd.nextInt(65536).toShort)
    val right = Array.fill(300)(rnd.nextInt(65536).toShort)
    val inter = (0 until 300).flatMap(i => Seq(left(i), right(i))).toArray
    val Some((s2, _, c2, _)) =
      Multimodal.WavCodec.decodeWav(Multimodal.WavCodec.encodePcm16(inter, 8000, 2))
    assert(c2 == 2 && s2.length == 300)
    assert(s2.indices.forall(i =>
      s2(i) == (left(i) / 32768f + right(i) / 32768f) / 2))

    intercept[IllegalArgumentException] {
      Multimodal.WavCodec.encodePcm16(new Array[Short](5), 8000, 2) // odd frames
    }
  }

  test("audioFeatures computes closed-form features of a known square wave") {
    // 11 frames per half period, amplitude 12000, 1000 frames, stereo
    val a: Short = 12000; val h = 11; val n = 1000
    val frames = Array.tabulate(n)(i => if ((i / h) % 2 == 0) a else (-a).toShort)
    val wav = Multimodal.WavCodec.encodePcm16(
      frames.flatMap(v => Array(v, v)), 8000, 2)
    val df = Seq((1L, wav), (2L, Array.emptyByteArray), (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "payload")
    val out = Multimodal.audioFeatures(df, "payload").orderBy("media_id").collect()
    val r = out(0)
    assert(r.getInt(r.fieldIndex("n_samples")) == n)
    assert(r.getInt(r.fieldIndex("audio_channels")) == 2)
    assert(r.getDouble(r.fieldIndex("rms")) == a / 32768.0)     // exact
    assert(r.getDouble(r.fieldIndex("peak_abs")) == a / 32768.0)
    assert(r.getInt(r.fieldIndex("zero_crossings")) == (n - 1) / h)
    assert(!out.exists(_.schema.fieldNames.contains("samples")))
    // null payload: feature columns stay null-safe (decode emits nulls)
    val nullRow = out(2)
    assert(nullRow.isNullAt(nullRow.fieldIndex("n_samples")) ||
      nullRow.getInt(nullRow.fieldIndex("n_samples")) == 0)
  }

  test("featurize produces embeddings usable by Similarity.topK") {
    val emb = Multimodal.featurize(media, "payload", dim = 16).cache()
    assert(emb.select(size(col("embedding"))).head.getInt(0) == 16)
    val q = emb.filter(col("media_id") === 3)
      .select("embedding").head.getSeq[Float](0).map(_.toDouble).toArray
    val top = Similarity.topK(emb, "embedding", "media_id", q, 3).collect()
    assert(top.head.getLong(0) == 3L) // self is nearest
    emb.unpersist()
  }

  test("sampleFrames: one row per sampled frame, frame bytes bounded") {
    val out = Multimodal.sampleFrames(media, "payload", frameBytes = 16, everyN = 2)
    val counts = out.groupBy("media_id").agg(count(lit(1)).as("n"))
    assert(counts.agg(min("n")).head.getLong(0) >= 1)
    val fl = out.select(length(col("frame"))).agg(max(col("length(frame)")))
    assert(out.select(length(col("frame")).as("l")).agg(max("l")).head.getInt(0) <= 16)
  }

  test("sampleFrames decodes a REAL animated GIF through ImageIO (not the stub)") {
    // 6-frame animated GIF, frame i = solid gray level i*40
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until 6).foreach { i =>
      val img = new java.awt.image.BufferedImage(3, 3,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val v = i * 40
      (0 until 3).foreach(x => (0 until 3).foreach(y =>
        img.setRGB(x, y, (v << 16) | (v << 8) | v)))
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val gif = bos.toByteArray

    val df = Seq((1L, gif)).toDF("media_id", "payload")
    val frames = Multimodal.sampleFrames(df, "payload", frameBytes = 16, everyN = 2)
      .select("frame_no", "frame").collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(frames.keySet == Set(0, 1, 2), "6 frames sampled every 2nd = 3 rows")
    // each sampled frame is a standalone decodable image with the right luma
    val lumas = frames.toSeq.sortBy(_._1).map { case (_, png) =>
      val Some((px, w, h)) = Multimodal.ImageIoCodec.decodeImage(png)
      assert(w == 3 && h == 3)
      px.sum / px.length
    }
    // frames 0, 2, 4 → gray 0, 80, 160 (GIF palette quantization ±10%)
    assert(math.abs(lumas(0) - 0f) < 0.05f)
    assert(math.abs(lumas(1) - 80f / 255f) < 0.08f)
    assert(math.abs(lumas(2) - 160f / 255f) < 0.08f)
    assert(lumas(0) < lumas(1) && lumas(1) < lumas(2))
  }

  test("sampleFrames decodes a REAL MJPEG AVI through the RIFF parser + ImageIO") {
    import java.io.ByteArrayOutputStream
    def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      bos.write(id.getBytes("US-ASCII")); bos.write(le32(body.length))
      bos.write(body)
      if (body.length % 2 == 1) bos.write(0) // RIFF word alignment
      bos.toByteArray
    }
    def list(kind: String, children: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      bos.write("LIST".getBytes("US-ASCII")); bos.write(le32(children.length + 4))
      bos.write(kind.getBytes("US-ASCII")); bos.write(children)
      bos.toByteArray
    }
    // 5 JPEG frames, frame i = solid gray i*50
    val jpegs = (0 until 5).map { i =>
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val v = i * 50
      (0 until 4).foreach(x => (0 until 4).foreach(y =>
        img.setRGB(x, y, (v << 16) | (v << 8) | v)))
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val movi = list("movi", jpegs.map(chunk("00dc", _)).reduce(_ ++ _))
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)))
    val riffBody = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val avi = "RIFF".getBytes("US-ASCII") ++ le32(riffBody.length) ++ riffBody

    val df = Seq((1L, avi)).toDF("media_id", "payload")
    val frames = Multimodal.sampleFrames(df, "payload", frameBytes = 16, everyN = 2)
      .select("frame_no", "frame").collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(frames.keySet == Set(0, 1, 2), "5 frames sampled every 2nd = 3 rows")
    // each sampled frame is a standalone PNG with the source frame's luma
    val lumas = frames.toSeq.sortBy(_._1).map { case (_, png) =>
      val Some((px, w, h)) = Multimodal.ImageIoCodec.decodeImage(png)
      assert(w == 4 && h == 4)
      px.sum / px.length
    }
    // frames 0, 2, 4 → gray 0, 100, 200 (JPEG quantization tolerance)
    assert(math.abs(lumas(0) - 0f) < 0.05f)
    assert(math.abs(lumas(1) - 100f / 255f) < 0.08f)
    assert(math.abs(lumas(2) - 200f / 255f) < 0.08f)
    assert(lumas(0) < lumas(1) && lumas(1) < lumas(2))
    // a truncated AVI (header only) falls back to the stub, never throws
    val broken = avi.take(20).toArray
    val n = Multimodal.sampleFrames(Seq((2L, broken)).toDF("media_id", "payload"),
      "payload", frameBytes = 16, everyN = 2).count()
    assert(n >= 1) // stub slices
  }

  test("featurize: real images get perceptual embeddings — similar images cosine-close") {
    def png(base: Int, noise: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 8).foreach(x => (0 until 8).foreach { y =>
        val v = math.min(255, base + (x * y * noise) % 32)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      })
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // two bright variants vs one dark image
    val df = Seq((1L, png(200, 1)), (2L, png(200, 3)), (3L, png(10, 1)))
      .toDF("media_id", "payload")
    val e = Multimodal.featurize(df, "payload", 16)
      .select("media_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(e(1).length == 16)
    assert(math.abs(cos(e(1), e(1)) - 1.0) < 1e-5, "L2-normalized")
    assert(cos(e(1), e(2)) > cos(e(1), e(3)),
      "bright images must be closer to each other than to the dark one")
  }

  test("dedupPayloads groups identical binary content") {
    val dup = media.union(media.limit(5)) // 5 exact dup payloads
    val out = Multimodal.dedupPayloads(dup, "payload", "media_id")
    assert(out.count() == 50)
    assert(out.agg(sum("n_copies")).head.getLong(0) == 55L)
  }

  test("keyframes: scene changes kept, repeated frames dropped (real GIF decode)") {
    // 8x8 animated GIF: frames 0-2 left-half bright, frames 3-5 top-half
    // bright -> exactly two scenes -> exactly two keyframes {0, 3}
    def frame(leftBright: Boolean): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 8).foreach(x => (0 until 8).foreach { y =>
        val bright = if (leftBright) x < 4 else y < 4
        val v = if (bright) 230 else 20
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      })
      img
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until 6).foreach { i =>
      writer.writeToSequence(
        new javax.imageio.IIOImage(frame(i < 3), null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val df = Seq((1L, bos.toByteArray)).toDF("media_id", "payload")
    val kept = Multimodal.keyframes(df, "payload", minHamming = 4)
      .select("frame_no").collect().map(_.getInt(0)).toSeq.sorted
    assert(kept == Seq(0, 3), s"kept $kept")
  }

  // ---- hand-assembled spec-conformant H.264 Annex-B fixtures ----
  // (ITU-T H.264: Annex B byte stream, baseline profile, I_PCM
  // macroblocks — the uncompressed coding mode, so the bitstream is
  // buildable AND decodable without an entropy coder)
  private object H264Fixture {
    final class BitWriter {
      private val buf = scala.collection.mutable.ArrayBuffer[Byte]()
      private var cur = 0; private var nbits = 0
      def bit(b: Int): Unit = {
        cur = (cur << 1) | (b & 1); nbits += 1
        if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
      }
      def u(n: Int, v: Int): Unit =
        (n - 1 to 0 by -1).foreach(i => bit((v >> i) & 1))
      def ue(v: Int): Unit = {
        val cp = v + 1
        val len = 32 - Integer.numberOfLeadingZeros(cp)
        u(len - 1, 0); u(len, cp)
      }
      def se(v: Int): Unit = ue(if (v <= 0) -2 * v else 2 * v - 1)
      def byteAlign(zero: Boolean = true): Unit =
        while (nbits != 0) bit(if (zero) 0 else 1)
      def u8(v: Int): Unit = u(8, v)
      def trailing(): Unit = { bit(1); byteAlign() }
      def rbsp: Array[Byte] = { require(nbits == 0); buf.toArray }
    }
    /** RBSP -> NAL: emulation-prevention 03 insertion, start code, header. */
    def nal(refIdc: Int, nalType: Int, rbsp: Array[Byte]): Array[Byte] = {
      val out = scala.collection.mutable.ArrayBuffer[Byte](0, 0, 0, 1)
      out += ((refIdc << 5) | nalType).toByte
      var zeros = 0
      rbsp.foreach { b =>
        if (zeros >= 2 && (b & 0xff) <= 3) { out += 3; zeros = 0 }
        out += b
        zeros = if (b == 0) zeros + 1 else 0
      }
      out.toArray
    }
    def sps(widthMbs: Int, heightMbs: Int,
            crop: (Int, Int, Int, Int) = (0, 0, 0, 0)): Array[Byte] = {
      val w = new BitWriter
      w.u8(66); w.u8(0); w.u8(10) // baseline, no constraints, level 1
      w.ue(0)                     // sps_id
      w.ue(0)                     // log2_max_frame_num_minus4
      w.ue(0)                     // pic_order_cnt_type = 0
      w.ue(0)                     // log2_max_pic_order_cnt_lsb_minus4
      w.ue(1); w.bit(0)           // max_num_ref_frames, gaps_allowed
      w.ue(widthMbs - 1); w.ue(heightMbs - 1)
      w.bit(1)                    // frame_mbs_only
      w.bit(1)                    // direct_8x8_inference
      if (crop == (0, 0, 0, 0)) w.bit(0) // no cropping
      else {
        w.bit(1)
        w.ue(crop._1); w.ue(crop._2); w.ue(crop._3); w.ue(crop._4)
      }
      w.bit(0)                    // no VUI
      w.trailing(); w.rbsp
    }
    def pps(): Array[Byte] = {
      val w = new BitWriter
      w.ue(0); w.ue(0)            // pps_id, sps_id
      w.bit(0); w.bit(0)          // CAVLC, no bottom-field poc
      w.ue(0)                     // one slice group
      w.ue(0); w.ue(0)            // ref idx defaults
      w.bit(0); w.u(2, 0)         // no weighted pred
      w.se(0); w.se(0); w.se(0)   // qp/qs/chroma offsets
      w.bit(0); w.bit(0); w.bit(0) // no deblock control/constr intra/redundant
      w.trailing(); w.rbsp
    }
    /** Single-slice IDR picture, every MB I_PCM with the given luma fn. */
    def idr(widthMbs: Int, heightMbs: Int, idrPicId: Int,
            luma: (Int, Int) => Int): Array[Byte] = {
      val w = new BitWriter
      w.ue(0)        // first_mb_in_slice
      w.ue(7)        // slice_type: I (all slices in picture)
      w.ue(0)        // pps_id
      w.u(4, 0)      // frame_num (log2_max_frame_num = 4)
      w.ue(idrPicId) // idr_pic_id
      w.u(4, 0)      // pic_order_cnt_lsb
      w.bit(0); w.bit(0) // no_output_of_prior_pics, long_term_reference
      w.se(0)        // slice_qp_delta
      for (m <- 0 until widthMbs * heightMbs) {
        w.ue(25)     // mb_type I_PCM
        w.byteAlign()
        val mbx = (m % widthMbs) * 16; val mby = (m / widthMbs) * 16
        for (i <- 0 until 256) w.u8(luma(mbx + i % 16, mby + i / 16) & 0xff)
        for (_ <- 0 until 128) w.u8(128) // neutral 4:2:0 chroma
      }
      w.trailing(); w.rbsp
    }
    /** Annex-B stream: SPS + PPS + one IDR per luma pattern (+ a fake
      * non-IDR P-slice NAL an I-frame extractor must skip).
      */
    def stream(widthMbs: Int, heightMbs: Int,
               patterns: Seq[(Int, Int) => Int],
               crop: (Int, Int, Int, Int) = (0, 0, 0, 0)): Array[Byte] = {
      val parts = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      parts += nal(3, 7, sps(widthMbs, heightMbs, crop))
      parts += nal(3, 8, pps())
      patterns.zipWithIndex.foreach { case (f, i) =>
        parts += nal(3, 5, idr(widthMbs, heightMbs, i, f))
        // an entropy-coded non-IDR slice body (opaque): must be skipped
        parts += nal(2, 1, Array[Byte](0x51, 0x22, 0x33))
      }
      parts.toArray.flatten
    }
  }

  test("sampleFrames decodes REAL H.264 I_PCM IDR frames (Annex-B parse + SPS dims)") {
    import spark.implicits._
    // 32x16: two frames with distinct gradients; P-slices interleaved
    val es = H264Fixture.stream(2, 1, Seq(
      (x, y) => x * 7 + y,          // frame 0
      (x, y) => 255 - x * 3 - y * 5 // frame 1
    ))
    val df = Multimodal.sampleFrames(
      Seq((1L, es)).toDF("media_id", "payload"), "payload",
      frameBytes = 64, everyN = 1)
    val frames = df.orderBy("frame_no").collect()
    assert(frames.length == 2, s"got ${frames.length} frames (stub path?)")
    // each frame is a standalone PNG with the SPS-declared dimensions
    val decoded = frames.map(r =>
      Multimodal.ImageIoCodec.decodeImage(r.getAs[Array[Byte]]("frame")).get)
    assert(decoded.forall { case (_, w, h) => w == 32 && h == 16 })
    // pixel-exact: the I_PCM samples round-trip through PNG
    val (px0, _, _) = decoded(0)
    assert(math.abs(px0(0) - 0f) < 1e-3)                   // (0,0) = 0
    assert(math.abs(px0(5 * 32 + 20) - (20 * 7 + 5) / 255f) < 1e-3)
    val (px1, _, _) = decoded(1)
    assert(math.abs(px1(0) - 1f) < 1e-3)                   // (0,0) = 255
    // emulation-prevention bytes round-trip: a luma pattern full of zeros
    // forces 00 00 00 runs in the RBSP that must be escaped and unescaped
    val zeroes = H264Fixture.stream(1, 1, Seq((_, _) => 0))
    val zf = Multimodal.sampleFrames(
      Seq((2L, zeroes)).toDF("media_id", "payload"), "payload", 64, 1)
      .collect()
    assert(zf.length == 1)
    val (zpx, zw, zh) = Multimodal.ImageIoCodec.decodeImage(
      zf(0).getAs[Array[Byte]]("frame")).get
    assert(zw == 16 && zh == 16 && zpx.forall(_ < 1e-3))
  }

  test("H.264 frame cropping honors the LEFT/TOP offsets, not just size") {
    import spark.implicits._
    // 2x1 MBs (32x16 coded); crop l=1,r=2,t=1,b=3 in 4:2:0 crop units of
    // 2 luma samples -> window is x in [2,28), y in [2,10): 26x8 output
    // whose (0,0) is coded sample (2,2)
    val es = H264Fixture.stream(2, 1, Seq((x, y) => x * 7 + y),
      crop = (1, 2, 1, 3))
    val df = Multimodal.sampleFrames(
      Seq((1L, es)).toDF("media_id", "payload"), "payload",
      frameBytes = 64, everyN = 1)
    val rows = df.collect()
    assert(rows.length == 1)
    val (px, w, h) = Multimodal.ImageIoCodec.decodeImage(
      rows(0).getAs[Array[Byte]]("frame")).get
    assert(w == 26 && h == 8, s"got ${w}x$h")
    assert(math.abs(px(0) - (2 * 7 + 2) / 255f) < 1e-3, s"px(0)=${px(0)}")
    assert(math.abs(px(3 * 26 + 10) - (12 * 7 + 5) / 255f) < 1e-3)
  }

  /** Independent minimal MP4 (ISO BMFF) muxer — written from the public
    * ISO 14496-12/-15 box layout, NOT by inverting the demuxer, so a
    * demux bug cannot cancel against a mux bug. Packs bare NAL units
    * (header byte + EPB-escaped RBSP, no start codes) as 4-byte
    * length-prefixed samples in `mdat`, SPS/PPS out-of-band in `avcC`,
    * and a real stsc/stsz/stco sample table with caller-chosen chunking.
    */
  private object Mp4Fixture {
    private def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    private def be32(v: Long) = Array[Byte](
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    private def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8) ++ typ.getBytes("US-ASCII") ++ payload
    /** Strip the Annex-B start code from a fixture NAL. */
    def bare(nalWithStartCode: Array[Byte]): Array[Byte] =
      nalWithStartCode.drop(4)

    /** `samples(i)` = the bare NALs of sample i (usually one IDR NAL);
      * `chunking` = samples per chunk, must sum to samples.length.
      */
    def mux(sps: Array[Byte], pps: Array[Byte],
            samples: Seq[Seq[Array[Byte]]], chunking: Seq[Int],
            width: Int, height: Int): Array[Byte] = {
      require(chunking.sum == samples.length, "chunking must cover samples")
      val sampleBytes = samples.map(nals =>
        nals.flatMap(n => be32(n.length) ++ n).toArray)
      val ftyp = box("ftyp",
        "isom".getBytes("US-ASCII") ++ be32(0) ++
          "isomavc1".getBytes("US-ASCII"))
      val mdatPayload = sampleBytes.flatten.toArray
      val mdat = box("mdat", mdatPayload)
      // absolute chunk offsets: ftyp + mdat box header precede the data
      val mdatDataStart = ftyp.length + 8
      val chunkStarts = chunking.scanLeft(0)(_ + _).dropRight(1)
        .map(firstSample => mdatDataStart +
          sampleBytes.take(firstSample).map(_.length).sum)
      val avcC = box("avcC", Array[Byte](1, 66, 0, 10, // ver/profile/compat/level
          (0xFC | 3).toByte, (0xE0 | 1).toByte) ++ // lengthSize 4, 1 SPS
        be16(sps.length) ++ sps ++ Array[Byte](1) ++ be16(pps.length) ++ pps)
      val avc1 = box("avc1",
        Array.fill[Byte](6)(0) ++ be16(1) ++        // reserved + data_ref_idx
          Array.fill[Byte](16)(0) ++                 // pre_defined/reserved
          be16(width) ++ be16(height) ++
          be32(0x00480000L) ++ be32(0x00480000L) ++  // 72 dpi
          be32(0) ++ be16(1) ++                      // reserved, frame_count
          Array.fill[Byte](32)(0) ++                 // compressorname
          be16(24) ++ be16(0xFFFF) ++                // depth, pre_defined -1
          avcC)
      val stsd = box("stsd", be32(0) ++ be32(1) ++ avc1)
      val stts = box("stts", be32(0) ++ be32(1) ++
        be32(samples.length) ++ be32(1))
      // one stsc run per DISTINCT samples-per-chunk prefix (real shape)
      val stscRuns = chunking.zipWithIndex
        .filter { case (n, i) => i == 0 || chunking(i - 1) != n }
        .map { case (n, i) => be32(i + 1) ++ be32(n) ++ be32(1) }
      val stsc = box("stsc", be32(0) ++ be32(stscRuns.length) ++
        stscRuns.flatten.toArray)
      val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(samples.length) ++
        sampleBytes.flatMap(s => be32(s.length)).toArray)
      val stco = box("stco", be32(0) ++ be32(chunkStarts.length) ++
        chunkStarts.flatMap(o => be32(o)).toArray)
      val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
      val minf = box("minf", stbl)
      val mdia = box("mdia", minf)
      val trak = box("trak", mdia)
      val moov = box("moov", trak)
      ftyp ++ mdat ++ moov
    }
  }

  test("sampleFrames decodes MP4-contained AVC (ISO BMFF demux -> CAVLC decoder)") {
    import spark.implicits._
    // two I_PCM IDR frames, 32x16, packed as 4-byte length-prefixed
    // samples across TWO chunks (exercises the stsc/stco walk)
    val sps = H264Fixture.nal(3, 7, H264Fixture.sps(2, 1))
    val pps = H264Fixture.nal(3, 8, H264Fixture.pps())
    val idr0 = H264Fixture.nal(3, 5, H264Fixture.idr(2, 1, 0, (x, y) => x * 7 + y))
    val idr1 = H264Fixture.nal(3, 5, H264Fixture.idr(2, 1, 1, (x, y) => 255 - x * 3 - y * 5))
    val mp4 = Mp4Fixture.mux(
      Mp4Fixture.bare(sps), Mp4Fixture.bare(pps),
      Seq(Seq(Mp4Fixture.bare(idr0)), Seq(Mp4Fixture.bare(idr1))),
      chunking = Seq(1, 1), width = 32, height = 16)
    val df = Multimodal.sampleFrames(
      Seq((1L, mp4)).toDF("media_id", "payload"), "payload",
      frameBytes = 64, everyN = 1)
    val frames = df.orderBy("frame_no").collect()
    assert(frames.length == 2, s"got ${frames.length} frames (stub path?)")
    val decoded = frames.map(r =>
      Multimodal.ImageIoCodec.decodeImage(r.getAs[Array[Byte]]("frame")).get)
    assert(decoded.forall { case (_, w, h) => w == 32 && h == 16 })
    // pixel-exact parity with the Annex-B path on the same pictures
    val (px0, _, _) = decoded(0)
    assert(math.abs(px0(5 * 32 + 20) - (20 * 7 + 5) / 255f) < 1e-3)
    val (px1, _, _) = decoded(1)
    assert(math.abs(px1(0) - 1f) < 1e-3)
  }

  test("MP4 demux: toAnnexB equals the reference Annex-B stream byte-for-byte") {
    val sps = H264Fixture.nal(3, 7, H264Fixture.sps(1, 1))
    val pps = H264Fixture.nal(3, 8, H264Fixture.pps())
    val idr = H264Fixture.nal(3, 5, H264Fixture.idr(1, 1, 0, (x, y) => x + y))
    // one chunk of two single-NAL samples (idr twice)
    val mp4 = Mp4Fixture.mux(
      Mp4Fixture.bare(sps), Mp4Fixture.bare(pps),
      Seq(Seq(Mp4Fixture.bare(idr)), Seq(Mp4Fixture.bare(idr))),
      chunking = Seq(2), width = 16, height = 16)
    val es = Multimodal.Mp4AvcCodec.toAnnexB(mp4)
    assert(es.isDefined, "demux returned None")
    val expected = sps ++ pps ++ idr ++ idr // fixture NALs carry start codes
    assert(java.util.Arrays.equals(es.get, expected))
  }

  test("MP4 demux: corrupt tables fall to the stub, never misparse") {
    import spark.implicits._
    val sps = H264Fixture.nal(3, 7, H264Fixture.sps(1, 1))
    val pps = H264Fixture.nal(3, 8, H264Fixture.pps())
    val idr = H264Fixture.nal(3, 5, H264Fixture.idr(1, 1, 0, (x, y) => x))
    val good = Mp4Fixture.mux(
      Mp4Fixture.bare(sps), Mp4Fixture.bare(pps),
      Seq(Seq(Mp4Fixture.bare(idr))), Seq(1), 16, 16)
    // corrupt a NAL length prefix inside mdat: demux must return None
    // (stub path = byte slices, not PNGs)
    val bad = good.clone()
    val mdatData = 24 + 8 // ftyp(24) + mdat header
    bad(mdatData) = 0x7F.toByte // absurd length prefix
    assert(Multimodal.Mp4AvcCodec.toAnnexB(bad).isEmpty)
    val stub = Multimodal.sampleFrames(
      Seq((1L, bad)).toDF("media_id", "payload"), "payload",
      frameBytes = 64, everyN = 1).collect()
    assert(stub.nonEmpty && Multimodal.ImageIoCodec
      .decodeImage(stub(0).getAs[Array[Byte]]("frame")).isEmpty)
    // truncated moov: also None
    assert(Multimodal.Mp4AvcCodec.toAnnexB(good.dropRight(40)).isEmpty)
    // a sample-count larger than the stsz box holds must be None, not a
    // walk into the following boxes' bytes
    val overflow = good.clone()
    val szIdx = good.indices.find(i => i + 4 <= good.length &&
      new String(good, i, 4, "US-ASCII") == "stsz").get
    // count field sits at boxStart+16 = fourccIdx+12
    overflow(szIdx + 12) = 0; overflow(szIdx + 13) = 0
    overflow(szIdx + 14) = 0; overflow(szIdx + 15) = 50 // claims 50 samples
    assert(Multimodal.Mp4AvcCodec.toAnnexB(overflow).isEmpty)
  }

  test("keyframes over H.264: repeated I-frames dropped, scene changes kept") {
    import spark.implicits._
    val es = H264Fixture.stream(1, 1, Seq(
      (x, y) => if (x < 8) 230 else 20, // A
      (x, y) => if (x < 8) 230 else 20, // A again -> dropped
      (x, y) => if (y < 8) 20 else 230  // B -> kept
    ))
    val kept = Multimodal.keyframes(
      Seq((1L, es)).toDF("media_id", "payload"), "payload", minHamming = 4)
      .select("frame_no").collect().map(_.getInt(0)).toSeq
    assert(kept == Seq(0, 2), kept.toString)
  }

  test("perceptual near-dup: re-encoded/mildly-edited images pair, unrelated don't") {
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 16).foreach(x => (0 until 16).foreach { y =>
        val v = math.max(0, math.min(255, f(x, y)))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      })
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val gradient = png((x, y) => x * 16)
    val gradientNoisy = png((x, y) => x * 16 + (x + y) % 3) // mild noise
    val inverted = png((x, y) => 255 - x * 16)              // structurally different
    val df = Seq((1L, gradient), (2L, gradientNoisy), (3L, inverted))
      .toDF("media_id", "payload")
    // hashes: identical structure -> small hamming; inverted -> large
    val ph = Multimodal.perceptualHash64(df, "payload")
      .select("media_id", "phash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(ph(1L) ^ ph(2L)) <= 3,
      s"noisy variant hamming ${java.lang.Long.bitCount(ph(1L) ^ ph(2L))}")
    assert(java.lang.Long.bitCount(ph(1L) ^ ph(3L)) > 10,
      s"inverted hamming ${java.lang.Long.bitCount(ph(1L) ^ ph(3L))}")
    val pairs = Multimodal.perceptualPairs(df, "payload", "media_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && !pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // null payloads are skipped, not crashed on
    val withNull = df.union(Seq((4L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "payload"))
    assert(Multimodal.perceptualHash64(withNull, "payload")
      .filter(col("phash").isNull).count() == 1L)
  }

  // ---- VP9-in-IVF keyframe detection --------------------------------

  /** Independent MSB-first bit writer (the codec under test has its own
    * reader — fixture and parser share no code).
    */
  private final class BitW {
    private val bytes = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0; private var nbits = 0
    def put(v: Int, n: Int): this.type = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1); nbits += 1
        if (nbits == 8) { bytes += cur.toByte; cur = 0; nbits = 0 }
        i -= 1
      }
      this
    }
    def result(): Array[Byte] = {
      val out = bytes.clone()
      if (nbits > 0) out += (cur << (8 - nbits)).toByte
      out.toArray
    }
  }

  /** VP9 uncompressed-header prefix per spec §6.2 (profile 0 unless
    * stated), padded with trailer bytes standing in for the compressed
    * payload the parser must never touch.
    */
  private def vp9Frame(key: Boolean, w: Int = 0, h: Int = 0,
                       profile: Int = 0): Array[Byte] = {
    val b = new BitW
    b.put(2, 2)                                     // frame_marker
    b.put(profile & 1, 1).put((profile >> 1) & 1, 1)
    if (profile == 3) b.put(0, 1)
    b.put(0, 1)                                     // show_existing_frame
    b.put(if (key) 0 else 1, 1)                     // frame_type
    b.put(1, 1)                                     // show_frame
    b.put(0, 1)                                     // error_resilient
    if (key) {
      b.put(0x49, 8).put(0x83, 8).put(0x42, 8)      // sync code
      if (profile >= 2) b.put(0, 1)                 // ten_or_twelve_bit
      b.put(2, 3)                                   // color_space = BT.601
      b.put(0, 1)                                   // color_range
      if (profile == 1 || profile == 3) b.put(0, 3)
      b.put(w - 1, 16).put(h - 1, 16)
    }
    b.result() ++ Array.fill(20)(0x5A.toByte)
  }

  private def ivf(frames: Seq[Array[Byte]], cw: Int, ch: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer
      .allocate(32 + frames.map(_.length + 12).sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("DKIF".getBytes).putShort(0).putShort(32)
      .put("VP90".getBytes).putShort(cw.toShort).putShort(ch.toShort)
      .putInt(30).putInt(1).putInt(frames.size).putInt(0)
    frames.zipWithIndex.foreach { case (f, i) =>
      bb.putInt(f.length).putLong(i.toLong).put(f)
    }
    bb.array()
  }

  test("VP9/IVF: keyframes detected from the uncompressed header, dims from the frame") {
    // keyframe carries 64x48 in its OWN header while the container says
    // 320x240 — detection must read the frame, not the container
    val payload = ivf(Seq(
      vp9Frame(key = true, 64, 48),
      vp9Frame(key = false),
      vp9Frame(key = false),
      vp9Frame(key = true, 128, 96, profile = 2)), 320, 240)
    val info = Multimodal.Vp9IvfCodec.frameInfo(payload).get
    assert(info.map(f => (f._1, f._2, f._3, f._4)) == Seq(
      (0, true, 64, 48), (1, false, 320, 240),
      (2, false, 320, 240), (3, true, 128, 96)))
    // operator surface: keyframe rows only, partition-local
    val df = Seq((1L, payload)).toDF("media_id", "payload")
    val kf = Multimodal.vp9Keyframes(df, "payload")
      .select("media_id", "frame_no", "width", "height").collect()
    assert(kf.map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSeq ==
      Seq((0, 64, 48), (3, 128, 96)))
  }

  test("VP9/IVF: non-IVF and corrupt payloads flag instead of throwing") {
    assert(Multimodal.Vp9IvfCodec.frameInfo("not a container".getBytes).isEmpty)
    assert(Multimodal.Vp9IvfCodec.frameInfo(null).isEmpty)
    // a frame whose header is garbage reports as non-key, never throws
    val bad = ivf(Seq(Array[Byte](0, 0, 0, 0)), 320, 240)
    val info = Multimodal.Vp9IvfCodec.frameInfo(bad).get
    assert(info.map(f => (f._1, f._2)) == Seq((0, false)))
    // a truncated last frame is dropped, earlier frames survive
    val trunc = ivf(Seq(vp9Frame(key = true, 64, 48)), 320, 240)
      .dropRight(5)
    val ti = Multimodal.Vp9IvfCodec.frameInfo(trunc)
    assert(ti.isEmpty || ti.get.forall(_._1 == 0))
  }

  // ---- VP9-in-WebM (Matroska/EBML) demux ----------------------------

  /** Independent EBML writer — fixture and demuxer share no code. */
  private def ebmlId(id: Long): Array[Byte] = {
    val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8)
    (0 until n).map(i => ((id >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
  }
  private def ebmlSize(v: Int): Array[Byte] = {
    var len = 1
    while (v >= (1L << (7 * len)) - 1) len += 1 // avoid the all-ones code
    val marker = 1L << (7 * len)
    val coded = marker | v.toLong
    (0 until len).map(i => ((coded >> (8 * (len - 1 - i))) & 0xff).toByte).toArray
  }
  private val ebmlUnknown = Array(0xFF.toByte) // 1-byte all-ones size
  private def wel(id: Long, payload: Array[Byte]): Array[Byte] =
    ebmlId(id) ++ ebmlSize(payload.length) ++ payload
  private def welUnknown(id: Long, payload: Array[Byte]): Array[Byte] =
    ebmlId(id) ++ ebmlUnknown ++ payload
  private def uintEl(id: Long, v: Long): Array[Byte] =
    wel(id, ebmlId(math.max(v, 1))) // minimal big-endian bytes (v>0 here)
  private def webmSimpleBlock(track: Int, frame: Array[Byte], key: Boolean,
                              lacing: Int = 0): Array[Byte] =
    wel(0xA3L, Array((0x80 | track).toByte, 0.toByte, 0.toByte,
      (((if (key) 1 else 0) << 7) | (lacing << 1)).toByte) ++ frame)
  private def webmTrackEntry(num: Int, codec: String, w: Int, h: Int,
                             tpe: Int = 1): Array[Byte] =
    wel(0xAEL, uintEl(0xD7L, num) ++ uintEl(0x83L, tpe) ++
      wel(0x86L, codec.getBytes("US-ASCII")) ++
      wel(0xE0L, uintEl(0xB0L, w) ++ uintEl(0xBAL, h)))
  private def webm(tracks: Array[Byte], clusters: Array[Byte],
                   unknownSegmentSize: Boolean = false): Array[Byte] = {
    val header = wel(0x1A45DFA3L, wel(0x4282L, "webm".getBytes("US-ASCII")))
    val body = wel(0x1654AE6BL, tracks) ++ clusters
    header ++ (if (unknownSegmentSize) welUnknown(0x18538067L, body)
               else wel(0x18538067L, body))
  }

  test("WebM: VP9 track demuxed, keyframes from the frame header, other tracks ignored") {
    val f = Seq(vp9Frame(key = true, 64, 48), vp9Frame(key = false),
      vp9Frame(key = false), vp9Frame(key = true, 128, 96, profile = 2))
    val tracks = webmTrackEntry(1, "A_OPUS", 0, 0, tpe = 2) ++
      webmTrackEntry(2, "V_VP9", 320, 240)
    val clusters =
      wel(0x1F43B675L, uintEl(0xE7L, 1) ++
        webmSimpleBlock(2, f(0), key = true) ++
        webmSimpleBlock(1, Array[Byte](9, 9), key = true) ++ // audio: skip
        webmSimpleBlock(2, f(1), key = false)) ++
      wel(0x1F43B675L, uintEl(0xE7L, 2) ++
        // BlockGroup->Block path for frame 2
        wel(0xA0L, wel(0xA1L, Array((0x80 | 2).toByte, 0.toByte, 0.toByte,
          0.toByte) ++ f(2))) ++
        webmSimpleBlock(2, f(3), key = true))
    val payload = webm(tracks, clusters)
    val info = Multimodal.WebmVp9Codec.frameInfo(payload).get
    assert(info.map(x => (x._1, x._2, x._3, x._4)) == Seq(
      (0, true, 64, 48), (1, false, 320, 240),
      (2, false, 320, 240), (3, true, 128, 96)))
    // frame BYTES roundtrip the container exactly
    assert(info.map(_._5.toSeq) == f.map(_.toSeq))
    // operator surface dispatches WebM after IVF
    val df = Seq((1L, payload)).toDF("media_id", "payload")
    val kf = Multimodal.vp9Keyframes(df, "payload")
      .select("frame_no", "width", "height").collect()
    assert(kf.map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq ==
      Seq((0, 64, 48), (3, 128, 96)))
  }

  test("WebM: streamed layout (unknown-size segment + cluster) still demuxes") {
    val f = Seq(vp9Frame(key = true, 64, 48), vp9Frame(key = false))
    val tracks = webmTrackEntry(1, "V_VP9", 320, 240)
    // first cluster has UNKNOWN size: swallows the second, which must be
    // found by recursion into the over-long span
    val c2 = wel(0x1F43B675L, uintEl(0xE7L, 2) ++
      webmSimpleBlock(1, f(1), key = false))
    val c1 = welUnknown(0x1F43B675L, uintEl(0xE7L, 1) ++
      webmSimpleBlock(1, f(0), key = true) ++ c2)
    val payload = webm(tracks, c1, unknownSegmentSize = true)
    val info = Multimodal.WebmVp9Codec.frameInfo(payload).get
    assert(info.map(x => (x._1, x._2, x._3, x._4)) == Seq(
      (0, true, 64, 48), (1, false, 320, 240)))
  }

  test("WebM: laced blocks are skipped without desyncing; corrupt payloads flag") {
    val f0 = vp9Frame(key = true, 64, 48)
    val tracks = webmTrackEntry(1, "V_VP9", 320, 240)
    val clusters = wel(0x1F43B675L,
      webmSimpleBlock(1, Array[Byte](1, 2, 3, 4), key = false, lacing = 2) ++
        webmSimpleBlock(1, f0, key = true))
    val info = Multimodal.WebmVp9Codec.frameInfo(webm(tracks, clusters)).get
    assert(info.map(x => (x._1, x._2)) == Seq((0, true)))

    assert(Multimodal.WebmVp9Codec.frameInfo(null).isEmpty)
    assert(Multimodal.WebmVp9Codec.frameInfo("EBML? nope".getBytes).isEmpty)
    // V_VP8 track: wrong codec, no VP9 frames -> None
    val vp8 = webm(webmTrackEntry(1, "V_VP8", 320, 240),
      wel(0x1F43B675L, webmSimpleBlock(1, f0, key = true)))
    assert(Multimodal.WebmVp9Codec.frameInfo(vp8).isEmpty)
    // truncated mid-cluster: earlier frames survive, no throw
    val whole = webm(tracks, wel(0x1F43B675L,
      webmSimpleBlock(1, f0, key = true) ++ webmSimpleBlock(1, f0, key = true)))
    val trunc = Multimodal.WebmVp9Codec.frameInfo(whole.dropRight(6))
    assert(trunc.isEmpty || trunc.get.nonEmpty)
  }
}
