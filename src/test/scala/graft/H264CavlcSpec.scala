package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.H264Cavlc
import graft.operators.H264Cavlc.BitReader

/** Conformance + closed-loop tests for the CAVLC Baseline I-frame
  * decoder. Three independent anchors:
  *   1. structural table validation (prefix-freeness, entry counts);
  *   2. a published worked CAVLC vector (Richardson, "H.264 and MPEG-4
  *      Video Compression" §6.4.8 — the 5-coefficient example block);
  *   3. a closed-loop ENCODER written in this spec (forward transforms,
  *      quantization, CAVLC emission, its own transcription of the intra
  *      prediction formulas): random frames encode → decode must
  *      reproduce the encoder's reconstruction BIT-EXACTLY.
  */
class H264CavlcSpec extends AnyFunSuite {

  private def reader(bits: String): BitReader = {
    val padded = bits + "0" * ((8 - bits.length % 8) % 8)
    new BitReader(padded.grouped(8)
      .map(b => Integer.parseInt(b, 2).toByte).toArray)
  }

  // -------------------------------------------------------------------
  // 1. table structure
  // -------------------------------------------------------------------

  private def assertPrefixFree(name: String, patterns: Seq[String]): Unit = {
    assert(patterns.distinct.size == patterns.size, s"$name: duplicate code")
    for (a <- patterns; b <- patterns if a != b)
      assert(!b.startsWith(a), s"$name: '$a' is a prefix of '$b'")
  }

  test("coeff_token tables: prefix-free, complete") {
    for ((n, t) <- Seq("nc0" -> H264Cavlc.coeffTokenNc0,
        "nc2" -> H264Cavlc.coeffTokenNc2, "nc4" -> H264Cavlc.coeffTokenNc4)) {
      assertPrefixFree(s"coeff_token $n", t.patterns)
      // TC=0 has 1 entry; TC=1: 2; TC=2: 3; TC=3..16: 4 -> 62 total
      assert(t.patterns.size == 62, n)
    }
    assertPrefixFree("chromaDC", H264Cavlc.coeffTokenChromaDc.patterns)
    assert(H264Cavlc.coeffTokenChromaDc.patterns.size == 14)
  }

  test("total_zeros and run_before tables: prefix-free, right sizes") {
    H264Cavlc.totalZeros4x4.zipWithIndex.foreach { case (t, i) =>
      val tc = i + 1
      assertPrefixFree(s"total_zeros tc=$tc", t.patterns)
      assert(t.patterns.size == 16 - tc + 1, s"tc=$tc")
    }
    H264Cavlc.totalZerosChromaDc.zipWithIndex.foreach { case (t, i) =>
      assertPrefixFree(s"tz chroma tc=${i + 1}", t.patterns)
      assert(t.patterns.size == 4 - (i + 1) + 1)
    }
    H264Cavlc.runBefore.zipWithIndex.foreach { case (t, i) =>
      assertPrefixFree(s"run_before zl=${i + 1}", t.patterns)
    }
    assert(H264Cavlc.runBefore(6).patterns.size == 15) // runs 0..14
  }

  test("cbp intra me(v) map is a permutation of 0..47") {
    assert(H264Cavlc.cbpIntraMap.sorted.toSeq == (0 until 48))
  }

  // -------------------------------------------------------------------
  // 2. published conformance vector
  // -------------------------------------------------------------------

  test("Richardson worked example decodes exactly (nC=0)") {
    // block (raster):  0  3 -1  0 / 0 -1  1  0 / 1  0  0  0 / 0 0 0 0
    // scan order: 0, 3, 0, 1, -1, -1, 0, 1, 0...   encoded 24 bits:
    val r = reader("000010001110010111101101")
    val (scan, tc) = H264Cavlc.residualBlock(r, nC = 0, maxNumCoeff = 16)
    assert(tc == 5)
    assert(scan.toSeq == Seq(0, 3, 0, 1, -1, -1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0))
    // de-zigzag back to the raster block
    val raster = new Array[Int](16)
    (0 until 16).foreach(i => raster(H264Cavlc.zigzag4x4(i)) = scan(i))
    assert(raster.toSeq == Seq(0, 3, -1, 0, 0, -1, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0))
  }

  test("empty block is a single '1' bit at nC=0") {
    val r = reader("1")
    val (scan, tc) = H264Cavlc.residualBlock(r, 0, 16)
    assert(tc == 0 && scan.forall(_ == 0))
  }

  // -------------------------------------------------------------------
  // 3. closed-loop encoder
  // -------------------------------------------------------------------

  test("transforms: DC-only inverse is flat; Hadamard of flat is scaled") {
    val d = new Array[Int](16); d(0) = 640
    H264Cavlc.inverseTransform4x4(d)
    assert(d.forall(_ == (640 + 32) >> 6))
    val h = Array.fill(16)(5)
    H264Cavlc.inverseHadamard4x4(h)
    assert(h(0) == 80 && h.drop(1).forall(_ == 0)) // 16 * 5 at DC
  }

  test("closed-loop: encoded frames decode bit-exactly (random MB mix)") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 0 until 16) {
      val wMbs = 1 + rnd.nextInt(4)
      val hMbs = 1 + rnd.nextInt(4)
      val W = wMbs * 16; val H = hMbs * 16
      // source: smooth gradient + noise (keeps some residuals small and
      // some large, exercising both the T1 and escape level paths)
      val src = Array.tabulate(W * H) { i =>
        val x = i % W; val y = i / W
        val v = trial match {
          case 0 => 128 // flat: zero-residual paths
          case 1 => (x * 255) / math.max(1, W - 1)
          case _ => ((x * 5 + y * 3) % 256 + rnd.nextInt(90)) % 256
        }
        math.max(0, math.min(255, v))
      }
      val sliceQp = 18 + rnd.nextInt(20)
      val enc = new H264Enc(wMbs, hMbs, sliceQp, rnd)
      val (rbspBits, recon) = enc.encodeFrame(src)
      // decode through the real slice decoder
      val dec = new H264Cavlc.SliceDecoder(wMbs, hMbs, sliceQp)
      val r = reader(rbspBits)
      var m = 0
      while (m < wMbs * hMbs) {
        val mbType = r.ue()
        if (mbType == 25) {
          r.byteAlign()
          val px = Array.fill(256)(r.u8())
          (0 until 128).foreach(_ => r.u8())
          dec.setPcm(m, px)
        } else assert(dec.decodeMb(r, m, mbType), s"trial $trial mb $m")
        m += 1
      }
      assert(dec.plane.toSeq == recon.toSeq,
        s"trial $trial (${wMbs}x$hMbs qp=$sliceQp): " +
          dec.plane.zip(recon).zipWithIndex
            .filter { case ((a, b), _) => a != b }.take(5)
            .map { case ((a, b), i) => s"[$i] got $a want $b" }.mkString(", "))
    }
  }

  test("keyframes over CAVLC frames: repeat dropped, scene change kept") {
    val spark = TestSpark.session
    import spark.implicits._
    val qp = 30
    val headerLen = H264Enc.sliceHeaderBits(qp).length
    // same encoder seed for the two scene-A frames -> same mode choices,
    // near-identical reconstruction; scene B inverts the pattern
    def frame(seed: Long, f: (Int, Int) => Int): String = {
      val src = Array.tabulate(256)(i => f(i % 16, i / 16))
      new H264Enc(1, 1, qp, new scala.util.Random(seed), headerLen)
        .encodeFrame(src)._1
    }
    val a1 = frame(11L, (x, _) => if (x < 8) 230 else 20)
    val a2 = frame(11L, (x, _) => if (x < 8) 228 else 22)
    val b = frame(11L, (_, y) => if (y < 8) 20 else 230)
    val es = H264Enc.annexBStreamMulti(1, 1, qp, Seq(a1, a2, b))
    val kept = operators.Multimodal.keyframes(
      Seq((1L, es)).toDF("media_id", "payload"), "payload", minHamming = 4)
      .select("frame_no").collect().map(_.getInt(0)).toSeq
    assert(kept == Seq(0, 2), kept.toString)
  }

  test("end-to-end: CAVLC IDR through Multimodal.sampleFrames") {
    val spark = TestSpark.session
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val wMbs = 2; val hMbs = 2; val sliceQp = 28
    val W = wMbs * 16; val H = hMbs * 16
    val src = Array.tabulate(W * H) { i =>
      ((i % W) * 4 + (i / W) * 2 + rnd.nextInt(40)) % 256
    }
    val headerLen = H264Enc.sliceHeaderBits(sliceQp).length
    val enc = new H264Enc(wMbs, hMbs, sliceQp, rnd, alignOffset = headerLen)
    val (sliceBits, recon) = enc.encodeFrame(src)
    val es = H264Enc.annexBStream(wMbs, hMbs, sliceQp, sliceBits)
    val df = operators.Multimodal.sampleFrames(
      Seq((1L, es)).toDF("media_id", "payload"), "payload",
      frameBytes = 64, everyN = 1)
    val rows = df.collect()
    assert(rows.length == 1, "CAVLC IDR frame not decoded")
    val (px, w, h) = operators.Multimodal.ImageIoCodec
      .decodeImage(rows(0).getAs[Array[Byte]]("frame")).get
    assert(w == W && h == H)
    val got = px.map(v => (v * 255f).round)
    assert(got.toSeq == recon.toSeq, "PNG pixels != closed-loop recon")
  }
}

/** Closed-loop CAVLC Baseline encoder — test fixture. Emits a legal
  * macroblock-layer bitstream (I_4x4 / I_16x16 / I_PCM mix, per-MB QP
  * deltas, chroma DC+AC residual) and the reconstruction a conformant
  * decoder must produce. Intra prediction formulas are transcribed here
  * INDEPENDENTLY of the decoder so the round-trip cross-checks them.
  */
final class H264Enc(wMbs: Int, hMbs: Int, sliceQp: Int,
                    rnd: scala.util.Random, alignOffset: Int = 0) {
  import H264Enc._
  private val W = wMbs * 16
  private val bW = wMbs * 4; private val bH = hMbs * 4
  private val recon = new Array[Int](W * hMbs * 16)
  private val lumaNz = Array.fill(bW * bH)(-1)
  private val lumaMode = Array.fill(bW * bH)(-1)
  private val cW = wMbs * 2
  private val chromaNz =
    Array(Array.fill(cW * hMbs * 2)(-1), Array.fill(cW * hMbs * 2)(-1))
  private var qp = sliceQp

  /** Encode every MB of `src`; returns (bitstring of the MB layer,
    * closed-loop reconstruction).
    */
  def encodeFrame(src: Array[Int]): (String, Array[Int]) = {
    val w = new StringBuilder
    var m = 0
    while (m < wMbs * hMbs) {
      rnd.nextInt(10) match {
        case 0 =>
          encodePcm(w, m, src)
          // §7.4.5: I_PCM QPY is 0 — both recorded for deblocking AND as
          // the running QPY,prev the next MB's mb_qp_delta is relative to
          qp = 0
          mbQps(m) = 0
        case x if x < 5 => { encodeI16(w, m, src); mbQps(m) = qp }
        case _ => { encodeI4x4(w, m, src); mbQps(m) = qp }
      }
      m += 1
    }
    (w.toString, recon)
  }

  /** Per-MB QPY as the deblocking filter sees it (I_PCM = 0), recorded
    * by encodeFrame — lets the deblock integration test compute the
    * expected filtered picture from the reconstruction.
    */
  val mbQps: Array[Int] = new Array[Int](wMbs * hMbs)

  // ---- bit emission helpers (string-of-bits keeps assertions readable)

  private def bits(w: StringBuilder, s: String): Unit = w.append(s)
  private def u(w: StringBuilder, n: Int, v: Int): Unit =
    (n - 1 to 0 by -1).foreach(i => w.append(if (((v >> i) & 1) == 1) '1' else '0'))
  private def ue(w: StringBuilder, v: Int): Unit = {
    val cp = v + 1
    val len = 32 - Integer.numberOfLeadingZeros(cp)
    u(w, len - 1, 0); u(w, len, cp)
  }
  private def se(w: StringBuilder, v: Int): Unit =
    ue(w, if (v <= 0) -2 * v else 2 * v - 1)

  // ---- macroblock kinds

  private def encodePcm(w: StringBuilder, m: Int, src: Array[Int]): Unit = {
    ue(w, 25)
    // pcm alignment is relative to the RBSP start: slice-header bits
    // precede the MB layer in a real NAL (alignOffset)
    while ((alignOffset + w.length) % 8 != 0) w.append('0')
    val x0 = (m % wMbs) * 16; val y0 = (m / wMbs) * 16
    var i = 0
    while (i < 256) {
      val v = src((y0 + i / 16) * W + x0 + i % 16)
      u(w, 8, v)
      recon((y0 + i / 16) * W + x0 + i % 16) = v
      i += 1
    }
    (0 until 128).foreach(_ => u(w, 8, 128)) // neutral chroma
    markMb(m, 16, -1)
  }

  private def nextQp(): Int = {
    val target = math.max(10, math.min(45, qp + rnd.nextInt(7) - 3))
    target
  }

  private def encodeI16(w: StringBuilder, m: Int, src: Array[Int]): Unit = {
    val x0 = (m % wMbs) * 16; val y0 = (m / wMbs) * 16
    val leftA = x0 > 0; val topA = y0 > 0
    val legal = Seq(2) ++ (if (topA) Seq(0) else Nil) ++
      (if (leftA) Seq(1) else Nil) ++ (if (topA && leftA) Seq(3) else Nil)
    val mode = legal(rnd.nextInt(legal.size))
    val myQp = nextQp()
    val pred = predict16x16(recon, W, x0, y0, mode, leftA, topA)
    // forward transform each 4x4; collect DCs
    val acQ = Array.ofDim[Int](16, 16) // quantized, raster per block
    val dcRaw = new Array[Int](16)
    var blk = 0
    while (blk < 16) {
      val (xO, yO) = blkOff(blk)
      val res = Array.tabulate(16) { k =>
        val x = x0 + xO + (k & 3); val y = y0 + yO + (k >> 2)
        src(y * W + x) - pred((yO + (k >> 2)) * 16 + xO + (k & 3))
      }
      val tw = fwd4x4(res)
      dcRaw((yO / 4) * 4 + xO / 4) = tw(0)
      var k = 1
      while (k < 16) { acQ(blk)(k) = quantAc(tw(k), myQp, k); k += 1 }
      blk += 1
    }
    val dcT = fwdHadamard4x4(dcRaw)
    val dcQ = dcT.map(quantDc(_, myQp))
    val anyAc = acQ.exists(_.exists(_ != 0))
    val cbpLuma = if (anyAc) 15 else 0
    val cbpChroma = rnd.nextInt(3) // 0 none, 1 DC, 2 DC+AC
    // mb_type encodes predMode + cbp (1..24)
    val mbType = 1 + mode + 4 * cbpChroma + 12 * (cbpLuma / 15)
    ue(w, mbType)
    ue(w, rnd.nextInt(4)) // intra_chroma_pred_mode (never reconstructed)
    se(w, deltaTo(myQp)); qp = myQp
    // DC residual block: nC from blkIdx 0 neighborhood
    val bx0 = (m % wMbs) * 4; val by0 = (m / wMbs) * 4
    encodeResidual(w, zigzagOf(dcQ), lumaNc(bx0, by0), 16)
    // AC blocks
    blk = 0
    while (blk < 16) {
      val (xO, yO) = blkOff(blk)
      val bx = bx0 + xO / 4; val by = by0 + yO / 4
      if (cbpLuma != 0) {
        val scan = Array.tabulate(15)(i =>
          acQ(blk)(H264Cavlc.zigzag4x4(i + 1)))
        val tc = encodeResidual(w, scan, lumaNc(bx, by), 15)
        lumaNz(by * bW + bx) = tc
      } else lumaNz(by * bW + bx) = 0
      blk += 1
    }
    encodeChroma(w, m, cbpChroma)
    // closed-loop reconstruction — decoder inverse path
    val dc = new Array[Int](16)
    (0 until 16).foreach(i => dc(i) = dcQ(i))
    H264Cavlc.inverseHadamard4x4(dc)
    (0 until 16).foreach(i => dc(i) = H264Cavlc.scaleLumaDc(dc(i), myQp))
    blk = 0
    while (blk < 16) {
      val (xO, yO) = blkOff(blk)
      val d = new Array[Int](16)
      var k = 1
      while (k < 16) {
        if (acQ(blk)(k) != 0)
          d(k) = (acQ(blk)(k) * H264Cavlc.vForPos(myQp % 6, k)) << (myQp / 6)
        k += 1
      }
      d(0) = dc((yO / 4) * 4 + xO / 4)
      H264Cavlc.inverseTransform4x4(d)
      k = 0
      while (k < 16) {
        val x = x0 + xO + (k & 3); val y = y0 + yO + (k >> 2)
        recon(y * W + x) =
          clip(pred((yO + (k >> 2)) * 16 + xO + (k & 3)) + d(k))
        k += 1
      }
      blk += 1
    }
    // mode grid: not I_4x4
    markModes(m, -1)
  }

  private def encodeI4x4(w: StringBuilder, m: Int, src: Array[Int]): Unit = {
    val bx0 = (m % wMbs) * 4; val by0 = (m / wMbs) * 4
    val x0 = (m % wMbs) * 16; val y0 = (m / wMbs) * 16
    val myQp = nextQp()
    // choose modes + closed-loop residuals block by block
    val modes = new Array[Int](16)
    val coefQ = Array.ofDim[Int](16, 16) // raster per block
    val reconBlocks = Array.ofDim[Int](16, 16)
    val preds = Array.ofDim[Int](16, 16)
    var blk = 0
    while (blk < 16) {
      val (xO, yO) = blkOff(blk)
      val bx = bx0 + xO / 4; val by = by0 + yO / 4
      val (la, ta, tla, tra) = avail(bx, by)
      val legal = Seq(2) ++
        (if (ta) Seq(0, 3, 7) else Nil) ++
        (if (la) Seq(1, 8) else Nil) ++
        (if (la && ta && tla) Seq(4, 5, 6) else Nil)
      val mode = legal(rnd.nextInt(legal.size))
      modes(blk) = mode
      val bxp = x0 + xO; val byp = y0 + yO
      val pred = predict4x4(recon, W, bxp, byp, mode, la, ta, tla, tra)
      preds(blk) = pred
      val res = Array.tabulate(16) { k =>
        src((byp + (k >> 2)) * W + bxp + (k & 3)) - pred(k)
      }
      val tw = fwd4x4(res)
      var k = 0
      while (k < 16) { coefQ(blk)(k) = quantAc(tw(k), myQp, k); k += 1 }
      // closed-loop recon of this block (later blocks predict from it)
      val d = new Array[Int](16)
      var any = false
      k = 0
      while (k < 16) {
        if (coefQ(blk)(k) != 0) {
          d(k) = (coefQ(blk)(k) * H264Cavlc.vForPos(myQp % 6, k)) << (myQp / 6)
          any = true
        }
        k += 1
      }
      if (any) H264Cavlc.inverseTransform4x4(d)
      k = 0
      while (k < 16) {
        val v = clip(pred(k) + d(k))
        reconBlocks(blk)(k) = v
        recon((byp + (k >> 2)) * W + bxp + (k & 3)) = v
        k += 1
      }
      lumaMode(by * bW + bx) = mode
      lumaNz(by * bW + bx) = 0 // placeholder, set at residual emission
      blk += 1
    }
    val cbpLuma = (0 until 4).map { i8 =>
      val any = (0 until 4).exists(i4 => coefQ(i8 * 4 + i4).exists(_ != 0))
      if (any) 1 << i8 else 0
    }.sum
    val cbpChroma = rnd.nextInt(3)
    val cbp = cbpLuma | (cbpChroma << 4)
    // if cbp == 0 there is no mb_qp_delta: the planned qp is unused (all
    // residuals zero) and the running qp must stay unchanged
    val effQp = if (cbp != 0) myQp else qp
    ue(w, 0) // mb_type I_NxN
    // pred mode bits, with the decoder's inference replayed
    blk = 0
    while (blk < 16) {
      val (xO, yO) = blkOff(blk)
      val bx = bx0 + xO / 4; val by = by0 + yO / 4
      val pm = predModeInference(bx, by)
      if (modes(blk) == pm) bits(w, "1")
      else {
        bits(w, "0")
        val rem = if (modes(blk) < pm) modes(blk) else modes(blk) - 1
        u(w, 3, rem)
      }
      blk += 1
    }
    ue(w, rnd.nextInt(4)) // intra_chroma_pred_mode
    val cbpCode = H264Cavlc.cbpIntraMap.indexOf(cbp)
    assert(cbpCode >= 0)
    ue(w, cbpCode)
    if (cbp != 0) { se(w, deltaTo(myQp)); qp = myQp }
    // residual emission (nC evolves exactly as in the decoder)
    blk = 0
    while (blk < 16) {
      val (xO, yO) = blkOff(blk)
      val bx = bx0 + xO / 4; val by = by0 + yO / 4
      if ((cbpLuma & (1 << (blk >> 2))) != 0) {
        val scan = Array.tabulate(16)(i => coefQ(blk)(H264Cavlc.zigzag4x4(i)))
        val tc = encodeResidual(w, scan, lumaNc(bx, by), 16)
        lumaNz(by * bW + bx) = tc
      } else {
        // skipped 8x8: residuals must actually be zero
        assert(coefQ(blk).forall(_ == 0))
        lumaNz(by * bW + bx) = 0
      }
      blk += 1
    }
    encodeChroma(w, m, cbpChroma)
    // closed-loop: if the effective qp differs from the planned qp the
    // residuals were quantized with, nothing changes — cbp==0 means all
    // residual blocks were zero and recon is pure prediction
    val _ = effQp
  }

  // ---- chroma residual (parse-sync only; decoder never reconstructs)

  private def encodeChroma(w: StringBuilder, m: Int, cbpChroma: Int): Unit = {
    val cx0 = (m % wMbs) * 2; val cy0 = (m / wMbs) * 2
    if (cbpChroma >= 1) {
      (0 until 2).foreach { _ =>
        val dc = Array.fill(4)(rnd.nextInt(7) - 3)
        encodeResidual(w, dc, -1, 4)
      }
    }
    if (cbpChroma == 2) {
      (0 until 2).foreach { c =>
        (0 until 4).foreach { blk =>
          val bx = cx0 + (blk & 1); val by = cy0 + (blk >> 1)
          val ac = Array.fill(15)(if (rnd.nextInt(4) == 0) rnd.nextInt(5) - 2 else 0)
          val tc = encodeResidual(w, ac, chromaNc(c, bx, by), 15)
          chromaNz(c)(by * cW + bx) = tc
        }
      }
    } else {
      (0 until 2).foreach { c =>
        chromaNz(c)(cy0 * cW + cx0) = 0
        chromaNz(c)(cy0 * cW + cx0 + 1) = 0
        chromaNz(c)((cy0 + 1) * cW + cx0) = 0
        chromaNz(c)((cy0 + 1) * cW + cx0 + 1) = 0
      }
    }
  }

  // ---- CAVLC residual emission

  /** Encode one residual block (scan-order coefficients); returns
    * TotalCoeff.
    */
  private def encodeResidual(w: StringBuilder, scan: Array[Int], nC: Int,
                             maxNumCoeff: Int): Int = {
    val nz = scan.zipWithIndex.filter(_._1 != 0)
    val totalCoeff = nz.length
    var trailingOnes = 0
    while (trailingOnes < math.min(3, totalCoeff) &&
        math.abs(nz(totalCoeff - 1 - trailingOnes)._1) == 1)
      trailingOnes += 1
    bits(w, coeffTokenCode(nC, totalCoeff, trailingOnes))
    if (totalCoeff == 0) return 0
    // trailing-one signs, highest frequency first
    (0 until trailingOnes).foreach { i =>
      bits(w, if (nz(totalCoeff - 1 - i)._1 < 0) "1" else "0")
    }
    var suffixLength = if (totalCoeff > 10 && trailingOnes < 3) 1 else 0
    var i = trailingOnes
    while (i < totalCoeff) {
      val level = nz(totalCoeff - 1 - i)._1
      var levelCode = if (level > 0) 2 * level - 2 else -2 * level - 1
      if (i == trailingOnes && trailingOnes < 3) levelCode -= 2
      if (suffixLength == 0) {
        if (levelCode < 14) { u(w, levelCode, 0); bits(w, "1") }
        else if (levelCode < 30) {
          u(w, 14, 0); bits(w, "1"); u(w, 4, levelCode - 14)
        } else {
          assert(levelCode - 30 < 4096, "level too large for fixture")
          u(w, 15, 0); bits(w, "1"); u(w, 12, levelCode - 30)
        }
      } else {
        if (levelCode < (15 << suffixLength)) {
          val prefix = levelCode >> suffixLength
          u(w, prefix, 0); bits(w, "1")
          u(w, suffixLength, levelCode & ((1 << suffixLength) - 1))
        } else {
          val esc = levelCode - (15 << suffixLength)
          assert(esc < 4096, "level too large for fixture")
          u(w, 15, 0); bits(w, "1"); u(w, 12, esc)
        }
      }
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(level) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }
    val lastPos = nz.last._2
    val totalZeros = lastPos + 1 - totalCoeff
    if (totalCoeff < maxNumCoeff) {
      bits(w, if (nC == -1) tzChromaCode(totalCoeff, totalZeros)
        else tzCode(totalCoeff, totalZeros))
    }
    // runs, highest frequency first
    var zerosLeft = totalZeros
    i = totalCoeff - 1
    while (i > 0 && zerosLeft > 0) {
      val run = nz(i)._2 - nz(i - 1)._2 - 1
      bits(w, runCode(zerosLeft, run))
      zerosLeft -= run
      i -= 1
    }
    totalCoeff
  }

  // ---- neighbor state (mirrors the decoder's bookkeeping)

  private def lumaNc(bx: Int, by: Int): Int = {
    val nA = if (bx > 0) lumaNz(by * bW + bx - 1) else -1
    val nB = if (by > 0) lumaNz((by - 1) * bW + bx) else -1
    if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
    else if (nA >= 0) nA else if (nB >= 0) nB else 0
  }

  private def chromaNc(c: Int, bx: Int, by: Int): Int = {
    val g = chromaNz(c)
    val nA = if (bx > 0) g(by * cW + bx - 1) else -1
    val nB = if (by > 0) g((by - 1) * cW + bx) else -1
    if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
    else if (nA >= 0) nA else if (nB >= 0) nB else 0
  }

  private def predModeInference(bx: Int, by: Int): Int = {
    val mA =
      if (bx == 0 || lumaNz(by * bW + bx - 1) < 0) -1
      else { val mm = lumaMode(by * bW + bx - 1); if (mm < 0) 2 else mm }
    val mB =
      if (by == 0 || lumaNz((by - 1) * bW + bx) < 0) -1
      else { val mm = lumaMode((by - 1) * bW + bx); if (mm < 0) 2 else mm }
    if (mA < 0 || mB < 0) 2 else math.min(mA, mB)
  }

  private def markMb(m: Int, nz: Int, mode: Int): Unit = {
    markModes(m, mode)
    val bx0 = (m % wMbs) * 4; val by0 = (m / wMbs) * 4
    for (by <- 0 until 4; bx <- 0 until 4)
      lumaNz((by0 + by) * bW + bx0 + bx) = nz
    val cx0 = (m % wMbs) * 2; val cy0 = (m / wMbs) * 2
    for (c <- 0 until 2; dy <- 0 until 2; dx <- 0 until 2)
      chromaNz(c)((cy0 + dy) * cW + cx0 + dx) = nz
  }

  private def markModes(m: Int, mode: Int): Unit = {
    val bx0 = (m % wMbs) * 4; val by0 = (m / wMbs) * 4
    for (by <- 0 until 4; bx <- 0 until 4)
      lumaMode((by0 + by) * bW + bx0 + bx) = mode
  }

  /** (left, top, topLeft, topRight) availability for a 4x4 block at
    * block coords — in picture AND earlier in raster/blkIdx decode
    * order (the rule the decoder applies).
    */
  private def avail(bx: Int, by: Int): (Boolean, Boolean, Boolean, Boolean) = {
    def before(nx: Int, ny: Int): Boolean = {
      if (nx < 0 || ny < 0 || nx >= bW || ny >= bH) return false
      val mOther = (ny / 4) * wMbs + (nx / 4)
      val mThis = (by / 4) * wMbs + (bx / 4)
      if (mOther != mThis) mOther < mThis
      else blkIdxOf(nx % 4, ny % 4) < blkIdxOf(bx % 4, by % 4)
    }
    (before(bx - 1, by), before(bx, by - 1),
      before(bx - 1, by - 1), before(bx + 1, by - 1))
  }

  private def deltaTo(target: Int): Int = {
    var d = target - qp
    if (d > 25) d -= 52
    if (d < -26) d += 52
    d
  }

  private def zigzagOf(raster: Array[Int]): Array[Int] =
    Array.tabulate(16)(i => raster(H264Cavlc.zigzag4x4(i)))
}

object H264Enc {
  def clip(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  def blkOff(blk: Int): (Int, Int) =
    (((blk >> 2) & 1) * 8 + (blk & 1) * 4,
      ((blk >> 3) & 1) * 8 + ((blk >> 1) & 1) * 4)

  def blkIdxOf(bx: Int, by: Int): Int = {
    val xO = bx * 4; val yO = by * 4
    ((yO >> 3) << 3) | ((xO >> 3) << 2) | (((yO >> 2) & 1) << 1) |
      ((xO >> 2) & 1)
  }

  // ---- forward transforms & quant (JVT reference arithmetic) ----

  /** W = Cf · X · CfT with Cf = [[1,1,1,1],[2,1,-1,-2],[1,-1,-1,1],
    * [1,-2,2,-1]].
    */
  def fwd4x4(x: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) { // rows: Cf * X (column transform of each column?) —
      // apply to rows first, then columns; order is immaterial for the
      // separable transform
      val a = x(i * 4); val b = x(i * 4 + 1); val c = x(i * 4 + 2)
      val d = x(i * 4 + 3)
      val s0 = a + d; val s1 = b + c; val s2 = b - c; val s3 = a - d
      t(i * 4) = s0 + s1; t(i * 4 + 1) = 2 * s3 + s2
      t(i * 4 + 2) = s0 - s1; t(i * 4 + 3) = s3 - 2 * s2
      i += 1
    }
    val o = new Array[Int](16)
    i = 0
    while (i < 4) {
      val a = t(i); val b = t(4 + i); val c = t(8 + i); val d = t(12 + i)
      val s0 = a + d; val s1 = b + c; val s2 = b - c; val s3 = a - d
      o(i) = s0 + s1; o(4 + i) = 2 * s3 + s2
      o(8 + i) = s0 - s1; o(12 + i) = s3 - 2 * s2
      i += 1
    }
    o
  }

  /** Forward 4x4 Hadamard (I_16x16 luma DC), with the standard /2. */
  def fwdHadamard4x4(x: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a = x(i * 4); val b = x(i * 4 + 1); val c = x(i * 4 + 2)
      val d = x(i * 4 + 3)
      val s0 = a + d; val s1 = b + c; val s2 = b - c; val s3 = a - d
      t(i * 4) = s0 + s1; t(i * 4 + 1) = s3 + s2
      t(i * 4 + 2) = s0 - s1; t(i * 4 + 3) = s3 - s2
      i += 1
    }
    val o = new Array[Int](16)
    i = 0
    while (i < 4) {
      val a = t(i); val b = t(4 + i); val c = t(8 + i); val d = t(12 + i)
      val s0 = a + d; val s1 = b + c; val s2 = b - c; val s3 = a - d
      o(i) = (s0 + s1) / 2; o(4 + i) = (s3 + s2) / 2
      o(8 + i) = (s0 - s1) / 2; o(12 + i) = (s3 - s2) / 2
      i += 1
    }
    o
  }

  /** Forward quant multipliers M (per QP%6: positions v0/v1/v2). */
  val mf: Array[Array[Int]] = Array(
    Array(13107, 5243, 8066), Array(11916, 4660, 7490),
    Array(10082, 4194, 6554), Array(9362, 3647, 5825),
    Array(8192, 3355, 5243), Array(7282, 2893, 4559))

  private def mfForPos(qpMod6: Int, rasterIdx: Int): Int = {
    val r = rasterIdx >> 2; val c = rasterIdx & 3
    val sel =
      if ((r % 2 == 0) && (c % 2 == 0)) 0
      else if ((r % 2 == 1) && (c % 2 == 1)) 1
      else 2
    mf(qpMod6)(sel)
  }

  def quantAc(wv: Int, qp: Int, rasterIdx: Int): Int = {
    val qbits = 15 + qp / 6
    val f = (1 << qbits) / 3 // intra
    val z = (math.abs(wv) * mfForPos(qp % 6, rasterIdx) + f) >> qbits
    if (wv < 0) -z else z
  }

  def quantDc(wv: Int, qp: Int): Int = {
    val qbits = 15 + qp / 6
    val f = (1 << qbits) / 3
    val z = (math.abs(wv) * mf(qp % 6)(0) + 2 * f) >> (qbits + 1)
    if (wv < 0) -z else z
  }

  // ---- encode-side VLC lookup (inverted decoder tables) ----

  private def invert(v: H264Cavlc.Vlc[(Int, Int)]): Map[(Int, Int), String] =
    v.byCode.map { case ((len, code), tct1) =>
      tct1 -> leftPad(code.toBinaryString, len)
    }
  private def leftPad(s: String, n: Int): String = "0" * (n - s.length) + s

  private lazy val tokNc0 = invert(H264Cavlc.coeffTokenNc0)
  private lazy val tokNc2 = invert(H264Cavlc.coeffTokenNc2)
  private lazy val tokNc4 = invert(H264Cavlc.coeffTokenNc4)
  private lazy val tokChroma = invert(H264Cavlc.coeffTokenChromaDc)

  def coeffTokenCode(nC: Int, tc: Int, t1: Int): String =
    if (nC == -1) tokChroma((tc, t1))
    else if (nC < 2) tokNc0((tc, t1))
    else if (nC < 4) tokNc2((tc, t1))
    else if (nC < 8) tokNc4((tc, t1))
    else if (tc == 0) "000011"
    else leftPad((((tc - 1) << 2) | t1).toBinaryString, 6)

  private def invertInt(v: H264Cavlc.Vlc[Int]): Map[Int, String] =
    v.byCode.map { case ((len, code), tz) => tz -> leftPad(code.toBinaryString, len) }

  def tzCode(tc: Int, tz: Int): String =
    invertInt(H264Cavlc.totalZeros4x4(tc - 1))(tz)
  def tzChromaCode(tc: Int, tz: Int): String =
    invertInt(H264Cavlc.totalZerosChromaDc(tc - 1))(tz)
  def runCode(zerosLeft: Int, run: Int): String =
    invertInt(H264Cavlc.runBefore(math.min(zerosLeft, 7) - 1))(run)

  // ---- intra prediction: INDEPENDENT transcription (§8.3.1.2, §8.3.3)

  def predict4x4(plane: Array[Int], planeW: Int, x0: Int, y0: Int,
                 mode: Int, la: Boolean, ta: Boolean, tla: Boolean,
                 tra: Boolean): Array[Int] = {
    def L(y: Int) = plane((y0 + y) * planeW + x0 - 1)
    def T(x: Int) = plane((y0 - 1) * planeW + x0 + x)
    def TL = plane((y0 - 1) * planeW + x0 - 1)
    def TR(x: Int) = if (x < 4 || tra) T(x) else T(3)
    val o = new Array[Int](16)
    def set(x: Int, y: Int, v: Int): Unit = o(y * 4 + x) = v
    mode match {
      case 0 =>
        for (y <- 0 until 4; x <- 0 until 4) set(x, y, T(x))
      case 1 =>
        for (y <- 0 until 4; x <- 0 until 4) set(x, y, L(y))
      case 2 =>
        val dc =
          if (ta && la) (T(0) + T(1) + T(2) + T(3) +
            L(0) + L(1) + L(2) + L(3) + 4) >> 3
          else if (ta) (T(0) + T(1) + T(2) + T(3) + 2) >> 2
          else if (la) (L(0) + L(1) + L(2) + L(3) + 2) >> 2
          else 128
        java.util.Arrays.fill(o, dc)
      case 3 => // down-left
        for (y <- 0 until 4; x <- 0 until 4)
          set(x, y,
            if (x == 3 && y == 3) (TR(6) + 3 * TR(7) + 2) >> 2
            else (TR(x + y) + 2 * TR(x + y + 1) + TR(x + y + 2) + 2) >> 2)
      case 4 => // down-right
        for (y <- 0 until 4; x <- 0 until 4)
          set(x, y,
            if (x > y) (T(x - y - 2) + 2 * T(x - y - 1) + T(x - y) + 2) >> 2
            else if (x < y)
              (L(y - x - 2) + 2 * L(y - x - 1) + L(y - x) + 2) >> 2
            else (T(0) + 2 * TL + L(0) + 2) >> 2)
      case 5 => // vertical-right
        for (y <- 0 until 4; x <- 0 until 4) {
          val z = 2 * x - y
          val v =
            if (z == -1) (L(0) + 2 * TL + T(0) + 2) >> 2
            else if (z < -1) (L(y - 1) + 2 * L(y - 2) + L(y - 3) + 2) >> 2
            else {
              val i = x - (y >> 1)
              def TT(j: Int) = if (j == -1) TL else T(j)
              if (z % 2 == 0) (TT(i - 1) + TT(i) + 1) >> 1
              else (TT(i - 2) + 2 * TT(i - 1) + TT(i) + 2) >> 2
            }
          set(x, y, v)
        }
      case 6 => // horizontal-down
        for (y <- 0 until 4; x <- 0 until 4) {
          val z = 2 * y - x
          val v =
            if (z == -1) (T(0) + 2 * TL + L(0) + 2) >> 2
            else if (z < -1) (T(x - 1) + 2 * T(x - 2) + T(x - 3) + 2) >> 2
            else {
              val i = y - (x >> 1)
              def LL(j: Int) = if (j == -1) TL else L(j)
              if (z % 2 == 0) (LL(i - 1) + LL(i) + 1) >> 1
              else (LL(i - 2) + 2 * LL(i - 1) + LL(i) + 2) >> 2
            }
          set(x, y, v)
        }
      case 7 => // vertical-left
        for (y <- 0 until 4; x <- 0 until 4) {
          val i = x + (y >> 1)
          set(x, y,
            if (y % 2 == 0) (TR(i) + TR(i + 1) + 1) >> 1
            else (TR(i) + 2 * TR(i + 1) + TR(i + 2) + 2) >> 2)
        }
      case 8 => // horizontal-up
        for (y <- 0 until 4; x <- 0 until 4) {
          val z = x + 2 * y
          set(x, y,
            if (z > 5) L(3)
            else if (z == 5) (L(2) + 3 * L(3) + 2) >> 2
            else {
              val i = y + (x >> 1)
              if (z % 2 == 0) (L(i) + L(i + 1) + 1) >> 1
              else (L(i) + 2 * L(i + 1) + L(i + 2) + 2) >> 2
            })
        }
    }
    o
  }

  def predict16x16(plane: Array[Int], planeW: Int, x0: Int, y0: Int,
                   mode: Int, la: Boolean, ta: Boolean): Array[Int] = {
    def L(y: Int) = plane((y0 + y) * planeW + x0 - 1)
    def T(x: Int) = plane((y0 - 1) * planeW + x0 + x)
    def TL = plane((y0 - 1) * planeW + x0 - 1)
    val o = new Array[Int](256)
    mode match {
      case 0 => for (y <- 0 until 16; x <- 0 until 16) o(y * 16 + x) = T(x)
      case 1 => for (y <- 0 until 16; x <- 0 until 16) o(y * 16 + x) = L(y)
      case 2 =>
        var s = 0; var n = 0
        if (ta) { (0 until 16).foreach(x => s += T(x)); n += 16 }
        if (la) { (0 until 16).foreach(y => s += L(y)); n += 16 }
        val dc = if (n == 32) (s + 16) >> 5 else if (n == 16) (s + 8) >> 4 else 128
        java.util.Arrays.fill(o, dc)
      case 3 =>
        var h = 0; var v = 0
        for (i <- 0 until 8) {
          h += (i + 1) * (T(8 + i) - (if (i == 7) TL else T(6 - i)))
          v += (i + 1) * (L(8 + i) - (if (i == 7) TL else L(6 - i)))
        }
        val a = 16 * (L(15) + T(15))
        val b = (5 * h + 32) >> 6
        val c = (5 * v + 32) >> 6
        for (y <- 0 until 16; x <- 0 until 16)
          o(y * 16 + x) = clip((a + b * (x - 7) + c * (y - 7) + 16) >> 5)
    }
    o
  }

  /** Full Annex-B stream for the end-to-end test: SPS + PPS + one IDR
    * whose slice data is `sliceBits` (already a legal MB layer).
    */
  def annexBStream(wMbs: Int, hMbs: Int, sliceQp: Int,
                   sliceBits: String): Array[Byte] =
    annexBStreamMulti(wMbs, hMbs, sliceQp, Seq(sliceBits))

  /** Multi-frame variant: SPS + PPS + one IDR NAL per MB-layer
    * bitstring (each frame is an independent all-intra picture).
    */
  def annexBStreamMulti(wMbs: Int, hMbs: Int, sliceQp: Int,
                        slices: Seq[String], idc: Int = 1): Array[Byte] = {
    def bitsToRbsp(bits: String): Array[Byte] = {
      val full = bits + "1" + "0" * ((8 - (bits.length + 1) % 8) % 8)
      full.grouped(8).map(b => Integer.parseInt(b, 2).toByte).toArray
    }
    def nal(refIdc: Int, t: Int, rbsp: Array[Byte]): Array[Byte] = {
      val out = scala.collection.mutable.ArrayBuffer[Byte](0, 0, 0, 1)
      out += ((refIdc << 5) | t).toByte
      var zeros = 0
      rbsp.foreach { b =>
        if (zeros >= 2 && (b & 0xff) <= 3) { out += 3; zeros = 0 }
        out += b
        zeros = if (b == 0) zeros + 1 else 0
      }
      out.toArray
    }
    val sps = {
      val w = new StringBuilder
      def u2(n: Int, v: Int) = (n - 1 to 0 by -1)
        .foreach(i => w.append(if (((v >> i) & 1) == 1) '1' else '0'))
      def ue2(v: Int): Unit = {
        val cp = v + 1; val len = 32 - Integer.numberOfLeadingZeros(cp)
        u2(len - 1, 0); u2(len, cp)
      }
      u2(8, 66); u2(8, 0); u2(8, 10) // baseline / constraints / level
      ue2(0); ue2(0); ue2(0); ue2(0) // sps_id, log2fn-4, poc type, log2poc-4
      ue2(1); w.append('0') // max_num_ref_frames, gaps
      ue2(wMbs - 1); ue2(hMbs - 1)
      w.append('1') // frame_mbs_only
      w.append('1') // direct_8x8
      w.append('0'); w.append('0') // no crop, no VUI
      bitsToRbsp(w.toString)
    }
    val pps = {
      val w = new StringBuilder
      def u2(n: Int, v: Int) = (n - 1 to 0 by -1)
        .foreach(i => w.append(if (((v >> i) & 1) == 1) '1' else '0'))
      def ue2(v: Int): Unit = {
        val cp = v + 1; val len = 32 - Integer.numberOfLeadingZeros(cp)
        u2(len - 1, 0); u2(len, cp)
      }
      def se2(v: Int): Unit = ue2(if (v <= 0) -2 * v else 2 * v - 1)
      ue2(0); ue2(0) // pps_id, sps_id
      w.append('0'); w.append('0') // CAVLC, no bottom-field poc
      ue2(0); ue2(0); ue2(0) // 1 slice group, ref idx defaults
      w.append('0'); u2(2, 0) // no weighted pred
      se2(0); se2(0); se2(0) // init qp 26, qs, chroma offset
      // deblocking_filter_control_present: the encoder's reconstruction
      // is PRE-deblock, so its streams must carry idc=1 (filter off,
      // a conformant encoder choice) for closed-loop bit-exactness
      w.append('1'); w.append('0'); w.append('0')
      bitsToRbsp(w.toString)
    }
    val idrs = slices.map(sb =>
      nal(3, 5, bitsToRbsp(sliceHeaderBits(sliceQp, idc) + sb)))
    (Seq(nal(3, 7, sps), nal(3, 8, pps)) ++ idrs).flatten.toArray
  }

  /** The IDR slice-header bitstring matching [[annexBStream]]'s SPS/PPS
    * choices — its LENGTH is the encoder's `alignOffset` (I_PCM
    * alignment counts from the RBSP start).
    */
  def sliceHeaderBits(sliceQp: Int, idc: Int = 1): String = {
    val w = new StringBuilder
    def u2(n: Int, v: Int) = (n - 1 to 0 by -1)
      .foreach(i => w.append(if (((v >> i) & 1) == 1) '1' else '0'))
    def ue2(v: Int): Unit = {
      val cp = v + 1; val len = 32 - Integer.numberOfLeadingZeros(cp)
      u2(len - 1, 0); u2(len, cp)
    }
    def se2(v: Int): Unit = ue2(if (v <= 0) -2 * v else 2 * v - 1)
    ue2(0) // first_mb_in_slice
    ue2(7) // slice_type I (all)
    ue2(0) // pps_id
    u2(4, 0) // frame_num
    ue2(0) // idr_pic_id
    u2(4, 0) // poc lsb
    w.append('0'); w.append('0') // prior pics, long term
    se2(sliceQp - 26) // slice_qp_delta
    ue2(idc) // disable_deblocking_filter_idc (1 = off, see pps comment)
    if (idc != 1) { se2(0); se2(0) } // alpha/beta offsets 0
    w.toString
  }
}
