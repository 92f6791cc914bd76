package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.H264Deblock

/** In-loop deblocking filter (§8.7): table structure, HAND-COMPUTED
  * line vectors for all three filter branches (the expected values in
  * these tests were worked by hand from the spec formulas, not by
  * running the implementation), invariances, and the closed-loop
  * integration against the independent encoder.
  */
class H264DeblockSpec extends AnyFunSuite {

  private def plane(w: Int, h: Int)(f: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h)(i => f(i % w, i / w))

  test("tables: Table 8-16/8-17 structure — lengths, zero head, monotone, bS order") {
    assert(H264Deblock.alphaTable.length == 52)
    assert(H264Deblock.betaTable.length == 52)
    assert(H264Deblock.tc0Table.forall(_.length == 52))
    // no filtering below indexA/B 16
    assert(H264Deblock.alphaTable.take(16).forall(_ == 0))
    assert(H264Deblock.betaTable.take(16).forall(_ == 0))
    assert(H264Deblock.tc0Table.forall(_.take(16).forall(_ == 0)))
    // monotone nondecreasing in qp
    def mono(a: Array[Int]) = a.sliding(2).forall(p => p(0) <= p(1))
    assert(mono(H264Deblock.alphaTable) && mono(H264Deblock.betaTable))
    assert(H264Deblock.tc0Table.forall(mono))
    // stronger bS is never gentler
    (0 until 52).foreach { i =>
      assert(H264Deblock.tc0Table(0)(i) <= H264Deblock.tc0Table(1)(i))
      assert(H264Deblock.tc0Table(1)(i) <= H264Deblock.tc0Table(2)(i))
    }
    // spot anchors: alpha/beta doubling-every-6-qp shape, spec endpoints
    assert(H264Deblock.alphaTable(16) == 4 && H264Deblock.alphaTable(51) == 255)
    assert(H264Deblock.betaTable(16) == 2 && H264Deblock.betaTable(51) == 18)
    assert(H264Deblock.tc0Table(2)(51) == 25)
  }

  test("flat picture is a fixed point; qp below 16 never filters") {
    val flat = plane(32, 16)((_, _) => 97)
    val before = flat.clone()
    H264Deblock.filterLuma(flat, 2, 1, Array(40, 40))
    assert(flat.toSeq == before.toSeq)
    // a hard step at qp 15: alpha = 0, untouched
    val step = plane(32, 16)((x, _) => if (x < 16) 120 else 160)
    val b2 = step.clone()
    H264Deblock.filterLuma(step, 2, 1, Array(15, 15))
    assert(step.toSeq == b2.toSeq)
  }

  test("bS=4 weak branch (hand vector): |p0-q0| past the strong gate moves only p0/q0") {
    // qp 40: alpha=80, beta=13; step 120|160: 40 < 80 filters, but
    // 40 >= (80>>2)+2 = 22 so only the 3-tap p0/q0 filter applies:
    // p0' = (2*120+120+160+2)>>2 = 130, q0' = (2*160+160+120+2)>>2 = 150
    val pl = plane(32, 16)((x, _) => if (x < 16) 120 else 160)
    H264Deblock.filterLuma(pl, 2, 1, Array(40, 40))
    (0 until 16).foreach { y =>
      val row = (0 until 32).map(x => pl(y * 32 + x))
      assert(row.take(15).forall(_ == 120), s"y=$y $row")
      assert(row(15) == 130 && row(16) == 150, s"y=$y $row")
      assert(row.drop(17).forall(_ == 160), s"y=$y $row")
    }
  }

  test("bS=4 strong branch (hand vector): 4/5-tap smooths three samples per side") {
    // qp 40, step 120|136: 16 < 22 passes the strong gate, ap=aq=0<13:
    // p2'=(2*120+3*120+120+120+136+4)>>3=122, p1'=(120*3+136+2)>>2=124,
    // p0'=(120+240+240+272+136+4)>>3=126; q mirrors to 130,132,134
    val pl = plane(32, 16)((x, _) => if (x < 16) 120 else 136)
    H264Deblock.filterLuma(pl, 2, 1, Array(40, 40))
    val want = (0 until 32).map {
      case x if x <= 12 => 120
      case 13 => 122
      case 14 => 124
      case 15 => 126
      case 16 => 130
      case 17 => 132
      case 18 => 134
      case _ => 136
    }
    (0 until 16).foreach { y =>
      assert((0 until 32).map(x => pl(y * 32 + x)) == want, s"y=$y")
    }
  }

  test("bS=3 normal branch (hand vector): clipped delta + side smoothing on an internal edge") {
    // single MB, internal step at x=8, qp 32: alpha=32, beta=9, tc0=3.
    // delta = clip(+-5, ((8<<2) + (120-128) + 4)>>3) = 3 -> p0'=123,
    // q0'=125; ap=aq=0<9 -> p1' = 120 + clip(+-3,(120+124-240)>>1)=122,
    // q1' = 128 + clip(+-3,(128+124-256)>>1) = 126. CASCADE (§8.7's
    // filtered-samples-feed-later-edges rule): edge x=12 then sees
    // p2=x9=126, so ap=2<9 and its p1 (x10) moves by
    // clip(+-3,(126+128-256)>>1) = -1 -> 127 even though delta=0 there.
    val pl = plane(16, 16)((x, _) => if (x < 8) 120 else 128)
    H264Deblock.filterLuma(pl, 1, 1, Array(32))
    val want = (0 until 16).map {
      case x if x <= 5 => 120
      case 6 => 122
      case 7 => 123
      case 8 => 125
      case 9 => 126
      case 10 => 127
      case _ => 128
    }
    (0 until 16).foreach { y =>
      assert((0 until 16).map(x => pl(y * 16 + x)) == want, s"y=$y")
    }
  }

  test("horizontal edges filter with the plane stride (hand vector, transposed step)") {
    // two MB rows, step at y=16 — same arithmetic as the weak bS=4
    // vector but across a horizontal MB boundary
    val pl = plane(16, 32)((_, y) => if (y < 16) 120 else 160)
    H264Deblock.filterLuma(pl, 1, 2, Array(40, 40))
    (0 until 16).foreach { x =>
      val colv = (0 until 32).map(y => pl(y * 16 + x))
      assert(colv(15) == 130 && colv(16) == 150, s"x=$x $colv")
      assert(colv.take(15).forall(_ == 120) && colv.drop(17).forall(_ == 160))
    }
  }

  test("I_PCM QPY-0 rule: mixed PCM/coded edge uses the averaged qp") {
    // left MB I_PCM (qp 0), right coded at qp 51: qpav = 26 ->
    // alpha(26)=15: a step of 40 does NOT filter; a step of 14 does
    val big = plane(32, 16)((x, _) => if (x < 16) 120 else 160)
    val before = big.clone()
    H264Deblock.filterLuma(big, 2, 1, Array(0, 51))
    assert(big.toSeq == before.toSeq) // 40 >= alpha(26)=15
    val small = plane(32, 16)((x, _) => if (x < 16) 120 else 134)
    H264Deblock.filterLuma(small, 2, 1, Array(0, 51))
    assert(small.toSeq != plane(32, 16)((x, _) => if (x < 16) 120 else 134).toSeq)
  }

  test("closed-loop integration: idc=0 stream decodes to filterLuma(recon, encoder QPs)") {
    val spark = TestSpark.session
    import spark.implicits._
    val rnd = new scala.util.Random(13L)
    val wMbs = 2; val hMbs = 2; val sliceQp = 34 // high qp: filter bites
    val W = wMbs * 16; val H = hMbs * 16
    val src = Array.tabulate(W * H) { i =>
      ((i % W) * 5 + (i / W) * 3 + rnd.nextInt(60)) % 256
    }
    val headerLen = H264Enc.sliceHeaderBits(sliceQp, idc = 0).length
    val enc = new H264Enc(wMbs, hMbs, sliceQp, rnd, alignOffset = headerLen)
    val (sliceBits, recon) = enc.encodeFrame(src)
    val es = H264Enc.annexBStreamMulti(wMbs, hMbs, sliceQp, Seq(sliceBits), idc = 0)
    val rows = operators.Multimodal.sampleFrames(
      Seq((1L, es)).toDF("media_id", "payload"), "payload",
      frameBytes = 64, everyN = 1).collect()
    assert(rows.length == 1, "idc=0 CAVLC IDR not decoded")
    val (px, w, h) = operators.Multimodal.ImageIoCodec
      .decodeImage(rows(0).getAs[Array[Byte]]("frame")).get
    assert(w == W && h == H)
    val got = px.map(v => (v * 255f).round)
    // expected: the encoder's pre-deblock reconstruction run through the
    // filter with the encoder's own per-MB QPs
    val expect = recon.clone()
    H264Deblock.filterLuma(expect, wMbs, hMbs, enc.mbQps)
    assert(got.toSeq == expect.toSeq,
      "deblocked decode != filterLuma(closed-loop recon)")
    // and the filter genuinely changed something vs the pre-deblock recon
    assert(expect.toSeq != recon.toSeq, "filter was a no-op at qp 34")
  }
}
