package graft.operators

/** H.264 in-loop deblocking filter (ITU-T H.264 §8.7) for the luma plane
  * of an all-intra frame-coded picture — the conformance step the CAVLC
  * decoder's output previously skipped (its output was the pre-deblock
  * reconstruction; fine for keyframe selection, slightly off conformant
  * pixels).
  *
  * Scope matches the decoder: all-intra single-slice pictures, so
  * boundary strengths need no motion/reference comparison — every
  * macroblock-boundary edge is bS = 4 (both sides intra, MB edge) and
  * every internal 4x4 edge is bS = 3 (intra, non-MB edge; §8.7.2.1).
  * Chroma is never reconstructed (grayscale output), so only luma
  * filtering applies.
  *
  * Process order per §8.7: macroblocks in raster order; within one MB
  * all four vertical edges left→right, then all four horizontal edges
  * top→bottom; samples modified by earlier edge operations are the
  * inputs of later ones (in-place). QPY of an I_PCM macroblock counts
  * as 0 for the filter (§8.7.2) — which is why the I_PCM-only test
  * fixtures are bit-identical with the filter on: qPav ≤ 13 keeps
  * alpha = beta = 0.
  *
  * The filter itself (§8.7.2.3–8.7.2.4): a line of 8 samples
  * p3..p0 | q0..q3 across the edge filters only when
  * |p0−q0| < α(indexA) and |p1−p0| < β(indexB) and |q1−q0| < β —
  * α/β from Table 8-16 indexed by clipped qPav + slice offsets. bS < 4
  * applies the clipped-delta filter with tC from Table 8-17 (+1 per
  * low-activity side, which then also gets its p1/q1 smoothed); bS = 4
  * applies the strong 4/5-tap filter on low-activity sides when
  * additionally |p0−q0| < (α >> 2) + 2, else the weak 3-tap p0/q0
  * filter.
  */
object H264Deblock {

  /** Table 8-16: α′ as a function of indexA (0..51). */
  private[graft] val alphaTable: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28,
    32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144,
    162, 182, 203, 226, 255, 255)

  /** Table 8-16: β′ as a function of indexB (0..51). */
  private[graft] val betaTable: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8,
    9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15,
    16, 16, 17, 17, 18, 18)

  /** Table 8-17: t′C0 by (bS−1)(indexA), bS ∈ {1,2,3}. */
  private[graft] val tc0Table: Array[Array[Int]] = {
    val rows = Array(
      // (bS=1, bS=2, bS=3) per indexA 0..51
      (0, 0, 0), (0, 0, 0), (0, 0, 0), (0, 0, 0), (0, 0, 0), (0, 0, 0),
      (0, 0, 0), (0, 0, 0), (0, 0, 0), (0, 0, 0), (0, 0, 0), (0, 0, 0),
      (0, 0, 0), (0, 0, 0), (0, 0, 0), (0, 0, 0), (0, 0, 0), (0, 0, 1),
      (0, 0, 1), (0, 0, 1), (0, 0, 1), (0, 1, 1), (0, 1, 1), (1, 1, 1),
      (1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 2), (1, 1, 2), (1, 1, 2),
      (1, 1, 2), (1, 2, 3), (1, 2, 3), (2, 2, 3), (2, 2, 4), (2, 3, 4),
      (2, 3, 4), (3, 3, 5), (3, 4, 6), (3, 4, 6), (4, 5, 7), (4, 5, 8),
      (5, 6, 9), (6, 7, 10), (6, 8, 11), (7, 9, 13), (8, 10, 14),
      (9, 11, 16), (10, 13, 18), (11, 14, 20), (13, 16, 23), (14, 18, 25))
    Array(rows.map(_._1), rows.map(_._2), rows.map(_._3))
  }

  private def clip3(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v
  private def clip255(v: Int): Int = clip3(0, 255, v)

  /** Filter one 8-sample line across an edge. `q0Idx` is the index of
    * q0 in `pl`; p-samples sit at q0Idx − k·stride, q at q0Idx + k·stride.
    */
  private def filterLine(pl: Array[Int], q0Idx: Int, stride: Int,
                         bS: Int, alpha: Int, beta: Int, tc0v: Int): Unit = {
    val p0 = pl(q0Idx - stride); val q0 = pl(q0Idx)
    val p1 = pl(q0Idx - 2 * stride); val q1 = pl(q0Idx + stride)
    if (math.abs(p0 - q0) >= alpha || math.abs(p1 - p0) >= beta ||
        math.abs(q1 - q0) >= beta) return
    val p2 = pl(q0Idx - 3 * stride); val q2 = pl(q0Idx + 2 * stride)
    val ap = math.abs(p2 - p0); val aq = math.abs(q2 - q0)
    if (bS == 4) {
      val strongGate = math.abs(p0 - q0) < (alpha >> 2) + 2
      if (ap < beta && strongGate) {
        val p3 = pl(q0Idx - 4 * stride)
        pl(q0Idx - stride) = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
        pl(q0Idx - 2 * stride) = (p2 + p1 + p0 + q0 + 2) >> 2
        pl(q0Idx - 3 * stride) = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
      } else pl(q0Idx - stride) = (2 * p1 + p0 + q1 + 2) >> 2
      if (aq < beta && strongGate) {
        val q3 = pl(q0Idx + 3 * stride)
        pl(q0Idx) = (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3
        pl(q0Idx + stride) = (q2 + q1 + q0 + p0 + 2) >> 2
        pl(q0Idx + 2 * stride) = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
      } else pl(q0Idx) = (2 * q1 + q0 + p1 + 2) >> 2
    } else {
      val tc = tc0v + (if (ap < beta) 1 else 0) + (if (aq < beta) 1 else 0)
      val delta = clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
      pl(q0Idx - stride) = clip255(p0 + delta)
      pl(q0Idx) = clip255(q0 - delta)
      if (ap < beta)
        pl(q0Idx - 2 * stride) =
          p1 + clip3(-tc0v, tc0v, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1)
      if (aq < beta)
        pl(q0Idx + stride) =
          q1 + clip3(-tc0v, tc0v, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1)
    }
  }

  /** Deblock the luma plane of an all-intra frame in place.
    *
    * @param mbQp    per-MB QPY as the filter sees it (I_PCM = 0)
    * @param offsetA slice_alpha_c0_offset_div2 × 2
    * @param offsetB slice_beta_offset_div2 × 2
    */
  def filterLuma(plane: Array[Int], widthMbs: Int, heightMbs: Int,
                 mbQp: Array[Int], offsetA: Int = 0, offsetB: Int = 0): Unit = {
    val planeW = widthMbs * 16
    var m = 0
    val nMbs = widthMbs * heightMbs
    while (m < nMbs) {
      val mx = m % widthMbs; val my = m / widthMbs
      val x0 = mx * 16; val y0 = my * 16
      // vertical edges, left to right
      var e = 0
      while (e < 4) {
        if (e != 0 || mx != 0) {
          val bS = if (e == 0) 4 else 3
          val qpP = if (e == 0) mbQp(m - 1) else mbQp(m)
          val qpAv = (qpP + mbQp(m) + 1) >> 1
          val idxA = clip3(0, 51, qpAv + offsetA)
          val idxB = clip3(0, 51, qpAv + offsetB)
          val alpha = alphaTable(idxA); val beta = betaTable(idxB)
          if (alpha > 0) {
            val tc0v = if (bS < 4) tc0Table(bS - 1)(idxA) else 0
            val x = x0 + e * 4
            var y = y0
            while (y < y0 + 16) {
              filterLine(plane, y * planeW + x, 1, bS, alpha, beta, tc0v)
              y += 1
            }
          }
        }
        e += 1
      }
      // horizontal edges, top to bottom
      e = 0
      while (e < 4) {
        if (e != 0 || my != 0) {
          val bS = if (e == 0) 4 else 3
          val qpP = if (e == 0) mbQp(m - widthMbs) else mbQp(m)
          val qpAv = (qpP + mbQp(m) + 1) >> 1
          val idxA = clip3(0, 51, qpAv + offsetA)
          val idxB = clip3(0, 51, qpAv + offsetB)
          val alpha = alphaTable(idxA); val beta = betaTable(idxB)
          if (alpha > 0) {
            val tc0v = if (bS < 4) tc0Table(bS - 1)(idxA) else 0
            val y = y0 + e * 4
            var x = x0
            while (x < x0 + 16) {
              filterLine(plane, y * planeW + x, planeW, bS, alpha, beta, tc0v)
              x += 1
            }
          }
        }
        e += 1
      }
      m += 1
    }
  }
}
