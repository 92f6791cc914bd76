package graft.operators

/** CAVLC Baseline-profile H.264 I-frame decoder (ITU-T H.264 §7.3.5,
  * §8.3, §8.5, §9.2) — the entropy-coded complement to the I_PCM path in
  * [[Multimodal.H264Codec]]. Decodes I_4x4 and I_16x16 macroblocks of an
  * all-intra single-slice CAVLC picture to a reconstructed LUMA plane
  * (the engine's video features are grayscale, so chroma coefficients are
  * entropy-parsed — the bitstream cannot be advanced without them — but
  * never reconstructed).
  *
  * In scope:  Baseline I slices — CAVLC, frame_mbs_only, 4:2:0, 8-bit,
  *            mb types I_NxN (4x4), I_16x16 (all pred modes), I_PCM.
  * Out of scope (returns None → honest stub fallback): CABAC, P/B
  * slices, 8x8 transform (High profile), multi-slice pictures, and the
  * in-loop deblocking filter (output is the pre-deblock reconstruction;
  * exact for closed-loop fixtures, a close approximation of a conformant
  * decode of real streams — documented in the README honesty matrix).
  *
  * Reference semantics (what to compute) from the public H.264 spec; the
  * reference repo has no video path at all — this backs the engine's
  * multimodal keyframe/feature operators (X9/X84).
  */
private[graft] object H264Cavlc {

  /** MSB-first bit reader over an RBSP (already unescaped) payload. */
  final class BitReader(val bytes: Array[Byte]) {
    private var pos = 0
    def bit(): Int = {
      val b = (bytes(pos >> 3) >> (7 - (pos & 7))) & 1; pos += 1; b
    }
    def u(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** ue(v) — unsigned Exp-Golomb (§9.1). */
    def ue(): Int = {
      var zeros = 0
      while (bit() == 0) {
        zeros += 1
        require(zeros < 32, "exp-golomb run too long")
      }
      if (zeros == 0) 0 else (1 << zeros) - 1 + u(zeros)
    }
    /** se(v) — signed Exp-Golomb (§9.1.1). */
    def se(): Int = {
      val k = ue(); if (k % 2 == 0) -(k / 2) else (k + 1) / 2
    }
    def byteAlign(): Unit = while ((pos & 7) != 0) pos += 1
    def u8(): Int = { val v = bytes(pos >> 3) & 0xff; pos += 8; v }
    def remainingBits: Int = bytes.length * 8 - pos
  }

  // =====================================================================
  // CAVLC code tables, transcribed from the spec and validated by
  // H264CavlcSpec (prefix-freeness, completeness counts, a published
  // worked vector, and a closed-loop independent-encoder round trip).
  // Entries are "bitpattern" -> payload; patterns keep the transcription
  // reviewable against the printed tables.
  // =====================================================================

  /** One VLC: map (codeLen, codeValue) -> payload. */
  final class Vlc[A](entries: Seq[(String, A)]) {
    val byCode: Map[(Int, Int), A] =
      entries.map { case (p, a) =>
        (p.length, Integer.parseInt(p, 2)) -> a
      }.toMap
    val maxLen: Int = entries.map(_._1.length).max
    val patterns: Seq[String] = entries.map(_._1)
    def read(r: BitReader): A = {
      var len = 0; var v = 0
      while (len < maxLen) {
        v = (v << 1) | r.bit(); len += 1
        byCode.get((len, v)) match {
          case Some(a) => return a
          case None =>
        }
      }
      throw new IllegalArgumentException("invalid VLC code")
    }
  }

  /** Table 9-5, coeff_token → (TotalCoeff, TrailingOnes), 0 <= nC < 2. */
  val coeffTokenNc0: Vlc[(Int, Int)] = new Vlc(Seq(
    "1" -> (0, 0),
    "000101" -> (1, 0), "01" -> (1, 1),
    "00000111" -> (2, 0), "000100" -> (2, 1), "001" -> (2, 2),
    "000000111" -> (3, 0), "00000110" -> (3, 1), "0000101" -> (3, 2),
    "00011" -> (3, 3),
    "0000000111" -> (4, 0), "000000110" -> (4, 1), "00000101" -> (4, 2),
    "000011" -> (4, 3),
    "00000000111" -> (5, 0), "0000000110" -> (5, 1), "000000101" -> (5, 2),
    "0000100" -> (5, 3),
    "0000000001111" -> (6, 0), "00000000110" -> (6, 1),
    "0000000101" -> (6, 2), "00000100" -> (6, 3),
    "0000000001011" -> (7, 0), "0000000001110" -> (7, 1),
    "00000000101" -> (7, 2), "000000100" -> (7, 3),
    "0000000001000" -> (8, 0), "0000000001010" -> (8, 1),
    "0000000001101" -> (8, 2), "0000000100" -> (8, 3),
    "00000000001111" -> (9, 0), "00000000001110" -> (9, 1),
    "0000000001001" -> (9, 2), "00000000100" -> (9, 3),
    "00000000001011" -> (10, 0), "00000000001010" -> (10, 1),
    "00000000001101" -> (10, 2), "0000000001100" -> (10, 3),
    "000000000001111" -> (11, 0), "000000000001110" -> (11, 1),
    "00000000001001" -> (11, 2), "00000000001100" -> (11, 3),
    "000000000001011" -> (12, 0), "000000000001010" -> (12, 1),
    "000000000001101" -> (12, 2), "00000000001000" -> (12, 3),
    "0000000000001111" -> (13, 0), "000000000000001" -> (13, 1),
    "000000000001001" -> (13, 2), "000000000001100" -> (13, 3),
    "0000000000001011" -> (14, 0), "0000000000001110" -> (14, 1),
    "0000000000001101" -> (14, 2), "000000000001000" -> (14, 3),
    "0000000000000111" -> (15, 0), "0000000000001010" -> (15, 1),
    "0000000000001001" -> (15, 2), "0000000000001100" -> (15, 3),
    "0000000000000100" -> (16, 0), "0000000000000110" -> (16, 1),
    "0000000000000101" -> (16, 2), "0000000000001000" -> (16, 3)))

  /** Table 9-5, 2 <= nC < 4. */
  val coeffTokenNc2: Vlc[(Int, Int)] = new Vlc(Seq(
    "11" -> (0, 0),
    "001011" -> (1, 0), "10" -> (1, 1),
    "000111" -> (2, 0), "00111" -> (2, 1), "011" -> (2, 2),
    "0000111" -> (3, 0), "001010" -> (3, 1), "001001" -> (3, 2),
    "0101" -> (3, 3),
    "00000111" -> (4, 0), "000110" -> (4, 1), "000101" -> (4, 2),
    "0100" -> (4, 3),
    "00000100" -> (5, 0), "0000110" -> (5, 1), "0000101" -> (5, 2),
    "00110" -> (5, 3),
    "000000111" -> (6, 0), "00000110" -> (6, 1), "00000101" -> (6, 2),
    "001000" -> (6, 3),
    "00000001111" -> (7, 0), "000000110" -> (7, 1), "000000101" -> (7, 2),
    "000100" -> (7, 3),
    "00000001011" -> (8, 0), "00000001110" -> (8, 1),
    "00000001101" -> (8, 2), "0000100" -> (8, 3),
    "000000001111" -> (9, 0), "00000001010" -> (9, 1),
    "00000001001" -> (9, 2), "000000100" -> (9, 3),
    "000000001011" -> (10, 0), "000000001110" -> (10, 1),
    "000000001101" -> (10, 2), "00000001100" -> (10, 3),
    "000000001000" -> (11, 0), "000000001010" -> (11, 1),
    "000000001001" -> (11, 2), "00000001000" -> (11, 3),
    "0000000001111" -> (12, 0), "0000000001110" -> (12, 1),
    "0000000001101" -> (12, 2), "000000001100" -> (12, 3),
    "0000000001011" -> (13, 0), "0000000001010" -> (13, 1),
    "0000000001001" -> (13, 2), "0000000001100" -> (13, 3),
    "0000000000111" -> (14, 0), "00000000001011" -> (14, 1),
    "0000000000110" -> (14, 2), "0000000001000" -> (14, 3),
    "00000000001001" -> (15, 0), "00000000001000" -> (15, 1),
    "00000000001010" -> (15, 2), "0000000000001" -> (15, 3),
    "00000000000111" -> (16, 0), "00000000000110" -> (16, 1),
    "00000000000101" -> (16, 2), "00000000000100" -> (16, 3)))

  /** Table 9-5, 4 <= nC < 8. */
  val coeffTokenNc4: Vlc[(Int, Int)] = new Vlc(Seq(
    "1111" -> (0, 0),
    "001111" -> (1, 0), "1110" -> (1, 1),
    "001011" -> (2, 0), "01111" -> (2, 1), "1101" -> (2, 2),
    "001000" -> (3, 0), "01100" -> (3, 1), "01110" -> (3, 2),
    "1100" -> (3, 3),
    "0001111" -> (4, 0), "01010" -> (4, 1), "01011" -> (4, 2),
    "1011" -> (4, 3),
    "0001011" -> (5, 0), "01000" -> (5, 1), "01001" -> (5, 2),
    "1010" -> (5, 3),
    "0001001" -> (6, 0), "001110" -> (6, 1), "001101" -> (6, 2),
    "1001" -> (6, 3),
    "0001000" -> (7, 0), "001010" -> (7, 1), "001001" -> (7, 2),
    "1000" -> (7, 3),
    "00001111" -> (8, 0), "0001110" -> (8, 1), "0001101" -> (8, 2),
    "01101" -> (8, 3),
    "00001011" -> (9, 0), "00001110" -> (9, 1), "0001010" -> (9, 2),
    "001100" -> (9, 3),
    "000001111" -> (10, 0), "00001010" -> (10, 1), "00001101" -> (10, 2),
    "0001100" -> (10, 3),
    "000001011" -> (11, 0), "000001110" -> (11, 1),
    "00001001" -> (11, 2), "00001100" -> (11, 3),
    "000001000" -> (12, 0), "000001010" -> (12, 1),
    "000001101" -> (12, 2), "00001000" -> (12, 3),
    "0000001101" -> (13, 0), "000000111" -> (13, 1),
    "000001001" -> (13, 2), "000001100" -> (13, 3),
    "0000001001" -> (14, 0), "0000001100" -> (14, 1),
    "0000001011" -> (14, 2), "0000001010" -> (14, 3),
    "0000000101" -> (15, 0), "0000001000" -> (15, 1),
    "0000000111" -> (15, 2), "0000000110" -> (15, 3),
    "0000000001" -> (16, 0), "0000000100" -> (16, 1),
    "0000000011" -> (16, 2), "0000000010" -> (16, 3)))

  /** Table 9-5, nC == -1 (chroma DC, 4:2:0). */
  val coeffTokenChromaDc: Vlc[(Int, Int)] = new Vlc(Seq(
    "01" -> (0, 0),
    "000111" -> (1, 0), "1" -> (1, 1),
    "000100" -> (2, 0), "000110" -> (2, 1), "001" -> (2, 2),
    "000011" -> (3, 0), "0000011" -> (3, 1), "0000010" -> (3, 2),
    "000101" -> (3, 3),
    "000010" -> (4, 0), "00000011" -> (4, 1), "00000010" -> (4, 2),
    "0000000" -> (4, 3)))

  /** nC >= 8: 6-bit FLC, code = 4*(TotalCoeff-1) + TrailingOnes, except
    * (0,0) = 3 (§9.2.1 / Table 9-5 rightmost column).
    */
  def readCoeffTokenFlc(r: BitReader): (Int, Int) = {
    val v = r.u(6)
    if (v == 3) (0, 0)
    else {
      val tc = (v >> 2) + 1; val t1 = v & 3
      require(tc <= 16 && t1 <= math.min(tc, 3),
        s"invalid FLC coeff_token $v")
      (tc, t1)
    }
  }

  /** Tables 9-7/9-8: total_zeros for 4x4 blocks, indexed by
    * TotalCoeff 1..15; each Vlc maps to the total_zeros value.
    */
  val totalZeros4x4: Array[Vlc[Int]] = {
    val rows: Seq[Seq[String]] = Seq(
      Seq("1", "011", "010", "0011", "0010", "00011", "00010", "000011",
        "000010", "0000011", "0000010", "00000011", "00000010",
        "000000011", "000000010", "000000001"), // TC=1
      Seq("111", "110", "101", "100", "011", "0101", "0100", "0011",
        "0010", "00011", "00010", "000011", "000010", "000001",
        "000000"), // TC=2
      Seq("0101", "111", "110", "101", "0100", "0011", "100", "011",
        "0010", "00011", "00010", "000001", "00001", "000000"), // TC=3
      Seq("00011", "111", "0101", "0100", "110", "101", "100", "0011",
        "011", "0010", "00010", "00001", "00000"), // TC=4
      Seq("0101", "0100", "0011", "111", "110", "101", "100", "011",
        "0010", "00001", "0001", "00000"), // TC=5
      Seq("000001", "00001", "111", "110", "101", "100", "011", "010",
        "0001", "001", "000000"), // TC=6
      Seq("000001", "00001", "101", "100", "011", "11", "010", "0001",
        "001", "000000"), // TC=7
      Seq("000001", "0001", "00001", "011", "11", "10", "010", "001",
        "000000"), // TC=8
      Seq("000001", "000000", "0001", "11", "10", "001", "01",
        "00001"), // TC=9
      Seq("00001", "00000", "001", "11", "10", "01", "0001"), // TC=10
      Seq("0000", "0001", "001", "010", "1", "011"), // TC=11
      Seq("0000", "0001", "01", "1", "001"), // TC=12
      Seq("000", "001", "1", "01"), // TC=13
      Seq("00", "01", "1"), // TC=14
      Seq("0", "1")) // TC=15
    rows.map(r => new Vlc[Int](r.zipWithIndex)).toArray
  }

  /** Table 9-9(a): total_zeros for chroma DC (maxNumCoeff 4, 4:2:0). */
  val totalZerosChromaDc: Array[Vlc[Int]] = Array(
    new Vlc(Seq("1" -> 0, "01" -> 1, "001" -> 2, "000" -> 3)), // TC=1
    new Vlc(Seq("1" -> 0, "01" -> 1, "00" -> 2)), // TC=2
    new Vlc(Seq("1" -> 0, "0" -> 1))) // TC=3

  /** Table 9-10: run_before, indexed by min(zerosLeft, 7) - 1. */
  val runBefore: Array[Vlc[Int]] = {
    val rows: Seq[Seq[(String, Int)]] = Seq(
      Seq("1" -> 0, "0" -> 1),
      Seq("1" -> 0, "01" -> 1, "00" -> 2),
      Seq("11" -> 0, "10" -> 1, "01" -> 2, "00" -> 3),
      Seq("11" -> 0, "10" -> 1, "01" -> 2, "001" -> 3, "000" -> 4),
      Seq("11" -> 0, "10" -> 1, "011" -> 2, "010" -> 3, "001" -> 4,
        "000" -> 5),
      Seq("11" -> 0, "000" -> 1, "001" -> 2, "011" -> 3, "010" -> 4,
        "101" -> 5, "100" -> 6),
      // zerosLeft > 6: run 0..6 are 3-bit codes 111..001; run >= 7 is
      // (run - 4) zeros then a 1 (max run 14 inside a 4x4 block)
      Seq("111" -> 0, "110" -> 1, "101" -> 2, "100" -> 3, "011" -> 4,
        "010" -> 5, "001" -> 6, "0001" -> 7, "00001" -> 8,
        "000001" -> 9, "0000001" -> 10, "00000001" -> 11,
        "000000001" -> 12, "0000000001" -> 13, "00000000001" -> 14))
    rows.map(new Vlc[Int](_)).toArray
  }

  /** §7.4.5: coded_block_pattern me(v) mapping for Intra_4x4 /
    * Intra_8x8 macroblocks (codeNum -> cbp), Table 9-4 column 0.
    */
  val cbpIntraMap: Array[Int] = Array(
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)

  /** 4x4 zig-zag scan: scan position -> raster index (§8.5.6). */
  val zigzag4x4: Array[Int] =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** Dequant scale V (Table in §8.5.9): per QP%6, the three distinct
    * positions (v0 for (0,0),(0,2),(2,0),(2,2); v1 for odd-odd; v2 rest).
    */
  val dequantV: Array[Array[Int]] = Array(
    Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
    Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))

  def vForPos(qpMod6: Int, rasterIdx: Int): Int = {
    val r = rasterIdx >> 2; val c = rasterIdx & 3
    val sel =
      if ((r % 2 == 0) && (c % 2 == 0)) 0
      else if ((r % 2 == 1) && (c % 2 == 1)) 1
      else 2
    dequantV(qpMod6)(sel)
  }

  // =====================================================================
  // Residual block decode (§9.2): returns coefficients in SCAN order
  // (caller applies zig-zag) and the TotalCoeff for nC bookkeeping.
  // =====================================================================

  /** Decode one CAVLC residual block. `nC` selects the coeff_token
    * table (-1 = chroma DC). Returns (coeffLevels in scan order sized
    * maxNumCoeff, totalCoeff).
    */
  def residualBlock(r: BitReader, nC: Int, maxNumCoeff: Int)
      : (Array[Int], Int) = {
    val (totalCoeff, trailingOnes) =
      if (nC == -1) coeffTokenChromaDc.read(r)
      else if (nC < 2) coeffTokenNc0.read(r)
      else if (nC < 4) coeffTokenNc2.read(r)
      else if (nC < 8) coeffTokenNc4.read(r)
      else readCoeffTokenFlc(r)
    val out = new Array[Int](maxNumCoeff)
    if (totalCoeff == 0) return (out, 0)
    require(totalCoeff <= maxNumCoeff, "coeff_token exceeds block size")
    // levels, highest frequency first
    val levels = new Array[Int](totalCoeff)
    var i = 0
    while (i < trailingOnes) {
      levels(i) = if (r.bit() == 1) -1 else 1
      i += 1
    }
    var suffixLength =
      if (totalCoeff > 10 && trailingOnes < 3) 1 else 0
    while (i < totalCoeff) {
      var levelPrefix = 0
      while (r.bit() == 0) {
        levelPrefix += 1
        require(levelPrefix <= 31, "level_prefix too long")
      }
      val levelSuffixSize =
        if (levelPrefix == 14 && suffixLength == 0) 4
        else if (levelPrefix >= 15) levelPrefix - 3
        else suffixLength
      val levelSuffix = if (levelSuffixSize > 0) r.u(levelSuffixSize) else 0
      var levelCode = (math.min(15, levelPrefix) << suffixLength) + levelSuffix
      if (levelPrefix >= 15 && suffixLength == 0) levelCode += 15
      if (levelPrefix >= 16) levelCode += (1 << (levelPrefix - 3)) - 4096
      if (i == trailingOnes && trailingOnes < 3) levelCode += 2
      levels(i) =
        if (levelCode % 2 == 0) (levelCode + 2) >> 1
        else -((levelCode + 1) >> 1)
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(levels(i)) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }
    // total_zeros
    var zerosLeft =
      if (totalCoeff == maxNumCoeff) 0
      else if (nC == -1) totalZerosChromaDc(totalCoeff - 1).read(r)
      else totalZeros4x4(totalCoeff - 1).read(r)
    // runs, highest frequency first
    var scanPos = totalCoeff - 1 + zerosLeft // position of the last coeff
    i = 0
    while (i < totalCoeff) {
      val run =
        if (i == totalCoeff - 1) zerosLeft // last (lowest-freq) coeff
        else if (zerosLeft > 0) runBefore(math.min(zerosLeft, 7) - 1).read(r)
        else 0
      require(run <= zerosLeft, "run_before exceeds zeros left")
      out(scanPos) = levels(i)
      scanPos -= run + 1
      zerosLeft -= run
      i += 1
    }
    (out, totalCoeff)
  }

  // =====================================================================
  // Inverse transforms (§8.5.12, §8.5.10, §8.5.8)
  // =====================================================================

  /** In-place 4x4 inverse core transform + (x+32)>>6 rounding; input
    * raster-order dequantized coefficients, output residual.
    */
  def inverseTransform4x4(d: Array[Int]): Unit = {
    val e = new Array[Int](16)
    var i = 0
    while (i < 4) { // rows
      val d0 = d(i * 4); val d1 = d(i * 4 + 1)
      val d2 = d(i * 4 + 2); val d3 = d(i * 4 + 3)
      val e0 = d0 + d2; val e1 = d0 - d2
      val e2 = (d1 >> 1) - d3; val e3 = d1 + (d3 >> 1)
      e(i * 4) = e0 + e3; e(i * 4 + 1) = e1 + e2
      e(i * 4 + 2) = e1 - e2; e(i * 4 + 3) = e0 - e3
      i += 1
    }
    i = 0
    while (i < 4) { // columns
      val d0 = e(i); val d1 = e(4 + i); val d2 = e(8 + i); val d3 = e(12 + i)
      val e0 = d0 + d2; val e1 = d0 - d2
      val e2 = (d1 >> 1) - d3; val e3 = d1 + (d3 >> 1)
      d(i) = (e0 + e3 + 32) >> 6; d(4 + i) = (e1 + e2 + 32) >> 6
      d(8 + i) = (e1 - e2 + 32) >> 6; d(12 + i) = (e0 - e3 + 32) >> 6
      i += 1
    }
  }

  /** In-place 4x4 inverse Hadamard (luma DC of I_16x16, §8.5.10) —
    * butterflies without the >>1 terms, no rounding (scaling after).
    */
  def inverseHadamard4x4(d: Array[Int]): Unit = {
    val e = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val d0 = d(i * 4); val d1 = d(i * 4 + 1)
      val d2 = d(i * 4 + 2); val d3 = d(i * 4 + 3)
      val e0 = d0 + d2; val e1 = d0 - d2; val e2 = d1 - d3; val e3 = d1 + d3
      e(i * 4) = e0 + e3; e(i * 4 + 1) = e1 + e2
      e(i * 4 + 2) = e1 - e2; e(i * 4 + 3) = e0 - e3
      i += 1
    }
    i = 0
    while (i < 4) {
      val d0 = e(i); val d1 = e(4 + i); val d2 = e(8 + i); val d3 = e(12 + i)
      val e0 = d0 + d2; val e1 = d0 - d2; val e2 = d1 - d3; val e3 = d1 + d3
      d(i) = e0 + e3; d(4 + i) = e1 + e2
      d(8 + i) = e1 - e2; d(12 + i) = e0 - e3
      i += 1
    }
  }

  /** Luma DC scaling after the inverse Hadamard (§8.5.10, 8-bit). */
  def scaleLumaDc(f: Int, qp: Int): Int = {
    val v = dequantV(qp % 6)(0)
    if (qp >= 36) (f * v) << (qp / 6 - 6)
    else (f * v + (1 << (5 - qp / 6))) >> (6 - qp / 6)
  }

  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // =====================================================================
  // Slice decoder
  // =====================================================================

  /** Decodes the macroblock layer of a single-slice all-intra CAVLC
    * picture. The caller parses the slice header, then calls
    * [[decodeMb]] per macroblock in raster order (I_PCM luma is read by
    * the caller and handed in via [[setPcm]]). Luma plane in [[plane]].
    */
  final class SliceDecoder(widthMbs: Int, heightMbs: Int, sliceQp: Int) {
    val planeW: Int = widthMbs * 16
    val planeH: Int = heightMbs * 16
    /** Reconstructed luma, raster order, values 0..255. */
    val plane: Array[Int] = new Array[Int](planeW * planeH)
    // per-4x4-block state grids (luma: 4 blocks/row per MB)
    private val bW = widthMbs * 4
    private val bH = heightMbs * 4
    /** -1 = not yet decoded; else TotalCoeff of the block (16 for PCM). */
    private val lumaNz = Array.fill(bW * bH)(-1)
    /** Intra4x4 pred mode per block; -1 if the MB was not I_4x4 (DC=2
      * substitute used for prediction-mode inference per §8.3.1.1).
      */
    private val lumaMode = Array.fill(bW * bH)(-1)
    // chroma nz grids (2 blocks/row per MB, per component)
    private val cW = widthMbs * 2
    private val cH = heightMbs * 2
    private val chromaNz = Array(Array.fill(cW * cH)(-1), Array.fill(cW * cH)(-1))
    private var qp = sliceQp
    /** Per-MB QPY as the deblocking filter sees it (§8.7.2: I_PCM = 0). */
    val mbQp: Array[Int] = new Array[Int](widthMbs * heightMbs)

    private def mbX(m: Int) = m % widthMbs
    private def mbY(m: Int) = m / widthMbs

    /** nC for a luma 4x4 block at block coords (bx, by) (§9.2.1). */
    private def lumaNc(bx: Int, by: Int): Int = {
      val nA = if (bx > 0) lumaNz((by) * bW + bx - 1) else -1
      val nB = if (by > 0) lumaNz((by - 1) * bW + bx) else -1
      if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
      else if (nA >= 0) nA
      else if (nB >= 0) nB
      else 0
    }

    private def chromaNc(c: Int, bx: Int, by: Int): Int = {
      val g = chromaNz(c)
      val nA = if (bx > 0) g(by * cW + bx - 1) else -1
      val nB = if (by > 0) g((by - 1) * cW + bx) else -1
      if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
      else if (nA >= 0) nA
      else if (nB >= 0) nB
      else 0
    }

    /** Record an I_PCM macroblock: luma samples (256, raster in MB) into
      * the plane; all nz counters become 16 (§9.2.1: nC of I_PCM
      * neighbors counts as 16).
      */
    def setPcm(m: Int, luma: Array[Int]): Unit = {
      val x0 = mbX(m) * 16; val y0 = mbY(m) * 16
      var i = 0
      while (i < 256) {
        plane((y0 + i / 16) * planeW + x0 + i % 16) = luma(i)
        i += 1
      }
      // §7.4.5 / §8.7.2: an I_PCM macroblock's QPY IS 0 — both for the
      // deblocking thresholds and as QPY,prev for the NEXT macroblock's
      // mb_qp_delta (a conformant encoder emits that delta relative to
      // 0, so failing to reset the running qp would dequantize every MB
      // after a PCM one at the wrong QP)
      qp = 0
      mbQp(m) = 0
      markMb(m, 16, -1)
    }

    private def markMb(m: Int, nz: Int, mode4x4: Int): Unit = {
      val bx0 = mbX(m) * 4; val by0 = mbY(m) * 4
      var by = 0
      while (by < 4) {
        var bx = 0
        while (bx < 4) {
          lumaNz((by0 + by) * bW + bx0 + bx) = nz
          lumaMode((by0 + by) * bW + bx0 + bx) = mode4x4
          bx += 1
        }
        by += 1
      }
      val cx0 = mbX(m) * 2; val cy0 = mbY(m) * 2
      var c = 0
      while (c < 2) {
        chromaNz(c)(cy0 * cW + cx0) = nz
        chromaNz(c)(cy0 * cW + cx0 + 1) = nz
        chromaNz(c)((cy0 + 1) * cW + cx0) = nz
        chromaNz(c)((cy0 + 1) * cW + cx0 + 1) = nz
        c += 1
      }
    }

    /** blkIdx (0..15, §6.4.3 luma ordering) -> (xO, yO) in MB. */
    private def blkOffset(blkIdx: Int): (Int, Int) = {
      val xO = ((blkIdx >> 2) & 1) * 8 + (blkIdx & 1) * 4
      val yO = ((blkIdx >> 3) & 1) * 8 + ((blkIdx >> 1) & 1) * 4
      (xO, yO)
    }

    /** Decode one coded macroblock (mbType 0..24 — NOT I_PCM, the caller
      * handles 25). Returns false on any unsupported shape.
      */
    def decodeMb(r: BitReader, m: Int, mbType: Int): Boolean = {
      if (mbType > 24) return false
      val ok =
        if (mbType == 0) decodeI4x4Mb(r, m)
        else decodeI16x16Mb(r, m, mbType)
      if (ok) mbQp(m) = qp // running QPY after this MB's mb_qp_delta
      ok
    }

    // ---- I_4x4 ----

    private def decodeI4x4Mb(r: BitReader, m: Int): Boolean = {
      val bx0 = mbX(m) * 4; val by0 = mbY(m) * 4
      // pred modes, in blkIdx order (§8.3.1.1: predictor = min of left
      // and above block modes; unavailable or non-4x4 neighbor -> DC(2))
      val modes = new Array[Int](16)
      var blk = 0
      while (blk < 16) {
        val (xO, yO) = blkOffset(blk)
        val bx = bx0 + xO / 4; val by = by0 + yO / 4
        val mA =
          if (bx == 0) -1
          else if (lumaNz(by * bW + bx - 1) < 0) -1 // not decoded
          else { val mm = lumaMode(by * bW + bx - 1); if (mm < 0) 2 else mm }
        val mB =
          if (by == 0) -1
          else if (lumaNz((by - 1) * bW + bx) < 0) -1
          else { val mm = lumaMode((by - 1) * bW + bx); if (mm < 0) 2 else mm }
        val predMode =
          if (mA < 0 || mB < 0) 2 else math.min(mA, mB)
        val mode =
          if (r.bit() == 1) predMode
          else { val rem = r.u(3); if (rem < predMode) rem else rem + 1 }
        modes(blk) = mode
        // record the mode immediately: later blocks in this MB predict
        // their modes from it
        lumaMode(by * bW + bx) = mode
        lumaNz(by * bW + bx) = 0 // placeholder; set after residual parse
        blk += 1
      }
      r.ue() // intra_chroma_pred_mode (chroma never reconstructed)
      val cbpCode = r.ue()
      if (cbpCode >= 48) return false
      val cbp = cbpIntraMap(cbpCode)
      val cbpLuma = cbp & 15; val cbpChroma = cbp >> 4
      if (cbp != 0) qp = (qp + r.se() + 52) % 52
      // residuals: luma 4x4 blocks
      val coeffs = Array.ofDim[Int](16, 16)
      blk = 0
      while (blk < 16) {
        val (xO, yO) = blkOffset(blk)
        val bx = bx0 + xO / 4; val by = by0 + yO / 4
        if ((cbpLuma & (1 << (blk >> 2))) != 0) {
          val (scan, nz) = residualBlock(r, lumaNc(bx, by), 16)
          lumaNz(by * bW + bx) = nz
          var i = 0
          while (i < 16) { coeffs(blk)(zigzag4x4(i)) = scan(i); i += 1 }
        } else lumaNz(by * bW + bx) = 0
        blk += 1
      }
      if (!parseChroma(r, m, cbpChroma)) return false
      // reconstruct, in blkIdx order
      blk = 0
      while (blk < 16) {
        val (xO, yO) = blkOffset(blk)
        reconstruct4x4(m, xO, yO, modes(blk), coeffs(blk))
        blk += 1
      }
      true
    }

    /** Predict + dequant + itransform + clip one 4x4 luma block. */
    private def reconstruct4x4(m: Int, xO: Int, yO: Int, mode: Int,
                               coeff: Array[Int]): Unit = {
      val x0 = mbX(m) * 16 + xO; val y0 = mbY(m) * 16 + yO
      val pred = predict4x4(x0, y0, mode)
      // dequant (§8.5.12.2, 8-bit flat): d = c * V << (qp/6)
      val d = new Array[Int](16)
      var i = 0
      var any = false
      while (i < 16) {
        if (coeff(i) != 0) {
          d(i) = (coeff(i) * vForPos(qp % 6, i)) << (qp / 6); any = true
        }
        i += 1
      }
      if (any) inverseTransform4x4(d)
      i = 0
      while (i < 16) {
        val x = x0 + (i & 3); val y = y0 + (i >> 2)
        plane(y * planeW + x) = clip255(pred(i) + d(i))
        i += 1
      }
    }

    /** §8.3.1.2 Intra_4x4 sample prediction; neighbor availability =
      * inside picture AND already reconstructed (single-slice all-I).
      */
    private def predict4x4(x0: Int, y0: Int, mode: Int): Array[Int] = {
      val bx = x0 / 4; val by = y0 / 4
      def decoded(bxx: Int, byy: Int): Boolean =
        bxx >= 0 && byy >= 0 && bxx < bW && byy < bH &&
          lumaNz(byy * bW + bxx) >= 0
      // left column: within current MB, earlier blkIdx of the SAME MB
      // are reconstructed before this call (reconstruction follows
      // residual parse in blkIdx order) — the lumaNz placeholder set
      // during mode parse would claim them decoded early, so gate left
      // and top on geometric decode order instead:
      def before(bxx: Int, byy: Int): Boolean = {
        if (!decoded(bxx, byy)) return false
        val mOther = (byy / 4) * widthMbs + (bxx / 4)
        val mThis = (by / 4) * widthMbs + (bx / 4)
        if (mOther != mThis) true
        else {
          // same MB: compare blkIdx decode order
          def idx(bxx: Int, byy: Int): Int = {
            val xO = (bxx % 4) * 4; val yO = (byy % 4) * 4
            ((yO >> 3) << 3) | ((xO >> 3) << 2) | (((yO >> 2) & 1) << 1) |
              ((xO >> 2) & 1)
          }
          idx(bxx, byy) < idx(bx, by)
        }
      }
      val leftAvail = before(bx - 1, by)
      val topAvail = before(bx, by - 1)
      val topLeftAvail = before(bx - 1, by - 1)
      val topRightAvail = before(bx + 1, by - 1)
      val p = plane
      def L(y: Int): Int = p((y0 + y) * planeW + x0 - 1)
      def T(x: Int): Int = p((y0 - 1) * planeW + x0 + x)
      def TL: Int = p((y0 - 1) * planeW + x0 - 1)
      // top-right substitution (§8.3.1.2): unavailable x=4..7 -> T(3)
      def TR(x: Int): Int =
        if (x < 4) T(x) else if (topRightAvail) T(x) else T(3)
      val out = new Array[Int](16)
      def fill(f: (Int, Int) => Int): Unit = {
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) { out(y * 4 + x) = f(x, y); x += 1 }
          y += 1
        }
      }
      mode match {
        case 0 => // Vertical
          require(topAvail, "V pred without top"); fill((x, _) => T(x))
        case 1 => // Horizontal
          require(leftAvail, "H pred without left"); fill((_, y) => L(y))
        case 2 => // DC
          val dc =
            if (topAvail && leftAvail)
              (T(0) + T(1) + T(2) + T(3) + L(0) + L(1) + L(2) + L(3) + 4) >> 3
            else if (topAvail) (T(0) + T(1) + T(2) + T(3) + 2) >> 2
            else if (leftAvail) (L(0) + L(1) + L(2) + L(3) + 2) >> 2
            else 128
          fill((_, _) => dc)
        case 3 => // Diagonal down-left
          require(topAvail, "DDL pred without top")
          fill { (x, y) =>
            if (x == 3 && y == 3) (TR(6) + 3 * TR(7) + 2) >> 2
            else (TR(x + y) + 2 * TR(x + y + 1) + TR(x + y + 2) + 2) >> 2
          }
        case 4 => // Diagonal down-right
          require(topAvail && leftAvail && topLeftAvail, "DDR pred")
          fill { (x, y) =>
            if (x > y) (T(x - y - 2) + 2 * T(x - y - 1) + T(x - y) + 2) >> 2
            else if (x < y) (L(y - x - 2) + 2 * L(y - x - 1) + L(y - x) + 2) >> 2
            else (T(0) + 2 * TL + L(0) + 2) >> 2
          }
        case 5 => // Vertical-right
          require(topAvail && leftAvail && topLeftAvail, "VR pred")
          fill { (x, y) =>
            val z = 2 * x - y
            if (z >= 0 && z % 2 == 0) {
              val i = x - (y >> 1)
              ((if (i == 0) TL else T(i - 1)) + T(i) + 1) >> 1
            } else if (z >= 0) {
              val i = x - (y >> 1)
              ((if (i == 1) TL else T(i - 2)) + 2 * T(i - 1) + T(i) + 2) >> 2
            } else if (z == -1) (L(0) + 2 * TL + T(0) + 2) >> 2
            else (L(y - 1) + 2 * L(y - 2) + L(y - 3) + 2) >> 2
          }
        case 6 => // Horizontal-down
          require(topAvail && leftAvail && topLeftAvail, "HD pred")
          fill { (x, y) =>
            val z = 2 * y - x
            if (z >= 0 && z % 2 == 0) {
              val i = y - (x >> 1)
              ((if (i == 0) TL else L(i - 1)) + L(i) + 1) >> 1
            } else if (z >= 0) {
              val i = y - (x >> 1)
              ((if (i == 1) TL else L(i - 2)) + 2 * L(i - 1) + L(i) + 2) >> 2
            } else if (z == -1) (T(0) + 2 * TL + L(0) + 2) >> 2
            else (T(x - 1) + 2 * T(x - 2) + T(x - 3) + 2) >> 2
          }
        case 7 => // Vertical-left
          require(topAvail, "VL pred without top")
          fill { (x, y) =>
            val i = x + (y >> 1)
            if (y % 2 == 0) (TR(i) + TR(i + 1) + 1) >> 1
            else (TR(i) + 2 * TR(i + 1) + TR(i + 2) + 2) >> 2
          }
        case 8 => // Horizontal-up
          require(leftAvail, "HU pred without left")
          fill { (x, y) =>
            val z = x + 2 * y
            if (z > 5) L(3)
            else if (z == 5) (L(2) + 3 * L(3) + 2) >> 2
            else {
              val i = y + (x >> 1)
              if (z % 2 == 0) (L(i) + L(i + 1) + 1) >> 1
              else (L(i) + 2 * L(i + 1) + L(i + 2) + 2) >> 2
            }
          }
        case _ => throw new IllegalArgumentException(s"bad 4x4 mode $mode")
      }
      out
    }

    // ---- I_16x16 ----

    private def decodeI16x16Mb(r: BitReader, m: Int, mbType: Int): Boolean = {
      val predMode = (mbType - 1) % 4
      val cbpChroma = ((mbType - 1) / 4) % 3
      val cbpLuma = if ((mbType - 1) / 12 == 1) 15 else 0
      r.ue() // intra_chroma_pred_mode
      qp = (qp + r.se() + 52) % 52 // mb_qp_delta, always present
      val bx0 = mbX(m) * 4; val by0 = mbY(m) * 4
      // DC block: nC of blkIdx 0 (§9.2.1)
      val (dcScan, _) = residualBlock(r, lumaNc(bx0, by0), 16)
      val dc = new Array[Int](16)
      var i = 0
      while (i < 16) { dc(zigzag4x4(i)) = dcScan(i); i += 1 }
      inverseHadamard4x4(dc)
      i = 0
      while (i < 16) { dc(i) = scaleLumaDc(dc(i), qp); i += 1 }
      // AC blocks
      val coeffs = Array.ofDim[Int](16, 16)
      var blk = 0
      while (blk < 16) {
        val (xO, yO) = blkOffset(blk)
        val bx = bx0 + xO / 4; val by = by0 + yO / 4
        if (cbpLuma != 0) {
          val (scan, nz) = residualBlock(r, lumaNc(bx, by), 15)
          lumaNz(by * bW + bx) = nz
          var k = 0
          while (k < 15) { coeffs(blk)(zigzag4x4(k + 1)) = scan(k); k += 1 }
        } else lumaNz(by * bW + bx) = 0
        blk += 1
      }
      if (!parseChroma(r, m, cbpChroma)) return false
      // prediction over the whole MB, then per-4x4 add
      val x0 = mbX(m) * 16; val y0 = mbY(m) * 16
      val pred = predict16x16(m, predMode)
      blk = 0
      while (blk < 16) {
        val (xO, yO) = blkOffset(blk)
        val d = coeffs(blk)
        var k = 0
        while (k < 16) {
          if (d(k) != 0) d(k) = (d(k) * vForPos(qp % 6, k)) << (qp / 6)
          k += 1
        }
        // DC for this 4x4: dc grid position (yO/4, xO/4)
        d(0) = dc((yO / 4) * 4 + xO / 4)
        inverseTransform4x4(d)
        k = 0
        while (k < 16) {
          val x = x0 + xO + (k & 3); val y = y0 + yO + (k >> 2)
          plane(y * planeW + x) =
            clip255(pred((yO + (k >> 2)) * 16 + xO + (k & 3)) + d(k))
          k += 1
        }
        blk += 1
      }
      // 4x4 pred-mode grid: not an I_4x4 MB
      val byy0 = by0
      var by = 0
      while (by < 4) {
        var bx = 0
        while (bx < 4) { lumaMode((byy0 + by) * bW + bx0 + bx) = -1; bx += 1 }
        by += 1
      }
      true
    }

    /** §8.3.3 Intra_16x16 prediction (V, H, DC, Plane). */
    private def predict16x16(m: Int, mode: Int): Array[Int] = {
      val x0 = mbX(m) * 16; val y0 = mbY(m) * 16
      val leftAvail = x0 > 0
      val topAvail = y0 > 0
      val p = plane
      def L(y: Int): Int = p((y0 + y) * planeW + x0 - 1)
      def T(x: Int): Int = p((y0 - 1) * planeW + x0 + x)
      def TL: Int = p((y0 - 1) * planeW + x0 - 1)
      val out = new Array[Int](256)
      mode match {
        case 0 =>
          require(topAvail, "16x16 V pred without top")
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) { out(y * 16 + x) = T(x); x += 1 }
            y += 1
          }
        case 1 =>
          require(leftAvail, "16x16 H pred without left")
          var y = 0
          while (y < 16) {
            val v = L(y); var x = 0
            while (x < 16) { out(y * 16 + x) = v; x += 1 }
            y += 1
          }
        case 2 =>
          var sum = 0; var n = 0
          if (topAvail) { var x = 0; while (x < 16) { sum += T(x); x += 1 }; n += 16 }
          if (leftAvail) { var y = 0; while (y < 16) { sum += L(y); y += 1 }; n += 16 }
          val dc =
            if (n == 32) (sum + 16) >> 5
            else if (n == 16) (sum + 8) >> 4
            else 128
          java.util.Arrays.fill(out, dc)
        case 3 =>
          require(topAvail && leftAvail, "16x16 plane pred")
          var h = 0; var v = 0
          var i = 0
          while (i < 8) {
            h += (i + 1) * (T(8 + i) - (if (6 - i >= 0) T(6 - i) else TL))
            v += (i + 1) * (L(8 + i) - (if (6 - i >= 0) L(6 - i) else TL))
            i += 1
          }
          val a = 16 * (L(15) + T(15))
          val b = (5 * h + 32) >> 6
          val c = (5 * v + 32) >> 6
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) {
              out(y * 16 + x) = clip255((a + b * (x - 7) + c * (y - 7) + 16) >> 5)
              x += 1
            }
            y += 1
          }
        case _ => throw new IllegalArgumentException(s"bad 16x16 mode $mode")
      }
      out
    }

    // ---- chroma (parse only — grayscale output) ----

    /** Parse chroma residual to keep the bitstream in sync (§7.3.5.3.2,
      * 4:2:0): DC 2x2 per component when cbpChroma >= 1, AC 4x4 per
      * component when cbpChroma == 2. Reconstruction skipped.
      */
    private def parseChroma(r: BitReader, m: Int, cbpChroma: Int): Boolean = {
      val cx0 = mbX(m) * 2; val cy0 = mbY(m) * 2
      if (cbpChroma >= 1) {
        var c = 0
        while (c < 2) { residualBlock(r, -1, 4); c += 1 }
      }
      if (cbpChroma == 2) {
        var c = 0
        while (c < 2) {
          var blk = 0
          while (blk < 4) {
            val bx = cx0 + (blk & 1); val by = cy0 + (blk >> 1)
            val (_, nz) = residualBlock(r, chromaNc(c, bx, by), 15)
            chromaNz(c)(by * cW + bx) = nz
            blk += 1
          }
          c += 1
        }
      } else {
        var c = 0
        while (c < 2) {
          chromaNz(c)(cy0 * cW + cx0) = 0
          chromaNz(c)(cy0 * cW + cx0 + 1) = 0
          chromaNz(c)((cy0 + 1) * cW + cx0) = 0
          chromaNz(c)((cy0 + 1) * cW + cx0 + 1) = 0
          c += 1
        }
      }
      true
    }
  }
}
