package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JVM audio codecs beyond PCM-16: ITU-T G.711 (µ-law and A-law,
  * the telephony/callcenter corpus format) and IMA/DVI ADPCM (WAV format
  * tag 0x11 — the classic 4-bit speech compression), with RIFF/WAVE
  * wrappers for both directions. The JDK's `javax.sound` decodes PCM and
  * (partially) G.711 but NOT ADPCM, so [[Multimodal.decodeAudio]] chains
  * to [[AudioCodecs.decodeWav]] before falling back to the stub —
  * flipping three real-world audio formats from stub to real decode.
  *
  * Everything here is spec-table arithmetic on shorts — deterministic,
  * partition-local, validated in AudioCodecsSpec by closed-loop
  * encode→decode bounds, published-table spot values, and (for µ-law)
  * bit-exact agreement with the JDK's independent G.711 decoder.
  */
object AudioCodecs {

  /** ITU-T G.711 companding. Encode maps a 16-bit sample to 8 bits
    * (lossy); decode is the exact published expansion.
    */
  object G711 {
    private val Bias = 0x84
    private val Clip = 32635

    /** µ-law compress (G.711 §µ-law, the classic g711.c formulation). */
    def encodeMu(sample: Short): Byte = {
      var s = sample.toInt
      val sign = if (s < 0) { s = -s; 0x80 } else 0
      if (s > Clip) s = Clip
      s += Bias
      var exponent = 7
      var mask = 0x4000
      while (exponent > 0 && (s & mask) == 0) { exponent -= 1; mask >>= 1 }
      val mantissa = (s >> (exponent + 3)) & 0x0F
      (~(sign | (exponent << 4) | mantissa)).toByte
    }

    /** µ-law expand — exact. */
    def decodeMu(b: Byte): Short = {
      val u = (~b) & 0xFF
      val sign = u & 0x80
      val exponent = (u >> 4) & 0x07
      val mantissa = u & 0x0F
      val mag = (((mantissa << 3) + Bias) << exponent) - Bias
      (if (sign != 0) -mag else mag).toShort
    }

    private val ASegEnd =
      Array(0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)

    /** A-law compress (G.711 §A-law, canonical g711.c formulation:
      * 16→13-bit prescale, `−p−1` negative fold, segment search,
      * 0x55/0xD5 toggle).
      */
    def encodeA(sample: Short): Byte = {
      var p = sample >> 3 // 16-bit -> 13-bit
      val mask = if (p >= 0) 0xD5 else { p = -p - 1; 0x55 }
      var seg = 0
      while (seg < 8 && p > ASegEnd(seg)) seg += 1
      val aval =
        if (seg >= 8) 0x7F
        else {
          val man = if (seg < 2) (p >> 1) & 0x0F else (p >> seg) & 0x0F
          (seg << 4) | man
        }
      ((aval ^ mask) & 0xFF).toByte
    }

    /** A-law expand — exact. */
    def decodeA(b: Byte): Short = {
      val u = (b ^ 0x55) & 0xFF
      val sign = u & 0x80
      val exponent = (u >> 4) & 0x07
      val mantissa = u & 0x0F
      val mag =
        if (exponent > 0) ((mantissa << 4) + 0x108) << (exponent - 1)
        else (mantissa << 4) + 8
      (if (sign != 0) mag else -mag).toShort
    }
  }

  /** IMA (DVI) ADPCM: 4 bits per sample, step-size adaptation through the
    * published 89-entry table. Mono WAV block layout (format tag 0x11):
    * 4-byte header (predictor int16 LE = output sample 0, step index
    * uint8, reserved), then 2 samples per byte, LOW nibble first.
    */
  object ImaAdpcm {
    private[operators] val StepTable: Array[Int] = Array(
      7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
      34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
      143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
      494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
      1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
      4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
      11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
      27086, 29794, 32767)
    private[operators] val IndexTable: Array[Int] = Array(
      -1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

    private def clampIdx(i: Int) = math.max(0, math.min(88, i))
    private def clampS(v: Int) = math.max(-32768, math.min(32767, v))

    /** One nibble's reconstruction delta at `step` (shared by encoder
      * prediction loop and decoder — the bit-exact closed loop).
      */
    private def vpdiff(delta: Int, step: Int): Int = {
      var d = step >> 3
      if ((delta & 4) != 0) d += step
      if ((delta & 2) != 0) d += step >> 1
      if ((delta & 1) != 0) d += step >> 2
      d
    }

    /** Encode mono samples into ADPCM blocks of `blockSamples` samples
      * (1 header sample + 2·k nibbles ⇒ blockSamples must be odd). The
      * final short block zero-pads its nibbles.
      */
    def encodeMono(samples: Array[Short], blockSamples: Int): Array[Byte] = {
      require(blockSamples >= 3 && blockSamples % 2 == 1,
        s"blockSamples=$blockSamples must be odd and >= 3")
      require(samples.nonEmpty, "no samples")
      val blockAlign = 4 + (blockSamples - 1) / 2
      val nBlocks = (samples.length + blockSamples - 1) / blockSamples
      val out = ByteBuffer.allocate(nBlocks * blockAlign)
        .order(ByteOrder.LITTLE_ENDIAN)
      var index = 0
      var pos = 0
      while (pos < samples.length) {
        var predictor: Int = samples(pos)
        out.putShort(predictor.toShort)
        out.put(index.toByte)
        out.put(0.toByte)
        var i = 1
        var nibblePair = 0
        var half = false
        while (i < blockSamples) {
          val sample: Int =
            if (pos + i < samples.length) samples(pos + i) else 0
          val step = StepTable(index)
          var diff = sample - predictor
          val sign = if (diff < 0) { diff = -diff; 8 } else 0
          var delta = 0
          var st = step
          if (diff >= st) { delta = 4; diff -= st }
          st >>= 1
          if (diff >= st) { delta |= 2; diff -= st }
          st >>= 1
          if (diff >= st) delta |= 1
          val d = vpdiff(delta, step)
          predictor = clampS(if (sign != 0) predictor - d else predictor + d)
          index = clampIdx(index + IndexTable(delta | sign))
          val nib = delta | sign
          if (!half) { nibblePair = nib; half = true }
          else { out.put((nibblePair | (nib << 4)).toByte); half = false }
          i += 1
        }
        if (half) out.put(nibblePair.toByte)
        pos += blockSamples
      }
      out.array
    }

    /** Decode ADPCM blocks back to mono samples (`total` caps the output
      * — the last block may be padded).
      */
    def decodeMono(bytes: Array[Byte], blockSamples: Int,
                   total: Int): Array[Short] = {
      val blockAlign = 4 + (blockSamples - 1) / 2
      require(bytes.length % blockAlign == 0,
        s"${bytes.length} bytes not a multiple of blockAlign=$blockAlign")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val out = new Array[Short](total)
      var n = 0
      while (bb.remaining() >= blockAlign && n < total) {
        var predictor: Int = bb.getShort()
        var index = clampIdx(bb.get() & 0xFF)
        bb.get() // reserved
        out(n) = predictor.toShort; n += 1
        var i = 1
        while (i < blockSamples) {
          val byteIdx = (i - 1) / 2
          val b = bytes(bb.position() - 4 + 4 + byteIdx) // within block data
          val nib = if ((i - 1) % 2 == 0) b & 0x0F else (b >> 4) & 0x0F
          val step = StepTable(index)
          val d = vpdiff(nib & 7, step)
          predictor = clampS(
            if ((nib & 8) != 0) predictor - d else predictor + d)
          index = clampIdx(index + IndexTable(nib))
          if (n < total) { out(n) = predictor.toShort; n += 1 }
          i += 1
        }
        bb.position(bb.position() + blockAlign - 4)
      }
      out
    }
  }

  /** RIFF/WAVE writer for the three compressed formats. `tag` ∈
    * {6 (A-law), 7 (µ-law), 0x11 (IMA ADPCM)}; mono only (the corpus
    * decode path mono-mixes anyway). ADPCM uses 1017-sample blocks
    * (505-byte blockAlign + header = the canonical 4-bit layout).
    */
  def encodeWav(tag: Int, samples: Array[Short], sampleRate: Int): Array[Byte] = {
    require(sampleRate > 0, s"sampleRate=$sampleRate")
    val AdpcmBlockSamples = 1017
    val (data, blockAlign, bits, extra: Array[Byte]) = tag match {
      case 6 =>
        (samples.map(G711.encodeA), 1, 8, Array.emptyByteArray)
      case 7 =>
        (samples.map(G711.encodeMu), 1, 8, Array.emptyByteArray)
      case 0x11 =>
        val ba = 4 + (AdpcmBlockSamples - 1) / 2
        val ext = ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
          .putShort(AdpcmBlockSamples.toShort).array
        (ImaAdpcm.encodeMono(samples, AdpcmBlockSamples), ba, 4, ext)
      case t => sys.error(s"unsupported WAV format tag $t")
    }
    val fmtLen = 16 + (if (extra.nonEmpty) 2 + extra.length else 0)
    val factLen = 12 // fact chunk: required for compressed formats
    val bb = ByteBuffer.allocate(12 + 8 + fmtLen + factLen + 8 + data.length +
        (data.length & 1))
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(US_ASCII))
      .putInt(4 + 8 + fmtLen + factLen + 8 + data.length + (data.length & 1))
      .put("WAVE".getBytes(US_ASCII))
    bb.put("fmt ".getBytes(US_ASCII)).putInt(fmtLen)
      .putShort(tag.toShort).putShort(1)
      .putInt(sampleRate)
      .putInt(if (tag == 0x11) sampleRate * blockAlign / AdpcmBlockSamples
        else sampleRate)
      .putShort(blockAlign.toShort).putShort(bits.toShort)
    if (extra.nonEmpty) bb.putShort(extra.length.toShort).put(extra)
    bb.put("fact".getBytes(US_ASCII)).putInt(4).putInt(samples.length)
    bb.put("data".getBytes(US_ASCII)).putInt(data.length).put(data)
    if ((data.length & 1) == 1) bb.put(0.toByte) // RIFF chunk padding
    bb.array
  }

  /** Parse a mono G.711/ADPCM WAV into the [[Multimodal.WavCodec]]
    * decode contract `(samples in [-1,1], rate, channels, durationMs)`.
    * None for anything this module doesn't own (PCM stays with the JDK
    * path; stereo compressed audio is out of scope and falls through to
    * the stub rather than misdecoding).
    */
  def decodeWav(payload: Array[Byte]): Option[(Array[Float], Int, Int, Long)] = {
    if (payload == null || payload.length < 44) return None
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    def four(o: Int) = new String(payload, o, 4, US_ASCII)
    if (four(0) != "RIFF" || four(8) != "WAVE") return None
    var off = 12
    var tag = -1; var channels = -1; var rate = -1
    var blockAlign = -1; var samplesPerBlock = -1; var factSamples = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= payload.length) {
      val id = four(off)
      val len = bb.getInt(off + 4)
      if (len < 0 || off + 8 + len > payload.length) return None
      id match {
        case "fmt " if len >= 16 =>
          tag = bb.getShort(off + 8) & 0xFFFF
          channels = bb.getShort(off + 10) & 0xFFFF
          rate = bb.getInt(off + 12)
          blockAlign = bb.getShort(off + 20) & 0xFFFF
          if (tag == 0x11 && len >= 20)
            samplesPerBlock = bb.getShort(off + 26) & 0xFFFF
        case "fact" if len >= 4 => factSamples = bb.getInt(off + 8)
        case "data" => dataOff = off + 8; dataLen = len
        case _ => ()
      }
      off += 8 + len + (len & 1)
    }
    if (dataOff < 0 || rate <= 0 || channels != 1) return None
    val data = java.util.Arrays.copyOfRange(payload, dataOff, dataOff + dataLen)
    val shorts: Array[Short] = tag match {
      case 6 => data.map(G711.decodeA)
      case 7 => data.map(G711.decodeMu)
      case 0x11 if samplesPerBlock > 1 && blockAlign > 4 =>
        if (blockAlign != 4 + (samplesPerBlock - 1) / 2 ||
            data.length % blockAlign != 0) return None
        val nBlocks = data.length / blockAlign
        val cap = nBlocks * samplesPerBlock
        val total = if (factSamples > 0) math.min(factSamples, cap) else cap
        ImaAdpcm.decodeMono(data, samplesPerBlock, total)
      case _ => return None
    }
    val f = shorts.map(s => s / 32768f)
    Some((f, rate, 1, math.round(f.length * 1000.0 / rate)))
  }
}
