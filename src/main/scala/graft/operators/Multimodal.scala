package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image / audio / video) column handling for training-data
  * pipelines: the payload is an opaque `binary` column plus a typed metadata
  * struct; decode / featurize / resize / frame-sample run as partition-local
  * batch transforms (`mapPartitions`), so each executor touches only its own
  * rows — no shuffle, no driver materialization, valid at any table size.
  *
  * IMAGES decode for real through the JDK's `javax.imageio`
  * (PNG/JPEG/GIF/BMP — [[ImageIoCodec]]); AUDIO decodes for real through
  * the JDK's `javax.sound.sampled` (WAV/PCM — [[WavCodec]]). Payloads
  * neither can parse fall back to [[StubCodec]]'s deterministic
  * pseudo-content so synthetic fixtures keep flowing through the same
  * plumbing. VIDEO remains stubbed (no codecs in this environment) behind
  * the same partition-local batch shape.
  */
object Multimodal {

  /** Real image decode via the JDK's ImageIO — no external dependencies.
    * Pixels are grayscale floats in [0,1], row-major (ITU-R BT.601 luma).
    */
  object ImageIoCodec {
    /** Decode to (pixels, width, height); None if ImageIO can't parse. */
    def decodeImage(payload: Array[Byte]): Option[(Array[Float], Int, Int)] = {
      if (payload == null || payload.isEmpty) return None
      val img =
        // ImageIO readers throw RuntimeExceptions too on malformed payloads
        // (IllegalArgumentException, CMMException, AIOOBE…) — any failure
        // means "not decodable", which the caller maps to the stub
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) return None
      val (w, h) = (img.getWidth, img.getHeight)
      val px = new Array[Float](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
          px(y * w + x) = (0.299f * r + 0.587f * g + 0.114f * b) / 255f
          x += 1
        }
        y += 1
      }
      Some((px, w, h))
    }

    /** Deterministic box-average resample to w×h (no AWT rendering
      * pipeline involved, so results are identical across JVMs).
      */
    def resize(pixels: Array[Float], srcW: Int, srcH: Int, w: Int, h: Int): Array[Float] =
      Array.tabulate(w * h) { i =>
        val (x, y) = (i % w, i / w)
        val x0 = x * srcW / w; val x1 = math.max(x0 + 1, (x + 1) * srcW / w)
        val y0 = y * srcH / h; val y1 = math.max(y0 + 1, (y + 1) * srcH / h)
        var s = 0f; var yy = y0
        while (yy < y1 && yy < srcH) {
          var xx = x0
          while (xx < x1 && xx < srcW) { s += pixels(yy * srcW + xx); xx += 1 }
          yy += 1
        }
        s / ((math.min(x1, srcW) - x0) * (math.min(y1, srcH) - y0))
      }
  }

  /** Real audio decode for WAV (RIFF/PCM and anything else
    * `javax.sound.sampled` can convert to signed PCM — in the JDK, no
    * external dependencies). Samples are mono-mixed floats in [-1,1].
    */
  object WavCodec {
    /** Decode to (samples, sampleRate, nChannels, durationMs); None if the
      * payload is not a parseable audio stream.
      */
    def decodeWav(payload: Array[Byte]): Option[(Array[Float], Int, Int, Long)] = {
      if (payload == null || payload.isEmpty) return None
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          val target = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            fmt.getSampleRate, 16, fmt.getChannels,
            2 * fmt.getChannels, fmt.getSampleRate, false)
          val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
          val bytes = try pcm.readAllBytes() finally pcm.close()
          val ch = math.max(1, target.getChannels)
          val n = bytes.length / 2 / ch
          val out = new Array[Float](n)
          var i = 0
          while (i < n) {
            var s = 0f; var c = 0
            while (c < ch) {
              val off = (i * ch + c) * 2
              // little-endian signed 16-bit
              val v = (((bytes(off + 1): Int) << 8) | (bytes(off) & 0xFF)).toShort
              s += v / 32768f; c += 1
            }
            out(i) = s / ch
            i += 1
          }
          val durMs = math.round(n * 1000.0 / target.getSampleRate)
          Some((out, fmt.getSampleRate.toInt, fmt.getChannels, durMs))
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Canonical RIFF/WAVE PCM-16 writer (44-byte header + interleaved
      * little-endian frames) — the audio SINK side: export processed
      * audio back to the interchange format every tool reads. Inverse of
      * [[decodeWav]] up to mono-mixing (a mono encode of what decodeWav
      * returned reproduces its samples exactly: short→float→short is
      * lossless at 16 bits).
      */
    def encodePcm16(samples: Array[Short], sampleRate: Int,
                    channels: Int): Array[Byte] = {
      require(channels >= 1, s"channels=$channels")
      require(samples.length % channels == 0,
        s"${samples.length} samples not a multiple of $channels channels")
      require(sampleRate > 0, s"sampleRate=$sampleRate")
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      bb.put("RIFF".getBytes(ascii)).putInt(36 + dataLen)
        .put("WAVE".getBytes(ascii))
      bb.put("fmt ".getBytes(ascii)).putInt(16)
        .putShort(1) // PCM
        .putShort(channels.toShort)
        .putInt(sampleRate)
        .putInt(sampleRate * channels * 2) // byte rate
        .putShort((channels * 2).toShort)  // block align
        .putShort(16)                      // bits per sample
      bb.put("data".getBytes(ascii)).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array
    }
  }

  /** Real multi-frame (video-like) decode for animated GIF — the one
    * multi-frame container the bare JDK can parse. Frames are decoded as
    * stored (no inter-frame disposal compositing — documented contract)
    * and re-encoded as standalone PNGs, so each sampled frame feeds
    * straight back into [[ImageIoCodec.decodeImage]] / [[featurize]].
    */
  object GifCodec {
    /** Every `everyN`-th frame as PNG bytes; None unless the payload is a
      * GIF that ImageIO can parse (single-frame GIFs yield one frame).
      */
    def sampleFrames(payload: Array[Byte], everyN: Int): Option[Seq[Array[Byte]]] = {
      if (payload == null || payload.length < 6 || everyN <= 0) return None
      if (!(payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F')) return None
      try {
        // NB: must be closed — with ImageIO's default disk cache this
        // stream owns a temp file + fd (per ROW in mapPartitions)
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) return None
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            Some((0 until n by everyN).map { i =>
              val img = reader.read(i)
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", bos)
              bos.toByteArray
            })
          } finally reader.dispose()
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Real video decode for MJPEG-in-AVI — the one true video container a
    * bare JDK can handle end-to-end: the RIFF/AVI wrapper is plain chunk
    * parsing (no codec involved) and every Motion-JPEG frame is a complete
    * baseline JPEG that `javax.imageio` decodes. Frames re-encode as
    * standalone PNGs — the same contract as [[GifCodec]], so sampled
    * frames feed straight into [[decodeResize]] / [[featurize]].
    */
  object AviMjpegCodec {
    private val ASCII = java.nio.charset.StandardCharsets.US_ASCII

    /** Every `everyN`-th video frame as PNG bytes; None unless the payload
      * is a RIFF/AVI whose video chunks (`##dc`/`##db`) are JPEGs.
      */
    def sampleFrames(payload: Array[Byte], everyN: Int): Option[Seq[Array[Byte]]] = {
      if (payload == null || payload.length < 12 || everyN <= 0) return None
      def fourcc(off: Int) = new String(payload, off, 4, ASCII)
      def u32(off: Int): Long =
        (payload(off) & 0xFFL) | ((payload(off + 1) & 0xFFL) << 8) |
          ((payload(off + 2) & 0xFFL) << 16) | ((payload(off + 3) & 0xFFL) << 24)
      if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
      try {
        val jpegs = Seq.newBuilder[Array[Byte]]
        // walk the chunk tree; LIST bodies (hdrl, movi, rec …) recurse.
        // AVI stream chunks are word-aligned: a chunk occupies
        // 8 + size + (size & 1) bytes.
        def walk(start: Int, end: Int): Unit = {
          var off = start
          while (off + 8 <= end) {
            val id = fourcc(off)
            val sz = u32(off + 4)
            if (sz < 0 || off + 8 + sz > end) return
            val n = sz.toInt
            if (id == "RIFF" || id == "LIST") walk(off + 12, off + 8 + n)
            else if (Character.isDigit(id.charAt(0)) &&
                Character.isDigit(id.charAt(1)) &&
                (id.endsWith("dc") || id.endsWith("db")) && n >= 2 &&
                (payload(off + 8) & 0xFF) == 0xFF &&
                (payload(off + 9) & 0xFF) == 0xD8) // JPEG SOI marker
              jpegs += java.util.Arrays.copyOfRange(payload, off + 8, off + 8 + n)
            off += 8 + n + (n & 1)
          }
        }
        walk(12, math.min(payload.length.toLong, 8L + u32(4)).toInt)
        val all = jpegs.result()
        if (all.isEmpty) return None
        val sampled = (0 until all.length by everyN).flatMap { i =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(all(i)))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) None
          else {
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            Some(bos.toByteArray)
          }
        }
        if (sampled.isEmpty) None else Some(sampled)
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Real H.264 I-frame extraction for Annex-B elementary streams (ITU-T
    * H.264 — the byte-stream format of §B.1, NAL syntax of §7.3): scans
    * start codes, strips emulation-prevention bytes, parses SPS/PPS with
    * a real Exp-Golomb reader (frame dimensions come from the SPS, not a
    * stub), and DECODES IDR pictures whose macroblocks are I_PCM
    * (§7.3.5/§8.3.5: uncompressed samples carried in the bitstream — the
    * one H.264 coding mode a bare JVM can decode to true pixels without
    * a CAVLC/CABAC entropy stage). Non-IDR slices (P/B frames) are
    * recognized and SKIPPED — exactly the I-frame-only selection a
    * keyframe extractor wants. Entropy-coded IDR frames (the common
    * case for real encoders) fail the I_PCM gate and fall back to the
    * stub path, stated honestly in the README matrix.
    *
    * Decoded frames re-encode as standalone PNGs — the same contract as
    * [[GifCodec]]/[[AviMjpegCodec]], so frames feed [[decodeResize]] /
    * [[featurize]] / [[keyframes]] unchanged.
    */
  object H264Codec {
    /** Bit reader shared with the CAVLC macroblock decoder. */
    private type BitReader = H264Cavlc.BitReader

    private case class Sps(widthMbs: Int, heightMbs: Int,
                           width: Int, height: Int,
                           cropLeft: Int, cropTop: Int,
                           log2MaxFrameNum: Int, pocType: Int,
                           log2MaxPocLsb: Int, frameMbsOnly: Boolean,
                           chromaFormatIdc: Int)
    private case class Pps(entropyCabac: Boolean, bottomFieldPoc: Boolean,
                           deblockControl: Boolean, initQp: Int)

    /** Strip emulation-prevention bytes: 00 00 03 → 00 00 (§7.4.1.1). */
    private def rbsp(nal: Array[Byte], from: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(nal.length - from)
      var i = from
      while (i < nal.length) {
        if (i + 2 < nal.length && nal(i) == 0 && nal(i + 1) == 0 &&
            nal(i + 2) == 3) {
          out.write(0); out.write(0); i += 3
        } else { out.write(nal(i)); i += 1 }
      }
      out.toByteArray
    }

    /** NAL unit payloads (header byte included) between start codes. */
    private def nalUnits(payload: Array[Byte]): Seq[Array[Byte]] = {
      val starts = scala.collection.mutable.ArrayBuffer[Int]()
      var i = 0
      while (i + 2 < payload.length) {
        if (payload(i) == 0 && payload(i + 1) == 0 && payload(i + 2) == 1) {
          starts += i + 3; i += 3
        } else i += 1
      }
      starts.toSeq.zipAll(starts.toSeq.drop(1), -1, payload.length)
        .collect { case (s, e) if s >= 0 =>
          // trailing zeros before the next start code belong to the code
          var end = e
          if (end != payload.length) {
            end -= 1 // the 0x01 position's preceding zeros
            while (end > s && payload(end - 1) == 0) end -= 1
          }
          payload.slice(s, end)
        }
    }

    private def parseSps(r: BitReader): Option[Sps] = {
      val profile = r.u8(); r.u8(); r.u8() // constraints + level
      r.ue() // sps_id
      var chromaFormatIdc = 1
      if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128,
              138, 139, 134, 135).contains(profile)) {
        chromaFormatIdc = r.ue()
        if (chromaFormatIdc == 3) r.bit() // separate_colour_plane
        // >8-bit depths: I_PCM samples would be 10/12-bit — out of scope
        // (consistent with the other gates: skip loudly, don't misparse)
        if (r.ue() != 0) return None // bit_depth_luma_minus8
        if (r.ue() != 0) return None // bit_depth_chroma_minus8
        r.bit() // qpprime_y_zero_transform_bypass
        if (r.bit() == 1) return None // scaling matrices: out of scope
      }
      val log2MaxFrameNum = r.ue() + 4
      val pocType = r.ue()
      var log2MaxPocLsb = 0
      if (pocType == 0) log2MaxPocLsb = r.ue() + 4
      else if (pocType == 1) {
        r.bit(); r.se(); r.se()
        val n = r.ue(); (0 until n).foreach(_ => r.se())
      }
      r.ue(); r.bit() // max_num_ref_frames, gaps_allowed
      val wMbs = r.ue() + 1
      val hUnits = r.ue() + 1
      val frameMbsOnly = r.bit() == 1
      if (!frameMbsOnly) r.bit() // mbaff
      r.bit() // direct_8x8
      var (cl, cr, ct, cb) = (0, 0, 0, 0)
      if (r.bit() == 1) { cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue() }
      val hMbs = (if (frameMbsOnly) 1 else 2) * hUnits
      // crop units (§7.4.2.1.1): X = SubWidthC (2 for 4:2:0/4:2:2, else
      // 1), Y = SubHeightC (2 for 4:2:0, else 1) × (frame coding ? 1 : 2)
      val cropUnitX = if (chromaFormatIdc == 1 || chromaFormatIdc == 2) 2 else 1
      val cropUnitY = (if (chromaFormatIdc == 1) 2 else 1) *
        (if (frameMbsOnly) 1 else 2)
      val width = wMbs * 16 - (cl + cr) * cropUnitX
      val height = hMbs * 16 - (ct + cb) * cropUnitY
      Some(Sps(wMbs, hMbs, width, height, cl * cropUnitX, ct * cropUnitY,
        log2MaxFrameNum, pocType,
        log2MaxPocLsb, frameMbsOnly, chromaFormatIdc))
    }

    private def parsePps(r: BitReader): Option[Pps] = {
      r.ue(); r.ue() // pps_id, sps_id
      val cabac = r.bit() == 1
      val bottomPoc = r.bit() == 1
      if (r.ue() != 0) return None // FMO slice groups: out of scope
      r.ue(); r.ue(); r.bit(); r.u(2) // ref counts, weighted pred
      val initQp = 26 + r.se() // pic_init_qp_minus26
      r.se(); r.se() // init qs, chroma offset
      val deblock = r.bit() == 1
      r.bit(); r.bit() // constrained_intra, redundant_pic_cnt
      Some(Pps(cabac, bottomPoc, deblock, initQp))
    }

    /** Decode one single-slice all-intra IDR picture to grayscale [0,1]:
      * I_PCM macroblocks read raw samples; I_4x4 / I_16x16 macroblocks go
      * through the CAVLC entropy + intra-prediction + inverse-transform
      * path ([[H264Cavlc]]). CABAC, non-4:2:0 coded MBs and field coding
      * fall to None (stub).
      */
    private def decodeIdr(r: BitReader, sps: Sps, pps: Pps)
        : Option[Array[Float]] = {
      if (pps.entropyCabac || !sps.frameMbsOnly) return None
      if (r.ue() != 0) return None // first_mb_in_slice: single slice only
      val sliceType = r.ue()
      if (sliceType != 2 && sliceType != 7) return None // I slices only
      r.ue() // pps_id
      r.u(sps.log2MaxFrameNum) // frame_num
      r.ue() // idr_pic_id
      if (sps.pocType == 0) {
        r.u(sps.log2MaxPocLsb)
        if (pps.bottomFieldPoc) r.se()
      }
      r.bit(); r.bit() // no_output_of_prior_pics, long_term_reference
      val sliceQp = pps.initQp + r.se() // slice_qp_delta
      if (sliceQp < 0 || sliceQp > 51) return None
      // deblocking slice-header fields (§7.3.3): idc 1 disables the
      // filter; otherwise the offsets shift the alpha/beta thresholds
      var deblock = true
      var offA = 0; var offB = 0
      if (pps.deblockControl) {
        if (r.ue() == 1) deblock = false
        else { offA = 2 * r.se(); offB = 2 * r.se() }
      }
      val nMbs = sps.widthMbs * sps.heightMbs
      val chromaSamples = sps.chromaFormatIdc match {
        case 0 => 0
        case 1 => 128 // 4:2:0 — 2 × 8×8
        case 2 => 256 // 4:2:2
        case _ => 512 // 4:4:4
      }
      val dec = new H264Cavlc.SliceDecoder(sps.widthMbs, sps.heightMbs, sliceQp)
      var m = 0
      while (m < nMbs) {
        if (r.remainingBits < 1) return None
        val mbType = r.ue()
        if (mbType == 25) { // I_PCM: raw samples, no entropy stage
          r.byteAlign()
          if (r.remainingBits < (256 + chromaSamples) * 8) return None
          val px = new Array[Int](256)
          var i = 0
          while (i < 256) { px(i) = r.u8(); i += 1 }
          var c = 0
          while (c < chromaSamples) { r.u8(); c += 1 } // grayscale output
          dec.setPcm(m, px)
        } else {
          // the CAVLC residual layout is 4:2:0-specific
          if (sps.chromaFormatIdc != 1) return None
          if (!dec.decodeMb(r, m, mbType)) return None
        }
        m += 1
      }
      // in-loop deblocking (§8.7), honored per the stream's own
      // disable_deblocking_filter_idc — conformant output pixels, not
      // just the pre-deblock reconstruction. I_PCM-only pictures are
      // unchanged by construction (I_PCM QPY counts as 0 → alpha = 0).
      if (deblock)
        H264Deblock.filterLuma(dec.plane, sps.widthMbs, sps.heightMbs,
          dec.mbQp, offA, offB)
      val raw = dec.plane
      val luma = new Array[Float](raw.length)
      var i = 0
      while (i < raw.length) { luma(i) = raw(i) / 255f; i += 1 }
      // crop to the SPS-declared picture WINDOW — offset by the left/top
      // crop, not always the top-left corner
      if (sps.width == sps.widthMbs * 16 && sps.height == sps.heightMbs * 16)
        Some(luma)
      else Some(Array.tabulate(sps.width * sps.height) { i =>
        val y = sps.cropTop + i / sps.width
        val x = sps.cropLeft + i % sps.width
        luma(y * sps.widthMbs * 16 + x)
      })
    }

    private def toPng(px: Array[Float], w: Int, h: Int): Array[Byte] = {
      // NOT TYPE_BYTE_GRAY: that is a LINEAR gray color space, and the
      // PNG writer gamma-converts it to sRGB (145 -> 199), silently
      // shifting every mid-tone sample. Equal sRGB triplets round-trip
      // exactly and BT.601-luma back to the same value.
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var i = 0
      while (i < px.length) {
        val v = math.max(0, math.min(255, (px(i) * 255f).round))
        img.setRGB(i % w, i / w, (v << 16) | (v << 8) | v)
        i += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Every `everyN`-th IDR (key) frame as PNG bytes; None unless the
      * payload is an Annex-B H.264 stream with an SPS and at least one
      * decodable I_PCM IDR picture.
      */
    def sampleFrames(payload: Array[Byte], everyN: Int): Option[Seq[Array[Byte]]] = {
      if (payload == null || payload.length < 5 || everyN <= 0) return None
      // Annex-B magic: a 3- or 4-byte start code right at offset 0
      val annexB =
        (payload(0) == 0 && payload(1) == 0 && payload(2) == 1) ||
        (payload.length > 4 && payload(0) == 0 && payload(1) == 0 &&
          payload(2) == 0 && payload(3) == 1)
      if (!annexB) return None
      try {
        var sps: Option[Sps] = None
        var pps: Option[Pps] = None
        val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
        nalUnits(payload).foreach { nal =>
          if (nal.nonEmpty && (nal(0) & 0x80) == 0) {
            val body = () => new BitReader(rbsp(nal, 1))
            (nal(0) & 0x1f) match {
              case 7 => sps = parseSps(body())
              case 8 => pps = parsePps(body())
              case 5 => for (s <- sps; p <- pps;
                             px <- decodeIdr(body(), s, p))
                frames += toPng(px, s.width, s.height)
              case _ => // non-IDR slice (P/B), SEI, AUD… — skipped
            }
          }
        }
        if (frames.isEmpty) None
        else Some(frames.zipWithIndex.collect {
          case (f, i) if i % everyN == 0 => f
        }.toSeq)
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** MP4 (ISO BMFF) container demux for AVC video tracks — the
    * highest-traffic real-corpus container (a crawled video corpus is
    * mostly MP4-contained H.264). Pure container work, no new entropy
    * coding: the demux walks `moov/trak/mdia/minf/stbl`, reads the
    * `avcC` AVCDecoderConfigurationRecord (out-of-band SPS/PPS + NAL
    * length-prefix size, ISO 14496-15 §5.2.4.1), resolves every sample's
    * file offset from the `stsc`/`stsz`/`stco|co64` tables (ISO
    * 14496-12 §8.7), converts the length-prefixed NALs to Annex-B start
    * codes, and hands the elementary stream to [[H264Codec]] — so the
    * existing CAVLC intra decoder reaches MP4 files directly. CABAC /
    * inter-coded tracks still fall through to the stub at the decode
    * stage (H264Codec's gates), and any malformed table returns None
    * rather than misparsing.
    */
  object Mp4AvcCodec {
    private final case class Box(typ: String, start: Int, end: Int)

    private def u16(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    private def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def u64(b: Array[Byte], o: Int): Long =
      (u32(b, o) << 32) | u32(b, o + 4)
    private def typ(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Child boxes of [from, to); malformed sizes end the walk. */
    private def boxes(b: Array[Byte], from: Int, to: Int): Seq[Box] = {
      val out = scala.collection.mutable.ArrayBuffer[Box]()
      var i = from
      while (i + 8 <= to) {
        val size32 = u32(b, i)
        val t = typ(b, i + 4)
        val (payloadOff, size) =
          if (size32 == 1L && i + 16 <= to) (i + 16, u64(b, i + 8))
          else if (size32 == 0L) (i + 8, (to - i).toLong) // to end of span
          else (i + 8, size32)
        if (size < 8 || i + size > to) return out.toSeq
        out += Box(t, payloadOff, i + size.toInt)
        i += size.toInt
      }
      out.toSeq
    }

    private def child(b: Array[Byte], parent: Box, t: String): Option[Box] =
      boxes(b, parent.start, parent.end).find(_.typ == t)

    /** SPS/PPS NALs + NAL length-prefix size from an avcC record. */
    private def parseAvcC(b: Array[Byte], box: Box)
        : Option[(Seq[Array[Byte]], Int)] = {
      var i = box.start
      if (i + 6 > box.end || b(i) != 1) return None // configurationVersion
      val lengthSize = (b(i + 4) & 0x3) + 1
      val nSps = b(i + 5) & 0x1f
      i += 6
      val nals = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      var k = 0
      while (k < nSps) {
        if (i + 2 > box.end) return None
        val len = u16(b, i); i += 2
        if (i + len > box.end) return None
        nals += b.slice(i, i + len); i += len; k += 1
      }
      if (i + 1 > box.end) return None
      val nPps = b(i) & 0xff; i += 1
      k = 0
      while (k < nPps) {
        if (i + 2 > box.end) return None
        val len = u16(b, i); i += 2
        if (i + len > box.end) return None
        nals += b.slice(i, i + len); i += len; k += 1
      }
      Some((nals.toSeq, lengthSize))
    }

    /** Absolute (offset, size) of every sample in track order, resolved
      * from stsc (samples per chunk) + stsz (sizes) + stco/co64 (chunk
      * starts) — samples inside a chunk are contiguous.
      */
    private def sampleSpans(b: Array[Byte], stbl: Box)
        : Option[Seq[(Long, Int)]] = {
      val stsz = child(b, stbl, "stsz").getOrElse(return None)
      val stsc = child(b, stbl, "stsc").getOrElse(return None)
      val stcoOpt = child(b, stbl, "stco")
      val co64Opt = child(b, stbl, "co64")
      // every table read is bounded by ITS OWN box end: a declared count
      // larger than the box holds (truncated or hostile file) must
      // return None, not walk into the following boxes' bytes and emit
      // garbage spans that happen to stay in-bounds
      // stsz: version/flags, uniform size, count, [sizes]
      if (stsz.start + 12 > stsz.end) return None
      val uniform = u32(b, stsz.start + 4)
      val nSamples = u32(b, stsz.start + 8).toInt
      if (nSamples <= 0 || nSamples > (1 << 20)) return None
      if (uniform == 0 && stsz.start + 12 + 4L * nSamples > stsz.end) return None
      val sizes = Array.tabulate(nSamples)(k =>
        if (uniform != 0) uniform.toInt
        else u32(b, stsz.start + 12 + 4 * k).toInt)
      // chunk offsets
      val chunkOffsets: IndexedSeq[Long] = (stcoOpt, co64Opt) match {
        case (Some(st), _) =>
          if (st.start + 8 > st.end) return None
          val n = u32(b, st.start + 4).toInt
          if (n < 0 || st.start + 8 + 4L * n > st.end) return None
          IndexedSeq.tabulate(n)(k => u32(b, st.start + 8 + 4 * k))
        case (_, Some(st)) =>
          if (st.start + 8 > st.end) return None
          val n = u32(b, st.start + 4).toInt
          if (n < 0 || st.start + 8 + 8L * n > st.end) return None
          IndexedSeq.tabulate(n)(k => u64(b, st.start + 8 + 8 * k))
        case _ => return None
      }
      // stsc entries: (first_chunk 1-based, samples_per_chunk)
      if (stsc.start + 8 > stsc.end) return None
      val nRuns = u32(b, stsc.start + 4).toInt
      if (nRuns < 0 || stsc.start + 8 + 12L * nRuns > stsc.end) return None
      val runs = IndexedSeq.tabulate(nRuns)(k =>
        (u32(b, stsc.start + 8 + 12 * k).toInt,
          u32(b, stsc.start + 12 + 12 * k).toInt))
      if (runs.isEmpty || chunkOffsets.isEmpty) return None
      val out = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
      var sample = 0
      var run = 0
      var chunk = 1
      while (sample < nSamples && chunk <= chunkOffsets.length) {
        while (run + 1 < runs.length && runs(run + 1)._1 <= chunk) run += 1
        var off = chunkOffsets(chunk - 1)
        var k = 0
        while (k < runs(run)._2 && sample < nSamples) {
          out += ((off, sizes(sample)))
          off += sizes(sample); sample += 1; k += 1
        }
        chunk += 1
      }
      if (sample < nSamples) None else Some(out.toSeq)
    }

    /** Demux an MP4 payload's first AVC track to one Annex-B elementary
      * stream: SPS/PPS from avcC first, then every sample's NALs with
      * start codes. None unless the payload is ISO BMFF with a
      * complete avc1/avc3 sample table.
      */
    def toAnnexB(payload: Array[Byte]): Option[Array[Byte]] = {
      if (payload == null || payload.length < 16) return None
      if (typ(payload, 4) != "ftyp") return None // ISO BMFF magic
      try {
        val top = boxes(payload, 0, payload.length)
        val moov = top.find(_.typ == "moov").getOrElse(return None)
        // first trak whose stsd carries an AVC sample entry
        val hit = boxes(payload, moov.start, moov.end)
          .filter(_.typ == "trak")
          .flatMap { trak =>
            for {
              mdia <- child(payload, trak, "mdia")
              minf <- child(payload, mdia, "minf")
              stbl <- child(payload, minf, "stbl")
              stsd <- child(payload, stbl, "stsd")
              // stsd: version/flags + entry_count, then sample entries;
              // VisualSampleEntry fixed part after the box header =
              // 8 (SampleEntry) + 70 = 78 bytes, then the codec boxes
              entry <- boxes(payload, stsd.start + 8, stsd.end)
                .find(e => e.typ == "avc1" || e.typ == "avc3")
              avcc <- boxes(payload, entry.start + 78, entry.end)
                .find(_.typ == "avcC")
              cfg <- parseAvcC(payload, avcc)
              spans <- sampleSpans(payload, stbl)
            } yield (cfg, spans)
          }.headOption
        hit.flatMap { case ((paramNals, lengthSize), spans) =>
          val out = new java.io.ByteArrayOutputStream()
          def startCode(): Unit =
            { out.write(0); out.write(0); out.write(0); out.write(1) }
          paramNals.foreach { n => startCode(); out.write(n) }
          var ok = true
          spans.foreach { case (off, size) =>
            if (ok && (off < 0 || off + size > payload.length)) ok = false
            if (ok) {
              var i = off.toInt
              val end = off.toInt + size
              while (ok && i + lengthSize <= end) {
                var len = 0L
                var k = 0
                while (k < lengthSize) { len = (len << 8) | (payload(i + k) & 0xffL); k += 1 }
                i += lengthSize
                if (len <= 0 || i + len > end) ok = false // corrupt prefix
                else { startCode(); out.write(payload, i, len.toInt); i += len.toInt }
              }
            }
          }
          if (ok) Some(out.toByteArray) else None
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** [[H264Codec.sampleFrames]] over the demuxed elementary stream. */
    def sampleFrames(payload: Array[Byte], everyN: Int): Option[Seq[Array[Byte]]] =
      toAnnexB(payload).flatMap(H264Codec.sampleFrames(_, everyN))
  }

  /** Typed metadata carried next to every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),        // e.g. "jpeg", "wav", "mp4"
    StructField("width", IntegerType),        // px (images/video)
    StructField("height", IntegerType),
    StructField("n_channels", IntegerType),   // 3=RGB, 1=mono audio…
    StructField("duration_ms", LongType),     // audio/video
    StructField("size_bytes", LongType)))

  /** Canonical media-table schema: id, modality, payload, metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaType)))

  /** VP9-in-IVF keyframe DETECTION — container + uncompressed-header
    * parse only, no entropy decode (VP9 pixel reconstruction needs the
    * full arithmetic decoder and is out of scope; pixels stay with
    * [[StubCodec]], honesty matrix in README).
    *
    * IVF layout (libvpx's raw-stream container): 32-byte file header
    * `DKIF` + version/u16 + hdrlen/u16 + fourcc + width/u16 + height/u16
    * + timebase + frame count, then per frame a 12-byte header
    * (size/u32-LE, pts/u64-LE) and the raw VP9 frame. Per frame the VP9
    * UNCOMPRESSED header start (VP9 bitstream spec §6.2, MSB-first):
    * frame_marker(2)=0b10, profile_low(1), profile_high(1)
    * [+reserved(1) if profile==3], show_existing_frame(1) [+map_idx(3),
    * stop], frame_type(1) (0=KEY), show_frame(1), error_resilient(1);
    * keyframes then carry frame_sync_code 0x49 0x83 0x42, the
    * color_config (bit_depth for profile≥2, color_space(3),
    * color_range(1) when not CS_RGB, explicit subsampling for
    * profile 1/3), and frame_size_minus_1 as two 16-bit fields.
    */
  object Vp9IvfCodec {
    private final class BitReader(b: Array[Byte], var pos: Int) {
      var bit = 0
      def read(n: Int): Int = {
        var v = 0
        var i = 0
        while (i < n) {
          if (pos >= b.length) throw new IllegalStateException("eof")
          v = (v << 1) | ((b(pos) >> (7 - bit)) & 1)
          bit += 1
          if (bit == 8) { bit = 0; pos += 1 }
          i += 1
        }
        v
      }
    }

    private def u16le(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    private def u32le(b: Array[Byte], o: Int): Long =
      (u16le(b, o).toLong) | (u16le(b, o + 2).toLong << 16)

    /** One frame's uncompressed-header parse, shared by the IVF and WebM
      * container paths: None = show_existing_frame (no new coded frame);
      * Some((isKey, w, h)) otherwise — keyframes report their header's own
      * frame_size (authoritative), non-keyframes the container dims
      * `(cw, ch)`. A header that fails to parse reports non-key with
      * container dims — a corrupt frame must flag, not throw.
      */
    private[operators] def parseFrameHeader(frame: Array[Byte], cw: Int,
        ch: Int): Option[(Boolean, Int, Int)] =
      try {
        val r = new BitReader(frame, 0)
        require(r.read(2) == 2, "frame_marker")
        val profile = r.read(1) | (r.read(1) << 1)
        if (profile == 3) r.read(1)
        if (r.read(1) == 1) None // show_existing_frame: no new frame
        else {
          val frameType = r.read(1) // 0 = KEY
          r.read(1) // show_frame
          r.read(1) // error_resilient
          if (frameType == 0) {
            require(r.read(8) == 0x49 && r.read(8) == 0x83 &&
              r.read(8) == 0x42, "sync code")
            if (profile >= 2) r.read(1) // 10/12 bit
            val colorSpace = r.read(3)
            if (colorSpace != 7) { // != CS_RGB
              r.read(1) // color_range
              if (profile == 1 || profile == 3) r.read(3)
            } else if (profile == 1 || profile == 3) r.read(1)
            val w = r.read(16) + 1
            val h = r.read(16) + 1
            Some((true, w, h))
          } else Some((false, cw, ch))
        }
      } catch { case _: Exception => Some((false, cw, ch)) }

    /** (frame_no, is_keyframe, width, height, frame payload) per frame;
      * None when the payload is not VP9-in-IVF. Width/height are the
      * keyframe header's own frame_size (authoritative, may differ from
      * the container's); non-keyframes report the container dimensions.
      * A frame whose header fails to parse is reported as non-key with
      * container dims — a corrupt frame must flag, not throw.
      */
    def frameInfo(payload: Array[Byte])
        : Option[Seq[(Int, Boolean, Int, Int, Array[Byte])]] = {
      if (payload == null || payload.length < 44) return None
      if (!(payload(0) == 'D' && payload(1) == 'K' && payload(2) == 'I' &&
            payload(3) == 'F')) return None
      val fourcc = new String(payload.slice(8, 12), "US-ASCII")
      if (fourcc != "VP90") return None
      val hdrLen = u16le(payload, 6)
      val cw = u16le(payload, 12)
      val ch = u16le(payload, 14)
      val out = Seq.newBuilder[(Int, Boolean, Int, Int, Array[Byte])]
      var off = hdrLen
      var no = 0
      while (off + 12 <= payload.length) {
        val sz = u32le(payload, off).toInt
        val fo = off + 12
        if (sz <= 0 || fo + sz > payload.length) return Some(out.result())
        val frame = java.util.Arrays.copyOfRange(payload, fo, fo + sz)
        parseFrameHeader(frame, cw, ch).foreach {
          case (k, w, h) => out += ((no, k, w, h, frame))
        }
        no += 1
        off = fo + sz
      }
      val r = out.result()
      if (r.isEmpty) None else Some(r)
    }
  }

  /** WebM (Matroska/EBML) container demux for VP9 video tracks — the
    * container the open web actually serves VP9 in (IVF is libvpx's raw
    * test wrapper; crawled VP9 is WebM). Pure container work on the
    * public Matroska/EBML spec, reusing [[Vp9IvfCodec.parseFrameHeader]]
    * for the per-frame keyframe decision (the frame's own uncompressed
    * header is authoritative — container keyframe flags can lie).
    *
    * EBML element = variable-length id (marker bit kept, 1–4 bytes) +
    * variable-length size (marker stripped, 1–8 bytes; all-ones = UNKNOWN
    * size, common for streamed Segment/Cluster) + payload. The walk is
    * Segment → Tracks → TrackEntry (TrackNumber, TrackType, CodecID
    * "V_VP9", Video → PixelWidth/PixelHeight) and Segment → Cluster →
    * SimpleBlock | BlockGroup→Block. An unknown-size element extends to
    * its parent's end; a following sibling Cluster then appears nested
    * and is recursed into, so streamed layouts still demux. Laced blocks
    * (multiple frames per block) are skipped — VP9 video frames are not
    * laced in practice; a skip must not desync the walk. Malformed
    * headers end the walk rather than misparse.
    */
  object WebmVp9Codec {
    private val SEGMENT = 0x18538067L
    private val TRACKS = 0x1654AE6BL
    private val TRACK_ENTRY = 0xAEL
    private val TRACK_NUMBER = 0xD7L
    private val TRACK_TYPE = 0x83L
    private val CODEC_ID = 0x86L
    private val VIDEO = 0xE0L
    private val PIXEL_W = 0xB0L
    private val PIXEL_H = 0xBAL
    private val CLUSTER = 0x1F43B675L
    private val SIMPLE_BLOCK = 0xA3L
    private val BLOCK_GROUP = 0xA0L
    private val BLOCK = 0xA1L

    private final case class El(id: Long, start: Int, end: Int)

    /** VINT at `o`: (value, nBytes, isAllOnes). IDs keep the marker bit
      * (Matroska convention); sizes strip it.
      */
    private def vint(b: Array[Byte], o: Int,
        stripMarker: Boolean): Option[(Long, Int, Boolean)] = {
      if (o >= b.length) return None
      val fb = b(o) & 0xff
      if (fb == 0) return None // >8-byte VINT: not valid here
      val len = java.lang.Integer.numberOfLeadingZeros(fb) - 23
      if (o + len > b.length) return None
      val valueMask = 0xff >>> len
      var v: Long = if (stripMarker) (fb & valueMask).toLong else fb.toLong
      var allOnes = (fb & valueMask) == valueMask
      var i = 1
      while (i < len) {
        val x = b(o + i) & 0xff
        v = (v << 8) | x
        if (x != 0xff) allOnes = false
        i += 1
      }
      Some((v, len, allOnes))
    }

    /** Child elements of [from, to); an unknown-size child extends to
      * `to` and ends the walk; malformed headers end the walk.
      */
    private def children(b: Array[Byte], from: Int, to: Int): Seq[El] = {
      val out = scala.collection.mutable.ArrayBuffer[El]()
      var i = from
      var done = false
      while (!done && i < to) {
        (for {
          (id, idLen, _) <- vint(b, i, stripMarker = false)
          (sz, szLen, unknown) <- vint(b, i + idLen, stripMarker = true)
        } yield (id, i + idLen + szLen, sz, unknown)) match {
          case Some((id, p, sz, unknown)) =>
            val end = if (unknown) to else p + sz
            if (p > to || end > to || end < p) done = true
            else { out += El(id, p, end.toInt); i = end.toInt }
          case None => done = true
        }
      }
      out.toSeq
    }

    private def uint(b: Array[Byte], el: El): Long = {
      var v = 0L
      var i = el.start
      while (i < el.end && i - el.start < 8) { v = (v << 8) | (b(i) & 0xff); i += 1 }
      v
    }

    private def str(b: Array[Byte], el: El): String =
      new String(b, el.start, el.end - el.start,
        java.nio.charset.StandardCharsets.US_ASCII).takeWhile(_ != '\u0000')

    /** The VP9 video track's (trackNumber, pixelW, pixelH), if any. */
    private def vp9Track(b: Array[Byte], segment: El): Option[(Long, Int, Int)] =
      children(b, segment.start, segment.end)
        .filter(_.id == TRACKS)
        .flatMap(tr => children(b, tr.start, tr.end))
        .filter(_.id == TRACK_ENTRY)
        .flatMap { te =>
          val kids = children(b, te.start, te.end)
          val codec = kids.find(_.id == CODEC_ID).map(str(b, _))
          val num = kids.find(_.id == TRACK_NUMBER).map(uint(b, _))
          val isVideo = kids.find(_.id == TRACK_TYPE).forall(uint(b, _) == 1L)
          val dims = kids.find(_.id == VIDEO).map { v =>
            val vk = children(b, v.start, v.end)
            (vk.find(_.id == PIXEL_W).map(uint(b, _).toInt).getOrElse(0),
              vk.find(_.id == PIXEL_H).map(uint(b, _).toInt).getOrElse(0))
          }
          if (codec.contains("V_VP9") && isVideo && num.isDefined)
            Some((num.get, dims.map(_._1).getOrElse(0),
              dims.map(_._2).getOrElse(0)))
          else None
        }.headOption

    /** Raw frame payloads of `track`, cluster by cluster (recursing into
      * clusters that a previous unknown-size cluster swallowed). A laced
      * block (flags bits 0x06 ≠ 0) is skipped.
      */
    private def trackFrames(b: Array[Byte], el: El,
        track: Long): Seq[Array[Byte]] = {
      def blockFrame(blk: El): Option[Array[Byte]] =
        vint(b, blk.start, stripMarker = true).flatMap {
          case (tn, tnLen, _) =>
            val flagsOff = blk.start + tnLen + 2 // skip s16 rel. timecode
            if (tn != track || flagsOff >= blk.end) None
            else if (((b(flagsOff) >> 1) & 0x3) != 0) None // laced: skip
            else Some(java.util.Arrays.copyOfRange(b, flagsOff + 1, blk.end))
        }
      children(b, el.start, el.end).flatMap {
        case c if c.id == CLUSTER => trackFrames(b, c, track)
        case blk if blk.id == SIMPLE_BLOCK => blockFrame(blk).toSeq
        case g if g.id == BLOCK_GROUP =>
          children(b, g.start, g.end).filter(_.id == BLOCK)
            .flatMap(blockFrame)
        case _ => Seq.empty
      }
    }

    /** Same shape as [[Vp9IvfCodec.frameInfo]]: (frame_no, is_keyframe,
      * width, height, frame payload) per coded frame of the VP9 track;
      * None unless the payload is an EBML container with a V_VP9 track.
      */
    def frameInfo(payload: Array[Byte])
        : Option[Seq[(Int, Boolean, Int, Int, Array[Byte])]] = {
      if (payload == null || payload.length < 8) return None
      if (!(payload(0) == 0x1A.toByte && payload(1) == 0x45.toByte &&
            payload(2) == 0xDF.toByte && payload(3) == 0xA3.toByte))
        return None
      val top = children(payload, 0, payload.length)
      val out = for {
        segment <- top.find(_.id == SEGMENT).toSeq
        (track, cw, ch) <- vp9Track(payload, segment).toSeq
        (frame, no) <- children(payload, segment.start, segment.end)
          .filter(_.id == CLUSTER)
          .flatMap(trackFrames(payload, _, track)).zipWithIndex
        (k, w, h) <- Vp9IvfCodec.parseFrameHeader(frame, cw, ch).toSeq
      } yield (no, k, w, h, frame)
      if (out.isEmpty) None else Some(out)
    }
  }

  /** VP9 keyframe selection over IVF or WebM payloads: one output row
    * per KEYFRAME — original columns + (frame_no, width, height,
    * frame bytes). Detection is a real container demux + header parse
    * ([[Vp9IvfCodec]], [[WebmVp9Codec]]); the frame payload itself stays
    * entropy-coded (no pixel decode — see the README honesty matrix).
    * Partition-local flatMap, no shuffle.
    */
  def vp9Keyframes(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_no", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("frame", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](idx)
        Vp9IvfCodec.frameInfo(payload)
          .orElse(WebmVp9Codec.frameInfo(payload))
          .getOrElse(Seq.empty)
          .collect { case (no, true, w, h, frame) =>
            Row.fromSeq(r.toSeq ++ Seq(no, w, h, frame))
          }
      }
    }(enc)
  }

  /** Deterministic fake decode for entropy-coded payloads (no real
    * codecs in this environment) and for image payloads ImageIO cannot
    * parse; outputs are pure functions of the input bytes so tests are
    * reproducible.
    */
  object StubCodec {
    private def mix(h0: Long): Long = {
      var h = h0
      h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL; h ^= (h >>> 33); h
    }
    def hashBytes(b: Array[Byte]): Long = {
      var h = 0xCBF29CE484222325L
      var i = 0
      while (i < b.length) { h ^= b(i); h *= 0x100000001B3L; i += 1 }
      mix(h)
    }
    /** "Decode" → fixed 8×8 grayscale pixel block derived from the bytes. */
    def decodeImage(payload: Array[Byte]): Array[Float] = {
      val h = hashBytes(payload)
      Array.tabulate(64)(i => ((mix(h + i) & 0xFF).toFloat) / 255f)
    }
    /** "Resize" → average-pool the stubbed pixel block to w×h. */
    def resize(pixels: Array[Float], srcW: Int, srcH: Int, w: Int, h: Int): Array[Float] =
      Array.tabulate(w * h) { i =>
        val (x, y) = (i % w, i / w)
        val sx = x * srcW / w; val sy = y * srcH / h
        pixels(math.min(srcH - 1, sy) * srcW + math.min(srcW - 1, sx))
      }
    /** "Feature-extract" → dim-length embedding from payload bytes. */
    def featurize(payload: Array[Byte], dim: Int): Array[Float] = {
      val h = hashBytes(payload)
      Array.tabulate(dim)(i => ((mix(h * 31 + i) % 1000L).toFloat) / 1000f)
    }
    /** "Frame-sample" → every-nth fixed-size slice of the payload. */
    def sampleFrames(payload: Array[Byte], frameBytes: Int, everyN: Int): Seq[Array[Byte]] = {
      if (payload == null || payload.isEmpty || frameBytes <= 0) Seq.empty
      else (0 until payload.length by frameBytes * everyN)
        .map(off => payload.slice(off, math.min(payload.length, off + frameBytes)))
    }
  }

  /** Attach a metadata struct derived from the payload (size is real; the
    * decoded dimensions come from the stub codec).
    */
  def withMeta(df: DataFrame, payloadCol: String, format: String): DataFrame =
    df.withColumn("meta", struct(
      lit(format).as("format"),
      lit(8).as("width"), lit(8).as("height"), lit(1).as("n_channels"),
      (length(col(payloadCol)).cast("long") * 10L).as("duration_ms"),
      length(col(payloadCol)).cast("long").as("size_bytes")))

  /** Decode + resize in one partition-local batch pass. Output schema:
    * input columns + `pixels: array<float>` (w·h row-major, grayscale in
    * [0,1]). Real images (PNG/JPEG/GIF/BMP) decode via [[ImageIoCodec]];
    * unparseable payloads fall back to the deterministic stub.
    */
  def decodeResize(df: DataFrame, payloadCol: String, w: Int, h: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("pixels", ArrayType(FloatType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val px =
          if (payload == null) null
          else ImageIoCodec.decodeImage(payload) match {
            case Some((pixels, sw, sh)) => ImageIoCodec.resize(pixels, sw, sh, w, h)
            case None =>
              StubCodec.resize(StubCodec.decodeImage(payload), 8, 8, w, h)
          }
        Row.fromSeq(r.toSeq :+ px)
      }
    }(enc)
  }

  /** 64-bit difference hash (dHash) of an image payload — the standard
    * perceptual near-dup fingerprint for image corpora (row-wise
    * brightness gradient signs over a 9×8 grid): REAL ImageIO decode,
    * integer BT.601 luma `(299r + 587g + 114b) / 1000` (truncating — on
    * gray pixels this is exactly v, which is what makes the whole path
    * ANSI-SQL-replayable), box-pool to 9 columns × 8 rows, and bit
    * (y, x) = 1 iff block mean (x, y) < block mean (x+1, y). Unequal
    * block areas (width not divisible by 9) compare means as
    * cross-multiplied integer fractions `s1·a2 < s2·a1` — exact, no
    * float rounding anywhere. Near-dup pairs then come from
    * `bit_count(dhash XOR dhash)` or the [[Dedup.simhashPairsOn]]
    * pigeonhole at corpus scale (the hash is an ordinary long column).
    *
    * Output: input columns + `dhash: long`, `img_w`, `img_h`;
    * undecodable payloads get NULLs (a perceptual hash of a stub decode
    * would MEAN something false — unlike decodeResize's plumbing
    * fallback, a null here is the honest route-to-review signal).
    * Partition-local mapPartitions batch, no shuffle.
    */
  def imageDHash(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("dhash", LongType), StructField("img_w", IntegerType),
      StructField("img_h", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val img =
          if (payload == null || payload.isEmpty) null
          else
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload))
            catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        else Row.fromSeq(r.toSeq ++ Seq(
          dHashOfImage(img), img.getWidth, img.getHeight))
      }
    }(enc)
  }

  /** The exact-integer dHash core (see [[imageDHash]]); exposed for spec
    * vectors.
    */
  private[operators] def dHashOfImage(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    // 9×8 block integer-luma sums + areas (box ranges as in
    // ImageIoCodec.resize, but exact integer arithmetic)
    val sums = new Array[Long](9 * 8)
    val areas = new Array[Long](9 * 8)
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 9) {
        val x0 = bx * w / 9; val x1 = math.max(x0 + 1, (bx + 1) * w / 9)
        val y0 = by * h / 8; val y1 = math.max(y0 + 1, (by + 1) * h / 8)
        var s = 0L
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val rgb = img.getRGB(x, y)
            s += (299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
              114L * (rgb & 0xFF)) / 1000L
            x += 1
          }
          y += 1
        }
        sums(by * 9 + bx) = s
        areas(by * 9 + bx) =
          (math.min(x1, w) - x0).toLong * (math.min(y1, h) - y0)
        bx += 1
      }
      by += 1
    }
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val l = y * 9 + x; val rr = l + 1
        // mean(l) < mean(r) ⟺ s_l·a_r < s_r·a_l (exact integer compare)
        if (sums(l) * areas(rr) < sums(rr) * areas(l))
          hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Average-hash (aHash) variant of [[imageDHash]] — bit (y,x) set iff
    * the 8×8 block's mean luma EXCEEDS the global mean (strictly; the
    * compare is the exact integer cross-product `s_b·A > S·a_b`, no
    * float means anywhere). aHash catches global-structure duplicates
    * (crops/recompressions shifting absolute brightness little) where
    * dHash tracks local gradients — production near-dup screens run
    * both and OR the hamming gates. Same honesty contract: undecodable
    * payloads yield NULLs; partition-local mapPartitions, no shuffle.
    * Output: input columns + `ahash, img_w, img_h`.
    */
  def imageAHash(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("ahash", LongType), StructField("img_w", IntegerType),
      StructField("img_h", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val img =
          if (payload == null || payload.isEmpty) null
          else
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload))
            catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        else Row.fromSeq(r.toSeq ++ Seq(
          aHashOfImage(img), img.getWidth, img.getHeight))
      }
    }(enc)
  }

  /** The exact-integer aHash core (see [[imageAHash]]); exposed for spec
    * vectors.
    */
  private[operators] def aHashOfImage(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    val sums = new Array[Long](8 * 8)
    val areas = new Array[Long](8 * 8)
    var totalS = 0L
    var totalA = 0L
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        val x0 = bx * w / 8; val x1 = math.max(x0 + 1, (bx + 1) * w / 8)
        val y0 = by * h / 8; val y1 = math.max(y0 + 1, (by + 1) * h / 8)
        var s = 0L
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val rgb = img.getRGB(x, y)
            s += (299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
              114L * (rgb & 0xFF)) / 1000L
            x += 1
          }
          y += 1
        }
        val a = (math.min(x1, w) - x0).toLong * (math.min(y1, h) - y0)
        sums(by * 8 + bx) = s
        areas(by * 8 + bx) = a
        totalS += s
        totalA += a
        bx += 1
      }
      by += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      // mean(block) > mean(all) ⟺ s_b·A > S·a_b (exact integer compare)
      if (sums(i) * totalA > totalS * areas(i)) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** Audio decode in one partition-local batch pass. Output schema: input
    * columns + `samples: array<float>` (mono-mixed, [-1,1]),
    * `sample_rate: int`, `audio_channels: int`, `audio_ms: long`. WAV/PCM
    * decodes for real via [[WavCodec]]; G.711 µ-law/A-law and IMA ADPCM
    * WAVs decode for real via [[AudioCodecs]]; unparseable payloads fall
    * back to a deterministic stub tone (256 samples at 8 kHz) so
    * synthetic fixtures keep flowing through the same plumbing.
    */
  def decodeAudio(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("samples", ArrayType(FloatType)),
      StructField("sample_rate", IntegerType),
      StructField("audio_channels", IntegerType),
      StructField("audio_ms", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val extra: Seq[Any] =
          if (payload == null) Seq(null, null, null, null)
          else WavCodec.decodeWav(payload)
            .orElse(AudioCodecs.decodeWav(payload)) match {
            case Some((s, rate, ch, ms)) => Seq(s, rate, ch, ms)
            case None =>
              val fake = StubCodec.featurize(payload, 256).map(x => x * 2f - 1f)
              Seq(fake, 8000, 1, 32L) // 256 samples @ 8 kHz
          }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(enc)
  }

  /** Scalar audio-quality features for corpus curation — the audio
    * analogue of the text quality scores: filter silent / clipped /
    * constant-tone recordings before they reach training. Decodes via
    * [[decodeAudio]] (real WAV path, stub fallback), then reduces the
    * sample array with NATIVE higher-order functions (`aggregate` /
    * `zip_with` / `filter` — codegen'd, array-local, no UDF, no shuffle):
    *
    *  - `n_samples`, `sample_rate`, `audio_channels`, `audio_ms` — from
    *    the decode;
    *  - `rms` — root-mean-square amplitude in [0,1], computed in DOUBLE
    *    (float squares lose bits past 2^24);
    *  - `peak_abs` — max |sample|, clipping detector at ≈1.0;
    *  - `zero_crossings` — sign changes (s ≥ 0 vs s < 0) between
    *    consecutive samples; ZCR ≈ 2·f/rate is the classic cheap pitch /
    *    noisiness proxy.
    *
    * Features are over the MONO-MIXED samples (decodeAudio's contract);
    * the heavy `samples` array is dropped from the output.
    */
  def audioFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    val dec = decodeAudio(df, payloadCol)
    dec
      .withColumn("n_samples", size(col("samples")))
      .withColumn("rms",
        when(col("n_samples") > 0, sqrt(
          expr("aggregate(samples, cast(0 as double), " +
            "(acc, x) -> acc + cast(x as double) * cast(x as double))") /
            col("n_samples")))
          .otherwise(lit(0.0)))
      .withColumn("peak_abs",
        when(col("n_samples") > 0,
          expr("array_max(transform(samples, x -> abs(cast(x as double))))"))
          .otherwise(lit(0.0)))
      .withColumn("zero_crossings",
        when(col("n_samples") >= 2,
          expr("size(filter(zip_with(" +
            "slice(samples, 1, size(samples) - 1), " +
            "slice(samples, 2, size(samples) - 1), " +
            "(a, b) -> (a >= 0) != (b >= 0)), x -> x))"))
          .otherwise(lit(0)))
      .drop("samples")
  }

  /** Embedding column from media payloads — feeds straight into
    * [[Similarity]] (ANN / near-dup) like any text embedding. Decodable
    * images get a REAL perceptual feature: the box-averaged √dim × √dim
    * grayscale raster, L2-normalized — the classic aHash-style embedding,
    * so visually similar images land near each other in cosine space.
    * Non-image payloads fall back to the deterministic stub.
    */
  def featurize(df: DataFrame, payloadCol: String, dim: Int = 64): DataFrame = {
    val side = math.sqrt(dim).toInt
    require(side * side == dim, s"dim must be a perfect square, got $dim")
    val outSchema = StructType(df.schema.fields :+
      StructField("embedding", ArrayType(FloatType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val e =
          if (payload == null) null
          else ImageIoCodec.decodeImage(payload) match {
            case Some((px, w, h)) =>
              val v = ImageIoCodec.resize(px, w, h, side, side)
              val norm = math.sqrt(v.foldLeft(0.0)((s, x) => s + x * x)).toFloat
              if (norm == 0f) v else v.map(_ / norm)
            case None => StubCodec.featurize(payload, dim)
          }
        Row.fromSeq(r.toSeq :+ e)
      }
    }(enc)
  }

  /** Frame sampling for video payloads: one output row per sampled frame,
    * `(… , frame_no: int, frame: binary)`. Partition-local explode — row
    * count grows but nothing shuffles. Animated GIFs decode for REAL via
    * [[GifCodec]] and MJPEG-in-AVI via [[AviMjpegCodec]] (each sampled
    * frame is a standalone PNG, ready for [[decodeResize]]); Annex-B
    * H.264 and MP4-contained AVC decode their Baseline-intra keyframes
    * via [[H264Codec]]/[[Mp4AvcCodec]]; remaining entropy-coded shapes
    * (CABAC, inter frames, VP9 pixels) fall back to the deterministic
    * byte-slice stub (`frameBytes` applies only to that stub path).
    */
  def sampleFrames(df: DataFrame, payloadCol: String,
                   frameBytes: Int, everyN: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_no", IntegerType),
      StructField("frame", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val frames = GifCodec.sampleFrames(payload, everyN)
          .orElse(AviMjpegCodec.sampleFrames(payload, everyN))
          .orElse(H264Codec.sampleFrames(payload, everyN))
          .orElse(Mp4AvcCodec.sampleFrames(payload, everyN))
          .getOrElse(StubCodec.sampleFrames(payload, frameBytes, everyN))
        frames.zipWithIndex.map {
          case (frame, i) => Row.fromSeq(r.toSeq ++ Seq(i, frame))
        }
      }
    }(enc)
  }

  /** Exact payload dedup — binary columns group directly on content hash. */
  def dedupPayloads(df: DataFrame, payloadCol: String, idCol: String): DataFrame =
    df.groupBy(sha2(col(payloadCol), 256).as("payload_sha256"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** 64-bit aHash perceptual fingerprint (classic public average-hash):
    * decode → 8×8 box-averaged grayscale → bit i set iff pixel i exceeds
    * the image mean. Visually-similar images (recompression, mild noise,
    * small edits) land within a few bits of each other; NULL payloads
    * hash NULL; non-image payloads hash their deterministic stub feature
    * the same way, so mixed-media tables still dedup deterministically.
    * Adds `phash: long`.
    */
  def perceptualHash64(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("phash", org.apache.spark.sql.types.LongType))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val h: Any =
          if (payload == null) null
          else {
            val px = ImageIoCodec.decodeImage(payload) match {
              case Some((p, w, hh)) => ImageIoCodec.resize(p, w, hh, 8, 8)
              case None => StubCodec.featurize(payload, 64)
            }
            val mean = px.sum / px.length
            var bits = 0L
            var i = 0
            while (i < 64) {
              if (px(i) > mean) bits |= (1L << i)
              i += 1
            }
            bits
          }
        Row.fromSeq(r.toSeq :+ h)
      }
    }(enc)
  }

  /** Scene-change keyframe selection: decode every frame
    * ([[sampleFrames]] with everyN = 1 — REAL decode for animated GIF and
    * MJPEG-AVI), then keep a frame iff its aHash differs from the LAST
    * KEPT frame by more than `minHamming` bits (frame 0 always kept) —
    * the standard shot-boundary reduction that turns minutes of video
    * into a handful of training frames. Per-payload sequential scan
    * inside one partition-local pass; no shuffle.
    *
    * Output: input row + `(frame_no: int, frame: binary)` for kept
    * frames only.
    */
  def keyframes(df: DataFrame, payloadCol: String, minHamming: Int = 4,
                frameBytes: Int = 1024): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_no", IntegerType),
      StructField("frame", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    def hashOf(frame: Array[Byte]): Long = {
      val px = ImageIoCodec.decodeImage(frame) match {
        case Some((p, w, h)) => ImageIoCodec.resize(p, w, h, 8, 8)
        case None => StubCodec.featurize(frame, 64)
      }
      val mean = px.sum / px.length
      var bits = 0L
      var i = 0
      while (i < 64) { if (px(i) > mean) bits |= (1L << i); i += 1 }
      bits
    }
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val frames = GifCodec.sampleFrames(payload, 1)
          .orElse(AviMjpegCodec.sampleFrames(payload, 1))
          .orElse(H264Codec.sampleFrames(payload, 1))
          .getOrElse(StubCodec.sampleFrames(payload, frameBytes, 1))
        var lastKept = Long.MinValue
        var first = true
        frames.zipWithIndex.flatMap { case (frame, i) =>
          val h = hashOf(frame)
          val keep = first || java.lang.Long.bitCount(h ^ lastKept) > minHamming
          if (keep) { lastKept = h; first = false
            Some(Row.fromSeq(r.toSeq ++ Seq(i, frame)))
          } else None
        }
      }
    }(enc)
  }

  /** Near-duplicate image pairs at aHash hamming ≤ `maxHamming` —
    * composes the SimHash pigeonhole banding ([[Dedup.simhashPairsOn]]:
    * 4 × 16-bit chunks, so completeness is GUARANTEED for maxHamming ≤ 3
    * and capped-bucket-approximate above), never an image×image cross
    * join. The cross-modal face of the text near-dup tier.
    */
  def perceptualPairs(df: DataFrame, payloadCol: String, idCol: String,
                      maxHamming: Int = 3,
                      maxBucketSize: Int = 512): DataFrame =
    Dedup.simhashPairsOn(
      perceptualHash64(df, payloadCol)
        .filter(col("phash").isNotNull)
        .select(col(idCol).cast("long").as("id"), col("phash").as("fp")),
      maxHamming, maxBucketSize)
}
