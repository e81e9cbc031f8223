package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.MultimodalKernels

/** m5/m6 run REAL JDK codecs; these tests pin that reality — the
  * payloads are genuine PNG / RIFF-WAVE containers (magic bytes), the
  * roundtrip is lossless for arbitrary byte content, and the decoded
  * metadata matches the arithmetic the DuckDB oracle uses. */
class MultimodalKernelSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(11)
  private val payloads: Seq[Array[Byte]] =
    Seq(Array.empty[Byte], Array[Byte](0), Array.fill(31)(7.toByte),
      Array.fill(32)(255.toByte), Array.fill(33)(1.toByte)) ++
      Seq.fill(20)(Array.fill(rnd.nextInt(600))(rnd.nextInt(256).toByte))

  test("m5 payloads are real PNGs (signature) and the roundtrip is lossless") {
    payloads.foreach { bytes =>
      val png = MultimodalKernels.encodePng(bytes)
      // the 8-byte PNG signature, then IHDR
      assert(png.take(8).toSeq == Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
        .map(_.toByte), "not a PNG container")
      assert(new String(png.slice(12, 16), "US-ASCII") == "IHDR")
      val (w, h, sum) = MultimodalKernels.decodePng(png)
      assert(w == 32)
      assert(h == math.max(1, (bytes.length + 31) / 32))
      val expected = bytes.foldLeft(0L)((s, b) => (s + (b & 0xff)) % 1000000007L)
      assert(sum == expected, s"pixel sum $sum != byte sum $expected (len ${bytes.length})")
    }
  }

  test("m2 decoded pixel array is the zero-padded byte sequence (lossless raster)") {
    payloads.foreach { bytes =>
      val (w, h, px) = MultimodalKernels.decodePngPixels(MultimodalKernels.encodePng(bytes))
      assert(w == 32 && h == math.max(1, (bytes.length + 31) / 32))
      assert(px.length == (w * h).toInt)
      bytes.zipWithIndex.foreach { case (b, i) =>
        assert(px(i) == (b & 0xff), s"pixel $i diverged from byte $i")
      }
      (bytes.length until px.length).foreach(i =>
        assert(px(i) == 0, s"padding pixel $i not zero"))
    }
  }

  test("m2 linear features match a hand-computed projection on a tiny payload") {
    // bytes 10, 20, 30 → feature_j = w(j,0)·10 + w(j,1)·20 + w(j,2)·30
    // with w(j,b) = ((7j + 3b + 1) mod 13) − 6; padding contributes 0.
    // j=0: w=(1−6, 4−6, 7−6)=(−5,−2,1) → −50−40+30 = −60
    // j=1: w=((8%13)−6, (11%13)−6, (14%13)−6)=(2,5,−5) → 20+100−150 = −30
    val bytes = Array[Byte](10, 20, 30)
    val (_, _, px) = MultimodalKernels.decodePngPixels(MultimodalKernels.encodePng(bytes))
    val w = graft.queries.MultimodalQueries.m2Weights
    def feature(j: Int): Long =
      px.zipWithIndex.map { case (p, i) => w(j)(i % 16).toLong * p }.sum
    assert(feature(0) == -60L)
    assert(feature(1) == -30L)
    // every dim: the projection over the decoded raster equals the
    // projection over the raw bytes (zero padding is invisible)
    (0 until graft.queries.MultimodalQueries.m2Dims).foreach { j =>
      val overBytes = bytes.zipWithIndex
        .map { case (b, i) => w(j)(i % 16).toLong * (b & 0xff) }.sum
      assert(feature(j) == overBytes)
    }
  }

  test("m4 area-average resize matches an independent reference on decoded pixels") {
    // independent reference: rebuild the lossless pixel grid straight
    // from the payload (pixel y*32+x = byte, zero pad) and floor-mean
    // each 2x2 block (denominator 2 on a clipped bottom row) — the
    // same arithmetic the DuckDB twin spells in SQL
    def reference(bytes: Array[Byte]): (Long, Long, Long) = {
      val h = math.max(1, (bytes.length + 31) / 32)
      def px(y: Int, x: Int): Long = {
        val i = y * 32 + x
        if (i < bytes.length) (bytes(i) & 0xff).toLong else 0L
      }
      val rh = (h + 1) / 2
      var sum = 0L
      for (j <- 0 until rh; i <- 0 until 16) {
        val full = 2 * j + 1 < h
        val block = px(2 * j, 2 * i) + px(2 * j, 2 * i + 1) +
          (if (full) px(2 * j + 1, 2 * i) + px(2 * j + 1, 2 * i + 1) else 0L)
        sum = (sum + block / (if (full) 4 else 2)) % 1000000007L
      }
      (16L, rh.toLong, sum)
    }
    payloads.foreach { bytes =>
      val (w, h, rw, rh, rsum) = MultimodalKernels.resizePngAreaAvg(
        MultimodalKernels.encodePng(bytes))
      val (erw, erh, esum) = reference(bytes)
      assert(w == 32 && h == math.max(1, (bytes.length + 31) / 32))
      assert((rw, rh) == (erw, erh), s"geometry (len ${bytes.length})")
      assert(rsum == esum, s"resized sum $rsum != reference $esum (len ${bytes.length})")
    }
    // a hand-computable case: rows (10,20,...) and (30,40,...) -> the
    // first output pixel is floor((10+20+30+40)/4) = 25
    val crafted = (Array.fill(16)(Array[Byte](10, 20)).flatten ++
      Array.fill(16)(Array[Byte](30, 40)).flatten)
    val (_, h2, _, rh2, s2) = MultimodalKernels.resizePngAreaAvg(
      MultimodalKernels.encodePng(crafted))
    assert(h2 == 2 && rh2 == 1)
    assert(s2 == 16L * 25L)
  }

  test("m10 payloads are real TIFFs (magic) and 16-bit samples roundtrip exactly") {
    (payloads :+ Array[Byte](0, 127, -1)).foreach { bytes =>
      val tiff = MultimodalKernels.encodeTiff16(bytes)
      // TIFF magic: "II*\0" (little-endian) or "MM\0*" (big-endian)
      val magic = tiff.take(4).toSeq
      assert(magic == Seq[Byte](0x49, 0x49, 0x2a, 0x00)
        || magic == Seq[Byte](0x4d, 0x4d, 0x00, 0x2a), "not a TIFF container")
      val (w, h, depth, sum) = MultimodalKernels.decodeTiff16(tiff)
      assert(w == 32)
      assert(h == math.max(1, (bytes.length + 31) / 32))
      // the decoded raster must really carry 16-bit samples — an
      // 8-bit downconversion would still pass a mod-257 sum check
      assert(depth == 16, s"decoded bit depth $depth")
      val expected = bytes.foldLeft(0L)((s, b) => (s + (b & 0xff) * 257L) % 1000000007L)
      assert(sum == expected, s"16-bit sum $sum != expected $expected (len ${bytes.length})")
      // the 0xff byte maps to the full 16-bit range end (65535), so
      // the top byte of every sample is exercised, not just the low 8
    }
  }

  test("m6 payloads are real RIFF/WAVE containers and PCM roundtrips exactly") {
    payloads.foreach { bytes =>
      val wav = MultimodalKernels.encodeWav(bytes)
      assert(new String(wav.take(4), "US-ASCII") == "RIFF", "not a RIFF container")
      assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
      val (rate, channels, frames, sum) = MultimodalKernels.decodeWav(wav)
      assert(rate == 8000L && channels == 1L)
      assert(frames == bytes.length.toLong)
      val expected = bytes.foldLeft(0L)((s, b) => (s + (b & 0xff)) % 1000000007L)
      assert(sum == expected)
    }
  }

  test("m7 payloads are real JPEGs and the lossy roundtrip is bounded-error") {
    var worstMae = 0.0
    payloads.foreach { bytes =>
      val jpg = MultimodalKernels.encodeJpeg(bytes)
      // SOI marker, then a JFIF/EXIF APPn segment
      assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8, "not a JPEG (no SOI)")
      val (w, h, px) = MultimodalKernels.decodeJpeg(jpg)
      assert(w == 32)
      assert(h == math.max(1, (bytes.length + 31) / 32))
      assert(px.length == (w * h).toInt)
      var err = 0L
      var i = 0
      while (i < bytes.length) { err += math.abs(px(i) - (bytes(i) & 0xff)); i += 1 }
      val mae = if (bytes.isEmpty) 0.0 else err.toDouble / bytes.length
      worstMae = math.max(worstMae, mae)
      // m7's oracle gate is MAE <= 8; uniform-random bytes are the
      // worst case for a DCT codec and still decode within ~2.5 at
      // quality 0.95 — a stride/channel/truncation bug lands near 85
      assert(mae <= 8.0, s"JPEG roundtrip MAE $mae out of tolerance (len ${bytes.length})")
    }
    info(f"worst roundtrip MAE across payloads: $worstMae%.3f (gate: 8.0)")
  }

  test("m8 MJPEG streams demux on frame boundaries and every frame decodes") {
    payloads.foreach { bytes =>
      val stream = MultimodalKernels.encodeMjpeg(bytes)
      val frames = MultimodalKernels.demuxMjpeg(stream)
      val expected = math.max(1, (bytes.length + 127) / 128)
      assert(frames.length == expected,
        s"demux found ${frames.length} frames, expected $expected (len ${bytes.length})")
      assert(frames.map(_.length).sum == stream.length, "demux dropped bytes")
      frames.zipWithIndex.foreach { case (f, k) =>
        assert((f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8, s"frame $k lacks SOI")
        val size = if (k < frames.length - 1) 128
                   else if (bytes.isEmpty) 0
                   else bytes.length - 128 * (frames.length - 1)
        val (w, h, _) = MultimodalKernels.decodeJpeg(f)
        assert(w == 32 && h == math.max(1, (size + 31) / 32),
          s"frame $k decoded ${w}x$h for chunk size $size")
      }
    }
  }

  test("m3 header probe reads SOF geometry without decoding; matches the full decoder on every frame") {
    payloads.foreach { bytes =>
      val frames = MultimodalKernels.demuxMjpeg(MultimodalKernels.encodeMjpeg(bytes))
      frames.zipWithIndex.foreach { case (f, k) =>
        val (pw, ph) = MultimodalKernels.probeJpegDims(f)
        val (dw, dh, _) = MultimodalKernels.decodeJpeg(f)
        assert(pw == dw && ph == dh,
          s"frame $k header probe ${pw}x$ph != decoded ${dw}x$dh")
      }
    }
    // non-JDK encoders place APP/comment segments the JDK never emits —
    // the segment walk must skip them all and still land on the SOF
    Seq("foreign_2x2.jpg" -> (2L, 2L), "foreign_logo.jpg" -> null).foreach {
      case (name, want) =>
        val f = fixture(name)
        val (pw, ph) = MultimodalKernels.probeJpegDims(f)
        val (dw, dh, _) = MultimodalKernels.decodeJpeg(f)
        assert(pw == dw && ph == dh, s"$name header probe ${pw}x$ph != decoded ${dw}x$dh")
        if (want != null) assert((pw, ph) == want, s"$name probed ${pw}x$ph")
    }
    // garbage and truncation fail loudly, never return fabricated dims
    intercept[IllegalArgumentException] {
      MultimodalKernels.probeJpegDims(Array[Byte](1, 2, 3, 4))
    }
    // a stream cut INSIDE the SOF payload (SOI + SOF0 marker + length,
    // then nothing) is the same loud diagnosis, not an index error
    val cutInsideSof = Array(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x11, 0x08)
      .map(_.toByte)
    val e = intercept[IllegalArgumentException] {
      MultimodalKernels.probeJpegDims(cutInsideSof)
    }
    assert(e.getMessage.contains("truncated inside SOF"), e.getMessage)
    // and so is a real frame truncated mid-header (cut 3 bytes in)
    val realFrame =
      MultimodalKernels.demuxMjpeg(MultimodalKernels.encodeMjpeg(Array.fill[Byte](64)(7))).head
    intercept[IllegalArgumentException] {
      MultimodalKernels.probeJpegDims(realFrame.take(5))
    }
  }

  private def fixture(name: String): Array[Byte] = {
    val is = getClass.getResourceAsStream(s"/fixtures/$name")
    assert(is != null, s"missing checked-in fixture $name")
    try is.readAllBytes() finally is.close()
  }

  test("m9 animated GIFs demux to the right frames and pixels roundtrip exactly") {
    payloads.foreach { bytes =>
      val gif = MultimodalKernels.encodeGif(bytes)
      // GIF89a magic — a real container, not a concatenation
      assert(new String(gif.take(6), "US-ASCII") == "GIF89a", "not a GIF89a container")
      val (nf, ns, hSum, pxSum) = MultimodalKernels.decodeGifFrames(gif)
      val wantNf = math.max(1, (bytes.length + 127) / 128)
      assert(nf == wantNf, s"frame count $nf != $wantNf (len ${bytes.length})")
      assert(ns == (wantNf + 1) / 2)
      // sampled-frame geometry: full frames are 4 rows; the last
      // frame's height follows its residual — only counted if sampled
      val resid =
        if (bytes.isEmpty) 0
        else if (bytes.length % 128 == 0) 128 else bytes.length % 128
      val hl = math.max(1, (resid + 31) / 32)
      val wantH = if ((wantNf - 1) % 2 == 0) (ns - 1) * 4 + hl else ns * 4
      assert(hSum == wantH, s"height sum $hSum != $wantH (len ${bytes.length})")
      // LOSSLESS palette roundtrip: sampled frames' pixel sum == the
      // byte sum of the even 128-byte chunks (zero padding adds 0)
      val wantPx = bytes.zipWithIndex.collect {
        case (b, i) if (i / 128) % 2 == 0 => (b & 0xff).toLong
      }.sum % 1000000007L
      assert(pxSum == wantPx, s"pixel sum $pxSum != $wantPx (len ${bytes.length})")
    }
  }

  test("m11 per-frame pixel sums equal the source chunk byte sums exactly") {
    payloads.filter(_.nonEmpty).foreach { bytes =>
      val sums = MultimodalKernels.decodeGifFrameSums(
        MultimodalKernels.encodeGif(bytes))
      val expected = bytes.grouped(128).map(_.foldLeft(0L)((s, b) => s + (b & 0xff))).toSeq
      assert(sums.toSeq == expected,
        s"frame sums ${sums.toSeq} != chunk sums $expected (len ${bytes.length})")
    }
  }

  test("m11 detects a planted scene boundary and nothing inside flat scenes") {
    // two flat 128-byte scenes of very different intensity: exactly one
    // jump, between frames 1 and 2
    val planted = Array.fill(256)(10.toByte) ++ Array.fill(128)(200.toByte)
    val sums = MultimodalKernels.decodeGifFrameSums(
      MultimodalKernels.encodeGif(planted))
    assert(sums.length == 3)
    assert(sums(1) - sums(0) == 0L, "flat scene produced a difference")
    assert(sums(2) - sums(1) == 128L * 190, "planted boundary magnitude wrong")
  }

  test("m12 per-window energies equal the source byte energies exactly") {
    payloads.filter(_.nonEmpty).foreach { bytes =>
      val energies = MultimodalKernels.decodeWavWindowEnergies(
        MultimodalKernels.encodeWav(bytes))
      val expected = bytes.grouped(256).map(_.foldLeft(0L) { (s, b) =>
        val d = (b & 0xff) - 128; s + d.toLong * d
      }).toSeq
      assert(energies.toSeq == expected,
        s"window energies ${energies.toSeq} != $expected (len ${bytes.length})")
    }
  }

  test("m12 separates a planted silence window from a planted loud window") {
    // silence = midpoint samples (zero energy); loud = full-swing
    val planted = Array.fill(256)(128.toByte) ++ Array.fill(256)(0.toByte)
    val e = MultimodalKernels.decodeWavWindowEnergies(
      MultimodalKernels.encodeWav(planted))
    assert(e.length == 2)
    assert(e(0) == 0L, "silence window has nonzero energy")
    assert(e(1) == 256L * 128 * 128, "full-swing window energy wrong")
  }

  test("m13 router sniffs every container kind from bytes alone, unknown falls through") {
    val bytes = Array.fill(300)(7.toByte)
    assert(MultimodalKernels.routeDecode(MultimodalKernels.encodePng(bytes))._1 == "png")
    assert(MultimodalKernels.routeDecode(MultimodalKernels.encodeWav(bytes))._1 == "wav")
    assert(MultimodalKernels.routeDecode(MultimodalKernels.encodeJpeg(bytes))._1 == "jpeg")
    assert(MultimodalKernels.routeDecode(MultimodalKernels.encodeGif(bytes))._1 == "gif")
    assert(MultimodalKernels.routeDecode("not a container".getBytes)._1 == "unknown")
    assert(MultimodalKernels.routeDecode(Array[Byte]())._1 == "unknown")
    // the routed decode is the REAL per-kind decode, not just a label
    val (_, geom, px) = MultimodalKernels.routeDecode(MultimodalKernels.encodeWav(bytes))
    assert(geom == 300L && px == 300L * 7)
  }

  test("m1 describeMedia returns the full decoded record per kind, from bytes alone") {
    val P = 1000000007L
    payloads.foreach { bytes =>
      val byteSum = bytes.foldLeft(0L)((s, b) => (s + (b & 0xff)) % P)
      val h = math.max(1, (bytes.length + 31) / 32)
      assert(MultimodalKernels.describeMedia(MultimodalKernels.encodePng(bytes)) ==
        (("png", 32L, h.toLong, 1L, byteSum)), s"png record (len ${bytes.length})")
      assert(MultimodalKernels.describeMedia(MultimodalKernels.encodeWav(bytes)) ==
        (("wav", bytes.length.toLong, 1L, 1L, byteSum)), s"wav record (len ${bytes.length})")
      // JPEG: exact geometry/channels, sentinel px_check (lossy)
      assert(MultimodalKernels.describeMedia(MultimodalKernels.encodeJpeg(bytes)) ==
        (("jpeg", 32L, h.toLong, 1L, -1L)), s"jpeg record (len ${bytes.length})")
      // GIF: frames stack — height = (nf-1)*4 + last frame's rows
      val nf = math.max(1, (bytes.length + 127) / 128)
      val residual =
        if (bytes.length == 0) 0
        else if (bytes.length % 128 == 0) 128 else bytes.length % 128
      val hl = math.max(1, (residual + 31) / 32)
      assert(MultimodalKernels.describeMedia(MultimodalKernels.encodeGif(bytes)) ==
        (("gif", 32L, ((nf - 1) * 4 + hl).toLong, 1L, byteSum)),
        s"gif record (len ${bytes.length})")
    }
    assert(MultimodalKernels.describeMedia("not a container".getBytes)._1 == "unknown")
  }

  test("m1 describeMedia agrees with the foreign fixtures' independent encoders") {
    // same second-engine discipline as the decode fixtures: the
    // generic describe must read geometry/signal from genuinely
    // foreign bytes, not just the JDK writer's own output
    assert(MultimodalKernels.describeMedia(fixture("foreign_5x3.png")) ==
      (("png", 5L, 3L, 1L, 450L)))
    assert(MultimodalKernels.describeMedia(fixture("foreign_8k.wav")) ==
      (("wav", 39L, 1L, 1L, 4182L)))
    val (kind, w, h, ch, px) = MultimodalKernels.describeMedia(fixture("foreign_2x2.jpg"))
    assert((kind, w, h, px) == (("jpeg", 2L, 2L, -1L)))
    assert(ch >= 1L)
  }

  test("FOREIGN payloads decode to pinned values (encoder-independent)") {
    // Roundtrip tests can't catch a SYMMETRIC encode/decode bug (both
    // sides agreeing on a wrong stride, color model, or byte order).
    // These fixtures were produced by an independent implementation —
    // a pure-python zlib PNG writer and the python stdlib `wave`
    // module (dev/make_fixtures.py, values printed at generation) —
    // so the decoders are checked against a second engine's bytes.
    assert(MultimodalKernels.decodePng(fixture("foreign_5x3.png")) ==
      ((5L, 3L, 450L)), "5x3 grayscale PNG (odd size: stride/transpose check)")
    assert(MultimodalKernels.decodePng(fixture("foreign_32x2.png")) ==
      ((32L, 2L, 2096L)), "32x2 grayscale PNG (encoder-width match)")
    assert(MultimodalKernels.decodeWav(fixture("foreign_8k.wav")) ==
      ((8000L, 1L, 39L, 4182L)), "8 kHz u8 PCM with 0/255 extremes")
    assert(MultimodalKernels.decodeWav(fixture("foreign_16k.wav")) ==
      ((16000L, 1L, 101L, 12399L)), "16 kHz u8 PCM: rate read from header")
  }

  test("FOREIGN JPEGs (external encoders) parse to their known geometry") {
    // Fixtures produced by genuinely foreign encoders (test images
    // shipped with the IPython and CPython source distributions) —
    // proves the decoder handles real-world JPEG streams, not just the
    // JDK writer's output. Pixel values are NOT pinned (lossy decode is
    // IDCT-implementation-specific); geometry and signal presence are.
    val (w1, h1, px1) = MultimodalKernels.decodeJpeg(fixture("foreign_2x2.jpg"))
    assert((w1, h1) == ((2L, 2L)), s"2x2.jpg decoded as ${w1}x$h1")
    assert(px1.length == 4)
    val (w2, h2, px2) = MultimodalKernels.decodeJpeg(fixture("foreign_logo.jpg"))
    assert((w2, h2) == ((16L, 16L)), s"logo decoded as ${w2}x$h2")
    assert(px2.exists(_ > 0), "logo decoded to all-black — band wiring broken")
  }
}
