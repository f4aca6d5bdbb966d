package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("decodeBatch parses GENUINE PNG/JPEG containers against the closed-form synthesis (q254)") {
    import Multimodal.{grayAt, imgDims}
    val media = Multimodal.toImageTable(Tables.documents(spark, sfDir))
    val rows = Multimodal.decodeBatch(media).collect()
    assert(rows.nonEmpty)
    val nChars = Tables.documents(spark, sfDir)
      .select($"doc_id", $"n_chars".cast("long")).as[(Long, Long)].collect().toMap
    rows.foreach { d =>
      val (w, h) = imgDims(d.media_id, nChars(d.media_id))
      assert(d.width == w && d.height == h, s"dims must round-trip for ${d.media_id}")
      val expected = (0L until w.toLong * h).map(i => grayAt(d.media_id, i).toLong).sum
      if (d.media_id % 2 == 0) {
        assert(d.format == "png")
        assert(d.gray_sum == expected, s"PNG luma must round-trip EXACTLY for ${d.media_id}")
      } else {
        assert(d.format == "jpeg")
        // lossy DCT: the luma sum drifts, but boundedly — pin the mean
        // per-pixel error well inside the 0..255 range
        val perPixel = math.abs(d.gray_sum - expected).toDouble / (w.toLong * h)
        assert(perPixel < 48.0, s"JPEG per-pixel luma drift $perPixel too large for ${d.media_id}")
      }
    }
  }

  test("decodeBatch REJECTS non-image payloads (quarantine contract)") {
    // toMediaTable carries raw text bytes — ImageIO must refuse them with
    // the documented IllegalArgumentException, not decode garbage.
    val docs = Seq((1L, "not an image at all")).toDF("doc_id", "text")
    val media = Multimodal.toMediaTable(docs).as[Multimodal.MediaRecord]
    val e = intercept[Exception](Multimodal.decodeBatch(media).collect())
    def rootMsg(t: Throwable): String =
      if (t.getCause == null || t.getCause == t) String.valueOf(t.getMessage)
      else rootMsg(t.getCause)
    assert(rootMsg(e).contains("not a decodable image"))
  }

  test("mapPartitions feature extraction equals the expression twin (q82)") {
    val media = Multimodal.toMediaTable(Tables.documents(spark, sfDir))
      // include a supplementary-plane row: one emoji must be ONE codepoint
      // in both paths (the UTF-16 code-unit trap)
      .unionByName(Multimodal.toMediaTable(
        Seq((100001L, "😀 beyond the basic plane 😀 text")).toDF("doc_id", "text")))
    val seam = Multimodal.featureBatch(media.as[Multimodal.MediaRecord])
      .flatMap(f => f.features.zipWithIndex.map { case (w, b) =>
        (f.media_id, b.toLong, BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) })
      .toDF("media_id", "bin", "weight")
    val twin = Multimodal.featureTwin(media)
    assert(seam.exceptAll(twin).count() == 0)
    assert(twin.exceptAll(seam).count() == 0)
  }

  test("resize preserves aspect ratio and guards degenerate dims") {
    val decoded = Seq((1L, 640L, 480L), (2L, 100L, 400L), (3L, 0L, 200L))
      .toDF("media_id", "width", "height")
    val got = Multimodal.resizePlan(decoded, 256)
      .select("media_id", "out_w", "out_h").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((256L, 192L)))  // landscape: width hits the box
    assert(got(2L) == ((64L, 256L)))   // portrait: height hits the box
    assert(got(3L) == ((0L, 0L)))      // degenerate input never divides by 0
  }

  test("frame sampling respects the stride") {
    val media = Multimodal.toMediaTable(Tables.documents(spark, sfDir))
    val frames = Multimodal.frameSample(media, 4)
      .select("frame_idx").as[Int].collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_ % 4 == 0))
  }

  test("q173 WAV codec: round trip, unknown-chunk tolerance, odd-length pad, corrupt magic rejected") {
    import operators.MediaCodec
    val samples = Array.tabulate(37)(i => (i * 257).toShort)
    val wav = MediaCodec.wavBytes(11025, samples)
    assert(wav.length == 44 + 74)
    val meta = MediaCodec.parseWav(wav)
    assert(meta == MediaCodec.WavMeta(11025, 1, 16, 37))

    // splice an unknown ODD-length chunk between WAVE and fmt — a real
    // RIFF reader must skip it including the pad byte
    val junk = java.nio.ByteBuffer.allocate(8 + 5 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    junk.put("LIST".getBytes("US-ASCII")).putInt(5)
      .put(Array[Byte](1, 2, 3, 4, 5)).put(0: Byte)
    val spliced = wav.take(12) ++ junk.array() ++ wav.drop(12)
    assert(MediaCodec.parseWav(spliced) == meta)

    val corrupt = wav.clone(); corrupt(3) = 'X'.toByte // RIFX
    intercept[IllegalArgumentException](MediaCodec.parseWav(corrupt))
    intercept[IllegalArgumentException](MediaCodec.parseWav(wav.take(10)))
  }

  test("q173 BMP codec: round trip with stride padding, top-down height, corrupt magic rejected") {
    import operators.MediaCodec
    // w=5 → row 15 bytes → stride 16: the padding case
    val bmp = MediaCodec.bmpBytes(5, 3, Array[Byte](10, 20, 30))
    assert(bmp.length == 54 + 16 * 3)
    val meta = MediaCodec.parseBmp(bmp)
    assert(meta == MediaCodec.BmpMeta(5, 3, 24, 54 + 48, topDown = false))

    // flip the height sign in the info header (offset 22, little-endian)
    val td = bmp.clone()
    val bb = java.nio.ByteBuffer.wrap(td).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -3)
    val m2 = MediaCodec.parseBmp(td)
    assert(m2.height == 3 && m2.topDown)

    val corrupt = bmp.clone(); corrupt(0) = 'X'.toByte
    intercept[IllegalArgumentException](MediaCodec.parseBmp(corrupt))
    intercept[IllegalArgumentException](MediaCodec.parseBmp(bmp.take(40)))
  }

  test("wavSamples decodes the exact PCM16 waveform; imagePixels the exact PNG raster") {
    import operators.{MediaCodec, Multimodal => M}
    // PCM round trip is sample-exact, including negative amplitudes
    val samples = Array.tabulate(41)(i => ((i - 20) * 797).toShort)
    val wav = MediaCodec.wavBytes(8000, samples)
    assert(MediaCodec.wavSamples(wav).toSeq == samples.toSeq)
    // chunk-walk reuse: an unknown chunk before data must be skipped
    val junk = java.nio.ByteBuffer.allocate(8 + 6).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    junk.put("LIST".getBytes("US-ASCII")).putInt(6).put(Array[Byte](9, 8, 7, 6, 5, 4))
    val spliced = wav.take(12) ++ junk.array() ++ wav.drop(12)
    assert(MediaCodec.wavSamples(spliced).toSeq == samples.toSeq)
    intercept[IllegalArgumentException](MediaCodec.wavSamples(wav.take(10)))
    // PNG raster round trip is pixel-exact against the synthesis formula
    val (w, h, id) = (13, 7, 42L)
    val png = MediaCodec.grayImageBytes("png", w, h, i => M.grayAt(id, i))
    val (meta, px) = MediaCodec.imagePixels(png)
    assert(meta.width == w && meta.height == h && meta.format == "png")
    (0 until w * h).foreach(i => assert(px(i) == M.grayAt(id, i), s"pixel $i"))
  }

  test("q258 AVI codec: demux round trip, header cross-check, corrupt magic rejected") {
    import operators.MediaCodec
    // three real PNG frames with distinct content, one odd-length
    val frames = (0 until 3).map(f =>
      MediaCodec.grayImageBytes("png", 9, 5, i => (f * 50 + i) % 256))
    val avi = MediaCodec.aviBytes(9, 5, frames)
    val (meta, got) = MediaCodec.parseAvi(avi)
    assert(meta == MediaCodec.AviMeta(9, 5, 3))
    assert(got.length == 3)
    got.zip(frames).foreach { case (a, b) => assert(a.toSeq == b.toSeq, "frame bytes must round-trip") }
    // each demuxed frame decodes as the original raster
    got.zipWithIndex.foreach { case (f, i) =>
      val im = MediaCodec.parseImage(f)
      assert(im.format == "png" && im.width == 9 && im.height == 5)
      assert(im.graySum == (0 until 45).map(p => (i * 50 + p) % 256).sum)
    }
    // header/chunk mismatch: declare 4 frames but carry 3 → rejected
    val lying = avi.clone()
    val bb = java.nio.ByteBuffer.wrap(lying).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // avih dwTotalFrames lives at RIFF(12) + LIST hdr(12) + 'avih'+len(8) + 16
    bb.putInt(12 + 12 + 8 + 16, 4)
    intercept[IllegalArgumentException](MediaCodec.parseAvi(lying))
    val corrupt = avi.clone(); corrupt(8) = 'X'.toByte // form type 'AVI ' → 'XVI '
    intercept[IllegalArgumentException](MediaCodec.parseAvi(corrupt))
    intercept[IllegalArgumentException](MediaCodec.parseAvi(avi.take(10)))
  }

  test("q173 every decoded row carries real parsed metadata at gate scale") {
    val out = SparkEntry.queries("q173_media_decode")(spark, sfDir)
    val rows = out.as[(Long, String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach {
      case (_, "wav", w, h, sr, ns, nb, dur) =>
        assert(w == -1 && h == -1 && sr > 0 && ns > 0)
        assert(nb == 44 + 2 * ns, "WAV size must equal header + PCM data")
        assert(dur == ns * 1000 / sr)
      case (_, "bmp", w, h, sr, ns, nb, dur) =>
        assert(sr == -1 && ns == -1 && dur == -1 && w > 0 && h > 0)
        assert(nb == 54 + (w * 3 + 3) / 4 * 4 * h, "BMP size must honor row stride")
      case r => fail(s"unexpected container in $r")
    }
  }
}
