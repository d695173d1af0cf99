package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.ext.Multimodal

class RelationalSpec extends SparkTestBase {
  import spark.implicits._

  test("unionAll aligns by name and fills missing columns with null") {
    val a = Seq((1, "x")).toDF("k", "only_a")
    val b = Seq((2, 9.5)).toDF("k", "only_b")
    val got = Relational.unionAll(Seq(a, b))
    assert(got.columns.toSet == Set("k", "only_a", "only_b"))
    assert(got.count() == 2)
    assert(rows(got) == Set(Seq(1, "x", null), Seq(2, null, 9.5)))
  }

  test("rangedScan is inclusive-exclusive") {
    val df = Seq("2024-01-01 00:00:00", "2024-01-15 12:00:00", "2024-02-01 00:00:00")
      .toDF("s").select(to_timestamp(col("s")).as("ts"))
    val got = Relational.rangedScan(df, "ts", "2024-01-01", "2024-02-01")
    assert(got.count() == 2)
  }

  test("topK with unique tie-break is deterministic") {
    val df = Seq((1, 10.0), (2, 10.0), (3, 5.0)).toDF("id", "v")
    val got = Relational.topK(df, 2, Seq(col("v").desc, col("id").asc))
      .as[(Int, Double)].collect().toSeq
    assert(got == Seq((1, 10.0), (2, 10.0)))
  }

  import RelationalSpec.fakeDecode

  test("multimodal: decodeBatched seam is deterministic and sampleFrames strides") {
    val media = Multimodal.asMediaTable(Seq((1L, "abcdef")).toDF("id", "payload"), "id", "payload", "txt")
    val codec: Multimodal.BatchCodec = _.map(fakeDecode)
    val decoded = Multimodal.decodeBatched(media, codec)
    val d1 = decoded.select("decoded.n_frames").as[Int].head()
    val d2 = Multimodal.decodeBatched(media, codec).select("decoded.n_frames").as[Int].head()
    assert(d1 == d2 && d1 == 1 + (6 % 16))
    val frames = Multimodal.sampleFrames(decoded, stride = 4)
      .select("frame_idx").as[Int].collect().toSeq
    assert(frames == Seq(0, 4))
  }

  test("multimodal: decodeBatched honors the batch contract and matches row-wise decode") {
    val media = Multimodal.asMediaTable(
      (1L to 20L).map(i => (i, "p" * i.toInt)).toDF("id", "p"), "id", "p", "img")
      .repartition(2)
    val calls = spark.sparkContext.longAccumulator("codecCalls")
    // contract-checking codec: must see BATCHES (never > batchSize, and for
    // 10 rows/partition at batchSize=4 strictly fewer calls than rows)
    val codec: Multimodal.BatchCodec = { batch =>
      require(batch.nonEmpty && batch.size <= 4, s"bad batch size ${batch.size}")
      calls.add(1)
      batch.map(fakeDecode)
    }
    val got = Multimodal.decodeBatched(media, codec, batchSize = 4)
      .select("media_id", "decoded.width", "decoded.n_frames")
      .as[(Long, Int, Int)].collect().toSet
    val rowWise = Multimodal.decodeBatched(media, _.map(fakeDecode), batchSize = 1)
      .select("media_id", "decoded.width", "decoded.n_frames")
      .as[(Long, Int, Int)].collect().toSet
    assert(got == rowWise)
    assert(calls.value >= 6 && calls.value < 20, s"codec called ${calls.value} times")
  }

  test("multimodal: real PNG encode/decode round-trips dimensions and channels") {
    // RGB and RGBA payloads with known dimensions, plus garbage bytes and a
    // null payload — the decoder must report real properties for the real
    // images and quarantine (ok=false) the rest, never throw
    val spec = Seq(
      (1L, 20, 30, false), (2L, 7, 5, true), (3L, 256, 1, false)
    ).toDF("media_id", "width", "height", "alpha")
    val media = Multimodal.synthesizePngs(spec)
      .unionByName(Seq((4L, Array[Byte](1, 2, 3))).toDF("media_id", "media")
        .withColumn("meta", struct(lit("png").as("format"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          lit(null).cast("int").as("n_frames"))))
      .unionByName(Seq(Tuple1(5L)).toDF("media_id")
        .withColumn("media", lit(null).cast("binary"))
        .withColumn("meta", struct(lit("png").as("format"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          lit(null).cast("int").as("n_frames"))))
    val got = Multimodal.decodeImages(media, batchSize = 2)
      .select("media_id", "decoded.width", "decoded.height", "decoded.n_channels", "decoded.ok")
      .as[(Long, Int, Int, Int, Boolean)].collect().toSet
    assert(got == Set(
      (1L, 20, 30, 3, true), (2L, 7, 5, 4, true), (3L, 256, 1, 3, true),
      (4L, 0, 0, 0, false), (5L, 0, 0, 0, false)))
    // the payload is REAL png: a magic-number check on the raw bytes
    val magic = media.filter(col("media_id") === 1L)
      .select(col("media")).as[Array[Byte]].head().take(4)
    assert(magic.sameElements(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
  }

  test("multimodal: resizeImages does real raster work, pixelProbe proves it") {
    val spec = Seq((1L, 20, 30, false), (2L, 8, 4, true))
      .toDF("media_id", "width", "height", "alpha")
    val resized = Multimodal.resizeImages(Multimodal.synthesizePngs(spec), 5, 3, batchSize = 1)
    val dims = Multimodal.decodeImages(resized)
      .select("media_id", "decoded.width", "decoded.height", "decoded.n_channels", "decoded.ok")
      .as[(Long, Int, Int, Int, Boolean)].collect().toSet
    // target size enforced, channel count preserved (RGB stays 3, RGBA stays 4)
    assert(dims == Set((1L, 5, 3, 3, true), (2L, 5, 3, 4, true)))
    // nearest-neighbor maps target (0,0) to source (0,0): RGB = low 24
    // bits of seed·FNV64prime (the synthesis formula)
    def px(seed: Long, idx: Long) = ((seed * 1099511628211L + idx).toInt) & 0xffffff
    val corner = Multimodal.pixelProbe(resized, 0, 0)
      .as[(Long, Option[Int])].collect().toMap
    assert(corner(1L).contains(px(1L, 0)) && corner(2L).contains(px(2L, 0)))
    // a non-corner probe: target (1,1) of the 20×30 image maps to source
    // (⌊1·20/5⌋, ⌊1·30/3⌋) = (4, 10) → pixel index 10·20 + 4
    val inner = Multimodal.pixelProbe(resized, 1, 1)
      .as[(Long, Option[Int])].collect().toMap
    assert(inner(1L).contains(px(1L, 10 * 20 + 4)))
    // quarantine: undecodable bytes resize to a NULL payload, probe NULL
    val bad = Seq((9L, Array[Byte](1, 2, 3))).toDF("media_id", "media")
      .withColumn("meta", struct(lit("png").as("format"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("int").as("n_frames")))
    assert(Multimodal.resizeImages(bad, 2, 2).select("media").head().isNullAt(0))
    assert(Multimodal.pixelProbe(bad, 0, 0).as[(Long, Option[Int])].head()._2.isEmpty)
  }

  test("multimodal: dHash is a raster hash — re-encodes collide where byte hashes differ; blocked pairs == brute force") {
    // 10/11: the SAME raster (seed 5) encoded RGB vs RGBA — byte-distinct
    // payloads; 12: a different raster; 13: garbage bytes
    val spec = Seq(
      (10L, 20, 16, false, 5L), (11L, 20, 16, true, 5L), (12L, 20, 16, false, 6L)
    ).toDF("media_id", "width", "height", "alpha", "seed")
    val media = Multimodal.synthesizePngs(spec)
      .unionByName(Seq((13L, Array[Byte](9, 9, 9))).toDF("media_id", "media")
        .withColumn("meta", struct(lit("png").as("format"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          lit(null).cast("int").as("n_frames"))))
    val hashes = Multimodal.imageDHash(media, batchSize = 2)
      .as[(Long, Long, Boolean)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // the re-encode pair collides on dHash…
    assert(hashes(10L)._2 && hashes(11L)._2 && hashes(10L)._1 == hashes(11L)._1)
    // …while byte-level md5 (what exact dedup sees) does NOT match
    val md5s = Multimodal.byteStats(media.filter(col("media_id").isin(10L, 11L)))
      .select("payload_md5").as[String].collect()
    assert(md5s.distinct.length == 2)
    // undecodable bytes quarantine, never throw
    assert(hashes(13L) == ((0L, false)))
    // pigeonhole-blocked pairs equal the brute-force all-pairs join
    val pairs = Multimodal.imageNearDupPairs(media, maxHamming = 3)
    val sig = Multimodal.imageDHash(media).filter(col("ok"))
      .select(col("media_id").as("id"), col("dhash").as("sig"))
    val brute = sig.as("a").join(sig.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .filter(col("hamming") <= 3)
    assert(rows(pairs) == rows(brute))
    assert(rows(pairs).contains(Seq(10L, 11L, 0)))
  }

  test("multimodal: JPEG encodes real JFIF bytes; mixed table dispatches by magic bytes") {
    // one table, two formats: decode goes through the ONE decodeImages
    // seam and javax.imageio picks the reader from payload magic, not
    // metadata — format dispatch, not just the PNG plugin
    val spec = Seq(
      (1L, 20, 12, false, "png"), (2L, 9, 7, true, "png"),
      (3L, 20, 12, false, "jpeg"), (4L, 9, 7, false, "jpeg")
    ).toDF("media_id", "width", "height", "alpha", "format")
    val media = Multimodal.synthesizeMedia(spec)
    // real container bytes: PNG magic on png rows, JFIF SOI on jpeg rows
    val magics = media.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .collect().toMap
    assert(magics(1L).take(4).sameElements(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
    assert((magics(3L)(0) & 0xff) == 0xff && (magics(3L)(1) & 0xff) == 0xd8)
    val got = Multimodal.decodeImages(media, batchSize = 2)
      .select("media_id", "decoded.width", "decoded.height", "decoded.n_channels", "decoded.ok")
      .as[(Long, Int, Int, Int, Boolean)].collect().toSet
    // lossless properties are exact for BOTH formats: dimensions, channel
    // count (JPEG is always 3-band; PNG carries alpha), decodability
    assert(got == Set(
      (1L, 20, 12, 3, true), (2L, 9, 7, 4, true),
      (3L, 20, 12, 3, true), (4L, 9, 7, 3, true)))
    // JPEG is lossy: pixels are bounded, not exact — the (0,0) pixel of
    // the smooth gradient must land within a few quantization steps of
    // the encoded color (measured ≤5/channel on the JDK encoder; 16 is
    // the contract)
    def expected(seed: Long): (Int, Int, Int) = {
      val base = (seed * 1099511628211L).toInt & 0xffffff
      (((base >> 16) & 0xff) / 2 + 64, ((base >> 8) & 0xff) / 2 + 64, (base & 0xff) / 2 + 64)
    }
    val probes = Multimodal.pixelProbe(media.filter(col("media_id") >= 3L), 0, 0)
      .as[(Long, Option[Int])].collect().toMap
    for (id <- Seq(3L, 4L)) {
      val (er, eg, eb) = expected(id)
      val v = probes(id).get
      assert(math.abs(((v >> 16) & 0xff) - er) <= 16
        && math.abs(((v >> 8) & 0xff) - eg) <= 16
        && math.abs((v & 0xff) - eb) <= 16,
        s"jpeg pixel off: id=$id got=${v.toHexString} expected≈($er,$eg,$eb)")
    }
    // unsupported format is a loud error, not silent bytes
    val badSpec = Seq((9L, 4, 4, false, "tiff"))
      .toDF("media_id", "width", "height", "alpha", "format")
    intercept[org.apache.spark.SparkException] {
      Multimodal.synthesizeMedia(badSpec).collect()
    }
  }

  test("multimodal: quarantine survives malformed container headers of several formats") {
    // truncated BMP (EOFException), truncated JPEG and malformed GIF
    // (IIOException) — plus whatever RuntimeException a hostile payload
    // provokes: the catch is NonFatal, so decode/resize/probe quarantine
    // rather than die (ADVICE r9)
    val payloads = Seq(
      (1L, Array[Byte](0x42, 0x4d, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)),
      (2L, Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 0, 0, 0, 0)),
      (3L, Array[Byte](0x47, 0x49, 0x46, 0x38, 0x39, 0x61, 1, 0, 1, 0, 0x80.toByte, 0, 0, 1, 2, 3)))
    val media = payloads.toDF("media_id", "media")
      .withColumn("meta", struct(lit("png").as("format"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("int").as("n_frames")))
    val dec = Multimodal.decodeImages(media).select("decoded.ok").as[Boolean].collect()
    assert(dec.length == 3 && dec.forall(!_))
    assert(Multimodal.resizeImages(media, 2, 2).select("media")
      .collect().forall(_.isNullAt(0)))
    assert(Multimodal.pixelProbe(media, 0, 0).as[(Long, Option[Int])]
      .collect().forall(_._2.isEmpty))
  }

  test("multimodal: real WAV encode/decode round-trips header and exact sample aggregates") {
    // mono and stereo, different rates; decoded sum|s|/peak must equal a
    // direct recomputation from the shared wavSample recurrence — 16-bit
    // PCM is lossless, so any container/byte-order/channel-interleave slip
    // in encode OR decode breaks the integer equality
    val spec = Seq((3L, 300, 8000, 1), (5L, 700, 16000, 2), (8L, 256, 12000, 1))
      .toDF("media_id", "n_frames", "sample_rate", "channels")
    val got = Multimodal.decodeAudio(Multimodal.synthesizeWavs(spec), batchSize = 2)
      .select($"media_id", $"decoded.sample_rate", $"decoded.channels",
        $"decoded.n_frames", $"decoded.sum_abs", $"decoded.peak", $"decoded.ok")
      .as[(Long, Int, Int, Long, Long, Int, Boolean)].collect().sortBy(_._1)
    val expected = Seq((3L, 300, 8000, 1), (5L, 700, 16000, 2), (8L, 256, 12000, 1))
      .map { case (id, n, sr, ch) =>
        val samples = (0L until n.toLong * ch).map(k => Multimodal.wavSample(id, k))
        (id, sr, ch, n.toLong, samples.map(s => math.abs(s).toLong).sum,
          samples.map(math.abs).max, true)
      }
    assert(got.toSeq == expected)
  }

  test("multimodal: audioWindowEnergy finds exactly the formula's silent blocks") {
    // id=4: blocks where (4 + w) % 4 == 0 are silent → windows 0, 4, …;
    // 1100 frames at window 256 → 5 windows, last partial (76 frames)
    val spec = Seq((4L, 1100, 16000, 1)).toDF("media_id", "n_frames", "sample_rate", "channels")
    val got = Multimodal.audioWindowEnergy(Multimodal.synthesizeWavs(spec), 256)
      .as[(Long, Int, Int, Long, Boolean)].collect().sortBy(_._2)
    assert(got.map(_._2).toSeq == Seq(0, 1, 2, 3, 4))
    assert(got.map(_._3).toSeq == Seq(256, 256, 256, 256, 76))
    assert(got.filter(_._5).map(_._2).toSeq == Seq(0, 4), "quiet windows are the w≡0 (mod 4) blocks")
    val expect = got.map { case (id, w, nw, _, _) =>
      (0 until nw).map(i => math.abs(Multimodal.wavSample(id, w * 256L + i)).toLong).sum }
    assert(got.map(_._4).toSeq == expect.toSeq, "window energies match the recurrence exactly")
    // stereo and undecodable payloads contribute no windows
    val stereo = Seq((7L, 300, 8000, 2)).toDF("media_id", "n_frames", "sample_rate", "channels")
    assert(Multimodal.audioWindowEnergy(Multimodal.synthesizeWavs(stereo), 256).count() == 0)
  }

  test("multimodal: audio fingerprint — re-containered samples collide; bits match the energy recurrence") {
    // 20/21: SAME samples (seed 5) under different sample-rate headers —
    // byte-distinct payloads; 22: different samples; 23: stereo (excluded)
    val spec = Seq(
      (20L, 700, 8000, 1, 5L), (21L, 700, 12000, 1, 5L),
      (22L, 700, 8000, 1, 6L), (23L, 700, 8000, 2, 5L)
    ).toDF("media_id", "n_frames", "sample_rate", "channels", "seed")
    val media = Multimodal.synthesizeWavs(spec)
    val fp = Multimodal.audioFingerprint(media, windowFrames = 10, batchSize = 2)
      .as[(Long, Long, Int, Boolean)].collect().map(t => t._1 -> (t._2, t._3, t._4)).toMap
    // the re-container pair collides on the fingerprint, bytes differ
    assert(fp(20L)._3 && fp(21L)._3 && fp(20L)._1 == fp(21L)._1)
    assert(fp(20L)._2 == 70)
    val payloads = media.filter(col("media_id").isin(20L, 21L))
      .select("media").as[Array[Byte]].collect()
    assert(!payloads(0).sameElements(payloads(1)))
    // stereo quarantines (frame index != sample index would break alignment)
    assert(fp(23L) == ((0L, 0, false)))
    // bits match the wavSample energy recurrence exactly
    def energy(seed: Long, w: Int): Long =
      (w * 10 until math.min((w + 1) * 10, 700))
        .map(k => math.abs(Multimodal.wavSample(seed, k)).toLong).sum
    val expect = (0 until 64).foldLeft(0L) { (h, w) =>
      if (energy(5L, w + 1) > energy(5L, w)) h | (1L << w) else h }
    assert(fp(20L)._1 == expect)
    // near-dup pairs: blocked == brute force, and the re-container pair is in
    val pairs = Multimodal.audioNearDupPairs(media, windowFrames = 10, maxHamming = 3)
    val sig = Multimodal.audioFingerprint(media, 10).filter(col("ok"))
      .select(col("media_id").as("id"), col("afp").as("sig"))
    val brute = sig.as("a").join(sig.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .filter(col("hamming") <= 3)
    assert(rows(pairs) == rows(brute))
    assert(rows(pairs).contains(Seq(20L, 21L, 0)))
  }

  test("multimodal: audio quarantine and cross-format dispatch") {
    // truncated RIFF header, a PNG payload fed to the audio decoder, null
    val riffJunk = Array[Byte]('R', 'I', 'F', 'F', 4, 0, 0, 0, 'W', 'A', 'V', 'E')
    val png = Multimodal.encodePng(4, 4, alpha = false, seed = 1L)
    val media = Seq((1L, riffJunk), (2L, png)).toDF("media_id", "media")
      .withColumn("meta", struct(lit("wav").as("format"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("int").as("n_frames")))
    val dec = Multimodal.decodeAudio(media).select("decoded.ok").as[Boolean].collect()
    assert(dec.length == 2 && dec.forall(!_))
    assert(Multimodal.audioWindowEnergy(media, 256).count() == 0)
    // and the image decoder quarantines WAV bytes — format dispatch both ways
    val wav = Multimodal.encodeWav(100, 8000, 1, 9L)
    val wavAsImage = Seq((9L, wav)).toDF("media_id", "media")
    assert(!Multimodal.decodeImages(wavAsImage).select("decoded.ok").as[Boolean].head())
  }

  test("multimodal: real animated-GIF encode/decode round-trips frame count and exact pixel aggregates") {
    // indexed GIF is lossless, so decoded per-frame grays must equal the
    // gifFrameGray recurrence exactly — any container walk, palette, or
    // frame-index slip in encode OR decode breaks the integer equality
    val spec = Seq((2L, 10, 7, 6), (3L, 16, 12, 4), (11L, 8, 8, 11))
      .toDF("media_id", "width", "height", "n_frames")
    val got = Multimodal.decodeVideo(Multimodal.synthesizeGifs(spec), batchSize = 2)
      .select($"media_id", $"decoded.width", $"decoded.height",
        $"decoded.n_frames", $"decoded.sum_gray", $"decoded.black_frames", $"decoded.ok")
      .as[(Long, Int, Int, Int, Long, Int, Boolean)].collect().sortBy(_._1)
    val expected = Seq((2L, 10, 7, 6), (3L, 16, 12, 4), (11L, 8, 8, 11))
      .map { case (id, w, h, n) =>
        val grays = (0 until n).map(f => Multimodal.gifFrameGray(id, f))
        (id, w, h, n, grays.map(_.toLong).sum, grays.count(_ == 0), true)
      }
    assert(got.toSeq == expected)
  }

  test("multimodal: videoFrameSample strides by index and lands on the scene-cut frames") {
    // id=6, 10 frames: black frames are f ∈ {2, 6} (where (6+f)%4==0);
    // stride 3 samples f ∈ {0, 3, 6, 9} → exactly one sampled black (f=6)
    val spec = Seq((6L, 9, 9, 10)).toDF("media_id", "width", "height", "n_frames")
    val media = Multimodal.synthesizeGifs(spec)
    val got = Multimodal.videoFrameSample(media, 3)
      .as[(Long, Int, Int, Boolean)].collect().sortBy(_._2)
    assert(got.map(_._2).toSeq == Seq(0, 3, 6, 9))
    assert(got.map(_._3).toSeq == Seq(0, 3, 6, 9).map(Multimodal.gifFrameGray(6L, _)),
      "sampled grays match the recurrence exactly")
    assert(got.filter(_._4).map(_._2).toSeq == Seq(6), "black verdict lands on the (id+f)≡0 (mod 4) cuts")
    // stride 1 decodes every frame — same totals as the full decode
    val all = Multimodal.videoFrameSample(media, 1).as[(Long, Int, Int, Boolean)].collect()
    assert(all.length == 10 && all.map(_._3.toLong).sum ==
      (0 until 10).map(Multimodal.gifFrameGray(6L, _).toLong).sum)
  }

  test("multimodal: video quarantine and cross-format dispatch") {
    // WAV bytes fed to the video decoder, truncated GIF header, null
    val wav = Multimodal.encodeWav(100, 8000, 1, 9L)
    val gifJunk = Array[Byte](0x47, 0x49, 0x46, 0x38, 0x39, 0x61, 2, 0, 2, 0)
    val media = Seq((1L, wav), (2L, gifJunk), (3L, null: Array[Byte]))
      .toDF("media_id", "media")
      .withColumn("meta", struct(lit("gif").as("format"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("int").as("n_frames")))
    val dec = Multimodal.decodeVideo(media).select("decoded.ok").as[Boolean].collect()
    assert(dec.length == 3 && dec.forall(!_))
    assert(Multimodal.videoFrameSample(media, 2).count() == 0)
    // a real GIF payload IS a valid still image to the image seam (frame 0)
    // — javax.imageio dispatches on magic bytes, and that is the contract
    val gif = Multimodal.encodeGif(5, 4, 3, 7L)
    val asImage = Seq((7L, gif)).toDF("media_id", "media")
    val img = Multimodal.decodeImages(asImage)
      .select("decoded.width", "decoded.height", "decoded.ok")
      .as[(Int, Int, Boolean)].head()
    assert(img == ((5, 4, true)))
    // and the audio seam quarantines GIF bytes
    assert(!Multimodal.decodeAudio(asImage.withColumn("meta",
      struct(lit("gif").as("format"), lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"), lit(null).cast("int").as("n_frames"))))
      .select("decoded.ok").as[Boolean].head())
  }

  test("multimodal: video majority signature — palette re-encodes collide; blocked pairs == brute force") {
    // 20/21: the SAME patterned frame sequence (seed 5) encoded with the
    // straight vs reversed palette — byte-distinct payloads, identical
    // decoded rasters; 22: a different seed; 23: garbage bytes
    val spec = Seq(
      (20L, 20, 16, 7, 5L, false), (21L, 20, 16, 7, 5L, true),
      (22L, 20, 16, 7, 6L, false)
    ).toDF("media_id", "width", "height", "n_frames", "seed", "inverted")
    val media = Multimodal.synthesizePatternGifs(spec)
      .unionByName(Seq((23L, Array[Byte](9, 9, 9))).toDF("media_id", "media")
        .withColumn("meta", struct(lit("gif").as("format"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          lit(null).cast("int").as("n_frames"))))
    val sigs = Multimodal.videoSignature(media, batchSize = 2)
      .as[(Long, Long, Int, Boolean)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    // the palette re-encode pair collides on the video signature…
    assert(sigs(20L)._3 && sigs(21L)._3 && sigs(20L)._1 == sigs(21L)._1)
    assert(sigs(20L)._2 == 7)
    // …while byte-level md5 does NOT match (different palette + index stream)
    val md5s = Multimodal.byteStats(media.filter(col("media_id").isin(20L, 21L)))
      .select("payload_md5").as[String].collect()
    assert(md5s.distinct.length == 2)
    // garbage quarantines, never throws
    assert(sigs(23L) == ((0L, 0, false)))
    // signatures have entropy: a different seed gives a different majority
    assert(sigs(20L)._1 != sigs(22L)._1)
    // full value check: recompute from the shared formula — per-frame 9×8
    // grid dHash, then per-bit temporal majority (a value-level check of
    // container walk → decode → resample → luma → gradient → majority)
    def expectedVsig(seed: Long, w: Int, h: Int, n: Int): Long = {
      val cnt = new Array[Int](64)
      for (f <- 0 until n) {
        val gray = Array.tabulate(8, 9)((ty, tx) =>
          Multimodal.patternFrameGray(seed, f, ty * h / 8, tx * w / 9, w, h))
        for (ty <- 0 until 8; tx <- 0 until 8)
          if (gray(ty)(tx) < gray(ty)(tx + 1)) cnt(ty * 8 + tx) += 1
      }
      (0 until 64).foldLeft(0L)((acc, k) =>
        if (2 * cnt(k) > n) acc | (1L << k) else acc)
    }
    assert(sigs(20L)._1 == expectedVsig(5L, 20, 16, 7))
    assert(sigs(22L)._1 == expectedVsig(6L, 20, 16, 7))
    // pigeonhole-blocked pairs equal the brute-force all-pairs join
    val pairs = Multimodal.videoNearDupPairs(media, maxHamming = 3)
    val sig = Multimodal.videoSignature(media).filter(col("ok"))
      .select(col("media_id").as("id"), col("vsig").as("sig"))
    val brute = sig.as("a").join(sig.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .filter(col("hamming") <= 3)
    assert(rows(pairs) == rows(brute))
    assert(rows(pairs).contains(Seq(20L, 21L, 0)))
  }

  test("multimodal: extractFeaturesBatched is deterministic and feeds similarity ops") {
    val media = Multimodal.asMediaTable(
      Seq((1L, "abcdef"), (2L, "abcdef"), (3L, "zzzzzz")).toDF("id", "p"), "id", "p", "img")
    val feats = Multimodal.extractFeaturesBatched(media, Multimodal.stubFeatureCodec(16), 16, 2)
    assert(feats.select(size(col("embedding"))).as[Int].collect().toSet == Set(16))
    // deterministic: identical payloads -> identical embeddings -> exact dup pair
    val pairs = graft.ext.Similarity.cosineNearDupPairs(feats, "media_id", "embedding", 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
    // dimension contract enforced
    intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeaturesBatched(media, Multimodal.stubFeatureCodec(8), 16).collect()
    }
  }

  test("multimodal: resize rewrites metadata, extractFeatures feeds similarity ops") {
    val media = Multimodal.asMediaTable(
      Seq((1L, "abcdef"), (2L, "abcdef"), (3L, "zzzzzz")).toDF("id", "p"), "id", "p", "img")
    val resized = Multimodal.resize(
      Multimodal.decodeBatched(media, _.map(fakeDecode)), 224, 224)
    assert(resized.select("decoded.width").as[Int].collect().toSet == Set(224))
    val feats = Multimodal.extractFeatures(media, dim = 16)
    assert(feats.select(size(col("embedding"))).as[Int].head() == 16)
    // identical payloads => identical embeddings => cosine pair found
    val pairs = graft.ext.Similarity.cosineNearDupPairs(feats, "media_id", "embedding", 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("multimodal: byteStats computes length and md5 at scan") {
    val media = Multimodal.asMediaTable(Seq((1L, "abc")).toDF("id", "p"), "id", "p", "txt")
    val got = Multimodal.byteStats(media).select("n_bytes", "payload_md5")
      .as[(Int, String)].head()
    assert(got._1 == 3 && got._2 == "900150983cd24fb0d6963f7d28e17f72")
  }

  test("csv source infers header and types (S1 fetch-to-staging model)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv")
    val f = dir.resolve("staged.csv")
    java.nio.file.Files.writeString(f, "id,name,score\n1,ana,9.5\n2,bo,8.0\n")
    val df = graft.sources.Tables.csv(spark, f.toString)
    assert(df.columns.toSeq == Seq("id", "name", "score"))
    assert(df.schema("id").dataType.typeName == "integer")
    assert(df.schema("score").dataType.typeName == "double")
    assert(df.count() == 2)
  }

  test("saltedJoin returns exactly the plain inner-join result") {
    val fact = Seq((1, "a"), (1, "b"), (2, "c"), (3, "d")).toDF("k", "v")
    val build = Seq((1, "x"), (2, "y")).toDF("k", "w")
    val got = graft.operators.Joins.saltedJoin(fact, build, Seq("k"), salts = 4)
    val plain = fact.join(build, Seq("k"))
    assert(rows(got) == rows(plain))
    assert(got.count() == 3)
  }

  test("ivfTopK ranks an identical vector first within its cell") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.99f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.1f, 0.99f))
    ).toDF("vec_id", "embedding")
    val got = graft.ext.Similarity.ivfTopK(
      vecs, vecs.filter(col("vec_id") === 1), "vec_id", "embedding", 2, nlist = 2, nprobe = 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    assert(got(2L) == 1) // nearest neighbor found despite cell partitioning
  }

  test("driver contract: every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size >= 40)
  }

  test("capPerKey keeps at most n rows per key, deterministically by ordinal") {
    val df = Seq((1, 30), (1, 10), (1, 20), (1, 40), (2, 5)).toDF("k", "v")
    val got = graft.operators.Relational.capPerKey(df, "k", 2, col("v"))
      .as[(Int, Int)].collect().toSet
    assert(got == Set((1, 10), (1, 20), (2, 5))) // two smallest per key
  }

  test("deterministicSample: stable subset, same key same verdict") {
    val df = (1L to 1000L).toDF("id")
    val s1 = graft.operators.Relational.deterministicSample(df, "id", "19999999")
      .as[Long].collect().toSet
    val s2 = graft.operators.Relational.deterministicSample(df, "id", "19999999")
      .as[Long].collect().toSet
    assert(s1 == s2)                      // reproducible
    assert(s1.size > 50 && s1.size < 200) // ~1/10 rate, md5-uniform
    // monotone: a larger threshold strictly widens the sample
    val wider = graft.operators.Relational.deterministicSample(df, "id", "33333333")
      .as[Long].collect().toSet
    assert(s1.subsetOf(wider))
  }

  test("stratifiedSample: per-stratum rates, deterministic, nested subsets") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Relational
    val df = (1L to 4000L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("k", "s")
    val got = Relational.stratifiedSample(df, "k", "s", Map("a" -> 1.0), 0.25)
    val byStratum = got.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(byStratum("a") == df.filter(col("s") === "a").count()) // rate 1.0 keeps all
    val bRate = byStratum("b").toDouble / df.filter(col("s") === "b").count()
    assert(bRate > 0.2 && bRate < 0.3, s"b rate $bRate")
    // re-running samples identically
    val again = Relational.stratifiedSample(df, "k", "s", Map("a" -> 1.0), 0.25)
    assert(got.collect().toSet == again.collect().toSet)
    // a lower rate keeps a SUBSET of a higher rate's rows (consistent thresholds)
    val lower = Relational.stratifiedSample(df, "k", "s", Map("a" -> 1.0), 0.1)
      .filter(col("s") === "b").select("k").as[Long].collect().toSet
    val higher = got.filter(col("s") === "b").select("k").as[Long].collect().toSet
    assert(lower.subsetOf(higher))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged by payload hash") {
    val v1 = Seq((1L, "a", "x"), (2L, "b", "x"), (3L, "c", "y")).toDF("id", "t", "s")
    val v2 = Seq((2L, "b", "x"), (3L, "CHANGED", "y"), (4L, "d", "z")).toDF("id", "t", "s")
    val got = Relational.snapshotDiff(v1, v2, "id", Seq("t", "s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
    // payload column ORDER matters, id-only diff does not see payload moves
    val swapped = Relational.snapshotDiff(v1, v1.select(col("id"), col("s").as("t"), col("t").as("s")),
      "id", Seq("t", "s")).filter(col("status") === "changed").count()
    assert(swapped == 3L)
  }

  test("snapshotDiff distinguishes null payloads from values and from each other") {
    // (t=null, s="v") vs (t="v", s=null): a separator concat that skips
    // nulls would hash both sides to md5("v") and call a real change
    // 'unchanged'; the JSON-struct hash must classify it 'changed'
    val v1 = Seq((1L, Option.empty[String], Option("v")),
                 (2L, Option("x"), Option.empty[String]),
                 (3L, Option.empty[String], Option.empty[String])).toDF("id", "t", "s")
    val v2 = Seq((1L, Option("v"), Option.empty[String]),
                 (2L, Option("x"), Option.empty[String]),
                 (3L, Option.empty[String], Option.empty[String])).toDF("id", "t", "s")
    val got = Relational.snapshotDiff(v1, v2, "id", Seq("t", "s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "changed", 2L -> "unchanged", 3L -> "unchanged"))
    // null is also distinct from the string "null"
    val v3 = Seq((1L, Option("null"), Option("v"))).toDF("id", "t", "s")
    val lit1 = Relational.snapshotDiff(v1.filter(col("id") === 1L), v3, "id", Seq("t", "s"))
      .collect().head.getString(1)
    assert(lit1 == "changed")
  }
}

/** Executor-serializable test fixtures (a spec-class method would drag the
  * non-serializable scalatest engine into the task closure).
  */
object RelationalSpec {
  // test-only fake codec for exercising the GENERIC decode seam (the real
  // still-image instance is decodeImages): deterministic dimensions
  // derived from payload length
  def fakeDecode(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = if (bytes == null) 0 else bytes.length
    (64 + (n % 577), 64 + ((n * 31) % 433), 1 + (n % 16))
  }
}
