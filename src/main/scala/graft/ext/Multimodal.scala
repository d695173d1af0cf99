package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata structs.
  *
  * The Spark-side machinery — schema contract, partition-friendly batch
  * shape, mapPartitions decode boundary — carries THREE real JDK codecs
  * behind one seam: still images (javax.imageio PNG/JPEG — decode, resize,
  * pixel probe), audio (javax.sound.sampled WAV — PCM decode, windowed
  * energy), and video (javax.imageio animated GIF — frame walk, strided
  * frame sampling). Only the payload→embedding feature-extraction step is a
  * clearly-marked DETERMINISTIC STUB ([[stubFeatureCodec]] — the container
  * has no inference runtime; a production build swaps in an ONNX/GPU
  * session behind the same [[FeatureCodec]] contract without touching the
  * plumbing).
  */
object Multimodal {

  /** Schema contract for a media table: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  /** Wrap any (id, string-payload) table as a media table — the payload
    * becomes opaque bytes, as it would arrive from an object store.
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String, format: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("media"),
      struct(
        lit(format).as("format"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("n_frames")).as("meta"))

  /** Per-partition image codec pool. `ImageIO.read`/`ImageIO.write`
    * construct a fresh reader/writer (plus a registry scan and a stream
    * wrapper) on EVERY call — per-row allocation churn in the hottest
    * loop, and the round-10 driver bench showed exactly that churn
    * poisoning a long single-JVM run (humongous-allocation GC pressure).
    * `ImageReader`/`ImageWriter` instances are reusable: `setInput`/
    * `setOutput` replaces the source and resets decoder state, so ONE
    * instance per format per partition serves every payload. Format
    * dispatch stays payload-driven (magic bytes — the [[decodeImages]]
    * contract), with the registry path as fallback for unknown magics.
    * A reader that throws mid-decode is disposed and dropped (its
    * internal state may be corrupt); the caller's quarantine handles the
    * exception. Instances hold plain heap arrays — no native resources —
    * so the pool is collected with the partition, no dispose hook needed.
    */
  private final class ImageCodecs {
    javax.imageio.ImageIO.setUseCache(false)
    private val readers = new java.util.HashMap[String, javax.imageio.ImageReader]()
    private val writers = new java.util.HashMap[String, javax.imageio.ImageWriter]()
    private val bos = new java.io.ByteArrayOutputStream(1 << 16)

    private def formatOf(b: Array[Byte]): String =
      if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
      else if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpeg"
      else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
      else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
      else null

    private def reader(fmt: String): javax.imageio.ImageReader = {
      var r = readers.get(fmt)
      if (r == null) {
        val it = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
        if (it.hasNext) { r = it.next(); readers.put(fmt, r) }
      }
      r
    }

    private def dropReader(fmt: String): Unit = {
      val r = readers.remove(fmt)
      if (r != null) try r.dispose() catch { case scala.util.control.NonFatal(_) => () }
    }

    /** Decode the payload's first image; null when no reader can parse it.
      * Decode failures propagate (callers quarantine), with the possibly-
      * corrupt reader dropped first.
      */
    def read(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val fmt = formatOf(bytes)
      val rd = if (fmt == null) null else reader(fmt)
      if (rd == null)
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      else {
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          rd.setInput(iis, /* seekForwardOnly = */ true, /* ignoreMetadata = */ true)
          rd.read(0)
        } catch { case e: Throwable => dropReader(fmt); throw e }
        finally { try rd.setInput(null) catch { case _: Throwable => () }; iis.close() }
      }
    }

    /** Run `f` against a GIF container reader with input set (random
      * frame access allowed — `seekForwardOnly = false`). Same
      * drop-on-throw discipline as [[read]].
      */
    def withGif[T](bytes: Array[Byte])(f: javax.imageio.ImageReader => T): T = {
      val rd = reader("gif")
      require(rd != null, "no GIF reader registered in this JVM")
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        rd.setInput(iis, /* seekForwardOnly = */ false)
        f(rd)
      } catch { case e: Throwable => dropReader("gif"); throw e }
      finally { try rd.setInput(null) catch { case _: Throwable => () }; iis.close() }
    }

    private def dropWriter(fmt: String): Unit = {
      val w = writers.remove(fmt)
      if (w != null) try w.dispose() catch { case scala.util.control.NonFatal(_) => () }
    }

    /** Encode through a pooled writer and a reused output buffer. Encode
      * failures propagate with the possibly-corrupt writer dropped first
      * (the [[read]] discipline — callers like resizeImages quarantine
      * per row, so a writer left in the pool after a mid-encode throw
      * would be reused for every later row in the partition).
      */
    def write(fmt: String, img: java.awt.image.BufferedImage): Array[Byte] = {
      var w = writers.get(fmt)
      if (w == null) {
        w = javax.imageio.ImageIO.getImageWritersByFormatName(fmt).next()
        writers.put(fmt, w)
      }
      bos.reset()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try { w.setOutput(ios); w.write(img) }
      catch { case e: Throwable => dropWriter(fmt); throw e }
      finally { try w.setOutput(null) catch { case _: Throwable => () }; ios.close() }
      // MemoryCacheImageOutputStream flushes on close(); toByteArray after
      bos.toByteArray
    }

    /** Pooled multi-frame GIF encode (sequence API) through the reused
      * writer + buffer.
      */
    def writeGifSequence(frames: Int)(frame: Int => java.awt.image.BufferedImage): Array[Byte] = {
      var w = writers.get("gif")
      if (w == null) {
        w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        writers.put("gif", w)
      }
      bos.reset()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try {
        w.setOutput(ios)
        w.prepareWriteSequence(null)
        var f = 0
        while (f < frames) {
          w.writeToSequence(new javax.imageio.IIOImage(frame(f), null, null), null)
          f += 1
        }
        w.endWriteSequence()
      } catch { case e: Throwable => dropWriter("gif"); throw e }
      finally { try w.setOutput(null) catch { case _: Throwable => () }; ios.close() }
      bos.toByteArray
    }
  }

  /** Fan a CPU-bound codec stage out to the session's full parallelism
    * when the upstream scan under-partitions. A codec pays 100-1000× the
    * cost per byte of a scan, so its parallelism must NOT be inherited
    * from the input's split count: a small-file parquet input bin-packs
    * into a handful of splits (measured round 11: the sf0.1 documents
    * table is ONE split — every codec query ran single-threaded on a
    * 32-core session; the 10× replica got 10 of 32 threads, inverting the
    * measured scaling exponents). On a real 100-TB input with thousands
    * of splits this is a no-op; in the small-file regime it shuffles the
    * stage input once — narrow spec rows for the synthesize paths (free),
    * payload bytes for the decode paths (decode cost/byte ≫ one shuffle
    * hop, and the alternative is idle cores). Round-robin, not hash: the
    * rows are pure work items.
    */
  private[graft] def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** The vectorized codec contract: one call per BATCH of payloads (never
    * per row), returning one (width, height, n_frames) per input in order.
    * This is the columnar seam a decoder plugs into — a JNI video
    * library, a GPU decode kernel, or an inference session all want a
    * batch of buffers per call, one session init per partition. The REAL
    * still-image instance is [[decodeImages]] (javax.imageio, richer
    * schema with channel count); tests exercise the generic seam with a
    * deterministic fake codec.
    */
  type BatchCodec = Seq[Array[Byte]] => Seq[(Int, Int, Int)]

  /** Decode boundary: per-partition BATCHED decode via mapPartitions — the
    * one deliberate row boundary in main, kept because a heavyweight codec
    * cannot live inside whole-stage codegen (native buffers, per-partition
    * session init, batch-sized amortization). The iterator is grouped into
    * `batchSize` slices so the codec sees the vectorized shape
    * ([[BatchCodec]]) rather than rows; partitioning is preserved and the
    * payload never moves (no shuffle, no driver hop). Everything above and
    * below this operator stays columnar/codegen.
    */
  def decodeBatched(media: DataFrame, codec: BatchCodec,
      batchSize: Int = 256): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    val outSchema = StructType(media.schema.fields :+
      StructField("decoded", StructType(Seq(
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false),
        StructField("n_frames", IntegerType, nullable = false))), nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val mediaIdx = media.schema.fieldIndex("media")
    fanOut(media).mapPartitions { rows =>
      // per-partition codec/session init would happen here, once
      rows.grouped(batchSize).flatMap { batch =>
        val decoded = codec(batch.map(_.getAs[Array[Byte]](mediaIdx)))
        require(decoded.length == batch.length,
          s"codec returned ${decoded.length} results for ${batch.length} inputs")
        batch.lazyZip(decoded).map { case (r, (w, h, f)) =>
          Row.fromSeq(r.toSeq :+ Row(w, h, f))
        }
      }
    }(enc)
  }

  /** Deterministic REAL PNG bytes: a `width`×`height` image whose pixels
    * derive from `seed` (so payloads differ per row), encoded through the
    * JDK's ImageIO PNG writer. `alpha` selects RGBA vs RGB — the decoded
    * channel count round-trips it. Exact PNG bytes may differ across
    * encoder versions; everything downstream depends only on the DECODED
    * properties, which are pinned by the format.
    */
  /** Pixel fill for [[encodePng]], split out so the batched synthesis
    * paths can pair it with a POOLED writer instead of per-row
    * `ImageIO.write`.
    */
  private def pngImage(width: Int, height: Int, alpha: Boolean,
      seed: Long): java.awt.image.BufferedImage = {
    require(width > 0 && height > 0, "image dimensions must be positive")
    val t = if (alpha) java.awt.image.BufferedImage.TYPE_4BYTE_ABGR
            else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
    val img = new java.awt.image.BufferedImage(width, height, t)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = (seed * 1099511628211L + y.toLong * width + x).toInt
        img.setRGB(x, y, v | 0xff000000) // opaque; alpha is a FORMAT choice
        x += 1
      }
      y += 1
    }
    img
  }

  def encodePng(width: Int, height: Int, alpha: Boolean, seed: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(pngImage(width, height, alpha, seed), "png", bos)
    bos.toByteArray
  }

  /** Synthesize a media table of REAL PNG payloads from a spec frame with
    * columns `(media_id long, width int, height int, alpha boolean)` —
    * the fixture path for exercising the real decoder at any scale: the
    * encode runs batched in mapPartitions (payload bytes are BORN in the
    * executor partition — nothing shuffles, nothing hops the driver),
    * mirroring an object-store fetch that materializes bytes next to the
    * rows that reference them.
    *
    * An optional `seed` column (long) decouples pixel content from the
    * row id: rows sharing a seed but differing in `alpha` are the SAME
    * raster re-encoded RGBA vs RGB — byte-distinct payloads whose decoded
    * pixels are identical, the re-encode near-duplicate fixture the
    * perceptual-hash dedup family (q210/q211) is built on. Without the
    * column, `media_id` seeds the pixels (the original contract).
    */
  def synthesizePngs(spec: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    val (idI, wI, hI, aI) = (spec.schema.fieldIndex("media_id"),
      spec.schema.fieldIndex("width"), spec.schema.fieldIndex("height"),
      spec.schema.fieldIndex("alpha"))
    val seedI = if (spec.schema.fieldNames.contains("seed"))
      spec.schema.fieldIndex("seed") else idI
    fanOut(spec).mapPartitions { rows =>
      val codecs = new ImageCodecs
      rows.map { r =>
        val bytes = codecs.write("png",
          pngImage(r.getInt(wI), r.getInt(hI), r.getBoolean(aI), r.getLong(seedI)))
        Row(r.getLong(idI), bytes, Row("png", null, null, null))
      }
    }(enc)
  }

  /** Deterministic REAL JPEG bytes through the JDK's ImageIO JPEG writer —
    * the second format behind the same codec seam. JPEG is 3-band only
    * (no alpha) and LOSSY: byte payloads and decoded pixel values are
    * encoder/quantizer-dependent, so downstream checks pin the LOSSLESS
    * decode properties (dimensions, channel count, format dispatch) and
    * bound pixel error with a tolerance, never exact JPEG pixels. Pixels
    * are a `seed`-derived flat-ish gradient (smooth content keeps the
    * round-trip error within a few quantization steps).
    */
  /** Pixel fill for [[encodeJpeg]] ([[pngImage]]'s split, same reason). */
  private def jpegImage(width: Int, height: Int,
      seed: Long): java.awt.image.BufferedImage = {
    require(width > 0 && height > 0, "image dimensions must be positive")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val base = (seed * 1099511628211L).toInt & 0xffffff
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        // smooth gradient around a seed-derived base color: JPEG-friendly
        val r = ((base >> 16) & 0xff) / 2 + 64 + (x * 2 % 32)
        val g = ((base >> 8) & 0xff) / 2 + 64 + (y * 2 % 32)
        val b = (base & 0xff) / 2 + 64
        img.setRGB(x, y, 0xff000000 | (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  def encodeJpeg(width: Int, height: Int, seed: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(jpegImage(width, height, seed), "jpg", bos)
    bos.toByteArray
  }

  /** Mixed-format media synthesis from a spec frame with columns
    * `(media_id long, width int, height int, alpha boolean,
    * format string)` where format ∈ {"png", "jpeg"} — the fixture that
    * makes format DISPATCH real: downstream decode goes through the one
    * [[decodeImages]] seam, and javax.imageio selects the reader plugin
    * from the payload's magic bytes, not from metadata. JPEG ignores the
    * alpha flag (the format has no alpha channel). Same mapPartitions
    * discipline as [[synthesizePngs]].
    */
  def synthesizeMedia(spec: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    val (idI, wI, hI, aI, fI) = (spec.schema.fieldIndex("media_id"),
      spec.schema.fieldIndex("width"), spec.schema.fieldIndex("height"),
      spec.schema.fieldIndex("alpha"), spec.schema.fieldIndex("format"))
    fanOut(spec).mapPartitions { rows =>
      val codecs = new ImageCodecs
      rows.map { r =>
        val fmt = r.getString(fI)
        val bytes = fmt match {
          case "png" => codecs.write("png",
            pngImage(r.getInt(wI), r.getInt(hI), r.getBoolean(aI), r.getLong(idI)))
          case "jpeg" => codecs.write("jpeg",
            jpegImage(r.getInt(wI), r.getInt(hI), r.getLong(idI)))
          case other => throw new IllegalArgumentException(
            s"synthesizeMedia: unsupported format '$other' (png|jpeg)")
        }
        Row(r.getLong(idI), bytes, Row(fmt, null, null, null))
      }
    }(enc)
  }

  /** REAL image decode through the batched mapPartitions boundary:
    * javax.imageio parses each payload (PNG/JPEG/GIF/BMP — whatever the
    * JDK's registered readers handle) and emits
    * `decoded: (width, height, n_channels, ok)`. Undecodable or null
    * payloads survive as `ok = false` rows (a corpus-scale decode job
    * must quarantine bad bytes, not die on them). Same seam discipline as
    * [[decodeBatched]]: batched iterator, partitioning preserved, payload
    * never shuffles; the codec work happens exactly once per row at the
    * one deliberate non-codegen boundary.
    */
  def decodeImages(media: DataFrame, batchSize: Int = 256): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    val outSchema = StructType(media.schema.fields :+
      StructField("decoded", StructType(Seq(
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false),
        StructField("n_channels", IntegerType, nullable = false),
        StructField("ok", BooleanType, nullable = false))), nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val mediaIdx = media.schema.fieldIndex("media")
    fanOut(media).mapPartitions { rows =>
      // one codec pool per partition: readers reused across every payload
      // (per-row ImageIO.read churn was the round-10 GC-contamination site)
      val codecs = new ImageCodecs
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](mediaIdx)
          val dec =
            if (bytes == null) Row(0, 0, 0, false)
            else try {
              val img = codecs.read(bytes)
              if (img == null) Row(0, 0, 0, false)
              else Row(img.getWidth, img.getHeight, img.getRaster.getNumBands, true)
              // NonFatal, not IOException: imageio readers throw RuntimeException
              // subclasses (IllegalArgument, ArrayIndexOutOfBounds, …) on some
              // malformed payloads — the quarantine contract covers those too
            } catch { case scala.util.control.NonFatal(_) => Row(0, 0, 0, false) }
          Row.fromSeq(r.toSeq :+ dec)
        }
      }
    }(enc)
  }

  /** Frame sampling: explode a media row into every `stride`-th frame index
    * up to the decoded frame count — pure relational explode, no codec.
    */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded.select(
      col("media_id"),
      explode(sequence(lit(0), col("decoded.n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Cheap metadata pass that needs no codec at all: byte length and a
    * content fingerprint — runs at scan speed, oracle-verifiable.
    */
  def byteStats(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      length(col("media")).cast("int").as("n_bytes"),
      md5(col("media")).as("payload_md5"))

  /** Metadata-level resize for the FRAME-table shape (video metadata
    * carries no payload to resample); the still-image pixel path is
    * [[resizeImages]], which does the real raster work.
    */
  def resize(decoded: DataFrame, w: Int, h: Int): DataFrame =
    decoded.withColumn("decoded",
      struct(lit(w).as("width"), lit(h).as("height"),
        col("decoded.n_frames").as("n_frames")))

  /** REAL image resize through the same batched mapPartitions seam as
    * [[decodeImages]]: javax.imageio decodes the payload, a manual
    * nearest-neighbor resample (source pixel `(⌊tx·W/w⌋, ⌊ty·H/h⌋)` —
    * deterministic integer arithmetic, no platform-dependent rendering
    * pipeline) fills a `w×h` raster preserving the channel count
    * (RGBA stays 4-band, RGB stays 3-band), and the JDK PNG writer
    * re-encodes. Payload bytes are decoded, resampled, and re-encoded
    * inside one partition — nothing pixel-sized ever shuffles, exactly
    * the thumbnail/tile job a multimodal corpus prep runs. Undecodable
    * or null payloads pass through with a NULL payload (the quarantine
    * convention of [[decodeImages]]); non-media columns ride along
    * unchanged.
    */
  def resizeImages(media: DataFrame, w: Int, h: Int, batchSize: Int = 256): DataFrame = {
    require(w > 0 && h > 0, "target dimensions must be positive")
    require(batchSize >= 1, "batchSize must be >= 1")
    val mediaIdx = media.schema.fieldIndex("media")
    // the quarantine convention writes NULL payloads for undecodable
    // bytes, so the output media field must be nullable even when the
    // input's was not
    val outSchema = StructType(media.schema.fields.zipWithIndex.map {
      case (f, i) => if (i == mediaIdx) f.copy(nullable = true) else f })
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    fanOut(media).mapPartitions { rows =>
      val codecs = new ImageCodecs
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](mediaIdx)
          val resized: Array[Byte] =
            if (bytes == null) null
            else try {
              val img = codecs.read(bytes)
              if (img == null) null
              else {
                val t = if (img.getRaster.getNumBands >= 4)
                  java.awt.image.BufferedImage.TYPE_4BYTE_ABGR
                else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
                val out = new java.awt.image.BufferedImage(w, h, t)
                val (sw, sh) = (img.getWidth, img.getHeight)
                var ty = 0
                while (ty < h) {
                  val sy = (ty.toLong * sh / h).toInt
                  var tx = 0
                  while (tx < w) {
                    out.setRGB(tx, ty, img.getRGB((tx.toLong * sw / w).toInt, sy))
                    tx += 1
                  }
                  ty += 1
                }
                codecs.write("png", out)
              }
              // NonFatal (see decodeImages): malformed bytes must quarantine,
              // whatever exception type the reader throws
            } catch { case scala.util.control.NonFatal(_) => null }
          Row.fromSeq(r.toSeq.updated(mediaIdx, resized))
        }
      }
    }(enc)
  }

  /** Pixel probe for pipeline verification: decode the payload and emit
    * the 24-bit RGB of pixel `(x, y)` (NULL when the payload is
    * undecodable or the coordinate is out of bounds). The cheapest REAL
    * whole-pipeline check a pixel job has: a resample/transcode bug
    * anywhere upstream changes the probed value, while dimensions alone
    * would still look right.
    */
  def pixelProbe(media: DataFrame, x: Int, y: Int, batchSize: Int = 256): DataFrame = {
    require(x >= 0 && y >= 0, "probe coordinates must be non-negative")
    require(batchSize >= 1, "batchSize must be >= 1")
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("rgb24", IntegerType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    val idIdx = media.schema.fieldIndex("media_id")
    val mediaIdx = media.schema.fieldIndex("media")
    fanOut(media).mapPartitions { rows =>
      val codecs = new ImageCodecs
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](mediaIdx)
          val v: Integer =
            if (bytes == null) null
            else try {
              val img = codecs.read(bytes)
              if (img == null || x >= img.getWidth || y >= img.getHeight) null
              else Integer.valueOf(img.getRGB(x, y) & 0xffffff)
              // NonFatal (see decodeImages): quarantine any reader exception
            } catch { case scala.util.control.NonFatal(_) => null }
          Row(r.getLong(idIdx), v)
        }
      }
    }(enc)
  }

  /** The raster→64-bit dHash kernel shared by [[imageDHash]] (one still
    * per payload) and [[videoSignature]] (one hash per decoded FRAME):
    * nearest-neighbor 9×8 luma grid, integer luma, horizontal-gradient
    * bit-pack. `gray` is an 8×9 caller-owned scratch (reused across a
    * partition — no allocation per frame).
    */
  private def dhash64(img: java.awt.image.BufferedImage,
      gray: Array[Array[Int]]): Long = {
    val (sw, sh) = (img.getWidth, img.getHeight)
    var hash = 0L
    var ty = 0
    while (ty < 8) {
      val sy = (ty.toLong * sh / 8).toInt
      var tx = 0
      while (tx < 9) {
        val rgb = img.getRGB((tx.toLong * sw / 9).toInt, sy)
        gray(ty)(tx) = (299 * ((rgb >> 16) & 0xff) +
          587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
        tx += 1
      }
      ty += 1
    }
    ty = 0
    while (ty < 8) {
      var tx = 0
      while (tx < 8) {
        if (gray(ty)(tx) < gray(ty)(tx + 1)) hash |= 1L << (ty * 8 + tx)
        tx += 1
      }
      ty += 1
    }
    hash
  }

  /** 64-bit difference hash (dHash) per image — the standard perceptual
    * near-dup signature for image corpora: decode, nearest-neighbor
    * downsample to a 9×8 luma grid (the SAME integer source-pixel
    * arithmetic as [[resizeImages]] — `(⌊tx·W/9⌋, ⌊ty·H/8⌋)`, no
    * platform rendering pipeline), integer luma
    * `(299r + 587g + 114b) / 1000`, and one bit per horizontal luma
    * gradient: bit `ty*8+tx` set iff `gray(tx,ty) < gray(tx+1,ty)`.
    * Every step is integer arithmetic over losslessly-decoded pixels, so
    * on PNG payloads the hash is a pure function of the RASTER, not the
    * bytes — q210 hash-matches all 64 bits against a DuckDB
    * recomputation from the synthesis spec, a value-level differential
    * over the whole decode path. This is what byte dedup (md5, q34)
    * cannot do: an RGBA and an RGB encode of the same raster have
    * different payloads but the same dHash. Undecodable payloads
    * quarantine as (dhash=0, ok=false), the [[decodeImages]] convention.
    */
  def imageDHash(media: DataFrame, batchSize: Int = 256): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false),
      StructField("ok", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    val idIdx = media.schema.fieldIndex("media_id")
    val mediaIdx = media.schema.fieldIndex("media")
    fanOut(media).mapPartitions { rows =>
      val codecs = new ImageCodecs
      val gray = Array.ofDim[Int](8, 9) // reused across the partition
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](mediaIdx)
          var hash = 0L
          var ok = false
          if (bytes != null) try {
            val img = codecs.read(bytes)
            if (img != null) {
              hash = dhash64(img, gray)
              ok = true
            }
            // NonFatal (see decodeImages): quarantine any reader exception
          } catch { case scala.util.control.NonFatal(_) => hash = 0L; ok = false }
          Row(r.getLong(idIdx), if (ok) hash else 0L, ok)
        }
      }
    }(enc)
  }

  /** Image near-duplicate pairs within `maxHamming` dHash bits: the
    * signatures from [[imageDHash]] (quarantined rows excluded) through
    * the SAME 16-bit-chunk pigeonhole blocking as text SimHash
    * ([[Dedup.hammingPairs64]] — one blocking definition for every
    * 64-bit signature family). For ≤3 bits the blocked join is EXACTLY
    * the all-pairs result, which is how q211 gets a brute-force DuckDB
    * oracle over the blocked plan. Scale shape: one codec pass, one
    * 4×-explode equi-join on chunk keys — never |corpus|² and the
    * payload bytes never shuffle (the hash is 8 bytes).
    */
  def imageNearDupPairs(media: DataFrame, maxHamming: Int = 3,
      batchSize: Int = 256, budgetPairs: Long = Long.MaxValue): DataFrame =
    Dedup.hammingPairs64(
      imageDHash(media, batchSize).filter(col("ok"))
        .select(col("media_id").as("id"), col("dhash").as("sig")),
      maxHamming, budgetPairs)

  /** Crawl-cadence image near-dup: incoming media probed against a
    * STORED corpus by dHash through the cross-frame blocking
    * ([[Dedup.hammingPairsIncremental64]]) — O(|batch| + matched
    * buckets), the store is never paired against itself. Emits
    * (existing_id, incoming_id, hamming) for every incoming image
    * within `maxHamming` bits of a stored one — the "have we already
    * crawled this image (under any re-encode)?" gate. q215's oracle is
    * the brute-force cross join over SQL-recomputed hashes.
    */
  def imageNearDupIncremental(existingMedia: DataFrame, incomingMedia: DataFrame,
      maxHamming: Int = 3, batchSize: Int = 256,
      budgetPairs: Long = Long.MaxValue): DataFrame = {
    def sigOf(media: DataFrame): DataFrame =
      imageDHash(media, batchSize).filter(col("ok"))
        .select(col("media_id").as("id"), col("dhash").as("sig"))
    Dedup.hammingPairsIncremental64(sigOf(existingMedia), sigOf(incomingMedia),
      maxHamming, budgetPairs)
  }

  // =========================================================================
  // Audio: REAL WAV codec behind the same batched mapPartitions seam
  // =========================================================================

  /** 16-bit PCM sample formula shared by the WAV synthesis and its DuckDB
    * oracle: for global sample index `k` of media `id`,
    *
    * {{{ s(k) = 0                                       if (id + k/256) % 4 == 0
    *     s(k) = ((id*7919 + k*104729) % 65536) - 32768  otherwise }}}
    *
    * — pseudo-noise with every 4th 256-sample block exactly silent (the
    * deterministic analog of speech pauses, so windowed-energy/silence
    * operators have real structure to find). Pure non-negative integer
    * arithmetic, so DuckDB reproduces it bit-for-bit with `%` and `//`;
    * 16-bit PCM in a WAV container is lossless, so the DECODED samples
    * equal the formula exactly — integer aggregates over them
    * (sum |s|, peak, counts) are exact cross-engine oracles, unlike any
    * float-DSP property.
    */
  def wavSample(mediaId: Long, k: Long): Int =
    if ((mediaId + k / 256) % 4 == 0) 0
    else (Math.floorMod(mediaId * 7919 + k * 104729, 65536L) - 32768L).toInt

  /** Deterministic REAL WAV bytes: `nFrames` frames of `channels`-channel
    * 16-bit little-endian PCM from [[wavSample]] (global sample index
    * `k = frame*channels + ch`), written through the JDK's
    * `javax.sound.sampled` WAVE writer — a real RIFF container a real
    * parser must walk, not hand-rolled bytes a hand-rolled reader happens
    * to accept.
    */
  def encodeWav(nFrames: Int, sampleRate: Int, channels: Int, mediaId: Long): Array[Byte] = {
    require(nFrames > 0 && sampleRate > 0 && channels > 0, "positive WAV geometry")
    // canonical 44-byte RIFF/WAVE header + PCM16LE payload, written
    // directly — byte-identical to the JDK WaveFileWriter's canonical
    // layout for uncompressed PCM, WITHOUT `AudioSystem.write`'s
    // class-level synchronized provider lookup per call (the encode-side
    // twin of the parseWavPcm rationale: the registry lock serialized the
    // fanned-out synthesis stage)
    val dataLen = nFrames * channels * 2
    val b = new Array[Byte](44 + dataLen)
    def put32(o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
      b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
    }
    def put16(o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def putTag(o: Int, s: String): Unit = {
      var i = 0; while (i < 4) { b(o + i) = s.charAt(i).toByte; i += 1 }
    }
    putTag(0, "RIFF"); put32(4, 36 + dataLen); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 16)
    put16(20, 1) // PCM
    put16(22, channels); put32(24, sampleRate)
    put32(28, sampleRate * channels * 2) // byte rate
    put16(32, channels * 2) // block align
    put16(34, 16) // bits per sample
    putTag(36, "data"); put32(40, dataLen)
    var k = 0L
    val total = nFrames.toLong * channels
    while (k < total) {
      val s = wavSample(mediaId, k)
      val off = 44 + (k * 2).toInt
      b(off) = (s & 0xff).toByte
      b(off + 1) = ((s >> 8) & 0xff).toByte
      k += 1
    }
    b
  }

  /** Synthesize a media table of REAL WAV payloads from a spec frame with
    * columns `(media_id long, n_frames int, sample_rate int, channels
    * int)` — same mapPartitions discipline as [[synthesizePngs]]: payload
    * bytes are born in the executor partition and never shuffle.
    */
  def synthesizeWavs(spec: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    val (idI, nI, srI, chI) = (spec.schema.fieldIndex("media_id"),
      spec.schema.fieldIndex("n_frames"), spec.schema.fieldIndex("sample_rate"),
      spec.schema.fieldIndex("channels"))
    // optional `seed` column decouples SAMPLE content from the row id
    // (the [[synthesizePngs]] convention): rows sharing a seed but
    // differing in `sample_rate` are the SAME samples under a different
    // container header — byte-distinct payloads, identical decoded PCM,
    // the re-encode near-dup fixture of the audio-fingerprint family
    // (q212/q213)
    val seedI = if (spec.schema.fieldNames.contains("seed"))
      spec.schema.fieldIndex("seed") else idI
    fanOut(spec).mapPartitions { rows =>
      rows.map { r =>
        val bytes = encodeWav(r.getInt(nI), r.getInt(srI), r.getInt(chI), r.getLong(seedI))
        Row(r.getLong(idI), bytes, Row("wav", null, null, Integer.valueOf(r.getInt(nI))))
      }
    }(enc)
  }

  /** Canonical RIFF/WAVE chunk walk — the LOCK-FREE fast path of the audio
    * decoders. `AudioSystem.getAudioInputStream` funnels every call
    * through a class-level synchronized provider lookup
    * (`JDK13Services.getProviders`), and with the codec stage fanned out
    * to 32 threads that lock made the parallel audio decode SLOWER than
    * the single-threaded run it replaced (measured round 11: q177 0.77 →
    * 1.6 s at sf0.1). A WAV container is a flat chunk list; walking it is
    * pure arithmetic on the payload bytes. Returns (sampleRate, channels,
    * bitsPerSample, blockAlign, dataOffset, dataLength) for uncompressed
    * PCM (format tag 1), None for anything else — callers fall back to
    * the registry path for non-canonical or compressed containers, so
    * coverage is unchanged and the hot path shares no state.
    */
  private def parseWavPcm(b: Array[Byte]): Option[(Int, Int, Int, Int, Int, Int)] = {
    def u16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // (rate, ch, bits, blockAlign)
    var data: Option[(Int, Int)] = None // (offset, length)
    while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val size = u32(off + 4)
      if (size < 0 || off + 8 + size > b.length) return None
      val id = new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (id == "fmt " && size >= 16) {
        if (u16(off + 8) != 1) return None // not uncompressed PCM
        fmt = Some((u32(off + 12), u16(off + 10), u16(off + 22), u16(off + 20)))
      } else if (id == "data") data = Some((off + 8, size))
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    for ((rate, ch, bits, ba) <- fmt; (dOff, dLen) <- data)
      yield (rate, ch, bits, ba, dOff, dLen)
  }

  /** REAL audio decode through the batched mapPartitions seam: the
    * canonical RIFF chunk walk ([[parseWavPcm]]) parses the container
    * (format header: rate, channels, bits) with `javax.sound.sampled` as
    * the fallback for non-canonical containers, and the PCM payload is
    * fully read — per-media frame count, sum of |sample| over every
    * channel, and peak |sample| come from the decoded samples themselves,
    * so a broken (or stubbed) decoder cannot fake them. All-integer
    * outputs keep the oracle exact. Undecodable / null payloads
    * quarantine as `ok = false` ([[decodeImages]] convention).
    */
  def decodeAudio(media: DataFrame, batchSize: Int = 64): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    val outSchema = StructType(media.schema.fields :+
      StructField("decoded", StructType(Seq(
        StructField("sample_rate", IntegerType, nullable = false),
        StructField("channels", IntegerType, nullable = false),
        StructField("bits", IntegerType, nullable = false),
        StructField("n_frames", LongType, nullable = false),
        StructField("sum_abs", LongType, nullable = false),
        StructField("peak", IntegerType, nullable = false),
        StructField("ok", BooleanType, nullable = false))), nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val mediaIdx = media.schema.fieldIndex("media")
    val bad = Row(0, 0, 0, 0L, 0L, 0, false)
    fanOut(media).mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](mediaIdx)
          def sumPeak(pcm: Array[Byte], from: Int, to: Int): (Long, Int) = {
            var sumAbs = 0L; var peak = 0; var off = from
            while (off + 1 < to) {
              val s = ((pcm(off) & 0xff) | (pcm(off + 1) << 8)).toShort.toInt
              val a = math.abs(s)
              sumAbs += a; if (a > peak) peak = a
              off += 2
            }
            (sumAbs, peak)
          }
          val dec =
            if (bytes == null) bad
            else try parseWavPcm(bytes) match {
              case Some((rate, ch, bits, ba, dOff, dLen)) =>
                if (bits != 16) bad
                else {
                  val (sumAbs, peak) = sumPeak(bytes, dOff, dOff + dLen)
                  Row(rate, ch, 16, dLen.toLong / ba, sumAbs, peak, true)
                }
              case None =>
                val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                  new java.io.ByteArrayInputStream(bytes))
                val fmt = ais.getFormat
                if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) bad
                else {
                  val pcm = ais.readAllBytes()
                  val (sumAbs, peak) = sumPeak(pcm, 0, pcm.length)
                  Row(fmt.getSampleRate.toInt, fmt.getChannels, 16,
                    pcm.length.toLong / fmt.getFrameSize, sumAbs, peak, true)
                }
            } catch { case scala.util.control.NonFatal(_) => bad }
          Row.fromSeq(r.toSeq :+ dec)
        }
      }
    }(enc)
  }

  /** Windowed audio energy — the silence-detection / VAD-prefilter shape of
    * audio corpus prep: decode MONO 16-bit PCM and aggregate |sample| per
    * `windowFrames`-frame window INSIDE the partition (the audio analog of
    * [[resizeImages]]' in-partition pixel work: output is window-grain,
    * ~windowFrames× smaller than the samples — sample-sized data never
    * becomes rows, never shuffles). Emits one row per (media, window) with
    * exact integer energy and the quiet verdict; non-mono or undecodable
    * payloads contribute no windows (mono restriction keeps frame index ==
    * [[wavSample]]'s global sample index, so the silent-block structure
    * aligns with windows and the oracle stays a pure integer recurrence).
    */
  def audioWindowEnergy(media: DataFrame, windowFrames: Int,
      batchSize: Int = 64): DataFrame = {
    require(windowFrames >= 1, "windowFrames must be >= 1")
    require(batchSize >= 1, "batchSize must be >= 1")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("window_idx", IntegerType, nullable = false),
      StructField("n_frames_w", IntegerType, nullable = false),
      StructField("sum_abs", LongType, nullable = false),
      StructField("quiet", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val mediaIdx = media.schema.fieldIndex("media")
    fanOut(media).mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          val bytes = r.getAs[Array[Byte]](mediaIdx)
          val id = r.getLong(idIdx)
          // shared windowing over a PCM16LE slice; base is the slice start
          def windowsOf(pcm: Array[Byte], base: Int, nFrames: Int): Seq[Row] =
            (0 until nFrames by windowFrames).map { w0 =>
              val wEnd = math.min(w0 + windowFrames, nFrames)
              var sumAbs = 0L; var i = w0
              while (i < wEnd) {
                sumAbs += math.abs(
                  ((pcm(base + i * 2) & 0xff) | (pcm(base + i * 2 + 1) << 8)).toShort.toInt)
                i += 1
              }
              // quiet = mean |sample| under 1% of full scale
              Row(id, w0 / windowFrames, wEnd - w0, sumAbs,
                sumAbs < (wEnd - w0).toLong * 328)
            }
          val windows: Seq[Row] =
            if (bytes == null) Nil
            else try parseWavPcm(bytes) match {
              // lock-free canonical path (see parseWavPcm): mono 16-bit only
              case Some((_, ch, bits, _, dOff, dLen)) =>
                if (bits != 16 || ch != 1) Nil
                else windowsOf(bytes, dOff, dLen / 2)
              case None =>
                val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                  new java.io.ByteArrayInputStream(bytes))
                val fmt = ais.getFormat
                if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian || fmt.getChannels != 1) Nil
                else {
                  val pcm = ais.readAllBytes()
                  windowsOf(pcm, 0, pcm.length / 2)
                }
            } catch { case scala.util.control.NonFatal(_) => Nil }
          windows
        }
      }
    }(enc)
  }

  /** 64-bit audio fingerprint — the energy-delta signature (the shape of
    * Chromaprint/Shazam-class fingerprints, reduced to the one feature
    * the integer oracle can recompute exactly): decode mono 16-bit PCM,
    * aggregate |sample| per `windowFrames`-frame window, and emit bit
    * `w` = `energy(w+1) > energy(w)` for the first 64 window deltas.
    * Integer arithmetic end-to-end over a lossless codec, so q212's
    * DuckDB oracle recomputes all 64 bits from the synthesis formula —
    * and a re-encode of the same samples under a different container
    * header (sample rate) fingerprints identically while byte dedup sees
    * two payloads. Media shorter than 65 windows leave high bits zero
    * (`n_windows` records the defined range); non-mono, non-16-bit, or
    * undecodable payloads quarantine as (afp=0, n_windows=0, ok=false).
    */
  def audioFingerprint(media: DataFrame, windowFrames: Int,
      batchSize: Int = 64): DataFrame = {
    require(windowFrames >= 1, "windowFrames must be >= 1")
    require(batchSize >= 1, "batchSize must be >= 1")
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("afp", LongType, nullable = false),
      StructField("n_windows", IntegerType, nullable = false),
      StructField("ok", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    val idIdx = media.schema.fieldIndex("media_id")
    val mediaIdx = media.schema.fieldIndex("media")
    fanOut(media).mapPartitions { rows =>
      val energies = new Array[Long](4096) // reused; windows beyond cap ignored
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](mediaIdx)
          def fingerprint(pcm: Array[Byte], base: Int, nFrames: Int): Row = {
            val nw = math.min((nFrames + windowFrames - 1) / windowFrames, energies.length)
            java.util.Arrays.fill(energies, 0, nw, 0L)
            var i = 0
            val cap = math.min(nFrames, nw * windowFrames)
            while (i < cap) {
              energies(i / windowFrames) += math.abs(
                ((pcm(base + i * 2) & 0xff) | (pcm(base + i * 2 + 1) << 8)).toShort.toInt)
              i += 1
            }
            var hash = 0L
            var w = 0
            val lim = math.min(nw - 1, 64)
            while (w < lim) {
              if (energies(w + 1) > energies(w)) hash |= 1L << w
              w += 1
            }
            Row(r.getLong(idIdx), hash, nw, true)
          }
          val bad = Row(r.getLong(idIdx), 0L, 0, false)
          if (bytes == null) bad
          else try parseWavPcm(bytes) match {
            // lock-free canonical path (see parseWavPcm): mono 16-bit only
            case Some((_, ch, bits, _, dOff, dLen)) =>
              if (bits != 16 || ch != 1) bad
              else fingerprint(bytes, dOff, dLen / 2)
            case None =>
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(bytes))
              val fmt = ais.getFormat
              if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
                  fmt.getChannels != 1) bad
              else {
                val pcm = ais.readAllBytes()
                fingerprint(pcm, 0, pcm.length / 2)
              }
          } catch { case scala.util.control.NonFatal(_) => bad }
        }
      }
    }(enc)
  }

  /** Audio near-duplicate pairs within `maxHamming` fingerprint bits:
    * [[audioFingerprint]] signatures (quarantined rows excluded) through
    * the SAME 16-bit-chunk pigeonhole blocking as text SimHash and image
    * dHash ([[Dedup.hammingPairs64]]) — the third signature family on
    * the one blocking definition, completing perceptual near-dup across
    * text, image, and audio. q213's oracle is the brute-force all-pairs
    * join (blocked == all-pairs for ≤3 bits).
    */
  def audioNearDupPairs(media: DataFrame, windowFrames: Int,
      maxHamming: Int = 3, batchSize: Int = 64,
      budgetPairs: Long = Long.MaxValue): DataFrame =
    Dedup.hammingPairs64(
      audioFingerprint(media, windowFrames, batchSize).filter(col("ok"))
        .select(col("media_id").as("id"), col("afp").as("sig")),
      maxHamming, budgetPairs)

  /** [[audioNearDupPairs]] in the COUNT-FACTORED quotient form
    * ([[Dedup.hammingPairsFactored64]]) — the scale path when the
    * corpus is fingerprint-degenerate and the expanded pair list would
    * be quadratic (this synthetic corpus IS: 973 distinct fingerprints
    * at the 10× replica). Output is pair mass per signature pair; Σ
    * n_pairs == the expanded form's row count (q214's oracle checks the
    * factorization against the same brute-force hashes).
    */
  def audioNearDupFactored(media: DataFrame, windowFrames: Int,
      maxHamming: Int = 3, batchSize: Int = 64): DataFrame =
    Dedup.hammingPairsFactored64(
      audioFingerprint(media, windowFrames, batchSize).filter(col("ok"))
        .select(col("media_id").as("id"), col("afp").as("sig")),
      maxHamming)

  // =========================================================================
  // Video: animated GIF through javax.imageio — the third real codec behind
  // the same batched mapPartitions seam (image: PNG/JPEG, audio: WAV).
  // =========================================================================

  /** Per-frame gray level shared by the GIF synthesis and its DuckDB
    * oracle: frame `f` of media `id` is a FLAT frame of gray
    *
    * {{{ g(id, f) = 0                           if (id + f) % 4 == 0
    *     g(id, f) = 1 + (id*31 + f*97) % 255    otherwise }}}
    *
    * — every 4th frame exactly black (the deterministic analog of scene
    * cuts / fades, so frame sampling and black-frame detection have real
    * structure to find), every other frame a nonzero pseudo-noise gray.
    * GIF stores indexed pixels losslessly against an explicit palette, so
    * the DECODED gray equals the formula bit-for-bit — integer aggregates
    * over decoded frames are exact cross-engine oracles, the video twin of
    * [[wavSample]]'s audio recurrence. Pure non-negative integer
    * arithmetic; DuckDB reproduces it with `%`.
    */
  def gifFrameGray(mediaId: Long, f: Int): Int =
    if ((mediaId + f) % 4 == 0) 0
    else (1L + Math.floorMod(mediaId * 31 + f * 97L, 255L)).toInt

  /** Deterministic REAL animated GIF: `nFrames` flat frames of
    * [[gifFrameGray]] against an explicit 256-gray palette, written through
    * the JDK's GIF sequence writer (`prepareWriteSequence` /
    * `writeToSequence`) — a real multi-frame container a real reader must
    * walk frame-by-frame, not a bag of stapled stills.
    */
  /** 256-gray palette shared by every synthesized GIF frame — stateless,
    * built once per JVM instead of once per payload.
    */
  private lazy val gifGrayPalette: java.awt.image.IndexColorModel = {
    val ramp = Array.tabulate[Byte](256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** One flat [[gifFrameGray]] frame (frame builder for the sequence
    * writers — public path and pooled path share it).
    */
  private def gifFrame(width: Int, height: Int, mediaId: Long,
      f: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, gifGrayPalette)
    val g = gifFrameGray(mediaId, f)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, g); x += 1 }
      y += 1
    }
    img
  }

  def encodeGif(width: Int, height: Int, nFrames: Int, mediaId: Long): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0, "positive GIF geometry")
    val bos = new java.io.ByteArrayOutputStream()
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        w.writeToSequence(
          new javax.imageio.IIOImage(gifFrame(width, height, mediaId, f), null, null), null)
        f += 1
      }
      w.endWriteSequence()
    } finally { w.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Synthesize a media table of REAL animated-GIF payloads from a spec
    * frame with columns `(media_id long, width int, height int, n_frames
    * int)` — same mapPartitions discipline as [[synthesizePngs]]: payload
    * bytes are born in the executor partition and never shuffle.
    */
  def synthesizeGifs(spec: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    val (idI, wI, hI, nI) = (spec.schema.fieldIndex("media_id"),
      spec.schema.fieldIndex("width"), spec.schema.fieldIndex("height"),
      spec.schema.fieldIndex("n_frames"))
    fanOut(spec).mapPartitions { rows =>
      val codecs = new ImageCodecs
      rows.map { r =>
        require(r.getInt(wI) > 0 && r.getInt(hI) > 0 && r.getInt(nI) > 0,
          "positive GIF geometry")
        val id = r.getLong(idI)
        val (w, h) = (r.getInt(wI), r.getInt(hI))
        val bytes = codecs.writeGifSequence(r.getInt(nI))(f => gifFrame(w, h, id, f))
        Row(id, bytes,
          Row("gif", Integer.valueOf(w), Integer.valueOf(h),
            Integer.valueOf(r.getInt(nI))))
      }
    }(enc)
  }

  /** REAL video-container decode through the batched mapPartitions seam:
    * the JDK's GIF reader parses the container (`getNumImages(true)` walks
    * every frame header), each frame is decoded, and per-media integer
    * aggregates over the decoded pixels — sum of frame gray levels, count
    * of exactly-black frames — come from the pixels themselves, so a
    * stubbed or broken frame decoder cannot fake them. Undecodable / null
    * payloads quarantine as `ok = false` ([[decodeImages]] convention);
    * payload bytes never shuffle; frame pixels never become rows.
    */
  def decodeVideo(media: DataFrame, batchSize: Int = 64): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    val outSchema = StructType(media.schema.fields :+
      StructField("decoded", StructType(Seq(
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false),
        StructField("n_frames", IntegerType, nullable = false),
        StructField("sum_gray", LongType, nullable = false),
        StructField("black_frames", IntegerType, nullable = false),
        StructField("ok", BooleanType, nullable = false))), nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val mediaIdx = media.schema.fieldIndex("media")
    val bad = Row(0, 0, 0, 0L, 0, false)
    fanOut(media).mapPartitions { rows =>
      val codecs = new ImageCodecs
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](mediaIdx)
          val dec =
            if (bytes == null) bad
            else try codecs.withGif(bytes) { rd =>
              val n = rd.getNumImages(/* allowSearch = */ true)
              if (n < 1) bad
              else {
                var sumGray = 0L; var black = 0; var f = 0
                while (f < n) {
                  val g = rd.read(f).getRGB(0, 0) & 0xff
                  sumGray += g; if (g == 0) black += 1
                  f += 1
                }
                Row(rd.getWidth(0), rd.getHeight(0), n, sumGray, black, true)
              }
            } catch { case scala.util.control.NonFatal(_) => bad }
          Row.fromSeq(r.toSeq :+ dec)
        }
      }
    }(enc)
  }

  /** REAL strided frame sampling — the keyframe-extraction shape of video
    * corpus prep: decode every `stride`-th frame by INDEX-ADDRESSED read
    * (`reader.read(f)` — the same access shape a production codec serves
    * from keyframe seeks) and emit one row per sampled frame with its
    * decoded gray level and black verdict. Frame-grain output, ~stride×
    * smaller than the frame count and pixel-free — pixel data never
    * becomes rows, never shuffles ([[audioWindowEnergy]]'s discipline).
    * Undecodable / null payloads contribute no frames.
    */
  def videoFrameSample(media: DataFrame, stride: Int, batchSize: Int = 64): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    require(batchSize >= 1, "batchSize must be >= 1")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("gray", IntegerType, nullable = false),
      StructField("is_black", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val mediaIdx = media.schema.fieldIndex("media")
    fanOut(media).mapPartitions { rows =>
      val codecs = new ImageCodecs
      rows.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          val bytes = r.getAs[Array[Byte]](mediaIdx)
          val id = r.getLong(idIdx)
          val frames: Seq[Row] =
            if (bytes == null) Nil
            else try codecs.withGif(bytes) { rd =>
              val n = rd.getNumImages(true)
              (0 until n by stride).map { f =>
                val g = rd.read(f).getRGB(0, 0) & 0xff
                Row(id, f, g, g == 0)
              }
            } catch { case scala.util.control.NonFatal(_) => Nil }
          frames
        }
      }
    }(enc)
  }

  // =========================================================================
  // Patterned video: the perceptual near-dup fixture for the VIDEO family.
  // The flat-gray GIFs above are the TEMPORAL fixture (black-frame scene
  // structure for q179-q181) but are signature-degenerate (193 distinct
  // gray patterns over 25k seeds — useless for near-dup blocking); these
  // frames carry per-PIXEL content so per-frame dHashes have full
  // 64-bit entropy, completing the perceptual triad (text SimHash, image
  // dHash, audio fingerprint, video signature) on the ONE hammingPairs64
  // blocking.
  // =========================================================================

  /** Per-pixel gray shared by the patterned-GIF synthesis and its DuckDB
    * oracle — the image family's [[pngImage]] mix applied per frame, in
    * the mod-2^24-reduced form both engines evaluate without overflow:
    *
    * {{{ ticker(y) = f·7368787 if y == 5·height/8 else 0
    *     v(seed,f,y,x) = (435·(seed mod 2^24) + ticker(y) + y·width + x) mod 2^24
    *     gray = (299·((v>>16)&255) + 587·((v>>8)&255) + 114·(v&255)) / 1000 }}}
    *
    * where 435 = 1099511628211 mod 2^24 (the FNV seed mix — reduced
    * operands keep DuckDB's checked signed-64 arithmetic exact at any
    * seed). The content is STATIC per seed except one frame-varying
    * "ticker" row — the row dHash grid row 5 samples — modeling real
    * video structure (a shot's frames are near-identical; a ticker /
    * timestamp band moves): per-frame dHashes agree on 56 bits and
    * disagree on up to 8, so the temporal majority genuinely suppresses
    * the moving band and keeps the stable content. A first-draft
    * all-pixels-vary formula made frame hashes independent noise, the
    * majority collapsed toward sparse signatures (14 k docs on vsig=0
    * at the 100× replica — a quadratic near-dup class that pushed
    * q221's blocked join to 1,394 s), and the blocking's 0-chunk
    * buckets flooded; with the ticker form signatures carry 56
    * seed-rich stable bits and classes stay near-singleton. Pure
    * non-negative integer arithmetic; DuckDB reproduces it with `%`
    * and `//`.
    */
  def patternFrameGray(seed: Long, f: Int, y: Int, x: Int, width: Int,
      height: Int): Int = {
    val ticker = if (y == 5 * height / 8) f.toLong * 7368787L else 0L
    val v = ((1099511628211L % 16777216L) * (seed % 16777216L) +
      ticker + y.toLong * width + x) % 16777216L
    ((299 * ((v >> 16) & 0xff) + 587 * ((v >> 8) & 0xff) + 114 * (v & 0xff)) / 1000).toInt
  }

  /** Reversed 256-gray palette: entry i decodes to gray 255−i. A frame
    * written with index 255−gray against THIS palette decodes to the
    * same pixels as index gray against [[gifGrayPalette]] — the video
    * twin of the RGBA-vs-RGB image re-encode: byte-distinct payloads
    * (different color table AND different LZW index stream), identical
    * decoded rasters, so the video signatures match at hamming 0.
    */
  private lazy val gifGrayPaletteInv: java.awt.image.IndexColorModel = {
    val ramp = Array.tabulate[Byte](256)(i => (255 - i).toByte)
    new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** One patterned frame (straight or inverted-palette encoding — the
    * decoded pixels are identical either way).
    */
  private def patternGifFrame(width: Int, height: Int, seed: Long, f: Int,
      inverted: Boolean): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED,
      if (inverted) gifGrayPaletteInv else gifGrayPalette)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val g = patternFrameGray(seed, f, y, x, width, height)
        raster.setSample(x, y, 0, if (inverted) 255 - g else g)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Synthesize patterned animated GIFs from a spec frame `(media_id
    * long, width int, height int, n_frames int, seed long, inverted
    * boolean)` — same mapPartitions discipline as [[synthesizeGifs]]:
    * payload bytes are born in the executor partition and never shuffle.
    * Rows sharing `seed` but differing in `inverted` are the SAME frame
    * sequence under two byte-distinct encodings (straight vs reversed
    * palette), the re-encode near-duplicate class [[videoSignature]]
    * exists to catch.
    */
  def synthesizePatternGifs(spec: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    val (idI, wI, hI, nI) = (spec.schema.fieldIndex("media_id"),
      spec.schema.fieldIndex("width"), spec.schema.fieldIndex("height"),
      spec.schema.fieldIndex("n_frames"))
    val seedI = spec.schema.fieldIndex("seed")
    val invI = spec.schema.fieldIndex("inverted")
    fanOut(spec).mapPartitions { rows =>
      val codecs = new ImageCodecs
      rows.map { r =>
        require(r.getInt(wI) > 0 && r.getInt(hI) > 0 && r.getInt(nI) > 0,
          "positive GIF geometry")
        val (w, h) = (r.getInt(wI), r.getInt(hI))
        val (seed, inv) = (r.getLong(seedI), r.getBoolean(invI))
        val bytes = codecs.writeGifSequence(r.getInt(nI))(f =>
          patternGifFrame(w, h, seed, f, inv))
        Row(r.getLong(idI), bytes,
          Row("gif", Integer.valueOf(w), Integer.valueOf(h),
            Integer.valueOf(r.getInt(nI))))
      }
    }(enc)
  }

  /** 64-bit perceptual VIDEO signature: per-frame [[dhash64]] over the
    * decoded GIF frames, folded by PER-BIT MAJORITY (bit k of the
    * signature is set iff more than half the frames set bit k of their
    * frame dHash) — the temporal analog of SimHash's coordinate-wise
    * majority, robust to a minority of differing frames (an inserted
    * title card, a re-rendered end card) while staying a pure integer
    * function of the decoded rasters, so q220's DuckDB oracle recomputes
    * ALL 64 BITS from the synthesis spec: a value-level differential
    * over container walk → per-frame decode → 9×8 resample → luma →
    * gradient bits → temporal majority. Ties (2·count == n_frames) clear
    * the bit in both engines. Undecodable / empty payloads quarantine as
    * (vsig=0, n_frames=0, ok=false) — the [[decodeImages]] convention.
    * Scale shape: one codec pass, 8 bytes out per video; payloads never
    * shuffle, frames never become rows.
    */
  def videoSignature(media: DataFrame, batchSize: Int = 64): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("vsig", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("ok", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val mediaIdx = media.schema.fieldIndex("media")
    fanOut(media).mapPartitions { rows =>
      val codecs = new ImageCodecs
      val gray = Array.ofDim[Int](8, 9)
      val cnt = new Array[Int](64)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](mediaIdx)
          var vsig = 0L
          var nf = 0
          var ok = false
          if (bytes != null) try codecs.withGif(bytes) { rd =>
            val n = rd.getNumImages(/* allowSearch = */ true)
            if (n >= 1) {
              java.util.Arrays.fill(cnt, 0)
              var f = 0
              while (f < n) {
                val h = dhash64(rd.read(f), gray)
                var k = 0
                while (k < 64) {
                  if (((h >>> k) & 1L) == 1L) cnt(k) += 1
                  k += 1
                }
                f += 1
              }
              var k = 0
              while (k < 64) {
                if (2 * cnt(k) > n) vsig |= 1L << k
                k += 1
              }
              nf = n
              ok = true
            }
          } catch { case scala.util.control.NonFatal(_) =>
            vsig = 0L; nf = 0; ok = false
          }
          Row(r.getLong(idIdx), if (ok) vsig else 0L, nf, ok)
        }
      }
    }(enc)
  }

  /** Video near-duplicate pairs within `maxHamming` signature bits:
    * [[videoSignature]] majorities (quarantined rows excluded) through
    * the SAME 16-bit-chunk pigeonhole blocking as text SimHash, image
    * dHash and audio fingerprints ([[Dedup.hammingPairs64]]) — the
    * fourth signature family on the one blocking definition. q221's
    * oracle is the brute-force all-pairs join (blocked == all-pairs for
    * ≤3 bits).
    */
  def videoNearDupPairs(media: DataFrame, maxHamming: Int = 3,
      batchSize: Int = 64, budgetPairs: Long = Long.MaxValue): DataFrame =
    Dedup.hammingPairs64(
      videoSignature(media, batchSize).filter(col("ok"))
        .select(col("media_id").as("id"), col("vsig").as("sig")),
      maxHamming, budgetPairs)

  /** Crawl-cadence video near-dup: incoming videos probed against a
    * STORED corpus by majority signature through the cross-frame
    * blocking ([[Dedup.hammingPairsIncremental64]]) — O(|batch| +
    * matched buckets), the store is never paired against itself; the
    * "have we already crawled this video (under any re-encode)?" gate,
    * completing the video family's lifecycle symmetry with images
    * (q215) and the persisted signature index (q216-q218, which is
    * signature-family-agnostic and serves video signatures unchanged).
    * q222's oracle is the brute-force cross join over SQL-recomputed
    * majorities.
    */
  def videoNearDupIncremental(existingMedia: DataFrame, incomingMedia: DataFrame,
      maxHamming: Int = 3, batchSize: Int = 64,
      budgetPairs: Long = Long.MaxValue): DataFrame = {
    def sigOf(media: DataFrame): DataFrame =
      videoSignature(media, batchSize).filter(col("ok"))
        .select(col("media_id").as("id"), col("vsig").as("sig"))
    Dedup.hammingPairsIncremental64(sigOf(existingMedia), sigOf(incomingMedia),
      maxHamming, budgetPairs)
  }

  /** The batched inference contract for payload → embedding extraction —
    * the production shape of a model forward pass: one call per batch of
    * payloads (a GPU/ONNX session wants batches, one session init per
    * partition), one fixed-dim float vector per input in order. Same seam
    * discipline as [[BatchCodec]]: swapping the stub for a real model is
    * the only production change.
    */
  type FeatureCodec = Seq[Array[Byte]] => Seq[Array[Float]]

  /** Deterministic stub: FNV-1a over (payload bytes, dim index), scaled to
    * [-1, 1] — stable across JVMs, no RNG.
    */
  def stubFeatureCodec(dim: Int): FeatureCodec = batch => batch.map { bytes =>
    Array.tabulate(dim) { i =>
      var h = 1469598103934665603L
      h = (h ^ i) * 1099511628211L
      if (bytes != null) { var j = 0; while (j < bytes.length) {
        h = (h ^ (bytes(j) & 0xff)) * 1099511628211L; j += 1 } }
      (h.toDouble / Long.MaxValue).toFloat
    }
  }

  /** Batched feature extraction through the [[FeatureCodec]] seam:
    * mapPartitions groups rows into `batchSize` slices, the codec runs
    * once per slice, and the output `(media_id, embedding)` feeds every
    * [[Similarity]] operator. Partitioning preserved, payload never
    * shuffles, everything around the seam stays codegen.
    */
  def extractFeaturesBatched(media: DataFrame, codec: FeatureCodec, dim: Int,
      batchSize: Int = 64): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    val idIdx = media.schema.fieldIndex("media_id")
    val mediaIdx = media.schema.fieldIndex("media")
    fanOut(media).mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val vecs = codec(batch.map(_.getAs[Array[Byte]](mediaIdx)))
        require(vecs.length == batch.length,
          s"codec returned ${vecs.length} results for ${batch.length} inputs")
        require(vecs.forall(_.length == dim),
          s"codec returned a vector of the wrong dimension (expected $dim)")
        batch.lazyZip(vecs).map { case (r, v) =>
          Row(r.getLong(idIdx), v.toSeq)
        }
      }
    }(enc)
  }

  /** ===== STUB codec ===== Feature extraction: media payload → fixed-dim
    * float embedding. The stub derives a deterministic pseudo-embedding
    * from the payload bytes (xxhash per dimension, scaled to [-1, 1]) so
    * the downstream contract — array<float> of `dim`, consumable by every
    * [[Similarity]] operator — is real and testable; a production build
    * swaps in a model forward pass inside mapPartitions (batched, one
    * session init per partition).
    */
  def extractFeatures(media: DataFrame, dim: Int): DataFrame =
    media.select(
      col("media_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (xxhash64(col("media"), i).cast("double") / lit(Long.MaxValue.toDouble))
          .cast("float")).as("embedding"))
}
