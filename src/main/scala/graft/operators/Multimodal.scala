package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct alongside. Every codec in
  * this file is REAL and JRE-native — `javax.imageio` (PNG/TIFF/GIF/BMP)
  * for stills, video containers, resize; `javax.sound.sampled` (WAV/AU/
  * AIFF) for audio — no external library, no stubs. A heavier codec (JNI
  * JPEG2000, ONNX embedding model, MP4 demuxer) swaps into the same
  * `mapPartitions` fixed-batch slots without touching the plan shape:
  * decode stays a narrow map, frame-sampling stays an in-map fan-out, and
  * partitioning/pushdown are untouched.
  */
object Multimodal {

  /** Typed metadata struct over a binary column — the one place the
    * payload-metadata contract (mime, byte count, content hash) lives. */
  private def metaStruct(content: org.apache.spark.sql.Column) = struct(
    lit("application/octet-stream").as("mime"),
    length(content).cast("bigint").as("n_bytes"),
    md5(content).as("content_md5"))

  /** Attach a binary payload + metadata struct to each document. In a real
    * pipeline the binary arrives from the source (parquet/lance binary
    * column); here the documents' text bytes stand in as the payload.
    *
    * NOT balanced here (round 17): consumers split between cheap
    * metadata/stub paths (m1/m5 — a Balance exchange measured as pure
    * +0.25 s overhead) and CPU-dense codec paths; the SYNTHETIC payload
    * generators (real encode work per row) and the codec consumers carry
    * their own Balance instead. */
  def withPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      col(textCol).cast("binary").as("content"),
      metaStruct(col(textCol).cast("binary")).as("meta"))

  /** REAL resize in the codec slot — the stub codec is retired: decode
    * (partition-hoisted readers, [[PartitionImageDecoder]]), downsample by
    * integer BLOCK AVERAGING — each target pixel is the floor-mean of its
    * `factor`×`factor` source block per channel — re-encode to PNG, and
    * decode the RE-ENCODED bytes for the emitted stats, so the output
    * attests the full resize→encode→decode round trip, not just the
    * arithmetic.
    *
    * Block averaging instead of `Graphics2D`/`AffineTransform`: a
    * factor-k box filter on a k-divisible image IS the area-averaging
    * resample (what a quality downscale does), but with deterministic
    * integer rounding — any engine can recompute the scaled pixels from
    * the source values, where Java2D's interpolation rounding is
    * implementation-defined and would demote this query to rows-only.
    * Trailing rows/columns of a non-divisible image are cropped
    * (floor(w/k)×floor(h/k) output). Returns one row per payload:
    * (doc_id, width, height, sum_r, sum_g, sum_b, n_bytes) with the
    * resized dimensions, per-channel pixel sums of the re-decoded output,
    * and the re-encoded PNG's size; undecodable or sub-`factor` payloads
    * emit the (-1, -1, 0, 0, 0, -1) sentinel — one poisoned row, never a
    * failed job. Narrow map; no shuffle. */
  def resizeImageBatched(payloads: DataFrame, factor: Int = 4,
      batchSize: Int = 64): DataFrame = {
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads
      .select(col("doc_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val decoder = new PartitionImageDecoder
        val encoder = new PartitionPngEncoder
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            val img = decoder.decode(bytes)
            val w2 = if (img == null) 0 else img.getWidth / factor
            val h2 = if (img == null) 0 else img.getHeight / factor
            if (w2 == 0 || h2 == 0) (id, -1, -1, 0L, 0L, 0L, -1L)
            else {
              val small = new java.awt.image.BufferedImage(w2, h2,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              // Long accumulators: 255 * factor^2 overflows Int past
              // factor ~2900, and a wrapped sum would emit plausible
              // garbage pixels rather than fail.
              val area = factor.toLong * factor
              var yy = 0
              while (yy < h2) {
                var xx = 0
                while (xx < w2) {
                  var (ar, ag, ab) = (0L, 0L, 0L)
                  var dy = 0
                  while (dy < factor) {
                    var dx = 0
                    while (dx < factor) {
                      val rgb = img.getRGB(xx * factor + dx, yy * factor + dy)
                      ar += (rgb >> 16) & 0xff
                      ag += (rgb >> 8) & 0xff
                      ab += rgb & 0xff
                      dx += 1
                    }
                    dy += 1
                  }
                  small.setRGB(xx, yy,
                    (((ar / area) << 16) | ((ag / area) << 8) |
                      (ab / area)).toInt)
                  xx += 1
                }
                yy += 1
              }
              val png = encoder.write(small)
              // Stats come from RE-DECODING the re-encoded bytes: PNG is
              // lossless, so any mismatch with the block-average
              // arithmetic means the round trip itself broke.
              val back = decoder.decode(png)
              if (back == null) (id, -1, -1, 0L, 0L, 0L, -1L)
              else {
                var (sr, sg, sb) = (0L, 0L, 0L)
                var y = 0
                while (y < back.getHeight) {
                  var x = 0
                  while (x < back.getWidth) {
                    val rgb = back.getRGB(x, y)
                    sr += (rgb >> 16) & 0xff
                    sg += (rgb >> 8) & 0xff
                    sb += rgb & 0xff
                    x += 1
                  }
                  y += 1
                }
                (id, back.getWidth, back.getHeight, sr, sg, sb,
                  png.length.toLong)
              }
            }
          }
        }
      }
      .toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b",
        "n_bytes")
  }

  /** Batched decode — the `mapPartitions` integration point a VECTORIZED
    * codec (JNI image/audio library, ONNX runtime) plugs into: payloads
    * stream through each partition in fixed-size batches (the Scala analog
    * of `mapInPandas`'s Arrow batches), `codec` sees a whole batch at once
    * (amortizing per-call JNI/model overhead), and rows come back 1:1.
    *
    * The default codec is the deterministic stub (byte length, head/tail
    * Unicode CODEPOINTS — reproducible from the payload text by any engine,
    * so this path is fully oracle-checkable, unlike hash-based stubs).
    * Memory per task is one batch of payloads, not the partition. */
  def decodeBatched(
      payloads: DataFrame,
      batchSize: Int = 64,
      codec: Seq[Array[Byte]] => Seq[(Long, Int, Int)] = stubBatchCodec)
      : DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads
      .select(col("doc_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val out = codec(batch.map(_._2))
          require(out.length == batch.length,
            s"codec returned ${out.length} rows for a ${batch.length}-row batch")
          batch.iterator.zip(out.iterator).map { case ((id, _), (n, h, t)) =>
            (id, n, h, t)
          }
        }
      }
      .toDF("doc_id", "n_bytes", "head_cp", "tail_cp")
  }

  /** ======= STUB batch codec: whole-batch payload stats. =======
    * Head/tail are the first/last Unicode CODEPOINTS of the UTF-8 payload
    * (not raw bytes): any engine can recompute `ascii(first char)` from the
    * text, so the oracle contract holds for non-ASCII documents too — a raw
    * tail byte would be a UTF-8 continuation byte there. */
  private def stubBatchCodec(batch: Seq[Array[Byte]]): Seq[(Long, Int, Int)] =
    batch.map { bytes =>
      if (bytes.isEmpty) (0L, -1, -1)
      else {
        val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        (bytes.length.toLong, s.codePointAt(0),
          s.codePointBefore(s.length))
      }
    }

  /** Deterministic tiny-PNG payload synthesis — the image-side test-data
    * generator: doc `d`'s pixel (x, y) is pure arithmetic
    * (`(d*31 + x*7 + y*13) mod 256` for R, analogous G/B), rendered into a
    * `BufferedImage` and ENCODED to real PNG bytes per row (narrow map, no
    * shuffle). PNG is lossless, so a real decoder recovers exactly these
    * values — which is what makes [[decodeImageBatched]]'s output
    * oracle-checkable: any engine can recompute the pixel stats from the
    * formula without decoding anything. */
  def syntheticPngPayloads(docs: DataFrame, idCol: String,
      w: Int = 8, h: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Balanced like withPayload (per-row PNG encode is the CPU cost), with
    // the writer hoisted per partition (PartitionPngEncoder — the static
    // ImageIO.write registry walk serializes across tasks).
    Balance(docs.select(col(idCol).cast("long").as("doc_id")))
      .as[Long]
      .mapPartitions { it =>
        val enc = new PartitionPngEncoder
        it.map { d =>
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              // floorMod: Scala % keeps the dividend's sign, and a negative
              // doc_id would pack sign-extended bits across channels.
              val r = Math.floorMod(d * 31 + x * 7 + y * 13, 256L).toInt
              val g = Math.floorMod(d * 17 + x * 11 + y * 3, 256L).toInt
              val b = Math.floorMod(d * 29 + x * 5 + y * 19, 256L).toInt
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          (d, enc.write(img))
        }
      }
      .toDF("doc_id", "content")
      .withColumn("meta", metaStruct(col("content")))
  }

  /** Partition-lifetime audio opener — the [[PartitionImageDecoder]]
    * discipline for `javax.sound.sampled`: `AudioSystem
    * .getAudioInputStream(stream)` walks the whole `AudioFileReader` SPI
    * provider list per call (each provider parses the header and throws on
    * mismatch), so each PARTITION keeps the providers that have already
    * matched and probes them first; the full `ServiceLoader` list is
    * consulted only the first time a new container format appears in the
    * partition. Every probe gets a fresh `ByteArrayInputStream` (the reader
    * contract needs mark/reset; a fresh wrapper is cheaper than reset
    * bookkeeping over a shared one). Not thread-safe; one instance per
    * `mapPartitions` task. */
  /** Partition-lifetime WAVE encoder — the [[PartitionAudioDecoder]]
    * discipline on the ENCODE side: `AudioSystem.write` re-walks the
    * `AudioFileWriter` SPI provider list on EVERY call (measured at
    * native sf1: the walk, not the codec, was m11's cost — 5.8 s of the
    * 6.1 s query was the synth leg, and the round-11 "partition grain"
    * diagnosis was wrong: the input was already 8 balanced partitions
    * and repartitioning moved nothing). Each partition resolves the
    * WAVE-capable writer once; the writer itself is stateless across
    * calls. Not thread-safe; one instance per `mapPartitions` task. */
  /** Partition-lifetime PNG encoder — [[PartitionWavEncoder]]'s discipline
    * on the image WRITE side: the `ImageIO.write(img, "png", out)`
    * convenience re-walks the writer SPI registry per call and serializes
    * on the static registry — invisible while synthesis ran on 1-3 splits,
    * but once round-17's Balance spread it across every core the
    * contention measured m4 3.1 s → 13.3 s and m10 2.4 s → 4.8 s at
    * sf0.1. One writer per partition, registry consulted once. Not
    * thread-safe; one instance per `mapPartitions` task. */
  private final class PartitionPngEncoder {
    private lazy val writer: javax.imageio.ImageWriter =
      javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    def write(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(img)
      ios.close()
      bos.toByteArray
    }
  }

  private final class PartitionWavEncoder {
    private lazy val writer: javax.sound.sampled.spi.AudioFileWriter = {
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
        .iterator().asScala
        .find(_.isFileTypeSupported(
          javax.sound.sampled.AudioFileFormat.Type.WAVE))
        .getOrElse(sys.error("no WAVE AudioFileWriter on this JRE"))
    }
    def write(ais: javax.sound.sampled.AudioInputStream): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      writer.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
  }

  private final class PartitionAudioDecoder {
    private val matched = scala.collection.mutable.ArrayBuffer
      .empty[javax.sound.sampled.spi.AudioFileReader]
    private lazy val providers: Seq[javax.sound.sampled.spi.AudioFileReader] = {
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader])
        .iterator().asScala.toSeq
    }

    /** Opened stream, or null when no provider recognizes the payload. */
    def open(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
      var i = 0
      while (i < matched.length) {
        try return matched(i).getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => ()
          case _: java.io.IOException => ()
        }
        i += 1
      }
      providers.foreach { p =>
        if (!matched.contains(p)) {
          try {
            val ais = p.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            matched += p
            return ais
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => ()
            case _: java.io.IOException => ()
          }
        }
      }
      null
    }
  }

  /** Partition-lifetime image decoder: `ImageIO.read(stream)` re-scans the
    * whole SPI reader registry per call (measured as a real fraction of the
    * 200k-image decode cost), so each PARTITION instead keeps the readers
    * it has already matched and probes them first — the registry is
    * consulted only the first time a new format appears in the partition.
    * The stream wrapper is a direct `MemoryCacheImageInputStream` (the
    * `ImageIO.createImageInputStream` convenience is another per-call SPI
    * scan). Not thread-safe; one instance per `mapPartitions` task. */
  private final class PartitionImageDecoder {
    private val readers =
      scala.collection.mutable.ArrayBuffer.empty[javax.imageio.ImageReader]

    /** Cached-first reader acquisition: probe the partition's already-
      * matched readers, consult the SPI registry only for a format this
      * partition hasn't seen. Returns null when nothing can decode. */
    private def acquire(iis: javax.imageio.stream.ImageInputStream)
        : javax.imageio.ImageReader = {
      var reader: javax.imageio.ImageReader = null
      val cached = readers.iterator
      while (reader == null && cached.hasNext) {
        val cand = cached.next()
        iis.seek(0)
        // canDecodeInput restores the stream position per the SPI
        // contract; the seek(0) guards against a non-conforming plugin.
        if (cand.getOriginatingProvider.canDecodeInput(iis)) reader = cand
      }
      if (reader == null) {
        iis.seek(0)
        val fresh = javax.imageio.ImageIO.getImageReaders(iis)
        if (fresh.hasNext) { reader = fresh.next(); readers += reader }
      }
      reader
    }

    /** Decoded image, or null for an undecodable payload. */
    def decode(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val reader = acquire(iis)
        if (reader == null) null
        else {
          iis.seek(0)
          reader.setInput(iis, true, true)
          try reader.read(0)
          // Detach the consumed stream so the cached reader is clean for
          // its next payload.
          finally reader.setInput(null)
        }
      } catch {
        // NonFatal, not just IOException: the JDK readers throw unchecked
        // exceptions (ArrayIndexOutOfBounds, NegativeArraySize,
        // IllegalArgument) on truncated or hostile payloads, and a
        // poisoned payload must cost one sentinel row, not the job.
        case scala.util.control.NonFatal(_) => null
      } finally iis.close()
    }

    /** ALL frames of a multi-frame container (multi-page TIFF, animated
      * GIF), or null for an undecodable payload. `seekForwardOnly` must be
      * false here: getNumImages(true) walks the whole directory chain
      * before the frames are read back. */
    def decodeFrames(bytes: Array[Byte]): Array[java.awt.image.BufferedImage] = {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val reader = acquire(iis)
        if (reader == null) null
        else {
          iis.seek(0)
          reader.setInput(iis, false, true)
          try Array.tabulate(reader.getNumImages(true))(reader.read)
          finally reader.setInput(null)
        }
      } catch {
        case scala.util.control.NonFatal(_) => null
      } finally iis.close()
    }
  }

  /** REAL image decode in the batched-codec slot — no stub: each payload
    * batch is decoded with the JDK's `javax.imageio` (PNG/JPEG/BMP/GIF
    * readers ship with the JRE; no external library), emitting
    * (width, height, per-channel pixel sums). Same `mapPartitions`
    * fixed-batch shape as [[decodeBatched]] — a JNI/ONNX codec swaps in
    * without touching the plan; memory per task is one batch of decoded
    * images, and reader acquisition is hoisted per partition
    * ([[PartitionImageDecoder]]). Undecodable payloads (not an image,
    * truncated) emit the (-1, -1, 0, 0, 0) sentinel rather than failing
    * the task — at corpus scale a poisoned payload must cost one row, not
    * the job. */
  def decodeImageBatched(payloads: DataFrame, batchSize: Int = 64)
      : DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads
      .select(col("doc_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val decoder = new PartitionImageDecoder
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            val img = decoder.decode(bytes)
            if (img == null) (id, -1, -1, 0L, 0L, 0L)
            else {
              var (sr, sg, sb) = (0L, 0L, 0L)
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val rgb = img.getRGB(x, y)
                  sr += (rgb >> 16) & 0xff
                  sg += (rgb >> 8) & 0xff
                  sb += rgb & 0xff
                  x += 1
                }
                y += 1
              }
              (id, img.getWidth, img.getHeight, sr, sg, sb)
            }
          }
        }
      }
      .toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b")
  }

  /** REAL decode → feature-extract: decode each payload image
    * (partition-hoisted readers, same as [[decodeImageBatched]]) and emit
    * an 8-dim integer feature vector
    * (width, height, sum_r, sum_g, sum_b, max_r, max_g, max_b).
    * Integer features keep the vector oracle-recomputable from the
    * [[syntheticPngPayloads]] pixel formula with no float-formatting
    * hazard; a model-embedding codec (ONNX) swaps into the same slot with
    * a float vector. Undecodable payloads emit an 8×(-1) sentinel. */
  def decodeImageFeatures(payloads: DataFrame, batchSize: Int = 64)
      : DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads
      .select(col("doc_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val decoder = new PartitionImageDecoder
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            val img = decoder.decode(bytes)
            if (img == null) (id, Array.fill(8)(-1L))
            else {
              var (sr, sg, sb) = (0L, 0L, 0L)
              var (mr, mg, mb) = (0L, 0L, 0L)
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val rgb = img.getRGB(x, y)
                  val r = (rgb >> 16) & 0xff
                  val g = (rgb >> 8) & 0xff
                  val b = rgb & 0xff
                  sr += r; sg += g; sb += b
                  if (r > mr) mr = r
                  if (g > mg) mg = g
                  if (b > mb) mb = b
                  x += 1
                }
                y += 1
              }
              (id, Array(img.getWidth.toLong, img.getHeight.toLong,
                sr, sg, sb, mr, mg, mb))
            }
          }
        }
      }
      .toDF("doc_id", "features")
  }

  /** Deterministic WAV payload synthesis — the audio-side twin of
    * [[syntheticPngPayloads]]: doc `d`'s sample `i` is pure arithmetic
    * (`((d*31 + i*7) mod 4096) - 2048`, well inside 16-bit PCM range),
    * encoded to a REAL RIFF/WAVE file (16-bit signed little-endian PCM,
    * mono) through `javax.sound.sampled` — narrow map, no shuffle. PCM is
    * lossless, so a real parser recovers exactly these values, which is
    * what makes [[decodeAudioBatched]] oracle-checkable: any engine can
    * recompute the sample stats from the formula without parsing
    * anything. */
  def syntheticWavPayloads(docs: DataFrame, idCol: String,
      nSamples: Int = 256, sampleRate: Int = 8000,
      seedCol: String = "", balance: Boolean = true): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // seedCol decouples the sample formula from the row id: a twin row can
    // carry its ORIGINAL's seed (same leading samples, longer tail) under
    // a fresh id — the fixture shape audio overlap dedup needs.
    val seed = if (seedCol.isEmpty) col(idCol) else col(seedCol)
    // `balance` is a CALLER hint (round 18): WAV synthesis itself is ~4 µs
    // per row (the whole sf0.1 corpus serialized in 0.19 s, r16 record) —
    // three orders lighter than the PNG/TIFF encoders whose Balance wins
    // were unconditional — so whether the guard's exchange pays depends on
    // what CONSUMES the payloads. m12's frame-overlap pipeline (decode +
    // per-frame md5 + self-join) amortizes it; m11's single cheap parse
    // does not (round-17 quiet-box A/B: m11 0.29 → 0.49 s was the
    // exchange + per-task codec inits, while the native-sf1 lane's real
    // cost was the per-row SPI walk, fixed separately by
    // PartitionWavEncoder). The operator can't see downstream weight;
    // the caller can.
    val ids = docs.select(col(idCol).cast("long").as("doc_id"),
      seed.cast("long").as("seed"))
    (if (balance) Balance(ids) else ids)
      .as[(Long, Long)]
      .mapPartitions { it =>
        // Writer resolved once per partition (PartitionWavEncoder — the
        // per-row AudioSystem.write SPI walk was m11's actual native-sf1
        // cost, not partition grain).
        val enc = new PartitionWavEncoder
        it.map { case (d, sd) =>
          val pcm = new Array[Byte](nSamples * 2)
          var i = 0
          while (i < nSamples) {
            val s = (Math.floorMod(sd * 31 + i * 7, 4096L) - 2048L).toShort
            pcm(2 * i) = (s & 0xff).toByte         // little-endian
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat,
            /* bigEndian = */ false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
          (d, enc.write(ais))
        }
      }
      .toDF("doc_id", "content")
      .withColumn("meta", metaStruct(col("content")))
  }

  /** REAL audio decode in the batched-codec slot — the audio twin of
    * [[decodeImageBatched]], proving the slot is codec-agnostic: each
    * payload's RIFF/WAVE header + PCM frames are parsed with the JDK's
    * `javax.sound.sampled` (WAV/AU/AIFF readers ship with the JRE; no
    * external library), emitting (sample_rate, n_channels, n_samples,
    * sum_amp, max_amp) over the decoded 16-bit samples. Same
    * `mapPartitions` fixed-batch shape — a resampling or fingerprinting
    * codec (the audio analog of pHash) swaps in without touching the
    * plan. Unparseable payloads emit the (-1, -1, -1, 0, 0) sentinel:
    * one poisoned row, never a failed job. */
  def decodeAudioBatched(payloads: DataFrame, batchSize: Int = 64)
      : DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads
      .select(col("doc_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = new PartitionAudioDecoder
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            try {
              val ais = dec.open(bytes)
              if (ais == null) (id, -1, -1, 0L, 0L, 0L)
              else try {
                val fmt = ais.getFormat
                if (fmt.getSampleSizeInBits != 16)
                  (id, -1, -1, 0L, 0L, 0L)
                else {
                  val data = ais.readAllBytes()
                  val le = !fmt.isBigEndian
                  var (sum, maxA) = (0L, Long.MinValue)
                  var n = 0L
                  var i = 0
                  while (i + 1 < data.length) {
                    val lo = data(if (le) i else i + 1) & 0xff
                    val hi = data(if (le) i + 1 else i)
                    val s = ((hi << 8) | lo).toLong
                    sum += s
                    if (s > maxA) maxA = s
                    n += 1
                    i += 2
                  }
                  (id, fmt.getSampleRate.toInt, fmt.getChannels, n, sum,
                    if (n == 0) 0L else maxA)
                }
              } finally ais.close()
            } catch {
              // UnsupportedAudioFileException + the unchecked surprises a
              // hostile header can trigger — sentinel, not a failed job.
              case scala.util.control.NonFatal(_) => (id, -1, -1, 0L, 0L, 0L)
            }
          }
        }
      }
      .toDF("doc_id", "sample_rate", "n_channels", "n_samples", "sum_amp",
        "max_amp")
  }

  /** REAL audio decode emitting the SAMPLE ARRAY (16-bit values as ints) —
    * the feed for downstream audio analysis (frame fingerprints, VAD,
    * resampling). Same parse as [[decodeAudioBatched]]; unparseable or
    * non-16-bit payloads emit an empty array (one poisoned row, never a
    * failed job). */
  def decodeAudioSamples(payloads: DataFrame, batchSize: Int = 64)
      : DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads
      .select(col("doc_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = new PartitionAudioDecoder
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            try {
              val ais = dec.open(bytes)
              if (ais == null) (id, Array.empty[Int])
              else try {
                val fmt = ais.getFormat
                if (fmt.getSampleSizeInBits != 16) (id, Array.empty[Int])
                else {
                  val data = ais.readAllBytes()
                  val le = !fmt.isBigEndian
                  val out = new Array[Int](data.length / 2)
                  var i = 0
                  while (i + 1 < data.length) {
                    val lo = data(if (le) i else i + 1) & 0xff
                    val hi = data(if (le) i + 1 else i)
                    out(i / 2) = (hi << 8) | lo
                    i += 2
                  }
                  (id, out)
                }
              } finally ais.close()
            } catch {
              case scala.util.control.NonFatal(_) => (id, Array.empty[Int])
            }
          }
        }
      }
      .toDF("doc_id", "samples")
  }

  /** Audio near-dup by SHARED PCM-FRAME fingerprints — [[frameOverlap]]'s
    * shape on the DECODED sample stream instead of container bytes (two
    * WAVs with identical leading audio but different headers or tails
    * still pair — re-posted clips, shared intros, partial copies). Frames
    * are `frameSamples`-sample chunks fingerprinted as md5 over the
    * canonical comma-joined sample string, so the chain stays fully
    * oracle-replayable from synthetic sample formulas; the pair search is
    * the winnowing shape (per-doc distinct fps, `maxFreq` boilerplate
    * cap, one fp-equi self-join, count ≥ `minShared`). Returns
    * (a_id, b_id, n_shared), a_id < b_id. */
  def audioFrameOverlap(samples: DataFrame, frameSamples: Int,
      minShared: Int = 2, maxFreq: Int = 200): DataFrame = {
    require(frameSamples >= 1, s"frameSamples must be >= 1, got $frameSamples")
    Dedup.sharedKeyPairs(
      samples.where(size(col("samples")) >= frameSamples)
        .select(col("doc_id").as("id"), explode(expr(
          s"transform(sequence(0, size(samples) div $frameSamples - 1), " +
            s"i -> md5(concat_ws(',', transform(" +
            s"slice(samples, i * $frameSamples + 1, $frameSamples), " +
            s"x -> cast(x as string)))))")).as("fp"))
        .distinct(),
      maxFreq, minShared)
  }

  /** Per-frame pixel fill for the synthetic video formula: frame `f` of
    * seed `sd` has pixel (x, y) = pure arithmetic of (sd, f, x, y) — the
    * video twin of [[syntheticPngPayloads]]'s still formula, with the
    * frame index mixed into every channel so consecutive frames differ.
    * The `sd div 256` term (per-channel constants) de-aliases seeds that
    * coincide mod 256 — a pure mod-256 formula would give seeds 256 apart
    * IDENTICAL frames, and at corpus scale those phantom twins would blow
    * each fingerprint's frequency past the near-dup cap; with the mixing
    * term, full-frame collisions need seeds equal mod 65536. */
  private def fillVideoFrame(img: java.awt.image.BufferedImage,
      sd: Long, f: Int): Unit = {
    val hi = sd >> 8
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val r = Math.floorMod(sd * 31 + hi * 97 + f * 41 + x * 7 + y * 13, 256L).toInt
        val g = Math.floorMod(sd * 17 + hi * 59 + f * 23 + x * 11 + y * 3, 256L).toInt
        val b = Math.floorMod(sd * 29 + hi * 83 + f * 37 + x * 5 + y * 19, 256L).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
  }

  /** Deterministic multi-frame VIDEO payload synthesis — the moving-picture
    * side of the synthetic codec fixtures: doc `d` becomes a real
    * multi-page TIFF container (the JDK's TIFF plugin ships with the JRE
    * and is the one bundled format whose writer does lossless RGB
    * SEQUENCES — GIF quantizes to a palette) holding `nFrames` frames
    * whose pixels follow [[fillVideoFrame]]'s formula. Lossless container,
    * so a real parser recovers exactly these values — which is what makes
    * [[decodeVideoBatched]] / [[videoFrameFps]] oracle-checkable with no
    * decoder on the oracle side. Writer acquisition is hoisted per
    * partition (the SPI scan cost the image decode path already measured);
    * narrow map, no shuffle. `seedCol` decouples the pixel formula from
    * the row id so a twin can share its original's leading frames under a
    * fresh id — the near-dup fixture shape. */
  def syntheticTiffPayloads(docs: DataFrame, idCol: String,
      nFrames: Int = 4, w: Int = 8, h: Int = 8,
      seedCol: String = ""): DataFrame = {
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    val spark = docs.sparkSession
    import spark.implicits._
    val seed = if (seedCol.isEmpty) col(idCol) else col(seedCol)
    // Balanced like withPayload: per-row multi-frame TIFF encode is CPU.
    Balance(docs.select(col(idCol).cast("long").as("doc_id"),
        seed.cast("long").as("seed")))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("tiff").next()
        it.map { case (d, sd) =>
          val bos = new java.io.ByteArrayOutputStream()
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nFrames) {
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            fillVideoFrame(img, sd, f)
            writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
              null)
            f += 1
          }
          writer.endWriteSequence()
          ios.close()
          (d, bos.toByteArray)
        }
      }
      .toDF("doc_id", "content")
      .withColumn("meta", metaStruct(col("content")))
  }

  /** REAL video-container decode in the batched-codec slot — the
    * multi-frame completion of the modality trio (m10 image, m11 audio):
    * each payload's container directory is walked with the JDK's
    * `javax.imageio` TIFF reader (multi-page via getNumImages/read(i) —
    * the same call shape an MP4 demuxer's frame iterator plugs into),
    * emitting ONE ROW PER DECODED FRAME with (width, height, per-channel
    * pixel sums). Same `mapPartitions` fixed-batch shape, reader
    * acquisition hoisted per partition; the explode happens inside the
    * narrow map, so frame fan-out never shuffles. Undecodable payloads
    * emit a single (-1) sentinel frame row: one poisoned row, never a
    * failed job. */
  def decodeVideoBatched(payloads: DataFrame, batchSize: Int = 64)
      : DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads
      .select(col("doc_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val decoder = new PartitionImageDecoder
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, bytes) =>
            val frames = decoder.decodeFrames(bytes)
            if (frames == null) Iterator.single((id, -1L, -1, -1, 0L, 0L, 0L))
            else frames.iterator.zipWithIndex.map { case (img, f) =>
              var (sr, sg, sb) = (0L, 0L, 0L)
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val rgb = img.getRGB(x, y)
                  sr += (rgb >> 16) & 0xff
                  sg += (rgb >> 8) & 0xff
                  sb += rgb & 0xff
                  x += 1
                }
                y += 1
              }
              (id, f.toLong, img.getWidth, img.getHeight, sr, sg, sb)
            }
          }
        }
      }
      .toDF("doc_id", "frame_idx", "width", "height", "sum_r", "sum_g",
        "sum_b")
  }

  /** REAL video decode emitting per-frame content FINGERPRINTS — the feed
    * for video near-dup: each decoded frame is canonicalized to the
    * comma-joined r,g,b sequence in row-major (y outer, x inner) order and
    * md5'd, so the fingerprint chain is replayable by any engine that
    * knows the pixel values (the m12 audio contract on the visual
    * modality). Undecodable payloads emit no frames: one silent poison,
    * never a failed job. */
  def videoFrameFps(payloads: DataFrame, batchSize: Int = 64): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads
      .select(col("doc_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val decoder = new PartitionImageDecoder
        val md = java.security.MessageDigest.getInstance("MD5")
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, bytes) =>
            val frames = decoder.decodeFrames(bytes)
            if (frames == null) Iterator.empty
            else frames.iterator.zipWithIndex.map { case (img, f) =>
              val sb = new java.lang.StringBuilder(img.getWidth * img.getHeight * 12)
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val rgb = img.getRGB(x, y)
                  if (sb.length > 0) sb.append(',')
                  sb.append((rgb >> 16) & 0xff).append(',')
                    .append((rgb >> 8) & 0xff).append(',')
                    .append(rgb & 0xff)
                  x += 1
                }
                y += 1
              }
              md.reset()
              val dig = md.digest(
                sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              val hex = new java.lang.StringBuilder(32)
              dig.foreach(b => hex.append(f"${b & 0xff}%02x"))
              (id, f.toLong, hex.toString)
            }
          }
        }
      }
      .toDF("doc_id", "frame_idx", "fp")
  }

  /** Video near-dup by shared DECODED-FRAME fingerprints — [[frameOverlap]]
    * with the real container codec in the loop instead of byte slices: two
    * videos are related when ≥ `minShared` of their decoded frames'
    * canonical-pixel fingerprints coincide (re-posted clips, shared
    * intros, partial copies survive container-level byte differences).
    * The pair search is the winnowing shape ([[Dedup.sharedKeyPairs]]:
    * per-doc distinct fps, `maxFreq` boilerplate cap, one fp-equi
    * self-join). Returns (a_id, b_id, n_shared), a_id < b_id. */
  def videoFrameOverlap(frameFps: DataFrame, minShared: Int = 2,
      maxFreq: Int = 200): DataFrame =
    Dedup.sharedKeyPairs(
      frameFps.select(col("doc_id").as("id"), col("fp")).distinct(),
      maxFreq, minShared)

  /** Frame sampling: split the payload into fixed-size "frames" (chunks) and
    * explode one row per frame — the plan shape of video frame-sampling.
    * Chunk fingerprints are real (md5 over the slice). */
  def sampleFrames(payloads: DataFrame, frameBytes: Int): DataFrame =
    payloads
      // Zero-length payloads have no frames. Without the guard,
      // sequence(0, floor(-1/fb)) = sequence(0, -1) steps DOWNWARD and
      // emits phantom [0, -1] indexes slicing to md5("") — and DuckDB's
      // range(0, 0) replay correctly emits nothing, so the engines would
      // disagree on exactly the empty-payload rows.
      .where(length(col("content")) > 0)
      .select(col("doc_id"), col("content"),
        explode(sequence(lit(0),
          floor((length(col("content")) - 1) / frameBytes).cast("int")))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("bigint").as("frame_idx"),
        md5(expr(s"substring(content, frame_idx * $frameBytes + 1, $frameBytes)"))
          .as("frame_fp"))

  /** Payload near-dup by SHARED FRAMES — the video-dedup shape: two
    * payloads are related when ≥ `minShared` of their fixed-size frame
    * fingerprints coincide (re-posted clips, shared intros/outros,
    * partial copies). Frames come from [[sampleFrames]] (md5 per
    * `frameBytes` slice — deterministic, so unlike the perceptual path
    * this is fully oracle-checkable); the pair search is the winnowing
    * shape: per-doc distinct fingerprints, a `maxFreq` boilerplate cap
    * (an intro card shared by a million videos is noise, not a match —
    * and the one skew-quadratic bucket without the cap), one
    * fingerprint-equi self-join, count ≥ `minShared`. Returns
    * (a_id, b_id, n_shared), a_id < b_id. */
  def frameOverlap(payloads: DataFrame, frameBytes: Int,
      minShared: Int = 2, maxFreq: Int = 200): DataFrame =
    Dedup.sharedKeyPairs(
      sampleFrames(payloads, frameBytes)
        .select(col("doc_id").as("id"), col("frame_fp").as("fp")).distinct(),
      maxFreq, minShared)

  /** Payload DEDUP — the linear kept-set composition over either pair
    * primitive ([[frameOverlap]] / [[perceptualNearDups]]): resolve pair
    * edges into connected components and keep one representative (minimum
    * id) per cluster plus every unpaired payload. This, not the raw pair
    * list, is the query shape that survives dup-dense corpora: m6/m7's
    * pair OUTPUT is C(k,2) per k-copy cluster (quadratic — ~16M rows at
    * the 40× probe), while the kept-set is linear in the corpus.
    *
    * Two-level structure, the d15/SemDeDup shape applied to payload bytes:
    *   1. identical-content collapse — payloads with the same
    *      `content_md5` are exact duplicates at ANY similarity setting, so
    *      only one representative per distinct payload enters the pair
    *      search (a dup-dense corpus pairs at its DISTINCT size), and each
    *      copy rejoins its representative's component through one explicit
    *      edge. This is also a SEMANTIC fix, not just a fast path: raw
    *      pair queries count frame/bucket frequency per COPY, so a
    *      payload duplicated beyond `maxFreq` has its own frames capped
    *      away and the copies never pair — collapse counts frequency per
    *      distinct content, and exact copies are always dups.
    *   2. `pairFn` over the representative payloads — near-dup pairs
    *      among distinct contents only.
    * Components resolve via [[Dedup.keepRepresentatives]] (driver
    * union-find under 1M edges, log-round large-star/small-star above).
    * Returns (id, component) — component == id for every kept row. */
  def payloadDedup(payloads: DataFrame)(
      pairFn: DataFrame => DataFrame): DataFrame = {
    val byContent = Dedup.persistSketch(payloads.select(
      col("doc_id"), col("meta.content_md5").as("cfp")))
    val reps = Dedup.persistSketch(byContent.groupBy("cfp")
      .agg(min("doc_id").as("rep_id")))
    // rep_id is the group minimum, so rep < copy holds and the edge list
    // stays in (a_id < b_id) orientation without a sort.
    val copyEdges = byContent.join(reps, "cfp")
      .where(col("doc_id") =!= col("rep_id"))
      .select(col("rep_id").as("a_id"), col("doc_id").as("b_id"))
    val repPayloads = payloads.join(
      reps.select(col("rep_id").as("doc_id")), Seq("doc_id"), "left_semi")
    val pairs = pairFn(repPayloads).select("a_id", "b_id")
    Dedup.keepRepresentatives(payloads, "doc_id",
      copyEdges.unionByName(pairs), "a_id", "b_id")
  }

  /** Perceptual near-dup pairs over binary payloads: a 64-bit byte-block
    * average-hash per payload (one codegen'd kernel projection — the aHash
    * voting step; a true pHash's decode + resize + DCT belongs in the
    * codec slot, stubbed as identity here, and would feed this SAME
    * column), then the 16-bit-chunk pigeonhole Hamming join shared with
    * SimHash text dedup ([[Dedup.hammingPairs]] — recall total only at
    * maxHamming ≤ 3, partial above; the hash-family contract). Returns
    * (a_id, b_id, hamming), a_id < b_id. Scale shape: signature computes
    * inside the scan stage; the only shuffle is the chunk-bucket join. */
  def perceptualNearDups(payloads: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content", maxHamming: Int = 6): DataFrame =
    Dedup.hammingPairs(payloads.select(col(idCol).as("id"),
      graft.functions.GraftFunctions.byteBlockHash(col(contentCol))
        .as("sim")), maxHamming)
}
