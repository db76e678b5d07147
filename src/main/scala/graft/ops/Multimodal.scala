package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * batched decode/feature-extraction over `mapPartitions`.
  *
  * The IMAGE decode path is real: `javax.imageio` (pure JVM, zero extra
  * deps) parses PNG/BMP/GIF/JPEG payloads into true width/height
  * (MultimodalSpec decodes generated PNG/BMP fixtures); the AUDIO path
  * decodes PCM WAV/AIFF via `javax.sound.sampled`; the VIDEO path parses
  * MP4/MOV container metadata (duration/resolution/sample count) via the
  * pure-JVM `Mp4Meta` box walker. Bytes that no parser recognizes — and
  * compressed pixel/sample decode, whose codecs don't ship in a JVM —
  * fall back to a clearly-marked deterministic stub,
  * so the pipeline shape is exercised end-to-end on any payload. Everything
  * Spark-side is real and tested: the schema (binary payload + struct
  * metadata), the partitioning (payload-bearing rows repartition by id so
  * decode parallelizes), the batch shape (one decoder instance per
  * partition, amortized over its rows, the same lifecycle a JNI/codec
  * handle needs), and the typed Dataset boundary.
  *
  * At 100 TB: payloads live in the table as binary columns (or pointers to
  * object storage); decode is a narrow map stage with no shuffle, so it
  * scales with input splits. Feature outputs are small typed columns that
  * downstream relational ops consume normally.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(
      doc_id: Long,
      kind: String,
      n_bytes: Int,
      checksum: Long,
      width: Int,     // real for ImageIO-decodable images; stub otherwise
      height: Int,    // real for ImageIO-decodable images; stub otherwise
      n_frames: Int)  // real audio frames for PCM WAV/AIFF and real sample
                      // counts for MP4/MOV containers; STUB for payloads no
                      // parser recognizes (no compressed codecs in a bare JVM)

  /** Attach a binary payload column (here: utf8 bytes of `text` stand in for
    * real media bytes) plus a kind tag derived from the source column. */
  def attachPayload(documents: DataFrame): Dataset[MediaRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, lit("image"))
          .when(col("doc_id") % 3 === 1, lit("audio"))
          .otherwise(lit("video")).as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** Batched decode: one stub decoder per partition, reused across rows —
    * the shape a real codec handle (JNI, ffmpeg, turbojpeg) requires. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val decoder = new StubDecoder // per-partition init, amortized
      rows.map { r =>
        val d = decoder.decode(r.kind, r.payload)
        MediaFeatures(r.doc_id, r.kind, r.payload.length, d.checksum, d.width, d.height, d.nFrames)
      }
    }
  }

  case class ResizedRow(doc_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int)

  /** Resize: payload→payload transform at a target resolution. REAL for
    * ImageIO-decodable images (BufferedImage + bilinear Graphics2D scale,
    * re-encoded as PNG — pure JVM, headless-safe); payloads no reader
    * recognizes fall back to the deterministic byte-reshaping stub. Narrow
    * map stage — no shuffle, scales with splits. */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[ResizedRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val decoder = new StubDecoder
      rows.map { r =>
        val resized = decoder.resizeImage(r.payload, targetW, targetH)
          .getOrElse(decoder.resizeBytes(r.payload, targetW * targetH / 256 + 1))
        ResizedRow(r.doc_id, r.kind, resized, targetW, targetH)
      }
    }
  }

  case class ImageStats(doc_id: Long, width: Int, height: Int, mean_luma: Double)

  /** REAL image feature extraction: decode, then mean ITU-R 601 luminance
    * over all pixels — the kind of cheap scalar feature (brightness /
    * blur / aspect filters) a multimodal training pipeline computes before
    * shipping pixels to a GPU stage. Rows whose payloads don't decode are
    * dropped (None → flatMap), so downstream sees only true image stats. */
  def imageStats(media: Dataset[MediaRow]): Dataset[ImageStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val decoder = new StubDecoder
      rows.flatMap { r =>
        decoder.decodeImage(r.payload).map { img =>
          var sum = 0.0
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
                0.114 * (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          ImageStats(r.doc_id, img.getWidth, img.getHeight,
            sum / (img.getWidth.toLong * img.getHeight))
        }
      }
    }
  }

  case class ImageHash(doc_id: Long, dhash: Long)

  /** REAL perceptual image fingerprint — the 64-bit difference hash
    * ("dHash": Krawetz's gradient variant of the average hash family):
    * decode, bilinear-downscale to 9×8 grayscale, emit one bit per adjacent
    * horizontal luma comparison. Near-identical images (re-encode, mild
    * noise, small crops/rescale) land within a few bits, unrelated images
    * ~32 bits apart — the standard cheap near-dup signal a vision-data
    * pipeline computes per image before any embedding model runs. Rows
    * whose payloads don't decode are dropped (None → flatMap). Pure
    * per-row map stage: no shuffle, scales with splits. */
  def imageDHash(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val decoder = new StubDecoder
      rows.flatMap { r =>
        decoder.decodeImage(r.payload).map { img =>
          val small = new java.awt.image.BufferedImage(9, 8,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = small.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, 9, 8, null)
          g.dispose()
          def luma(px: Int): Double =
            0.299 * ((px >> 16) & 0xff) + 0.587 * ((px >> 8) & 0xff) + 0.114 * (px & 0xff)
          var bits = 0L
          var i = 0
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              if (luma(small.getRGB(x, y)) < luma(small.getRGB(x + 1, y)))
                bits |= (1L << i)
              i += 1
              x += 1
            }
            y += 1
          }
          ImageHash(r.doc_id, bits)
        }
      }
    }
  }

  /** Perceptual image near-dup: (id1, id2) pairs whose dHashes differ in at
    * most `maxDist` of 64 bits — [[imageDHash]] composed with the exact
    * pigeonhole band join ([[Hamming.nearDupPairs]]), i.e. the image twin
    * of the dedup_simhash_hamming text entry at the 64-bit production
    * geometry. maxDist 10 is the community-standard dHash near-dup cut;
    * recall over that cut is 1.0 by the pigeonhole guarantee, so results
    * depend only on the fingerprints. One map pass + one banded equi join:
    * no pixel bytes ever shuffle. */
  def imageNearDup(media: Dataset[MediaRow], maxDist: Int = 10): DataFrame =
    Hamming.nearDupPairs(imageDHash(media).toDF(), "doc_id", "dhash",
      bits = 64, maxDist = maxDist)

  case class AudioStats(doc_id: Long, sample_rate: Double, channels: Int,
      n_frames: Long, duration_sec: Double, mean_amplitude: Double)

  /** REAL audio feature extraction for WAV/AIFF via `javax.sound.sampled`
    * (pure JVM, zero extra deps — the audio twin of the imageStats upgrade):
    * sample rate, channel count, frame count, duration, and mean absolute
    * amplitude normalized to [0, 1] over all channel samples — the cheap
    * scalar features (silence / clipping / loudness filters) an audio
    * training pipeline computes before shipping samples to a codec stage.
    * Rows whose payloads aren't a decodable PCM WAV/AIFF are dropped
    * (None → flatMap); compressed codecs (mp3/ogg/aac) don't ship in a bare
    * JVM and remain out of scope, as the class doc states. */
  def audioStats(media: Dataset[MediaRow]): Dataset[AudioStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val decoder = new StubDecoder
      rows.flatMap { r =>
        decoder.decodeAudio(r.payload).map { a =>
          AudioStats(r.doc_id, a.sampleRate, a.channels, a.frames,
            a.durationSec, a.meanAmplitude)
        }
      }
    }
  }

  case class VideoStats(doc_id: Long, brand: String, duration_sec: Double,
      width: Int, height: Int, n_samples: Long)

  /** REAL video container metadata for MP4/MOV via the pure-JVM ISO-BMFF
    * box parser (`Mp4Meta`): brand, movie duration, video-track resolution
    * and sample (frame) count — the filters (too-short / too-low-res /
    * wrong-container) a video training pipeline applies before paying for
    * a codec stage. Rows whose payloads aren't a parseable container are
    * dropped (None → flatMap); pixel decode remains out of scope in a bare
    * JVM, as the class doc states. */
  def videoStats(media: Dataset[MediaRow]): Dataset[VideoStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val decoder = new StubDecoder
      rows.flatMap { r =>
        decoder.decodeVideoMeta(r.payload).map { m =>
          VideoStats(r.doc_id, m.brand, m.durationSec, m.width, m.height,
            m.videoSamples)
        }
      }
    }
  }

  case class FrameRangeRow(doc_id: Long, sample_no: Long, byte_offset: Long,
      byte_size: Long, sync: Boolean)

  /** REAL frame addressing for MP4/MOV: the first `k` video samples'
    * absolute byte ranges (keyframes only with `syncOnly`), resolved from
    * the container's own sample tables (`Mp4Meta.sampleRanges`:
    * stsz × stsc × stco/co64 × stss). This is the half of frame sampling
    * that doesn't need a codec — and the half that matters at 100 TB: a
    * downstream decode stage issues k ranged reads per object instead of
    * streaming `mdat`. Unparseable containers yield no rows. */
  def videoFrameIndex(media: Dataset[MediaRow], k: Int,
      syncOnly: Boolean = false): Dataset[FrameRangeRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").mapPartitions { rows =>
      rows.flatMap { r =>
        Mp4Meta.sampleRanges(r.payload, k, syncOnly).map(s =>
          FrameRangeRow(r.doc_id, s.sampleNo, s.offset, s.size, s.sync))
      }
    }
  }

  case class FrameRow(doc_id: Long, frame_idx: Int, frame_checksum: Long)

  /** Frame sampling: one video row fans out to every `stride`-th frame —
    * a generator (1→N) stage. Frame extraction is stubbed (checksum over a
    * byte slice); the fan-out, typed schema and downstream-relational shape
    * are real. At 100 TB the explosion happens AFTER split-local decode, so
    * no payload bytes ever shuffle. */
  def frameSample(media: Dataset[MediaRow], stride: Int): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").mapPartitions { rows =>
      val decoder = new StubDecoder
      rows.flatMap { r =>
        val d = decoder.decode(r.kind, r.payload)
        (0 until d.nFrames by stride).map { i =>
          FrameRow(r.doc_id, i, decoder.frameChecksum(r.payload, i))
        }
      }
    }
  }

  case class Decoded(checksum: Long, width: Int, height: Int, nFrames: Int)
  case class AudioDecoded(sampleRate: Double, channels: Int, frames: Long,
      durationSec: Double, meanAmplitude: Double)

  /** Per-partition media decoder. Images decode for real through
    * `javax.imageio` (PNG/BMP/GIF/JPEG — whatever readers the JVM
    * registers); payloads no reader recognizes, and the audio/video kinds,
    * fall back to a deterministic STUB so every row still yields features.
    * The call signature and per-partition lifecycle (one instance amortized
    * over a partition's rows) are the contract a real JNI/ffmpeg handle
    * plugs into. */
  final class StubDecoder {
    def decode(kind: String, payload: Array[Byte]): Decoded = {
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum = sum * 31 + (payload(i) & 0xff); i += 1 }
      val w = 64 + (math.abs(sum) % 1856).toInt
      kind match {
        case "image" =>
          decodeImage(payload) match {
            case Some(img) => Decoded(sum, img.getWidth, img.getHeight, 1) // real decode
            case None => Decoded(sum, w, 64 + (math.abs(sum / 7) % 1016).toInt, 1) // STUB fallback
          }
        case "audio" =>
          decodeAudio(payload) match {
            case Some(a) => // real WAV/AIFF decode: frames are audio frames
              Decoded(sum, 0, 0, math.min(a.frames, Int.MaxValue.toLong).toInt)
            case None => Decoded(sum, 0, 0, payload.length / 128 + 1) // STUB fallback
          }
        case _ =>
          decodeVideoMeta(payload) match {
            case Some(m) => // real container parse: true resolution + sample count
              Decoded(sum, m.width, m.height,
                math.min(m.videoSamples, Int.MaxValue.toLong).toInt)
            case None => Decoded(sum, w, w / 2, payload.length / 64 + 1) // STUB fallback
          }
      }
    }

    /** REAL image decode to pixels (None when no registered reader
      * recognizes the bytes). */
    def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case _: java.io.IOException => None }

    /** REAL image resize: bilinear Graphics2D scale to (w, h), re-encoded
      * as PNG. None when the payload isn't a decodable image. */
    def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      decodeImage(payload).map { img =>
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }

    /** REAL audio decode for PCM WAV/AIFF via `javax.sound.sampled`:
      * format metadata plus mean |sample| normalized to [0, 1] across all
      * channel samples. None when no registered reader recognizes the bytes
      * or the encoding isn't 8/16-bit PCM (a bare JVM has no compressed-
      * codec readers anyway). */
    def decodeAudio(payload: Array[Byte]): Option[AudioDecoded] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          val enc = fmt.getEncoding
          val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          val bits = fmt.getSampleSizeInBits
          if (!(signed || unsigned) || (bits != 8 && bits != 16)) None
          else {
            val bytes = in.readAllBytes()
            var sum = 0.0
            var n = 0L
            if (bits == 8) {
              var i = 0
              while (i < bytes.length) {
                val v = if (signed) bytes(i).toInt else (bytes(i) & 0xff) - 128
                sum += math.abs(v) / 128.0
                n += 1; i += 1
              }
            } else {
              val big = fmt.isBigEndian // WAV is little-endian, AIFF big
              var i = 0
              while (i + 1 < bytes.length) {
                val raw =
                  if (big) (bytes(i) << 8) | (bytes(i + 1) & 0xff)
                  else (bytes(i + 1) << 8) | (bytes(i) & 0xff)
                val v = if (signed) raw else (raw & 0xffff) - 32768
                sum += math.abs(v) / 32768.0
                n += 2; i += 2
              }
              n = n / 2
            }
            val frames =
              if (in.getFrameLength >= 0) in.getFrameLength
              else n / math.max(fmt.getChannels, 1)
            Some(AudioDecoded(
              sampleRate = fmt.getSampleRate.toDouble,
              channels = fmt.getChannels,
              frames = frames,
              durationSec = frames / fmt.getFrameRate.toDouble,
              meanAmplitude = if (n == 0) 0.0 else sum / n))
          }
        } finally in.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }

    /** REAL video container metadata for MP4/MOV (ISO-BMFF) via
      * `graft.ops.Mp4Meta` — duration, resolution, sample count, brand
      * from the structure boxes; None when the bytes aren't a parseable
      * container. Pixel/frame DECODE stays out of scope (no H.264/VP9/AV1
      * codecs in a bare JVM), as the class doc states. */
    def decodeVideoMeta(payload: Array[Byte]): Option[Mp4Meta.Meta] =
      Mp4Meta.parse(payload)

    /** STUB resize: deterministic byte reshaping to the target size.
      * Empty payloads resize to all-zero bytes. */
    def resizeBytes(payload: Array[Byte], targetLen: Int): Array[Byte] = {
      val out = new Array[Byte](targetLen)
      if (payload.isEmpty) return out
      var i = 0
      while (i < targetLen) { out(i) = payload(i % payload.length); i += 1 }
      out
    }

    /** STUB frame extraction: checksum over the frame's byte slice. */
    def frameChecksum(payload: Array[Byte], frameIdx: Int): Long = {
      var sum = frameIdx.toLong
      var i = frameIdx * 64 % math.max(payload.length, 1)
      val end = math.min(i + 64, payload.length)
      while (i < end) { sum = sum * 31 + (payload(i) & 0xff); i += 1 }
      sum
    }
  }
}
