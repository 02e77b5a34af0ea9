package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.{graft => bridge}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, decoded / feature-extracted /
  * frame-sampled by per-partition batch functions.
  *
  * No reference counterpart; extended scope per the pipeline charter.
  *
  * The Spark-side plumbing here — binary schema, typed `Dataset`
  * encoders, `mapPartitions` batch shape, frame explosion — is real and
  * tested. Two decoders share it:
  *  - [[ImageCodec]] / [[extractImageFeatures]]: REAL image decode via
  *    javax.imageio (pure JRE — PNG/JPEG/BMP/GIF), returning true pixel
  *    dimensions; undecodable payloads are kept and flagged (-1, -1).
  *  - [[StubCodec]] / [[extractFeatures]]: deterministic pseudo-features
  *    from the payload bytes, used by the oracle-hashed queries (their
  *    payloads are text bytes, and DuckDB can recompute the stub).
  * Audio/video would follow the same split; those codecs are not in this
  * environment, so only the frame-window sampler covers them.
  *
  * Scale posture:
  *  - payloads stay in executors end-to-end (no driver collect);
  *  - `mapPartitions` amortizes decoder init (a real codec context is
  *    expensive to open) across the whole partition — the same reason
  *    Python pipelines use `mapInPandas` batches;
  *  - feature extraction is a map-only projection; frame sampling is a
  *    flatMap whose output is bounded by `maxFrames`, so one oversized
  *    video cannot blow up a task;
  *  - at 100 TB the binary column dominates I/O: keep it in its own
  *    parquet column (columnar pruning skips it when queries touch only
  *    metadata) and size `spark.sql.files.maxPartitionBytes` to the
  *    payload, not the row count.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features (stub-decoded). */
  final case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
      byte_sum: Long, width: Int, height: Int)

  /** One sampled frame of a payload. */
  final case class MediaFrame(doc_id: Long, frame_idx: Int,
      frame_len: Int, frame: Array[Byte])

  implicit val mediaRowEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
  implicit val frameEnc: Encoder[MediaFrame] = Encoders.product[MediaFrame]

  /** ====== STUB decoder ====================================================
    * Deterministic fake standing in for a real image/audio decoder (the
    * decode libraries are not available in this environment). A real
    * implementation would replace `decode` with e.g.
    * `ImageIO.read(new ByteArrayInputStream(payload))` and return true
    * (width, height); everything downstream is agnostic to the change.
    */
  object StubCodec {
    /** "Decode" a payload: byte sum plus pseudo-dimensions derived from
      * it. Deterministic, so the DuckDB oracle can recompute it from the
      * source text.
      */
    def decode(payload: Array[Byte]): (Long, Int, Int) = {
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
      val width = 16 + (sum % 64).toInt
      val height = 16 + ((sum / 64) % 64).toInt
      (sum, width, height)
    }
  }

  /** ====== Real image decoder =============================================
    * javax.imageio is pure-JRE (no native libs), so actual PNG/JPEG/BMP/GIF
    * bytes CAN be decoded in this sandbox. Used by
    * [[extractImageFeatures]]; the oracle-hashed queries stay on
    * [[StubCodec]] because their payloads are text bytes, not images.
    */
  object ImageCodec {
    /** Decode real image bytes to (width, height); None when the payload
      * is not a decodable image (wrong magic, truncated, unsupported).
      *
      * A memory-backed ImageInputStream is constructed per decode instead
      * of flipping `ImageIO.setUseCache(false)`: the flag is JVM-global
      * (it would silently change behavior for every other ImageIO user in
      * the executor process), while the explicit stream gets the same
      * no-temp-file decode path with zero shared state.
      *
      * NonFatal (not just IOException): plugin readers throw
      * RuntimeExceptions on malformed payloads (IllegalArgumentException,
      * CMMException, ArrayIndexOutOfBounds in the JPEG reader); a corrupt
      * payload must flag (-1,-1), never kill the task.
      */
    def decode(payload: Array[Byte]): Option[(Int, Int)] = {
      val stream = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try Option(javax.imageio.ImageIO.read(stream))
        .map(img => (img.getWidth, img.getHeight))
      catch { case scala.util.control.NonFatal(_) => None }
      // ImageIO.read(ImageInputStream) closes the stream on success; the
      // explicit close covers the failure paths (second close throws
      // IOException("closed") — swallow it).
      finally {
        try stream.close()
        catch { case _: java.io.IOException => () }
      }
    }
  }

  /** ====== Real audio decoder =============================================
    * javax.sound.sampled is pure-JRE for WAV/AIFF/AU containers: the
    * header parse needs no native codec, so real audio metadata (sample
    * rate, channels, frame count → duration) decodes in this sandbox the
    * same way [[ImageCodec]] handles PNG/JPEG. Compressed formats
    * (mp3/ogg) have no JRE service provider and correctly return None —
    * flagged rows, not failures.
    */
  object AudioCodec {
    final case class AudioMeta(sampleRate: Int, channels: Int,
        frames: Long, durationMs: Long)

    def decode(payload: Array[Byte]): Option[AudioMeta] = {
      val in = new java.io.ByteArrayInputStream(payload)
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(in)
        val fmt = aff.getFormat
        val frames = aff.getFrameLength.toLong
        val durMs = if (fmt.getFrameRate > 0 && frames >= 0)
          (frames * 1000.0 / fmt.getFrameRate).toLong else -1L
        Some(AudioMeta(fmt.getSampleRate.toInt, fmt.getChannels, frames, durMs))
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  final case class AudioFeatures(doc_id: Long, n_bytes: Long,
      sample_rate: Int, channels: Int, n_frames: Long, duration_ms: Long)
  implicit val audioEnc: Encoder[AudioFeatures] = Encoders.product[AudioFeatures]

  /** [[extractFeatures]] with the real [[AudioCodec]]: true header
    * metadata for decodable payloads, all-(-1) for undecodable ones
    * (kept and flagged, same contract as [[extractImageFeatures]]).
    */
  def extractAudioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] =
    media.mapPartitions { rows =>
      rows.map { r =>
        val m = AudioCodec.decode(r.payload)
        AudioFeatures(r.doc_id, r.payload.length.toLong,
          m.map(_.sampleRate).getOrElse(-1),
          m.map(_.channels).getOrElse(-1),
          m.map(_.frames).getOrElse(-1L),
          m.map(_.durationMs).getOrElse(-1L))
      }
    }

  /** [[extractFeatures]] with the real [[ImageCodec]]: true pixel
    * dimensions for decodable payloads, (-1, -1) for undecodable ones
    * (kept, not dropped — a corrupt-payload audit needs the row). Same
    * mapPartitions batch shape; `byte_sum` stays as a cheap payload
    * checksum.
    */
  def extractImageFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] =
    media.mapPartitions { rows =>
      rows.map { r =>
        var sum = 0L
        var i = 0
        while (i < r.payload.length) { sum += r.payload(i) & 0xff; i += 1 }
        val (w, h) = ImageCodec.decode(r.payload).getOrElse((-1, -1))
        MediaFeatures(r.doc_id, r.kind, r.payload.length.toLong, sum, w, h)
      }
    }

  /** Build a media table from the documents corpus: the UTF-8 text bytes
    * stand in for an encoded media payload (same plumbing, fake content).
    */
  def mediaTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), lit("image").as("kind"),
      encode(col("text"), "UTF-8").as("payload")).as[MediaRow]
  }

  /** Per-partition batch feature extraction. `mapPartitions` (not `map`)
    * so a real codec's context/native buffers are initialized once per
    * partition, mirroring the batched shape of an Arrow/Pandas UDF.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] =
    media.mapPartitions { rows =>
      // real impl: open codec context here, close via iterator completion
      rows.map { r =>
        val (sum, w, h) = StubCodec.decode(r.payload)
        MediaFeatures(r.doc_id, r.kind, r.payload.length.toLong, sum, w, h)
      }
    }

  /** Frame sampling: split the payload into fixed `frameBytes` windows and
    * keep every `stride`-th one, up to `maxFrames` (bounds worst-case
    * output for a huge payload). flatMap = one task-local loop, no
    * shuffle; output rows carry the frame bytes for downstream decode.
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 256,
      stride: Int = 2, maxFrames: Int = 16): Dataset[MediaFrame] =
    media.flatMap { r =>
      val nFrames = (r.payload.length + frameBytes - 1) / frameBytes
      Iterator.range(0, nFrames, stride).take(maxFrames).map { f =>
        val from = f * frameBytes
        val until = math.min(from + frameBytes, r.payload.length)
        MediaFrame(r.doc_id, f, until - from,
          java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }

  // ====== Perceptual-hash image dedup (LAION-style) =====================

  /** 64-bit dHash of an opaque payload via the deterministic stub
    * decode (byte-stream box filter into the 8×9 grid) — the
    * oracle-gated spelling; see [[graft.functions.DHash64]]. Pure
    * projection (map-side at any scale); near-dup pairs downstream via
    * [[Dedup.hamming64Pairs]] — band buckets, never all-pairs.
    */
  def dhash64(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    bridge.column(graft.functions.DHash64(bridge.expression(payload)))

  /** 64-bit dHash of a REAL image payload (javax.imageio decode, 8×9
    * grayscale box-downsample, same bit rule); null for payloads that
    * don't decode — flagged rows, never task failures. Spec-pinned on
    * synthesized PNGs (DuckDB can't decode images, so no SQL oracle).
    */
  def dhashImage64(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    bridge.column(graft.functions.DHashImage64(bridge.expression(payload)))
}
