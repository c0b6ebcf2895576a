package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus batch decode / feature-extract / frame-sample
  * stages. The Spark-side machinery — schema, partition-preserving
  * mapPartitions batches, deterministic outputs — is real and tested; the
  * actual media codecs are STUBBED behind [[Decoders]] with deterministic
  * fakes (this container ships no image/audio libraries; a production build
  * plugs javax.imageio / ffmpeg bindings into the same seam).
  */
object Multimodal {

  /** Typed record: payload + metadata, the schema a 100 TB media lake would
    * carry (payload often a pointer/range into object storage instead — the
    * operator chain is identical).
    */
  case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      n_bytes: Long,
      fingerprint: String)

  case class DecodedFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      fingerprint: String,
      width: Int,
      height: Int,
      n_frames: Int,
      mean_luma: Double)

  /** Wrap any (id, text) table as a media table: payload = utf8 bytes of the
    * text (deterministic stand-in for real media bytes), metadata derived
    * with codegen'd expressions.
    */
  def packPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      // coalesce: a NULL text row must become an EMPTY payload, not a NULL
      // one — downstream decodeFeatures encodes n_bytes as a non-nullable
      // Long, and a NULL payload would kill the whole stage with
      // "Null value appeared in non-nullable field" (round-13 fix)
      coalesce(col(textCol), lit("")).cast("binary").as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("fingerprint", md5(col("payload")))

  /** Decoder seam. Each decoder consumes raw payload bytes and emits
    * features. The implementations below are DETERMINISTIC FAKES standing in
    * for real codecs (marked // STUB) so the distributed plumbing is fully
    * exercisable; swap the bodies for javax.imageio / javacv / ffmpeg calls
    * in production — the operator, schema and partitioning are unchanged.
    */
  object Decoders {
    // STUB: real impl = ImageIO.read(new ByteArrayInputStream(payload))
    def imageDims(payload: Array[Byte]): (Int, Int) = {
      val h = payload.foldLeft(17L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
      (64 + (h % 448).toInt, 64 + ((h / 448) % 448).toInt)
    }
    // STUB: real impl = sample PCM frames / decode spectrogram
    def meanLuma(payload: Array[Byte]): Double =
      if (payload.isEmpty) 0.0
      else payload.map(b => (b & 0xff).toDouble).sum / payload.length / 255.0
    // STUB: real impl = container demux; here: fixed-size synthetic frames
    def frameCount(payload: Array[Byte], frameBytes: Int = 64): Int =
      math.max(1, payload.length / frameBytes)
  }

  /** Batch decode via mapPartitions: one decoder instance per partition (the
    * real-codec pattern — decoder init is expensive), rows processed in
    * partition-sized batches, no shuffle introduced.
    */
  def decodeFeatures(media: DataFrame): Dataset[DecodedFeatures] = {
    import media.sparkSession.implicits._
    // the pack-stage metadata (fingerprint included) is CARRIED THROUGH the
    // decode pass — consumers that want payload metadata + decoded features
    // together get them from one mapPartitions, not a self-join re-running
    // packPayload on both sides (that join doubled q_multimodal_meta's cost)
    media.select("media_id", "kind", "payload", "n_bytes", "fingerprint")
      .as[(Long, String, Array[Byte], Long, String)]
      .mapPartitions { rows =>
        // per-partition decoder init would go here (STUB: none needed)
        rows.map { case (id, kind, payload, nBytes, fp) =>
          val (w, h) = Decoders.imageDims(payload)
          DecodedFeatures(
            media_id = id, kind = kind, n_bytes = nBytes, fingerprint = fp,
            width = w, height = h,
            n_frames = if (kind == "video") Decoders.frameCount(payload) else 1,
            mean_luma = Decoders.meanLuma(payload))
        }
      }
  }

  /** Resize planning over decoded dimensions: aspect-preserving fit to a
    * `maxEdge` bounding box with INTEGER arithmetic (w*maxEdge div
    * max(w,h)), already-fitting media pass through unchanged. The pixel
    * resample itself is the codec's job behind the same batch seam as
    * [[decodeFeatures]] (STUB here); the dimension plan is what the
    * distributed pipeline schedules and stores.
    */
  def resizePlan(decoded: DataFrame, maxEdge: Int = 256): DataFrame = {
    require(maxEdge >= 1, s"resizePlan: maxEdge must be >= 1, got $maxEdge")
    val longest = greatest(col("width"), col("height"))
    decoded.select(
      col("media_id"), col("kind"), col("width"), col("height"),
      // clamp to >= 1: extreme aspect ratios (1 x 600 into a 256 box) must
      // not plan a 0-pixel edge
      greatest(lit(1), when(longest <= maxEdge, col("width"))
        .otherwise((col("width") * maxEdge) / longest).cast("int")).as("out_w"),
      greatest(lit(1), when(longest <= maxEdge, col("height"))
        .otherwise((col("height") * maxEdge) / longest).cast("int")).as("out_h"))
  }

  /** Frame sampling for video payloads: every `stride`-th fixed-size frame,
    * as (media_id, frame_idx, frame_bytes) — pure expressions (slice over a
    * byte array), partition-preserving, no decode required for the slicing.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    // frameBytes 0 would divide by zero into a NULL sequence bound (silent
    // empty output); stride 0 would pmod-by-zero every frame row
    require(frameBytes >= 1 && stride >= 1,
      s"sampleFrames: frameBytes/stride must be >= 1, got $frameBytes/$stride")
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0),
          greatest((octet_length(col("payload")) / frameBytes).cast("int") - 1, lit(0))))
          .as("frame_idx"))
      .filter(pmod(col("frame_idx"), lit(stride)) === 0)
      .select(col("media_id"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)).as("frame"))
  }
}
