package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column operators m01–m02: image/audio/video payloads as
  * opaque `binary` columns with typed metadata and feature extraction
  * via per-partition batch processing (`mapPartitions`) — the shape a
  * real decoder (PIL/ffmpeg/torchvision) plugs into. The decode step
  * itself is a DETERMINISTIC STUB (this container ships no media
  * libraries): it derives width/height/frames/features from the
  * payload bytes, so the Spark-side plumbing — binary schema, batch
  * iterator, typed output encoder, no driver collect — is fully real
  * and oracle-checkable while the codec is fake.
  *
  * The test corpus has no binary table, so the payload is
  * materialized from `documents.text` (`cast to binary` = UTF-8
  * bytes), standing in for an image/audio blob column.
  */
object Multimodal {

  /** Typed metadata record a real container probe would return. */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, magic: String,
      width: Long, height: Long, n_frames: Long)

  /** Fixed-width feature record (16-bin nibble histogram stub). */
  final case class MediaFeatures(doc_id: Long, features: Seq[Double])

  private def payloads(documents: DataFrame) =
    documents
      .filter(col("text").isNotNull) // a null blob has no bytes to probe
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** m01_multimodal_meta — per-payload typed metadata: byte size,
    * 4-byte magic (hex), and stub-decoded dimensions. Runs as a
    * partition-batch pass over the binary column: each executor core
    * receives an iterator of payloads and maps them through the
    * (stubbed) probe — exactly where a batched decoder goes. Pure
    * map-side, no shuffle.
    */
  def multimodalMeta(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    payloads(documents).as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val n = bytes.length.toLong
          // STUB decode: a real probe parses the container header here.
          val magic = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
          MediaMeta(id, n, magic,
            width = 16L + n % 624L,
            height = 16L + (n * 7L) % 464L,
            n_frames = 1L + n % 9L)
        }
      }
      .toDF()
  }

  /** m02_image_features — payload → fixed-width feature vector (16
    * doubles). Stub featurizer: normalized high-nibble histogram of
    * the payload bytes — deterministic, byte-shape-sensitive, and the
    * same batch-iterator signature a real embedding model (batched
    * tensor in, vector out) requires. Map-side only.
    *
    * Bins round HALF_UP in decimal (not `math.rint`'s half-even) so
    * the values are reproducible by any engine's `round(x, 6)`.
    */
  def imageFeatures(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    payloads(documents).as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val hist = new Array[Double](16)
          bytes.foreach(b => hist((b >> 4) & 0xf) += 1d)
          val n = math.max(bytes.length, 1).toDouble
          MediaFeatures(id, hist.toIndexedSeq.map(c =>
            BigDecimal(c / n)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        }
      }
      .toDF()
  }

  /** m02's oracle projection: the feature vector exploded to one
    * (doc_id, pos, feature) row per bin — scalar columns the driver's
    * hash compare can check exactly (array columns can't be
    * row-sorted by the comparator).
    */
  def imageFeatureRows(documents: DataFrame): DataFrame =
    imageFeatures(documents).select(
      col("doc_id"),
      posexplode(col("features")).as(Seq("pos", "feature")))
      .withColumn("pos", col("pos").cast("long"))

  /** Resized-payload record: original size, thumbnail size, and a
    * position-weighted checksum of the thumbnail bytes (verifies the
    * actual resampled CONTENT, not just its length).
    */
  final case class ResizedMedia(doc_id: Long, n_bytes: Long,
      stride: Long, n_resized: Long, checksum: Long)

  /** m03_resize — payload → fixed-max-width thumbnail. Stub resampler:
    * nearest-neighbor downsample to ≤ `target` bytes by taking every
    * stride-th byte (stride = ceil(n/target)) — the 1-D analog of
    * image nearest-neighbor resize, which is exactly the memory-shape
    * problem at scale: the operator must bound the per-row output
    * size before a 100 TB corpus of arbitrarily large blobs flows
    * into downstream stages. Same partition-batch iterator a real
    * resize kernel (libvips/PIL) plugs into; map-side only.
    *
    * checksum = Σ (i+1)·byte(i·stride) mod 1e9+7 over thumbnail
    * positions i — position-weighted so byte order matters.
    */
  def resize(documents: DataFrame, target: Int = 64): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    payloads(documents).as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val n = bytes.length
          val stride = math.max(1L, (n + target - 1L) / target)
          var i = 0L
          var t = 0L
          var sum = 0L
          while (t < n) {
            sum = (sum + (i + 1L) * (bytes(t.toInt) & 0xff)) % 1000000007L
            i += 1L
            t += stride
          }
          ResizedMedia(id, n.toLong, stride, i, sum)
        }
      }
      .toDF()
  }

  /** Sampled-frame record: one row per kept frame. */
  final case class SampledFrame(doc_id: Long, frame_id: Long,
      n_frame_bytes: Long, frame_checksum: Long)

  /** m04_frame_sample — treat the payload as a sequence of
    * `frameBytes`-wide frames (a stub video container) and keep every
    * `every`-th frame — the canonical video→training-data reduction
    * (uniform temporal subsampling). One output ROW per kept frame:
    * the batch iterator flat-maps, so a single huge payload fans out
    * to many bounded rows instead of one unbounded one — the shape
    * that keeps downstream shuffles partition-sized at 100 TB.
    *
    * frame_checksum = Σ (j+1)·byte(j) mod 1e9+7 within the frame.
    */
  def frameSample(documents: DataFrame, frameBytes: Int = 32,
      every: Int = 4): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    payloads(documents).as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, bytes) =>
          val n = bytes.length
          val nFrames = (n + frameBytes - 1) / frameBytes
          (0 until nFrames by every).iterator.map { f =>
            val lo = f * frameBytes
            val hi = math.min(lo + frameBytes, n)
            var sum = 0L
            var j = lo
            while (j < hi) {
              sum = (sum + (j - lo + 1L) * (bytes(j) & 0xff)) % 1000000007L
              j += 1
            }
            SampledFrame(id, f.toLong, (hi - lo).toLong, sum)
          }
        }
      }
      .toDF()
  }

  /** m05_media_dedup — exact content dedup over the BINARY payload
    * column: the image/audio analog of d01 (a crawl's media set is
    * full of byte-identical copies under different ids/URLs). Groups
    * by md5 of the payload — a REAL cryptographic digest both
    * engines implement bit-identically, so unlike the xxhash64
    * dedup family this oracle has no engine-vs-oracle hash gap —
    * keeping the min-id representative and the copy count. At scale
    * the shuffle carries (16-byte digest, id, length) per payload,
    * never the blob; the digest itself is computed map-side in one
    * pass over the bytes.
    */
  def mediaDedup(documents: DataFrame): DataFrame =
    payloads(documents)
      .select(col("doc_id"), md5(col("payload")).as("content_md5"),
        length(col("payload")).cast("long").as("n_bytes"))
      .groupBy(col("content_md5"))
      .agg(min(col("doc_id")).as("rep_id"),
        count(lit(1)).as("n_copies"),
        min(col("n_bytes")).as("n_bytes"))
}
