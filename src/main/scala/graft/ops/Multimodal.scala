package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2 B6).
  *
  * Media payloads are opaque `binary` columns travelling next to typed
  * metadata. IMAGE decode is REAL as of r16 — [[decodeRealFeatures]] binds
  * the JDK's own `javax.imageio` readers (PNG/JPEG/GIF/BMP, zero added
  * dependency) and reports true raster dimensions + Rec. 601 mean luma,
  * contract-tested bit-exactly on an in-test-generated PNG. Audio/video
  * decode still needs codec libraries this container lacks, so those (and
  * the registered oracle queries, whose synthetic payloads are UTF-8 text,
  * not image containers) ride the documented deterministic STUB — the
  * Spark-side plumbing is identical either way: schema, batch shape
  * (`mapPartitions` over iterator batches, the Scala analog of
  * `mapInPandas`), and partition sizing all match what any real decoder
  * sees. At 100 TB this pipeline is a narrow per-partition pass; media
  * bytes never shuffle.
  */
object Multimodal {

  /** Typed decode result a real image/audio decoder would produce. */
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Int,
                           width: Int, height: Int, mean_luma: Double)

  /** The contract [[mediaTable]] actually produces (n_bytes is a long —
    * media blobs exceed 2 GiB).
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("kind", StringType),
    StructField("payload", BinaryType),
    StructField("n_bytes", LongType)
  ))

  /** Build the media table: documents' text bytes stand in for media blobs;
    * kind cycles image/audio/video by doc_id (pmod: a negative doc_id must
    * still land in 1..3 — plain % would hit element_at index 0, a runtime
    * error).
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      octet_length(col("text").cast("binary")).cast("long").as("n_bytes")
    )

  /** STUB decoder — deterministic fake standing in for e.g. libjpeg: derives
    * "dimensions" and a "luma" from the payload's decoded code points (the
    * payloads here are UTF-8 text standing in for media bytes; code points
    * make the fake engine-portable, so the DuckDB oracle replays it). A real
    * deployment swaps only this function; the batching/schema contract is
    * unchanged.
    */
  private def decodeStub(docId: Long, kind: String, payload: Array[Byte]): MediaFeatures = {
    val n = payload.length
    val cps = new String(payload, java.nio.charset.StandardCharsets.UTF_8).codePoints().toArray
    val head = if (cps.nonEmpty) cps(0) else 0
    val sum = cps.foldLeft(0L)(_ + _)
    MediaFeatures(docId, kind, n, width = 16 + head % 64, height = 16 + (n % 64),
      mean_luma = if (cps.isEmpty) 0.0 else sum.toDouble / cps.length)
  }

  /** A decode result that names which codec produced it: "imageio" for a
    * payload the JDK decoded as a real image container, "stub" otherwise.
    */
  case class DecodedFeatures(doc_id: Long, kind: String, decoder: String,
                             n_bytes: Int, width: Int, height: Int,
                             mean_luma: Double)

  /** REAL image decode via JDK `javax.imageio` (r16, VERDICT r15 #5 — no
    * new dependency: PNG/JPEG/GIF/BMP readers ship in the JDK). Decodes the
    * payload's actual pixel raster and reports true width/height plus the
    * Rec. 601 mean luma (0.299·R + 0.587·G + 0.114·B over row-major ARGB),
    * the exact numbers OpsSpec replays bit-for-bit from an in-test-generated
    * PNG. Returns None when the bytes are not a decodable image container —
    * the synthetic corpus payloads are UTF-8 text, so the REGISTERED
    * `multimodal_decode` query stays on the portable stub and this binding
    * is the production seam for real media columns.
    */
  private def decodeImageIO(docId: Long, kind: String,
                            payload: Array[Byte]): Option[DecodedFeatures] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
              0.114 * (rgb & 0xFF)
            x += 1
          }
          y += 1
        }
        Some(DecodedFeatures(docId, kind, "imageio", payload.length, w, h,
          sum / (w.toLong * h)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** B6 production decode: try the REAL JDK ImageIO codec per row, fall back
    * to the deterministic stub for non-image payloads — same mapPartitions
    * batch shape as [[decodeFeatures]], with the winning codec named per row
    * so a pipeline can audit its decode coverage.
    */
  def decodeRealFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "kind", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows => rows.map { case (id, kind, payload) =>
        decodeImageIO(id, kind, payload).getOrElse {
          val f = decodeStub(id, kind, payload)
          DecodedFeatures(id, kind, "stub", f.n_bytes, f.width, f.height, f.mean_luma)
        }
      } }
      .toDF()
  }

  /** B6 — batched decode over partitions: the iterator-in/iterator-out shape
    * means a real codec can amortize per-batch setup (model load, JNI
    * context) exactly like `mapInPandas` batches.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "kind", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows => rows.map { case (id, kind, payload) => decodeStub(id, kind, payload) } }
      .toDF()
  }

  /** Resize stub: a real implementation rescales pixel buffers; the stub
    * derives the target-box dimensions with aspect preserved — the part a
    * pipeline actually schedules around (output schema + partition shape).
    */
  case class Resized(doc_id: Long, kind: String, out_w: Int, out_h: Int, payload: Array[Byte])
  def resizeStub(media: DataFrame, maxSide: Int = 256): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    decodeFeatures(media).as[MediaFeatures].mapPartitions { rows =>
      rows.map { f =>
        val scale = math.min(1.0, maxSide.toDouble / math.max(f.width, f.height))
        Resized(f.doc_id, f.kind,
          math.max(1, (f.width * scale).toInt), math.max(1, (f.height * scale).toInt),
          Array.emptyByteArray /* stub: real codec writes rescaled bytes */)
      }
    }.toDF()
  }

  /** Frame-sample stub for video rows: emit every nth "frame" as its own row
    * (explode shape) with deterministic frame offsets — the schema and
    * row-multiplication behavior a real decoder produces. Non-video rows
    * pass through with a single frame.
    */
  def frameSample(media: DataFrame, everyNth: Int = 10): DataFrame =
    media
      .withColumn("n_frames",
        when(col("kind") === "video", greatest(expr("n_bytes div 20"), lit(1L))).otherwise(1L).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(expr(s"(n_frames - 1) div $everyNth").cast("int"), lit(0)))))
      .select(col("doc_id"), col("kind"), (col("frame_idx") * everyNth).as("frame_offset"),
        col("n_frames").cast("long").as("n_frames_total"))

  /** B6 (oracle path) — metadata extraction expressible in portable SQL:
    * byte length, content digest, deterministic stub dimensions.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(
        col("doc_id"), col("kind"), col("n_bytes"),
        sha2(col("payload"), 256).as("content_sha256"),
        (lit(16) + ascii(substring(col("payload").cast("string"), 1, 1)) % 64).cast("long").as("stub_width"),
        (lit(16) + col("n_bytes") % 64).cast("long").as("stub_height")
      )
      .orderBy("doc_id")
}
