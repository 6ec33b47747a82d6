package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata extracted by a partition-level decode
  * pass (`mapPartitions` over an iterator of byte arrays — the Scala
  * analog of a batched decode UDF; one codec init per partition, not
  * per row).
  *
  * The synthetic corpus has no real media bytes (and the DuckDB oracle
  * must reproduce the decode), so the CATALOG queries use a
  * clearly-marked DETERMINISTIC STUB (dimensions derived from an MD5 of
  * the payload). The real decode exists alongside it: [[imageMeta]]
  * extracts true header metadata via JDK ImageIO through the identical
  * partition-batched plumbing, proven on real PNG/BMP payloads by
  * MultimodalCodecSpec. At 100 TB this shape is the right one:
  * payloads never shuffle (all transforms are narrow), header-only
  * reads skip pixel decoding, and metadata extraction is
  * embarrassingly parallel over input splits.
  */
object MultimodalQueries {

  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
                       height: Long, format: String)

  /** STUB decode: a real implementation would parse the image header
    * here (e.g. PNG IHDR). Deterministic fake: dims from the payload's
    * MD5, format from length mod 3. */
  private def decodeStub(id: Long, payload: Array[Byte]): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    val w = 64 + Integer.parseInt(hex.substring(0, 3), 16) % 960
    val h = 64 + Integer.parseInt(hex.substring(3, 6), 16) % 960
    val fmt = (payload.length % 3) match {
      case 0 => "png"; case 1 => "jpeg"; case _ => "webp"
    }
    MediaMeta(id, payload.length.toLong, w.toLong, h.toLong, fmt)
  }

  /** REAL decode path: JDK ImageIO, whose PNG/GIF/BMP/JPEG readers
    * ship with every JVM — no external codec needed. Identical
    * partition-batched `mapPartitions` shape as the catalog query, but
    * the metadata comes from the actual image header: the reader is
    * asked only for format/width/height, which parses the header
    * without decoding pixels (the cheap pass a 100 TB media crawl runs
    * first). Payloads no installed reader understands yield a null
    * format and -1 dims rather than failing the partition. The catalog
    * entry stays on the deterministic stub because the synthetic corpus
    * has no real media bytes and the DuckDB oracle must reproduce the
    * decode — this is the production function, exercised by
    * MultimodalCodecSpec against real in-memory PNG/BMP payloads. */
  def imageMeta(images: DataFrame, idCol: String,
                payloadCol: String): DataFrame = {
    val s = images.sparkSession
    import s.implicits._
    images.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val in = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(in)
          if (readers.hasNext) {
            val r = readers.next()
            try {
              r.setInput(in)
              MediaMeta(id, bytes.length.toLong, r.getWidth(0).toLong,
                r.getHeight(0).toLong, r.getFormatName.toLowerCase)
            } finally r.dispose()
          } else MediaMeta(id, bytes.length.toLong, -1L, -1L, null)
        } finally in.close()
      })
      .toDF()
  }

  case class AudioMeta(doc_id: Long, n_bytes: Long, sample_rate: Double,
                       channels: Long, frames: Long, duration_sec: Double)

  /** REAL audio decode path, mirroring [[imageMeta]]: JDK
    * `javax.sound.sampled` parses WAV/AIFF/AU headers in every JVM.
    * Header-only (frame count, rate, channels — no sample decode);
    * unreadable payloads degrade to -1/null rows. Exercised on real
    * in-memory WAV payloads by MultimodalCodecSpec. */
  def audioMeta(audio: DataFrame, idCol: String,
                payloadCol: String): DataFrame = {
    val s = audio.sparkSession
    import s.implicits._
    audio.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        try {
          val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
            new java.io.ByteArrayInputStream(bytes))
          val af = fmt.getFormat
          val frames = fmt.getFrameLength.toLong
          AudioMeta(id, bytes.length.toLong, af.getSampleRate.toDouble,
            af.getChannels.toLong, frames,
            if (af.getFrameRate > 0) frames / af.getFrameRate.toDouble else -1.0)
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException |
               _: java.io.IOException =>
            AudioMeta(id, bytes.length.toLong, -1.0, -1L, -1L, -1.0)
        }
      })
      .toDF()
  }

  /** Binary ingest + partition-batched metadata extraction. The text
    * column stands in for a media payload (UTF-8 bytes). */
  def mediaMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.sources.Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
      .toDF()
  }

  val mediaMetaSql: String =
    """SELECT doc_id,
      |  CAST(strlen(text) AS BIGINT) AS n_bytes,
      |  CAST(64 + (('0x' || substr(md5(text), 1, 3))::INT % 960) AS BIGINT) AS width,
      |  CAST(64 + (('0x' || substr(md5(text), 4, 3))::INT % 960) AS BIGINT) AS height,
      |  CASE CAST(strlen(text) % 3 AS INT) WHEN 0 THEN 'png'
      |       WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format
      |FROM documents""".stripMargin

  case class DocEmbed(doc_id: Long, embedding: Seq[Double])

  /** Feature-extraction plumbing: payload bytes → embedding vector via
    * a partition-batched extractor (one "model" per partition, the
    * mapInPandas shape). The extractor is a DETERMINISTIC STUB
    * (md5-derived 8-dim vector in [0,1]); the Spark plumbing — binary
    * in, typed vector column out, no shuffle — is the real path an
    * image/audio embedder runs at 100 TB.
    *
    * The verified output is the vector in long form (doc_id, dim, val):
    * the oracle gate hashes rows after a column sort, so the final
    * projection must be scalar columns (a raw array column is not
    * sortable driver-side); the vector itself still flows through the
    * plan as one typed column. */
  def embedStub(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.sources.Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5") // per partition
        it.map { case (id, bytes) =>
          md.reset()
          val dg = md.digest(bytes)
          DocEmbed(id, (0 until 8).map(i => (dg(i) & 0xff) / 255.0))
        }
      }
      .toDF()
      .select(col("doc_id"),
        posexplode(col("embedding")).as(Seq("dim", "val")))
      .select(col("doc_id"), col("dim").cast(LongType).as("dim"),
        round(col("val"), 6).as("val"))
  }

  val embedStubSql: String =
    """SELECT doc_id, CAST(i - 1 AS BIGINT) AS dim,
      |  round((('0x' || substr(md5(text), 2*i-1, 2))::INT) / 255.0, 6) AS val
      |FROM documents
      |CROSS JOIN (SELECT unnest(generate_series(1, 8)) AS i) dims""".stripMargin

  /** Frame-sampling plumbing: treat every 1 KiB slice of the payload as
    * a "frame", sample every 4th — pure column ops on binary
    * (substring on bytes), no shuffle. Output is (doc_id, frame_no,
    * frame_bytes-length) — the schema a video pipeline hands to a
    * feature extractor. */
  def frameSample(s: SparkSession, d: String): DataFrame =
    graft.sources.Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0),
            greatest(floor((length(col("payload")) - 1) / 256).cast(IntegerType),
              lit(0)), lit(4)),
          off => substring(col("payload"), (off * 256 + 1).cast(IntegerType),
            lit(256))))
          .as(Seq("frame_no", "frame")))
      .select(col("doc_id"), col("frame_no").cast(LongType).as("frame_no"),
        length(col("frame")).cast(LongType).as("frame_bytes"))

  val frameSampleSql: String =
    """WITH p AS (SELECT doc_id, text, CAST(strlen(text) AS BIGINT) n FROM documents),
      |f AS (
      |  SELECT doc_id, n,
      |         unnest(generate_series(0, CAST((n-1)/256 AS BIGINT), 4)) o
      |  FROM p)
      |SELECT doc_id,
      |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY o) - 1 AS BIGINT) AS frame_no,
      |  CAST(least(256, n - o*256) AS BIGINT) AS frame_bytes
      |FROM f""".stripMargin

  /** Per-modality dataset card — the media section of a corpus
    * release: items, bytes, and the dimension envelope per format.
    * Composes [[mediaMeta]] (the metadata pass is the only payload
    * touch; the rollup is a tiny grouped agg over its output), exactly
    * how a 100 TB media card is produced: one header-only scan, then
    * counters. All BIGINT. */
  def modalityCard(s: SparkSession, d: String): DataFrame =
    mediaMeta(s, d)
      .groupBy(col("format"))
      .agg(count(lit(1)).cast(LongType).as("n_items"),
        sum(col("n_bytes")).cast(LongType).as("total_bytes"),
        min(col("width")).as("min_width"),
        max(col("width")).as("max_width"),
        min(col("height")).as("min_height"),
        max(col("height")).as("max_height"))

  /** Embeds [[mediaMetaSql]] so the decode spelling cannot drift. */
  val modalityCardSql: String =
    s"""WITH mm AS ($mediaMetaSql)
       |SELECT format, CAST(COUNT(*) AS BIGINT) AS n_items,
       |       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       |       min(width) AS min_width, max(width) AS max_width,
       |       min(height) AS min_height, max(height) AS max_height
       |FROM mm GROUP BY format""".stripMargin

  /** Resolution floor for [[resolutionGate]], pixels per side. */
  private val MinSide = 256L

  /** Media quality gate — the standard resolution/size filter a
    * multimodal curation pass runs before any expensive decode: keep
    * items whose BOTH sides clear [[MinSide]] (thumbnails, icons, and
    * tracking pixels drop). A pure per-row filter over the header
    * metadata — the payload bytes are never touched beyond the header
    * pass, and the kept set feeds the embed/frame stages. */
  def resolutionGate(s: SparkSession, d: String): DataFrame =
    mediaMeta(s, d)
      .filter(col("width") >= MinSide && col("height") >= MinSide)
      .select(col("doc_id"), col("format"), col("width"), col("height"))

  val resolutionGateSql: String =
    s"""WITH mm AS ($mediaMetaSql)
       |SELECT doc_id, format, width, height
       |FROM mm WHERE width >= $MinSide AND height >= $MinSide""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_modality_card" -> modalityCard _,
    "mm_resolution_gate" -> resolutionGate _,
    "mm_media_meta" -> mediaMeta _,
    "mm_embed_stub" -> embedStub _,
    "mm_frame_sample" -> frameSample _)

  def oracles: Map[String, String] = Map(
    "mm_modality_card" -> modalityCardSql,
    "mm_resolution_gate" -> resolutionGateSql,
    "mm_media_meta" -> mediaMetaSql,
    "mm_embed_stub" -> embedStubSql,
    "mm_frame_sample" -> frameSampleSql)
}
