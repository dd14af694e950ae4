package graft.operators

import graft.Graft.table
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Multimodal column plumbing [EXT]: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed per-partition.
  *
  * The decode step itself is STUBBED (no image/audio libraries in this
  * environment — see the builder brief): [[decodeStub]] derives
  * deterministic fake metadata from the raw bytes. Everything around it is
  * the real Spark shape that scales to 100 TB of media:
  *   - payloads stay opaque `BinaryType` columns (never stringified);
  *   - decode runs via `mapPartitions` so a real codec would amortize
  *     per-batch init (model load, JNI handles) across a whole partition;
  *   - output is a typed struct column, schema declared up front;
  *   - `repartition(byteBudget)`-style sizing keeps any partition's media
  *     payload within executor memory.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(
    Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType)
    )
  )

  /** Attach a binary payload column (fake media bytes = UTF-8 of the text —
    * deterministic stand-in for real image/audio blobs). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", col("text").cast("binary"))

  /** Container-header decode: REAL metadata parsing for the formats whose
    * headers carry dimensions (PNG/JPEG/GIF/BMP via
    * [[graft.sources.ImageMeta]] — no codec library needed); unrecognized
    * payloads fall back to the deterministic stub (the pixel-DECODE step
    * proper remains stubbed: no codecs in this environment). */
  def decodeStub(payload: Array[Byte]): Row =
    graft.sources.ImageMeta.parse(payload) match {
      case Some(m) => Row(m.format, m.width, m.height, 1)
      case None =>
        val n = payload.length
        Row("fake/raw", 16 + (n % 64), 16 + (n % 48), 1 + (n % 8))
    }

  /** Per-partition decode: the distributed plumbing a real codec plugs into.
    * One iterator pass, no materialization of the whole partition. */
  def decodeAll(withPayloads: DataFrame): DataFrame = {
    val schema = StructType(
      Seq(StructField("doc_id", LongType), StructField("n_bytes", LongType)) ++ mediaMetaSchema.fields
    )
    val enc = org.apache.spark.sql.Encoders.row(schema)
    withPayloads
      .select(col("doc_id"), col("payload"))
      .mapPartitions { it =>
        // real codecs would init once per partition here (e.g. decoder ctx)
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val meta = decodeStub(bytes)
          Row.fromSeq(Seq(id, bytes.length.toLong) ++ meta.toSeq)
        }
      }(enc)
  }

  /** Stubbed media transforms — the full decode → resize → frame-sample
    * chain a training-data pipeline runs over image/video columns. Real
    * codecs are unavailable here (see builder brief), so the byte-level
    * transforms are deterministic fakes; the Spark plumbing (binary in /
    * binary out, per-partition batching, declared schemas) is real.
    */

  /** "Resize": keep a deterministic prefix + suffix of the payload
    * proportional to the target box — stands in for pixel downsampling. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val n = math.max(1, math.min(payload.length, (w * h) / 64))
    payload.take((n + 1) / 2) ++ payload.takeRight(n / 2)
  }

  /** "Frame sampling": every k-th 16-byte block as one frame payload. */
  def frameSampleStub(payload: Array[Byte], everyK: Int): Seq[Array[Byte]] =
    payload.grouped(16).grouped(everyK).map(_.head).map(_.toArray).toSeq

  /** Distributed resize + frame-sample over the payload column: one
    * mapPartitions pass, one output row per sampled frame (explode shape),
    * schema declared up front. */
  def transformMedia(withPayloads: DataFrame, w: Int = 64, h: Int = 64, everyK: Int = 4): DataFrame = {
    val schema = StructType(
      Seq(
        StructField("doc_id", LongType),
        StructField("frame_idx", IntegerType),
        StructField("frame_bytes", LongType),
        StructField("resized_bytes", LongType)
      )
    )
    val enc = org.apache.spark.sql.Encoders.row(schema)
    withPayloads.select(col("doc_id"), col("payload")).mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val resized = resizeStub(bytes, w, h)
        frameSampleStub(bytes, everyK).zipWithIndex.map { case (frame, i) =>
          Row(id, i, frame.length.toLong, resized.length.toLong)
        }
      }
    }(enc)
  }

  /** Oracle-checkable face of the plumbing: byte length + digest of the
    * binary payload (metadata from the stub is engine-internal → tested in
    * the unit spec instead). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // real binary metadata extraction in the gate: PNG/JPEG/GIF/BMP headers
    // parsed from payload bytes, hash-checked against the fixture's twin
    // metadata parquet (the oracle never sees the binary)
    "x21_image_meta" -> ((s, _) => {
      graft.sources.ImageFixture.ensure(s)
      val schema = StructType(
        Seq(
          StructField("img_id", LongType),
          StructField("format", StringType),
          StructField("width", IntegerType),
          StructField("height", IntegerType),
          StructField("n_bytes", LongType)
        )
      )
      val enc = org.apache.spark.sql.Encoders.row(schema)
      s.read
        .parquet(graft.sources.ImageFixture.payloadPath)
        .mapPartitions { it =>
          it.map { r =>
            val bytes = r.getAs[Array[Byte]]("payload")
            val m = graft.sources.ImageMeta.parse(bytes)
            Row(
              r.getAs[Long]("img_id"),
              m.map(_.format).orNull,
              m.map(x => Int.box(x.width)).orNull,
              m.map(x => Int.box(x.height)).orNull,
              bytes.length.toLong
            )
          }
        }(enc)
        .orderBy("img_id")
    }),
    // video face: ISO-BMFF/MP4 box walk (moov/mvhd + trak/tkhd) → track
    // dimensions + duration, hash-checked vs the twin
    "x23_video_meta" -> ((s, _) => {
      graft.sources.VideoFixture.ensure(s)
      val schema = StructType(
        Seq(
          StructField("video_id", LongType),
          StructField("width", IntegerType),
          StructField("height", IntegerType),
          StructField("duration_ms", LongType)
        )
      )
      val enc = org.apache.spark.sql.Encoders.row(schema)
      s.read
        .parquet(graft.sources.VideoFixture.payloadPath)
        .mapPartitions { it =>
          it.map { r =>
            val m = graft.sources.VideoMeta.parse(r.getAs[Array[Byte]]("payload"))
            Row(
              r.getAs[Long]("video_id"),
              m.map(x => Int.box(x.width)).orNull,
              m.map(x => Int.box(x.height)).orNull,
              m.map(x => Long.box(x.durationMs)).orNull
            )
          }
        }(enc)
        .orderBy("video_id")
    }),
    // audio face of the same pattern: WAV/RIFF chunk walk → sample rate,
    // channels, bit depth, arithmetic duration — hash-checked vs the twin
    "x22_audio_meta" -> ((s, _) => {
      graft.sources.AudioFixture.ensure(s)
      val schema = StructType(
        Seq(
          StructField("audio_id", LongType),
          StructField("sample_rate", IntegerType),
          StructField("channels", IntegerType),
          StructField("bits", IntegerType),
          StructField("duration_ms", LongType)
        )
      )
      val enc = org.apache.spark.sql.Encoders.row(schema)
      s.read
        .parquet(graft.sources.AudioFixture.payloadPath)
        .mapPartitions { it =>
          it.map { r =>
            val m = graft.sources.AudioMeta.parse(r.getAs[Array[Byte]]("payload"))
            Row(
              r.getAs[Long]("audio_id"),
              m.map(x => Int.box(x.sampleRate)).orNull,
              m.map(x => Int.box(x.channels)).orNull,
              m.map(x => Int.box(x.bitsPerSample)).orNull,
              m.map(x => Long.box(x.durationMs)).orNull
            )
          }
        }(enc)
        .orderBy("audio_id")
    }),
    "x11_multimodal_meta" -> ((s, d) => {
      withPayload(table(s, d, "documents"))
        .select(
          col("doc_id"),
          length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("digest")
        )
        .orderBy("doc_id")
    })
  )

  def oracles: Map[String, String] = Map(
    "x23_video_meta" ->
      """SELECT video_id, width, height, duration_ms
        |FROM '/root/repo/spark-warehouse/graft_video/twin/*.parquet'
        |ORDER BY video_id""".stripMargin,
    "x22_audio_meta" ->
      """SELECT audio_id, sample_rate, channels, bits, duration_ms
        |FROM '/root/repo/spark-warehouse/graft_audio/twin/*.parquet'
        |ORDER BY audio_id""".stripMargin,
    "x21_image_meta" ->
      """SELECT img_id, format, width, height, n_bytes
        |FROM '/root/repo/spark-warehouse/graft_images/twin/*.parquet'
        |ORDER BY img_id""".stripMargin,
    "x11_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
