package graft.sources

import org.apache.spark.sql.SparkSession

/** Deterministic multimodal fixture: 400 binary image payloads (real
  * PNG/JPEG/GIF/BMP container bytes from [[ImageMeta.synthesize]]) plus a
  * twin metadata parquet. The x21 gate query parses the BINARY payloads
  * with [[ImageMeta.parse]]; the oracle reads the twin — a hash match
  * proves the byte-level header parsing end-to-end. */
object ImageFixture {
  val dir = "/root/repo/spark-warehouse/graft_images"
  val payloadPath = s"$dir/payloads"
  val twinPath = s"$dir/twin"

  private val formats = Seq("image/png", "image/jpeg", "image/gif", "image/bmp")

  def rows: Seq[(Long, Array[Byte], String, Int, Int)] = (0 until 400).map { i =>
    val fmt = formats(i % formats.size)
    val w = 16 + (i * 13) % 2048
    val h = 16 + (i * 29) % 1536
    (i.toLong, ImageMeta.synthesize(fmt, w, h, junk = 64 + (i * 17) % 512, seed = i), fmt, w, h)
  }

  def ensure(spark: SparkSession): Unit = synchronized {
    if (!new java.io.File(twinPath).exists()) {
      new java.io.File(dir).mkdirs()
      import spark.implicits._
      val r = rows
      r.map { case (id, p, _, _, _) => (id, p) }
        .toDF("img_id", "payload")
        .coalesce(1).write.mode("overwrite").parquet(payloadPath)
      r.map { case (id, p, f, w, h) => (id, f, w, h, p.length.toLong) }
        .toDF("img_id", "format", "width", "height", "n_bytes")
        .coalesce(1).write.mode("overwrite").parquet(twinPath)
    }
  }
}
