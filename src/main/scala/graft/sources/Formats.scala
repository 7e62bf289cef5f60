package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** File-format readers/writers beyond parquet. All readers take an explicit
  * DDL schema: schema inference is a full extra pass over the data — never
  * acceptable at 100 TB, and implicit types drift between runs.
  */
object Formats {

  def readCsv(spark: SparkSession, path: String, ddlSchema: String,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(ddlSchema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)

  /** ORC: the other columnar lake format Spark supports natively —
    * predicate pushdown and column pruning work the same as parquet, so a
    * reference user on an ORC lake switches by changing this one call.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Binary-file source: each matching file becomes one row of
    * (path, modificationTime, length, content BINARY) — the ingestion
    * path for raw multimodal payloads (images/audio/frames) into the
    * opaque-binary column model that Multimodal.extractFeatures and
    * chunked() process downstream. `pathGlob` filters at LISTING time
    * (e.g. "*.png"), before any bytes are read.
    */
  def readBinaryFiles(spark: SparkSession, dir: String, pathGlob: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", pathGlob)
      .load(dir)

  /** JSON Lines: one object per line — the splittable streaming-friendly
    * JSON layout.
    */
  def readJsonl(spark: SparkSession, path: String, ddlSchema: String): DataFrame =
    spark.read.schema(ddlSchema).json(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** XML: built into Spark 4 (no external package). Row-per-`rowTag`
    * element; schema explicit like every other reader here. The exchange
    * format legacy manufacturing systems (MES/ERP exports) still speak —
    * the reference's RDB extracts often front such feeds.
    */
  def readXml(spark: SparkSession, path: String, ddlSchema: String,
      rowTag: String): DataFrame =
    spark.read.schema(ddlSchema).format("xml").option("rowTag", rowTag).load(path)

  def writeXml(df: DataFrame, path: String, rootTag: String, rowTag: String): Unit =
    df.write.mode(SaveMode.Overwrite).format("xml")
      .option("rootTag", rootTag).option("rowTag", rowTag).save(path)
}
