package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's `control` database surface (SURVEY §0, §2.1-§2.2):
  * key-value config (S6) and the process_log run log (K5), re-expressed as
  * a config map + an append-only parquet run log.
  */
object Control {

  /** S6: key-value config scan → Map (Util.java:7-21 reads config_database
    * into a HashMap; config is driver-side by nature, so a collect is
    * correct here — this is the ONE place a collect belongs). */
  def configMap(kv: DataFrame): Map[String, String] =
    kv.select(col("config_key").cast("string"), col("config_value").cast("string"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  /** X13: parse the reference's "host: x, port: y" flat config string
    * (transform_staging/Util.java:14-28). */
  def parseKvString(cfg: String): Map[String, String] =
    cfg.split(",").iterator
      .map(_.split(":", 2))
      .collect { case Array(k, v) => k.trim -> v.trim }
      .toMap

  /** The connection fields the reference's XML config carries
    * (crawl_data/src/main/java/python2/XMLConfigReader.java:23-27). */
  val xmlConfigKeys: Seq[String] =
    Seq("host", "port", "database", "username", "password")

  /** S6 (XML form): read the reference's `control.xml` connection config
    * (XMLConfigReader.java:12-33 — DOM parse, one text value per tag).
    * Returns None for a missing file, mirroring the reference's null;
    * absent tags are simply absent keys (the reference would NPE — a
    * missing key here surfaces at use-site with a real error instead).
    * Driver-side JDK DOM, config-sized by nature — no Spark involved. */
  def readXmlConfig(xmlFilePath: String): Option[Map[String, String]] = {
    val f = new java.io.File(xmlFilePath)
    if (!f.exists()) None
    else {
      val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        .newDocumentBuilder().parse(f)
      doc.getDocumentElement.normalize()
      Some(xmlConfigKeys.flatMap { k =>
        val nodes = doc.getElementsByTagName(k)
        if (nodes.getLength > 0) Some(k -> nodes.item(0).getTextContent)
        else None
      }.toMap)
    }
  }

  /** Full reference schema (SURVEY §1.3): `process_id BIGINT AI,
    * source_id INT, process_code, status, started_at, ended_at, message`
    * (ETLMain.java:164-167). */
  val processLogSchema: StructType = StructType(Seq(
    StructField("process_id", LongType),      // AUTO_INCREMENT analog
    StructField("source_id", IntegerType),
    StructField("process_code", StringType),  // 'P1'..'P4'
    StructField("status", StringType),        // RUNNING/SUCCESS/FAIL
    StructField("started_at", TimestampType),
    StructField("ended_at", TimestampType),
    StructField("message", StringType)))

  /** Generated-key analog (ETLMain.java:177-178 reads the AUTO_INCREMENT
    * key back): next process_id = max existing + 1. The log is run
    * metadata — config-sized — so the scan is trivial; like the
    * reference's MySQL key this assumes one orchestrator appending. */
  private def nextProcessId(spark: SparkSession, logDir: String): Long =
    if (!new java.io.File(logDir).exists()) 1L
    else spark.read.schema(processLogSchema).parquet(logDir)
      .agg(coalesce(max(col("process_id")), lit(0L))).collect()(0).getLong(0) + 1

  /** K5/process_log analog: append one status row. The reference INSERTs
    * a RUNNING row, reads back its generated process_id, and later
    * UPDATEs that row by key (ETLMain.java:164-190); append-only form:
    * the RUNNING append allocates and RETURNS the process_id, and the
    * terminal SUCCESS/FAIL append passes it back in — same correlation,
    * immutable rows (current status = latest row per process_code, S7's
    * existence probe below). */
  def logStatus(spark: SparkSession, logDir: String, processCode: String,
                status: String, message: String,
                startedAt: java.sql.Timestamp = null,
                sourceId: Int = 0, processId: Long = -1L): Long = {
    import spark.implicits._
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val started = Option(startedAt).getOrElse(now)
    val id = if (processId >= 0) processId else nextProcessId(spark, logDir)
    Seq((id, sourceId, processCode, status, started, now, message))
      .toDF("process_id", "source_id", "process_code", "status",
        "started_at", "ended_at", "message")
      .write.mode("append").parquet(logDir)
    id
  }

  /** S7: stage-dependency gate — latest status of `processCode` is SUCCESS
    * (StagingController.java:41-67 / ETLMain.java:98-111 gating). */
  def lastStatusIsSuccess(spark: SparkSession, logDir: String,
                          processCode: String): Boolean = {
    val last = spark.read.schema(processLogSchema).parquet(logDir)
      .filter(col("process_code") === processCode)
      .orderBy(col("ended_at").desc, col("process_id").desc)
      .limit(1).collect()
    last.nonEmpty && last.head.getAs[String]("status") == "SUCCESS"
  }
}
