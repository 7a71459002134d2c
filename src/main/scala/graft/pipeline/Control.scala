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

  val processLogSchema: StructType = StructType(Seq(
    StructField("process_code", StringType),  // 'P1'..'P4'
    StructField("status", StringType),        // RUNNING/SUCCESS/FAIL
    StructField("started_at", TimestampType),
    StructField("ended_at", TimestampType),
    StructField("message", StringType)))

  /** K5/process_log analog: append one status row (the reference's
    * INSERT+UPDATE pair becomes two immutable appends; current status =
    * latest row per process_code, S7's existence probe below). */
  def logStatus(spark: SparkSession, logDir: String, processCode: String,
                status: String, message: String,
                startedAt: java.sql.Timestamp = null): Unit = {
    import spark.implicits._
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val started = Option(startedAt).getOrElse(now)
    Seq((processCode, status, started, now, message))
      .toDF("process_code", "status", "started_at", "ended_at", "message")
      .write.mode("append").parquet(logDir)
  }

  /** S7: stage-dependency gate — latest status of `processCode` is SUCCESS
    * (StagingController.java:41-67 / ETLMain.java:98-111 gating). */
  def lastStatusIsSuccess(spark: SparkSession, logDir: String,
                          processCode: String): Boolean = {
    val last = spark.read.schema(processLogSchema).parquet(logDir)
      .filter(col("process_code") === processCode)
      .orderBy(col("ended_at").desc)
      .limit(1).collect()
    last.nonEmpty && last.head.getAs[String]("status") == "SUCCESS"
  }
}
