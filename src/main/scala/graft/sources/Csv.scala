package graft.sources

import graft.{Q, QModule}
import graft.Tables.t
import org.apache.spark.sql.functions._

/** S2 CSV directory scan as a driver-oracled round-trip (it was spec-only
  * before: IoSpec + the composed g7 oracle). The fixture renders
  * crawler-layout CSVs (StagingDW/.../CsvLoader.java:26-50 wire format:
  * BOM + header + all-string rows, one file per region like one file per
  * crawl day) from the `nation` table, plus one MALFORMED short row per
  * file; the query reads the directory back through the engine's staging
  * reader semantics — directory glob, header skip, BOM tolerance,
  * null-guard row drop (F3/F5) — and the DuckDB oracle recomputes the
  * surviving rows from `nation` directly, so a mis-parsed byte or an
  * un-dropped malformed row hash-mismatches.
  */
object CsvQueries extends QModule {

  private def csvDirFor(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val safe = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_s2_csv_$safe"
    val root = new java.io.File(path)
    if (!root.exists()) {
      import s.implicits._
      val rows = t(s, dir, "nation")
        .select($"n_nationkey".cast("int"), $"n_name", $"n_regionkey".cast("int"))
        .as[(Int, String, Int)].collect() // 25 rows — bounded dim fixture
      val tmp = new java.io.File(path + ".tmp")
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
      tmp.mkdirs()
      rows.groupBy(_._3).foreach { case (region, rs) =>
        val w = new java.io.PrintWriter(
          new java.io.File(tmp, s"data_region_$region.csv"), "UTF-8")
        try {
          w.write('\ufeff') // the crawler writes a BOM (LotteryCrawler.java:300)
          w.write("prize,number_value,full_date,created_at\n")
          rs.sortBy(_._1).foreach { case (k, name, _) =>
            val day = f"${(k % 28) + 1}%02d-03-2024"
            w.write(s"Giải Bảy,${f"$k%02d"},$day,2024-03-29 07:00:00\n")
          }
          w.write("Giải Bảy,\n") // short row: staging's null-guard drops it
        } finally w.close()
      }
      if (!tmp.renameTo(root)) org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
    path
  }

  def qs: Seq[Q] = Seq(
    Q("s2_csv_dir_scan", (s, dir) => {
      import s.implicits._
      graft.pipeline.Lottery.staging(s, csvDirFor(s, dir))
        .select($"prize", $"number_value", $"full_date")
        .orderBy($"number_value")
    }, sql = Some("""
      SELECT 'Giải Bảy' AS prize,
             lpad(CAST(n_nationkey AS VARCHAR), 2, '0') AS number_value,
             lpad(CAST((n_nationkey % 28) + 1 AS VARCHAR), 2, '0') || '-03-2024' AS full_date
      FROM nation
      ORDER BY number_value
    """)),

    // K1 CSV writer as a driver-oracled round-trip (it was spec-only:
    // IoSpec's quoting/BOM round-trips): the ENGINE writes the dim as a
    // header CSV directory (distributed write, one file per partition —
    // StagingDW's CsvLoader consumes exactly this layout), reads it back
    // through the schema'd directory scan, and the oracle recomputes
    // from the parquet source — writer quoting, header, and type
    // round-trip all sit inside the hash.
    Q("k1_csv_write_scan", (s, dir) => {
      import s.implicits._
      val safe = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_k1_csv_$safe"
      if (!new java.io.File(path).exists())
        t(s, dir, "nation").select($"n_nationkey", $"n_name", $"n_regionkey")
          .write.mode("ignore").option("header", "true").csv(path)
      s.read.option("header", "true")
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .csv(path)
        .orderBy($"n_nationkey")
    }, sql = Some("""
      SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey
    """))
  )
}
