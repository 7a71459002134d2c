package graft

import java.nio.file.Files

import graft.sources.Jdbc
import org.apache.spark.sql.SaveMode

/** JDBC parity mode (SURVEY §2.1 S3 / §2.2 K2): the reference's MySQL
  * surface exercised against embedded Derby (the JDBC engine Spark ships).
  * Round-trip, parallel ranged read, and the K3 idempotent upsert over a
  * JDBC sink.
  */
class JdbcSpec extends SparkSpec {

  private lazy val url = {
    val dir = Files.createTempDirectory("derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  test("JDBC round-trip: write then read back preserves rows and schema") {
    import spark.implicits._
    val df = Seq((1L, "Giải Nhất", 12345.0), (2L, "Giải Bảy", 9.0))
      .toDF("id", "prize", "amount")
    Jdbc.write(df, url, "roundtrip", SaveMode.Overwrite)
    val back = Jdbc.read(spark, url, "roundtrip")
    assert(back.columns.map(_.toLowerCase).sorted === df.columns.sorted)
    assert(rows(back.selectExpr("id", "prize", "amount")) === rows(df))
  }

  test("JDBC ranged read fans out to parallel range partitions") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"row$i")).toDF("id", "v")
    Jdbc.write(df, url, "ranged", SaveMode.Overwrite)
    val back = Jdbc.readRanged(spark, url, "ranged", "id", 1L, 100L, 4)
    assert(back.rdd.getNumPartitions === 4) // 4 range-disjoint queries
    assert(back.count() === 100L)
    assert(rows(back.orderBy("id")) === rows(df))
  }

  test("JDBC pushdown query reads only the server-side result") {
    // Spark-written tables have case-preserved (quoted) column names
    val top = Jdbc.readQuery(spark, url,
      """SELECT "id", "v" FROM ranged WHERE "id" <= 3""")
    assert(top.count() === 3L)
  }

  test("K3 over JDBC: writeNew is idempotent (second load adds nothing)") {
    import spark.implicits._
    val batch = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Jdbc.write(batch, url, "dim", SaveMode.Overwrite)
    Jdbc.writeNew(batch, url, "dim", Seq("k"))           // full replay
    Jdbc.writeNew(batch.union(Seq((3L, "c")).toDF("k", "v")),
      url, "dim", Seq("k"))                              // replay + 1 new
    val back = Jdbc.read(spark, url, "dim")
    assert(back.count() === 3L)
  }
}
