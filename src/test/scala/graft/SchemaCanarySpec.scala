package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-drift canary: the r7 round lost its whole streaming tier because
  * the testdata writer silently changed `events.ts` from TIMESTAMP(NANOS)
  * to timestamp[us]. This spec turns the next silent regen into a one-line
  * diagnosis: it reads every testdata table through the engine's reader
  * (`Tables.t`, i.e. AFTER normalization) and asserts the engine-facing
  * type of every column, failing with a message that names the table and
  * column that changed shape.
  *
  * The second half proves the normalizer itself on fixtures this spec
  * writes: the same instants stored as long nanos, TIMESTAMP, and
  * TIMESTAMP_NTZ must normalize to identical long-nanos values, and an
  * unsupported arrival type must fail loudly (not produce silent garbage).
  */
class SchemaCanarySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  // Engine-facing contract per table. A Set means "any of these is
  // tolerated" — date/timestamp columns may arrive adjusted-to-UTC
  // (TIMESTAMP) or naive (TIMESTAMP_NTZ) depending on the writer; every
  // consumer handles both. Everything else is exact.
  private val ts2: Set[DataType] = Set(TimestampType, TimestampNTZType)
  private def one(d: DataType): Set[DataType] = Set(d)

  private val contract: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq("r_regionkey" -> one(IntegerType), "r_name" -> one(StringType)),
    "nation" -> Seq("n_nationkey" -> one(IntegerType), "n_name" -> one(StringType),
      "n_regionkey" -> one(IntegerType)),
    "customer" -> Seq("c_custkey" -> one(LongType), "c_name" -> one(StringType),
      "c_nationkey" -> one(IntegerType), "c_acctbal" -> one(DoubleType),
      "c_mktsegment" -> one(StringType)),
    "supplier" -> Seq("s_suppkey" -> one(LongType), "s_name" -> one(StringType),
      "s_nationkey" -> one(IntegerType), "s_acctbal" -> one(DoubleType)),
    "part" -> Seq("p_partkey" -> one(LongType), "p_name" -> one(StringType),
      "p_brand" -> one(StringType), "p_type" -> one(StringType),
      "p_size" -> one(IntegerType), "p_retailprice" -> one(DoubleType)),
    "orders" -> Seq("o_orderkey" -> one(LongType), "o_custkey" -> one(LongType),
      "o_orderstatus" -> one(StringType), "o_totalprice" -> one(DoubleType),
      "o_orderdate" -> ts2, "o_orderpriority" -> one(StringType)),
    "lineitem" -> Seq("l_orderkey" -> one(LongType), "l_partkey" -> one(LongType),
      "l_suppkey" -> one(LongType), "l_linenumber" -> one(IntegerType),
      "l_quantity" -> one(DoubleType), "l_extendedprice" -> one(DoubleType),
      "l_discount" -> one(DoubleType), "l_tax" -> one(DoubleType),
      "l_returnflag" -> one(StringType), "l_linestatus" -> one(StringType),
      "l_shipdate" -> ts2),
    // ts is the normalized engine contract: ALWAYS long nanos after Tables.t.
    "events" -> Seq("event_id" -> one(LongType), "ts" -> one(LongType),
      "user_id" -> one(LongType), "event_type" -> one(StringType),
      "value" -> one(DoubleType), "props" -> one(StringType)),
    "documents" -> Seq("doc_id" -> one(LongType), "text" -> one(StringType),
      "lang" -> one(StringType), "source" -> one(StringType),
      "n_chars" -> one(LongType)),
    "embeddings" -> Seq("vec_id" -> one(LongType),
      "embedding" -> Set(ArrayType(FloatType, true), ArrayType(FloatType, false)),
      "label" -> one(IntegerType)))

  test("every testdata table matches the engine-facing schema contract") {
    val drifted = contract.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val got = Tables.t(spark, dir, table).schema
      val gotMap = got.fields.map(f => f.name -> f.dataType).toMap
      val missing = cols.collect { case (c, _) if !gotMap.contains(c) =>
        s"$table.$c: MISSING (testdata changed shape; arrived columns: ${got.fieldNames.mkString(",")})" }
      val wrong = cols.collect { case (c, ok) if gotMap.contains(c) && !ok(gotMap(c)) =>
        s"$table.$c: arrived ${gotMap(c).simpleString}, engine expects " +
          s"${ok.map(_.simpleString).mkString(" or ")} (testdata changed shape)" }
      missing ++ wrong
    }
    assert(drifted.isEmpty, "\nSchema drift detected:\n" + drifted.mkString("\n"))
  }

  test("string columns remain all-ASCII (binary vs collated ordering parity)") {
    // Every cross-engine ORDER BY / GROUP BY on a string column relies on
    // Spark's binary ordering agreeing with DuckDB's collation — true for
    // ASCII, not guaranteed beyond it (and \s+ tokenization drifts on
    // unicode spaces). Probe the whole testdata so a writer-side switch
    // to non-ASCII content fails HERE with the column named, not as a
    // scattered hash mismatch.
    val offenders = contract.keys.toSeq.sorted.flatMap { table =>
      val df = Tables.t(spark, dir, table)
      df.schema.fields.filter(_.dataType == StringType).flatMap { f =>
        val n = df.filter(length(col(f.name)) =!= octet_length(col(f.name)))
          .limit(1).count()
        if (n > 0) Some(s"$table.${f.name}: non-ASCII content arrived " +
          "(binary vs collated ordering may diverge)") else None
      }
    }
    assert(offenders.isEmpty, "\n" + offenders.mkString("\n"))
  }

  test("double columns stay off the half grid at quantization scale 2 (dsum parity)") {
    // Tables.dsum quantizes with floor(x*100 + 0.5) (half toward +inf);
    // the DuckDB oracle CASTs to DECIMAL (half away from zero). The two
    // agree everywhere EXCEPT when x*100 lands bit-exactly on k + 0.5 for
    // negative x. 2-decimal testdata sits ~1e-10 off the integer grid so
    // the half grid is unreachable — probe every double column so a regen
    // emitting >2 fractional digits fails HERE, named, instead of as a
    // scattered fuzz/dsum hash mismatch.
    val offenders = contract.keys.toSeq.sorted.flatMap { table =>
      val df = Tables.t(spark, dir, table)
      df.schema.fields.filter(_.dataType == DoubleType).flatMap { f =>
        val scaled = col(f.name) * lit(100.0)
        val n = df.filter(scaled - floor(scaled) === lit(0.5)).limit(1).count()
        if (n > 0) Some(s"$table.${f.name}: value landed exactly on the " +
          "x*100 half grid — dsum (half-up) and the oracle (half-away) " +
          "would diverge on negatives") else None
      }
    }
    assert(offenders.isEmpty, "\n" + offenders.mkString("\n"))
  }

  // --- normalizer unit coverage over self-written fixtures ---------------

  // Pre-epoch through year-2100; long nanos represents ±292 years around
  // epoch (year 2262 max), which bounds the contract itself.
  private val instantsMicros = Seq(0L, 1700000000000000L, 1700000000123456L,
    -1000000L, 4102444800000000L)

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("canary_").toFile
    d.deleteOnExit(); s"${d.getPath}/$name"
  }

  test("normalizeEventTs: long / TIMESTAMP / TIMESTAMP_NTZ arrivals agree") {
    import spark.implicits._
    val base = instantsMicros.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }.toDF("event_id", "ts_us")

    val longPath = tmp("ev_long")
    base.select($"event_id", ($"ts_us" * 1000L).as("ts")).write.parquet(longPath)

    val ltzPath = tmp("ev_ltz")
    base.select($"event_id", timestamp_micros($"ts_us").as("ts")).write.parquet(ltzPath)

    val ntzPath = tmp("ev_ntz")
    base.select($"event_id",
      timestamp_micros($"ts_us").cast(TimestampNTZType).as("ts")).write.parquet(ntzPath)

    val out = Seq(longPath, ltzPath, ntzPath).map { p =>
      val df = Tables.normalizeEventTs(spark.read.parquet(p))
      assert(df.schema("ts").dataType === LongType, s"$p: not normalized to long")
      df.orderBy("event_id").select("ts").as[Long].collect().toSeq
    }
    val wantNanos = instantsMicros.map(_ * 1000L)
    assert(out(0) === wantNanos, "long passthrough changed values")
    assert(out(1) === wantNanos, "TIMESTAMP arrival mis-normalized")
    assert(out(2) === wantNanos, "TIMESTAMP_NTZ arrival mis-normalized")
  }

  test("normalizeEventTs: unsupported arrival type fails loudly, naming the drift") {
    import spark.implicits._
    val bad = Seq((1L, "2024-01-01")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException](Tables.normalizeEventTs(bad))
    assert(e.getMessage.contains("ts"))
    assert(e.getMessage.contains("testdata changed shape"))
  }

  test("normalizeEventTs: NTZ arrival under a non-UTC session zone fails loudly") {
    import spark.implicits._
    // the NTZ→TZ cast reads wall-clock in the SESSION zone; a non-UTC
    // entry point must fail with the pin named, not shift every instant
    val ntz = Seq((1L, 1700000000000000L)).toDF("event_id", "us")
      .select($"event_id", timestamp_micros($"us").cast(TimestampNTZType).as("ts"))
    val saved = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val e = intercept[IllegalStateException](Tables.normalizeEventTs(ntz))
      assert(e.getMessage.contains("TIMESTAMP_NTZ"))
      assert(e.getMessage.contains("America/New_York"))
      assert(e.getMessage.contains("UTC"))
    } finally spark.conf.set("spark.sql.session.timeZone", saved)
    // and back under UTC the same frame normalizes fine
    assert(Tables.normalizeEventTs(ntz).schema("ts").dataType === LongType)
  }

  test("normalizeEventTs: frame without ts passes through untouched") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    assert(Tables.normalizeEventTs(df).schema === df.schema)
  }

  // --- conform: lossless-widening and loud-failure behavior ---------------

  test("spec contract and Tables.conform contract agree (double-entry check)") {
    // compare on simpleString so array nullability flags don't split hairs
    def render(m: Map[String, Map[String, Set[DataType]]]) =
      m.map { case (t, cols) =>
        t -> cols.map { case (c, ts) => c -> ts.map(_.simpleString) } }
    val specSide = render(contract.map { case (t, cols) => t -> cols.toMap })
    val mainSide = render(Tables.engineFacing)
    assert(specSide === mainSide,
      "SchemaCanarySpec's contract copy and Tables.contract diverged — " +
        "update BOTH (that's the double-entry point)")
  }

  test("conform: missing contract column fails loudly, naming it") {
    import spark.implicits._
    val dropped = Seq((1L, "a", "en", "s"))
      .toDF("doc_id", "text", "lang", "source") // n_chars gone
    val e = intercept[IllegalStateException](Tables.conform("documents", dropped))
    assert(e.getMessage.contains("documents.n_chars: MISSING"))
    assert(e.getMessage.contains("testdata changed shape"))
  }

  test("conform: int32-narrowed keys widen losslessly to the long contract") {
    import spark.implicits._
    // a writer narrowing doc_id/n_chars to int32 must not break readers
    val narrowed = Seq((1, "a", "en", "s", 10), (2, "b", "fr", "s", 20))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .select(col("doc_id").cast(IntegerType), col("text"), col("lang"),
        col("source"), col("n_chars").cast(IntegerType))
    val out = Tables.conform("documents", narrowed)
    assert(out.schema("doc_id").dataType === LongType)
    assert(out.schema("n_chars").dataType === LongType)
    assert(out.select("doc_id").as[Long].collect().sorted === Seq(1L, 2L))
  }

  test("conform: duplicated arrived column fails loudly, naming it") {
    import spark.implicits._
    // last-wins map semantics would hide this until an ambiguous-reference
    // error far from the drift site
    val base = Seq((1L, "a", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val duped = base.select(col("doc_id"), col("text"), col("lang"),
      col("source"), col("n_chars"), col("text").as("lang"))
    val e = intercept[IllegalStateException](Tables.conform("documents", duped))
    assert(e.getMessage.contains("documents.lang: DUPLICATED"))
    assert(e.getMessage.contains("testdata changed shape"))
  }

  test("conform: lossy drift fails loudly, naming table and column") {
    import spark.implicits._
    val lossy = Seq((1L, "x")).toDF("doc_id", "lang")
      .withColumn("lang", lit(3.5)) // double where the contract says string
    val e = intercept[IllegalStateException](Tables.conform("documents", lossy))
    assert(e.getMessage.contains("documents.lang"))
    assert(e.getMessage.contains("testdata changed shape"))
  }

  test("conform: extra writer-side columns pass through; matching frames are untouched") {
    import spark.implicits._
    val extra = Seq((1L, "a", "en", "s", 10L, true))
      .toDF("doc_id", "text", "lang", "source", "n_chars", "novel_flag")
    val out = Tables.conform("documents", extra)
    assert(out.columns.contains("novel_flag"))
    // a frame already on contract must come back plan-identical (no casts)
    val clean = Tables.conform("documents",
      extra.drop("novel_flag"))
    assert(clean.queryExecution.analyzed.toString ===
      extra.drop("novel_flag").queryExecution.analyzed.toString)
  }
}
