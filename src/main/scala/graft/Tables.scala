package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the driver-generated testdata tables (TESTDATA.md) plus
  * column helpers shared by the query inventory.
  *
  * Scale posture: every reader is a plain parquet scan — Catalyst pushes
  * filters/projections into the scan, so callers never pre-materialize.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    conform(name, spark.read.parquet(s"$dir/$name.parquet"))

  // --- arrival conformance ------------------------------------------------
  // r7 lost its whole streaming tier to a silent writer-side type change
  // (events.ts NANOS → timestamp[us]). The general lesson for an engine
  // fed by external parquet at 100 TB: the ENGINE owns its column types.
  // Every reader therefore conforms the arrived schema to the engine-
  // facing contract below — lossless widenings (int → long, float →
  // double) are applied silently, the ts encodings are normalized, and
  // anything lossy or unknown fails loudly with the drifted column named
  // (SchemaCanarySpec pins both behaviors). Today's testdata already
  // matches the contract, so conform() is a no-op in every current plan.

  /** Engine-facing column type target. */
  private sealed trait Target
  private final case class Fixed(dt: DataType) extends Target
  private case object AnyTimestamp extends Target // TIMESTAMP or NTZ, as-is
  private case object NanosLong extends Target // long nanos via normalizeEventTs

  private val contract: Map[String, Map[String, Target]] = Map(
    "region" -> Map("r_regionkey" -> Fixed(IntegerType), "r_name" -> Fixed(StringType)),
    "nation" -> Map("n_nationkey" -> Fixed(IntegerType), "n_name" -> Fixed(StringType),
      "n_regionkey" -> Fixed(IntegerType)),
    "customer" -> Map("c_custkey" -> Fixed(LongType), "c_name" -> Fixed(StringType),
      "c_nationkey" -> Fixed(IntegerType), "c_acctbal" -> Fixed(DoubleType),
      "c_mktsegment" -> Fixed(StringType)),
    "supplier" -> Map("s_suppkey" -> Fixed(LongType), "s_name" -> Fixed(StringType),
      "s_nationkey" -> Fixed(IntegerType), "s_acctbal" -> Fixed(DoubleType)),
    "part" -> Map("p_partkey" -> Fixed(LongType), "p_name" -> Fixed(StringType),
      "p_brand" -> Fixed(StringType), "p_type" -> Fixed(StringType),
      "p_size" -> Fixed(IntegerType), "p_retailprice" -> Fixed(DoubleType)),
    "orders" -> Map("o_orderkey" -> Fixed(LongType), "o_custkey" -> Fixed(LongType),
      "o_orderstatus" -> Fixed(StringType), "o_totalprice" -> Fixed(DoubleType),
      "o_orderdate" -> AnyTimestamp, "o_orderpriority" -> Fixed(StringType)),
    "lineitem" -> Map("l_orderkey" -> Fixed(LongType), "l_partkey" -> Fixed(LongType),
      "l_suppkey" -> Fixed(LongType), "l_linenumber" -> Fixed(IntegerType),
      "l_quantity" -> Fixed(DoubleType), "l_extendedprice" -> Fixed(DoubleType),
      "l_discount" -> Fixed(DoubleType), "l_tax" -> Fixed(DoubleType),
      "l_returnflag" -> Fixed(StringType), "l_linestatus" -> Fixed(StringType),
      "l_shipdate" -> AnyTimestamp),
    "events" -> Map("event_id" -> Fixed(LongType), "ts" -> NanosLong,
      "user_id" -> Fixed(LongType), "event_type" -> Fixed(StringType),
      "value" -> Fixed(DoubleType), "props" -> Fixed(StringType)),
    "documents" -> Map("doc_id" -> Fixed(LongType), "text" -> Fixed(StringType),
      "lang" -> Fixed(StringType), "source" -> Fixed(StringType),
      "n_chars" -> Fixed(LongType)),
    "embeddings" -> Map("vec_id" -> Fixed(LongType),
      "embedding" -> Fixed(ArrayType(FloatType)), "label" -> Fixed(IntegerType)))

  /** Canary-facing view of the contract: the tolerated engine-facing types
    * per column AFTER normalization. SchemaCanarySpec keeps its own literal
    * copy (double-entry bookkeeping) and asserts agreement with this view,
    * so an edit to either side that forgets the other fails a named test
    * instead of silently drifting. */
  private[graft] def engineFacing: Map[String, Map[String, Set[DataType]]] =
    contract.map { case (t, cols) =>
      t -> cols.map { case (c, tgt) =>
        c -> (tgt match {
          case Fixed(dt) => Set(dt)
          case AnyTimestamp => Set[DataType](TimestampType, TimestampNTZType)
          case NanosLong => Set[DataType](LongType)
        })
      }
    }

  /** Arrived type can be widened to the target without loss. */
  private def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (ByteType | ShortType | IntegerType, LongType) => true
    case (ByteType | ShortType, IntegerType) => true
    case (FloatType, DoubleType) => true
    case _ => false
  }

  /** Conform an arrived frame to `name`'s engine-facing contract: pass
    * matching columns through untouched, apply lossless widenings,
    * normalize timestamp encodings, and fail loudly (naming the column)
    * on lossy or unknown drift. Unknown EXTRA columns pass through — new
    * writer-side columns must not break existing readers. */
  def conform(name: String, df: DataFrame): DataFrame = {
    val targets = contract.getOrElse(name, Map.empty)
    if (targets.isEmpty) return df
    def want(t: Target): String = t match {
      case Fixed(dt) => dt.simpleString
      case AnyTimestamp => "timestamp"
      case NanosLong => "long nanos (or a timestamp encoding)"
    }
    val arrived = df.schema.fields.map(f => f.name -> f.dataType).toMap
    // every drift problem reported at once — a regen that drops one column
    // and narrows another must not need two rounds of diagnosis
    val missing = targets.keys.toSeq.sorted.collect {
      case c if !arrived.contains(c) =>
        s"$name.$c: MISSING (engine expects ${want(targets(c))}; arrived " +
          s"columns: ${df.schema.fieldNames.mkString(",")})"
    }
    // a writer emitting the same column twice would pass a last-wins map
    // check and surface later as an ambiguous-reference error far from the
    // drift site — catch it here, named
    val duplicated = df.schema.fieldNames.groupBy(identity).toSeq.collect {
      case (c, occ) if occ.length > 1 =>
        s"$name.$c: DUPLICATED — arrived ${occ.length} times (downstream " +
          "references would be ambiguous)"
    }.sorted
    var lossy = List.empty[String]
    val casts = df.schema.fields.flatMap { f =>
      targets.get(f.name).flatMap { t =>
        (t, f.dataType) match {
          case (Fixed(dt), a) if a == dt => None
          case (Fixed(ArrayType(FloatType, _)), ArrayType(FloatType, _)) => None
          case (Fixed(dt), a) if widens(a, dt) =>
            Some(f.name -> col(f.name).cast(dt))
          case (AnyTimestamp, TimestampType | TimestampNTZType) => None
          case (NanosLong, _) => None // handled by normalizeEventTs below
          case (tgt, a) =>
            lossy ::= s"$name.${f.name} arrived as ${a.simpleString} — " +
              s"engine expects ${want(tgt)}"
            None
        }
      }
    }
    val problems = missing ++ duplicated ++ lossy.reverse
    if (problems.nonEmpty) throw new IllegalStateException(
      s"testdata changed shape:\n" + problems.mkString("\n"))
    val widened = casts.foldLeft(df) { case (d, (c, e)) => d.withColumn(c, e) }
    if (name == "events") normalizeEventTs(widened) else widened
  }

  /** Loud guard for code whose arithmetic is only correct under a UTC
    * session time zone (naive-timestamp normalization, epoch-micros band
    * keys over wall-clock timestamps): a DST session zone would shift or
    * warp values SILENTLY — the exact drift class the conform layer
    * exists to catch. Callers name what breaks in `what`. */
  def requireUtc(spark: SparkSession, what: String): Unit = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    val isUtc = try {
      java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC
    } catch { case _: Exception => false }
    if (!isUtc) throw new IllegalStateException(
      s"$what, but spark.sql.session.timeZone=$tz — pin the session time " +
        "zone to UTC in the entry point")
  }

  /** Engine-facing `events` contract: `ts` is Long nanos since epoch.
    *
    * The writer's physical type has drifted across testdata generations —
    * parquet TIMESTAMP(NANOS) (read as Long under
    * `spark.sql.legacy.parquet.nanosAsLong`) through `timestamp[us]`
    * (read as TIMESTAMP or TIMESTAMP_NTZ depending on isAdjustedToUTC).
    * A 100 TB pipeline ingesting third-party parquet cannot assume one
    * physical timestamp encoding, so the reader dispatches on the arrived
    * schema and normalizes — downstream operators (sessionization windows,
    * as-of joins, cohort grids) all do exact integer-nanos arithmetic and
    * never see the drift. The NTZ branch interprets wall-clock in the
    * session time zone, which every graft entry point pins to UTC — the
    * same convention DuckDB's `epoch_ns` applies to naive timestamps, so
    * the oracles stay bit-equal.
    *
    * (The reference survives its own schema drift only by accident of
    * stringly-typed staging — SURVEY §1.2, StagingDW Util.java:11-19 vs
    * transform_staging LotteryTransform.java:113; here it's by design.) */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) | None => df // already nanos (or no ts column)
      case Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case Some(TimestampNTZType) =>
        // the NTZ→TZ cast interprets wall-clock in the SESSION time zone;
        // every graft entry point pins UTC, but a future entry point that
        // forgot the pin would silently shift every ts by the local offset
        // — the exact drift class this layer exists to prevent. Fail loudly
        // instead of normalizing to garbage.
        requireUtc(df.sparkSession,
          "events.ts arrived as TIMESTAMP_NTZ — naive wall-clock can only " +
            "be normalized under UTC")
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case Some(other) =>
        throw new IllegalStateException(
          s"events.ts arrived as unsupported type $other — expected " +
            "LongType (nanos), TIMESTAMP, or TIMESTAMP_NTZ; testdata changed shape")
    }

  // --- oracle-parity numeric helpers -------------------------------------
  // Double sums are order-dependent; a distributed Spark sum and DuckDB's
  // serial sum would differ in the last bits and break hash comparison.
  // So money/rate aggregates quantize to the fixed-point grid first and sum
  // EXACTLY (order-independent), then emit double — same value the oracle's
  // CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) produces.
  //
  // Implementation: fixed-point two-long decomposition, NOT sum(decimal).
  // Spark's decimal sum is ~5x slower than a codegen'd long sum (measured:
  // q1's four money sums 1.43s decimal vs 0.44s long at sf0.1), but one
  // scaled long overflows at ~1e7 rows/group for 6-decimal money. Instead:
  // quantize q = floor(x*10^s + 0.5) once, then sum the integer part
  // (q div 10^s) and the fractional part (q mod 10^s) in separate longs.
  // Both sums stay within 2^63 up to ~1e13 rows/group at money magnitudes
  // (hi: 9.2e18 / 1e6 per row; lo: 9.2e18 / 10^s per row) — safe at 100 TB,
  // exact by the truncated-division identity q = hi*10^s + lo.
  //
  // IMPORTANT: the quantization scale must be >= the expression's intrinsic
  // decimal precision (sum of its factors' scales). Testdata money/rate
  // columns are 2-decimal values + binary noise, so a 3-factor product is
  // 6-decimal: quantizing below intrinsic scale lands on exact .5 grid
  // points where engines' rounding modes diverge; at the intrinsic scale
  // values sit near integer grid points and both engines agree.

  /** Order-independent sum of a double column, emitted as double.
    *
    * CONSTRAINT (canary-probed): input doubles must not land EXACTLY on the
    * half grid at the quantization scale (x*10^s fractional part == 0.5
    * bit-exact). There `floor(x*p + 0.5)` rounds half toward +inf while the
    * oracle's CAST(... AS DECIMAL) rounds half away from zero — negative
    * half-grid values would diverge by one ulp of the grid. 2-decimal
    * testdata sits within ~1e-10 of the integer grid, so the half grid is
    * unreachable; SchemaCanarySpec probes every double column so a regen
    * with >2 fractional digits fails there, named, not as a scattered
    * fuzz hash mismatch. */
  def dsum(c: Column, scale: Int = 2): Column = {
    val p = math.pow(10, scale)
    val q = floor(c * p + 0.5).cast("long")
    val lo = q % p.toLong
    val hi = ((q - lo) / p.toLong).cast("long") // exact: q-lo is a multiple of 10^s, |q| << 2^53
    // recombine hi*10^s + lo in double (exact while the scaled total stays
    // below 2^53), then ONE division — the same single rounding the
    // oracle's CAST(exact-decimal-sum AS DOUBLE) performs → bit-equal.
    (sum(hi).cast("double") * p + sum(lo).cast("double")) / p
  }

  /** Order-independent mean of a double column, emitted as double. */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(lit(1))

  /** Spread an under-partitioned source across all cores before a heavy
    * map stage (regex/tokenize gates, vector encode/assignment — ~1-2k
    * ops per row, where partition count IS the parallelism ceiling). A
    * single-file parquet table keeps its one partition through every
    * map-only op, serializing the scan; the guard is the generalization
    * of the minhash/simhash builders' unconditional repartition —
    * conditional, so it is a NO-OP on any real many-file corpus and adds
    * a round-robin exchange only where the alternative is running one
    * core. Measured: the ×64 PQ encode is 1.8 s spread vs 37 s on the
    * inherited single partition (graft.EncodeProbe; PERF.md §ANN). */
  def spread(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

}
