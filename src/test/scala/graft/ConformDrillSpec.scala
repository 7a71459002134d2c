package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Adversarial regen drill for the arrival-conformance layer (Tables.conform).
  *
  * SchemaCanarySpec pins the contract and probes the normalizer on events
  * fixtures, but before this spec only the events.ts drift had been
  * exercised end-to-end by a REAL testdata regen. Here every one of the ten
  * table contracts is driven through the arrived-schema permutations a
  * future regen could produce — column reordered, column dropped, numerics
  * narrowed one type down, keys widened past the contract, a column
  * retyped outright — and each must either conform silently (lossless
  * arrivals) or fail loudly with the drifted table.column named (lossy or
  * missing arrivals). The permutations are DERIVED from the live contract
  * (Tables.engineFacing), so a new table or column added to the contract
  * is drilled automatically.
  */
class ConformDrillSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def raw(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  // after conform, every contract column must carry an engine-facing type
  private def assertOnContract(name: String, df: DataFrame): Unit = {
    val got = df.schema.fields.map(f => f.name -> f.dataType).toMap
    Tables.engineFacing(name).foreach { case (c, tolerated) =>
      // events.ts normalizes THROUGH conform (timestamp arrival → long)
      val want = if (name == "events" && c == "ts") Set[DataType](LongType)
                 else tolerated
      assert(got.contains(c), s"$name.$c lost by conform")
      // compare on simpleString so array nullability flags don't split hairs
      assert(want.exists(_.simpleString == got(c).simpleString),
        s"$name.$c: conform left ${got(c).simpleString}, engine expects " +
          want.map(_.simpleString).mkString(" or "))
    }
  }

  test("reordered arrival: conform passes every table through on-contract") {
    Tables.names.foreach { name =>
      val base = raw(name)
      val reordered = base.select(base.columns.reverse.map(col).toIndexedSeq: _*)
      assertOnContract(name, Tables.conform(name, reordered))
    }
  }

  test("dropped column: conform fails loudly for every table, naming it") {
    Tables.names.foreach { name =>
      val victim = Tables.engineFacing(name).keys.min
      val dropped = raw(name).drop(victim)
      val e = intercept[IllegalStateException](Tables.conform(name, dropped))
      assert(e.getMessage.contains(s"$name.$victim: MISSING"),
        s"$name: drop of $victim not named — got: ${e.getMessage}")
    }
  }

  test("narrowed numeric arrival: conform widens every table back, silently") {
    // a regen that writes int32 keys / float32 measures must not break
    // readers: long→int, int→short, double→float arrivals all widen back
    Tables.names.foreach { name =>
      val base = raw(name)
      val baseTypes = base.schema.fields.map(f => f.name -> f.dataType).toMap
      val narrowed = base.schema.fields.foldLeft(base) { (df, f) =>
        f.dataType match {
          case LongType => df.withColumn(f.name, col(f.name).cast(IntegerType))
          case IntegerType => df.withColumn(f.name, col(f.name).cast(ShortType))
          case DoubleType => df.withColumn(f.name, col(f.name).cast(FloatType))
          case _ => df
        }
      }
      val out = Tables.conform(name, narrowed)
      assertOnContract(name, out)
      // integer VALUES must survive the narrow→widen round trip (sf0.001
      // keys all fit in int32; float measures lose writer precision by
      // nature of the arrival, which is the writer's bug, not conform's)
      val keyCols = Tables.engineFacing(name).collect {
        case (c, ts) if ts == Set[DataType](LongType) &&
          baseTypes.get(c).contains(LongType) && !(name == "events" && c == "ts") => c
      }.toSeq.sorted
      keyCols.headOption.foreach { k =>
        val want = base.select(sum(col(k))).first().getLong(0)
        val got = out.select(sum(col(k))).first().getLong(0)
        assert(got === want, s"$name.$k values corrupted by narrow→widen")
      }
    }
  }

  test("over-widened key arrival: conform fails loudly where the contract is narrower") {
    // int contract columns arriving as int64 CANNOT be silently narrowed —
    // that's the lossy direction and must name the column
    val intCols = Tables.names.flatMap { name =>
      Tables.engineFacing(name).collect {
        case (c, ts) if ts == Set[DataType](IntegerType) => (name, c)
      }.toSeq.sorted.headOption
    }
    assert(intCols.nonEmpty, "drill lost its int-contract columns")
    intCols.foreach { case (name, c) =>
      val widened = raw(name).withColumn(c, col(c).cast(LongType))
      val e = intercept[IllegalStateException](Tables.conform(name, widened))
      assert(e.getMessage.contains(s"$name.$c"),
        s"$name: int64 arrival of $c not named — got: ${e.getMessage}")
      assert(e.getMessage.contains("testdata changed shape"))
    }
  }

  test("retyped column arrival: conform fails loudly for every table, naming it") {
    Tables.names.foreach { name =>
      val victim = Tables.engineFacing(name).keys.min
      val wasString = raw(name).schema(victim).dataType == StringType
      // flip the type class entirely: strings arrive numeric, everything
      // else arrives string — both are lossy, both must be named
      val retyped = raw(name).withColumn(victim,
        if (wasString) lit(3.5) else lit("drifted"))
      val e = intercept[IllegalStateException](Tables.conform(name, retyped))
      assert(e.getMessage.contains(s"$name.$victim"),
        s"$name: retype of $victim not named — got: ${e.getMessage}")
    }
  }
}
