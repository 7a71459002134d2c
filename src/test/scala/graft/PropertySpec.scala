package graft

import graft.pipeline.Lottery
import graft.sources.Upsert
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY §5.2 item 2): load idempotence, per-day
  * probability mass, gap-day consistency, number normalization round-trip —
  * over generated crawler-shaped batches (scalacheck Gen, fixed seeds for
  * reproducibility; the scalatest bridge artifact is not in the offline
  * cache, so sampling is driven manually).
  */
class PropertySpec extends SparkSpec {

  /** Run `body` over `n` deterministic samples of `gen`. */
  def forAllSamples[A](gen: Gen[A], n: Int = 5)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.apply(Gen.Parameters.default.withSize(40), Seed(i.toLong))
        .getOrElse(fail(s"gen failed at sample $i")))
    }

  import org.apache.spark.sql.functions._

  private val genDay: Gen[String] = Gen.chooseNum(1, 28).map(d => f"$d%02d-03-2025")
  private val genNum: Gen[String] = Gen.chooseNum(0, 99).map(n => f"$n%02d")
  private val genRow: Gen[(String, String, String, String)] = for {
    d <- genDay; n <- genNum
  } yield ("Giải Bảy", n, d, "2025-03-01T19:05:00.000Z")

  private def stagingOf(rows: List[(String, String, String, String)]) = {
    import spark.implicits._
    rows.toDF("prize", "number_value", "full_date", "created_at")
      .withColumn("load_timestamp", current_timestamp())
  }

  test("per-day probability mass sums to 1 (X11 invariant)") {
    forAllSamples(Gen.nonEmptyListOf(genRow)) { rows =>
      val tr = Lottery.transform(stagingOf(rows))
      val fact = Lottery.factPrize(tr, Lottery.dimNumber(tr))
      // each day's Σ occurrence_count/total_draws = 1 exactly
      val perDay = fact.groupBy(col("date_key"))
        .agg(sum(col("occurrence_count").cast("double") / col("total_draws")).as("mass"))
        .collect()
      perDay.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9,
        s"day ${r.get(0)} mass ${r.getDouble(1)}"))
    }
  }

  test("days_since_last is positive and consistent with sorted dates (W2)") {
    forAllSamples(Gen.nonEmptyListOf(genRow)) { rows =>
      val tr = Lottery.transform(stagingOf(rows))
      val fact = Lottery.factPrize(tr, Lottery.dimNumber(tr))
      val bad = fact.filter(col("days_since_last").isNotNull &&
        col("days_since_last") <= 0).count()
      assert(bad === 0)
    }
  }

  test("upsert idempotence: load(load(t,b),b) == load(t,b) (A1-A3)") {
    forAllSamples(Gen.nonEmptyListOf(genRow)) { rows =>
      val tr = Lottery.transform(stagingOf(rows))
      val dim = Lottery.dimDate(tr)
      val once = Upsert.appendNew(dim, dim, Seq("date_key"))
      val twice = Upsert.appendNew(once, dim, Seq("date_key"))
      assert(twice.count() === dim.count())
    }
  }

  test("SCD2 merge: invariants hold and re-applying the same batch is a fixed point") {
    import spark.implicits._
    val dim = Seq(
      (1L, "A", "1990-01-01", null.asInstanceOf[String], true),
      (2L, "B", "1990-01-01", null.asInstanceOf[String], true),
      (3L, "C", "1985-01-01", "1990-01-01", false), // history passes through
      (3L, "C2", "1990-01-01", null.asInstanceOf[String], true)
    ).toDF("k", "seg", "valid_from", "valid_to", "is_current")
    val batch = Seq((1L, "A9"), (2L, "B"), (4L, "D")).toDF("k", "seg")

    val once = Upsert.scd2Merge(dim, batch, Seq("k"), Seq("seg"), "2000-01-01")
      .cache()
    // changed key 1: closed old + new current; unchanged 2: untouched;
    // absent 3: untouched (history + current); new 4: one current row.
    assert(once.count() === 6)
    // exactly one current version per key
    assert(once.filter($"is_current").groupBy($"k").count()
      .filter($"count" =!= 1).count() === 0)
    // every non-current row has a valid_to; every current row has none
    assert(once.filter($"is_current" && $"valid_to".isNotNull).count() === 0)
    assert(once.filter(!$"is_current" && $"valid_to".isNull).count() === 0)
    assert(once.filter($"k" === 1 && !$"is_current")
      .select($"valid_to").as[String].head() === "2000-01-01")

    // fixed point: the batch's attrs now ARE the current attrs
    val twice = Upsert.scd2Merge(once, batch, Seq("k"), Seq("seg"), "2010-01-01")
    assert(twice.count() === once.count())
    assert(twice.filter(!$"is_current" && $"valid_to" === "2010-01-01").count() === 0)
  }

  test("number normalization round-trip (X10): parse(normalize(x)) == parse(x)") {
    forAllSamples(Gen.listOfN(30, genNum)) { nums =>
      import spark.implicits._
      val df = nums.toDF("raw")
      val normalized = df.select(
        expr("try_cast(raw AS int)").as("direct"),
        expr("try_cast(coalesce(cast(try_cast(raw AS int) AS string), trim(raw)) AS int)")
          .as("viaNorm"))
      assert(normalized.filter(col("direct") =!= col("viaNorm")).count() === 0)
    }
  }

  // --- round-4 rewrites: randomized equivalence with the naive forms ------

  private val genDoc: Gen[(Long, String)] = for {
    id <- Gen.chooseNum(0L, 5000L)
    // tiny vocabulary + 0-12 tokens: maximizes shared shingles, repeats,
    // and sub-k docs — the edge cases the native expressions special-case
    toks <- Gen.listOfN(12, Gen.oneOf("aa", "bb", "cc", "dd", "ee"))
    n <- Gen.chooseNum(0, 12)
  } yield (id, toks.take(n).mkString(" "))

  test("packShards == naive per-lang running-sum window on random corpora") {
    forAllSamples(Gen.listOfN(60, for {
      id <- Gen.chooseNum(0L, 2000L); lang <- Gen.oneOf("en", "de", "es")
      tok <- Gen.chooseNum(1, 400)
    } yield (id, lang, tok)), n = 4) { rows =>
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val base = rows.distinctBy(_._1).toDF("doc_id", "lang", "n_tok")
      val w = Window.partitionBy($"lang").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val naive = base.withColumn("cum", sum($"n_tok").over(w))
        .select($"doc_id", $"lang", $"n_tok",
          floor(($"cum" - $"n_tok") / 100).cast("long").as("shard_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      // small span forces many buckets → the offset path actually runs
      val two = graft.ext.TextAnalysis.packShards(base, budget = 100, span = 16L)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(two === naive)
    }
  }

  test("segment dedup conservation: kept segments == distinct segments (random corpora)") {
    // sum over docs of (n_seg - n_dup_seg) must equal the number of
    // DISTINCT segments in the corpus — every distinct segment is kept
    // exactly once, every other occurrence is a dup. A tiny 3-word
    // vocabulary forces heavy segment collisions.
    forAllSamples(Gen.listOfN(25, for {
      id <- Gen.chooseNum(0L, 500L)
      toks <- Gen.listOfN(9, Gen.oneOf("aa", "bb", "cc"))
    } yield (id, toks.mkString(" "))), n = 4) { rows =>
      import spark.implicits._
      val docs = rows.distinctBy(_._1).map { case (id, t) => (id, t, "en") }
        .toDF("doc_id", "text", "lang")
      val stats = graft.ext.TextAnalysis.segmentDedupStats(docs, segLen = 3)
        .collect()
      val kept = stats.map(r => r.getLong(1) - r.getLong(2)).sum
      val distinctSegs = docs
        .select(explode(expr(
          "transform(sequence(0, (size(split(trim(text), '\\\\s+'))+2) div 3 - 1), " +
            "i -> concat_ws(' ', slice(split(trim(text), '\\\\s+'), i*3+1, 3)))")).as("seg"))
        .distinct().count()
      assert(kept === distinctSegs)
    }
  }

  test("native MinHash/SimHash == aggregated forms on random repeat-heavy docs") {
    forAllSamples(Gen.listOfN(30, genDoc), n = 4) { docsList =>
      import spark.implicits._
      val docs = docsList.distinctBy(_._1).toDF("doc_id", "text")
      def sigs(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      assert(sigs(graft.ext.Dedup.minhash(docs, k = 3, numHashes = 8)) ===
        sigs(graft.ext.Dedup.minhashAgg(docs, k = 3, numHashes = 8)))
      assert(sigs(graft.ext.Dedup.simhashChunks(docs, chunks = 4, bitsPerChunk = 7,
          shingleK = 2)) ===
        sigs(graft.ext.Dedup.simhashChunksAgg(docs, chunks = 4, bitsPerChunk = 7,
          shingleK = 2)))
    }
  }

  test("containment dominates Jaccard on every candidate pair (random corpora)") {
    import spark.implicits._
    val genDoc: Gen[String] = Gen.listOfN(30,
      Gen.oneOf("alpha","beta","gamma","delta","eps","zeta","eta","theta"))
      .map(_.mkString(" "))
    forAllSamples(Gen.listOfN(12, genDoc), n = 3) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      // threshNum=0 on both → same candidate pair set, all pairs surface
      val jac = graft.ext.Dedup.jaccardPairs(docs, threshNum = 0)
        .select($"doc_i", $"doc_j", $"jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val cont = graft.ext.Dedup.containmentPairs(docs, threshNum = 0)
        .select($"doc_i", $"doc_j", $"containment").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(jac.keySet === cont.keySet)
      jac.foreach { case (k, j) =>
        val c = cont(k)
        assert(c >= j - 1e-12 && c <= 1.0 + 1e-12,
          s"pair $k: containment $c should dominate jaccard $j and stay <= 1")
      }
    }
  }

  test("incremental admission is idempotent: re-offering admitted docs admits nothing") {
    import spark.implicits._
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val day1 = graft.ext.CorpusPipeline.curateIncremental(docs)
    val admittedIds = day1.select($"doc_id").as[Long].collect().toSet
    assert(admittedIds.nonEmpty)
    // day 2: corpus = old corpus + the admitted batch (relabel admitted
    // ids below the split), batch = the same admitted docs re-offered
    val corpus2 = docs.filter($"doc_id" < 400)
      .unionByName(docs.filter($"doc_id".isin(admittedIds.toSeq: _*))
        .withColumn("doc_id", -$"doc_id"))  // relabeled: still < 400
    val reoffer = docs.filter($"doc_id".isin(admittedIds.toSeq: _*))
    val day2 = graft.ext.CorpusPipeline.curateIncremental(
      corpus2.unionByName(reoffer), splitId = 400L)
    assert(day2.count() === 0L,
      "re-offered duplicates of already-admitted docs must all be rejected")
  }

  test("t_lm_perplexity bit formula: length(bin(a div b))-1 == floor(log2(a/b)) for a >= b >= 1") {
    // the exact-integer surprisal rests on two identities: floor-log2 of
    // a rational >= 1 equals floor-log2 of its integer quotient, and
    // floor-log2 of a positive integer is its bit length minus one —
    // pin the composed SQL formula against an exact rational reference
    // (2^k <= a/b < 2^(k+1) by shifted-integer comparison; a double log
    // reference would itself flake at power-of-two boundaries)
    import spark.implicits._
    forAllSamples(Gen.listOfN(200, for {
      b <- Gen.chooseNum(1L, 1000000L)
      m <- Gen.chooseNum(1L, 5000L)
      r <- Gen.chooseNum(0L, b - 1)
    } yield (b * m + r, b)), n = 3) { pairs =>
      val got = pairs.toDF("a", "b")
        .select((length(expr("bin(a div b)")) - lit(1)).as("bits"))
        .as[Int].collect()
      val want = pairs.map { case (a, b) =>
        Iterator.from(0).find(k => (BigInt(b) << (k + 1)) > BigInt(a)).get
      }
      got.zip(want).zip(pairs).foreach { case ((g, w), (a, b)) =>
        assert(g === w, s"bits mismatch at a=$a b=$b")
      }
    }
  }

  /** Two result sets with identical schemas are row-multiset-equal
    * (collect-side compare — exceptAll over two plans sharing a parent
    * trips Spark's self-join attribute dedup). */
  private def sameRows(a: org.apache.spark.sql.DataFrame,
                       b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.schema.map(f => (f.name, f.dataType)) ===
      b.schema.map(f => (f.name, f.dataType)), "schema mismatch")
    val ka = a.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val kb = b.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val onlyA = ka.diff(kb)
    val onlyB = kb.diff(ka)
    assert(onlyA.isEmpty && onlyB.isEmpty,
      s"mismatch:\nA-only ${onlyA.take(5).mkString("; ")}\n" +
        s"B-only ${onlyB.take(5).mkString("; ")}")
  }

  test("bandedTrailingFrame == single-window RANGE frame on random band-edge inputs (w10b)") {
    // cents land ON and AROUND band floors (off ∈ {0, 1, W-1, ...}) with
    // heavy (priority, cents) ties — the threshold/floor cases the fixed
    // oracle dataset reaches only by luck
    val W = 1000L
    forAllSamples(Gen.listOfN(80, for {
      key <- Gen.chooseNum(1L, 1000000L)
      pr <- Gen.oneOf("A", "B")
      band <- Gen.chooseNum(0, 6)
      off <- Gen.oneOf(0L, 1L, 2L, W - 1, W / 2, W / 3)
    } yield (key, pr, band * W + off)), n = 4) { rows =>
      import spark.implicits._
      val o = rows.toDF("o_orderkey", "o_orderpriority", "cents")
        .dropDuplicates("o_orderkey")
      sameRows(operators.Windows.bandedTrailingFrame(o, W),
        operators.Windows.windowedTrailingFrame(o, W))
      // the generalized ord≠val path (w11b's shape): order by cents,
      // sum an INDEPENDENT value column — against the plain window
      val withVal = o.withColumn("v", col("o_orderkey") % 97)
      val wTime = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderpriority")).orderBy(col("cents"))
        .rangeBetween(-W, 0L)
      val want = withVal.select(col("o_orderkey"), col("o_orderpriority"),
        col("cents"), count(lit(1)).over(wTime).as("frame_count"),
        sum(col("v")).over(wTime).as("frame_sum"))
      sameRows(
        operators.Windows.bandedTrailingFrameBy(withVal, W, "cents", "v"),
        want)
    }
  }

  test("rankFamilyFromCounts == single-window rank family on random tied inputs (w8b)") {
    // few distinct values → heavy rank ties; single-row segments are
    // frequent (they exposed the prk 0/0 edge the operator now guards)
    forAllSamples(Gen.listOfN(40, for {
      key <- Gen.chooseNum(1L, 1000000L)
      seg <- Gen.oneOf("S1", "S2", "S3", "S4")
      bal <- Gen.chooseNum(0, 4)
    } yield (key, seg, bal.toDouble)), n = 4) { rows =>
      import spark.implicits._
      val c = rows.toDF("c_custkey", "c_mktsegment", "c_acctbal")
        .dropDuplicates("c_custkey")
      sameRows(operators.Windows.rankFamilyFromCounts(c),
        operators.Windows.windowedRankFamily(c))
    }
  }

  test("changeset round-trip: apply(old, changeset(old, new)) == new (random snapshots)") {
    // the K10 law on random keyed snapshots: keys drawn from a small
    // domain so inserts/deletes/updates/unchanged all occur; values from
    // a tiny domain so some shared keys are identical (the dropped-
    // unchanged case is exercised, not just I/U/D)
    import spark.implicits._
    val genSnap: Gen[List[(Long, Long, String)]] = Gen.listOfN(30, for {
      k <- Gen.chooseNum(0L, 19L)
      v <- Gen.chooseNum(0L, 3L)
      s <- Gen.oneOf("a", "b")
    } yield (k, v, s))
    forAllSamples(Gen.zip(genSnap, genSnap)) { case (oldRows, newRows) =>
      val oldSnap = oldRows.toDF("k", "v", "s").dropDuplicates("k")
      val newSnap = newRows.toDF("k", "v", "s").dropDuplicates("k")
      val cs = Upsert.changeset(oldSnap, newSnap, "k")
      // round-trip law
      assert(rows(Upsert.applyChangeset(oldSnap, cs, "k")) === rows(newSnap))
      // the changeset is a DELTA: no row for an unchanged key
      val unchanged = rows(oldSnap.intersect(newSnap)).map(_.head)
      val csKeys = rows(cs.select("k")).map(_.head)
      assert(unchanged.forall(k => !csKeys.contains(k)),
        "changeset emitted a row for an unchanged key")
    }
  }
}
