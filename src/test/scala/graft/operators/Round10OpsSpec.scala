package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.sources.JsonlTables

/** Round-10 surface: JSONL ingestion policy, C4 line-level dedup, grouped
  * CMS.
  */
class Round10OpsSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  test("jsonl: well-formed lines parse, malformed lines quarantine raw") {
    val lines = Seq(
      """{"id": 1, "text": "hello"}""",
      """{"id": 2, "text": "esc \" quote"}""",
      """{"id": 3, "text":""",          // truncated mid-object
      """not json at all""",            // garbage
      """{"id": 4, "text": "ok"}""").toDF("line")
    val path = JsonlTables.writeLines(lines, "jsonl_spec_mixed")
    // NOTE: Spark refuses a projection that touches ONLY _corrupt_record
    // straight off a raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) —
    // collect the parsed frame once, assert in memory.
    val rows = JsonlTables.readJsonl(spark, path, docSchema).collect()
    val (bad, good) = rows.partition(r =>
      r.getString(r.fieldIndex(JsonlTables.CorruptCol)) != null)
    assert(good.length == 3)
    // Escapes decode; the quarantined lines survive byte-for-byte.
    assert(good.find(_.getLong(0) == 2).get.getString(1) == "esc \" quote")
    assert(bad.map(_.getString(2)).toSet
      == Set("""{"id": 3, "text":""", "not json at all"))
  }

  test("jsonl: type-mismatched field NULLs the field, not the row (PERMISSIVE)") {
    val lines = Seq("""{"id": "NaN", "text": "typed wrong"}""").toDF("line")
    val path = JsonlTables.writeLines(lines, "jsonl_spec_typed")
    val row = JsonlTables.readJsonl(spark, path, docSchema).collect().head
    assert(row.isNullAt(row.fieldIndex("id")))
    assert(row.getString(row.fieldIndex(JsonlTables.CorruptCol)) != null)
  }

  test("jsonl: declared schema prunes — only requested fields are parsed") {
    val lines = Seq("""{"id": 7, "text": "x", "extra": [1,2,3]}""").toDF("line")
    val path = JsonlTables.writeLines(lines, "jsonl_spec_extra")
    val got = JsonlTables.readJsonl(spark, path, docSchema)
    assert(got.columns.toSeq == Seq("id", "text", JsonlTables.CorruptCol))
    assert(got.filter(col("id") === 7).count() == 1)
  }

  test("c4 line dedup: rules drop boilerplate, keep-first is (doc, line) min") {
    val docs = Seq(
      (1L, "Good long line one.\nshort.\nno punct line here\nGood long line one."),
      (0L, "Good long line one.\nAnother fine line!\nquoted line \"ok\""),
      (2L, "Good long line one.")).toDF("doc_id", "text")
    val got = graft.text.TextFunctions
      .c4LineDedup(docs, "doc_id", "text", minWords = 3,
        requireTerminalPunct = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // "short." fails minWords; "no punct line here" fails the punct rule;
    // "Good long line one." survives ONCE at its smallest (doc, line) =
    // (0, 0) — doc order, not input order, decides the survivor.
    assert(got == Set((0L, 0L), (0L, 1L), (0L, 2L)))
  }

  test("c4 line dedup: punct rule off keeps unpunctuated lines") {
    val docs = Seq((5L, "alpha beta gamma\ndelta epsilon zeta."))
      .toDF("doc_id", "text")
    val got = graft.text.TextFunctions
      .c4LineDedup(docs, "doc_id", "text", minWords = 3,
        requireTerminalPunct = false)
    assert(got.count() == 2)
  }

  test("grouped cms: half-grids merge by + into the full grid; est >= truth") {
    val df = spark.range(2000)
      .selectExpr("CAST(id % 3 AS STRING) AS g", "id % 47 AS k", "id")
    val full = Sketches.cmsGroupedRegisters(df, "g", "k", depth = 4, width = 32)
    val a = Sketches.cmsGroupedRegisters(
      df.filter(col("id") % 2 === 0), "g", "k", depth = 4, width = 32)
    val b = Sketches.cmsGroupedRegisters(
      df.filter(col("id") % 2 === 1), "g", "k", depth = 4, width = 32)
    val merged = a.withColumnRenamed("cnt", "ca")
      .join(b.withColumnRenamed("cnt", "cb"), Seq("g", "row", "col"))
      .select(col("g"), col("row"), col("col"), (col("ca") + col("cb")).as("cnt"))
    assert(merged.count() == 3 * 4 * 32)
    assert(merged.join(full.withColumnRenamed("cnt", "cf"), Seq("g", "row", "col"))
      .filter(col("cnt") =!= col("cf")).count() == 0)
    // Point estimates dominate true counts (the CMS guarantee).
    val truth = df.groupBy("g", "k").agg(count(lit(1)).as("cnt"))
    val est = Sketches.cmsGroupedEstimates(full, truth, "g", "k",
      depth = 4, width = 32)
    assert(est.filter(col("est_cnt") < col("cnt")).count() == 0)
  }

  test("ktruss: incremental == re-enumeration on a random graph (capped + fixpoint)") {
    // 600-edge random multigraph-ish edge list (dupes + canonical flips
    // exercised by construction). The incremental arm must match the
    // from-scratch recount at EVERY cap depth, including deep fixpoint —
    // the invariant that licenses frontier-only decrements.
    val edges = spark.range(600).selectExpr(
      "CAST(xxhash64(id, 11) % 60 AS BIGINT) % 60 AS src",
      "CAST(xxhash64(id, 13) % 60 AS BIGINT) % 60 AS dst")
      .selectExpr("abs(src) AS src", "abs(dst) AS dst")
      .localCheckpoint(true)
    for (cap <- Seq(1, 2, 50); k <- Seq(3, 4, 5)) {
      val inc = graft.algorithms.KTruss.run(edges, k, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val re = graft.algorithms.KTruss.runReenumerate(edges, k, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(inc == re, s"arms diverge at k=$k cap=$cap")
    }
  }

  test("jsonl: writeLines rejects multi-column frames, readJsonl rejects reserved name") {
    intercept[IllegalArgumentException] {
      JsonlTables.writeLines(Seq((1, "a")).toDF("a", "b"), "bad")
    }
    intercept[IllegalArgumentException] {
      JsonlTables.readJsonl(spark, "/tmp/nope", StructType(Seq(
        StructField(JsonlTables.CorruptCol, StringType))))
    }
  }

  test("keep-best dedup: argmax quality wins the cluster, not the min id") {
    // Docs 1 and 2 are near-identical; doc 2 is longer (higher quality
    // via the length term), so keep-best must keep 2 while the min-id
    // rule would keep 1. Doc 9 is unrelated, its own cluster.
    val dupA = "the data pipeline processes documents and the query engine scans tables quickly"
    val docs = Seq(
      (1L, dupA),
      (2L, dupA + " extra details follow"),
      (9L, "completely different content about graphs and vertices and edges here"))
      .toDF("doc_id", "text")
    val kept = Dedup.keepBestNearDuplicates(docs, "doc_id", "text",
      graft.text.TextFunctions.qualityScore(col("text")), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(kept == Map(1L -> 2L, 9L -> 9L), s"got $kept")
    val minId = Dedup.dropNearDuplicates(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(minId == Set(1L, 9L), "min-id rule diverged from its contract")
  }

  test("co-occurrence: weights count shared groups; cap drops and audits") {
    val m = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 2L),
      (40L, 1L), (40L, 2L), (40L, 3L), (40L, 4L), (40L, 5L), // size 5 > cap 4
      (50L, 9L)).toDF("g", "i")
    val pairs = CoOccurrence.projectPairs(m, "g", "i", maxGroupSize = 4, minWeight = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // Group 40 excluded: (1,2) from groups 10/20/30 only; (1,3),(2,3) from 10.
    assert(pairs == Map((1L, 2L) -> 3L, (1L, 3L) -> 1L, (2L, 3L) -> 1L), s"got $pairs")
    val dropped = CoOccurrence.droppedGroups(m, "g", "i", maxGroupSize = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dropped == Set((40L, 5L)))
    // Duplicate membership rows must not inflate weights.
    val dup = m.unionAll(m)
    val pairs2 = CoOccurrence.projectPairs(dup, "g", "i", 4, 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs2 == pairs)
  }

  test("power iteration finds the dominant axis; projection ranks by it") {
    // 20 vectors along e0 (values ±large), 3 along e1 (small): the top
    // eigenvector must align with dimension 0 (component ~±1000, others
    // tiny), and pcaScores must rank the e0-aligned vectors at the
    // extremes.
    val dim = 4
    val vecs = (0 until 20).map(i =>
      (i.toLong, Seq(if (i % 2 == 0) 0.4 else -0.4, 0.01, 0.0, 0.0))) ++
      (20 until 23).map(i => (i.toLong, Seq(0.0, 0.05, 0.01, 0.0)))
    val df = vecs.toDF("vec_id", "embedding")
    val eig = graft.operators.Spectral.topEigenvector(df, "vec_id", "embedding", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // The renormalized max component lands in [1000, 1001] (u div
    // (max|u| div 1000) for the argmax component).
    assert(math.abs(eig(0L)) >= 1000L && math.abs(eig(0L)) <= 1001L,
      s"dominant axis not found: $eig")
    assert((1 until dim).forall(i => math.abs(eig(i.toLong)) < 200), s"got $eig")
    val scores = graft.operators.Spectral.pcaScores(df, "vec_id", "embedding", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // e0-aligned vectors project to ~±400k micros; e1 cluster near zero.
    assert(math.abs(scores(0L)) > 300000L && math.abs(scores(22L)) < 50000L,
      s"got $scores")
    // Opposite-sign e0 vectors land on opposite ends.
    assert(math.signum(scores(0L)) == -math.signum(scores(1L)))
  }

  test("mergeApply: upsert/insert/delete semantics, loud on ambiguity") {
    val base = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("k", "v", "tag")
    val changes = Seq(
      (2L, "upsert", 99L, "B"),     // update
      (4L, "upsert", 40L, "d"),     // insert
      (3L, "delete", 0L, ""),       // delete (payload ignored)
      (7L, "delete", 0L, ""))       // delete of absent key: no-op
      .toDF("k", "op", "v", "tag")
    val got = MergeApply.mergeApply(base, changes, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set((1L, 10L, "a"), (2L, 99L, "B"), (4L, 40L, "d")))
    // Two changes for one key: loud failure, not a silent winner.
    val dup = Seq((2L, "upsert", 1L, "x"), (2L, "upsert", 2L, "y"))
      .toDF("k", "op", "v", "tag")
    val e1 = intercept[Exception] {
      MergeApply.mergeApply(base, dup, "k").collect()
    }
    assert(e1.getMessage.contains("multiple changes"), e1.getMessage)
    // Unknown op: loud failure.
    val bad = Seq((2L, "replace", 1L, "x")).toDF("k", "op", "v", "tag")
    val e2 = intercept[Exception] {
      MergeApply.mergeApply(base, bad, "k").collect()
    }
    assert(e2.getMessage.contains("unknown op"), e2.getMessage)
    // NULL op: would slip through both downstream guards — loud failure.
    val nullOp = Seq((2L, null.asInstanceOf[String], 1L, "x"))
      .toDF("k", "op", "v", "tag")
    val e3 = intercept[Exception] {
      MergeApply.mergeApply(base, nullOp, "k").collect()
    }
    assert(e3.getMessage.contains("NULL op"), e3.getMessage)
    // Schema mismatch rejected before any job runs.
    intercept[IllegalArgumentException] {
      MergeApply.mergeApply(base, Seq((1L, "upsert")).toDF("k", "op"), "k")
    }
  }

  test("gram matrix: hand-computed sums, map-side partials, symmetry") {
    import graft.functions.GramMatrixAgg.gram_matrix
    val rows = Seq(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)).toDF("vq")
    val g = rows.repartition(2).agg(gram_matrix(col("vq")))
      .head().getSeq[Long](0)
    // G = [1,2,3]^T[1,2,3] + [4,5,6]^T[4,5,6]
    val want = for (i <- 0 until 3; j <- 0 until 3)
      yield (Seq(1L, 2L, 3L)(i) * Seq(1L, 2L, 3L)(j)
        + Seq(4L, 5L, 6L)(i) * Seq(4L, 5L, 6L)(j))
    assert(g == want, s"got $g want $want")
    for (i <- 0 until 3; j <- 0 until 3)
      assert(g(i * 3 + j) == g(j * 3 + i), "not symmetric")
    val plan = rows.agg(gram_matrix(col("vq"))).queryExecution.executedPlan.toString
    assert(plan.contains("partial_gram_matrix"),
      s"gram not partially aggregated map-side:\n$plan")
    intercept[org.apache.spark.SparkException] {
      Seq(Seq(1L, 2L), Seq(1L, 2L, 3L)).toDF("vq")
        .coalesce(1).agg(gram_matrix(col("vq"))).head()
    }
  }

  test("interleave keys: every prefix of the key order is proportionally mixed") {
    // 300 docs: 150 a, 100 b, 50 c. In ascending interleave_key order,
    // any prefix of length n must hold within ceil(n*share)+1 of each
    // category — the stationary-mixture property.
    val docs = (0 until 300).map { i =>
      val cat = if (i < 150) "a" else if (i < 250) "b" else "c"
      (i.toLong, cat)
    }.toDF("doc_id", "cat")
    val ordered = Sampling.mixtureInterleaveKeys(docs, "cat", "doc_id")
      .orderBy("interleave_key", "cat")
      .collect().map(_.getString(0))
    val share = Map("a" -> 0.5, "b" -> 1.0 / 3, "c" -> 1.0 / 6)
    for (n <- Seq(30, 60, 120, 240)) {
      val prefix = ordered.take(n).groupBy(identity).view.mapValues(_.length)
      share.foreach { case (c, s) =>
        val got = prefix.getOrElse(c, 0)
        assert(math.abs(got - n * s) <= 2,
          s"prefix $n has $got of '$c', expected ~${n * s}")
      }
    }
    // Rerun-identical: the key is a pure function of (cat sizes, hash).
    val again = Sampling.mixtureInterleaveKeys(docs, "cat", "doc_id")
      .orderBy("interleave_key", "cat").collect().map(_.getString(0))
    assert(ordered.toSeq == again.toSeq)
  }

  test("salted join == plain join for any salt count; exchange keys on (key, salt)") {
    // 10k fact rows, one hot key (60% of rows), 100-row dim.
    val fact = spark.range(10000).selectExpr(
      "CASE WHEN id % 10 < 6 THEN 7 ELSE id % 100 END AS fk",
      "id AS payload")
    val dim = spark.range(100).selectExpr("id AS dk", "id * 11 AS attr")
    val plain = fact.join(dim, col("fk") === col("dk"))
      .selectExpr("fk", "payload", "attr")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for (nSalts <- Seq(2, 8, 32)) {
      val salted = SkewJoin.saltedJoin(fact, "fk", dim, "dk",
        saltBy = Seq("payload"), nSalts = nSalts)
        .selectExpr("fk", "payload", "attr")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(salted == plain, s"salted($nSalts) diverges from plain join")
    }
    // The join must key on (key, salt): the hot key's rows then span
    // nSalts hash-partitions instead of one.
    val plan = SkewJoin.saltedJoin(fact, "fk", dim, "dk", Seq("payload"), 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt column missing from plan:\n$plan")
    assert(plan.contains("Generate explode") || plan.contains("explode"),
      s"dim replication missing:\n$plan")
  }

  test("grouped sketches: a NULL group is a real slice, not an all-zero grid") {
    val df = Seq((null.asInstanceOf[String], 5L), ("a", 5L), (null.asInstanceOf[String], 9L))
      .toDF("g", "v")
    val hist = Sketches.histGroupedRegisters(df, "g", "v", 0L, 2L, 8)
      .filter(col("g").isNull)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(hist(2L) == 1L && hist(4L) == 1L && hist.values.sum == 2L,
      s"NULL slice lost its counts: $hist")
    val cms = Sketches.cmsGroupedRegisters(df, "g", "v", depth = 2, width = 16)
      .filter(col("g").isNull)
      .agg(sum("cnt")).head().getLong(0)
    assert(cms == 4L, s"NULL slice CMS mass: $cms (want 2 rows x 2 depth)")
    val hll = Sketches.hllGroupedRegisters(df, "g", "v", p = 4)
      .filter(col("g").isNull).filter(col("max_rank") > 0).count()
    assert(hll == 2L, s"NULL slice HLL registers: $hll")
  }

  test("grouped CMS estimates: unseen-group probes answer 0, never vanish") {
    val regs = Sketches.cmsGroupedRegisters(
      Seq(("a", 1L), ("a", 1L)).toDF("g", "k"), "g", "k", depth = 2, width = 16)
    val probes = Seq(("a", 1L), ("zz", 1L)).toDF("g", "k")
    val est = Sketches.cmsGroupedEstimates(regs, probes, "g", "k", 2, 16)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(est == Map("a" -> 2L, "zz" -> 0L), s"got $est")
  }

  test("grouped histogram: each slice equals the global sketch on that slice") {
    val df = spark.range(5000)
      .selectExpr("CAST(id % 3 AS STRING) AS g", "(id * 37) % 9999 AS v")
    val grouped = Sketches.histGroupedRegisters(df, "g", "v", 0L, 200L, 32)
    for (gv <- Seq("0", "1", "2")) {
      val slice = Sketches.histRegisters(
        df.filter(col("g") === gv), "v", 0L, 200L, 32)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = grouped.filter(col("g") === gv)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(got == slice, s"slice $gv diverges")
    }
    // Merge law: two grouped halves sum to the whole, per (group, bin).
    val h1 = Sketches.histGroupedRegisters(df.filter("id % 2 = 0"), "g", "v", 0L, 200L, 32)
    val h2 = Sketches.histGroupedRegisters(df.filter("id % 2 = 1"), "g", "v", 0L, 200L, 32)
    val merged = h1.unionAll(h2).groupBy("g", "bin").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = grouped.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("wav fingerprint: equal audio => equal profile, junk => NULL, digits sane") {
    import graft.multimodal.Multimodal
    val media = Multimodal.synthesizeWavMedia(
      Seq(3L, 7L, 3L + 65536L).toDF("id"), "id", nSamples = 480)
    val fps = Multimodal.wavEnergyFingerprint(media, frames = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // The synth sample formula is mod-65536 in id: 3 and 65539 are
    // byte-identical WAVs and must collide; profiles are 8 x 4 digits.
    assert(fps(3L) == fps(3L + 65536L))
    assert(fps.values.forall(f => f != null && f.length == 32 && f.forall(_.isDigit)))
    // Junk payload (not a RIFF container) -> NULL, row preserved.
    import org.apache.spark.sql.Row
    val junk = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(99L, "not audio".getBytes, Row("audio/wav", 9L, "x")))),
      Multimodal.mediaSchema)
    val j = Multimodal.wavEnergyFingerprint(junk, frames = 8).collect()
    assert(j.length == 1 && j.head.isNullAt(1))
  }

  test("semantic dedup: planted near-dups drop, keep-lowest-id, cells bound pairs") {
    // 4 well-separated axis directions, 5 copies each (tiny jitter on a
    // second axis keeps vectors distinct while cosine stays ~1). Every
    // group must collapse to its lowest id; distinct directions survive.
    // Copy-major ids (id = copy*10 + group) so the k lowest ids — the
    // deterministic centroid init — are the 4 DISTINCT directions; every
    // vector then assigns to its own group's cell.
    val dim = 8
    val vecs = for (g <- 0 until 4; c <- 0 until 5) yield {
      val v = Array.fill(dim)(0.0)
      v(g) = 1.0
      v((g + 4) % dim) = 0.01 * c
      (c * 10L + g, v.toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(df, "vec_id", "embedding", k = 4, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(out.size == 20)
    val kept = out.filter(_._2).keys.toSet
    assert(kept == Set(0L, 1L, 2L, 3L), s"wrong survivors: $kept")
  }

  test("phrase match: consecutive tokens only, overlapping starts counted") {
    val docs = Seq(
      (1L, "the quick brown fox"),          // 1 match of "quick brown"
      (2L, "quick, BROWN! quick brown"),    // 2 (case/punct-normalized)
      (3L, "brown quick"),                  // reversed: 0
      (4L, "quick x brown"),                // gap: 0
      (5L, "")).toDF("doc_id", "text")
    val got = Retrieval.phraseMatch(docs, "doc_id", "text", Seq("quick", "brown"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
    // Repeated-word phrase: "table table table" has starts at 0 AND 1.
    val rep = Seq((9L, "table table table")).toDF("doc_id", "text")
    val overlap = Retrieval.phraseMatch(rep, "doc_id", "text", Seq("table", "table"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(overlap == Map(9L -> 2L))
    intercept[IllegalArgumentException] {
      Retrieval.phraseMatch(docs, "doc_id", "text", Seq("Not Normalized"))
    }
  }

  test("bloom: zero false negatives, FP rate in the analytic ballpark") {
    val dim = spark.range(0, 2000).toDF("k")
    val words = RuntimeFilter.bloomBitsetWords(dim, "k", mBits = 1 << 16, kHashes = 3)
    // Every inserted key must probe true.
    val members = RuntimeFilter.bloomPrune(dim, "k", words, 1 << 16, 3).count()
    assert(members == 2000L, s"false negatives: $members of 2000 inserted keys probe true")
    // Non-members: (1 - e^(-kn/m))^k ~= 0.07% at n=2000, m=65536, k=3.
    // 20k disjoint probes -> expect ~15 FPs; 20x headroom on the bound.
    val nonMembers = spark.range(1000000, 1020000).toDF("k")
    val fps = RuntimeFilter.bloomPrune(nonMembers, "k", words, 1 << 16, 3).count()
    assert(fps < 300, s"FP rate off the charts: $fps of 20000 non-member probes hit")
  }

  test("bloom semi join == plain left-semi, including empty-dimension edge") {
    val fact = spark.range(0, 5000).selectExpr("id AS fk", "id % 7 AS tag")
    val dim = spark.range(0, 5000).selectExpr("id * 3 AS dk").filter("dk % 2 = 1")
    val got = RuntimeFilter.bloomSemiJoin(fact, "fk", dim, "dk", 1 << 16, 3)
      .collect().map(_.getLong(0)).toSet
    val want = fact.join(dim, col("fk") === col("dk"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    assert(got == want)
    val empty = RuntimeFilter.bloomSemiJoin(
      fact, "fk", dim.filter("dk < 0"), "dk", 1 << 16, 3)
    assert(empty.count() == 0)
  }
}
