package graft.algorithms

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.graph.GraphFrame

/** Config-invariance matrix: the DISTRIBUTED algorithm paths must produce
  * bit-identical results with AQE disabled and with a different (odd,
  * non-power-of-two) shuffle-partition count. This guards the declared-
  * partitioning checkpoint machinery — whose layout contract quietly
  * depends on session config — against wrong-results drift: a false
  * partitioning declaration elides exchanges rows actually need, and the
  * first symptom would be exactly a config-dependent answer.
  *
  * MIS is excluded on purpose: its `rand(seed)` draws are per-partition
  * seeded, so a different partition count yields a DIFFERENT (but valid)
  * independent set — its gate is the invariant suite + the deterministic
  * replay oracle, not cross-config identity.
  */
class ConfigMatrixSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private def graph: GraphFrame = {
    val rnd = new scala.util.Random(11)
    val n = 200
    // Subcritical random edges (many components) + a planted 5-clique
    // (non-trivial core) — both precondition assertions hold structurally.
    val sparse = Seq.fill(150)((1L + rnd.nextInt(n), 1L + rnd.nextInt(n)))
      .map { case (a, b) => (a.toLong, b.toLong) }
    val clique = for (i <- 1L to 5L; j <- 1L to 5L if i < j) yield (i, j)
    GraphFrame((1L to n.toLong).toDF("id"),
      (sparse ++ clique).toDF("src", "dst"))
  }

  private def runAll(): Map[String, Map[Long, Long]] = {
    val g = graph
    // Select columns by NAME: the Pregel result frames order state columns
    // before the id, and a positional read would build a collision-prone
    // (state -> id) map.
    Map(
      "wcc" -> g.connectedComponents.smallGraphThreshold(0).run()
        .components.select("id", "component")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
      "kcore" -> g.kCore.smallGraphThreshold(0).run()
        .vertices.select("id", "kcore")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
      "lpa" -> g.labelPropagation.maxIterations(4).smallGraphThreshold(0).run()
        .vertices.select("id", "label")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.get(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  // Round-4b pipeline ops whose engine-exactness claims depend on nothing
  // but integer arithmetic + deterministic hashes: k-means assignments and
  // BM25 rounded scores must survive the same config matrix.
  private def runPipeline(): Map[String, Seq[Product]] = {
    val pts = (1L to 60L).map(i =>
      (i, Seq((i % 7).toFloat, (i % 11).toFloat, (i % 3).toFloat))).toDF("id", "vec")
    val docs = (1L to 40L).map(i =>
      (i, s"w${i % 5} w${i % 7} w${i % 3} w${i % 5} common")).toDF("doc_id", "text")
    Map(
      "kmeans" -> graft.operators.KMeans.fitAssign(pts, "id", "vec", k = 4, nIter = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted,
      "bm25" -> graft.operators.Retrieval.bm25TopK(
          docs, docs.filter($"doc_id" <= 2), "doc_id", "text", k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSeq.sortBy(t => (t._1, t._4)))
  }

  test("kmeans assignments and bm25 rankings are config-invariant") {
    val baseline = runPipeline()
    withConf("spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "5") {
      assert(runPipeline() === baseline, "AQE-off + partitions=5 changed results")
    }
  }

  test("relational suite: plans and results invariant under the session-wide bucketed-scan ordering flag") {
    // readBucketed sets spark.sql.legacy.bucketedTableScan.outputOrdering
    // for the whole session (documented in BucketedTables) — so after any
    // b01-style query, every later query in the same session planner runs
    // with it. The flag only affects scans of bucketed TABLES (these
    // queries read plain parquet), so neither the physical plan nor the
    // result of any relational query may move.
    val sf = "/root/testdata/sf0.001"
    val names = Seq("q01_groupby_agg", "q02_filter_project", "q03_join_inner_agg",
      "q04_join_left_agg", "q05_join_anti", "q06_cross_normalize", "q07_union_distinct",
      "q08_theta_join", "q09_window_sessionize", "q10_window_topk",
      "q11_json_extract", "q12_rollup", "q13_percentiles")
    def snap(): Map[String, (String, Seq[String])] = names.map { n =>
      val df = graft.SparkEntry.queries(n)(spark, sf)
      // Expression ids (#123) and plan_id tags differ per planning pass;
      // normalize so only structural plan changes can fail the assertion.
      val plan = df.queryExecution.executedPlan.toString
        .replaceAll("#\\d+", "#").replaceAll("plan_id=\\d+", "plan_id=")
      n -> (plan, df.collect().map(_.toString).sorted.toSeq)
    }.toMap
    val before = snap()
    withConf("spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true") {
      val after = snap()
      names.foreach { n =>
        assert(after(n)._1 === before(n)._1, s"$n: physical plan moved under the flag")
        assert(after(n)._2 === before(n)._2, s"$n: results moved under the flag")
      }
    }
  }

  test("distributed WCC/kcore/LPA results are invariant under AQE-off and odd partition counts") {
    val baseline = runAll()
    assert(baseline("wcc").values.toSet.size > 1, "graph should have several components")
    assert(baseline("kcore").values.max >= 2, "graph should have a non-trivial core")

    withConf("spark.sql.adaptive.enabled" -> "false") {
      assert(runAll() === baseline, "AQE-off changed results")
    }
    withConf("spark.sql.shuffle.partitions" -> "7") {
      assert(runAll() === baseline, "shuffle.partitions=7 changed results")
    }
    withConf("spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "5") {
      assert(runAll() === baseline, "AQE-off + partitions=5 changed results")
    }
  }

  // Round-8..10 surface: grouped sketches (integer register grids), the
  // as-of join (declared-partitioning mapPartitions pass), MERGE (anti +
  // union + dedup), and both SCC arms must survive the same matrix — these
  // are exactly the operators whose plans lean on partitioning/ordering
  // contracts a config change could silently break.
  private def runLateRounds(): Map[String, Seq[String]] = {
    val sf = "/root/testdata/sf0.001"
    Seq("q17c_cms_grouped", "q17d_cms_grouped_est", "q17e_hist_grouped",
        "q17f_hist_grouped_q", "q17_hll_grouped", "q17b_hll_grouped_est",
        "q20_asof_join", "q24_merge_apply", "g23_scc", "g23b_scc_dist",
        // round-11 surface: motifs, BFS paths, PQ (+rerank), corpus
        // minhash (+resemblance), container metadata, language consistency.
        "g25_motif_2hop", "g25b_motif_negated", "g26_bfs_paths",
        "s10_pq_codes", "s11_pq_adc", "s12_pq_rerank",
        "d15_minhash_union", "d16_corpus_resemblance",
        "m09_mp4_meta", "m10_png_meta", "t17_mixed_language",
        // round-12 surface: IVF-PQ, trained-PQ codes, resemblance matrix,
        // predicate-pushdown motif, MP4 sample tables.
        "s13_ivfpq", "s14_pq_trained_codes", "d17_resemblance_matrix",
        "g25c_motif_pred", "m11_mp4_stbl", "m12_mp4_samples",
        "m13_mp4_chunked", "s15_ivfpq_trained",
        // round-13 surface: real MP4 frame decode, substring-span dedup.
        "m14_mp4_frame_decode", "d18_substring_spans", "t18_html_extract",
        // round-14 surface: filtered IVF-PQ (index-side predicate),
        // streaming HTML extraction, streaming filtered ANN.
        "s16_ivfpq_filtered", "st15_stream_html_extract",
        "st16_stream_filtered_ann",
        // round-15 surface: sequence packing (two-level prefix sum whose
        // window/base-join layout leans on the shard partitioning) and
        // incremental IVF-PQ add (frozen-book delta encode + union), and
        // the streaming twins of both (per-shard state + finalize;
        // per-micro-batch frozen-book index ingest).
        "p08_sequence_pack", "s17_ivfpq_add", "s18_ivfpq_upsert",
        "st17_stream_seq_pack", "st18_stream_index_add", "t19_pii_redact",
        "st19_stream_pii_redact",
        // binary quantization: the broadcast Hamming scan + bounded-heap
        // ranking, and the shortlist-then-exact-rerank composition.
        "s19_binary_hamming", "s19b_binary_rerank",
        // negative sampling: sharded rank window + rank equi-join.
        "p09_negative_pairs",
        // URL canonicalization + canon-keyed dedup aggregate, and its
        // streaming first-seen twin (order-free state + drain finalize).
        "t20_url_canon", "d19_url_dedup", "st20_stream_url_dedup",
        // JPEG marker-segment walk (m10's twin for JPEG).
        "m15_jpeg_meta",
        // Katz: the per-round aggregateMessages join + left-join update.
        "g27_katz",
        // pivot/unpivot: the two-level pivotfirst aggregate + melt.
        "q26_pivot", "q26b_unpivot",
        // binned interval join: bucket equi-join + exact refine.
        "q27_interval_join",
        // value-based RANGE window frame (r16: the chunk-parallel form —
        // chunk routing + carry filter must survive the matrix); native
        // session_window merge.
        "q28_trailing_window", "q29_session_window",
        // round-16 surface: durable IVF-PQ persist/reload + bucket-pruned
        // serving scan, delete (left_anti over the artifact), and the
        // TTL first-seen stream (watermark lattice + eager-close +
        // final-timeout-batch semantics must not move under config).
        "s20_ivfpq_persist", "s21_ivfpq_remove",
        "st21_stream_firstseen_ttl",
        // durable append: save -> table-append -> reload -> pruned search.
        "s22_ivfpq_table_add",
        // compaction: staging rewrite + catalog swap must move bytes only.
        "s23_ivfpq_compact",
        // epoch shuffle: sharded rank assembly == the global row_number.
        "p10_epoch_shuffle",
        // recall eval: two top-k chains + the (query, neighbor) join.
        "s24_ann_recall",
        // semantic decon: cross-set banded LSH + verify + aggregate.
        "d20_semantic_decon",
        // restart resume: two queries, one checkpoint, one answer.
        "st22_stream_restart",
        // EXIF: the APP1 TIFF walk (endianness, offsets, sub-IFD).
        "m16_exif_meta",
        // grouping sets (Expand + aggregate) and NFC normalization
        // (native codegen expression over a synthesized variant lattice).
        "q30_grouping_sets", "t21_nfc_normalize",
        // nProbe auto-tune: the swept recall curve + first-meeting mark.
        "s25_ivfpq_tune",
        // streaming serve off the persisted table (stream-static join
        // against the reloaded bucketed artifact scan).
        "st23_stream_table_ann",
        // schema evolution: mergeSchema union read + NULL lattice.
        "b08_schema_evolution")
      .map { n =>
        n -> graft.SparkEntry.queries(n)(spark, sf)
          .collect().map(_.toString).sorted.toSeq
      }.toMap
  }

  test("grouped sketches, as-of join, MERGE, and SCC are config-invariant") {
    val baseline = runLateRounds()
    assert(baseline.values.forall(_.nonEmpty), "all queries must return rows")
    withConf("spark.sql.adaptive.enabled" -> "false") {
      assert(runLateRounds() === baseline, "AQE-off changed results")
    }
    withConf("spark.sql.shuffle.partitions" -> "7") {
      assert(runLateRounds() === baseline, "shuffle.partitions=7 changed results")
    }
    withConf("spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "5",
        "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true") {
      assert(runLateRounds() === baseline,
        "AQE-off + partitions=5 + bucketed-ordering flag changed results")
    }
  }
}
