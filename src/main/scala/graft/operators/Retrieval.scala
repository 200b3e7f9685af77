package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.text.TextFunctions

/** Lexical (sparse) retrieval over the document corpus — the BM25
  * complement to the dense-vector paths in [[Similarity]]: an LLM data
  * pipeline needs both for sourcing, eval-set mining and hard-negative
  * generation.
  *
  * SHAPE — the classic distributed inverted-index plan:
  *   - one corpus scan builds the postings `(doc, term, tf)` via a
  *     map-side-combining count;
  *   - document frequencies and corpus stats (N, total length) derive from
  *     the postings with term-local aggregates;
  *   - the (tiny) query term set joins the postings ON TERM — broadcast, so
  *     the postings never shuffle for the probe;
  *   - per-(query, doc) partial scores sum map-side, and the final top-k
  *     uses the bounded-heap aggregate ([[graft.functions.TopKByScore]]) —
  *     no sort of the scored set.
  * Every arithmetic step is written in the same operation order as the SQL
  * oracle (double ops are not associative; syntactic mirroring is what
  * makes the scores hash-comparable engine-to-engine).
  */
object Retrieval {

  /** Okapi BM25 top-k: for each query (id + text), the k highest-scoring
    * corpus documents. Query terms are the DISTINCT tokens of the query
    * text (query-side tf ignored, the common simplification). Output
    * `[query_id, doc_id, score, rnk]`, rank by (rounded score DESC, doc_id
    * ASC) — ranking on the ROUNDED score keeps the order engine-portable.
    */
  def bm25TopK(
      docs: DataFrame, queries: DataFrame,
      idCol: String, textCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = CacheScope.scoped { scope =>
    bm25Frame(docs, queries, idCol, textCol, k, k1, b, scope.cache)
  }

  /** The un-materialized plan (no scoped cache) — plan-shape tests inspect
    * this; the public entry point wraps it in a cache scope because
    * `pruned` is scanned twice.
    */
  private[graft] def bm25Frame(
      docs: DataFrame, queries: DataFrame,
      idCol: String, textCol: String, k: Int,
      k1: Double, b: Double,
      cacheFn: DataFrame => DataFrame): DataFrame = {
    val tf = docs.select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    // Doc length == token count: a NARROW second corpus scan (size of the
    // token array, no explode/aggregate) rather than re-deriving the whole
    // postings chain — `sum(tf) == size(tokens)` by construction.
    val dl = docs.select(col(idCol).as("id"),
      size(TextFunctions.tokens(col(textCol))).cast(LongType).as("dl"))
      .filter(col("dl") > 0) // token-less docs can't score; keep N = |{docs with terms}| like the postings-derived form
    // One-row corpus stats; exact integers so every engine derives the
    // same doubles (avgdl enters the formula as dl*N/sdl — two exact-int
    // double ops — never as a pre-rounded average).
    val stats = dl.agg(count(lit(1)).as("n"), sum("dl").as("sdl"))
    val qterms = queries.select(col(idCol).as("qid"),
      explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("term"))
    // Postings pruned to query terms BEFORE any stats join — document
    // frequency only needs counting for terms that can score, so no
    // full-vocabulary aggregate or broadcast ever materializes. Cached:
    // scanned once for df counts and once for scoring — without the cache
    // both scans re-run the corpus tokenize+explode+count chain.
    val pruned = cacheFn(
      tf.join(broadcast(qterms.select("term").distinct()), "term"))
    val dfreq = pruned.groupBy("term").agg(count(lit(1)).as("df"))

    val dff = col("df").cast("double")
    val nn = col("n").cast("double")
    val tff = col("tf").cast("double")
    val idf = log(lit(1.0) + (nn - dff + lit(0.5)) / (dff + lit(0.5)))
    val den = tff + lit(k1) * (lit(1.0) - lit(b) +
      lit(b) * col("dl").cast("double") * nn / col("sdl").cast("double"))
    val term = idf * (tff * (lit(k1) + lit(1.0))) / den

    val scored = pruned.join(broadcast(qterms), "term")
      .join(dl, "id")
      .join(broadcast(dfreq.crossJoin(stats)), "term")
      .groupBy("qid", "id")
      .agg(round(sum(term), 6).as("score"))
    scored.groupBy("qid")
      .agg(graft.functions.TopKByScore
        .top_k_by_score(col("score"), col("id"), k).as("tk"))
      .select(col("qid").as("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.id").as("doc_id"),
        col("col.score").as("score"), (col("pos") + 1).cast(LongType).as("rnk"))
  }

  /** Positional phrase search: documents containing the exact consecutive
    * token phrase, with the occurrence count (ALL start positions, so a
    * repeated-word phrase counts overlapping matches). Output
    * `[<idCol>, n_matches]`, matches only.
    *
    * SHAPE — positional-postings intersection, the inverted-index phrase
    * plan: ONE corpus scan produces `(doc, pos, term)` postings pruned to
    * the phrase's term set AT THE SCAN (the `isin` filter sits under the
    * posexplode, so non-phrase terms never leave the generator); the
    * n-term phrase then aligns n posting streams on `(doc, pos - i)` —
    * joins keyed identically, so after the first hash exchange each side
    * co-partitions. Cost scales with the pruned posting lists (corpus
    * frequency of the phrase's terms), never with the corpus token count —
    * the property that makes phrase probes cheap on a 100 TB index. The
    * pruned postings are cached: the chain scans them once per phrase term.
    */
  def phraseMatch(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = CacheScope.scoped { scope =>
    require(phrase.nonEmpty, "empty phrase")
    require(phrase.forall(_.matches("[a-z0-9]+")),
      s"phrase terms must be normalized tokens, got: $phrase")
    val postings = scope.cache(
      docs.select(col(idCol).as("__ph_doc"),
          posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "term")))
        .filter(col("term").isin(phrase.distinct: _*)))
    val aligned = phrase.zipWithIndex.map { case (w, i) =>
      postings.filter(col("term") === w)
        .select(col("__ph_doc"), (col("pos") - i).as("start"))
    }
    aligned.reduce((a, b) => a.join(b, Seq("__ph_doc", "start")))
      .groupBy("__ph_doc").agg(count(lit(1)).as("n_matches"))
      .withColumnRenamed("__ph_doc", idCol)
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) — the standard
    * hybrid-retrieval combiner: each input ranking `[query_id, doc_id,
    * rnk]` contributes `1_000_000 div (kConst + rnk)` micros per listed
    * doc, fused score = the sum over lists, final rank by (score DESC,
    * doc_id ASC). The micro-lattice keeps every score an exact integer —
    * no float association questions, the s09 oracle replays it in BIGINT.
    *
    * SHAPE: union of the (already tiny, top-k-sized) rankings, one
    * map-side-combinable sum per (query, doc), bounded-heap top-k per
    * query — no window, no sort; cost scales with `queries * k * lists`,
    * never the corpus.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, kConst: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "at least one ranking to fuse")
    require(kConst >= 1, s"kConst must be positive, got $kConst")
    val unioned = rankings
      .map(_.select(col("query_id"), col("doc_id"), col("rnk")))
      .reduce(_ unionAll _)
    unioned.groupBy("query_id", "doc_id")
      .agg(sum(expr(s"1000000 div ($kConst + rnk)")).as("rrf_micros"))
      .groupBy("query_id")
      .agg(graft.functions.TopKByScore.top_k_by_score(
        col("rrf_micros").cast("double"), col("doc_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.id").as("doc_id"),
        col("col.score").cast(LongType).as("rrf_micros"),
        (col("pos") + 1).cast(LongType).as("rnk"))
  }
}
