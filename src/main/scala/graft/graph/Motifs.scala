package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GraphFrames-style motif (structural pattern) search — the query surface
  * the reference engine lacks entirely (its graph API stops at whole-graph
  * algorithms) and the natural next ask of a curation pipeline: "customers
  * who reviewed the same part", "accounts forming a 2-hop ring". Pattern
  * grammar (the GraphFrames `find()` subset that covers its documented
  * examples):
  *
  *  - `(a)-[e]->(b)`        directed edge term; names bind columns
  *  - `(a)-[]->(b)`         anonymous edge (matched, not returned)
  *  - `(a)-[e]->()`         anonymous vertex (matched, not returned)
  *  - `!(a)-[]->(b)`        NEGATED term: no a->b edge exists
  *  - terms separated by `;`
  *
  * Output: one column per NAMED vertex (struct of the vertex row) and per
  * named edge (struct of the edge row), duplicate-named morphisms allowed
  * exactly as in GraphFrames (`(a)-[]->(b); (b)-[]->(a)` returns both
  * orientations; apply `filter("a.id < b.id")` for unordered pairs).
  *
  * EXECUTION (Spark-first, no bespoke engine): each positive term is the
  * edge table under per-term aliases; terms chain with equi-joins on the
  * shared vertex variables, so Catalyst plans the whole motif as ordinary
  * shuffle/broadcast hash joins with full pushdown — at 100 TB a motif is
  * exactly as expensive as the self-join plan a user would hand-write,
  * and AQE re-plans the skewed stars. Negated terms become LEFT ANTI
  * joins (requiring both endpoints already bound by positive terms);
  * vertex-attribute structs attach LAST, so the join spine moves only
  * `(src, dst)` id pairs, never vertex payloads.
  */
object Motifs {

  private[graph] final case class Term(
      src: String, edge: String, dst: String, negated: Boolean)

  private val TermRe =
    """(!?)\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)?\s*\)\s*-\s*\[\s*([A-Za-z_][A-Za-z0-9_]*)?\s*\]\s*->\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)?\s*\)""".r

  private[graph] def parse(pattern: String): Seq[Term] = {
    val terms = pattern.split(";").map(_.trim).filter(_.nonEmpty).toSeq
    require(terms.nonEmpty, s"empty motif pattern: '$pattern'")
    var anon = 0
    def fresh(): String = { anon += 1; s"__anon_$anon" }
    terms.map {
      case TermRe(neg, src, edge, dst) =>
        // The __anon_ prefix is reserved for generator-produced fresh
        // names: a user variable spelled that way would silently alias an
        // anonymous slot (joined to an unrelated term, dropped from the
        // output) instead of erroring.
        Seq(src, edge, dst).filter(_ != null).foreach(v =>
          require(!v.startsWith("__anon_"),
            s"variable names may not start with __anon_ (reserved): '$pattern'"))
        val t = Term(
          Option(src).getOrElse(fresh()),
          Option(edge).getOrElse(fresh()),
          Option(dst).getOrElse(fresh()),
          neg == "!")
        require(!(t.negated && edge != null),
          s"negated term must use an anonymous edge: '$pattern'")
        t
      case bad => throw new IllegalArgumentException(
        s"unparseable motif term '$bad' in '$pattern'")
    }
  }

  private def isNamed(v: String): Boolean = !v.startsWith("__anon_")

  /** See object scaladoc. `vertices`/`edges` are the graph tables with the
    * canonical `id` / `src`,`dst` long columns.
    *
    * `edgePredicates` maps a NAMED edge variable to a predicate over the
    * edge table's own columns (e.g. `"e2" -> col("weight") > 500`),
    * applied to that term's edge scan BEFORE the join spine — a selective
    * motif then prunes at the scan (parquet pushdown and all) instead of
    * filtering assembled paths, which at 100 TB is the difference between
    * joining a sliver and joining everything. Semantically identical to
    * `find(p).filter(col("e2.weight") > 500)`; Catalyst cannot derive
    * that rewrite itself because the struct is built before the join.
    */
  def find(vertices: DataFrame, edges: DataFrame, pattern: String,
      edgePredicates: Map[String, Column] = Map.empty): DataFrame = {
    val terms = parse(pattern)
    val (negative, positive) = terms.partition(_.negated)
    require(positive.nonEmpty, s"motif needs at least one positive term: '$pattern'")
    val edgeNames = positive.map(_.edge).filter(isNamed)
    require(edgeNames.distinct.size == edgeNames.size,
      s"edge variable reused across terms: '$pattern'")
    // A vertex and an edge sharing a name would emit two columns both
    // named that way (vertex struct + edge struct), making downstream
    // col("x") ambiguous — GraphFrames rejects the reuse too.
    val vertexNames = terms.flatMap(t => Seq(t.src, t.dst)).filter(isNamed)
    val nameClash = vertexNames.toSet.intersect(edgeNames.toSet)
    require(nameClash.isEmpty,
      s"name(s) used for both a vertex and an edge: ${nameClash.mkString(", ")} in '$pattern'")
    val unknownPreds = edgePredicates.keySet.diff(edgeNames.toSet)
    require(unknownPreds.isEmpty,
      s"edgePredicates for variable(s) not naming a positive-term edge: " +
        s"${unknownPreds.mkString(", ")} in '$pattern'")

    // Join spine over id columns __v_<var>; named edges ride as structs.
    // A term's predicate filters its edge scan before anything joins.
    def termFrame(t: Term): DataFrame = {
      val te = edgePredicates.get(t.edge).map(edges.filter).getOrElse(edges)
      val base = te.select(
        col(GraphFrame.SRC).as(s"__v_${t.src}"),
        col(GraphFrame.DST).as(s"__v_${t.dst}"),
        struct(te.columns.map(col).toIndexedSeq: _*).as(s"__e_${t.edge}"))
      if (t.src == t.dst) // self-loop term: both endpoints one variable
        te.filter(col(GraphFrame.SRC) === col(GraphFrame.DST)).select(
          col(GraphFrame.SRC).as(s"__v_${t.src}"),
          struct(te.columns.map(col).toIndexedSeq: _*).as(s"__e_${t.edge}"))
      else base
    }
    var spine = termFrame(positive.head)
    positive.tail.foreach { t =>
      val tf = termFrame(t)
      val shared = spine.columns.toSet
        .intersect(tf.columns.toSet).filter(_.startsWith("__v_")).toSeq
      spine =
        if (shared.isEmpty) spine.crossJoin(tf) // disconnected components
        else spine.join(tf, shared)
    }
    negative.foreach { t =>
      val (sc, dc) = (s"__v_${t.src}", s"__v_${t.dst}")
      require(spine.columns.contains(sc) && spine.columns.contains(dc),
        s"negated term endpoints must be bound by positive terms: '$pattern'")
      spine =
        if (t.src == t.dst) // !(a)-[]->(a): no self-loop on a
          spine.join(
            edges.filter(col(GraphFrame.SRC) === col(GraphFrame.DST))
              .select(col(GraphFrame.SRC).as(sc)),
            Seq(sc), "left_anti")
        else spine.join(
          edges.select(col(GraphFrame.SRC).as(sc), col(GraphFrame.DST).as(dc)),
          Seq(sc, dc), "left_anti")
    }
    // Attach vertex structs for named vertices (joins on the id spine only).
    val namedVerts = terms.flatMap(t => Seq(t.src, t.dst))
      .filter(isNamed).distinct
      .filter(v => spine.columns.contains(s"__v_$v"))
    val vStruct = vertices.select(col(GraphFrame.ID).as("__vm_id"),
      struct(vertices.columns.map(col).toIndexedSeq: _*).as("__vm_struct"))
    namedVerts.foreach { v =>
      spine = spine
        .join(vStruct.select(col("__vm_id"), col("__vm_struct").as(v)),
          col(s"__v_$v") === col("__vm_id"))
        .drop("__vm_id")
    }
    val outCols =
      namedVerts.map(col) ++
        positive.map(_.edge).filter(isNamed).map(e => col(s"__e_$e").as(e))
    require(outCols.nonEmpty,
      s"motif must name at least one vertex or edge: '$pattern'")
    spine.select(outCols: _*)
  }
}
