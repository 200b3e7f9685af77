package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Plan-time Column builders for the two codegen-discipline idioms the
  * vector operators share — one audited copy of each, because the three
  * hand-rolled argmin folds had already drifted (pqCodes dropped the
  * arity-1 guard KMeans and IVF carry) when this was factored out.
  *
  * Background (measured on the 1 M-vector PQ/IVF probes, SCALE_RECORD.md):
  * higher-order functions (`transform`, `array_sort` with a struct
  * comparator, `aggregate`, `zip_with`) evaluate INTERPRETED per element —
  * harmless on query-sized rows, a ~15× tax on corpus-row hot paths. The
  * replacements below build plain expression trees at PLAN time (the
  * Scala lambda runs once, per column, not per row), so the projection
  * stays inside whole-stage codegen.
  */
private[graft] object ColumnKernels {

  /** `least` of already-materialized columns, arity-1 safe (Spark's Least
    * rejects a single argument).
    */
  def leastOf(cols: Seq[Column]): Column =
    if (cols.length == 1) cols.head else least(cols: _*)

  /** `greatest` of already-materialized columns, arity-1 safe. */
  def greatestOf(cols: Seq[Column]): Column =
    if (cols.length == 1) cols.head else greatest(cols: _*)

  /** Index of the FIRST column equal to `target` — the linear first-match
    * when-chain that, with `target = leastOf/greatestOf(cols)`, forms the
    * codegen argmin/argmax with the smallest-index tie-break. `cols` must
    * be COLUMN REFERENCES into a projection that already materialized the
    * values (each candidate evaluated once), not raw expressions — inline
    * expressions would be re-evaluated per comparison.
    */
  def firstMatchIndex(cols: Seq[Column], target: Column): Column =
    if (cols.length == 1) lit(0)
    else cols.init.zipWithIndex
      .foldLeft(when(lit(false), -1)) { case (acc, (c, i)) =>
        acc.when(c === target, i)
      }.otherwise(cols.length - 1)

  /** One `(band, bh)` struct per band as `explode` of a plain expression
    * array — the LSH banding idiom shared by MinHash/SimHash/hyperplane
    * bucketing. `bh` builds each band's bucket-hash EXPRESSION at plan
    * time.
    */
  def bandStructs(bands: Int)(bh: Int => Column): Column =
    explode(array((0 until bands).map { b =>
      struct(lit(b).as("band"), bh(b).as("bh"))
    }.toIndexedSeq: _*))
}
