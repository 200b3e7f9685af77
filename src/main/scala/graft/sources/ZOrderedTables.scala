package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton-curve) clustered parquet layout — the multi-column
  * locality layout next to [[BucketedTables]] (hash) and
  * [[PartitionedTables]] (value): interleaving the bits of several scaled
  * key columns gives ONE sort key whose ranges are small hyper-rectangles
  * in key space, so range-partitioning + sorting by it leaves EVERY
  * clustered column with tight per-file and per-row-group min/max spans.
  *
  * Why that matters at 100 TB: parquet keeps column min/max statistics per
  * row group, and the scan-side filter pushdown skips row groups whose
  * span excludes the predicate — but only if the data is clustered so the
  * spans are narrow. A single-column sort gives that for one column;
  * z-order splits the benefit across all interleaved columns (each of d
  * columns keeps ~1/2^(bits_used/d) of the global span per file). With a
  * stats-aware catalog (Delta/Iceberg) the same spans prune whole FILES at
  * planning time; with plain parquet the row-group skip still happens
  * inside every reader task.
  *
  * The z-value arithmetic is deliberately the transparent per-bit fold —
  * `((c >> i) & 1) << (i*d + ci)` summed — not the magic-number spread:
  * [[zValueSql]] emits the exact same formula as engine-portable SQL, which
  * is what lets the b04 gate hash-compare z-bucket aggregates with DuckDB.
  */
object ZOrderedTables {

  /** `c` scaled monotonically into `[0, 2^bits)`:
    * `((c - min) << bits) // (max - min + 1)`. The division runs in the
    * double domain under a `< 2^53` numerator bound: IEEE division of
    * exact integers is correctly rounded, and the true quotient sits at
    * least `1/(max-min+1) >> ulp` away from the next integer, so
    * `floor` reproduces exact integer division — the same value DuckDB's
    * BIGINT `//` computes in the oracle.
    */
  def scale(c: Column, minV: Long, maxV: Long, bits: Int): Column = {
    require(maxV >= minV, s"empty domain [$minV, $maxV]")
    val denom = maxV - minV + 1
    require(denom <= ((1L << 53) >> bits),
      s"domain $denom x 2^$bits exceeds the exact-division bound")
    floor(shiftleft((c.cast(LongType) - lit(minV)), bits) / lit(denom))
      .cast(LongType)
  }

  /** Morton interleave of columns already in `[0, 2^bits)`: bit `i` of
    * column `ci` lands at z-bit `i * d + ci`.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val d = cols.length
    require(d >= 2, "z-order needs at least 2 columns")
    require(bits >= 1 && d * bits <= 62, s"$d cols x $bits bits exceeds a signed long")
    cols.zipWithIndex.flatMap { case (c, ci) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * d + ci)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** DuckDB replay of [[scale]] + [[zValue]] for columns given as
    * `(colExpr, minExpr, maxExpr)` SQL fragments — the same arithmetic
    * generated, not hand-maintained, so the z-bucket oracle can never
    * drift from the plan. Min/max may be scalar-subquery or CTE
    * references; every fragment is re-parenthesized here.
    */
  def zValueSql(cols: Seq[(String, String, String)], bits: Int): String = {
    val d = cols.length
    val scaled = cols.map { case (n, mn, mx) =>
      s"(((($n) - ($mn)) << $bits) // (($mx) - ($mn) + 1))"
    }
    scaled.zipWithIndex.flatMap { case (s, ci) =>
      (0 until bits).map(i => s"((($s >> $i) & 1) << ${i * d + ci})")
    }.mkString(" | ")
  }

  /** Write `df` under `<warehouse>/<name>` as `numFiles` z-clustered
    * parquet files: range-partitioned AND sorted by the z-value of the
    * scaled key columns (`(name, min, max)` each). The z column itself is
    * never materialized into the files — it exists only as the shuffle
    * range key and in-partition sort order; what persists is the tight
    * per-file span of every clustered NATURAL column.
    */
  def writeZOrdered(df: DataFrame, name: String,
      zCols: Seq[(String, Long, Long)], bits: Int, numFiles: Int): String = {
    val base = df.sparkSession.conf.get("spark.sql.warehouse.dir")
    val path = s"$base/$name"
    val z = zValue(zCols.map { case (n, mn, mx) => scale(col(n), mn, mx, bits) }, bits)
    df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
    path
  }

  def readZOrdered(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
