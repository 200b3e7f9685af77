package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL (newline-delimited JSON) corpus ingestion — the format every raw
  * LLM corpus actually arrives in (Common Crawl derivatives, chat dumps,
  * API exports ship as `.jsonl` long before anyone converts to parquet).
  * Two properties make the reader production-shaped rather than a demo:
  *
  *   - **Explicit schema, never inference.** Schema inference is a full
  *     extra pass over 100 TB before the first real byte is processed, and
  *     it samples — a rare field or a late type widening silently changes
  *     the schema between runs. Callers declare the expected schema; the
  *     scan is then a single pass and column pruning still reaches it
  *     (Jackson parses only the requested fields).
  *   - **PERMISSIVE + `_corrupt_record` accounting.** Raw corpora contain
  *     garbage lines (truncated uploads, interleaved logs, encoding
  *     accidents). FAILFAST kills a 1000-executor job on line one of file
  *     99,999; DROPMALFORMED silently loses data with no ledger. PERMISSIVE
  *     parses every well-formed line, NULLs the fields of malformed ones,
  *     and preserves the raw line in `_corrupt_record` — so the pipeline
  *     can both proceed AND report exactly what it skipped (the b03 gate
  *     checks that accounting against the oracle).
  */
object JsonlTables {

  /** The quarantine column malformed lines land in. */
  val CorruptCol = "_corrupt_record"

  /** Write a single-string-column frame as raw lines under
    * `<warehouse>/<name>` (one text file per partition); returns the path.
    * The caller provides fully-formed JSON lines (e.g. `to_json(struct)`)
    * — keeping serialization in the plan means corruption-injection tests
    * and real exports use the same writer.
    */
  def writeLines(lines: DataFrame, name: String): String = {
    require(lines.schema.fields.length == 1 &&
      lines.schema.fields(0).dataType == StringType,
      s"writeLines wants exactly one string column, got ${lines.schema}")
    val base = lines.sparkSession.conf.get("spark.sql.warehouse.dir")
    val path = s"$base/$name"
    lines.write.mode("overwrite").text(path)
    path
  }

  /** Read JSONL at `path` against the DECLARED `schema`, malformed lines
    * preserved raw in [[CorruptCol]] (null for well-formed rows). The
    * returned frame carries `schema`'s fields plus [[CorruptCol]].
    */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"declared schema must not already contain $CorruptCol")
    spark.read
      .schema(StructType(schema.fields :+ StructField(CorruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }
}
