package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JSONL (newline-delimited JSON) ingest — THE interchange format
  * LLM training corpora actually ship in (one JSON object per line:
  * text + nested metadata; RedPajama/Dolma/FineWeb all publish this
  * shape). Two faces:
  *
  *   - [[docs]] reads real `.jsonl`/`.jsonl.gz` files through Spark's
  *     native partitioned json scan with an EXPLICIT schema (never
  *     inference — on 100 TB a schema-inference pass is a full extra
  *     read of the corpus, and drifting inferred types break
  *     downstream operators silently);
  *   - [[parse]] parses a jsonl LINE COLUMN (the shape `binaryShards`
  *     → line-split or a Kafka stream delivers) via `from_json` —
  *     codegen-friendly, null-on-malformed (a corrupt line must drop,
  *     never kill a 1000-executor job).
  *
  * Parsed fields: `json_ok` (the line parsed), `id`, `text`,
  * `lang`/`source`/`score` (nested metadata object), `n_tags`/`tag0`
  * (array field — missing array → null, the optional-field lane).
  * JSON escape semantics (`\"`, `\\`, `\/`, `\uXXXX`, `\t`, `\n`) are
  * the spec's — both engines' parsers must agree byte-for-byte on the
  * decoded text, which is exactly what the driver row hash-checks.
  */
object Jsonl {

  /** The parse schema (explicit — see scaladoc). */
  val SchemaDdl: String =
    "id BIGINT, text STRING, " +
      "meta STRUCT<lang: STRING, source: STRING, score: BIGINT>, " +
      "tags ARRAY<STRING>"

  /** JSON escape-sequence plant appended inside the synthesized text
    * field (the literal BYTES of the escaped form — quote, backslash,
    * solidus, é, tab): both engines must decode it identically,
    * making the escape semantics observable at the gate. Shared with
    * the oracle verbatim.
    */
  val EscapePlant: String = " \\\"q\\\" \\\\ \\/ \\u00e9 tab\\there"

  /** What [[EscapePlant]] decodes to (spec-side expectation). */
  val EscapePlantDecoded: String = " \"q\" \\ / é tab\there"

  /** Deterministic JSONL corpus from the documents table — the wire
    * shape, with the lanes a real feed exhibits: a JSON-null metadata
    * field (every 7th doc), a MISSING optional array field (every
    * 11th), and a malformed line (every 13th — truncated mid-string;
    * must parse to null, not error). Lane precedence: malformed wins.
    * Pure projection; the oracle rebuilds the same bytes from the
    * same arithmetic and parses them with ITS OWN json machinery —
    * the hash match proves two independent JSON parsers agree on
    * every decoded field.
    */
  def synthLines(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    val metaLang = when(d % 7 === 0, lit("null"))
      .otherwise(concat(lit("\""), col("lang"), lit("\"")))
    val tagsField = when(d % 11 === 0, lit(""))
      .otherwise(concat(lit(", \"tags\": [\"s"),
        pmod(d, lit(5L)).cast("string"), lit("\", \"all\"]")))
    val good = concat(
      lit("{\"id\": "), d.cast("string"),
      lit(", \"text\": \""), col("text"), lit(EscapePlant), lit("\""),
      lit(", \"meta\": {\"lang\": "), metaLang,
      lit(", \"source\": \""), col("source"),
      lit("\", \"score\": "), pmod(d, lit(97L)).cast("string"), lit("}"),
      tagsField, lit("}"))
    val bad = concat(lit("{\"id\": "), d.cast("string"),
      lit(", \"text\": \"truncated"))
    docs.select(d, when(d % 13 === 0, bad).otherwise(good).as("line"))
  }

  /** Parse a jsonl line column; see the object scaladoc. */
  def parse(df: DataFrame, line: Column): DataFrame = {
    // PERMISSIVE from_json yields a struct with null fields (not a
    // null struct) on malformed input — the corrupt-record column is
    // the reliable parse-failed signal
    val opts = new java.util.HashMap[String, String]()
    opts.put("columnNameOfCorruptRecord", "__corrupt")
    opts.put("mode", "PERMISSIVE")
    val p = from_json(line, s"$SchemaDdl, __corrupt STRING", opts)
    df.withColumn("__p", p)
      .select(col("doc_id"),
        col("__p.__corrupt").isNull.as("json_ok"),
        col("__p.id").as("id"),
        col("__p.text").as("text"),
        col("__p.meta.lang").as("lang"),
        col("__p.meta.source").as("source"),
        col("__p.meta.score").as("score"),
        when(col("__p.tags").isNotNull, size(col("__p.tags")).cast("long"))
          .as("n_tags"),
        element_at(col("__p.tags"), 1).as("tag0"))
  }

  /** Real-file face: partitioned json scan with the explicit schema,
    * normalized to the [[parse]] output shape. `.jsonl.gz` AND
    * `.jsonl.zst` — the dominant released-LLM-corpus wire format
    * (RedPajama/FineWeb ship zstd shards) — work out of the box
    * (Hadoop codec inference by extension; zstd verified against a
    * real zstd-jni-compressed fixture in IngestFacesSpec, r14, mixed
    * in one scan with gz and plain shards). A compressed FILE is one
    * split either way, so shard compressed corpora into many files
    * upstream — the standard layout — for parallelism.
    */
  def docs(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.schema(SchemaDdl).json(path)
    raw.select(
      // PERMISSIVE mode turns a malformed line into an all-null row;
      // `id` is the required field, so its absence marks the lane
      col("id").isNotNull.as("json_ok"),
      col("id"), col("text"),
      col("meta.lang").as("lang"),
      col("meta.source").as("source"),
      col("meta.score").as("score"),
      when(col("tags").isNotNull, size(col("tags")).cast("long")).as("n_tags"),
      element_at(col("tags"), 1).as("tag0"))
  }
}
