package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal — the CCNet/RefinedWeb cleaning
  * stage between URL curation and content filters: navigation bars,
  * cookie banners, and footers repeat VERBATIM across a site's pages,
  * so a line occurring in ≥ `minDf` documents of the same group
  * (domain/source) is boilerplate and is stripped, while the document
  * body (unique by construction) survives. Deduplicating lines
  * WITHIN a group rather than globally is what keeps legitimate
  * common sentences ("All rights reserved" quoted in an article)
  * from being stripped corpus-wide by one noisy site.
  *
  * Scale shape: one line explode (map-side) → one (group, line_hash)
  * map-side-partial count → the boilerplate set joined back as a
  * semi/anti filter on the SAME (group, line_hash) key the count
  * shuffled on (co-partitioned — AQE reuses the exchange) → one
  * per-doc positional reassembly shuffle bounded by line counts. No
  * windows; the boilerplate table is corpus-frequency-sized, never
  * corpus-sized. At 100 TB every step is the dedup-family shape that
  * already scales ([[graft.dedup.Dedup]]).
  *
  * Determinism: lines keep their position through the explode and are
  * reassembled with `sort_array(struct(pos, line))` — the rebuilt
  * text is a pure function of the input, partition-order free, and
  * the whole operator is SQL-oracle-expressible (counts + string
  * aggregation ordered by position).
  */
object Boilerplate {

  /** Per-line accounting: (doc_id, pos, line, line_hash, group, n_docs
    * in group sharing the line). The inspection surface behind
    * [[stripBoilerplate]].
    */
  def lineStats(docs: DataFrame, group: Column): DataFrame = {
    val lines = docs
      .select(col("doc_id"), group.as("grp"),
        posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
      .withColumn("line_hash",
        graft.GraftFunctions.hex64(concat(lit("bp|"), col("line"))))
    val df = lines.groupBy(col("grp"), col("line_hash"))
      .agg(countDistinct(col("doc_id")).as("line_df"))
    lines.join(df, Seq("grp", "line_hash"))
  }

  /** Strip lines occurring in ≥ `minDf` documents of the same group;
    * returns (doc_id, n_lines, n_boiler_removed, clean_text) with the
    * survivors rejoined positionally by '\n'. Documents whose every
    * line is boilerplate come back with an empty `clean_text` (and a
    * downstream length filter drops them — the standard fate of a
    * pure-boilerplate page).
    */
  def stripBoilerplate(docs: DataFrame, group: Column,
      minDf: Int = 5): DataFrame = {
    require(minDf >= 2, s"minDf=$minDf: a line must repeat to be boilerplate")
    val stats = lineStats(docs, group)
    stats.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("line_df") >= minDf, 1L).otherwise(0L)).as("n_boiler_removed"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("line_df") < minDf, struct(col("pos"), col("line"))))),
            x => x.getField("line")),
          "\n").as("clean_text"))
  }

  /** Deterministic boilerplate-dirtied corpus over the documents
    * table (the [[graft.ops.Curation.synthUrls]] convention — the
    * testdata has no multi-line pages, so the header/footer structure
    * is synthesized; the strip operator downstream is the real one):
    * every doc gains a per-source header (repeats across the ~n/20
    * docs of its source), a corpus-wide footer, and every 3rd doc a
    * promo line shared by its `doc_id % 3` cohort within the source.
    */
  def synthBoilerplate(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      concat(
        lit("NAV home about contact "), col("source"), lit("\n"),
        when(col("doc_id") % 3 === 0,
          concat(lit("PROMO subscribe now "), col("source"), lit("\n")))
          .otherwise(lit("")),
        col("text"),
        lit("\nFOOTER copyright example inc")))
}
