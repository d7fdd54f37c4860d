package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WebDataset-style tar-shard ingest — the framing large multimodal
  * training corpora actually ship in: each sample's modalities are
  * same-stem members of a plain tar ("000123.jpg", "000123.txt",
  * "000123.cls", …), sharded into many tars so loaders stream
  * sequentially and shards parallelize trivially. Ingest = the ustar
  * member walk ([[graft.expressions.TarKernel]]) + a same-stem
  * regroup; decode composes with the real codec kernels (a `.jpg`
  * member feeds `jpeg_pixel_stats` directly).
  *
  * Scale shape: the member walk is one codegen kernel pass per shard
  * blob + an explode (map-only); the sample regroup is ONE keyed
  * aggregation on (shard, stem) — WebDataset guarantees a sample's
  * members are adjacent within a shard, so the groups never span
  * shards and the aggregation state per key is a handful of members.
  */
object Wds {

  private def bridge(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.GraftColumnBridge.column(e)
  private def expr0(c: Column) =
    org.apache.spark.sql.GraftColumnBridge.expression(c)

  /** One deterministic ustar member (writer face / synthesis device). */
  def tarMember(name: Column, data: Column): Column =
    bridge(graft.expressions.TarMemberWrite(expr0(name),
      expr0(data.cast("binary"))))

  /** The end-of-archive marker (two zero blocks) as a literal. */
  def tarTerminator: Column = lit(graft.expressions.TarKernel.Terminator)

  /** Explode a tar shard into its regular-file members: adds
    * `member_idx`, `member_name`, `member_data`. Invalid shards yield
    * zero rows (the kernel nulls on checksum/size/alignment
    * violations).
    */
  def members(df: DataFrame, blob: Column): DataFrame =
    df.withColumn("__m",
        bridge(graft.expressions.TarMembers(expr0(blob.cast("binary")))))
      .select(col("*"), posexplode(col("__m")).as(Seq("member_idx", "__e")))
      .withColumn("member_idx", col("member_idx").cast("long"))
      .withColumn("member_name", col("__e.name"))
      .withColumn("member_data", col("__e.data"))
      .drop("__m", "__e")

  /** Regroup members into samples by stem (name minus the final
    * extension): one row per (shard row, stem) with `n_members` and
    * `parts` (extension → bytes, extensions lowercased). The one
    * keyed aggregation of the ingest; everything around it is
    * map-only. A malformed shard with DUPLICATE same-stem extensions
    * keeps the first entry in sorted order (deterministic, never a
    * duplicate-key throw — `map_from_entries` would crash the job on
    * one bad shard).
    */
  /** The WRITE face — pack curated samples back into WebDataset tar
    * shards: each (stem, parts) row explodes into its members, stems
    * hash deterministically onto `nShards` shards (stable across
    * reruns and cluster sizes — the portable md5 discipline), and
    * each shard aggregates its members in (stem, ext) order — a
    * sample's members stay ADJACENT, the WebDataset contract — into
    * one tar blob with the terminator. One keyed aggregation; the
    * member rendering is the same deterministic writer the ingest
    * side verifies against GNU tar. `samples ∘ packShards ∘ samples`
    * is identity (spec-pinned).
    */
  def packShards(samples: DataFrame, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards=$nShards must be positive")
    val members = samples
      .select(col("stem"), explode(col("parts")).as(Seq("__ext", "__data")))
      .withColumn("__name",
        when(col("__ext") === "", col("stem"))
          .otherwise(concat(col("stem"), lit("."), col("__ext"))))
      .withColumn("shard_id",
        pmod(graft.GraftFunctions.hex64(col("stem")), lit(nShards.toLong)))
    members.groupBy(col("shard_id"))
      .agg(
        count_distinct(col("stem")).as("n_samples"),
        count(lit(1)).as("n_members"),
        aggregate(
          array_sort(collect_list(
            struct(col("stem"), col("__ext"), col("__name"), col("__data")))),
          lit(Array.emptyByteArray),
          (acc, e) => concat(acc,
            tarMember(e.getField("__name"), e.getField("__data"))))
          .as("__body"))
      .withColumn("shard", concat(col("__body"), tarTerminator))
      .drop("__body")
  }

  def samples(df: DataFrame, blob: Column,
      keys: Seq[String] = Seq("doc_id")): DataFrame = {
    val m = members(df, blob)
    val stem = when(col("member_name").rlike("\\.[^.]+$"),
      regexp_extract(col("member_name"), "^(.*)\\.[^.]+$", 1))
      .otherwise(col("member_name"))
    val ext = lower(regexp_extract(col("member_name"), "\\.([^.]+)$", 1))
    m.withColumn("stem", stem)
      .withColumn("__ext", ext)
      .groupBy((keys.map(col) :+ col("stem")): _*)
      .agg(count(lit(1)).as("n_members"),
        aggregate(
          array_sort(collect_list(struct(col("__ext"), col("member_data")))),
          map().cast("map<string,binary>"),
          (m2, e) => when(map_contains_key(m2, e.getField("__ext")), m2)
            .otherwise(map_concat(m2,
              map(e.getField("__ext"), e.getField("member_data")))))
          .as("parts"))
  }
}
