package graft

import org.apache.spark.sql.functions._

import graft.ops.Curation
import graft.text.Html

/** Scale evidence for the r12 web-crawl family at ~100× the bench SF
  * (500k pages, 50k hosts): HTML extraction throughput, link-graph
  * construction with exact planted edge arithmetic, host PageRank
  * over the extracted graph, the robots gate against a 150k-row rules
  * table, and politeness crawl waves under a planted mega-host (20%
  * of the frontier on ONE host — the skew case the distributed
  * prefix rank exists for).
  *
  * Every assertion is planted arithmetic: the synthetic pages are
  * pure hash/modulo expressions, so expected counts are exact.
  *
  * Run: `sbt "runMain graft.WebScaleSmoke [nPages]"`.
  */
object WebScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500000)
    val nHosts = 50000L
    val spark = GraftSession.builder("local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- pages: ~30 hash words each; 50k hosts with a mega-host
    // holding every 5th URL; each page links to ONE deterministic
    // external host, one relative path, one mailto (must drop) ----
    val id = col("id")
    val words = array_join(transform(sequence(lit(0), lit(29)),
      p => concat(lit("w"), hex(xxhash64(id, p)))), " ")
    val host = when(id % 5 === 0, lit("mega.com"))
      .otherwise(concat(lit("h"), pmod(id, lit(nHosts)).cast("string"), lit(".com")))
    val extTarget = concat(lit("h"),
      pmod(id * 7 + 3, lit(nHosts)).cast("string"), lit(".com"))
    val pages = spark.range(n).toDF("id")
      .select(id.as("doc_id"), host.as("host"),
        concat(lit("https://"), host,
          expr("repeat('/s', cast(id % 4 as int))"),
          lit("/doc"), id.cast("string")).as("url"),
        concat(lit("<html><body><p>"), words,
          lit("</p><a href=\"https://"), extTarget,
          lit("/x?a=1&amp;b=2\">visit topic"),
          pmod(id, lit(100L)).cast("string"),
          lit("</a><a href='/rel/doc"), id.cast("string"),
          lit("'>rel</a><a href=\"mailto:u@v.example\">m</a></body></html>"))
          .as("html"))
      .repartition(64).cache()
    pages.count() // materialize generation outside all timings

    // ---- rung 1: extraction is narrow-map throughput ----
    val (exAgg, tExtract) = time {
      Html.extract(pages, col("html"))
        .agg(sum(col("n_links")).as("links"),
          sum(col("n_html_chars")).as("html_chars"),
          sum(when(col("text_ratio") > 0, 1L).otherwise(0L)).as("ok"))
        .head()
    }
    assert(exAgg.getLong(0) == 3L * n, s"anchor tags: ${exAgg.getLong(0)} != ${3L * n}")
    assert(exAgg.getLong(2) == n.toLong, s"text_ratio>0 rows: ${exAgg.getLong(2)}")
    val mb = exAgg.getLong(1) / 1e6

    // ---- rung 2: link graph with exact planted edge arithmetic ----
    val (lkAgg, tLinks) = time {
      val links = Html.extractLinks(pages, col("html"), col("host"))
      val edges = Html.hostEdges(links)
      val a = links.agg(count(lit(1)).as("rows"),
        sum(when(col("dst_host").isNull, 1L).otherwise(0L)).as("dropped")).head()
      val b = edges.agg(
        sum(when(!col("is_internal"), col("n_links")).otherwise(0L)).as("ext"),
        sum(when(col("is_internal"), col("n_links")).otherwise(0L)).as("int"))
        .head()
      (a.getLong(0), a.getLong(1), b.getLong(0), b.getLong(1))
    }
    assert(lkAgg._1 == 3L * n, s"link rows: ${lkAgg._1}")
    assert(lkAgg._2 == n.toLong, s"mailto drops: ${lkAgg._2}")
    // every page contributes exactly one external and one internal
    // link instance — but a page whose deterministic target IS its own
    // host emits it as internal; both sides must still sum to 2n
    assert(lkAgg._3 + lkAgg._4 == 2L * n,
      s"edge mass: ext ${lkAgg._3} + int ${lkAgg._4} != ${2L * n}")

    // ---- rung 3: PageRank over the extracted external host graph ----
    val extEdges = Html.hostEdges(
        Html.extractLinks(pages, col("html"), col("host")))
      .where(!col("is_internal"))
      .select(col("src_host").as("src"), col("dst_host").as("dst"))
    val (prAgg, tRank) = time {
      val pr = graft.ops.Graph.pageRank(extEdges, iterations = 10)
      pr.agg(count(lit(1)).as("nodes"), min(col("rank_fp")).as("min_fp")).head()
    }
    val baseFp = 15L * graft.ops.Graph.Scale / 100L
    assert(prAgg.getLong(0) > 0 && prAgg.getLong(1) >= baseFp,
      s"pagerank: ${prAgg.getLong(0)} nodes, min rank ${prAgg.getLong(1)} < teleport $baseFp")

    // ---- rung 4: robots gate against a 150k-row rules table ----
    // every host: Disallow /s/s, Allow /s/s/s, Disallow /never (no
    // page matches) → blocked pages are EXACTLY the id%4==2 depth-2
    // paths (depth-3 re-allowed by the longest match)
    val ruleHost = concat(lit("h"),
      pmod(col("id"), lit(nHosts)).cast("string"), lit(".com"))
    val rules = spark.range(nHosts).toDF("id")
      .select(explode(array(
        struct(ruleHost.as("host"), lit("/s/s").as("path_prefix"), lit(false).as("allow")),
        struct(ruleHost.as("host"), lit("/s/s/s").as("path_prefix"), lit(true).as("allow")),
        struct(ruleHost.as("host"), lit("/never").as("path_prefix"), lit(false).as("allow")))).as("r"))
      .select(col("r.host"), col("r.path_prefix"), col("r.allow"))
      .union(spark.range(1).select(lit("mega.com").as("host"),
        lit("/s/s").as("path_prefix"), lit(false).as("allow")))
      .union(spark.range(1).select(lit("mega.com").as("host"),
        lit("/s/s/s").as("path_prefix"), lit(true).as("allow")))
    val parsed = Curation.withUrlParts(pages.select(col("doc_id"), col("url")), col("url"))
    val (rbAgg, tRobots) = time {
      Curation.applyRobots(parsed, rules)
        .agg(sum(when(!col("robots_allowed"), 1L).otherwise(0L)).as("blocked"))
        .head()
    }
    val expectBlocked = (0L until n.toLong).count(_ % 4 == 2)
    assert(rbAgg.getLong(0) == expectBlocked,
      s"robots blocked ${rbAgg.getLong(0)} != planted $expectBlocked")

    // ---- rung 5: crawl waves under the mega-host (20% of frontier) ----
    val (cwAgg, tWaves) = time {
      val waves = Curation.crawlWaves(pages, col("host"), col("url"),
        GraftFunctions.hex64(concat(lit("f|"), col("doc_id").cast("string"))),
        perWave = 10)
      val over = waves.groupBy(col("host"), col("wave"))
        .agg(count(lit(1)).as("c")).agg(max(col("c")).as("worst")).head()
      val mega = waves.where(col("host") === "mega.com")
        .agg(count(lit(1)).as("rows"), max(col("wave")).as("maxw")).head()
      (over.getLong(0), mega.getLong(0), mega.getLong(1))
    }
    assert(cwAgg._1 <= 10L, s"a wave holds ${cwAgg._1} > perWave urls")
    val megaN = (0L until n.toLong).count(_ % 5 == 0).toLong
    assert(cwAgg._2 == megaN && cwAgg._3 == (megaN - 1) / 10,
      s"mega-host schedule: $cwAgg vs n=$megaN maxWave=${(megaN - 1) / 10}")

    println(s"""{"smoke":"web_scale","n_pages":$n,"html_mb":${mb.round},""" +
      f""""extract_sec":$tExtract%.1f,"link_graph_sec":$tLinks%.1f,""" +
      f""""pagerank_sec":$tRank%.1f,"robots_sec":$tRobots%.1f,""" +
      f""""crawl_waves_sec":$tWaves%.1f,"nodes":${prAgg.getLong(0)},""" +
      s""""blocked":${rbAgg.getLong(0)}}""")
    spark.stop()
  }
}
