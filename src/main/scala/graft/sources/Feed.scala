package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge.{column => gcol, expression => gexpr}

/** RSS 2.0 / Atom feed faces — the crawl-discovery surface next to
  * [[Sitemap]] ([[graft.expressions.FeedItemsKernel]]).
  */
object Feed {

  /** One row per feed ITEM, document order: `feed_valid`,
    * `feed_type` (rss | atom), `feed_title`, `item_idx`, `title`
    * (CDATA verbatim / entities decoded), `link` (RSS element text,
    * Atom href attribute), `guid`, `published`. Non-feed text keeps
    * one all-null row (`explode_outer`). A kernel projection +
    * generate — no shuffle.
    */
  def items(df: DataFrame, textCol: Column): DataFrame = {
    val f = gcol(graft.expressions.FeedItems(gexpr(textCol)))
    df.withColumn("__f", f)
      .withColumn("feed_valid", col("__f").isNotNull)
      .select(df.columns.map(col) :+ col("feed_valid") :+
        col("__f.feed_type").as("feed_type") :+
        col("__f.feed_title").as("feed_title") :+
        explode_outer(col("__f.items")).as("__i"): _*)
      .select(df.columns.map(col) :+ col("feed_valid") :+
        col("feed_type") :+ col("feed_title") :+
        col("__i.item_idx").as("item_idx") :+
        col("__i.title").as("title") :+
        col("__i.link").as("link") :+
        col("__i.guid").as("guid") :+
        col("__i.published").as("published"): _*)
  }
}
