package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge.{column => gcol, expression => gexpr}

/** SRT / WebVTT subtitle faces — the transcript grain of a
  * speech/video corpus ([[graft.expressions.SubtitleCuesKernel]]).
  */
object Subtitles {

  /** One row per cue, document order: `sub_valid`, `kind`
    * (srt | vtt), `cue_idx`, `start_ms`, `end_ms`, `dur_ms`, `text`
    * (inline markup stripped, VTT entities decoded). Non-subtitle
    * bytes keep one all-null row (`explode_outer`). A kernel
    * projection + generate — no shuffle.
    */
  def cues(df: DataFrame, rawCol: Column): DataFrame = {
    val c = gcol(graft.expressions.SubtitleCues(gexpr(rawCol)))
    df.withColumn("__s", c)
      .withColumn("sub_valid", col("__s").isNotNull)
      .select(df.columns.map(col) :+ col("sub_valid") :+
        col("__s.kind").as("kind") :+
        explode_outer(col("__s.cues")).as("__c"): _*)
      .select(df.columns.map(col) :+ col("sub_valid") :+ col("kind") :+
        col("__c.cue_idx").as("cue_idx") :+
        col("__c.start_ms").as("start_ms") :+
        col("__c.end_ms").as("end_ms") :+
        (col("__c.end_ms") - col("__c.start_ms")).as("dur_ms") :+
        col("__c.text").as("text"): _*)
  }
}
