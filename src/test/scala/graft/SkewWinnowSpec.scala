package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew
import graft.text.TextAnalysis

class SkewWinnowSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin is row-identical to the plain join under skew") {
    val orders = Tables.load(spark, sfDir, "orders")
    val customer = Tables.load(spark, sfDir, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
      .orderBy("o_orderkey").collect().map(_.toSeq)
    val salted = Skew.saltedJoin(orders, customer, "o_custkey", salts = 8)
      .select(plain.headOption.map(_ => orders.join(customer, Seq("o_custkey")).columns)
        .getOrElse(Array("o_custkey")).map(col): _*)
      .orderBy("o_orderkey").collect().map(_.toSeq)
    assert(salted.length === plain.length)
    assert(salted.toSeq === plain.toSeq)
  }

  test("winnowing: shared substrings of copies yield identical fingerprint sets") {
    val docs = Tables.load(spark, sfDir, "documents")
    val copies = docs.orderBy("doc_id").limit(2)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    val fp = TextAnalysis.winnow(docs.unionByName(copies)).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Long]("fingerprint")).toSet).toMap
    (0 until 2).foreach { i =>
      assert(fp(i.toLong) === fp(i.toLong + 1000000L))
    }
    // winnowing density: every doc with >= window+shingle tokens has fingerprints
    assert(fp.values.forall(_.nonEmpty))
  }

  test("winnowing guarantee: long shared runs produce a common fingerprint") {
    // two docs sharing a 12-token run embedded in different contexts
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val d = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon zeta eta"),
      (2L, s"one two three four five $shared six seven eight nine"))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.winnow(d).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Long]("fingerprint")).toSet).toMap
    assert(fp(1L).intersect(fp(2L)).nonEmpty)
  }
}
