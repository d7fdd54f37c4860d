package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.dedup.Dedup

/** Property test: star-contraction connected components agree with a
  * driver-side union-find on arbitrary random graphs — shapes the
  * hand-written cases can't cover (self-loops, duplicate edges,
  * multi-hub merges, isolated nodes).
  */
class ConnectedComponentsPropSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("connectedComponents ≡ union-find on random graphs") {
    val genCase = for {
      n <- Gen.choose(2, 60)
      m <- Gen.choose(0, 120)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L)
      } yield (a, b))
    } yield (n, edges)
    val prop = Prop.forAllNoShrink(genCase) { case (n, edges) =>
      val df = Dedup.clustersFromPairs(
        (0L until n.toLong).toDF("doc_id"),
        edges.toDF("a", "b"))
      val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      df.unpersist(blocking = false)
      got == unionFind(n, edges)
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(15).withInitialSeed(42L), prop)
    assert(res.passed, res.status.toString)
  }
}
