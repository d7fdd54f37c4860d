package graft

import org.apache.spark.sql.functions._

/** Parity tooling for the deterministic ln: dumps (x, det_ln(x)) for a
  * deterministic sweep covering the full supported exponent range plus
  * power-of-two boundaries, so `scripts/check_detln.py` can evaluate
  * the generated [[OracleSql.detLn]] SQL over the same arguments in
  * DuckDB and compare bit patterns. Zero mismatches = the construction
  * is engine-exact, not data-lucky.
  *
  * Run: `sbt "runMain graft.DetLnParityDump /tmp/detln_parity"`.
  */
object DetLnParityDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/detln_parity")
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rnd = new scala.util.Random(12345)
    val xs = Seq.tabulate(50000) { _ =>
      math.pow(2.0, rnd.nextDouble() * 128 - 64) * (0.5 + rnd.nextDouble())
    } ++ (-64 to 64).flatMap { j =>
      val p = math.pow(2.0, j)
      Seq(p, p * (1.0 + 1e-15), p * (1.0 - 1e-16))
    } ++ Seq(1.0, math.E, 0.1, 10.0, 13.83, 1.0 / 3.0)
    val valid = xs.filter(x => x >= math.pow(2.0, -64) && x <= math.pow(2.0, 64))
    valid.map(x => (x, graft.expressions.DetLn.ln(x)))
      .toDF("x", "ln_jvm")
      .repartition(1)
      .write.mode("overwrite").parquet(out)
    // the SQL the oracle generator would emit for this arg column
    val sql = OracleSql.detLn(
      s"SELECT x, ln_jvm FROM read_parquet('$out/*.parquet')",
      "x, ln_jvm", "x", "ln_sql", "p")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$out.sql"),
      sql.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"DETLN_DUMP_ROWS=${valid.size}")
    spark.stop()
  }
}
