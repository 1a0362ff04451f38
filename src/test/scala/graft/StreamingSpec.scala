package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.streaming.StatementStream

/** S1/S10 — end-to-end: drop statement CSVs in a directory, run the
  * AvailableNow stream, observe reports + the statements table. */
class StreamingSpec extends SparkSpec {

  test("streaming ingest drains the directory and produces reports + state") {
    val ingest = tmpDir("ingest")
    val stmts = tmpDir("stream_stmts") + "/table"
    val reports = tmpDir("reports") + "/out"
    val ckpt = tmpDir("ckpt")

    for (u <- 1 to 3) {
      val name = s"user_${u}_new_statement202412.csv"
      Files.copy(
        Paths.get(s"/root/reference/test_data/$name"),
        Paths.get(s"$ingest/$name"),
        StandardCopyOption.REPLACE_EXISTING)
    }

    val q = StatementStream.start(spark, ingest, stmts, reports, ckpt)
    q.awaitTermination(120000L)

    val report = spark.read.json(reports)
    assert(report.count() == 3)
    assert(report.columns.contains("spending_by_category"))

    val table = spark.read.parquet(stmts)
    assert(table.count() == 3) // one nested item per user-month
  }
}
