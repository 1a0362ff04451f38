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

    // ---- second batch: a January statement for user 1 arrives later; the
    // stream must resume from the checkpoint and analyze it against the
    // state persisted by batch one (home country + average now exist).
    val jan = spark.read.option("header", true).schema(graft.model.Transaction.csvSchema)
      .csv(s"$ingest/user_1_new_statement202412.csv")
      .withColumn("YearMonth", org.apache.spark.sql.functions.lit("202501"))
    jan.write.option("header", true).mode("overwrite").csv(s"$ingest/batch2")
    // move the files into the watched dir as new names
    val fs = new java.io.File(s"$ingest/batch2").listFiles.filter(_.getName.endsWith(".csv"))
    fs.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.move(f.toPath, java.nio.file.Paths.get(s"$ingest/jan_$i.csv"))
    }

    val q2 = StatementStream.start(spark, ingest, stmts, reports, ckpt)
    q2.awaitTermination(120000L)

    // state now holds 4 user-months; user 1 has two
    val after = spark.read.parquet(stmts)
      .withColumn("userId", org.apache.spark.sql.functions.col("userId").cast("string"))
    assert(after.count() == 4)
    assert(after.where("userId = '1'").count() == 2)

    // the January report saw December history: flags are now selective
    // (only the foreign DZ transaction), not all-12-rows like the cold batch
    val reports2 = spark.read.json(reports)
    val janRow = reports2.where("yearMonth = '202501'").collect()
    assert(janRow.length == 1)
    val flagged = janRow(0).getAs[scala.collection.Seq[Any]]("flagged_transactions")
    assert(flagged.size == 1)
  }

  test("streaming ingest quarantines malformed rows instead of dropping them") {
    val ingest = tmpDir("ingest_q")
    val stmts = tmpDir("stream_stmts_q") + "/table"
    val reports = tmpDir("reports_q") + "/out"
    val ckpt = tmpDir("ckpt_q")
    val quarantine = tmpDir("quarantine_q") + "/rejects"

    val header = "UserId,YearMonth,transactions.id,transactions.date,transactions.vendor," +
      "transactions.category,transactions.amount,transactions.currency," +
      "transactions.recurring,transactions.type,transactions.location,transactions.description"
    val rows = Seq(
      "9,202501,t1,2025-01-05,VendorA,Groceries,12.50,USD,false,purchase,US-CA,ok row",
      "9,202501,t2,not-a-date,VendorB,Groceries,8.00,USD,false,purchase,US-CA,bad date",
      "9,202501,t3,2025-01-06,VendorC,Groceries,oops,USD,false,purchase,US-CA,bad amount",
      "9,202501,t4,2025-01-07,VendorD,Groceries,5.00,USD,false,purchase,narnia,bad location")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$ingest/mixed.csv"),
      (header +: rows).mkString("\n").getBytes("UTF-8"))

    val q = StatementStream.start(
      spark, ingest, stmts, reports, ckpt, quarantinePath = Some(quarantine))
    q.awaitTermination(120000L)

    // only the valid row reached the statements table…
    val persisted = graft.ops.FinOps.explodeStatements(
      spark.read.parquet(stmts)
        .withColumn("userId", org.apache.spark.sql.functions.col("userId").cast("string")))
    assert(persisted.count() == 1)
    assert(persisted.collect()(0).getAs[String]("id") == "t1")

    // …and every malformed row is in quarantine with its reason
    val rejects = spark.read.parquet(quarantine)
    val reasons = rejects.collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("_reject_reason")).toMap
    assert(reasons == Map(
      "t2" -> "unparseable date", "t3" -> "unparseable amount", "t4" -> "bad location"))
  }
}
