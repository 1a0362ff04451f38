package graft

import org.apache.spark.sql.functions._

import graft.ops.FinOps

/** A2/S4/S5 — nest → partitioned write → pruned read → explode round-trip,
  * last-writer-wins overwrite semantics, and partition pruning in the plan. */
class PersistenceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val statement =
    FinOps.ingestStatement(spark, "/root/reference/test_data/*.csv").cache()

  test("A2+S4: nest → write → explode round-trips every row") {
    val dir = tmpDir("stmts_rt")
    val items = FinOps.toStatementItems(statement)
    assert(items.count() == 3) // one item per user-month (LF:467-474 shape)
    FinOps.writeStatements(items, dir)

    val back = FinOps.explodeStatements(
      spark.read.parquet(dir).withColumn("userId", $"userId".cast("string")))
    val orig = statement.select(back.columns.map(col): _*)
    assert(back.count() == 36)
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("S5: dynamic partition overwrite = last-writer-wins per user-month") {
    val dir = tmpDir("stmts_lww")
    FinOps.writeStatements(FinOps.toStatementItems(statement), dir)
    // re-upload user 1 with only 5 transactions → item replaced, others intact
    val smaller = statement.where($"userId" === "1").limit(5)
    FinOps.writeStatements(FinOps.toStatementItems(smaller), dir)

    assert(FinOps.readUserHistory(spark, dir, "1").count() == 5)
    assert(FinOps.readUserHistory(spark, dir, "2").count() == 12)
    assert(FinOps.readUserHistory(spark, dir, "3").count() == 12)
  }

  test("S4: the keyed historical read is partition-pruned") {
    val dir = tmpDir("stmts_prune")
    FinOps.writeStatements(FinOps.toStatementItems(statement), dir)
    val plan = FinOps.readUserHistory(spark, dir, "2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert("PartitionFilters: \\[[^\\]]*userId".r.findFirstIn(plan).isDefined, plan)
  }
}
