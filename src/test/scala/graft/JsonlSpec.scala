package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.Jsonl

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = new StructType()
    .add("id", LongType).add("lang", StringType).add("n", LongType)

  private def plant(lines: Seq[String]): String = {
    val dir = tmpDir("jsonl_src")
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    dir
  }

  test("well-formed lines parse; malformed lines land whole in the corrupt column") {
    val dir = plant(Seq(
      """{"id":1,"lang":"en","n":10}""",
      """{"id":2,"lang":"de","n":20}""",
      """{"id":3,"lang":"fr","n":30""", // truncated closing brace
      """not json at all"""))
    val df = Jsonl.read(spark, dir, schema).cache()
    assert(df.count() == 4)
    val good = df.where($"_corrupt".isNull)
    assert(good.count() == 2)
    assert(good.agg(sum($"n")).as[Long].head() == 30L)
    // a corrupt line must keep its raw text and parse NO typed columns —
    // the never-silent, never-fatal ingest contract
    val bad = df.where($"_corrupt".isNotNull)
    assert(bad.count() == 2)
    assert(bad.where($"id".isNotNull || $"lang".isNotNull || $"n".isNotNull).count() == 0)
    assert(bad.select($"_corrupt").as[String].collect().toSet ==
      Set("""{"id":3,"lang":"fr","n":30""", "not json at all"))
    df.unpersist()
  }

  test("ingestStats: corrupt rows form the null group's ledger entry") {
    val dir = plant(Seq(
      """{"id":1,"lang":"en","n":10}""",
      """{"id":2,"lang":"en","n":5}""",
      """{"id":3,"lang":"de","n":7}""",
      """garbage"""))
    val stats = Jsonl.ingestStats(Jsonl.read(spark, dir, schema), "lang", col("n"))
      .orderBy("lang")
      .as[(Option[String], Long, Option[Long], Long)].collect().toSeq
    assert(stats == Seq(
      (None, 1L, None, 1L),
      (Some("de"), 1L, Some(7L), 0L),
      (Some("en"), 2L, Some(15L), 0L)))
  }

  test("a schema field absent from a line is null, not corrupt (schema is the contract)") {
    val dir = plant(Seq("""{"id":9,"lang":"en"}"""))
    val row = Jsonl.read(spark, dir, schema)
      .select($"id", $"n", $"_corrupt").as[(Option[Long], Option[Long], Option[String])]
      .head()
    assert(row == ((Some(9L), None, None)))
  }
}
