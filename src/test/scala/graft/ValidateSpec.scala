package graft

import org.apache.spark.sql.functions._

import graft.ops.Validate

/** Validation/repair semantics: orphan accounting (nulls are not
  * orphans), null-predicate = violated, exact winsor clamps, group-median
  * fills with all-null groups left alone. */
class ValidateSpec extends SparkSpec {
  import spark.implicits._

  test("refIntegrity: orphan rows/keys counted, null FKs excluded, parent dups collapse") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(9L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 1L, 2L, 3L).toDF("pk") // dup parent keys must not multiply
    val r = Validate.refIntegrity(child, "fk", parent, "pk").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((7L, 3L, 1L)),
      r.toString) // 7 child rows; fk=9 thrice orphaned; 1 distinct orphan key
  }

  test("constraintReport: one row per contract, null predicate counts as violated") {
    val df = Seq[(java.lang.Long, String)]((1L, "x"), (2L, null), (null, "y"))
      .toDF("v", "s")
    val got = Validate.constraintReport(df, Seq(
        "v_pos" -> (col("v") > 0),       // null v -> violated
        "s_set" -> col("s").isNotNull))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("v_pos" -> ((3L, 1L)), "s_set" -> ((3L, 1L))), got.toString)
  }

  test("winsorize clamps into the exact quantile range; imputation fills group medians") {
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    val w = Validate.winsorize(df, "x", 0.10, 0.90)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // interpolated p10 of 1..100 = 10.9, p90 = 90.1 (within fp representation)
    assert(w(1L) == 10.9 && w(5L) == 10.9 && w(50L) == 50.0)
    assert(math.abs(w(100L) - 90.1) < 1e-9)

    // nulls pass through as documented — greatest/least skip nulls, so an
    // unguarded clamp would impute null with the LOW quantile
    val withNull = (1 to 100).map(i => (i.toLong, Some(i.toDouble))) :+ ((101L, None))
    val wn = Validate.winsorize(withNull.toDF("id", "x"), "x", 0.10, 0.90)
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(wn(101L).isEmpty, "null input must stay null, not clamp to lo")
    assert(wn(50L).nonEmpty)

    val ev = Seq(
      (1L, "a", Some(1.0)), (2L, "a", Some(3.0)), (3L, "a", None),
      (4L, "b", None), (5L, "b", None)).toDF("id", "g", "v")
    val f = Validate.imputeByGroupMedian(ev, "v", "g")
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(f(3L).contains(2.0), "null fills with the group's exact median")
    assert(f(1L).contains(1.0) && f(2L).contains(3.0), "non-nulls untouched")
    assert(f(4L).isEmpty && f(5L).isEmpty, "an all-null group stays null")
  }
}
