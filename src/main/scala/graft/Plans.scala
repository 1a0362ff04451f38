package graft

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for selected driver-contract queries — the
  * plan-audit loop (broadcasts where expected, filters pushed to the scan,
  * pruned ReadSchema, partitioned windows, wide codegen spans). */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_p1_project", "q_j1_country_resolve", "q_a5_category_spend",
      "q_f1_high_value", "q_flag_risky", "q_o1_topk",
      "q_dedup_minhash_lsh", "q_sim_topk_brute", "q_embed_neardup")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
