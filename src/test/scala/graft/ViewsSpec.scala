package graft

import graft.queries.Views

/** The spark.sql surface: views resolve, joins plan, native functions are
  * callable from SQL.
  */
class ViewsSpec extends SparkSpec {
  import spark.implicits._

  test("registered views answer ad-hoc SQL incl. native functions") {
    Views.register(spark, "/root/testdata/sf0.001")
    val n = spark.sql("""
      SELECT r_name, count(*) AS n
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name
    """).count()
    assert(n === 5)
    val ev = spark.sql("SELECT count(*) FROM events WHERE year(ts) = 2024")
      .as[Long].head()
    assert(ev === 1000L)
    val sim = spark.sql(
      "SELECT gram3_jaccard_counts(text, text).n_common FROM documents LIMIT 1")
      .as[Int].head()
    assert(sim > 0)
  }
}
