package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("registered SQL functions evaluate the custom expressions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  cosine_similarity(array(1.0D, 2.0D), array(1.0D, 2.0D)) AS cs,
        |  sorted_long_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS ic,
        |  simhash60(hashed_words60(array('a', 'b'))) AS sh,
        |  size(hashed_word_ngrams(array('x', 'y', 'z', 'x', 'y'), 2)) AS ng
        |""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getInt(1) === 2)
    assert(r.getLong(2) !== 0L)
    assert(r.getInt(3) === 3) // "x y","y z","z x","x y" → 3 distinct
  }

  test("cosine_similarity via SQL casts float arrays like the Column API") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(CAST(0.5 AS FLOAT)), array(CAST(0.5 AS FLOAT)))").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }
}
