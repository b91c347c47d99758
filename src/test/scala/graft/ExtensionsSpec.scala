package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions registers dot_product for SQL") {
    // getOrCreate() would return the suite-shared session and skip extension
    // install — clear, build an extended session, then restore
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val got = spark.sql(
        "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
        .collect()(0).getDouble(0)
      assert(got == 32.0)
      val floats = spark.sql(
        "SELECT dot_product(array(float(0.5), float(0.5)), array(float(2.0), float(4.0))) AS d")
        .collect()(0).getDouble(0)
      assert(floats == 3.0)
      intercept[Exception](spark.sql("SELECT dot_product(array(1.0D))").collect())
      val sh = spark.sql("SELECT shingles('a b c d', 3) AS s")
        .collect()(0).getSeq[String](0)
      assert(sh == Seq("a b c", "b c d"))
      intercept[Exception](spark.sql("SELECT shingles('a b c')").collect())
      // fingerprint: SQL form must equal the 31-polynomial reference
      val fp = spark.sql("SELECT fingerprint('abc') AS f").collect()(0).getLong(0)
      val expected = "abc".foldLeft(0L)((a, ch) => (a * 31 + ch.toLong) % 2147483647L)
      assert(fp == expected)
      intercept[Exception](spark.sql("SELECT fingerprint('a', 'b')").collect())
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
