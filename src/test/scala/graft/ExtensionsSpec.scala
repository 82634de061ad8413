package graft

import org.apache.spark.sql.SparkSession

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions registers dot_product/l2_norm for SQL") {
    // ensure the shared context exists, then build a second session over it
    spark.sparkContext
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val row = s2.sql(
        """SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |       l2_norm(array(3.0D, 4.0D)) AS n""".stripMargin).head()
      assert(row.getDouble(0) == 11.0)
      assert(row.getDouble(1) == 5.0)
      // cdc_boundaries from pure SQL matches the expression's direct eval
      val b = s2.sql(
        "SELECT cdc_boundaries('abcdefghij', 4, 3) AS b").head()
        .getSeq[Int](0)
      val direct = graft.functions.CdcBoundaries
        .boundaries(org.apache.spark.unsafe.types.UTF8String
          .fromString("abcdefghij"), 4, 3).toIntArray().toSeq
      assert(b == direct && b.last == 10)
      // SQL misuse over a non-string column fails at ANALYSIS with the
      // expression's own message, not as a codegen ClassCastException
      // mid-job (the checkInputDataTypes contract)
      val err = intercept[org.apache.spark.sql.AnalysisException] {
        s2.sql("SELECT cdc_boundaries(42, 4, 3)").collect()
      }
      assert(err.getMessage.contains("cdc_boundaries") ||
        err.getMessage.contains("STRING"))
    } finally {
      SparkSession.clearActiveSession()
      prevActive.foreach(SparkSession.setActiveSession)
      prevActive.foreach(SparkSession.setDefaultSession)
    }
  }
}
