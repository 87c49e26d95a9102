package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

/** SQL-surface registration checks for the native functions. */
class FunctionRegistrationSpec extends AnyFunSuite with SparkTestBase {

  test("grid_dot and simhash60 resolve from SQL after register") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT grid_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d, " +
        "simhash60(array(CAST(3 AS BIGINT))) AS s").head()
    assert(r.getLong(0) == 11L * 1000000000L)
    assert(r.getLong(1) == 3L) // single hash: its bits are the majority
  }

  test("grid_dot rejects wrong input types with the custom message") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT grid_dot(array(1, 2), array(3, 4))").head()
    }
    assert(e.getMessage.contains("grid_dot expects (array<float>, array<float>)"))
  }
}
