package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Determinism helpers for the DuckDB-oracle hash compare.
  *
  * All money/value doubles in the test data carry <= 2 decimal digits, so a
  * cast to DECIMAL(18,2) is EXACT (never rounds at a .xx5 boundary).
  * Summing decimals is exact integer arithmetic in both Spark and DuckDB;
  * casting the exact decimal sum back to DOUBLE is correctly rounded in
  * both engines. Result: bit-identical doubles on both sides, no float
  * summation-order nondeterminism (the reference's native aggs BigintSum /
  * DecimalSum, pixels-executor/.../aggregation/function/, are likewise
  * exact integer/decimal sums).
  *
  * Oracle-side mirror patterns (DuckDB SQL) live in [[Det.o]].
  */
object Det {
  val D2: DecimalType = DecimalType(18, 2)
  /** narrow decimal for values in [-9.99, 9.99] (discount/tax factors) */
  val D32: DecimalType = DecimalType(3, 2)

  def dec(c: Column): Column = c.cast(D2)

  /** exact sum of a <=2-decimal double column, returned as double */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** exact sum of an already-decimal product expression, as double */
  def dsumE(e: Column): Column = sum(e).cast(DoubleType)

  /** avg = exact-decimal-sum / count, evaluated in double (deterministic) */
  def davg(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(lit(1))

  /** lineitem revenue term: extendedprice * (1 - discount), exact decimal */
  def revenueTerm(price: Column, discount: Column): Column =
    dec(price) * (lit(1).cast(D32) - discount.cast(D32))

  /** charge term: price * (1 - discount) * (1 + tax), exact decimal */
  def chargeTerm(price: Column, discount: Column, tax: Column): Column =
    revenueTerm(price, discount) * (lit(1).cast(D32) + tax.cast(D32))

  /** DuckDB-side mirrors of the above, for oracle SQL strings. */
  object o {
    def dec(c: String): String = s"CAST($c AS DECIMAL(18,2))"
    def dsum(c: String): String = s"CAST(SUM(${dec(c)}) AS DOUBLE)"
    def dsumE(e: String): String = s"CAST(SUM($e) AS DOUBLE)"
    def davg(c: String): String = s"CAST(SUM(${dec(c)}) AS DOUBLE) / COUNT(*)"
    def revenueTerm(p: String, d: String): String =
      s"${dec(p)} * (CAST(1 AS DECIMAL(3,2)) - CAST($d AS DECIMAL(3,2)))"
    def chargeTerm(p: String, d: String, t: String): String =
      s"${revenueTerm(p, d)} * (CAST(1 AS DECIMAL(3,2)) + CAST($t AS DECIMAL(3,2)))"
  }
}
