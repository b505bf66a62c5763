package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ExcelSerial
import graft.model.PathOps
import graft.ops.{Hierarchy, Parents, Upsert}
import graft.views.Analytic

/** Privacy screens: k-anonymity, l-diversity, t-closeness.
  *
  * Split from the monolithic `Registry` object (round 15): members are
  * unchanged; `Registry` mixes every family trait in, so the public
  * surface (`Registry.queries` / `Registry.oracle` / each q* member) is
  * identical. Cross-family helpers are `private[queries]`; vals are lazy
  * so trait-linearization order can never null-init a shared fragment.
  */
trait PrivacyQueries { self: RegistryAll =>

  /** k-anonymity release screen over the customer quasi-identifiers
    * (nation, market segment) ([[graft.ops.Privacy.kAnonymityCells]],
    * Sweeney '02): every equivalence class smaller than k = 10 is
    * flagged re-identifiable. Exact integer cell counts, output bounded
    * by distinct QI combinations; NULLs form their own class on both
    * engines.
    */
  def qKAnonymity(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Privacy.kAnonymityCells(
        t(spark, dir, "customer")
          .select(col("c_nationkey").cast("long").as("nation_key"),
            col("c_mktsegment").as("segment")),
        Seq("nation_key", "segment"), k = 10L)
      .orderBy("nation_key", "segment")

  lazy val qKAnonymitySql: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS nation_key,
      |  c_mktsegment AS segment,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  COUNT(*) < 10 AS at_risk
      | FROM customer GROUP BY 1, 2 ORDER BY nation_key, segment"""
      .stripMargin.replace("\n", " ")

  /** Distinct l-diversity screen over customers: QI = nation, sensitive
    * = market segment ([[graft.ops.Privacy.lDiversityCells]],
    * Machanavajjhala et al. '06): the homogeneity attack k-anonymity
    * misses — a big cell whose sensitive attribute has fewer than l = 3
    * distinct values still discloses it. Exact integer counts; NULL
    * sensitive values excluded from the distinct count on both engines.
    */
  def qLDiversity(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Privacy.lDiversityCells(
        t(spark, dir, "customer")
          .select(col("c_nationkey").cast("long").as("nation_key"),
            col("c_mktsegment").as("segment")),
        Seq("nation_key"), "segment", l = 3L)
      .orderBy("nation_key")

  lazy val qLDiversitySql: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS nation_key,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive,
      |  COUNT(DISTINCT c_mktsegment) < 3 AS at_risk
      | FROM customer GROUP BY 1 ORDER BY nation_key"""
      .stripMargin.replace("\n", " ")

  /** t-closeness release screen over customers: QI = nation, sensitive
    * = market segment ([[graft.ops.Privacy.tClosenessCells]], Li et al.
    * ICDE '07): the skew attack l-diversity misses — a diverse cell
    * whose sensitive distribution sits far from the corpus's still
    * discloses. Categorical EMD = TV distance, exact integers scaled by
    * 2·n_c·N, ONE double division to picos, integer threshold compare
    * (t = 0.2 → 200000000000 picos).
    */
  def qTCloseness(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Privacy.tClosenessCells(
        t(spark, dir, "customer")
          .select(col("c_nationkey").cast("long").as("nation_key"),
            col("c_mktsegment").as("segment")),
        Seq("nation_key"), "segment", tPico = 200000000000L)
      .orderBy("nation_key")

  lazy val qTClosenessSql: String =
    """WITH base AS (SELECT CAST(c_nationkey AS BIGINT) AS qi,
      |   c_mktsegment AS v FROM customer WHERE c_mktsegment IS NOT NULL),
      | cv AS (SELECT qi, v, CAST(COUNT(*) AS BIGINT) AS ncv
      |  FROM base GROUP BY 1, 2),
      | c AS (SELECT qi, CAST(SUM(ncv) AS BIGINT) AS nc FROM cv GROUP BY 1),
      | g AS (SELECT v, CAST(SUM(ncv) AS BIGINT) AS nv FROM cv GROUP BY 1),
      | tot AS (SELECT CAST(SUM(ncv) AS BIGINT) AS n FROM cv),
      | pres AS (SELECT cv.qi,
      |   CAST(SUM(ABS(CAST(tot.n AS HUGEINT) * cv.ncv
      |     - CAST(c.nc AS HUGEINT) * g.nv)) AS HUGEINT) AS dpres,
      |   CAST(SUM(g.nv) AS BIGINT) AS nvpres
      |  FROM cv JOIN c ON c.qi = cv.qi JOIN g ON g.v = cv.v
      |  CROSS JOIN tot GROUP BY 1)
      | SELECT c.qi AS nation_key, c.nc AS n_rows,
      |  CAST(round(CAST(pres.dpres
      |     + CAST(c.nc AS HUGEINT) * (tot.n - pres.nvpres) AS DOUBLE)
      |    / (2.0 * c.nc * tot.n) * 1000000000000.0) AS BIGINT) AS emd_pico,
      |  CAST(round(CAST(pres.dpres
      |     + CAST(c.nc AS HUGEINT) * (tot.n - pres.nvpres) AS DOUBLE)
      |    / (2.0 * c.nc * tot.n) * 1000000000000.0) AS BIGINT)
      |   > 200000000000 AS at_risk
      | FROM pres JOIN c ON c.qi = pres.qi CROSS JOIN tot
      | ORDER BY nation_key""".stripMargin.replace("\n", " ")
}
