package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{Canon, DiffConfig}

/** Key-less multiset (bag) comparison of whole rows — the reference's
  * `vennDiff` (`/root/reference/src/index.js:65-116`):
  * removed = old ∖ new, added = new ∖ old, intersection = old ∩ new, all
  * with multiplicities.
  *
  * The reference streams each file into a count-map keyed by a canonical
  * JSON string of the row (`src/index.js:88-116`). In Spark the same
  * semantics are native multiset set-ops (`exceptAll` / `intersectAll`),
  * and the counted form is a single union + hash aggregate — one shuffle,
  * partial (map-side) aggregation, O(distinct rows) state, spillable.
  * No JSON serialization is needed: struct equality is canonical.
  */
object VennDiff {

  /** Project + canonicalize map-typed columns (exceptAll/intersectAll/
    * groupBy reject raw maps — SURVEY §7.5).
    */
  private def prep(df: DataFrame, cfg: DiffConfig): DataFrame =
    Canon.canonicalize(cfg.project(df))

  def removed(oldDf: DataFrame, newDf: DataFrame,
      cfg: DiffConfig = DiffConfig()): DataFrame =
    prep(oldDf, cfg).exceptAll(prep(newDf, cfg))

  def added(oldDf: DataFrame, newDf: DataFrame,
      cfg: DiffConfig = DiffConfig()): DataFrame =
    prep(newDf, cfg).exceptAll(prep(oldDf, cfg))

  def intersection(oldDf: DataFrame, newDf: DataFrame,
      cfg: DiffConfig = DiffConfig()): DataFrame =
    prep(oldDf, cfg).intersectAll(prep(newDf, cfg))

  /** Counted venn — the reference's `str → count` maps
    * (`src/index.js:95,108,113`) as one DataFrame: the distinct row plus
    * `old_count / new_count / removed / added / common`.
    *
    * Plan shape: union the two inputs with indicator columns, then a single
    * groupBy over the row columns. One shuffle total (vs three for
    * except/except/intersect), with map-side partial counts — the plan that
    * survives 100 TB.
    */
  /** Output metadata columns [[counted]] appends — reserved: an input
    * whose data columns intersect this set would be silently shadowed
    * by `withColumn` (and its rows dropped from report dumps), so
    * [[counted]] fails fast instead of producing a wrong answer on
    * arbitrary avro inputs. The internal union tags are `__vd_`-prefixed
    * for the same reason.
    */
  val ReservedCols: Set[String] =
    Set("old_count", "new_count", "removed", "added", "common",
      "__vd_o", "__vd_n")

  def counted(oldDf: DataFrame, newDf: DataFrame,
      cfg: DiffConfig = DiffConfig()): DataFrame = {
    val o = prep(oldDf, cfg)
    val n = prep(newDf, cfg)
    require(o.columns.sameElements(n.columns),
      s"old/new schemas differ: ${o.columns.toSeq} vs ${n.columns.toSeq}")
    val clash = o.columns.filter(ReservedCols)
    require(clash.isEmpty,
      s"input columns ${clash.toSeq} collide with vennDiff count columns " +
        s"$ReservedCols; rename or project them away (DiffConfig.keep/ignore)")
    val cols = o.columns.toSeq

    def tagged(df: DataFrame, oTag: Int, nTag: Int): DataFrame =
      df.select((cols.map(df.col) ++ Seq(
        lit(oTag.toLong).as("__vd_o"), lit(nTag.toLong).as("__vd_n"))).toIndexedSeq: _*)

    tagged(o, 1, 0).unionAll(tagged(n, 0, 1))
      .groupBy(cols.map(col).toIndexedSeq: _*)
      .agg(sum("__vd_o").as("old_count"), sum("__vd_n").as("new_count"))
      .withColumn("removed", greatest(col("old_count") - col("new_count"), lit(0L)))
      .withColumn("added", greatest(col("new_count") - col("old_count"), lit(0L)))
      .withColumn("common", least(col("old_count"), col("new_count")))
  }

  /** Three summary counts (rows in each region) — the reference's printed
    * stats (`src/index.js:57-62`), with the label swap bug at :60-61 fixed.
    */
  def summary(oldDf: DataFrame, newDf: DataFrame,
      cfg: DiffConfig = DiffConfig()): DataFrame =
    counted(oldDf, newDf, cfg).agg(
      sum("removed").as("removed"),
      sum("added").as("added"),
      sum("common").as("intersection"))
}
