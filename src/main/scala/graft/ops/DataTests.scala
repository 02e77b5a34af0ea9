package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality assertions — the reference's key-uniqueness test
  * (`/root/reference/src/dataTest.js:4-25` and the Jest variant
  * `src/index.test.js:7-25`): no composite key may appear more than once.
  *
  * The reference walks all four diff buckets driver-side and collects key
  * strings into a Set; here it is a distributed groupBy-count, so the check
  * itself scales with the data.
  */
object DataTests {

  /** Keys appearing more than once, with their multiplicity. Empty ⇒ pass.
    * Accepts dotted nested paths like [[KeyDiff.diff]] does; internal
    * aliases are positional so a dotted name is never re-parsed as struct
    * access (same fix as KeyDiff).
    */
  def keyDuplicates(df: DataFrame, keys: Seq[String]): DataFrame = {
    val alias = keys.indices.map(i => s"__k_$i")
    val norm = keys.zip(alias).map { case (f, a) => KeyDiff.compatKey(df(f)).as(a) }
    df.select(norm.toIndexedSeq: _*)
      .groupBy(alias.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)
      .select((keys.zip(alias).map { case (f, a) => col(a).as(f) } :+
        col("dup_count")).toIndexedSeq: _*)
  }

  /** True iff `keys` is unique in `df` (reference `keyCollisionTest`). */
  def keyUniqueness(df: DataFrame, keys: Seq[String]): Boolean =
    keyDuplicates(df, keys).isEmpty

  /** Schema diff between two snapshots — the structural companion to the
    * row-level [[KeyDiff]]: which columns were added, removed, or changed
    * type between an old and a new file. Pure metadata (no data scan, no
    * job); nested struct fields are compared by dotted path so a type
    * change three levels down surfaces as its own row, mirroring how the
    * reference's per-row field diff reports nested paths.
    *
    * Output: (column, old_type, new_type, status ∈ added|removed|changed
    * |nullability_changed|unchanged), ordered by column. A type change
    * reports `changed` even when nullability also flipped (the type is
    * the bigger deal); `nullability_changed` fires only on a pure
    * required↔optional flip — the Avro-evolution case of a field's union
    * gaining or losing its null branch with the value type intact.
    */
  def schemaDiff(oldDf: DataFrame, newDf: DataFrame): Seq[(String, String, String, String)] = {
    def flatten(prefix: String,
        st: org.apache.spark.sql.types.StructType): Seq[(String, (String, Boolean))] =
      st.fields.toSeq.flatMap { f =>
        val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.dataType match {
          case s: org.apache.spark.sql.types.StructType => flatten(path, s)
          case dt => Seq(path -> ((dt.simpleString, f.nullable)))
        }
      }
    val o = flatten("", oldDf.schema).toMap
    val n = flatten("", newDf.schema).toMap
    (o.keySet ++ n.keySet).toSeq.sorted.map { c =>
      (o.get(c), n.get(c)) match {
        case (Some((t, _)), None) => (c, t, null, "removed")
        case (None, Some((t, _))) => (c, null, t, "added")
        case (Some((t1, _)), Some((t2, _))) if t1 != t2 => (c, t1, t2, "changed")
        case (Some((t1, n1)), Some((t2, n2))) if n1 != n2 =>
          (c, t1, t2, "nullability_changed")
        case (Some((t1, _)), Some((t2, _))) => (c, t1, t2, "unchanged")
        case (None, None) => throw new IllegalStateException("unreachable")
      }
    }
  }

  /** Referential-integrity check: child rows whose foreign key has no
    * match in the parent (orphans). A distributed LEFT ANTI join on the
    * key — both sides shuffle on it, no broadcast assumption, so the
    * check scales with the larger table like [[Dedup.incrementalDedup]].
    * Null foreign keys are reported separately (SQL FK semantics: a
    * null reference is not an orphan, but a pipeline usually wants to
    * see the count).
    *
    * Output: one row (n_child, n_null_fk, n_orphans, ri_ok).
    */
  def referentialIntegrity(child: DataFrame, parent: DataFrame,
      childKey: String, parentKey: String): DataFrame = {
    val fk = child.select(col(childKey).as("__fk"))
    val pk = parent.select(col(parentKey).as("__fk")).distinct()
    val orphans = fk.filter(col("__fk").isNotNull)
      .join(pk, Seq("__fk"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    val base = fk.agg(count(lit(1)).as("n_child"),
      sum(col("__fk").isNull.cast("long")).as("n_null_fk"))
    base.crossJoin(orphans)
      .select(col("n_child"), coalesce(col("n_null_fk"), lit(0L)).as("n_null_fk"),
        col("n_orphans"), (col("n_orphans") === 0L).as("ri_ok"))
  }

  /** Per-column profile — row count, null count, exact distinct count —
    * in ONE aggregation pass (Catalyst plans the multi-distinct via a
    * single Expand, so the table is scanned once however many columns are
    * profiled), then unpivoted to a long (column, stats) shape.
    *
    * The completeness/uniqueness sweep a pipeline runs before trusting a
    * new drop of data; `n_distinct` uses exact distinct so the DuckDB
    * oracle can hash-match (`approx_count_distinct` is the 100 TB knob —
    * one pass, no Expand, mergeable HLL state).
    */
  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = count(lit(1)).as("__n") +:
      cols.flatMap(c => Seq(
        sum(col(c).isNull.cast("long")).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__nd_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map(c => struct(
      lit(c).as("column_name"),
      col("__n").as("n_rows"),
      col(s"__nulls_$c").as("n_nulls"),
      col(s"__nd_$c").as("n_distinct")))
    wide.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** One-row "dataset card" for a document corpus — the headline numbers
    * a training run's data sheet opens with: volume (docs, chars),
    * exact-duplicate pressure (docs minus distinct content hashes),
    * language/source diversity, and the length profile (mean + exact
    * median).
    *
    * Scale shape: one multi-distinct aggregate pass (single scan via
    * Expand, like [[profile]]) crossed with the bounded distinct-value
    * length histogram of [[Quantiles.exactHistogram]] — both sides of
    * the final crossJoin are 1-row frames, nothing data-sized moves.
    * At 100 TB swap the exact distincts for `approx_count_distinct`
    * (mergeable HLL, no Expand) — kept exact here so the DuckDB oracle
    * hash-matches.
    *
    * Output: 1 row (n_docs, n_exact_dups, n_langs, n_sources,
    * total_chars, mean_chars, p50_chars).
    */
  def corpusCard(docs: DataFrame, textCol: String = "text",
      langCol: String = "lang", sourceCol: String = "source"): DataFrame = {
    val base = docs.select(md5(col(textCol)).as("__h"),
      length(col(textCol)).cast("long").as("__nc"),
      col(langCol).as("__lang"), col(sourceCol).as("__src"))
    val agg = base.agg(
      count(lit(1)).as("n_docs"),
      (count(lit(1)) - countDistinct(col("__h"))).as("n_exact_dups"),
      countDistinct(col("__lang")).as("n_langs"),
      countDistinct(col("__src")).as("n_sources"),
      sum(col("__nc")).as("total_chars"),
      round(avg(col("__nc")), 4).as("mean_chars"))
    val p50 = Quantiles.exactHistogram(base, Seq.empty, "__nc",
      Seq("p50_chars" -> 0.5))
      .select(round(col("p50_chars"), 4).as("p50_chars"))
    agg.crossJoin(broadcast(p50))
  }

  /** k-anonymity audit over a quasi-identifier combination — the release
    * gate for a published dataset: every combination of quasi-identifier
    * values shared by FEWER than `k` rows re-identifies its members
    * (Sweeney 2002), so the output must be EMPTY before the data ships.
    *
    * One mergeable groupBy-count on the quasi-identifier key — the audit
    * costs a single map-side-combined shuffle regardless of table size,
    * and the output is bounded by the number of VIOLATING combinations
    * (rare in a releasable dataset), never by rows.
    *
    * Output: one row per violating combination (quasi columns…, n),
    * ordered; empty ⇒ the table is k-anonymous on these columns.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
      .orderBy(quasiCols.map(col).toIndexedSeq: _*)
  }

  /** l-diversity release gate (Machanavajjhala et al. 2007) — the
    * follow-up to [[kAnonymity]]: a class of k identical quasi-identifier
    * rows still leaks if all k share one sensitive value (the "homogeneity
    * attack" k-anonymity cannot see). Each equivalence class must carry at
    * least `l` DISTINCT sensitive values.
    *
    * One groupBy with an exact count-distinct — Spark plans it as the
    * two-phase partial-distinct aggregate (dedup on (quasi, sensitive)
    * map-side, then count), so no class's raw rows ever collect anywhere.
    * Output: one row per violating class `(quasi…, n, n_sensitive)`,
    * bounded by classes, ordered; empty ⇒ the release is l-diverse.
    */
  /** Benford's-law first-digit audit — the classic fabricated-data /
    * fraud screen for magnitude-spanning positive measures (amounts,
    * populations, file sizes): natural multiplicative data puts digit d
    * first with probability log10(1 + 1/d); uniform-ish fabrication
    * shows up as a flat profile. One exact groupBy over the digit
    * (extracted via integer/string ops — no float log in the digit
    * path), shares as one division of exact counts, expected
    * probabilities rounded to 8 so both engines' libm agree bitwise.
    * Output: `(digit, n, share, benford_p, dev)`, 9 rows.
    */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val digit = substring(
      floor(col(valueCol)).cast("long").cast("string"), 1, 1)
    df.filter(col(valueCol) >= 1.0)
      .groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__tot", sum(col("n")).over(Window.partitionBy()))
      .select(col("digit"), col("n"),
        (col("n").cast("double") / col("__tot").cast("double"))
          .as("share"),
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 8)
          .as("benford_p"))
      .withColumn("dev", round(col("share") - col("benford_p"), 8))
      .orderBy("digit")
  }

  def lDiversity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(quasiCols.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .filter(col("n_sensitive") < l)
      .orderBy(quasiCols.map(col).toIndexedSeq: _*)
  }
}
