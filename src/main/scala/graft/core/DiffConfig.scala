package graft.core

import org.apache.spark.sql.DataFrame

/** Immutable replacement for the reference's global mutable CONFIG
  * (`/root/reference/src/config.js:1-12`, mutator `setConfig` :8-12).
  *
  * @param schema        optional hard-coded reader schema (Avro JSON); `None`
  *                      reads the writer schema from the file header —
  *                      reference `src/index.js:393-401`.
  * @param keepFields    allow-list projection; `None` keeps all —
  *                      reference `src/index.js:40,43-45`.
  * @param ignoreFields  deny-list projection; `None` ignores none.
  * @param stringKeys    reference-compat key semantics: key parts are
  *                      stringified and nulls become the literal "null" so
  *                      null keys match each other (`src/index.js:272-278`).
  *                      `false` = native typed keys with SQL null semantics.
  * @param positionalDupKeys strict reference-compat duplicate-key pairing:
  *                      the reference's sort-merge loop pairs equal keys
  *                      1:1 positionally (`src/index.js:183-220`) where a
  *                      relational join cross-products. `true` appends a
  *                      per-key occurrence number (rows ordered by payload —
  *                      deterministic under any partitioning, unlike file
  *                      order which a distributed shuffle does not preserve)
  *                      to the join key, restoring 1:1 pairing: the i-th
  *                      old row of a key diffs against the i-th new row,
  *                      unpaired extras classify added/removed.
  * @param schemaDrift  allow the two sides to disagree on COLUMNS (schema
  *                      evolution between snapshots — the normal state of a
  *                      long-lived feed). Each side is widened to the union
  *                      schema with nulls for its absent columns; shared
  *                      columns must keep their type. Key parts follow the
  *                      reference's JS semantics exactly
  *                      (`src/index.js:272-278`): a key field ABSENT from a
  *                      side's schema stringifies as `String(undefined)` =
  *                      "undefined", distinct from a present-but-null value's
  *                      `String(null)` = "null" — so drifted keys never
  *                      silently collide with null keys. `false` (default)
  *                      keeps the strict same-schema requirement.
  *
  * No codec knob: the Avro source auto-detects null/deflate/snappy/zstd from
  * the file header (the reference needed a manual flag, `src/config.js:3`).
  */
final case class DiffConfig(
    schema: Option[String] = None,
    keepFields: Option[Seq[String]] = None,
    ignoreFields: Option[Seq[String]] = None,
    stringKeys: Boolean = true,
    positionalDupKeys: Boolean = false,
    schemaDrift: Boolean = false) {

  /** A field survives iff not ignored AND (no allow-list OR allowed) —
    * exactly the reference's `filteredSchema` (`src/index.js:43-45`), but
    * applied as a Catalyst projection so column pruning reaches the scan.
    */
  def project(df: DataFrame): DataFrame = {
    val kept = df.columns.filter { f =>
      !ignoreFields.exists(_.contains(f)) && keepFields.forall(_.contains(f))
    }
    if (kept.sameElements(df.columns)) df
    else df.select(kept.map(df.col).toIndexedSeq: _*)
  }
}
