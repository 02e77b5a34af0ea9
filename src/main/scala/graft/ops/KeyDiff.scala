package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{Canon, DiffConfig}

/** Keyed full-outer diff of two datasets — the reference's flagship
  * `keyDiff` (`/root/reference/src/index.js:128-223`), re-expressed as a
  * distributed full-outer equi-join instead of a driver-side sort-merge
  * loop.
  *
  * Semantics carried over (SURVEY §7.4):
  *   - composite key = ordered top-level field list;
  *   - compat mode stringifies key parts and maps null → "null" so two
  *     null-keyed rows match (`src/index.js:272-278`);
  *   - every row is classified `added | removed | changed | unchanged`;
  *   - changed rows carry a per-field structural diff. Unlike the
  *     reference (which loses deleted values, `src/index.js:26-28`), we
  *     keep both old and new values.
  *
  * Duplicate keys (SURVEY §7.4.3): the reference pairs them positionally
  * 1:1 (`src/index.js:183-220`); a relational join cross-products. By
  * default run [[DataTests.keyUniqueness]] first — the reference's own
  * data test does the same (`src/dataTest.js:4-25`) — or set
  * [[graft.core.DiffConfig.positionalDupKeys]] for strict 1:1 pairing.
  *
  * Scale notes: the join shuffles both sides by the normalized key and
  * Spark plans a SortMergeJoin (or shuffled hash under AQE); nothing is
  * ever materialized on the driver. If one side is dimension-sized the
  * caller can `broadcast()` it before calling.
  */
object KeyDiff {

  val StatusCol = "status"
  val ChangedFieldsCol = "changed_fields"

  /** Normalized key column, reference-compat: `String(row[f])` with
    * `null`/missing → "null" (`src/index.js:272-278`).
    */
  def compatKey(c: Column): Column = coalesce(c.cast("string"), lit("null"))

  /** Full-outer keyed diff.
    *
    * Output columns: one per key field (normalized, original names), then
    * `status`, `old` / `new` payload structs (null on the absent side), and
    * `changed_fields: map<field, struct<old_value, new_value>>` (non-empty
    * only for status = changed).
    */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keys: Seq[String],
      cfg: DiffConfig = DiffConfig()): DataFrame = {
    val o0 = cfg.project(oldDf)
    val n0 = cfg.project(newDf)
    val (oldCols, newCols) = (o0.columns.toSeq, n0.columns.toSeq)
    // Schema drift (cfg.schemaDrift): widen both sides to the union
    // schema, nulls for a side's absent columns. Which columns a side
    // LACKED is remembered so key stringification can keep the
    // reference's String(undefined) ≠ String(null) distinction.
    val (o, n, cols, oldAbsent, newAbsent) =
      if (newCols == oldCols)
        (o0, n0, oldCols, Set.empty[String], Set.empty[String])
      else {
        require(cfg.schemaDrift,
          s"old/new schemas differ: $oldCols vs $newCols " +
            "(set DiffConfig.schemaDrift = true to diff across drift)")
        val union = oldCols ++ newCols.filterNot(oldCols.contains)
        val types = (o0.schema.fields ++ n0.schema.fields)
          .map(f => f.name -> f.dataType).toMap
        val clash = union.filter(f =>
          o0.schema.fields.find(_.name == f).map(_.dataType)
            .zip(n0.schema.fields.find(_.name == f).map(_.dataType))
            .exists { case (a, b) => a != b })
        require(clash.isEmpty, s"drifted columns change type: $clash")
        def widen(df: DataFrame, have: Seq[String]): DataFrame =
          df.select(union.map(f =>
            if (have.contains(f)) df(f)
            else lit(null).cast(types(f)).as(f)): _*)
        (widen(o0, oldCols), widen(n0, newCols), union,
          union.filterNot(oldCols.contains).toSet,
          union.filterNot(newCols.contains).toSet)
      }
    // Top-level keys must exist; dotted paths (nested struct fields — the
    // reference's explicit TODO, src/index.js:24-25) resolve via df(f).
    val missing = keys.filterNot(f => cols.contains(f) || f.contains('.'))
    require(missing.isEmpty, s"key fields not in schema: $missing")

    // Internal key aliases are positional so dotted key paths can't be
    // misparsed as struct access in later col() references.
    val keyAlias = keys.indices.map(i => s"__k_$i")

    def keyed(df: DataFrame, payload: String, absent: Set[String]): DataFrame = {
      val ks = keys.zip(keyAlias).map { case (f, a) =>
        val c =
          if (cfg.stringKeys)
            // key field not in this side's schema: JS String(undefined),
            // NOT String(null) — src/index.js:272-278. Native typed mode
            // uses the widened null column (absent ≡ null, SQL semantics).
            if (absent.contains(f)) lit("undefined") else compatKey(df(f))
          else df(f)
        c.as(a)
      }
      val base =
        df.select((ks :+ struct(cols.map(df.col): _*).as(payload)).toIndexedSeq: _*)
      if (!cfg.positionalDupKeys) base
      else {
        // Occurrence number per key, ordered by the payload's string form
        // (struct ordering rejects map-typed fields; the string cast is
        // total and deterministic — identical payloads tie arbitrarily,
        // which pairs them with identical rows either way). The window
        // shuffles on the same key hash the join needs, so it adds a sort,
        // not an exchange.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyAlias.map(col): _*)
          .orderBy(col(payload).cast("string"))
        base.withColumn("__k_pos", row_number().over(w))
      }
    }

    val joinKeys =
      if (cfg.positionalDupKeys) keyAlias :+ "__k_pos" else keyAlias
    val joined = keyed(o, "old", oldAbsent)
      .join(keyed(n, "new", newAbsent), joinKeys, "full_outer")

    val oldP = col("old")
    val newP = col("new")
    val fieldTypes = o.schema.fields.map(f => f.name -> f.dataType).toMap
    // Map-typed fields are not directly comparable — canonicalize for the
    // equality checks (SURVEY §7.5), but keep original values in the output.
    def fieldEq(f: String): Column =
      Canon.nullSafeEq(oldP.getField(f), newP.getField(f), fieldTypes(f))
    val payloadEq = cols.map(fieldEq).reduce(_ && _)
    val status = when(oldP.isNull, lit("added"))
      .when(newP.isNull, lit("removed"))
      .when(payloadEq, lit("unchanged"))
      .otherwise(lit("changed"))

    // Schema-driven field diff (reference O11, `detailedDiff` at
    // src/index.js:205) as pure Catalyst expressions — stays in codegen.
    // Like the reference's deep-object-diff, STRUCT fields recurse to the
    // changed LEAF paths (dotted keys, e.g. "info.priority") instead of
    // reporting the whole nested blob; arrays and maps compare atomically
    // (SURVEY O11). A struct that is null on exactly one side reports at
    // the struct's own path (leaf-wise recursion cannot distinguish
    // "missing struct" from "struct of nulls", so presence changes get
    // their own entry and leaves only compare when both sides are
    // present).
    import org.apache.spark.sql.types.{DataType, StructType}
    def leafEntries(path: String, dt: DataType, oc: Column, nc: Column,
        gate: Column): Seq[Column] = dt match {
      case st: StructType =>
        val presence = struct(
          lit(path).as("key"),
          when(gate && (oc.isNull =!= nc.isNull),
            struct(
              oc.cast("string").as("old_value"),
              nc.cast("string").as("new_value"))).as("value"))
        presence +: st.fields.toSeq.flatMap { sf =>
          leafEntries(s"$path.${sf.name}", sf.dataType,
            oc.getField(sf.name), nc.getField(sf.name),
            gate && oc.isNotNull && nc.isNotNull)
        }
      case _ =>
        Seq(struct(
          lit(path).as("key"),
          when(gate && !Canon.nullSafeEq(oc, nc, dt),
            struct(
              oc.cast("string").as("old_value"),
              nc.cast("string").as("new_value"))).as("value")))
    }
    val entries = cols.flatMap { f =>
      leafEntries(f, fieldTypes(f), oldP.getField(f), newP.getField(f), lit(true))
    }
    val changed = map_from_entries(
      filter(array(entries.toIndexedSeq: _*), e => e.getField("value").isNotNull))

    val keyOut = keys.zip(keyAlias).map { case (f, a) => col(a).as(f) }
    joined.select(
      (keyOut ++ Seq(
        status.as(StatusCol),
        oldP,
        newP,
        when(status === "changed", changed).as(ChangedFieldsCol)
      )).toIndexedSeq: _*)
  }

  /** Count per status — the reference's printed summary lines
    * (`src/index.js:148-152`) as an aggregate, never a collect-all.
    */
  def summary(diffed: DataFrame): DataFrame =
    diffed.groupBy(StatusCol).count().orderBy(StatusCol)

  /** Slowly-changing-dimension Type-2 history from two keyed snapshots:
    * every surviving version of every key becomes a row with
    * `valid_from` / `valid_to` (null = still open) / `is_current` —
    * the warehouse-standard way to keep history when upstream only
    * ships full snapshots.
    *
    *   - unchanged → one open row carrying the OLD effective date (the
    *     version predates this snapshot pair);
    *   - changed   → the old version closed at `newDate` + the new
    *     version opened at `newDate`;
    *   - removed   → the old version closed at `newDate`;
    *   - added     → the new version opened at `newDate`.
    *
    * Single-pass on top of [[diff]]: the up-to-2 versions per key are
    * built as an array in the diff join's projection and exploded —
    * no second shuffle, no union of re-scans. Incremental use: feed
    * each new snapshot against the previous one and append the rows
    * whose `valid_from = newDate`, replacing closed versions by key.
    *
    * Output: the payload columns, then `valid_from`, `valid_to`
    * (date; null while open) and `is_current`.
    */
  def scdType2(
      oldDf: DataFrame,
      newDf: DataFrame,
      keys: Seq[String],
      oldDate: Column,
      newDate: Column,
      cfg: DiffConfig = DiffConfig()): DataFrame = {
    val d = diff(oldDf, newDf, keys, cfg)
    def version(payload: Column, from: Column, to: Column,
        current: Boolean): Column =
      struct(payload.as("row"), from.cast("date").as("valid_from"),
        to.cast("date").as("valid_to"), lit(current).as("is_current"))
    val noDate = lit(null).cast("date")
    val closedOld = version(col("old"), oldDate, newDate, current = false)
    val openOld = version(col("old"), oldDate, noDate, current = true)
    val openNew = version(col("new"), newDate, noDate, current = true)
    val versions = when(col(StatusCol) === "unchanged", array(openOld))
      .when(col(StatusCol) === "changed", array(closedOld, openNew))
      .when(col(StatusCol) === "removed", array(closedOld))
      .otherwise(array(openNew))
    d.select(explode(versions).as("__v"))
      .select(col("__v.row.*"), col("__v.valid_from").as("valid_from"),
        col("__v.valid_to").as("valid_to"),
        col("__v.is_current").as("is_current"))
  }

  /** Apply an EXTERNAL CDC changeset to a keyed snapshot — MERGE INTO
    * semantics over Debezium-style change rows, producing the next
    * snapshot. Complements [[patch]] (which replays this engine's own
    * diff format): here the changes arrive from an upstream log as
    * `(keys..., payload..., op, seq)` rows with op ∈ I/U/D and a
    * per-key monotone sequence number (an LSN — required unique per
    * key, which every CDC log guarantees).
    *
    * Semantics (warehouse MERGE):
    *   - several changes to one key → the HIGHEST-seq change wins;
    *   - latest op I or U → the change's row image (I on an existing
    *     key and U on an absent key both behave as upsert — the
    *     image is authoritative, matching MERGE ... WHEN [NOT] MATCHED);
    *   - latest op D → the key is absent from the result;
    *   - key untouched by the changeset → the snapshot row survives.
    *
    * Shape at scale: latest-change-per-key is a `max_by` aggregate
    * (one shuffle, single-row state per key — never a per-key window
    * sort of the change log), then ONE full-outer join on the key.
    * Both sides shuffle on the same key, so a snapshot partitioned by
    * key reuses its layout; nothing is collected or broadcast.
    */
  def applyChangeset(snapshot: DataFrame, changes: DataFrame,
      keys: Seq[String], opCol: String = "op",
      seqCol: String = "seq"): DataFrame = {
    val nonKey = snapshot.columns.filterNot(keys.contains).toSeq
    val image = struct((col(opCol).as("__op") +: nonKey.map(col)): _*)
    val latest = changes.groupBy(keys.map(col): _*)
      .agg(max_by(image, col(seqCol)).as("__c"))
    snapshot.as("s").join(latest, keys, "full_outer")
      .filter(col("__c").isNull || col("__c.__op") =!= "D")
      .select(keys.map(col) ++ nonKey.map { n =>
        when(col("__c").isNotNull, col(s"__c.$n"))
          .otherwise(col(s"s.$n")).as(n)
      }: _*)
  }

  /** INCREMENTAL VIEW MAINTENANCE of per-group sum/count aggregates
    * under a CDC changeset: produce the aggregate of the post-merge
    * snapshot by combining the stored aggregate with a DELTA derived
    * from the changed keys alone — the operation that keeps a 100 TB
    * rollup current without re-scanning 100 TB per batch.
    *
    * Delta derivation touches only changeset-sized relations plus ONE
    * key-selective join into the old snapshot (the before-images of
    * changed keys — a point-lookup pattern on key-partitioned storage):
    *   - a key's old row (if any) contributes (−value, −1) to its OLD
    *     group — also when an update MOVES the row between groups;
    *   - the latest change's row image (op I/U) contributes
    *     (+value, +1) to its NEW group; a D contributes nothing.
    * Groups whose maintained count reaches zero are dropped (exactly
    * what re-aggregating the merged snapshot would show).
    *
    * Correctness contract (tested differentially, and the oracle
    * restates it): `incrementalAgg(snap, stored, changes) ≡
    * groupBy(agg(applyChangeset(snap, changes)))` whenever `stored` is
    * the aggregate of `snap`. Call with an EXACT value type (integer
    * or decimal): exact addition is associative, so the incremental
    * sum is bit-equal to the re-scan sum — float sums are not, which
    * is why the query casts money to DECIMAL before maintaining it.
    *
    * Output: (groupCols…, sum_value, n_rows) of the maintained view —
    * the SAME shape `storedAgg` expects, so batch N's output is batch
    * N+1's stored input and the snapshot-wide aggregate is computed
    * exactly once, at bootstrap.
    */
  def incrementalAgg(snapshot: DataFrame, storedAgg: DataFrame,
      changes: DataFrame, keys: Seq[String], groupCols: Seq[String],
      valueCol: String, opCol: String, seqCol: String): DataFrame = {
    val kc = keys.map(col)
    val gc = groupCols.map(col)
    val image = struct(
      (col(opCol).as("__op") +: (groupCols :+ valueCol).map(col)): _*)
    val latest = changes.groupBy(kc: _*)
      .agg(max_by(image, col(seqCol)).as("__c"))
    // before-images of exactly the changed keys; the explicit existence
    // flag (not `__old_v IS NOT NULL`) makes a stored row whose VALUE is
    // null still retract its count when deleted or moved
    val before = snapshot
      .select((kc ++ groupCols.map(g => col(g).as(s"__old_$g")) :+
        col(valueCol).as("__old_v") :+ lit(true).as("__old_exists")): _*)
    val contribs = latest.join(before, keys, "left")
      .select(explode(array(
        // retract the old row from its old group (no flag = no old row)
        struct(groupCols.map(g => col(s"__old_$g").as(g)) :+
          (-col("__old_v")).as("__v") :+
          when(col("__old_exists"), -1L).otherwise(0L).as("__n"): _*),
        // insert the new image into its new group unless the latest op is D
        struct(groupCols.map(g =>
          when(col("__c.__op") =!= "D", col(s"__c.$g")).as(g)) :+
          when(col("__c.__op") =!= "D", col(s"__c.$valueCol")).as("__v") :+
          when(col("__c.__op") =!= "D", 1L).otherwise(0L).as("__n"): _*)
      )).as("__d"))
      .select(col("__d.*"))
      .filter(col("__n") =!= 0L)
    val delta = contribs.groupBy(gc: _*)
      .agg(sum(col("__v")).as("__dv"), sum(col("__n")).as("__dn"))
    val stored = storedAgg.select(
      (groupCols.map(g => col(g).as(s"__s_$g")) :+
        col("sum_value").as("__sv") :+ col("n_rows").as("__sn")): _*)
    // null-safe merge (<=>): a null group KEY is one group to groupBy,
    // so it must be ONE group here too — a plain equi-join would split
    // it into two output rows
    val cond = groupCols
      .map(g => stored(s"__s_$g") <=> delta(g)).reduce(_ && _)
    stored.join(delta, cond, "full_outer")
      .select((groupCols.map(g =>
        coalesce(col(s"__s_$g"), col(g)).as(g)) ++ Seq(
        // both sides null (e.g. retracting a null-valued row from an
        // all-null group) must stay null, exactly like re-aggregation
        when(col("__sv").isNull && col("__dv").isNull, lit(null))
          .otherwise(coalesce(col("__sv"), lit(0)) +
            coalesce(col("__dv"), lit(0)))
          .as("sum_value"),
        (coalesce(col("__sn"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as("n_rows"))): _*)
      .filter(col("n_rows") > 0)
  }

  /** Bootstrap convenience: derive the stored aggregate from the
    * snapshot, then maintain it. This pays ONE full-snapshot
    * aggregation — fine for the first batch or a one-shot call; a
    * production maintenance loop must pass its persisted rollup to the
    * stored-agg overload above so later batches never touch the
    * snapshot beyond the key-selective before-image join.
    */
  def incrementalAgg(snapshot: DataFrame, changes: DataFrame,
      keys: Seq[String], groupCols: Seq[String], valueCol: String,
      opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    val stored = snapshot.groupBy(groupCols.map(col): _*)
      .agg(sum(col(valueCol)).as("sum_value"), count(lit(1)).as("n_rows"))
    incrementalAgg(snapshot, stored, changes, keys, groupCols, valueCol,
      opCol, seqCol)
  }

  /** Reconstruct a snapshot from a diff: the diff is lossless (both
    * payloads are kept), so `patch(diff(old, new)) ≡ new` and
    * `patch(diff(old, new), forward = false) ≡ old` — as multisets of
    * rows. A CDC "apply changes" step for free; useful for shipping diffs
    * instead of snapshots (the diff is usually a small fraction of the
    * data).
    */
  def patch(diffed: DataFrame, forward: Boolean = true): DataFrame = {
    val (dropStatus, takeCol) =
      if (forward) ("removed", "new") else ("added", "old")
    diffed.filter(col(StatusCol) =!= dropStatus)
      .select(col(takeCol).as("__row"))
      .select("__row.*")
  }
}
