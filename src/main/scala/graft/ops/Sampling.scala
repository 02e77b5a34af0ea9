package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{graft => bridge}

import graft.functions.BottomK

/** Deterministic bounded sampling for corpus curation.
  *
  * Web-scale pre-training corpora are dominated by a few giant domains;
  * the standard fix (RefinedWeb/C4 practice) is a PER-DOMAIN document
  * cap. The naive Spark spelling — `row_number() OVER (PARTITION BY
  * domain ORDER BY md5(id)) <= cap` — sorts every row of the hottest
  * domain inside one window partition, exactly the whale-key hazard the
  * funnel rewrite removed. Here selection runs through the bounded
  * [[graft.functions.BottomK]] aggregate instead: per-partial state is a
  * cap-sized heap, partials combine map-side, and the shuffle carries at
  * most `cap` entries per (partition, domain) no matter how hot the
  * domain.
  *
  * Selection order is `md5(id)` — a deterministic uniform permutation,
  * so the kept set is a true uniform cap-sample per domain, reproducible
  * across retries, repartitionings, and engines (the property that makes
  * a sampled corpus versionable; seeded `rand()` has neither).
  */
object Sampling {

  private def bottomK(sortKey: Column, payload: Column, k: Int): Column =
    bridge.column(BottomK(
      bridge.expression(sortKey), bridge.expression(payload), k)
      .toAggregateExpression())

  private def md5Of(id: Column): Column = md5(id.cast("string"))

  /** The BottomK samplers carry the id through the heap as a LONG
    * payload; a non-integral id would cast to NULL and be silently
    * skipped by the aggregate — the sample would come back EMPTY instead
    * of erroring (round-5 advice). Fail loudly at plan time instead.
    */
  private def requireIntegralId(df: DataFrame, idCol: String): Unit = {
    val t = df.schema(idCol).dataType
    require(Seq[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.LongType).contains(t),
      s"id column '$idCol' is ${t.sql}, but the BottomK sampler payload " +
        "is a long — a non-integral id casts to NULL and every row would " +
        "be silently skipped; use an integral id (or number rows first)")
  }

  /** Kept (domain, id) pairs: at most `cap` ids per domain, chosen by the
    * md5 permutation. One shuffle (domain-keyed aggregate with bounded
    * partials); the explode output is ≤ cap rows per domain.
    */
  def domainCapIds(df: DataFrame, idCol: String, domainCol: String,
      cap: Int): DataFrame = {
    requireIntegralId(df, idCol)
    df.groupBy(domainCol)
      .agg(bottomK(md5Of(col(idCol)), col(idCol).cast("long"), cap).as("__keep"))
      .select(col(domainCol), explode(col("__keep")).as(idCol))
  }

  /** Full surviving rows: the kept-id relation joined back as a
    * distributed semi join on (domain, id) — no broadcast assumption, the
    * kept side is ≤ cap × |domains| and both sides shuffle on the same
    * key (same posture as [[Dedup.incrementalDedup]]).
    */
  def domainCap(df: DataFrame, idCol: String, domainCol: String,
      cap: Int): DataFrame =
    df.join(domainCapIds(df, idCol, domainCol, cap),
        Seq(domainCol, idCol), "left_semi")
      .select(df.columns.map(col).toIndexedSeq: _*)

  /** Deterministic uniform n-sample of the whole table (a reservoir
    * sample with the randomness replaced by the md5 permutation): global
    * [[BottomK]] over md5(id). Every partial carries ≤ n pairs, so the
    * single-group final merge sees (#partitions × n) entries — n is
    * sample-sized (10³–10⁵), never corpus-sized.
    */
  def uniformSampleIds(df: DataFrame, idCol: String, n: Int): DataFrame = {
    requireIntegralId(df, idCol)
    df.agg(bottomK(md5Of(col(idCol)), col(idCol).cast("long"), n).as("__keep"))
      .select(explode(col("__keep")).as(idCol))
  }

  /** Deterministic WEIGHTED sample without replacement of exactly `n`
    * ids (Efraimidis–Spirakis A-ES): each row draws its uniform from
    * the md5 permutation — u = (first-8-hex-digits + 0.5) / 2³² ∈
    * (0, 1), exact in double — and the n smallest exponential keys
    * e = −ln(u)/w win, which gives every subset the A-ES
    * weighted-without-replacement distribution. P(included) rises with
    * `weightCol`; rows with null/non-positive weight never qualify.
    *
    * Determinism has the same versionability argument as
    * [[uniformSampleIds]] (the "randomness" is the id hash, so retries,
    * repartitionings, and other engines agree), with one extra scaling
    * property the tests pin: multiplying ALL weights by a constant
    * rescales every key by the same factor and leaves the sample
    * unchanged — quotas tune RELATIVE weights only.
    *
    * `orderBy(key).limit(n)` plans as TakeOrderedAndProject:
    * per-partition bounded top-n, then an n-row merge — never a global
    * sort, the same bounded-selection posture as the BottomK samplers.
    */
  def weightedSampleIds(df: DataFrame, idCol: String, weightCol: String,
      n: Int): DataFrame = {
    val ui = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    val u = (ui.cast("double") + 0.5) / 4294967296.0
    val e = -log(u) / col(weightCol).cast("double")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(idCol), e.as("__e"))
      .orderBy(col("__e"), col(idCol))
      .limit(n)
      .select(idCol)
  }
}
