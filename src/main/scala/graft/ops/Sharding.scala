package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global shuffle + sharding of a training corpus.
  *
  * Before training, a corpus must be (a) shuffled so no shard carries
  * the ingest order's topical clumps, and (b) split into fixed shards a
  * data loader can stream independently. Doing this with `rand()` makes
  * the layout irreproducible across retries and engines; doing it with
  * a global `orderBy` + `ntile` drags the whole corpus through one
  * window. The deterministic formulation: the shuffle key is the md5 of
  * the row id (a fixed pseudo-random permutation, the same device the
  * suite's sampling family uses), the shard is a hex prefix of that key
  * mod `nShards`, and the within-shard position is the rank of the key
  * inside its shard.
  *
  * Cluster shape: ONE hash shuffle on the shard id, then a per-shard
  * sort. The per-shard window is the honest scale constraint: a shard
  * is sorted within one task, so `nShards` must be sized to make
  * corpus/nShards fit a task — which is exactly how training shards are
  * sized in practice (10⁴–10⁵ shards of ~0.1–1 GB at 100 TB, never 32
  * giant ones). Every step is engine-reproducible: same ids in, same
  * (shard, pos) out, on any partitioning, any retry, any SQL engine.
  */
object Sharding {

  /** Assign every row a (shard, pos) from the deterministic md5
    * permutation of `idCol`. Output: (idCol, shard, pos), ordered by
    * (shard, pos); pos is 1-based within its shard.
    */
  def shardShuffle(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val key = md5(col(idCol).cast("string"))
    // first 8 hex chars = 32 uniform bits; conv() parses them exactly,
    // and the value stays well under 2⁶³ so the mod is exact
    val shard = (conv(substring(key, 1, 8), 16, 10).cast("long")
      % nShards).as("shard")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__key"), col(idCol))
    df.select(col(idCol), key.as("__key"), shard)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
      .orderBy("shard", "pos")
  }
}
