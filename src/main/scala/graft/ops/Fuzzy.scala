package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy) string matching without the quadratic join.
  *
  * Entity resolution, OCR/typo-candidate detection, and vocabulary
  * repair all reduce to "find every pair of strings within Levenshtein
  * distance 1" — but the naive formulation is an all-pairs cross join
  * with a per-pair edit-distance call: O(n²) comparisons no cluster
  * survives at corpus-vocabulary or customer-directory scale.
  *
  * The scalable formulation is the SymSpell symmetric-delete
  * neighborhood join (Garbe's public-domain algorithm): every string
  * generates its single-character-deletion variants plus itself, and
  * two distinct strings are within Levenshtein distance 1 **iff** their
  * variant sets intersect:
  *
  *   - substitution at position i → both share the delete-at-i variant;
  *   - insert/delete → the longer string's delete-at-i variant IS the
  *     shorter string, which kept itself as its 0-deletion variant.
  *
  * The construction is EXACT for distance ≤ 1 — no candidate is ever
  * missed. A shared variant can also arise at distance 2 ("abc"/"adc"
  * share "ac"), so a cheap codegen'd `levenshtein` re-check on the
  * candidate pairs — candidate-sized, not n²-sized — discards those.
  *
  * Cluster shape: O(n·L) variant rows, ONE hash-partitioned equi-join
  * on the variant string, no cross join anywhere in the plan. Hot
  * variants (a short variant shared by many strings) fan out as an
  * ordinary skewed join key — AQE skew splitting applies; the variant
  * length floor (`minLen`) removes the degenerate single-character
  * buckets entirely.
  */
object Fuzzy {

  /** Self-join of `df`'s distinct non-null `col` values at Levenshtein
    * distance exactly 1, via the deletion-neighborhood equi-join.
    * Shorthand for `editJoin(df, strCol, maxDist = 1)`.
    */
  def editJoin1(df: DataFrame, strCol: String, minLen: Int = 2): DataFrame =
    editJoin(df, strCol, maxDist = 1, minLen = minLen)

  /** One deletion pass: for every (`__w`, `in`) row, emit (`__w`, v)
    * where v ranges over `in` itself (position 0) and every
    * single-character deletion of `in`. Spelled as an explode over the
    * position sequence with plain substr/concat — NOT as nested
    * higher-order array functions, which Spark evaluates interpreted
    * (per-row lambda dispatch, no codegen) and which measured ~4×
    * slower here; Generate + string builtins stay in whole-stage
    * codegen.
    */
  private def deletionPass(rel: DataFrame, in: String, out: String): DataFrame = {
    val x = col(in)
    val i = col("__i")
    rel.select(col("__w"), x,
      explode(sequence(lit(0), length(x))).as("__i"))
      .select(col("__w"), when(i === 0, x)
        .otherwise(concat(x.substr(lit(1), i - 1),
          x.substr(i + 1, length(x)))).as(out))
  }

  /** Self-join of `df`'s distinct non-null `col` values at Levenshtein
    * distance in [1, `maxDist`], via the symmetric-delete neighborhood
    * equi-join. `maxDist` ∈ {1, 2} — the completeness guarantee is the
    * SymSpell invariant: if lev(u,v) = k, deleting the ≤ k unmatched
    * characters of an optimal alignment from EACH side yields the same
    * string, so u and v share a ≤ k-deletion variant. The candidate set
    * therefore misses nothing; the `levenshtein` re-check (candidate-
    * sized, codegen'd) makes it exact.
    *
    * Variant fan-out is 1 + L for maxDist 1 and O(L²/2) for maxDist 2
    * (~190 variants for an 18-char string) — variant rows are the unit
    * of shuffle cost, so size `maxDist` to the error model, not "2 to
    * be safe".
    *
    * `minLen` drops strings shorter than this bound before pairing
    * (default 2: 1-char strings pair with every other 1-char string
    * through the empty-string variant — a useless hot bucket; raise it
    * to maxDist+1 to keep the shortest admitted strings from meeting
    * the empty variant).
    *
    * Output: (name_a, name_b, dist) with name_a < name_b, one row per
    * unordered pair, ordered by (name_a, name_b). `dist` ≥ 1 always:
    * inputs are distinct, so distance 0 cannot occur.
    */
  def editJoin(df: DataFrame, strCol: String, maxDist: Int,
      minLen: Int = 2): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"maxDist must be 1 or 2, got $maxDist")
    val words = df.select(col(strCol).as("__w"))
      .filter(col("__w").isNotNull && length(col("__w")) >= minLen)
      .distinct()
    // the 0-deletion variant (the word itself) seeds the set; each
    // deletion pass extends it by one more deletion everywhere
    val d1 = deletionPass(words.withColumn("__v", col("__w")), "__v", "__v")
    val raw = if (maxDist == 1) d1 else deletionPass(d1, "__v", "__v")
    // dedup (word, variant) BEFORE the join: strings with repeated
    // characters produce the same variant from several deletion
    // positions ("…000…" deletes any of the zeros to one variant), and
    // every duplicate multiplies the join's candidate fan-out.
    //
    // The exchange is an EXPLICIT hash repartition on __v with a pinned
    // partition count, for an AQE blind spot this join hits head-on:
    // AQE coalesces shuffles by INPUT bytes, and the variant relation
    // is small — but the self-join's output is Σ bucket² , up to
    // orders of magnitude larger. Left to AQE the whole join collapses
    // into one task and the candidate verification runs serially
    // (measured 4.9 s of a 6.6 s query in one task at sf0.1). Pinning
    // __v partitioning does triple duty: the count survives AQE, the
    // (__w, __v) dedup needs no second exchange (hash(__v) already
    // co-locates equal pairs), and both join sides reuse the same
    // exchange (ReuseExchange) — one shuffle total, wide all the way.
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val variants = raw.repartition(parts, col("__v")).dropDuplicates()
    val a = variants.select(col("__w").as("name_a"), col("__v"))
    val b = variants.select(col("__w").as("name_b"), col("__v"))
    a.join(b, "__v")
      .filter(col("name_a") < col("name_b"))
      // candidate-sized re-check: a shared variant overestimates
      // distance-closeness (e.g. "abd"/"bcd" share "bd" at distance 2
      // when maxDist = 1); everything at distance ≤ maxDist survives.
      // The distance is computed BEFORE the pair dedup, in the wide
      // post-join stage: AQE sizes the dedup'd exchange by bytes, so a
      // modest candidate set coalesces to few partitions — a re-check
      // placed after the distinct would run near-serial there, while
      // here it rides the join's full parallelism AND shrinks the
      // distinct's input to true pairs only
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("name_a", "name_b", "dist")
      .distinct()
      .orderBy("name_a", "name_b")
  }
}
