package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Lossless blocked edit-distance (Levenshtein) similarity join — the
 * string-matching face of the record-linkage family beside
 * [[graft.operators.Fuzzy]] (trigram cosine) and
 * [[graft.ops.TextDedup]] (Jaccard): find every cross pair within
 * `maxDist` edits without the quadratic cross product.
 *
 * Candidate generation is the Ed-Join prefix-filter scheme (Xiao,
 * Wang & Lin, VLDB 2008 — public algorithm, no code consulted):
 *
 *  - `ed(s,t) <= k` lets at most `k*q` q-gram occurrences differ, so
 *    the DISTINCT-gram sets satisfy `|S \ T| <= k*q`, and under any
 *    global total order on grams the smallest COMMON gram must sit
 *    within the first `k*q + 1` grams of BOTH sorted sets — so pairs
 *    are generated only from a `k*q + 1`-gram prefix per string,
 *    sorted rarest-first (document frequency, then gram). Rarest-first
 *    keeps stopword-grade grams ("00", "er") out of the join unless a
 *    string has nothing rarer, which is what keeps postings lists —
 *    and therefore the candidate join — near-linear on low-entropy
 *    key spaces at 100 TB.
 *  - The shared-gram guarantee itself needs an unedited run of length
 *    `q` to survive, which holds whenever the LONGER string has
 *    `len >= q*(k+1) + k` (k edits split it into <= k+1 unedited runs
 *    covering len-k chars). Pairs where both strings are shorter than
 *    that bound can share zero grams at `ed <= k`, so they flow
 *    through a separate equi path: each short left string replicates
 *    onto candidate lengths `len-k .. len+k` and equi-joins short
 *    right strings on exact length — `2k+1` replication of a
 *    length-bounded subset, no theta join, no BNLJ. The two paths
 *    partition the pair space (`max(len) >= bound` vs both below),
 *    so nothing is produced twice and nothing is missed.
 *
 * Verification is exact and codegen'd: Spark's banded
 * `levenshtein(l, r, threshold)` (O(k·n) with early exit, -1 when the
 * distance exceeds the threshold) over the candidate pairs only.
 *
 * Scale shape: gram/prefix assembly is one exploded-gram aggregate
 * per side (O(total chars), sharded by id); the candidate join is
 * keyed on rare prefix grams; verification joins strings back by id —
 * every join equi-keyed, every aggregate partially combined map-side.
 *
 * Output: (leftId, rightId, dist: int), one row per qualifying pair.
 * The id column names must differ (rename one side before calling).
 */
object EditJoin {

  def editJoin(left: DataFrame, leftId: String, leftStr: String,
               right: DataFrame, rightId: String, rightStr: String,
               maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    require(q >= 1, s"q must be >= 1: $q")
    require(leftId != rightId,
      s"id columns must have distinct names, both are '$leftId'")
    val k = maxDist
    val prefLen = k * q + 1
    // both strings below this bound -> the shared-gram guarantee can
    // fail; such pairs take the length-replication path instead
    val bound = q * (k + 1) + k

    val a = left.select(col(leftId), col(leftStr).as("__sa"))
      .filter(col(leftId).isNotNull && col("__sa").isNotNull)
      .withColumn("__la", length(col("__sa")))
    val b = right.select(col(rightId), col(rightStr).as("__sb"))
      .filter(col(rightId).isNotNull && col("__sb").isNotNull)
      .withColumn("__lb", length(col("__sb")))

    def grams(str: Column, len: Column): Column =
      array_distinct(transform(
        sequence(lit(1), len - (q - 1)),
        i => str.substr(i, lit(q))))

    // gram frames only for strings long enough to have a gram at all
    val ga = a.filter(col("__la") >= q)
      .select(col(leftId), col("__la"),
        grams(col("__sa"), col("__la")).as("__g"))
    val gb = b.filter(col("__lb") >= q)
      .select(col(rightId), col("__lb"),
        grams(col("__sb"), col("__lb")).as("__g"))

    // global document frequency over BOTH sides = the rarity order
    val freq = ga.select(explode(col("__g")).as("__gram"))
      .unionAll(gb.select(explode(col("__g")).as("__gram")))
      .groupBy(col("__gram")).agg(count(lit(1)).as("__f"))

    def prefixes(g: DataFrame, idC: String, lenC: String): DataFrame = g
      .select(col(idC), col(lenC), explode(col("__g")).as("__gram"))
      .join(freq, "__gram")
      .groupBy(col(idC), col(lenC))
      .agg(slice(sort_array(collect_list(struct(col("__f"), col("__gram")))),
        1, prefLen).as("__pref"))
      .select(col(idC), col(lenC), explode(col("__pref")).as("__p"))
      .select(col(idC), col(lenC), col("__p.__gram").as("__gram"))

    val candLong = prefixes(ga, leftId, "__la")
      .join(prefixes(gb, rightId, "__lb"), "__gram")
      .filter(abs(col("__la") - col("__lb")) <= k &&
        greatest(col("__la"), col("__lb")) >= bound)
      .select(col(leftId), col(rightId))
      .distinct()

    // both-short pairs: replicate left onto its k-neighborhood of
    // lengths, equi-join right on exact length (each pair matches at
    // exactly one replicated length -> no dedup needed)
    val candShort = a.filter(col("__la") < bound)
      .select(col(leftId),
        explode(sequence(col("__la") - k, col("__la") + k)).as("__lk"))
      .join(b.filter(col("__lb") < bound)
        .select(col(rightId), col("__lb")),
        col("__lk") === col("__lb"))
      .select(col(leftId), col(rightId))

    candLong.unionAll(candShort)
      .join(a.select(col(leftId), col("__sa")), leftId)
      .join(b.select(col(rightId), col("__sb")), rightId)
      .select(col(leftId), col(rightId),
        levenshtein(col("__sa"), col("__sb"), k).as("dist"))
      .filter(col("dist") >= 0)
  }
}
