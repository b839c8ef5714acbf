package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** THE value-grain banded-hamming near-miss operator — the one shape
  * behind every tolerant perceptual-dedup tier (video q331/q336,
  * image q334, audio q335, text simhash q337): given a fingerprint
  * relation, find every pair of rows whose fingerprints differ in
  * `hMin..hMax` bits, WITHOUT the all-pairs join.
  *
  * Mechanics (the q28/q29 LSH banding discipline, specialized to
  * hamming space):
  *
  *   1. each row's informative fingerprint bits are cut into disjoint
  *      sub-bands (`bandExprs`, caller-supplied bit slices);
  *   2. candidates equi-join on (eqKeys, band index, band value) —
  *      two fingerprints within hamming h of each other share at
  *      least one untouched sub-band whenever the band count exceeds
  *      h (pigeonhole), so the banding is LOSSLESS at
  *      hMax ≤ bands − 1;
  *   3. candidate pairs are deduped and verified exactly with
  *      `bit_count(xor)` summed over the fingerprint columns.
  *
  * The caller chooses the GRAIN by choosing the input relation: a
  * per-document relation gives doc pairs (q331); a distinct-value
  * relation carrying census counts gives value pairs (q334/q335/
  * q336/q337) — the scale form, because perceptual hashes collide
  * heavily and the value relation is bounded by fingerprint entropy,
  * never corpus size. Variable-width fingerprints (video clips of
  * differing sampled-frame counts) pass the width column in `eqKeys`
  * and mask padding bands out with `informativeBand`: banding a
  * zero-padded slice would make every short row a candidate of every
  * other — the degenerate bucket the filter exists to avoid.
  *
  * 100 TB: the exchange carries (band index, band value, fingerprint)
  * rows — bytes per row, rows = |input|·|bands|; candidate count
  * follows bucket occupancy, i.e. hash entropy, never |input|².
  * Completeness is proven by the callers' ORACLES, which state the
  * semantics as the plain all-pairs join — the hash match certifies
  * the banded candidate generation found every pair (the q28
  * discipline), and BandedHammingSpec pins the pigeonhole bound with
  * adversarial planted flips concentrated in single bands.
  */
object BandedHamming {

  /** Near-miss pairs over `rows`.
    *
    * @param rows       fingerprint relation (one row per doc or per
    *                   distinct value; caller pre-materializes if its
    *                   lineage is expensive — the self-join reads it
    *                   twice)
    * @param idCols     columns identifying a row; pairs are emitted
    *                   once with sides ordered lexicographically by
    *                   these columns (`_a` side strictly less)
    * @param fpCols     BIGINT fingerprint words; hamming distance is
    *                   the summed `bit_count(xor)` over them
    * @param bandExprs  disjoint bit-slice expressions over `rows`'s
    *                   columns, together covering every informative
    *                   fingerprint bit; ≥ hMax+1 informative bands per
    *                   row make the banding lossless
    * @param eqKeys     extra equality constraints (e.g. the sampled
    *                   frame count for variable-width fingerprints)
    * @param carry      extra columns carried through per side (e.g.
    *                   the value grain's census counts)
    * @param informativeBand optional filter over (row columns,
    *                   `band_idx`) masking padding bands out of the
    *                   candidate join
    * @param rowsB      optional SECOND relation (same schema contract)
    *                   for the CROSS-CORPUS form — e.g. an arriving
    *                   batch's values (`rows`, the `_a` side) probed
    *                   against a persisted corpus value index (the
    *                   `_b` side), the q94 incremental-dedup shape.
    *                   Pairs are (a, b) with no lexicographic dedup
    *                   (the sides are distinct universes), and callers
    *                   typically pass hMin = 0: an exact value match
    *                   against the index is the strongest signal
    * @return one row per near-miss pair: eqKeys once, then `_a`/`_b`
    *         suffixed idCols ∪ fpCols ∪ carry, then `hamming` (INT);
    *         unordered — callers sort for their oracle
    */
  def nearMissPairs(
      rows: DataFrame,
      idCols: Seq[String],
      fpCols: Seq[String],
      bandExprs: Seq[Column],
      eqKeys: Seq[String] = Nil,
      carry: Seq[String] = Nil,
      informativeBand: Option[Column] = None,
      hMin: Int = 1,
      hMax: Int = 3,
      rowsB: Option[DataFrame] = None): DataFrame = {
    require(bandExprs.size > hMax,
      s"${bandExprs.size} bands cannot be lossless at hamming $hMax " +
        "(pigeonhole needs at least hMax+1 disjoint bands)")
    val keep = (idCols ++ fpCols ++ carry).distinct
    def exploded(r: DataFrame): DataFrame = {
      val e = r.select(
        (eqKeys ++ keep).map(col) :+ posexplode(array(bandExprs: _*)): _*)
        .withColumnRenamed("pos", "band_idx")
        .withColumnRenamed("col", "band")
      informativeBand.map(e.where).getOrElse(e)
    }
    val aSide = keep.foldLeft(exploded(rows))(
      (df, c) => df.withColumnRenamed(c, s"${c}_a"))
    val bSide = (keep ++ eqKeys).foldLeft(exploded(rowsB.getOrElse(rows)))(
      (df, c) => df.withColumnRenamed(c, s"${c}_b"))
      .withColumnRenamed("band_idx", "band_idx_b")
      .withColumnRenamed("band", "band_b")
    val joinCond = (Seq(
      col("band_idx") === col("band_idx_b"),
      col("band") === col("band_b")) ++
      eqKeys.map(k => col(k) === col(s"${k}_b"))).reduce(_ && _)
    // self-join form: strict lexicographic order over idCols emits
    // every pair once; cross-corpus form: the sides are distinct
    // universes, every (a, b) pair stands
    val lexLt = idCols.indices.map { i =>
      idCols.take(i)
        .map(c => col(s"${c}_a") === col(s"${c}_b"))
        .foldLeft(col(s"${idCols(i)}_a") < col(s"${idCols(i)}_b"))(_ && _)
    }.reduce(_ || _)
    val hamming = fpCols
      .map(c => expr(s"bit_count(${c}_a ^ ${c}_b)"))
      .reduce(_ + _).cast("int")
    val pairCols = eqKeys.map(col) ++
      keep.flatMap(c => Seq(col(s"${c}_a"), col(s"${c}_b")))
    val joined = aSide.join(bSide, joinCond)
    (if (rowsB.isEmpty) joined.where(lexLt) else joined)
      .select(pairCols: _*)
      .distinct()
      .withColumn("hamming", hamming)
      .where(col("hamming") >= hMin && col("hamming") <= hMax)
  }

  /** The standard fixed-width band slices: `n` contiguous `width`-bit
    * slices of one BIGINT column, little-endian (slice j = bits
    * j·width .. j·width+width−1). The arithmetic shift's sign
    * extension is masked off, so bit 63 is safe. */
  def fixedBands(c: Column, n: Int, width: Int): Seq[Column] = {
    require(n * width <= 64, s"$n bands of $width bits exceed one BIGINT")
    // width = 64 would make the mask (1L << 64) - 1 == 0 (JVM shifts
    // are mod 64): every row lands in one constant bucket and the
    // candidate join degenerates to the all-pairs product — and a
    // single full-word band could never be lossless anyway
    require(width < 64, "a full-word band cannot mask (and cannot be lossless)")
    (0 until n).map(j =>
      shiftright(c, j * width).bitwiseAND(lit((1L << width) - 1)))
  }
}
