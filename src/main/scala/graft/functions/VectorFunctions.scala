package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float>` embeddings.
  *
  * Baseline implementations use array higher-order functions
  * (`zip_with` + `aggregate`), which stay inside whole-stage codegen —
  * no UDF/serialization cost, scales with bytes scanned. All math is done
  * in double precision regardless of the input element type so results are
  * stable across engines.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm2(a) * norm2(b)
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => {
      val diff = x.cast("double") - y.cast("double")
      diff * diff
    }), lit(0.0), (acc, v) => acc + v))

  /** Random-hyperplane (SimHash) signature for cosine LSH: `nBits` sign
    * bits packed into a long. Hyperplanes are pseudo-random but
    * deterministic: component j of plane i is a hash-derived value in
    * [-0.5, 0.5). With dim<=64 embeddings and nBits<=24 this is a cheap
    * per-row O(nBits*dim) codegen'd computation.
    */
  def hyperplaneSignature(vec: Column, nBits: Int, dim: Int, seed: Long = 42L): Column = {
    require(nBits <= 63, "signature must fit a long")
    // planes as one literal matrix + indexed HOFs: a compact expression
    // (O(1) tree size) instead of nBits*dim inlined multiply-adds, so
    // codegen stays small no matter the signature width
    val planes: Seq[Seq[Double]] = (0 until nBits)
      .map(i => (0 until dim).map(j => hashToUnit(seed, i, j)))
    val bits = transform(typedLit(planes), (plane, i) => {
      val d = aggregate(zip_with(plane, vec, (w, x) => w * x.cast("double")),
        lit(0.0), (acc, v) => acc + v)
      when(d >= 0.0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))
    })
    val sig = aggregate(bits, lit(0L), (acc, b) => acc.bitwiseOR(b))
    // length-mismatched vectors → NULL, matching the native kernel exactly
    // (zip_with would otherwise null-pad and silently yield signature 0)
    when(size(vec) === dim, sig).otherwise(lit(null).cast("long"))
  }

  /** Per-vector symmetric int8 quantization scale: max |x|. Zero for the
    * all-zero vector (quantized form is then all zeros too). */
  def int8Scale(vec: Column): Column =
    aggregate(vec, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** Symmetric int8 quantization against a precomputed `scale` column:
    * q = floor(x * 127 / scale + 0.5) — explicit half-up via floor so the
    * rounding rule is engine-portable (round() half-even vs half-away
    * differs across engines). 4 bytes → 1 byte per dimension; at 100 TB of
    * embeddings that is the difference between spilling and not. */
  def int8Quantize(vec: Column, scale: Column): Column =
    when(scale === 0.0, transform(vec, _ => lit(0)))
      .otherwise(transform(vec,
        x => floor(x.cast("double") * lit(127.0) / scale + lit(0.5)).cast("int")))

  /** L2 reconstruction error of the int8 round-trip, computed from the
    * raw vector and scale alone (the quantized value is recomputed
    * per element, so no second array column is carried). */
  def int8ReconError(vec: Column, scale: Column): Column = {
    val sq = transform(vec, x => {
      val xd = x.cast("double")
      val q = when(scale === 0.0, lit(0.0))
        .otherwise(floor(xd * lit(127.0) / scale + lit(0.5)))
      val r = q * scale / lit(127.0)
      (xd - r) * (xd - r)
    })
    sqrt(aggregate(sq, lit(0.0), (acc, v) => acc + v))
  }

  /** Johnson–Lindenstrauss random projection with a SIGN matrix
    * (Achlioptas 2003, the database-friendly ±1 construction):
    * `out_j = (Σ_i s(i,j)·v_i) / sqrt(outDim)` with `s(i,j) ∈ {−1,+1}`
    * drawn from the ENGINE-PORTABLE integer hash
    * `((i·131 + j)·2654435761 + 104729) mod 1e9+7 mod 2` — exact 64-bit
    * arithmetic with no overflow wrap (ANSI engines refuse wrapping
    * multiplies; the SplitMix finalizer used for the LSH hyperplanes is
    * deliberately NOT reused here, it needs wrapping 64-bit semantics an
    * oracle can't replay). Pairwise distances are preserved in
    * expectation with ~1/sqrt(outDim) distortion — the cheap first-stage
    * compression before SQ8/PQ when raw dims are wide.
    *
    * Pure map-side column, O(dim·outDim) per row; the inner sum is a
    * sequential left fold so the double arithmetic is bit-reproducible.
    * Empty input projects to an empty array; null propagates. */
  def randomProject(vec: Column, outDim: Int): Column = {
    require(outDim > 0, "outDim must be positive")
    val proj = transform(sequence(lit(0), lit(outDim - 1)), j =>
      aggregate(
        sequence(lit(0), size(vec) - 1), lit(0.0),
        (acc, i) => {
          val h = ((i.cast("long") * lit(131L) + j.cast("long")) *
            lit(2654435761L) + lit(104729L)) % lit(1000000007L)
          val s = when(h % lit(2L) === 0L, lit(-1.0)).otherwise(lit(1.0))
          acc + s * element_at(vec, (i + 1).cast("int")).cast("double")
        }) / sqrt(lit(outDim.toDouble)))
    // the isNull guard comes FIRST: size(null) is null, which would fall
    // through a bare size >= 1 test to the empty-array branch — null must
    // propagate (the l2Normalize contract), not silently become []
    when(vec.isNull, lit(null).cast("array<double>"))
      .when(size(vec) >= 1, proj)
      .otherwise(array().cast("array<double>"))
  }

  /** Unit-L2 normalization — the standard pre-ANN step (cosine becomes a
    * dot product; IVF/PQ codebooks train on comparable magnitudes). The
    * norm is a sequential left fold bound ONCE via the single-element
    * transform trick (a bare reference inside the per-element lambda
    * would re-reduce the whole vector per element — interpreted HOFs do
    * no CSE). All-zero and empty vectors normalize to themselves; null
    * propagates. Pure map-side. */
  def l2Normalize(vec: Column): Column =
    element_at(transform(array(
      sqrt(aggregate(vec, lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")))), n =>
      when(n === 0.0, transform(vec, x => x.cast("double")))
        .otherwise(transform(vec, x => x.cast("double") / n))), 1)

  /** Deterministic pseudo-random weight in [-0.5, 0.5).
    *
    * Full SplitMix64-style finalizer (Steele et al., "Fast splittable
    * pseudorandom number generators", OOPSLA'14). The earlier xor-mul-xor
    * half-finalizer left adjacent seeds (seed, seed+1, ...) visibly
    * correlated, which broke multi-table LSH: OR-amplified tables seeded
    * 42..42+L were far from independent and measured per-pair recall sat
    * ~5 sigma below the (1-p^bits)^L prediction. With the full scramble
    * the measured collision counts match the independence model. */
  private[graft] def hashToUnit(seed: Long, i: Int, j: Int): Double = {
    var h = seed * 0x9E3779B97F4A7C15L + i.toLong * 0xC2B2AE3D27D4EB4FL +
      j.toLong * 0x165667B19E3779F9L
    h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
    h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
    h ^= h >>> 31
    (h >>> 11).toDouble / (1L << 53).toDouble - 0.5
  }
}
