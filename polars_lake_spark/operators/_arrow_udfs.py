"""Arrow-batched vectorized UDF builders (guide §4.2: let Spark do the
distribution, hand whole batches to numpy).

NB: no ``from __future__ import annotations`` here — it stringifies the
pandas_udf type hints and Spark's signature parser rejects them (same
rule as operators/bpe.py).

Every function here is BIT-IDENTICAL to a pure-column-expression twin
kept in its caller's module; the twins exist as equality witnesses for
the test suite, so a Spark hash-implementation change can never silently
diverge the Arrow path.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf

# Published XXH64 constants (xxHash spec; Spark's XxHash64 uses seed 42
# and chains multi-column hashes value-by-value).
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def make_ivf_assign_udf(cent_rows):
    """pandas UDF: (v array<double>, nrm double) -> int nearest-centroid
    cell id, bit-identical to the literal-centroid expression twin
    ``ivf._assign_expr`` (guide §4.2 — the Lloyd fold through numpy
    instead of interpreted HOF aggregates, and a compact plan instead of
    a k×dim literal tree that Catalyst re-analyzes per pass).

    Exact-replay rules reproduced from the expression twin:

    * dot(v, cv) is the LEFT-TO-RIGHT fold ``((0.0+p0)+p1)+...`` over
      per-element products — replayed column-by-column so every IEEE
      add/mul happens in the twin's order (bit-identical doubles);
    * sim = dot / (nrm * cnrm), same two ops;
    * argmax follows Spark's struct ordering on (sim, -cell_id): NaN is
      GREATEST, ties go to the smallest cell id;
    * a NULL / wrong-length / null-element vector makes every sim NULL
      in the twin, whose struct max then falls through to the smallest
      cell id — mirrored here as an explicit bad-row rule.

    ``cent_rows`` is the collected [(cell_id, cv, cnrm), ...] sorted by
    cell_id (the codebook pattern — k rows of driver metadata)."""
    import numpy as np

    cells = [int(c) for c, _, _ in cent_rows]
    C = np.asarray([list(cv) for _, cv, _ in cent_rows], dtype=np.float64)
    cn = np.asarray([float(x) for _, _, x in cent_rows], dtype=np.float64)
    k, d = C.shape

    @pandas_udf("int")
    def _assign(vs: pd.Series, nrms: pd.Series) -> pd.Series:
        import numpy as np

        n = len(vs)
        M = np.zeros((n, d), dtype=np.float64)
        bad = np.zeros(n, dtype=bool)
        # NULL elements inside a vector need no special case: Arrow hands
        # them over as NaN, every centroid's sim then goes NaN uniformly,
        # and the NaN-tie rule lands on the smallest cell — exactly where
        # the twin's all-NULL sims land.
        for i, v in enumerate(vs):
            if v is None or len(v) != d:
                bad[i] = True
            else:
                M[i] = np.asarray(v, dtype=np.float64)
        nr = nrms.to_numpy(dtype=np.float64, na_value=np.nan)
        old = np.seterr(all="ignore")
        try:
            best_sim = None
            best_cell = None
            for j in range(k):
                prod = M * C[j]
                acc = np.zeros(n, dtype=np.float64)
                for col in range(d):
                    acc = acc + prod[:, col]
                div = nr * cn[j]
                # ANSI parity: the twin's division THROWS on an exactly-
                # zero divisor with a non-NULL numerator (Spark 4 default)
                # — a zero-norm vector/centroid must not silently assign
                if np.any(~bad & (div == 0.0)):
                    raise ArithmeticError(
                        "DIVIDE_BY_ZERO: zero norm in IVF assignment "
                        "(matches the expression twin's ANSI division)"
                    )
                sim = acc / div
                if best_sim is None:
                    best_sim = sim
                    best_cell = np.full(n, cells[j], dtype=np.int64)
                else:
                    nb = np.isnan(best_sim)
                    ns = np.isnan(sim)
                    better = (ns & ~nb) | (~ns & ~nb & (sim > best_sim))
                    best_sim = np.where(better, sim, best_sim)
                    best_cell = np.where(better, cells[j], best_cell)
            best_cell = np.where(bad, cells[0], best_cell)
            return pd.Series(best_cell.astype("int32"))
        finally:
            np.seterr(**old)

    return _assign


def make_minhash_sig_udf(num_perm):
    """pandas UDF: array<bigint> base-hash column -> array<bigint> of
    ``num_perm`` signed mins of xxhash64(base, i), i in [0, num_perm).

    Spark semantics reproduced exactly: ``xxhash64(h, i)`` with a long
    ``h`` and int ``i`` is XXH64_int(i, seed=XXH64_long(h, 42)); mins
    compare SIGNED (array_min over bigint).  Empty/NULL base arrays map
    to all-NULL signatures (array_min of an empty array is NULL)."""
    n_perm = int(num_perm)

    @pandas_udf("array<bigint>")
    def _sig(bases: pd.Series) -> pd.Series:
        import numpy as np

        u = np.uint64
        P1, P2, P3, P4, P5 = u(_P1), u(_P2), u(_P3), u(_P4), u(_P5)
        old = np.seterr(over="ignore")
        try:
            i_mix = (np.arange(n_perm, dtype=np.uint64) & u(0xFFFFFFFF)) * P1
            out = []
            for b in bases:
                if b is None or len(b) == 0:
                    out.append([None] * n_perm)
                    continue
                v = np.asarray(b, dtype=np.int64).astype(np.uint64)
                # XXH64_long(v, seed=42)
                acc = u(42) + P5 + u(8)
                k1 = v * P2
                k1 = ((k1 << u(31)) | (k1 >> u(33))) * P1
                h = acc ^ k1
                h = ((h << u(27)) | (h >> u(37))) * P1 + P4
                h ^= h >> u(33)
                h *= P2
                h ^= h >> u(29)
                h *= P3
                h ^= h >> u(32)
                # XXH64_int(i, seed=h) over the (shingles × perms) grid
                m = (h[:, None] + P5 + u(4)) ^ i_mix[None, :]
                m = ((m << u(23)) | (m >> u(41))) * P2 + P3
                m ^= m >> u(33)
                m *= P2
                m ^= m >> u(29)
                m *= P3
                m ^= m >> u(32)
                out.append(m.view(np.int64).min(axis=0))
            return pd.Series(out)
        finally:
            np.seterr(**old)

    return _sig
