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
