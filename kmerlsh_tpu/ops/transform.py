"""Abundance transform: raw uint16 counts → centered log-abundance rows.

Reference semantics (``IOMat::convertHTMat``, io/ioMatrix.cc:353-408):
  value[i, j] = log(count[j, i] + 1) − v_kmers[j]       (ioMatrix.cc:378)
  row i kept iff Σ_j count[j, i] > 0.1 · num_samples    (ioMatrix.cc:381)

The transform is a fused elementwise kernel on device; the keep-mask is
returned (no dynamic-shape filtering inside jit — the host compacts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def abundance_transform(counts: jax.Array, v_kmers: jax.Array):
    """counts: uint16/int32 [num_samples, batch] (sample-major, as stored in
    kmer_count.bin); v_kmers: f32 [num_samples].

    Returns (values f32 [batch, num_samples], keep bool [batch]).

    Row-major convenience twin kept for unit tests and external callers;
    the pipeline's hot path uses :func:`abundance_transform_t` (fused into
    the engine's head program, sample-major layout).
    """
    vt, keep = abundance_transform_t(counts, v_kmers)
    return vt.T, keep


@jax.jit
def abundance_transform_t(counts: jax.Array, v_kmers: jax.Array):
    """Transposed twin: returns (values_t f32 [num_samples, batch], keep).

    The count matrix is already sample-major, so this variant is a pure
    elementwise kernel (no relayout) and matches the engine's [S, M]
    state layout.
    """
    c = counts.astype(jnp.float32)  # [S, batch]
    values_t = jnp.log1p(c) - v_kmers[:, None].astype(jnp.float32)
    total = jnp.sum(counts.astype(jnp.int32), axis=0)
    keep = total.astype(jnp.float32) > 0.1 * counts.shape[0]
    return values_t, keep
