"""Batched two-sample pooled Student's t-test on device.

Replaces the per-cluster ``alglib::studentttest2`` calls
(function/funcAB.cc:99; alglib statistics.cpp:12502-12625) with one
vectorized pass over all clusters. Semantics match alglib exactly:

  s     = sqrt( (SSx + SSy) · (1/n + 1/m) / (n + m − 2) )
  stat  = (x̄ − ȳ) / s
  left  = P(T_{n+m−2} ≤ stat),  right = 1 − left,  both = 2·min(left, right)
  s = 0 degenerate: left = [x̄ ≥ ȳ], right = [x̄ ≤ ȳ], both = [x̄ = ȳ]

Tail→group mapping (``AB::WRS``, funcAB.cc:86-105): only clusters with
size > size_thresh are tested; lefttail ≤ p ⇒ the cluster's k-mers join
**group 2**, else righttail ≤ p ⇒ **group 1**.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def t_cdf(t: jax.Array, df: jax.Array) -> jax.Array:
    """Student's t CDF via the regularized incomplete beta function."""
    x = df / (df + t * t)
    ib = jax.scipy.special.betainc(df / 2.0, 0.5, x)
    return jnp.where(t >= 0, 1.0 - 0.5 * ib, 0.5 * ib)


@partial(jax.jit, static_argnames=("n1", "n2"))
def studentttest2(values: jax.Array, n1: int, n2: int):
    """values f32 [N, n1+n2] (group A columns first, funcAB.cc:87-92).

    Returns (bothtails, lefttail, righttail), each [N].
    """
    x = values[:, :n1].astype(jnp.float32)
    y = values[:, n1 : n1 + n2].astype(jnp.float32)
    xm = jnp.mean(x, axis=1)
    ym = jnp.mean(y, axis=1)
    ss = jnp.sum((x - xm[:, None]) ** 2, axis=1) + jnp.sum(
        (y - ym[:, None]) ** 2, axis=1
    )
    df = n1 + n2 - 2
    s = jnp.sqrt(ss * (1.0 / n1 + 1.0 / n2) / jnp.maximum(df, 1))
    ok = (s > 0) & (df > 0)
    stat = (xm - ym) / jnp.where(ok, s, 1.0)
    p = t_cdf(stat, jnp.float32(df))
    left = jnp.where(ok, p, (xm >= ym).astype(jnp.float32))
    right = jnp.where(ok, 1.0 - p, (xm <= ym).astype(jnp.float32))
    both = jnp.where(ok, 2.0 * jnp.minimum(p, 1.0 - p),
                     (xm == ym).astype(jnp.float32))
    return both, left, right


def wrs_verdicts(
    values, sizes, n1: int, n2: int, pval_thresh: float, size_thresh: int
):
    """Vectorized ``AB::WRS`` over all clusters.

    Returns int8 [N]: 0 = not significant / too small, 1 = group 1
    (righttail ≤ p), 2 = group 2 (lefttail ≤ p; checked first, matching
    the if/else-if at funcAB.cc:101-105).
    """
    values = jnp.asarray(values)
    sizes = jnp.asarray(sizes)
    _, left, right = studentttest2(values, n1, n2)
    tested = sizes > size_thresh
    verdict = jnp.where(
        left <= pval_thresh, 2, jnp.where(right <= pval_thresh, 1, 0)
    ).astype(jnp.int8)
    return jnp.where(tested, verdict, 0).astype(jnp.int8)
