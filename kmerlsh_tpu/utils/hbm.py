"""Device-memory-aware batch sizing.

The reference hard-codes a 100 M-row out-of-core batch (app/kmerLSH.cc:285)
because its unit of memory is host RAM (2 B × samples × rows,
kmerLSH.cc:292-295). Here the unit is device HBM: one mode-C session holds
the uint16 count batch, the f32 [S, cap] profile state, its sort copy, the
segmented-scan accumulators, and a handful of i32 lane arrays.

Two sizing sources:

  * **measured** — :func:`measure_per_row_bytes` runs the real head program
    at two small capacities and differences the device's
    ``peak_bytes_in_use``; the result is disk-cached per (platform, S).
    Used automatically when the decision matters (the matrix exceeds the
    static estimate) so a wrong constant can no longer silently OOM or
    halve a design-point run.
  * **static fallback** — the hand-derived per-row model below, validated
    on v5e (15.75 GB usable): a 2^26 × 20 session needs ~18 GB (OOM),
    2^25 × 20 fits.
"""

from __future__ import annotations

import json
import math
import os

# static fallback: bytes per k-mer row as a function of sample count S:
#   counts uint16 (2S) + f32 state ×3 live copies (12S) + ~13 i32/f32 lane
#   arrays (keys, proj, slots, parent, scan flags/sums, sort temps)
_PER_ROW_LANES = 64

# v5e design-point observations (round 4, BASELINE.md "Design points"):
# one mode-C session at S=20 on a 15.75 GB-usable v5e behind a stat-less
# backend (no peak_bytes_in_use available):
#   * 2^25 rows ran with NO OOM; session footprint modeled ~9 GB from the
#     residual headroom → ~268 B/row at S=20;
#   * 2^26 rows OOM'd in the single-fused path (~18 GB requested).
# The hand model (14S + 64 = 344 B/row at S=20) overestimates because XLA
# frees the uint16 counts + one f32 copy before the sort temps peak; the
# overestimate sits in the S-proportional term, so the observed correction
# is applied to THAT term only (ADVICE r4: a flat ratio measured at S=20
# cannot be assumed for other sample counts).
V5E_OBSERVATION = {
    "num_samples": 20,
    "rows_fit": 1 << 25,
    "session_peak_bytes": 9_000_000_000,
    "rows_oom": 1 << 26,
}
# B/row at the observed S (=268 for the round-4 observation)
_OBSERVED_PER_ROW = round(V5E_OBSERVATION["session_peak_bytes"]
                          / V5E_OBSERVATION["rows_fit"])
# per-sample bytes implied by the observation once the lane term is removed
_OBSERVED_S_BYTES = ((_OBSERVED_PER_ROW - _PER_ROW_LANES)
                     / V5E_OBSERVATION["num_samples"])     # ≈ 10.2

_CAL_PATH = os.path.expanduser("~/.cache/kmerlsh_tpu/hbm_calibration.json")


def _per_row_bytes(num_samples: int) -> int:
    return 14 * num_samples + _PER_ROW_LANES


def _tpu_static_per_row(num_samples: int) -> int:
    """Static per-row estimate for stat-less TPU backends, anchored on the
    recorded v5e observation: the S-proportional term uses the observed
    ~10.2 B/sample (never below the irreducible 2S uint16 counts + 8S for
    two live f32 copies), the lane term stays at the hand model's 64 B."""
    s_term = max(10 * num_samples,
                 math.ceil(_OBSERVED_S_BYTES * num_samples))
    return s_term + _PER_ROW_LANES


def device_memory_bytes(default: int = 16 << 30) -> int:
    """Memory limit of the default device; ``default`` when the backend
    doesn't report one (e.g. virtual CPU devices)."""
    try:
        import jax

        dev = jax.devices()[0]
        stats = dev.memory_stats() or {}
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if limit:
            return int(limit)
    except Exception:
        pass
    return default


def measure_per_row_bytes(num_samples: int,
                          cap_small: int = 1 << 16) -> int | None:
    """Empirical bytes/row: run the head program (the session's peak-memory
    phase — transform + deep init + sort temps all live) at ``cap_small``
    and ``2·cap_small`` and difference the device peak. Returns None when
    the backend reports no memory stats (virtual CPU) or the measurement
    is invalid (an earlier larger program already owns the peak)."""
    import jax
    import numpy as np

    from kmerlsh_tpu.cluster import engine

    dev = jax.devices()[0]
    if not (dev.memory_stats() or {}).get("bytes_limit"):
        return None

    rng = np.random.default_rng(0)
    peaks = []
    for cap in (cap_small, 2 * cap_small):
        counts = rng.integers(1, 100, size=(num_samples, cap)).astype(
            np.uint16)
        v = np.zeros(num_samples, np.float32)
        thr = np.asarray([0.95, 0.9, 0.85], np.float32)
        out = engine._head_program(
            engine.upload_counts(counts)[0], v,
            jax.random.PRNGKey(0), thr, 4, "chain", True)
        jax.block_until_ready(out)
        peaks.append((dev.memory_stats() or {}).get("peak_bytes_in_use", 0))
    if peaks[1] <= peaks[0]:
        return None
    return int(math.ceil((peaks[1] - peaks[0]) / cap_small))


def _cached_per_row_bytes(num_samples: int) -> int | None:
    """Disk-cached measured bytes/row for (platform, num_samples)."""
    import jax

    key = f"{jax.default_backend()}_S{num_samples}"
    cal = {}
    try:
        with open(_CAL_PATH) as f:
            cal = json.load(f)
    except OSError:
        pass
    if key in cal:
        return cal[key]
    measured = measure_per_row_bytes(num_samples)
    if measured is None:
        return None
    cal[key] = measured
    os.makedirs(os.path.dirname(_CAL_PATH), exist_ok=True)
    with open(_CAL_PATH, "w") as f:
        json.dump(cal, f)
    return measured


def rows_budget(num_samples: int, n_devices: int = 1, fill: float = 0.6,
                per_row: int | None = None, mem: int | None = None,
                kmap_size: int | None = None) -> int:
    """Largest power-of-two row count whose mode-C session fits in
    ``fill`` × HBM across ``n_devices`` (capacities pad to powers of two,
    so the budget is returned as one).

    When ``kmap_size`` is given and exceeds the static estimate — i.e. the
    budget actually decides between single-batch and out-of-core — the
    session measures bytes/row empirically (disk-cached, one-time) and
    sizes from that with a higher fill (the measurement already includes
    sort transients)."""
    if mem is None:
        mem = device_memory_bytes()
    if per_row is None:
        per_row = _per_row_bytes(num_samples)
        static_rows = int(mem * fill * n_devices / per_row)
        if kmap_size is not None and kmap_size > static_rows:
            measured = _cached_per_row_bytes(num_samples)
            if measured:
                per_row, fill = measured, 0.8
            else:
                try:
                    import jax

                    on_tpu = jax.default_backend() == "tpu"
                except Exception:
                    on_tpu = False
                if on_tpu:
                    # backend reports no memory stats (e.g. tunneled
                    # devices): use the observation-anchored static model
                    # (V5E_OBSERVATION). The raised fill is only justified
                    # near the calibrated sample count — at distant S the
                    # bytes/row composition is unverified, so the
                    # conservative default fill stands (ADVICE r4)
                    per_row = _tpu_static_per_row(num_samples)
                    s0 = V5E_OBSERVATION["num_samples"]
                    if s0 / 2 <= num_samples <= s0 * 2:
                        fill = 0.8
    rows = int(mem * fill * n_devices / per_row)
    return max(1 << 16, 1 << int(math.floor(math.log2(max(rows, 1)))))
