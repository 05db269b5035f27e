"""Device-memory-aware batch sizing.

The reference hard-codes a 100 M-row out-of-core batch (app/kmerLSH.cc:285)
because its unit of memory is host RAM (2 B × samples × rows,
kmerLSH.cc:292-295). Here the unit is device HBM: one mode-C session holds
the uint16 count batch, the f32 [S, cap] profile state, its sort copy, the
segmented-scan accumulators, and a handful of i32 lane arrays. The budget
below converts the device's memory limit into a row count so
``init_clustering`` slices batches that fit — measured on v5e (15.75 GB
usable): a 2^26 × 20 session needs ~18 GB (OOM), 2^25 × 20 fits.
"""

from __future__ import annotations

import math

# bytes per k-mer row as a function of sample count S:
#   counts uint16 (2S) + f32 state ×3 live copies (12S) + ~13 i32/f32 lane
#   arrays (keys, proj, slots, parent, scan flags/sums, sort temps)
_PER_ROW_LANES = 64


def _per_row_bytes(num_samples: int) -> int:
    return 14 * num_samples + _PER_ROW_LANES


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


def rows_budget(num_samples: int, n_devices: int = 1,
                fill: float = 0.6) -> int:
    """Largest power-of-two row count whose mode-C session fits in
    ``fill`` × HBM across ``n_devices`` (capacities pad to powers of two,
    so the budget is returned as one)."""
    per_dev = device_memory_bytes() * fill
    rows = int(per_dev * n_devices / _per_row_bytes(num_samples))
    return max(1 << 16, 1 << int(math.floor(math.log2(max(rows, 1)))))
