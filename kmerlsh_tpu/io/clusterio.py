"""Cluster result files: ``<name>`` (float32 rows) + ``<name>.clust`` (text).

Reference formats (io/ioMatrix.cc):
  * ``.clust`` text — one line per cluster: ``size\\tid1\\tid2…``
    (SaveResult, ioMatrix.cc:265-294); clusters with size <= ignore_small
    are dropped (strict ``>`` at :281).
  * binary — the matching float32 centroid rows, ``num_samples`` floats per
    kept cluster, same order (SaveBinary, ioMatrix.cc:322-351).

Rendering and parsing are vectorized (one NumPy pass over the flat id
array, no per-id Python format/parse calls): the reference streams each id
through an ``ofstream`` (ioMatrix.cc:283-287), which is fine for C++ but a
per-id Python loop at the 1e7-id design point costs minutes.
"""

from __future__ import annotations

import numpy as np

from kmerlsh_tpu.cluster.groups import Groups, as_groups

try:  # optional C++ accelerator (native/_native.cc: render_clust)
    import _kmerlsh_native as _native
except ImportError:  # pragma: no cover
    _native = None


def _render_clust(flat: np.ndarray, sizes: np.ndarray) -> bytes:
    """``size\\tid…\\n`` rendering. Hot on the headline path (the final
    save of millions of clusters / tens of millions of ids): the native
    multithreaded itoa renderer streams tens of M ids/s, matching the
    reference's ofstream writer (io/ioMatrix.cc:283-287). NumPy fallback
    (~0.8 M ids/s) when the extension isn't built."""
    sizes = np.ascontiguousarray(sizes, dtype=np.int64)
    if flat.dtype == np.int64 and flat.flags.c_contiguous:
        flat = flat.view(np.uint64)   # ids are nonnegative: free reinterpret
    else:
        flat = np.ascontiguousarray(flat, dtype=np.uint64)
    if _native is not None and hasattr(_native, "render_clust"):
        offs = np.ascontiguousarray(
            np.concatenate([[0], np.cumsum(sizes)]), dtype=np.int64)
        return _native.render_clust(flat, offs)  # zero-copy buffer protocol
    g = len(sizes)
    offs = np.concatenate([[0], np.cumsum(sizes)])
    total = int(offs[-1]) + 2 * g
    out = np.empty(total, dtype=object)
    gpos = np.arange(g, dtype=np.int64)
    out[offs[:-1] + 2 * gpos] = sizes.astype("U20")
    out[offs[1:] + 2 * gpos + 1] = "\n"
    egroup = np.repeat(gpos, sizes)
    out[np.arange(len(flat)) + 2 * egroup + 1] = np.char.add(
        "\t", flat.astype("U20"))
    return "".join(out.tolist()).encode()


def save_result(
    ids_list, path: str, append: bool = False, ignore_small: int = 0,
) -> None:
    g = as_groups(ids_list)
    kept = g.select(g.sizes > ignore_small)
    with open(path, "ab" if append else "wb") as f:
        f.write(_render_clust(kept.flat, kept.sizes))


def save_binary(
    values: np.ndarray, ids_list, path: str,
    append: bool = False, ignore_small: int = 0, dtype: str = "<f4",
) -> None:
    """``dtype`` is "<f4" for the reference-format final artifact
    (SaveBinary, ioMatrix.cc:322-351); the out-of-core TMP rounds pass
    "<f2" — tmp files are internal, and half-precision centroids halve the
    tunnel/disk bytes while staying ~1e-3-accurate, far below what the
    0.8-0.95 cosine thresholds can resolve (see
    test_out_of_core_f16_tmp_matches_f32)."""
    values = np.asarray(values, dtype=dtype)
    g = as_groups(ids_list)
    keep = np.flatnonzero(g.sizes > ignore_small)
    with open(path, "ab" if append else "wb") as f:
        f.write(values[keep].tobytes())


def read_cluster_all(
    path: str, num_samples: int, dtype: str = "<f4"
) -> tuple[np.ndarray, Groups]:
    """Read every cluster (= ReadClusterAll, ioMatrix.cc:48-120).
    Values always come back float32 regardless of the on-disk ``dtype``."""
    values = np.fromfile(path, dtype=dtype).reshape(-1, num_samples)
    ids = _read_clust(path + ".clust")
    if len(ids) != len(values):
        raise ValueError(
            f"{path}: {len(values)} binary rows vs {len(ids)} .clust lines"
        )
    return values.astype(np.float32, copy=False), ids


def read_cluster(
    path: str, num_samples: int, start_line: int, num_lines: int,
    dtype: str = "<f4",
) -> tuple[np.ndarray, Groups]:
    """Read a [start_line, start_line+num_lines) window (= ReadCluster,
    ioMatrix.cc:122-199). Values come back float32."""
    mm = np.memmap(path, dtype=dtype, mode="r").reshape(-1, num_samples)
    values = np.asarray(mm[start_line : start_line + num_lines])
    ids = _read_clust(path + ".clust", start_line, num_lines)
    return values.astype(np.float32, copy=False), ids


def save_matrix(
    values: np.ndarray, ids_list, path: str,
    append: bool = False, ignore_small: int = 0,
) -> None:
    """Tab-separated text centroid rows (= SaveMatrix, ioMatrix.cc:297-320).
    Vectorized: NumPy's C-level shortest-roundtrip float→str per token, no
    per-row Python loop (the rendered floats round-trip exactly through
    ``read_matrix``)."""
    values = np.asarray(values, dtype=np.float32)
    g = as_groups(ids_list)
    kept = values[g.sizes > ignore_small]
    with open(path, "a" if append else "w") as f:
        if kept.size:
            toks = kept.astype("U16")
            sep = np.full(kept.shape, "\t", dtype="U1")
            sep[:, -1] = "\n"
            f.write("".join(np.char.add(toks, sep).ravel().tolist()))


def read_matrix(path: str) -> tuple[np.ndarray, Groups]:
    """Text abundance matrix → rows + singleton id lists (= ReadMatrix,
    ioMatrix.cc:201-263; comment lines '#' and a leading tab header line
    are skipped)."""
    rows: list[np.ndarray] = []
    with open(path) as f:
        for line in f:
            if not line.strip() or line[0] == "#" or line[0] == "\t":
                continue
            rows.append(np.asarray(line.split(), dtype=np.float32))
    values = np.stack(rows) if rows else np.zeros((0, 0), np.float32)
    n = len(rows)
    return values, Groups(np.arange(n, dtype=np.int64),
                          np.arange(n + 1, dtype=np.int64))


# parsed-.clust cache: the out-of-core merge rounds re-read consecutive
# windows of the same file (pipeline.init_clustering); one parse per file
_CLUST_CACHE: dict = {}


def _parse_clust(path: str) -> Groups:
    with open(path, "rb") as f:
        buf = f.read()
    if _native is not None and hasattr(_native, "parse_clust"):
        # multithreaded native parse (~50x the bytes.split path at the
        # 45 M-line tmp rounds of the 2^26 design point)
        flat_b, off_b = _native.parse_clust(buf)
        return Groups(np.frombuffer(flat_b, np.uint64).copy(),
                      np.frombuffer(off_b, np.int64).copy())
    arr = np.frombuffer(buf, np.uint8)
    if len(arr) == 0:
        return Groups(np.empty(0, np.uint64), np.zeros(1, np.int64))
    nl = np.flatnonzero(arr == 10)
    if len(nl) == 0 or nl[-1] != len(arr) - 1:
        nl = np.r_[nl, len(arr)]            # tolerate a missing final \n
    tabs = np.flatnonzero(arr == 9)
    per_line = np.bincount(np.searchsorted(nl, tabs),
                           minlength=len(nl)) + 1
    tokens = np.array(buf.split()).astype(np.uint64)
    tok_start = np.concatenate([[0], np.cumsum(per_line)])[:-1]
    sizes = tokens[tok_start].astype(np.int64)
    if not np.array_equal(sizes, per_line - 1):
        raise ValueError(f"{path}: size field does not match id count "
                         "on some line")
    mask = np.ones(len(tokens), bool)
    mask[tok_start] = False
    return Groups(tokens[mask], np.concatenate([[0], np.cumsum(sizes)]))


def _read_clust(
    path: str, start_line: int = 0, num_lines: int | None = None
) -> Groups:
    import os

    st = os.stat(path)
    key = (os.path.abspath(path), st.st_mtime_ns, st.st_size)
    g = _CLUST_CACHE.get(key)
    if g is None:
        g = _parse_clust(path)
        _CLUST_CACHE.clear()                # hold at most one parsed file
        _CLUST_CACHE[key] = g
    if start_line == 0 and num_lines is None:
        return g
    stop = len(g) if num_lines is None else min(len(g),
                                                start_line + num_lines)
    lo, hi = g.offsets[start_line], g.offsets[stop]
    return Groups(g.flat[lo:hi], g.offsets[start_line:stop + 1] - lo)
