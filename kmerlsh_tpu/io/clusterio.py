"""Cluster result files: ``<name>`` (float32 rows) + ``<name>.clust`` (text).

Reference formats (io/ioMatrix.cc):
  * ``.clust`` text — one line per cluster: ``size\\tid1\\tid2…``
    (SaveResult, ioMatrix.cc:265-294); clusters with size <= ignore_small
    are dropped (strict ``>`` at :281).
  * binary — the matching float32 centroid rows, ``num_samples`` floats per
    kept cluster, same order (SaveBinary, ioMatrix.cc:322-351).
"""

from __future__ import annotations

import numpy as np


def save_result(
    ids_list: list[np.ndarray], path: str, append: bool = False,
    ignore_small: int = 0,
) -> None:
    with open(path, "a" if append else "w") as f:
        for ids in ids_list:
            if len(ids) > ignore_small:
                f.write(str(len(ids)))
                f.write("".join(f"\t{int(i)}" for i in ids))
                f.write("\n")


def save_binary(
    values: np.ndarray, ids_list: list[np.ndarray], path: str,
    append: bool = False, ignore_small: int = 0,
) -> None:
    values = np.asarray(values, dtype="<f4")
    keep = [i for i, ids in enumerate(ids_list) if len(ids) > ignore_small]
    with open(path, "ab" if append else "wb") as f:
        f.write(values[keep].tobytes())


def read_cluster_all(
    path: str, num_samples: int
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Read every cluster (= ReadClusterAll, ioMatrix.cc:48-120)."""
    values = np.fromfile(path, dtype="<f4").reshape(-1, num_samples)
    ids_list = _read_clust(path + ".clust")
    if len(ids_list) != len(values):
        raise ValueError(
            f"{path}: {len(values)} binary rows vs {len(ids_list)} .clust lines"
        )
    return values, ids_list


def read_cluster(
    path: str, num_samples: int, start_line: int, num_lines: int
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Read a [start_line, start_line+num_lines) window (= ReadCluster,
    ioMatrix.cc:122-199)."""
    mm = np.memmap(path, dtype="<f4", mode="r").reshape(-1, num_samples)
    values = np.asarray(mm[start_line : start_line + num_lines])
    ids_list = _read_clust(path + ".clust", start_line, num_lines)
    return values, ids_list


def save_matrix(
    values: np.ndarray, ids_list: list[np.ndarray], path: str,
    append: bool = False, ignore_small: int = 0,
) -> None:
    """Tab-separated text centroid rows (= SaveMatrix, ioMatrix.cc:297-320)."""
    values = np.asarray(values)
    with open(path, "a" if append else "w") as f:
        for v, ids in zip(values, ids_list):
            if len(ids) > ignore_small:
                f.write("\t".join(repr(float(x)) for x in v) + "\n")


def read_matrix(path: str) -> tuple[np.ndarray, list[np.ndarray]]:
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
    ids_list = [np.array([i], dtype=np.uint64) for i in range(len(rows))]
    return values, ids_list


def _read_clust(
    path: str, start_line: int = 0, num_lines: int | None = None
) -> list[np.ndarray]:
    out: list[np.ndarray] = []
    with open(path) as f:
        for lineno, line in enumerate(f):
            if lineno < start_line:
                continue
            if num_lines is not None and len(out) >= num_lines:
                break
            parts = line.split()
            if not parts:
                continue
            size = int(parts[0])
            ids = np.array(parts[1 : 1 + size], dtype=np.uint64)
            out.append(ids)
    return out
