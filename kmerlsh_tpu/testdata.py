"""Synthetic two-group FASTQ fixtures with planted differential k-mers.

Builds a shared background pool plus group-exclusive marker sequences so the
expected differential k-mer sets and distinctive reads are known by
construction (the test harness the reference never had, SURVEY §4).

``python -m kmerlsh_tpu.testdata <dir>`` writes the FASTQs plus the
two-column sample lists (``groupA.txt`` / ``groupB.txt``) consumed by the
CLI.
"""

from __future__ import annotations

import os
import sys

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _rand_seq(rng, n: int) -> str:
    return bytes(BASES[rng.integers(0, 4, size=n)]).decode()


def _reads_from(rng, seq: str, n_reads: int, read_len: int) -> list[str]:
    out = []
    for _ in range(n_reads):
        start = int(rng.integers(0, max(len(seq) - read_len, 1)))
        out.append(seq[start : start + read_len])
    return out


def generate(
    out_dir: str,
    samples_per_group: int = 2,
    n_background: int = 20,
    n_markers: int = 3,
    background_len: int = 400,
    marker_len: int = 300,
    read_len: int = 100,
    background_reads: int = 400,
    marker_reads: int = 300,
    seed: int = 1234,
) -> dict:
    """Returns a manifest dict with file paths and the planted marker
    sequences per group."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    background = [_rand_seq(rng, background_len) for _ in range(n_background)]
    markers = {
        "A": [_rand_seq(rng, marker_len) for _ in range(n_markers)],
        "B": [_rand_seq(rng, marker_len) for _ in range(n_markers)],
    }

    manifest = {"markers": markers, "samples": {"A": [], "B": []},
                "lists": {}}
    for group in ("A", "B"):
        list_path = os.path.join(out_dir, f"group{group}.txt")
        with open(list_path, "w") as lf:
            for s in range(samples_per_group):
                fq = os.path.join(out_dir, f"g{group}_s{s}.fastq")
                db = os.path.join(out_dir, f"db{group}{s}")
                reads: list[str] = []
                for _ in range(background_reads):
                    src = background[int(rng.integers(0, n_background))]
                    reads += _reads_from(rng, src, 1, read_len)
                for m in markers[group]:
                    reads += _reads_from(rng, m, marker_reads // n_markers,
                                         read_len)
                rng.shuffle(reads)
                with open(fq, "w") as f:
                    for i, r in enumerate(reads):
                        f.write(f"@g{group}s{s}r{i}\n{r}\n+\n{'I' * len(r)}\n")
                lf.write(f"{fq} {db}\n")
                manifest["samples"][group].append(fq)
        manifest["lists"][group] = list_path
    return manifest


if __name__ == "__main__":
    target = sys.argv[1] if len(sys.argv) > 1 else "."
    m = generate(target)
    print(f"wrote {m['lists']['A']} and {m['lists']['B']}")
