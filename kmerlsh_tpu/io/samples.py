"""Sample-list parsing.

Reference contract (``GetInput``, io/ioHT.cc:3-19): each line of the input
file is ``<fastq_path> <kmc_db_name>`` (whitespace separated). Unlike the
reference, blank lines are skipped instead of producing empty entries.
"""

from __future__ import annotations


def get_input(path: str) -> tuple[list[str], list[str]]:
    samples: list[str] = []
    kmc_names: list[str] = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            samples.append(parts[0])
            kmc_names.append(parts[1] if len(parts) > 1 else "")
    return samples, kmc_names
