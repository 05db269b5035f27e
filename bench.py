"""Timeout-robust benchmark harness: mode-C LSH clustering vs the reference.

Round-2 postmortem (VERDICT.md): the previous bench printed its single JSON
line only after EVERY phase finished, so one slow phase (the 12-thread
reference run on a 2-core host, or a degraded host->TPU tunnel) lost all
numbers to the driver's timeout.  This version is built so a partial run
still lands a headline:

  * the orchestrator prints a COMPLETE, cumulative JSON headline line
    (flushed) after every phase — the last line printed is always the best
    current summary, and the first one appears as soon as the TPU
    measurement exists;
  * every phase runs as a subprocess with its own timeout; a phase that
    overruns is killed and noted, never hung;
  * the reference baseline time is cached on disk beside the cached binary
    (one measurement ever per workload); when the reference overruns its
    time box it is killed and the elapsed time is recorded as a LOWER BOUND
    on its wall-clock (its per-iteration progress is parsed from --verbose
    stdout), so ``vs_baseline`` computed from it is a conservative
    (under-)estimate of the true speedup;
  * a small fallback config guarantees a headline even if the 2^24 run
    cannot complete through a degraded tunnel.

Headline workload (VERDICT r2): 2^24 k-mer rows x 20 samples with an
ANNEAL-SENSITIVE profile hierarchy — row profiles draw from a 3-level
similarity tree whose levels sit at cosine ~ 0.95..0.8, so merging happens
throughout the threshold anneal instead of collapsing in the first greedy
pass.  The reference kmerLSH binary (12 OpenMP threads, built from
/root/reference into /tmp) runs the identical mode-C workload
(function/cluster.cc:181-340 hot loops) for the baseline.

The headline ``value`` is the WARM device-resident rate (counts already in
HBM, as on any local-PCIe deployment where the one-time 640 MB upload costs
~30 ms); ``cold_seconds``/``upload`` record the first run including host
read + tunnel upload.  See BASELINE.md for the full table.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import threading
import time

import numpy as np

N_ROWS = int(os.environ.get("KMERLSH_BENCH_ROWS", 1 << 24))
N_SAMPLES = 20
ITERATIONS = 20
MIN_SIM = 0.8
WORK = os.environ.get("KMERLSH_BENCH_WORK", "/tmp/kmerlsh_bench_r3")
REF_BUILD = "/tmp/kmerlsh_refbuild"
REF_SRC = "/root/reference"
TOTAL_BUDGET_S = float(os.environ.get("KMERLSH_BENCH_BUDGET_S", 2700))
_T0 = time.perf_counter()


def remaining() -> float:
    return TOTAL_BUDGET_S - (time.perf_counter() - _T0)


def note(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# data generation (cached on disk; identical distribution to the round-2
# bench so numbers stay comparable)
# --------------------------------------------------------------------------

def make_data(n_rows: int) -> str:
    """Anneal-sensitive count matrix: profiles from a similarity hierarchy
    (node count ~ n_rows/4 after the first collapse, so every anneal
    iteration still faces live merge work)."""
    sub = os.path.join(WORK, f"c{n_rows >> 20}M")
    os.makedirs(sub, exist_ok=True)
    marker = os.path.join(sub, "kmer_count.bin")
    if os.path.exists(marker):
        return sub
    rng = np.random.default_rng(0)
    S = N_SAMPLES
    # the matrix is written to a temp name and renamed LAST (below), so a
    # driver kill mid-generation can never leave a half-written dataset
    # that later runs silently benchmark against

    n_base = max(64, n_rows >> 7)
    cur = rng.normal(size=(n_base, S)).astype(np.float32)
    cur /= np.linalg.norm(cur, axis=1, keepdims=True)
    nodes = [cur]
    for lev in range(3):
        cos = 0.93 - 0.04 * lev
        sin = np.sqrt(1 - cos * cos)
        kids = []
        for sgn in (1.0, -1.0):
            orth = rng.normal(size=cur.shape).astype(np.float32)
            orth -= (orth * cur).sum(1, keepdims=True) * cur
            orth /= np.linalg.norm(orth, axis=1, keepdims=True)
            kids.append(cos * cur + sgn * sin * orth)
        cur = np.concatenate(kids)
        nodes.append(cur)
    pool = np.concatenate(nodes)

    rows = rng.integers(0, len(pool), size=n_rows)
    vals = 4.0 + pool[rows]
    vals += 0.01 * rng.standard_normal((n_rows, S)).astype(np.float32)
    counts = np.clip(np.rint(np.expm1(vals)), 1, 65535).astype(np.uint16)

    cov = np.log(np.maximum(counts, 1).astype(np.float64)).sum(axis=0)
    with open(os.path.join(sub, "kmer_count.log"), "w") as f:
        f.write(str(n_rows))
        for c in cov:
            f.write("\t%f" % c)
    half = S // 2
    for name, rng_ in (("l1", range(half)), ("l2", range(half, S))):
        with open(os.path.join(sub, name), "w") as f:
            for i in rng_:
                f.write(f"s{i}.fastq db{i}\n")
    counts.T.astype("<u2").tofile(marker + ".part")
    os.rename(marker + ".part", marker)   # completeness marker goes last
    return sub


# --------------------------------------------------------------------------
# workers (each runs as `python bench.py --worker NAME` in a subprocess with
# its own timeout; result JSON goes to $KMERLSH_BENCH_OUT)
# --------------------------------------------------------------------------

def _worker_tpu() -> dict:
    """Mode-C on the chip: one cold run (host read + upload + session +
    save), then warm runs that reuse the device-resident count matrix
    (pipeline._DEVICE_COUNTS_CACHE)."""
    n_rows = int(os.environ["KMERLSH_BENCH_N"])
    sub = os.environ["KMERLSH_BENCH_SUB"]
    from kmerlsh_tpu.config import HyperParams
    from kmerlsh_tpu.pipeline import kmer_cluster

    def once(tag: str):
        tmp = os.path.join(sub, f"tmp_{tag}")
        shutil.rmtree(tmp, ignore_errors=True)
        p = HyperParams(
            input1=os.path.join(sub, "l1"), input2=os.path.join(sub, "l2"),
            clust_file_name=os.path.join(sub, f"tpu_result_{tag}.txt"),
            tmp_dir=tmp, work_dir=sub,
            cluster_iteration=ITERATIONS, min_similarity=MIN_SIM,
            kmc=False, bin=False, clustering=True, extracting=False, seed=0,
        )
        t0 = time.perf_counter()
        stages = kmer_cluster(p)
        return time.perf_counter() - t0, stages

    cold_s, st = once("cold")
    warm_runs = [once(f"warm{i}") for i in range(2)]
    warm_s, wst = min(warm_runs, key=lambda r: r[0])
    out = {
        "rows": n_rows,
        "cold_seconds": round(cold_s, 2),
        "warm_seconds": round(warm_s, 2),
        "read_upload_seconds": round(st.times.get("read_batch", 0.0), 2),
        "save_seconds": round(wst.times.get("C_save", 0.0), 2),
        "clusters": wst.metrics.get("clusters"),
    }
    # engine split (VERDICT r3 #1b): device program wall vs device→host
    # pulls — lets a reader separate engine speed from tunnel artifacts
    for key in ("device_seconds", "pull_seconds"):
        if key in wst.times:
            out[key] = round(wst.times[key], 2)
    if "device_seconds" in out and "pull_seconds" in out:
        out["other_host_seconds"] = round(
            warm_s - out["device_seconds"] - out["pull_seconds"]
            - out["save_seconds"], 2)
    if "pull_bytes" in wst.metrics:
        out["pull_mb"] = round(wst.metrics["pull_bytes"] / 1e6, 1)
    try:
        from kmerlsh_tpu.utils.timing import device_memory_stats

        stats = device_memory_stats()
        if "peak_bytes_in_use" in stats:
            out["peak_hbm_gb"] = round(stats["peak_bytes_in_use"] / 2**30, 2)
    except Exception:
        pass
    # persist beside the dataset so later orchestrator runs can report
    # design-point results without re-running them
    with open(os.path.join(sub, "tpu_result.json"), "w") as f:
        json.dump(out, f)
    return out


def _worker_reads() -> dict:
    """Mode-E scorer throughput (reads/s): host NumPy vs on-device
    (io/ioFastQ.cc:31-65 semantics)."""
    from kmerlsh_tpu.kmer import codec
    from kmerlsh_tpu.ops import reads as readops

    rng = np.random.default_rng(0)
    k, n_reads, rl = 23, 1 << 16, 150
    bases = np.frombuffer(b"ACGT", np.uint8)
    seqs = [bases[rng.integers(0, 4, size=rl)].tobytes()
            for _ in range(n_reads)]
    marker = bases[rng.integers(0, 4, size=5000)].tobytes()
    codes, _ = codec.seq_to_codes(marker)
    diff = np.unique(codec.canonical_key(codec.sliding_kmers(codes, k), k))

    out = {}
    for name, fn in (("host", readops.score_part),
                     ("native", readops.score_part_native),
                     ("device", readops.score_part_device)):
        fn(seqs[:1024], diff, k, 0.5)      # warm / compile
        t0 = time.perf_counter()
        fn(seqs, diff, k, 0.5)
        out[name] = round(n_reads / (time.perf_counter() - t0), 1)
    return out


def _worker_scaling() -> dict:
    """Weak scaling on the virtual CPU mesh: rows/s per device, 1->8
    devices, fixed per-device rows.  (Caveat recorded by the orchestrator:
    all virtual devices share this host's physical cores.)  The session
    environment may pin JAX_PLATFORMS to a TPU plugin via a site hook that
    ignores env-var edits, so the CPU platform is forced through
    ``jax.config`` — same trick as tests/conftest.py."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from kmerlsh_tpu.parallel import dist, mesh as meshlib

    per_dev, S, I = 1 << 15, 16, 10
    rng = np.random.default_rng(0)
    out = {}
    for nd in (1, 2, 4, 8):
        n = per_dev * nd
        prof = rng.normal(size=(n // 64, S)).astype(np.float32)
        X = prof[rng.integers(0, len(prof), size=n)] + \
            0.01 * rng.standard_normal((n, S)).astype(np.float32)
        thr = (0.95 - 0.015 * np.arange(I)).astype(np.float32)
        m = meshlib.make_mesh(nd)
        dist.cluster_sharded(X, mesh=m, thresholds=thr, seed=0)  # warm
        t0 = time.perf_counter()
        dist.cluster_sharded(X, mesh=m, thresholds=thr, seed=0)
        out[str(nd)] = round(n / (time.perf_counter() - t0) / nd, 1)
    return out


def _gen_mode_b_data() -> tuple[str, list[str]]:
    """FASTQ fixture for the K/B benches: 6 samples drawing 150 bp reads
    from a shared 2 Mbp genome, so the canonical union is ~4 M k-mers and
    each sample contributes ~18 M k-mer instances."""
    sub = os.path.join(WORK, "modeB")
    os.makedirs(sub, exist_ok=True)
    n_samples, n_reads, rl = 6, 120_000, 150
    fastqs = [os.path.join(sub, f"s{i}.fastq") for i in range(n_samples)]
    if not os.path.exists(os.path.join(sub, "l2")):
        rng = np.random.default_rng(7)
        bases = np.frombuffer(b"ACGT", np.uint8)
        genome = bases[rng.integers(0, 4, size=1 << 21)]
        for i, fq in enumerate(fastqs):
            starts = rng.integers(0, len(genome) - rl, size=n_reads)
            reads = genome[starts[:, None] + np.arange(rl)]
            qual = np.full(rl, ord("I"), np.uint8).tobytes().decode()
            with open(fq, "w") as f:
                for j in range(n_reads):
                    f.write(f"@s{i}r{j}\n{reads[j].tobytes().decode()}\n"
                            f"+\n{qual}\n")
        half = n_samples // 2
        for name, idxs in (("l1", range(half)), ("l2", range(half, n_samples))):
            with open(os.path.join(sub, name), "w") as f:
                for i in idxs:
                    f.write(f"{fastqs[i]} {os.path.join(sub, f'db{i}')}\n")
    return sub, fastqs


def _worker_mode_kb() -> dict:
    """Mode K (native k-mer counting from FASTQ) and mode B (KMC-db union +
    count-matrix build) throughput; the orchestrator separately times the
    reference binary's ``-M B --only`` on the same databases."""
    from kmerlsh_tpu.io import counts as countsio, kmc as kmcio
    from kmerlsh_tpu.io.samples import get_input

    sub, fastqs = _gen_mode_b_data()
    k = 23
    _, dbs1 = get_input(os.path.join(sub, "l1"))
    _, dbs2 = get_input(os.path.join(sub, "l2"))
    dbs = dbs1 + dbs2

    t0 = time.perf_counter()
    for fq, db in zip(fastqs, dbs):
        kmcio.run_kmc(fq, db, k, count_min=1, threads=2, max_memory_gb=8,
                      work_dir=sub, verbose=False)
    t_k = time.perf_counter() - t0
    # k-mer instances processed in mode K = reads * (rl - k + 1) per sample
    instances = sum(1 for _ in fastqs) * 120_000 * (150 - k + 1)

    records = 0
    for db in dbs:
        keys, _, _ = kmcio.read_db(db)
        records += len(keys)

    t0 = time.perf_counter()
    countsio.build_count_matrix(dbs, k, sub, verbose=False)
    t_b = time.perf_counter() - t0
    return {
        "k_count_seconds": round(t_k, 2),
        "k_count_kmer_instances_per_s": round(instances / t_k, 1),
        "b_seconds": round(t_b, 2),
        "b_db_records": records,
        "b_db_records_per_s": round(records / t_b, 1),
        "workdir": sub,
    }


def _prep_mode_e_artifacts() -> tuple[str, int, int]:
    """Deterministic mode-E workload on the modeB fixture: stage-B artifacts
    plus a synthesized cluster file with two large group-differential
    clusters (one per tail) and a tail of small untested ones. Both
    implementations then run the IDENTICAL `-M E --only` job. Returns
    (workdir, total_reads, kmap)."""
    from kmerlsh_tpu.cluster.groups import Groups
    from kmerlsh_tpu.io import clusterio, counts as countsio

    sub, fastqs = _gen_mode_b_data()
    log_path = os.path.join(sub, "kmer_count.log")
    if not os.path.exists(log_path):
        from kmerlsh_tpu.io.samples import get_input

        _, dbs1 = get_input(os.path.join(sub, "l1"))
        _, dbs2 = get_input(os.path.join(sub, "l2"))
        countsio.build_count_matrix(dbs1 + dbs2, 23, sub, verbose=False)
    kmap, _ = countsio.read_log(log_path)

    clust = os.path.join(sub, "clust_e.txt")
    if not os.path.exists(clust + ".clust"):
        big = 100_000
        n_small, small_sz = 1000, 10
        ids = [np.arange(big, dtype=np.uint64),
               np.arange(big, 2 * big, dtype=np.uint64)]
        base = 2 * big
        for i in range(n_small):
            ids.append(np.arange(base + i * small_sz,
                                 base + (i + 1) * small_sz, dtype=np.uint64))
        groups = Groups.from_list(ids, dtype=np.uint64)
        # centroids: per-sample values; group A = first 3 samples. Cluster 0
        # high in A (righttail → group1), cluster 1 high in B (lefttail).
        cents = np.ones((2 + n_small, 6), np.float32)
        cents[0] = [5.0, 5.1, 4.9, 1.0, 1.1, 0.9]
        cents[1] = [1.0, 1.1, 0.9, 5.0, 5.1, 4.9]
        clusterio.save_result(groups, clust + ".clust")
        clusterio.save_binary(cents, groups, clust)
    return sub, 6 * 120_000, kmap


def _worker_mode_e() -> dict:
    """Mode E end-to-end (WRS + extraction over every FASTQ) with our
    pipeline; the orchestrator times the reference binary on the SAME
    artifacts (io/ioFastQ.cc:78-158 + funcAB.cc:73-108 head-to-head).
    Forces the CPU jax platform: the t-test is tiny and the native scorer
    needs no device — no remote-compile exposure."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from kmerlsh_tpu.config import HyperParams
    from kmerlsh_tpu.pipeline import kmer_cluster

    sub, total_reads, _ = _prep_mode_e_artifacts()
    out = {}
    for scorer in ("native", "host"):
        p = HyperParams(
            input1=os.path.join(sub, "l1"), input2=os.path.join(sub, "l2"),
            output1=os.path.join(sub, f"e_{scorer}_A"),
            output2=os.path.join(sub, f"e_{scorer}_B"),
            clust_file_name=os.path.join(sub, "clust_e.txt"),
            tmp_dir=os.path.join(sub, "tmp"), work_dir=sub, k=23,
            size_thresh=50_000, read_scorer=scorer,
            kmc=False, bin=False, clustering=False, extracting=True,
        )
        t0 = time.perf_counter()
        kmer_cluster(p)
        dt = time.perf_counter() - t0
        out[f"{scorer}_seconds"] = round(dt, 2)
        out[f"{scorer}_reads_per_s"] = round(total_reads / dt, 1)
    # what would `auto` have picked on this host? (VERDICT r4 #4)
    import dataclasses

    from kmerlsh_tpu import pipeline

    pipeline._pick_scorer(dataclasses.replace(p, read_scorer="auto"))
    out["auto_scorer"] = pipeline.LAST_SCORER
    out["total_reads"] = total_reads
    out["workdir"] = sub
    return out


def reference_mode_e(workdir: str, total_reads: int,
                     box_s: float) -> dict | None:
    """Time the reference binary's ``-M E --only`` on the same artifacts."""
    cache = os.path.join(REF_BUILD, "baseline_modeE.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)
    binary = _build_reference()
    if binary is None:
        return None
    refdir = os.path.join(workdir, "ref_e")
    os.makedirs(refdir, exist_ok=True)
    for f in ("kmer_set.hex", "kmer_count.bin", "kmer_count.log",
              "clust_e.txt", "clust_e.txt.clust"):
        shutil.copy(os.path.join(workdir, f), os.path.join(refdir, f))
    try:
        t0 = time.perf_counter()
        subprocess.run(
            [binary, "-a", os.path.join(workdir, "l1"),
             "-b", os.path.join(workdir, "l2"),
             "-o", os.path.join(refdir, "eA"),
             "-p", os.path.join(refdir, "eB"),
             "-M", "E", "--only", "-F", "clust_e.txt", "-K", "23",
             "-S", "50000", "-T", "12"],
            cwd=refdir, check=True, capture_output=True, timeout=box_s)
        dt = time.perf_counter() - t0
        result = {"seconds": round(dt, 2),
                  "reads_per_s": round(total_reads / dt, 1), "threads": 12}
        with open(cache, "w") as f:
            json.dump(result, f)
        return result
    except Exception as e:
        note(f"reference mode E unavailable: {e}")
        return None


WORKERS = {
    "tpu": _worker_tpu,
    "reads": _worker_reads,
    "scaling": _worker_scaling,
    "mode_kb": _worker_mode_kb,
    "mode_e": _worker_mode_e,
}


def run_worker(name: str, timeout_s: float, env_extra: dict | None = None,
               **env_vals) -> dict | None:
    """Run one phase in a subprocess with its own timeout; None on any
    failure (logged, never fatal)."""
    out_path = os.path.join(WORK, f"out_{name}.json")
    try:
        os.remove(out_path)
    except OSError:
        pass
    env = dict(os.environ)
    env["KMERLSH_BENCH_OUT"] = out_path
    env.update({k: str(v) for k, v in (env_extra or {}).items()})
    env.update({f"KMERLSH_BENCH_{k.upper()}": str(v)
                for k, v in env_vals.items()})
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", name],
            timeout=timeout_s, env=env, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        if r.returncode != 0:
            note(f"{name} worker rc={r.returncode}: {r.stderr[-400:]}")
        with open(out_path) as f:
            return json.load(f)
    except subprocess.TimeoutExpired:
        note(f"{name} worker exceeded its {timeout_s:.0f}s box; skipped")
    except Exception as e:
        note(f"{name} worker unavailable: {e}")
    return None


# --------------------------------------------------------------------------
# reference baseline (built + measured at most once ever; time-boxed with a
# lower-bound model on overrun)
# --------------------------------------------------------------------------

def _build_reference() -> str | None:
    binary = os.path.join(REF_BUILD, "kmerLSH")
    if os.path.exists(binary):
        return binary
    try:
        shutil.copytree(REF_SRC, REF_BUILD, dirs_exist_ok=True)
        subprocess.run(["make", "-j4"], cwd=REF_BUILD, check=True,
                       capture_output=True, timeout=1200)
        return binary
    except Exception as e:
        note(f"reference build failed: {e}")
        return None


def reference_mode_c(sub: str, box_s: float, n_rows: int = N_ROWS,
                     threads: int = 12) -> dict | None:
    """Time the reference binary's mode C on the same matrix.  On overrun:
    kill it, parse ``Iteration:`` progress from --verbose stdout, and
    record the elapsed time as a LOWER BOUND (the remaining iterations are
    treated as free), so speedups computed against it are conservative.

    A completed measurement caches forever; a lower-bound (killed) one
    caches PROVISIONALLY and is re-attempted whenever a later run brings a
    bigger time box than the recorded elapsed time."""
    tag = f"c{n_rows >> 20}M" + (f"_t{threads}" if threads != 12 else "")
    cache = os.path.join(REF_BUILD, f"baseline_{tag}.json")
    cache_lb = os.path.join(REF_BUILD, f"baseline_{tag}_lower.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)
    prov = None
    if os.path.exists(cache_lb):
        with open(cache_lb) as f:
            prov = json.load(f)
        if box_s <= prov["seconds"] + 60:
            return prov          # no chance of beating the recorded bound
    binary = _build_reference()
    if binary is None:
        return prov
    os.makedirs(os.path.join(sub, "tmp"), exist_ok=True)
    lines: list[str] = []
    t0 = time.perf_counter()
    proc = subprocess.Popen(
        [binary, "-a", "l1", "-b", "l2", "-o", "oA", "-p", "oB",
         "-M", "C", "--only", "-I", str(ITERATIONS), "-N", str(MIN_SIM),
         "-T", str(threads), "-F", "ref_result.txt", "--verbose"],
        cwd=sub, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)

    def pump():
        for line in proc.stdout:
            lines.append(line)

    th = threading.Thread(target=pump, daemon=True)
    th.start()
    try:
        proc.wait(timeout=box_s)
        elapsed = time.perf_counter() - t0
        th.join(timeout=5)
        if proc.returncode != 0:
            # a crashed reference must never be cached as a baseline
            note(f"reference mode C rc={proc.returncode}: "
                 f"{''.join(lines)[-400:]}")
            return prov
        result = {"seconds": round(elapsed, 2), "lower_bound": False,
                  "threads": threads, "host_cores": os.cpu_count()}
        with open(cache, "w") as f:
            json.dump(result, f)
        return result
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait()
        elapsed = time.perf_counter() - t0
        th.join(timeout=5)
        iters = sum(1 for ln in lines if ln.startswith("Iteration:"))
        result = {
            "seconds": round(elapsed, 2), "lower_bound": True,
            "iterations_done": iters, "iterations_total": ITERATIONS,
            "threads": threads, "host_cores": os.cpu_count(),
            "model": (f"killed at the {box_s:.0f}s box after {iters}/"
                      f"{ITERATIONS} anneal iterations; 'seconds' is the "
                      "elapsed lower bound (remaining iterations treated "
                      "as free), so vs_baseline UNDERSTATES the speedup"),
        }
        if prov is None or result["seconds"] > prov["seconds"]:
            with open(cache_lb, "w") as f:
                json.dump(result, f)
        return result


def reference_mode_b(workdir: str, records: int, box_s: float) -> dict | None:
    """Time the reference binary's ``-M B --only`` over the same KMC
    databases the mode_kb worker built (kmer/kmc_reader.cc:11,96 path)."""
    cache = os.path.join(REF_BUILD, "baseline_modeB.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)
    binary = _build_reference()
    if binary is None:
        return None
    refdir = os.path.join(workdir, "ref_run")
    os.makedirs(refdir, exist_ok=True)
    try:
        t0 = time.perf_counter()
        subprocess.run(
            [binary, "-a", os.path.join(workdir, "l1"),
             "-b", os.path.join(workdir, "l2"), "-o", "oA", "-p", "oB",
             "-M", "B", "--only", "-T", "12", "-K", "23"],
            cwd=refdir, check=True, capture_output=True, timeout=box_s)
        dt = time.perf_counter() - t0
        result = {"seconds": round(dt, 2),
                  "db_records_per_s": round(records / dt, 1)}
        with open(cache, "w") as f:
            json.dump(result, f)
        return result
    except Exception as e:
        note(f"reference mode B unavailable: {e}")
        return None


# --------------------------------------------------------------------------
# orchestrator
# --------------------------------------------------------------------------

def _compact(results: dict) -> dict:
    """Distill the cumulative record into a ≤1 kB headline summary (the
    driver's tail capture is 2 kB; the LAST printed line must parse)."""
    c: dict = {"metric": results.get("metric"),
               "value": results.get("value"),
               "unit": results.get("unit"),
               "vs_baseline": results.get("vs_baseline")}
    for k in ("vs_baseline_cold", "reference_seconds",
              "reference_12core_model_seconds", "vs_12core_model",
              "vs_12core_model_device", "device_rows_per_s"):
        if k in results:
            c[k] = results[k]
    tpu = results.get("tpu") or {}
    for k in ("warm_seconds", "cold_seconds", "device_seconds",
              "pull_seconds", "save_seconds", "clusters", "pull_mb"):
        if k in tpu:
            c[k] = tpu[k]
    kb = results.get("mode_kb") or {}
    if "b_vs_reference" in kb:
        c["mode_b_vs_ref"] = kb["b_vs_reference"]
    me = results.get("mode_e") or {}
    for src, dst in (("e_vs_reference", "mode_e_vs_ref"),
                     ("native_reads_per_s", "mode_e_native_reads_per_s"),
                     ("auto_scorer", "mode_e_auto_scorer")):
        if src in me:
            c[dst] = me[src]
    dp = results.get("design_points") or {}
    for name, d in dp.items():
        c[f"dp_{name}_warm_s"] = d.get("warm_seconds",
                                       d.get("cold_seconds"))
    blob = json.dumps(c)
    while len(blob) > 1000 and len(c) > 4:     # hard cap, drop extras
        c.popitem()
        blob = json.dumps(c)
    return c


def main() -> None:
    os.makedirs(WORK, exist_ok=True)
    results: dict = {
        "metric": f"mode_C_cluster_{N_ROWS >> 20}Mx{N_SAMPLES}_I{ITERATIONS}",
        "value": None,
        "unit": "kmer_rows/s",
        "vs_baseline": None,
    }

    def emit():
        # full cumulative record first, then a compact (≤1 kB) summary as
        # the LAST line: the round driver keeps only ~2 kB of stdout tail
        # and parses the final line — round 4's cumulative line outgrew
        # that capture and the round artifact lost its headline fields
        print(json.dumps(results), flush=True)
        print(json.dumps(_compact(results)), flush=True)

    note(f"budget {TOTAL_BUDGET_S:.0f}s; generating data ({N_ROWS} rows)")
    sub = make_data(N_ROWS)
    note(f"data ready at {sub} ({remaining():.0f}s left)")

    # ---- phase 1: TPU headline --------------------------------------------
    # Attempt ladder: the remote-compile tunnel nondeterministically hangs
    # on NEW program shapes (and a hung client wedges the device until it
    # dies), but every completed compile persists in the XLA cache — so a
    # killed attempt makes the NEXT attempt of the same config cheaper.
    # Two boxes at the full config, then progressively smaller configs
    # whose shapes are most likely already cached.
    tpu = None
    n_headline = N_ROWS
    ladder = [N_ROWS, N_ROWS]
    for smaller in (1 << 22, 1 << 20):
        if smaller < N_ROWS:
            ladder.append(smaller)
    for i, n_try in enumerate(ladder):
        if remaining() < 420:
            note("no budget left for another TPU attempt")
            break
        # one cold compile of a missing shape costs ~400-450 s on the
        # remote-compile service; leave room for one plus the warm runs
        box = max(300.0, min(remaining() - 480, 1200))
        d = make_data(n_try) if n_try != N_ROWS else sub
        tpu = run_worker("tpu", box, n=n_try, sub=d)
        if tpu is not None:
            n_headline = n_try
            if n_try != N_ROWS:
                results["metric"] = (
                    f"mode_C_cluster_{n_try >> 20}Mx{N_SAMPLES}"
                    f"_I{ITERATIONS}_fallback")
            break
        note(f"TPU attempt {i + 1} ({n_try} rows) failed; retrying")
    if tpu:
        results["value"] = round(n_headline / tpu["warm_seconds"], 1)
        results["tpu"] = tpu
        if tpu.get("device_seconds"):
            results["device_rows_per_s"] = round(
                n_headline / tpu["device_seconds"], 1)
        results["note"] = (
            "value = warm device-resident rate (counts in HBM; on local "
            "PCIe the one-time upload is ~30 ms); cold_seconds includes "
            "host read + remote-tunnel upload; device_seconds/pull_seconds "
            "split engine compute from tunnel transfers")
    emit()

    # ---- phase 2: reference baseline (same row count as the headline) -----
    if tpu and remaining() > 240:
        ref = reference_mode_c(make_data(n_headline),
                               box_s=max(120.0, min(remaining() - 420,
                                                    1500)),
                               n_rows=n_headline)
        if ref:
            results["reference"] = ref
            results["reference_seconds"] = ref["seconds"]
            results["vs_baseline"] = round(
                ref["seconds"] / tpu["warm_seconds"], 3)
            results["vs_baseline_cold"] = round(
                ref["seconds"] / tpu["cold_seconds"], 3)
            # fair-hardware roofline: model the reference on 12 real cores
            # by perfect-linear per-core scaling of the measured run (the
            # most conservative assumption FOR US)
            cores = ref.get("host_cores") or os.cpu_count()
            model_12c = ref["seconds"] * cores / max(ref["threads"], 1)
            results["reference_12core_model_seconds"] = round(model_12c, 1)
            results["vs_12core_model"] = round(
                model_12c / tpu["warm_seconds"], 3)
            if tpu.get("device_seconds"):
                results["vs_12core_model_device"] = round(
                    model_12c / tpu["device_seconds"], 3)
            results["vs_baseline_context"] = (
                f"reference ran {ref['threads']} threads on {cores} physical "
                "cores (oversubscribed); *_12core_model assumes perfect "
                "linear scaling to 12 cores — see BASELINE.md roofline")
            if ref.get("lower_bound"):
                results["vs_baseline_note"] = ref["model"]
        emit()
    elif tpu:
        note("skipping reference baseline: out of budget")

    # design-point runs (2^25 single-fused at the HBM budget, 2^26 forcing
    # the multi-batch path) are measured out-of-band (they need multiple
    # 400 s remote compiles); report their persisted results when present
    points = {}
    for n_dp in (1 << 25, 1 << 26):
        if n_dp <= N_ROWS:
            continue
        p = os.path.join(WORK, f"c{n_dp >> 20}M", "tpu_result.json")
        if os.path.exists(p):
            with open(p) as f:
                points[f"{n_dp >> 20}M_rows"] = json.load(f)
    if points:
        results["design_points"] = points
        emit()

    # ---- phase 3: extras ---------------------------------------------------
    if remaining() > 360:
        kb = run_worker("mode_kb", min(remaining() - 240, 900))
        if kb:
            results["mode_kb"] = kb
            refb = reference_mode_b(kb["workdir"], kb["b_db_records"],
                                    box_s=min(remaining() - 120, 600))
            if refb:
                results["mode_kb"]["reference_b_seconds"] = refb["seconds"]
                results["mode_kb"]["b_vs_reference"] = round(
                    refb["seconds"] / kb["b_seconds"], 3)
        emit()
    else:
        note("skipping mode K/B bench: out of budget")

    # ---- phase 4: mode E head-to-head --------------------------------------
    if remaining() > 300:
        mode_e = run_worker("mode_e", min(remaining() - 180, 600))
        if mode_e:
            results["mode_e"] = mode_e
            refe = reference_mode_e(mode_e["workdir"],
                                    mode_e["total_reads"],
                                    box_s=min(remaining() - 90, 600))
            if refe:
                results["mode_e"]["reference_seconds"] = refe["seconds"]
                results["mode_e"]["reference_reads_per_s"] = \
                    refe["reads_per_s"]
                results["mode_e"]["e_vs_reference"] = round(
                    refe["seconds"] / mode_e["native_seconds"], 3)
        emit()
    else:
        note("skipping mode E bench: out of budget")

    if remaining() > 240:
        reads = run_worker("reads", min(remaining() - 120, 420))
        if reads:
            results["mode_e_scorer_reads_per_s"] = reads
        emit()
    else:
        note("skipping read-scoring bench: out of budget")

    if remaining() > 300:
        scaling = run_worker(
            "scaling", min(remaining() - 60, 900),
            env_extra={"JAX_PLATFORMS": "cpu",
                       "XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
        if scaling:
            results["host_oversubscription_probe"] = scaling
            results["host_oversubscription_note"] = (
                f"{os.cpu_count()} physical cores host all 1..8 virtual "
                "devices, so per-device rows/s drops with device count by "
                "construction — NOT a scaling regression; the real scaling "
                "evidence is the O(exchange_cap) per-device collective "
                "bytes bound asserted on lowered HLO in tests/test_dist.py")
        emit()
    else:
        note("skipping CPU-mesh scaling bench: out of budget")


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        result = WORKERS[sys.argv[2]]()
        with open(os.environ["KMERLSH_BENCH_OUT"], "w") as f:
            json.dump(result, f)
    else:
        main()
