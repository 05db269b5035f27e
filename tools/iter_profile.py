"""Differential per-op microbenchmarks of the engine iteration (VERDICT r4 #1a).

The per-iteration cost of the chain-collapse engine is dominated by ONE
variadic `lax.sort` carrying S+4 payload rows (cluster/engine.py:300-304).
No profiler runs below `device_seconds` on the tunneled TPU, so this tool
measures the candidate primitives DIFFERENTIALLY: each op runs R times
inside one jitted `lax.scan` (amortizing the ~0.5 s remote-dispatch RTT)
and the wall is divided by R.

Ops (all at [S, M] f32 / i32 [M], M = 2**logm):
  sort_full   — the current iteration sort: 1 key + 4 i32 + S f32 payloads
  sort_kv     — key + iota only (the "sort less, gather after" candidate)
  gather_lane — values_t[:, perm]  ([S, M] gather along the lane axis)
  gather_rows — values_m[perm, :]  ([M, S] gather along the sublane axis)
  gather_1d   — x[perm] for i32 [M] (the finalize pointer-jump primitive)
  transpose   — [S, M] -> [M, S] -> [S, M] round trip
  segscan     — the MAX_CHAIN_LOG-level segmented scan of one iteration

Each op is a separate program shape: on remote-compile setups every op
costs one ~400 s compile on first run (cached thereafter). Run via the
orchestrator:  python tools/iter_profile.py --all --logm 24
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

S = 20
REPS = 4


def _setup():
    from kmerlsh_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    return jax


def _run_op(op: str, logm: int) -> dict:
    jax = _setup()
    import jax.numpy as jnp

    m = 1 << logm
    rng = np.random.default_rng(0)
    vt = jnp.asarray(rng.standard_normal((S, m)).astype(np.float32))
    sizes = jnp.asarray(rng.integers(0, 4, size=m).astype(np.int32))
    iota = jnp.arange(m, dtype=jnp.int32)
    # a cheap full-period permutation avoids paying a sort to build one:
    # p(i) = (a*i + c) mod m with odd a (m is a power of two)
    perm = jnp.asarray(((2654435761 * np.arange(m, dtype=np.uint64) + 12345)
                        % m).astype(np.int32))

    def keys_for(r):
        k = jax.random.fold_in(jax.random.PRNGKey(7), r)
        return jax.random.randint(k, (m,), 0, 2**31 - 1, dtype=jnp.int32)

    if op == "sort_full":
        def body(carry, r):
            vt, sizes = carry
            keys = keys_for(r)
            ops = jax.lax.sort(
                (keys, sizes, iota, iota) + tuple(vt[i] for i in range(S)),
                num_keys=1, is_stable=True)
            return (jnp.stack(ops[4:]), ops[1]), ops[0][0]
        carry = (vt, sizes)
    elif op == "sort_kv":
        def body(carry, r):
            keys = keys_for(r)
            sk, si = jax.lax.sort((keys, iota), num_keys=1, is_stable=True)
            return carry + si[0], sk[0]
        carry = jnp.int32(0)
    elif op == "gather_lane":
        def body(carry, r):
            return carry[:, perm], carry[0, 0]
        carry = vt
    elif op == "gather_rows":
        def body(carry, r):
            return carry[perm, :], carry[0, 0]
        carry = vt.T
    elif op == "gather_1d":
        def body(carry, r):
            return carry[perm], carry[0]
        carry = iota
    elif op == "transpose":
        def body(carry, r):
            vm = carry.T
            return vm.T + 1.0, vm[0, 0]
        carry = vt
    elif op == "segscan":
        from kmerlsh_tpu.cluster.engine import _seg_scan

        def body(carry, r):
            vt, w = carry
            head = (jax.random.fold_in(jax.random.PRNGKey(3), r),)
            hd = jax.random.bernoulli(head[0], 0.3, (m,))
            W, WV, fill = _seg_scan(hd, w, vt, iota, m)
            return (WV, W), fill[0]
        carry = (vt, sizes)
    else:
        raise SystemExit(f"unknown op {op}")

    @jax.jit
    def prog(carry):
        return jax.lax.scan(body, carry, jnp.arange(REPS))

    out = prog(carry)               # compile + first run
    jax.block_until_ready(out)
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = prog(carry)
        jax.block_until_ready(out)
        walls.append(time.perf_counter() - t0)
    per_rep = min(walls) / REPS
    return {"op": op, "logm": logm, "reps": REPS,
            "wall_min_s": round(min(walls), 4),
            "per_rep_s": round(per_rep, 4),
            "ns_per_elem": round(per_rep / (1 << logm) * 1e9, 3),
            "backend": _backend()}


def _backend():
    import jax

    return jax.default_backend()


ALL_OPS = ["sort_full", "sort_kv", "gather_lane", "gather_rows",
           "gather_1d", "transpose", "segscan"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--op")
    ap.add_argument("--logm", type=int, default=24)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--box", type=float, default=900.0,
                    help="per-op subprocess timeout (covers one remote compile)")
    ap.add_argument("--out", default="tools/iter_profile_results.json")
    args = ap.parse_args()

    if args.op:
        print(json.dumps(_run_op(args.op, args.logm)), flush=True)
        return

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    for op in ALL_OPS:
        key = f"{op}@2^{args.logm}"
        if key in results:
            print(f"# cached: {key} -> {results[key]}", flush=True)
            continue
        for attempt in range(2):
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--op", op,
                     "--logm", str(args.logm)],
                    timeout=args.box, capture_output=True, text=True)
                if r.returncode == 0 and r.stdout.strip():
                    results[key] = json.loads(r.stdout.strip().splitlines()[-1])
                    print(f"# {key}: {results[key]}", flush=True)
                    break
                print(f"# {key} rc={r.returncode}: {r.stderr[-300:]}",
                      flush=True)
            except subprocess.TimeoutExpired:
                print(f"# {key} attempt {attempt} timed out "
                      f"({args.box:.0f}s); compile may be cached now",
                      flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
