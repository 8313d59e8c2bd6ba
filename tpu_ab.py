"""TPU A/B measurement harness for the round-3 performance backlog.

Runs bench.py under a matrix of env configurations (one fresh process per
config — env knobs are read at import/plan time), appending one JSON line
per config to AB_RESULTS.jsonl. Resumable: configs already present in the
results file are skipped, so a dropped tunnel just means re-running.

Backlog (VERDICT r2 items 1, 2, 6, 7):
  base        — reproduce the r2 906 GF/s reference point
  place_auto  — placement strategy engine (gather/scan vs one-hot mm)
  solve_inv   — inverse-panel single-RHS solve (<5 ms target)
  ladder      — coarse shape ladder (compile time; 141 -> 82 shapes)
  nd2000      — nd_small=2000 tree (better lnz/fl, +28% nsuper)
  bf16        — bfloat16 update mode (+ fp64-IR contract)

Usage:  python tpu_ab.py [config ...]   (default: all, in order)
"""
import json
import os
import subprocess
import sys
import time

_OFF = {"SSTPU_SOLVE_INV": "0", "SSTPU_SOLVE_COARSE": "0"}
CONFIGS = {
    "base": {"SSTPU_PLACE": "mm", **_OFF},
    "place_auto": {"SSTPU_PLACE": "auto", **_OFF},
    "solve_inv": {"SSTPU_PLACE": "mm", "SSTPU_SOLVE_INV": "1",
                  "SSTPU_SOLVE_COARSE": "0"},
    "solve_coarse": {"SSTPU_PLACE": "mm", "SSTPU_SOLVE_INV": "0",
                     "SSTPU_SOLVE_COARSE": "1"},
    "solve_both": {"SSTPU_PLACE": "mm", "SSTPU_SOLVE_INV": "1",
                   "SSTPU_SOLVE_COARSE": "1"},
    "place_inv": {"SSTPU_PLACE": "auto", "SSTPU_SOLVE_INV": "1",
                  "SSTPU_SOLVE_COARSE": "1"},
    "ladder": {"SSTPU_PLACE": "auto", "SSTPU_LADDER": "coarse", **_OFF},
    "nd2000": {"SSTPU_PLACE": "auto", "SSTPU_ND_SMALL": "2000", **_OFF},
    "bf16": {"SSTPU_PLACE": "auto", "SSTPU_UPDATE_DTYPE": "bfloat16",
             **_OFF},
    # first-call lever: force the segmented schedule (~7 programs at
    # n=125k) and compile them CONCURRENTLY via the remote compiler
    # (SSTPU_SEG_PRECOMPILE); steady state pays only segment-boundary
    # dispatches. Watch first_call_s vs base_cold AND value (GF/s) parity.
    # Both use FRESH compilation-cache dirs: the persistent cache from
    # earlier configs/rounds would otherwise make first_call_s meaningless.
    # round-4: tiled extend-add Pallas kernel (kernels/extend_add_tiles.py).
    # Controlled A/B (fresh runs, n=125k): v1 Ucat+consts 91.7 ms; the v2
    # direct-feed redesign (per-class BlockSpec quads, parked slots) was
    # 99.7 ms consts / 101.3 ms args AND 2.7x the compile time — REVERTED.
    # Args mode itself costs only ~1.6 ms steady; consts stay the default.
    "tile": {"SSTPU_PLACE": "tile"},
    # round-4 session-3: two-piece grid steps (12 branch-free dots/step,
    # dead tail piece = all-(-1) maps) cut the step-bound grid 20.2k ->
    # 12.2k steps at n=125k; frac=0 folds every class of every R>=256
    # group (kills the 13.4 ms non-folded XLA classes) for +199 steps.
    "tile_pair": {"SSTPU_PLACE": "tile", "SSTPU_TILE_PAIR": "1"},
    "tile_frac0": {"SSTPU_PLACE": "tile", "SSTPU_TILE_FRAC": "0"},
    "tile_pair_frac0": {"SSTPU_PLACE": "tile", "SSTPU_TILE_PAIR": "1",
                        "SSTPU_TILE_FRAC": "0"},
    # round-4: lane-batched matvec solve kernel (kernels/bmatvec.py) on
    # the inverse-panel path — attacks the ~37 GB/s XLA batched-matvec
    # half of the 9.9 ms solve (watch solve_s; factor must not move).
    "bmv": {"SSTPU_SOLVE_BMV": "1"},
    "bmv48": {"SSTPU_SOLVE_BMV": "1", "SSTPU_BMV_BMIN": "48"},
    # round-5: bmv re-run after the ADVICE r4 fixes (itemsize threading,
    # _iblk NameError); kernel now validated correct on real TPU (fwd/bwd
    # rel err <= 2e-7 at four shape classes). bmv_fine = the fine-plan
    # variant (284 MB/sweep floor vs coarse's 440 MB) with lane-batched
    # matvecs covering the small-C groups that made fine lose before.
    "bmv_r5": {"SSTPU_SOLVE_BMV": "1"},
    "bmv_fine": {"SSTPU_SOLVE_BMV": "1", "SSTPU_SOLVE_INV": "1",
                 "SSTPU_SOLVE_COARSE": "0"},
    "inv_fine": {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "0"},
    "base_cold": {"SSTPU_PLACE": "mm",
                  "JAX_COMPILATION_CACHE_DIR": "/tmp/sstpu_cold_base",
                  **_OFF},
    "seg_pre": {"SSTPU_PLACE": "mm", "SSTPU_SEGMENT": "1",
                "SSTPU_SEG_PRECOMPILE": "6", "SSTPU_SEG_CELLS": "1.5e8",
                "JAX_COMPILATION_CACHE_DIR": "/tmp/sstpu_cold_segpre",
                **_OFF},
}

RESULTS = os.path.join(os.path.dirname(__file__), "AB_RESULTS.jsonl")


def done_configs():
    out = set()
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            for line in f:
                try:
                    out.add(json.loads(line)["config"])
                except Exception:
                    pass
    return out


def run(name: str, extra_env: dict) -> bool:
    env = dict(os.environ)
    env.update(extra_env)
    t = time.time()
    try:
        p = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                           text=True, env=env, timeout=3600)
    except subprocess.TimeoutExpired:
        with open(RESULTS, "a") as f:
            f.write(json.dumps({"config": name, "env": extra_env,
                                "rc": "timeout",
                                "wall_s": round(time.time() - t, 1)}) + "\n")
        print(f"[{name}] TIMEOUT")
        return False
    line = None
    for ln in reversed(p.stdout.splitlines()):
        if ln.startswith("{"):
            line = ln
            break
    rec = {"config": name, "env": extra_env, "rc": p.returncode,
           "wall_s": round(time.time() - t, 1)}
    if line:
        try:
            rec["bench"] = json.loads(line)
        except Exception:
            rec["raw"] = line[-500:]
    else:
        rec["stderr_tail"] = p.stderr[-500:]
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    ok = p.returncode == 0 and line is not None
    print(f"[{name}] {'OK' if ok else 'FAIL'} {rec.get('wall_s')}s "
          f"{(rec.get('bench') or {}).get('value')}")
    return ok


def main():
    names = sys.argv[1:] or list(CONFIGS)
    skip = done_configs()
    for name in names:
        if name in skip:
            print(f"[{name}] already recorded, skipping")
            continue
        run(name, CONFIGS[name])


if __name__ == "__main__":
    main()
