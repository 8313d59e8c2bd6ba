"""On-chip HBM effective-rate probe (streaming, matvec, panel-shaped ops).

Grounds the solve/factor bandwidth floors: solve_report assumes nominal v5e
HBM (~800 GB/s); NOTES round-2 measured ~93 GB/s "effective" through small
ops. This chains K iterations inside one jit (no per-op dispatch) and
reports GB/s for: big-array copy-add (pure stream), (C,C)@(C,1) matvec
ladder (the inverse-panel solve shape), and (B,C,C)@(B,C,1) batched matvec.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def rate(fn, args, nbytes, iters=8, trials=4):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jnp.sum(out))  # warm + sync
    best = float("inf")
    for _t in range(trials):
        t0 = time.time()
        outs = [f(*args) for _ in range(iters)]
        _ = float(sum(jnp.sum(o) for o in outs))
        best = min(best, (time.time() - t0) / iters)
    return nbytes / best / 1e9, best


def main():
    print("platform:", jax.devices()[0].platform)
    # 1) pure stream: y = x * a + y over 256 MB
    n = 64 << 20
    x = jnp.arange(n, dtype=jnp.float32)
    y = jnp.ones((n,), jnp.float32)

    def stream(x, y):
        return x * 1.0001 + y
    gbps, t = rate(stream, (x, y), 3 * n * 4)
    print(f"stream 256MB axpy: {gbps:.0f} GB/s ({t*1e3:.2f} ms)")

    # 2) single big matvec chain (solve root-step shape)
    # NOTE all operands are generated ON DEVICE (jax PRNG): host arrays
    # would ride the ~0.6 MB/s H2D tunnel for minutes
    C = 3840
    W = jax.random.normal(jax.random.PRNGKey(0), (C, C), jnp.float32)
    v = jnp.ones((C, 1), jnp.float32)

    def mv(W, v):
        out = v
        for _ in range(16):
            out = W @ out * 1e-3
        return out
    gbps, t = rate(mv, (W, v), 16 * C * C * 4, iters=4)
    print(f"matvec {C}x{C} x16-chain: {gbps:.0f} GB/s ({t*1e3:.2f} ms)")

    # 3) batched small matvec (solve leaf-step shape)
    B, C2 = 1024, 64
    Wb = jax.random.normal(jax.random.PRNGKey(1), (B, C2, C2), jnp.float32)
    vb = jnp.ones((B, C2, 1), jnp.float32)

    def bmv(Wb, vb):
        out = vb
        for _ in range(16):
            out = jnp.matmul(Wb, out) * 1e-3
        return out
    gbps, t = rate(bmv, (Wb, vb), 16 * B * C2 * C2 * 4, iters=4)
    print(f"batched matvec {B}x{C2}x{C2} x16: {gbps:.0f} GB/s ({t*1e3:.2f} ms)")

    # 4) gather rate (row gather, factor-assembly shape)
    rows, w = 1 << 20, 64
    src = jax.random.normal(jax.random.PRNGKey(2), (rows, w), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(3), (rows,), 0, rows,
                             jnp.int32)

    def ga(src, idx):
        return src[idx] * 1.0001
    gbps, t = rate(ga, (src, idx), 2 * rows * w * 4, iters=4)
    print(f"row gather {rows}x{w}: {gbps:.0f} GB/s ({t*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
