"""Kernel micro-benchmarks: the FPS / ball-query timings BASELINE.json calls
the "FPS kernel us" target. Chains calls through a data dependency and
fetches once per block (the ~32ms per-dispatch round trip of the axon TPU
transport would otherwise dominate — see .claude/skills/verify/SKILL.md).

Caveat: on the axon transport, asynchronous dispatch itself costs ~3.5 ms per
call, so any reading near that value is a dispatch floor, not device time —
inside the single-jit train step these ops are much cheaper.

Run: python benchmarks/kernel_bench.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t_block(fn, *args, n=10):
    import jax
    import jax.numpy as jnp
    o = fn(*args)
    _ = np.asarray(jnp.ravel(jax.tree_util.tree_leaves(o)[0])[0])
    best = 1e9
    for rep in range(3):
        t0 = time.perf_counter()
        last = None
        for _ in range(n):
            last = fn(*args)
        _ = np.asarray(jnp.ravel(jax.tree_util.tree_leaves(last)[0])[0])
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from omni_pq_tpu import ops
    from omni_pq_tpu.data.synthetic import make_batch

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    pc = jnp.asarray(make_batch(rng, 6, 40000)["point_clouds"])

    rows = []
    for npoint, name in [(2048, "sa1 40000->2048"), (1024, "2048->1024")]:
        src = pc if npoint == 2048 else ops.gather_points(pc, ops.fps(pc, 2048))
        f = jax.jit(lambda x, np_=npoint: ops.fps(x, np_))
        ms = t_block(f, src)
        per = ms * 1e3 / npoint
        rows.append((f"fps {name}", ms, f"{per:.2f} us/step (bs6)"))

    c1 = ops.gather_points(pc, ops.fps(pc, 2048))
    f = jax.jit(lambda x, c: ops.ball_query(0.2, 64, x, c))
    rows.append(("ball_query sa1 (40000x2048x64)", t_block(f, pc, c1), ""))
    p2 = c1
    c2 = ops.gather_points(p2, ops.fps(p2, 1024))
    f2 = jax.jit(lambda x, c: ops.ball_query(0.4, 32, x, c))
    rows.append(("ball_query sa2 (2048x1024x32)", t_block(f2, p2, c2), ""))
    fg = jax.jit(lambda x, c: ops.ball_query_group(0.2, 64, x, c))
    rows.append(("ball_query_group sa1 (fused)", t_block(fg, pc, c1), ""))
    f3 = jax.jit(lambda u, k: ops.three_nn(u, k))
    rows.append(("three_nn (1024x512)", t_block(f3, c2[:, :1024], c2[:, :512]), ""))

    for name, ms, extra in rows:
        print(f"{name:34s} {ms:7.2f} ms  {extra}")


if __name__ == "__main__":
    main()
