"""On-chip microbench: XLA fused matmul+argmax vs the Pallas streaming
similarity kernel (ops/pallas/similarity.py) at production shapes.

Timing protocol per CLAUDE.md: warmup ends with a scalar fetch; the timed
loop ends with a scalar fetch of the LAST result (in-order queue).

Run:  python scripts/bench_similarity.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from gdm_tpu.ops.pallas.similarity import cosine_argmax_batched


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    float(jax.device_get(out[0].ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.device_get(out[0].ravel()[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    dev = jax.devices()[0]
    print("device:", dev)
    for b, n, m, c in [(8, 4096, 4096, 128),    # lmo/ycbv eval shapes
                       (8, 12800, 4096, 128),   # lmfull eval shapes
                       (8, 4096, 16384, 128),   # hypothetical big mesh
                       (8, 12800, 65536, 128)]: # giant mesh (SP-scale)
        f = jax.device_put(rng.randn(b, n, c).astype(np.float32), dev)
        g = jax.device_put(rng.randn(m, c).astype(np.float32), dev)
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        g = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
        try:
            ms_x = timeit(lambda a, b_: cosine_argmax_batched(
                a, b_, use_pallas=False), f, g)
        except Exception as e:
            ms_x = None
            print(f"  xla failed: {str(e)[:100]}")
        try:
            ms_p = timeit(lambda a, b_: cosine_argmax_batched(
                a, b_, use_pallas=True), f, g)
            ix, sx = cosine_argmax_batched(f, g, use_pallas=False) \
                if ms_x else (None, None)
            ip, _ = cosine_argmax_batched(f, g, use_pallas=True)
            mism = int(jnp.sum(ix != ip)) if ix is not None else -1
        except Exception as e:
            ms_p, mism = None, -1
            print(f"  pallas failed: {str(e)[:100]}")
        print(f"B={b} N={n} M={m}: xla={ms_x and round(ms_x, 2)} ms "
              f"pallas={ms_p and round(ms_p, 2)} ms "
              f"idx-mismatches={mism}/{b * n}")


if __name__ == "__main__":
    main()
