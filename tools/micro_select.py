"""Micro-benchmarks for round 4: selection (top-k) alternatives and gather
row-size/layout cost curves on the real TPU. These decide the fused-select
kernel design (docs/ROOFLINE.md kernel 1 follow-up)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N, CAND, K = 16384, 216, 16


def timeit(f, *args, n=50):
    r = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3, r


def main():
    rng = np.random.default_rng(0)
    d2 = jnp.asarray(rng.uniform(0, 100, (N, CAND)), jnp.float32)
    pts = jnp.asarray(rng.uniform(-40, 40, (N, CAND, 3)), jnp.float32)

    @jax.jit
    def exact_topk(d2, pts):
        neg, idx = jax.lax.top_k(-d2, K)
        nbrs = jnp.take_along_axis(pts, idx[..., None], axis=1)
        return nbrs, -neg

    t, (nb_ref, d_ref) = timeit(exact_topk, d2, pts)
    print(f"top_k(k={K}) over [{N},{CAND}] + point gather: {t:.2f} ms")

    @jax.jit
    def exact_topk_only(d2):
        neg, _ = jax.lax.top_k(-d2, K)
        return -neg

    t, _ = timeit(exact_topk_only, d2)
    print(f"top_k(k={K}) distances only: {t:.2f} ms")

    @jax.jit
    def approx(d2, pts):
        neg, idx = jax.lax.approx_max_k(-d2, K, recall_target=0.95)
        nbrs = jnp.take_along_axis(pts, idx[..., None], axis=1)
        return nbrs, -neg

    try:
        t, (nb_a, d_a) = timeit(approx, d2, pts)
        # recall vs exact
        match = (d_a[:, :1] == d_ref[:, :1]).mean()
        print(f"approx_max_k(k={K}, recall .95) + gather: {t:.2f} ms  "
              f"top1-agree={match:.3f}")
    except Exception as e:
        print(f"approx_max_k: FAILED {type(e).__name__}: {str(e)[:150]}")

    @jax.jit
    def iter_extract(d2, pts):
        """k rounds of min + first-match one-hot masked-sum (the in-kernel
        friendly selection: no gather at all)."""
        d = d2
        outs_d, outs_p = [], []
        for _ in range(K):
            m = jnp.min(d, axis=1, keepdims=True)  # [N,1]
            hit = d == m
            first = hit & (jnp.cumsum(hit, axis=1) == 1)
            w = first.astype(d2.dtype)
            outs_d.append(m[:, 0])
            outs_p.append(jnp.einsum("nc,ncd->nd", w, pts))
            d = jnp.where(first, jnp.inf, d)
        return jnp.stack(outs_p, 1), jnp.stack(outs_d, 1)

    t, (nb_i, d_i) = timeit(iter_extract, d2, pts)
    err = jnp.max(jnp.abs(jnp.sort(d_i, 1) - jnp.sort(d_ref, 1))).item()
    print(f"iterative extract k={K} (min+onehot matmul): {t:.2f} ms  "
          f"max_d_err={err:.2e}")

    @jax.jit
    def sort_based(d2, pts):
        idx = jnp.argsort(d2, axis=1)[:, :K]
        nbrs = jnp.take_along_axis(pts, idx[..., None], axis=1)
        return nbrs, jnp.take_along_axis(d2, idx, axis=1)

    t, _ = timeit(sort_based, d2, pts)
    print(f"argsort-based k={K}: {t:.2f} ms")

    # ---- gather row-size cost curve ----
    print("\ngather cost vs row layout (R rows):")
    C = 65536
    for R, shape in [
        (221184, (8, 3)),     # current bucket layout
        (221184, (24,)),      # flattened bucket
        (65536, (200,)),      # 2x2x2 block rows (pts+counts, f32)
        (65536, (8, 8, 3)),   # block rows, nested minor dims
        (16384, (200,)),
    ]:
        D = int(np.prod(shape))
        tab = jnp.asarray(rng.uniform(size=(C,) + shape), jnp.float32)
        idx = jnp.asarray(rng.integers(0, C, R), jnp.int32)

        @jax.jit
        def g(idx, tab=tab):
            return tab[idx]

        t, _ = timeit(g, idx, n=20)
        print(f"  {R:>7} rows of {str(shape):>10} ({D*4:>5}B): {t:6.2f} ms"
              f"  ({t*1e6/R:6.1f} ns/row)")


if __name__ == "__main__":
    main()
