"""Smoke-test Pallas TPU support on the axon platform: basic kernel,
scalar-prefetch, and dynamic row indexing from a VMEM-resident table."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def test_basic():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)
    print("basic kernel: OK")


def test_dynamic_row_loop():
    """Gather rows from a VMEM table via fori_loop + scalar dynamic index."""
    C, D, B = 4096, 128, 1024

    def kernel(idx_ref, tab_ref, o_ref):
        def body(i, _):
            o_ref[i, :] = tab_ref[idx_ref[i], :]
            return 0
        jax.lax.fori_loop(0, B, body, 0)

    tab = jnp.arange(C * D, dtype=jnp.float32).reshape(C, D)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, C, B), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        grid_spec=grid_spec,
    )
    out = f(idx, tab)
    np.testing.assert_allclose(np.asarray(out), np.asarray(tab)[np.asarray(idx)])
    print("dynamic row loop gather: OK")
    # pipelined timing
    out = jax.block_until_ready(f(idx, tab))
    t0 = time.perf_counter()
    for _ in range(50):
        out = f(idx, tab)
    jax.block_until_ready(out)
    print(f"  loop-gather {B} rows from VMEM[{C},{D}]: "
          f"{(time.perf_counter()-t0)/50*1e3:.3f} ms")


def test_vector_gather():
    """Try jnp.take with a vector of indices inside a kernel."""
    C, D, B = 4096, 128, 1024

    def kernel(idx_ref, tab_ref, o_ref):
        o_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    tab = jnp.arange(C * D, dtype=jnp.float32).reshape(C, D)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, C, B), jnp.int32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, tab)
        np.testing.assert_allclose(np.asarray(out), np.asarray(tab)[np.asarray(idx)])
        print("vector gather (jnp.take axis=0): OK")
    except Exception as e:
        print(f"vector gather (jnp.take axis=0): FAILED ({type(e).__name__}: "
              f"{str(e)[:200]})")


def test_take_along_axis_lanes():
    """Per-row lane gather: take_along_axis on the last axis."""
    B, D = 256, 512

    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)

    x = jnp.arange(B * D, dtype=jnp.float32).reshape(B, D)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, D, (B, 128)), jnp.int32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)
        np.testing.assert_allclose(
            np.asarray(out),
            np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1))
        print("take_along_axis lanes: OK")
    except Exception as e:
        print(f"take_along_axis lanes: FAILED ({type(e).__name__}: {str(e)[:200]})")


def test_hbm_dma_rows():
    """DMA dynamic rows from an HBM-resident table into VMEM scratch."""
    C, D, B = 65536, 128, 512

    def kernel(idx_ref, tab_hbm, o_ref):
        def inner(scratch, sem):
            def body(i, _):
                dma = pltpu.make_async_copy(
                    tab_hbm.at[idx_ref[i]], scratch.at[i % 8], sem.at[i % 8])
                dma.start()
                dma.wait()
                o_ref[i, :] = scratch[i % 8]
                return 0
            jax.lax.fori_loop(0, B, body, 0)
        pl.run_scoped(
            inner,
            scratch=pltpu.VMEM((8, D), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((8,)),
        )

    tab = jnp.arange(C * D, dtype=jnp.float32).reshape(C, D)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, C, B), jnp.int32)
    try:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
            grid_spec=grid_spec,
        )(idx, tab)
        np.testing.assert_allclose(np.asarray(out), np.asarray(tab)[np.asarray(idx)])
        print("HBM row DMA gather: OK")
    except Exception as e:
        print(f"HBM row DMA gather: FAILED ({type(e).__name__}: {str(e)[:300]})")


if __name__ == "__main__":
    print(f"platform: {jax.devices()[0]}")
    test_basic()
    test_dynamic_row_loop()
    test_vector_gather()
    test_take_along_axis_lanes()
    test_hbm_dma_rows()
