"""Fused candidate-selection Pallas kernel — the hot op of scan matching.

Given the per-unique-voxel candidate windows gathered from the block map
(`block_map.gather_cover`) and the voxel-sorted query points, produce each
query's K nearest candidates (distances + coordinates) in one pass.

Why a kernel: the XLA formulation of this stage pays for exactly the things
TPUs do worst —
  * spreading group windows to points is a [N]-row dynamic gather of 6 KB
    rows (~4 ms at 16k points),
  * `take_along_axis` extraction of the K winners from 512 lanes is a
    per-element lane gather (~12.7 ms measured),
  * scattering results back to the original point order costs ~1.3 ms per
    output array.
The kernel replaces all three with MXU/VPU-regular work: queries are
processed in tiles of TQ sorted points; because the group ids of sorted
points are monotone, a tile's groups lie in a window of <= 2 aligned blocks
of the candidate table, which Pallas streams into VMEM via two block
mappings (s[i], s[i]+1) — the "banded gather" trick. The spread is then a
one-hot [TQ, 2*TQ] @ [2*TQ, D] matmul (exact: one-hot rows copy f32 values
bit-exactly), distances are plane arithmetic, and the K winners are
extracted by K rounds of {min, equality one-hot, masked reduction} — no
gather anywhere.

Tie semantics: each extraction round breaks exact-distance ties with a
per-lane epsilon added to the selection key, so exactly ONE candidate wins
per round; a bit-identical duplicated map point therefore surfaces once per
round (the duplicate can still win a later round). Matches
`fused_select_xla`'s argmin-lowest-index behavior up to lane order.

Output layout: [N, 128] f32 rows packing [d2(K) | x(K) | y(K) | z(K)] in
the SORTED query order (consumers that need the original order scatter by
`order` themselves; the GN candidate cache consumes sorted order directly).

Reference semantics replaced: the per-iteration KdTree/iVox searches of
icp_optimized.h:78-116 and ivox_map.cpp:6-37.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile of sorted query points per grid step; the group window is 2 blocks
# of TQ table rows
TQ = 128
_BIG = 1e30  # python float: jnp constants may not be captured by kernels


_STENCILS = ("center", "nearby6", "nearby18", "nearby26")


def _stencil_mask(shape, q_ref, plane, stencil):
    """Per-lane mask restricting the 4x4x4 block cover to the reference's
    stencil around each query voxel (src/ivox_map/ivox_map.cpp:43-66).

    Candidate lane j decomposes statically as (block offset bits, local
    voxel bits, bucket pos); its voxel's window coordinate per axis is
    w_a = 2*blk_a + l_a in {0..3}. The query voxel sits at window
    coordinate q_a = 2 - (v_a & 1) (derivation: base block b0 = (v-1)>>1,
    so v - 2*b0 is 2 for even v, 1 for odd). delta_a = w_a - q_a is the
    stencil offset in {-2..2}; the cover is exact iff |delta_a| <= 1."""
    s = plane // 8
    j = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    blk = j // plane
    l = (j % plane) // s
    # _COVER and the local-voxel index share bit order (x<<2 | y<<1 | z)
    wx = 2 * (blk >> 2) + (l >> 2)
    wy = 2 * ((blk >> 1) & 1) + ((l >> 1) & 1)
    wz = 2 * (blk & 1) + (l & 1)
    dx = jnp.abs(wx.astype(jnp.float32) - q_ref[:, 3:4])
    dy = jnp.abs(wy.astype(jnp.float32) - q_ref[:, 4:5])
    dz = jnp.abs(wz.astype(jnp.float32) - q_ref[:, 5:6])
    in26 = (dx <= 1) & (dy <= 1) & (dz <= 1)
    if stencil == "nearby26":
        return in26
    if stencil == "nearby18":
        return in26 & ~((dx == 1) & (dy == 1) & (dz == 1))
    if stencil == "nearby6":
        return in26 & (dx + dy + dz <= 1)
    if stencil == "center":
        return (dx == 0) & (dy == 0) & (dz == 0)
    raise ValueError(stencil)


def _kernel(starts_ref, oh_ref, q_ref, lo_ref, hi_ref, o_ref, *, k, plane,
            stencil):
    del starts_ref  # consumed by the index maps
    win = jnp.concatenate([lo_ref[:], hi_ref[:]], axis=0)  # [2TQ, D]
    spread = jnp.dot(oh_ref[:], win, preferred_element_type=jnp.float32)

    # window rows hold 8 block rows of [x(plane)|y(plane)|z(plane)] each;
    # concatenate the per-block planes into [TQ, 8*plane] coordinate planes
    row_w = 3 * plane
    xs = jnp.concatenate(
        [spread[:, b * row_w + 0 * plane: b * row_w + 1 * plane] for b in range(8)],
        axis=1,
    )
    ys = jnp.concatenate(
        [spread[:, b * row_w + 1 * plane: b * row_w + 2 * plane] for b in range(8)],
        axis=1,
    )
    zs = jnp.concatenate(
        [spread[:, b * row_w + 2 * plane: b * row_w + 3 * plane] for b in range(8)],
        axis=1,
    )

    qx = q_ref[:, 0:1]
    qy = q_ref[:, 1:2]
    qz = q_ref[:, 2:3]
    d2 = (xs - qx) ** 2 + (ys - qy) ** 2 + (zs - qz) ** 2  # [TQ, 8*plane]
    d2 = jnp.where(
        _stencil_mask(d2.shape, q_ref, plane, stencil),
        d2,
        jnp.float32(_BIG) * jnp.float32(_BIG),
    )

    # selection key: exact ties (regular scenes produce many) are broken by
    # lane index so each round extracts exactly ONE candidate — averaging
    # tied candidates would fabricate midpoints and poison surface fits.
    # The relative epsilon only reorders candidates within ~1e-4 of each
    # other, far below any matcher gate; reported d2 stays exact.
    lanes = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1).astype(jnp.float32)
    d2s = d2 * (1.0 + 2e-7 * lanes) + 1e-30 * lanes

    cols = []
    for _ in range(k):
        mn = jnp.min(d2s, axis=1, keepdims=True)  # [TQ, 1]
        hit = d2s <= mn
        w = hit.astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
        w = w / cnt
        cols.append(
            (
                # d2 may be +inf on sentinel lanes where w == 0; 0*inf = NaN,
                # so mask before weighting
                jnp.sum(jnp.where(hit, d2, 0.0) / cnt, axis=1, keepdims=True),
                jnp.sum(w * xs, axis=1, keepdims=True),
                jnp.sum(w * ys, axis=1, keepdims=True),
                jnp.sum(w * zs, axis=1, keepdims=True),
            )
        )
        d2s = jnp.where(hit, jnp.float32(_BIG) * jnp.float32(_BIG), d2s)

    out_d = jnp.concatenate([c[0] for c in cols], axis=1)  # [TQ, k]
    out_x = jnp.concatenate([c[1] for c in cols], axis=1)
    out_y = jnp.concatenate([c[2] for c in cols], axis=1)
    out_z = jnp.concatenate([c[3] for c in cols], axis=1)
    pad = jnp.zeros((out_d.shape[0], 128 - 4 * k), jnp.float32)
    o_ref[:] = jnp.concatenate([out_d, out_x, out_y, out_z, pad], axis=1)


def _q_window_coords(qvox: jax.Array) -> jax.Array:
    """Query voxel coords [N,3] -> window coordinates q_a = 2 - (v_a & 1)
    (f32, for the in-kernel stencil mask)."""
    return (2 - (qvox & 1)).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("k", "plane", "stencil"))
def fused_select(
    cand_tab: jax.Array,  # [Gp, 8*3*plane] cover windows (Gp % TQ == 0)
    gid: jax.Array,  # [N] monotone group id per sorted query (clamped)
    qpts: jax.Array,  # [N, 3] sorted query points
    k: int,
    plane: int,
    stencil: str = "nearby26",
    qvox: jax.Array | None = None,  # [N, 3] query voxel coords (stencil mask)
):
    """Returns (d2 [N,k], x [N,k], y [N,k], z [N,k]) in sorted query order.
    Invalid candidates carry d2 >= 1e18 (the block-map sentinel squared).
    `qvox` is required for the stencil mask (pass the sorted group coords)."""
    assert k <= 32, "output row packs 4*k lanes into 128"
    n = qpts.shape[0]
    assert n % TQ == 0, "pad queries to a multiple of TQ"
    d = cand_tab.shape[1]
    gp = cand_tab.shape[0]
    assert gp % TQ == 0
    assert qvox is not None

    n_tiles = n // TQ
    # per-tile window start, in whole blocks of TQ table rows; +1 block of
    # padding must exist so the hi block of the last window is in range
    starts = gid[:: TQ] // TQ  # [n_tiles]
    tab = jnp.concatenate([cand_tab, jnp.full((TQ, d), _BIG, cand_tab.dtype)])

    lgid = gid - starts.repeat(TQ) * TQ  # [N] in [0, 2*TQ)
    onehot = (
        lgid[:, None] == jnp.arange(2 * TQ, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)
    qpad = jnp.concatenate(
        [qpts, _q_window_coords(qvox), jnp.zeros((n, 2), qpts.dtype)], axis=1
    )  # [N, 8]: x y z qwx qwy qwz 0 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TQ, 2 * TQ), lambda i, s: (i, 0)),
            pl.BlockSpec((TQ, 8), lambda i, s: (i, 0)),
            pl.BlockSpec((TQ, d), lambda i, s: (s[i], 0)),
            pl.BlockSpec((TQ, d), lambda i, s: (s[i] + 1, 0)),
        ],
        out_specs=pl.BlockSpec((TQ, 128), lambda i, s: (i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, plane=plane, stencil=stencil),
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * 2 * TQ * d + 20 * n * 8 * plane * k,
            bytes_accessed=n // TQ * 2 * TQ * d * 4 + n * (2 * TQ + 128) * 4,
            transcendentals=0,
        ),
    )(starts, onehot, qpad, tab, tab)
    return out[:, 0:k], out[:, k:2 * k], out[:, 2 * k:3 * k], out[:, 3 * k:4 * k]


def fused_select_xla(cand_tab, gid, qpts, k, plane, stencil="nearby26",
                     qvox=None):
    """Pure-XLA reference/fallback with identical semantics (used on CPU and
    for parity tests)."""
    assert qvox is not None
    wnd = cand_tab[gid]  # [N, 8*row]
    row_w = 3 * plane
    x = jnp.concatenate(
        [wnd[:, b * row_w: b * row_w + plane] for b in range(8)], axis=1)
    y = jnp.concatenate(
        [wnd[:, b * row_w + plane: b * row_w + 2 * plane] for b in range(8)],
        axis=1)
    z = jnp.concatenate(
        [wnd[:, b * row_w + 2 * plane: b * row_w + 3 * plane] for b in range(8)],
        axis=1)
    d2 = (
        (x - qpts[:, 0:1]) ** 2
        + (y - qpts[:, 1:2]) ** 2
        + (z - qpts[:, 2:3]) ** 2
    )
    qpad = jnp.concatenate([qpts[:, :3], _q_window_coords(qvox)], axis=1)
    d2 = jnp.where(
        _stencil_mask(d2.shape, qpad, plane, stencil), d2, jnp.inf
    )
    neg, idx = jax.lax.top_k(-d2, k)
    return (
        -neg,
        jnp.take_along_axis(x, idx, axis=1),
        jnp.take_along_axis(y, idx, axis=1),
        jnp.take_along_axis(z, idx, axis=1),
    )
