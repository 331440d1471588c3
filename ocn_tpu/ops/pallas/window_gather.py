"""Pallas window-gather: B contiguous (J, H) row windows in one DMA each.

The candidate frame of a link chunk reads feature rows at contiguous CSR
window positions of the hoisted table y = stop_gradient(h)[g.col]
(ops/frame.py `_frame_matmul_multi_window`).  XLA lowers y[pos] as a generic
random row gather (~30 GB/s, BENCH_NOTES.md) because it cannot see that pos
is 4096 runs of K consecutive rows; this kernel issues ONE async copy per
window — 4096 DMAs of J*H*2 bytes — with a D-deep pipeline.

Mosaic requires dim-0 slice starts/shapes in multiples of the 8-row tile, so
windows are widened to J = K + 8, started at the aligned position below
pos0, and the per-window misalignment `off in [0, 8]` is absorbed by the
caller (value arrays are shifted into the padded layout instead of the
feature rows — cheap (B, J) int/float ops, no feature shuffle).
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

SLACK = 8


def kernel_enabled() -> bool:
    """The kernel runs on real TPU backends only (tests run on CPU where
    Mosaic is unavailable); OCN_TPU_NO_WINDOW_KERNEL=1 forces the XLA path."""
    if os.environ.get("OCN_TPU_NO_WINDOW_KERNEL"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover - backend probe
        return False


@functools.lru_cache(maxsize=None)
def _build(e: int, h: int, b: int, j: int, tw: int, dtype_name: str):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dw = 8  # outstanding DMAs

    def kern(p0_ref, y_hbm, out_ref, sem):
        base_t = pl.program_id(0) * tw

        def copy(t):
            p0 = pl.multiple_of(p0_ref[base_t + t], 8)
            return pltpu.make_async_copy(
                y_hbm.at[pl.ds(p0, j), :],
                out_ref.at[pl.ds(t * j, j), :],
                sem.at[t % dw],
            )

        def body(t, _):
            @pl.when(t >= dw)
            def _():
                copy(t - dw).wait()
            copy(t).start()
            return 0

        jax.lax.fori_loop(0, tw, body, 0)

        def drain(t, _):
            copy(t).wait()
            return 0

        jax.lax.fori_loop(tw - dw, tw, drain, 0)

    dtype = jnp.dtype(dtype_name)
    return pl.pallas_call(
        kern,
        grid=(b // tw,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (b,) starts array
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((tw * j, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * j, h), dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((dw,))],
        # no has_side_effects: the kernel's only effect is its declared
        # output, and XLA must be free to DCE the *backward* pass's re-run
        # (the VJP recomputes windows only to form dvals, which is dead in
        # every window-path consumer — cn5/cn6/cn7 values never carry param
        # gradients; with the side-effect flag the dead kernel call survived
        # and doubled the per-chunk gather cost)
    )


def aligned_starts(pos0: jax.Array, e: int, k: int) -> Tuple[jax.Array, jax.Array]:
    """(aligned start, offset) per window; off in [0, SLACK]."""
    j = k + SLACK
    p0 = jnp.minimum((pos0 // 8) * 8, max(e - j, 0)).astype(jnp.int32)
    return p0, (pos0 - p0).astype(jnp.int32)


def window_rows(y: jax.Array, pos0: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Gather (B, J=k+SLACK, H) rows y[p0a[b] : p0a[b]+J] and return them with
    the per-window offset of the true window start.  Pallas on TPU, plain XLA
    slice-gather elsewhere (bit-identical results)."""
    e, h = y.shape
    b = pos0.shape[0]
    j = k + SLACK
    p0a, off = aligned_starts(pos0, e, k)
    # block (tw*j, h) must fit VMEM with pipelining headroom (<= ~4 MB)
    tw = 128
    while tw > 1 and (b % tw or tw * j * h * y.dtype.itemsize > 4 * 2**20):
        tw //= 2
    if kernel_enabled() and b % tw == 0 and e >= j:
        rows = _build(e, h, b, j, tw, str(y.dtype))(p0a, y)
        return rows.reshape(b, j, h), off
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, j), 1)
    pos = jnp.minimum(p0a[:, None] + lane, e - 1)
    return y[pos], off


def pad_vals(vals: jax.Array, off: jax.Array, j: int) -> jax.Array:
    """Shift (P, B, K) value planes into the padded window layout:
    out[p, b, off[b] + k] = vals[p, b, k], zeros elsewhere.  (B, J) domain
    elementwise ops — this replaces shifting the (B, J, H) feature rows."""
    p, b, k = vals.shape
    jlane = jax.lax.broadcasted_iota(jnp.int32, (b, j), 1)
    src = jlane - off[:, None]
    valid = (src >= 0) & (src < k)
    src = jnp.clip(src, 0, k - 1)
    gathered = jnp.take_along_axis(
        vals, jnp.broadcast_to(src[None], (p, b, j)), axis=2
    )
    return jnp.where(valid[None], gathered, 0.0)
