"""Pallas TPU kernel for batched one-hot row selection (candidate gather).

The compacted update path assembles the surviving merge-candidate lanes'
source rows by one-hot matmuls (ops/ekf.py::select_compact_candidates —
TPU gathers of tiny rows serialize, so row moves ride the MXU). Under XLA
that one-hot operand [P, cap, K] must MATERIALIZE in HBM (dot operands are
never fusion outputs): 2.7 GB at P=10240, measured 11.5 ms for a 0.5 ms
MXU contraction. This kernel builds the one-hot in VMEM per particle
block and writes only the gathered rows back — HBM traffic drops to the
tables + outputs (~0.5 GB at P=10240).

Reference context: the gather feeds the merge-candidate compaction that
replaces the reference's thrust stream compaction + ragged per-particle
maps (/root/reference/src/phdfilter.cu:3105-3174, SURVEY.md §2.4-P5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 8


_OH_CHUNK = 512  # one-hot lane chunk: bounds VMEM at B * R * 512 * 4 bytes


def _pick_gather_block(P, R, cap, C):
    """Largest particle block whose transient one-hot (+ operands) fits in
    scoped VMEM. Live ≈ 2.5 one-hot-sized values (iota + compare + f32) per
    chunk plus the tables; at reference shapes (R=128, cap=512) this keeps
    B=8, at dense shapes (R=1024) it drops to 2."""
    chunk = min(cap, _OH_CHUNK)
    budget = 12 * 1024 * 1024
    for B in (_BLOCK, 4, 2):
        live = B * 4 * (int(2.5 * R * chunk) + C * R + C * cap)
        if B <= P and live <= budget:
            return B
    return 1


def _cols_kernel(idx_ref, tab_ref, out_ref, *, n_rows, block):
    """Transposed gather: out[b, :, c] = tab[b, :, idx[b, c]].

    idx [B, 1, cap] int32 (the singleton keeps the block's trailing dims
    equal to the array dims — Mosaic requires sublane divisibility by 8
    otherwise, which a VMEM-shrunk block B < 8 violates), tab [B, C, R],
    out [B, C, cap]. The one-hot sits
    on the RIGHT of the dot ([C, R] @ [R, cap]) so the result keeps the
    lane axis (cap) minor — no (8, 128)-tiling padding downstream. The
    one-hot is built in <= _OH_CHUNK-lane chunks so its VMEM footprint is
    bounded regardless of cap (a full [B, 1024, 1536] one-hot at dense
    shapes would be 50 MB).
    """
    cap = idx_ref.shape[2]
    for lo in range(0, cap, _OH_CHUNK):
        hi = min(lo + _OH_CHUNK, cap)
        # chunk loads slice the REF: lane-slicing a loaded value at a
        # non-zero offset lowers to an unsupported Mosaic gather
        idx_c = idx_ref[:, 0, lo:hi]       # [B, chunk] int32
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (block, n_rows, hi - lo), 1)
        oh = (idx_c[:, None, :] == iota).astype(jnp.float32)
        for b in range(block):
            out_ref[b, :, lo:hi] = jnp.dot(
                tab_ref[b], oh[b], preferred_element_type=jnp.float32)


def onehot_cols_xla(idx, tab_t):
    """XLA fallback for the transposed gather. idx [..., cap] int32 in
    [0, R); tab_t [..., C, R] -> [..., C, cap]."""
    R = tab_t.shape[-1]
    oh = (idx[..., None, :]
          == jnp.arange(R, dtype=jnp.int32)[..., :, None]).astype(tab_t.dtype)
    return tab_t @ oh


@functools.partial(jax.jit, static_argnames=("interpret",))
def onehot_cols_batch(idx, tab_t, interpret=False):
    """Batched transposed one-hot gather: out[p, :, c] = tab_t[p, :, idx[p, c]].

    idx [P, cap] int32 in [0, R), tab_t [P, C, R] f32 -> [P, C, cap] f32.
    Exact row copies (one f32 term per output element).
    """
    from .pallas_merge import pallas_available
    if not (interpret or pallas_available()):
        return onehot_cols_xla(idx, tab_t)

    P, cap = idx.shape
    C, R = tab_t.shape[1], tab_t.shape[2]
    B = _pick_gather_block(P, R, cap, C) if P >= _BLOCK else P
    P_pad = ((P + B - 1) // B) * B
    if P_pad != P:
        idx = jnp.concatenate(
            [idx, jnp.zeros((P_pad - P, cap), idx.dtype)], axis=0)
        tab_t = jnp.concatenate(
            [tab_t, jnp.zeros((P_pad - P, C, R), tab_t.dtype)], axis=0)

    out = pl.pallas_call(
        functools.partial(_cols_kernel, n_rows=R, block=B),
        out_shape=jax.ShapeDtypeStruct((P_pad, C, cap), jnp.float32),
        grid=(P_pad // B,),
        in_specs=[pl.BlockSpec((B, 1, cap), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((B, C, R), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, C, cap), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx[:, None, :], tab_t)
    return out[:P]


def _rows_kernel(idx_ref, tab_ref, out_ref, *, n_rows, block):
    cap = idx_ref.shape[2]
    for lo in range(0, cap, _OH_CHUNK):    # bounded-VMEM one-hot chunks
        hi = min(lo + _OH_CHUNK, cap)
        idx_c = idx_ref[:, 0, lo:hi]       # [B, chunk] int32 (ref slice)
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (block, hi - lo, n_rows), 2)
        oh = (idx_c[:, :, None] == iota).astype(jnp.float32)
        for b in range(block):
            out_ref[b, lo:hi, :] = jnp.dot(
                oh[b], tab_ref[b], preferred_element_type=jnp.float32)


def onehot_rows_xla(idx, tab):
    """XLA fallback: materialized one-hot matmul (exact row copy under the
    package-wide f32 "highest" matmul precision). idx [..., cap] int32 in
    [0, R); tab [..., R, C] -> [..., cap, C]."""
    R = tab.shape[-2]
    oh = (idx[..., None] == jnp.arange(R, dtype=jnp.int32)).astype(tab.dtype)
    return oh @ tab


@functools.partial(jax.jit, static_argnames=("interpret",))
def onehot_rows_batch(idx, tab, interpret=False):
    """Batched one-hot row gather: out[p, c] = tab[p, idx[p, c]].

    idx [P, cap] int32 in [0, R), tab [P, R, C] f32 -> [P, cap, C] f32.
    Exact row copies (the one-hot dot accumulates exactly one f32 term).
    """
    from .pallas_merge import pallas_available
    if not (interpret or pallas_available()):
        return onehot_rows_xla(idx, tab)

    P, cap = idx.shape
    R, C = tab.shape[1], tab.shape[2]
    B = _pick_gather_block(P, R, cap, C) if P >= _BLOCK else P
    P_pad = ((P + B - 1) // B) * B
    if P_pad != P:
        idx = jnp.concatenate(
            [idx, jnp.zeros((P_pad - P, cap), idx.dtype)], axis=0)
        tab = jnp.concatenate(
            [tab, jnp.zeros((P_pad - P, R, C), tab.dtype)], axis=0)

    out = pl.pallas_call(
        functools.partial(_rows_kernel, n_rows=R, block=B),
        out_shape=jax.ShapeDtypeStruct((P_pad, cap, C), jnp.float32),
        grid=(P_pad // B,),
        in_specs=[pl.BlockSpec((B, 1, cap), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((B, R, C), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, cap, C), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx[:, None, :], tab)
    return out[:P]
