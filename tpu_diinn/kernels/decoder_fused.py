"""Fused Pallas TPU kernel for the DIINN dual-MLP implicit decoder (mode 3).

Replaces the HR-resolution portion of the factorized decoder (nn/diinn.py
``hr_step``): given the stacked LR content features ``z`` (the per-layer 3x3
convs, concatenated channel-wise) and the synthesis grid, it decodes an HR
tile entirely in VMEM:

    k = relu(z0)
    q = k * sin(syn @ W0 + b0)
    for i in 1..L-1:
        k = relu(q @ Wkq_i + z_i + bkq_i)
        q = k * sin(q @ Wq_i + bq_i)
    out = q @ Wlast + blast

Why a kernel: in the XLA path every matmul materializes a (B, H_out, W_out,
256) bf16 tensor (~19 MB per image per layer) to HBM, and the nearest-exact
upsampled features are 4x256 channels at HR — the decoder is HBM-bound at
~30% MXU utilization. Here the LR features are gathered *inside* the kernel
(one-hot matmuls on the MXU: rows via a per-tile slice of S_row, columns via
S_col), the k/q chain lives in VMEM, and HBM traffic drops to the LR z
(~38x less) plus the RGB output.

Grid: (B, H_out/TILE_H); each program decodes TILE_H full-width output rows.
The backward kernel recomputes the chain per tile and accumulates dz and all
weight grads across the sequential TPU grid (multiple-visit output blocks),
so no HR activations are ever saved. Exposed as ``decode_fused`` with a
``jax.custom_vjp``.

Reference semantics: diinn.py:112-147 (mode 3), diinn.py:163-173.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_diinn.core import grids
from tpu_diinn.core.fastmath import _poly_sin as _sin


def _cos(x):
    return _sin(x + 1.5707963267948966)

Array = jnp.ndarray


def _pick_tile_h(h_out: int) -> int:
    for t in (16, 8, 32, 4, 2, 1):
        if h_out % t == 0:
            return t
    return 1


def _pick_tile_h_int(h_out: int, s_h: int) -> int:
    """Largest multiple of ``s_h`` (<= 16) dividing ``h_out``: the integer
    fast path's tile must cover whole LR rows."""
    best = s_h
    for t in range(s_h, 17, s_h):
        if h_out % t == 0:
            best = t
    return best


def _repeat_block(z, s_h: int, s_w: int):
    """(R, W, C) LR features -> (R*s_h*W*s_w, C) queries, row-major over the
    (R*s_h, W*s_w) output tile — nearest-exact for integer ratios is exactly
    an s_h x s_w block repeat (idx[i] = i // s for n_out = s * n_in), so the
    gather is a VPU broadcast instead of one-hot MXU matmuls."""
    r, w, c = z.shape
    zb = jnp.broadcast_to(z[:, None, :, None, :], (r, s_h, w, s_w, c))
    return zb.reshape(r * s_h * w * s_w, c)


def _fold_block(dzt, r: int, s_h: int, w: int, s_w: int):
    """Adjoint of ``_repeat_block``: (R*s_h*W*s_w, C) -> (R, W, C) sum over
    each s_h x s_w block."""
    c = dzt.shape[-1]
    return dzt.reshape(r, s_h, w, s_w, c).sum(axis=(1, 3))


def _chain_fwd(zt, syn, w0_ref, b0_ref, wkq_ref, bkq_ref, wq_ref, bq_ref,
               wl_ref, bl_ref, *, n_layers: int, hidden: int):
    """Dual-MLP chain over a flat (M, C_all) tile, fp32 accumulation."""
    k = jax.nn.relu(zt[:, :hidden].astype(jnp.float32))
    cdt = w0_ref.dtype
    q0 = jax.lax.dot_general(syn.astype(cdt), w0_ref[...],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    q = k * _sin(q0 + b0_ref[...].astype(jnp.float32))
    for i in range(1, n_layers):
        zi = zt[:, i * hidden:(i + 1) * hidden].astype(jnp.float32)
        kq = jax.lax.dot_general(
            q.astype(cdt), wkq_ref[i - 1],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        k = jax.nn.relu(kq + zi + bkq_ref[i - 1].astype(jnp.float32))
        qq = jax.lax.dot_general(
            q.astype(cdt), wq_ref[i - 1],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        q = k * _sin(qq + bq_ref[i - 1].astype(jnp.float32))
    out = jax.lax.dot_general(
        q.astype(cdt), wl_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return out + bl_ref[...].astype(jnp.float32)


def _fwd_kernel(syn_ref, z_ref, srow_ref, scol_ref,
                w0_ref, b0_ref, wkq_ref, bkq_ref, wq_ref, bq_ref,
                wl_ref, bl_ref, out_ref, *, n_layers: int, hidden: int,
                w_in: int, w_out: int, tile_h: int):
    ch_all = n_layers * hidden
    # 1) row gather: (TH, H_in) @ (H_in, W_in*C) on the MXU
    z = z_ref[0]                      # (H_in, W_in, C_all)
    h_in = z.shape[0]
    zr = jax.lax.dot_general(
        srow_ref[...], z.reshape(h_in, w_in * ch_all),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(z.dtype)
    zr = zr.reshape(tile_h, w_in, ch_all)
    # 2) column gather per tile row: (W_out, W_in) @ (W_in, C)
    scol = scol_ref[...]
    rows = []
    for t in range(tile_h):
        rows.append(jax.lax.dot_general(
            scol, zr[t], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(z.dtype))
    zt = jnp.stack(rows, axis=0).reshape(tile_h * w_out, ch_all)
    # 3) dual-MLP chain
    syn = syn_ref[...].reshape(tile_h * w_out, 3)
    out = _chain_fwd(zt, syn, w0_ref, b0_ref, wkq_ref, bkq_ref, wq_ref,
                     bq_ref, wl_ref, bl_ref, n_layers=n_layers, hidden=hidden)
    out_ref[0] = out.reshape(tile_h, w_out, 3).astype(out_ref.dtype)


def _fwd_kernel_int(syn_ref, z_ref,
                    w0_ref, b0_ref, wkq_ref, bkq_ref, wq_ref, bq_ref,
                    wl_ref, bl_ref, out_ref, *, n_layers: int, hidden: int,
                    s_h: int, s_w: int, w_out: int, tile_h: int):
    """Integer-ratio fast path: the tile's LR rows arrive as a block and the
    nearest-exact gather is a VPU block repeat — no gather matmuls at all.
    This is the training hot path (train scales are integers, SURVEY.md §6)."""
    z = z_ref[0]                      # (R, W_in, C_all) — only this tile's rows
    zt = _repeat_block(z, s_h, s_w)   # (tile_h * w_out, C_all)
    syn = syn_ref[...].reshape(tile_h * w_out, 3)
    out = _chain_fwd(zt, syn, w0_ref, b0_ref, wkq_ref, bkq_ref, wq_ref,
                     bq_ref, wl_ref, bl_ref, n_layers=n_layers, hidden=hidden)
    out_ref[0] = out.reshape(tile_h, w_out, 3).astype(out_ref.dtype)


def _fwd_pallas(syn, z, srow, scol, w0, b0, wkq, bkq, wq, bq, wl, bl,
                *, interpret: bool):
    b, h_in, w_in, ch_all = z.shape
    h_out = srow.shape[0]
    w_out = scol.shape[0]
    n_layers = wkq.shape[0] + 1
    hidden = w0.shape[1]
    tile_h = _pick_tile_h(h_out)
    grid = (b, h_out // tile_h)
    kern = functools.partial(
        _fwd_kernel, n_layers=n_layers, hidden=hidden, w_in=w_in,
        w_out=w_out, tile_h=tile_h)
    flops = 2 * b * h_out * w_out * (
        3 * hidden + (n_layers - 1) * 2 * hidden * hidden + hidden * 3
        + w_in * ch_all // max(1, h_out // h_in))
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, tile_h, w_out, 3),
                         lambda ib, it: (0, it, 0, 0),
                         memory_space=pltpu.VMEM),       # syn (1,H_out,W_out,3)
            pl.BlockSpec((1, h_in, w_in, ch_all),
                         lambda ib, it: (ib, 0, 0, 0),
                         memory_space=pltpu.VMEM),       # z
            pl.BlockSpec((tile_h, h_in), lambda ib, it: (it, 0),
                         memory_space=pltpu.VMEM),       # srow
            pl.BlockSpec((w_out, w_in), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),       # scol
            pl.BlockSpec(memory_space=pltpu.VMEM),       # w0
            pl.BlockSpec(memory_space=pltpu.VMEM),       # b0
            pl.BlockSpec(memory_space=pltpu.VMEM),       # wkq
            pl.BlockSpec(memory_space=pltpu.VMEM),       # bkq
            pl.BlockSpec(memory_space=pltpu.VMEM),       # wq
            pl.BlockSpec(memory_space=pltpu.VMEM),       # bq
            pl.BlockSpec(memory_space=pltpu.VMEM),       # wl
            pl.BlockSpec(memory_space=pltpu.VMEM),       # bl
        ],
        out_specs=pl.BlockSpec((1, tile_h, w_out, 3),
                               lambda ib, it: (ib, it, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out, 3), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=z.size * 2,
                                      transcendentals=b * h_out * w_out
                                      * hidden * n_layers),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(syn[None], z, srow, scol, w0, b0, wkq, bkq, wq, bq, wl, bl)


# ---------------------------------------------------------------------------
# Backward: recompute the chain per tile, accumulate dz and weight grads.
# ---------------------------------------------------------------------------

def _chain_bwd(zt, syn, g,
               w0_ref, b0_ref, wkq_ref, bkq_ref, wq_ref, bq_ref,
               wl_ref, bl_ref, dw0_ref, db0_ref, dwkq_ref, dbkq_ref,
               dwq_ref, dbq_ref, dwl_ref, dbl_ref,
               *, n_layers: int, hidden: int):
    """Recompute the chain over a flat (M, C_all) tile and backprop ``g``:
    accumulates weight grads into the d*_ref accumulators (multiple-visit
    output blocks over the sequential TPU grid) and returns dzt (M, C_all)."""
    f32 = jnp.float32
    cdt = w0_ref.dtype

    def mm(a, w):
        return jax.lax.dot_general(a.astype(cdt), w,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    # ---- recompute forward, stashing per-layer k, q, pre-activations ----
    ks, qs, sins, kqs = [], [], [], []
    z0 = zt[:, :hidden].astype(f32)
    k = jax.nn.relu(z0)
    s0 = _sin(mm(syn, w0_ref[...]) + b0_ref[...].astype(f32))
    q = k * s0
    ks.append(k); sins.append(s0); qs.append(q)
    for i in range(1, n_layers):
        zi = zt[:, i * hidden:(i + 1) * hidden].astype(f32)
        kq_pre = mm(q, wkq_ref[i - 1]) + zi + bkq_ref[i - 1].astype(f32)
        k = jax.nn.relu(kq_pre)
        q_pre = mm(q, wq_ref[i - 1]) + bq_ref[i - 1].astype(f32)
        s = _sin(q_pre)
        kqs.append((kq_pre, q_pre))
        q_new = k * s
        ks.append(k); sins.append(s); qs.append(q_new)
        q = q_new

    def mmT_acc(a, gout):  # a^T @ g : (in, out) weight grad
        return jax.lax.dot_general(
            a.astype(cdt), gout.astype(cdt),
            (((0,), (0,)), ((), ())), preferred_element_type=f32)

    def mm_back(gout, w):  # g @ w^T
        return jax.lax.dot_general(
            gout.astype(cdt), w,
            (((1,), (1,)), ((), ())), preferred_element_type=f32)

    # ---- backward chain ----
    dwl_ref[...] += mmT_acc(qs[-1], g)
    dbl_ref[...] += jnp.sum(g, axis=0)
    dq = mm_back(g, wl_ref[...])

    dzt_parts = [None] * n_layers
    for i in range(n_layers - 1, 0, -1):
        k = ks[i]; s = sins[i]; q_prev = qs[i - 1]
        kq_pre, q_pre = kqs[i - 1]
        dk = dq * s
        ds = dq * k
        dq_pre = ds * _cos(q_pre)
        dkq_pre = dk * (kq_pre > 0)
        dzt_parts[i] = dkq_pre
        dbkq_ref[i - 1] += jnp.sum(dkq_pre, axis=0)
        dbq_ref[i - 1] += jnp.sum(dq_pre, axis=0)
        dwkq_ref[i - 1] += mmT_acc(q_prev, dkq_pre)
        dwq_ref[i - 1] += mmT_acc(q_prev, dq_pre)
        dq = mm_back(dkq_pre, wkq_ref[i - 1]) + mm_back(dq_pre, wq_ref[i - 1])
    # layer 0: q = relu(z0) * sin(syn@w0+b0)
    k0 = ks[0]; s0 = sins[0]
    dk0 = dq * s0
    ds0 = dq * k0
    dpre0 = ds0 * _cos(mm(syn, w0_ref[...]) + b0_ref[...].astype(f32))
    dw0_ref[...] += mmT_acc(syn, dpre0)
    db0_ref[...] += jnp.sum(dpre0, axis=0)
    dzt_parts[0] = dk0 * (z0 > 0)

    return jnp.concatenate(dzt_parts, axis=-1)  # (M, C_all)


def _bwd_kernel_int(syn_ref, z_ref,
                    w0_ref, b0_ref, wkq_ref, bkq_ref, wq_ref, bq_ref,
                    wl_ref, bl_ref, g_ref,
                    dz_ref, dw0_ref, db0_ref, dwkq_ref, dbkq_ref,
                    dwq_ref, dbq_ref, dwl_ref, dbl_ref,
                    *, n_layers: int, hidden: int, s_h: int, s_w: int,
                    w_out: int, tile_h: int):
    """Integer-ratio backward: block-repeat gather, block-sum scatter. Each
    tile owns a disjoint band of LR rows, so dz needs NO cross-tile
    accumulation (written directly to its block); only weight grads
    accumulate across the grid."""
    ib = pl.program_id(0)
    it = pl.program_id(1)

    @pl.when(jnp.logical_and(ib == 0, it == 0))
    def _zero():
        dw0_ref[...] = jnp.zeros_like(dw0_ref)
        db0_ref[...] = jnp.zeros_like(db0_ref)
        dwkq_ref[...] = jnp.zeros_like(dwkq_ref)
        dbkq_ref[...] = jnp.zeros_like(dbkq_ref)
        dwq_ref[...] = jnp.zeros_like(dwq_ref)
        dbq_ref[...] = jnp.zeros_like(dbq_ref)
        dwl_ref[...] = jnp.zeros_like(dwl_ref)
        dbl_ref[...] = jnp.zeros_like(dbl_ref)

    z = z_ref[0]                      # (R, W_in, C_all)
    r, w_in, ch_all = z.shape
    zt = _repeat_block(z, s_h, s_w)
    syn = syn_ref[...].reshape(tile_h * w_out, 3).astype(jnp.float32)
    g = g_ref[0].reshape(tile_h * w_out, 3).astype(jnp.float32)

    dzt = _chain_bwd(zt, syn, g,
                     w0_ref, b0_ref, wkq_ref, bkq_ref, wq_ref, bq_ref,
                     wl_ref, bl_ref, dw0_ref, db0_ref, dwkq_ref, dbkq_ref,
                     dwq_ref, dbq_ref, dwl_ref, dbl_ref,
                     n_layers=n_layers, hidden=hidden)
    dz_ref[0] = _fold_block(dzt, r, s_h, w_in, s_w).astype(dz_ref.dtype)


def _bwd_kernel(syn_ref, z_ref, srow_ref, scol_ref,
                w0_ref, b0_ref, wkq_ref, bkq_ref, wq_ref, bq_ref,
                wl_ref, bl_ref, g_ref,
                dz_ref, dw0_ref, db0_ref, dwkq_ref, dbkq_ref,
                dwq_ref, dbq_ref, dwl_ref, dbl_ref,
                *, n_layers: int, hidden: int, w_in: int, w_out: int,
                tile_h: int):
    ib = pl.program_id(0)
    it = pl.program_id(1)

    @pl.when(jnp.logical_and(ib == 0, it == 0))
    def _zero():
        dw0_ref[...] = jnp.zeros_like(dw0_ref)
        db0_ref[...] = jnp.zeros_like(db0_ref)
        dwkq_ref[...] = jnp.zeros_like(dwkq_ref)
        dbkq_ref[...] = jnp.zeros_like(dbkq_ref)
        dwq_ref[...] = jnp.zeros_like(dwq_ref)
        dbq_ref[...] = jnp.zeros_like(dbq_ref)
        dwl_ref[...] = jnp.zeros_like(dwl_ref)
        dbl_ref[...] = jnp.zeros_like(dbl_ref)

    @pl.when(it == 0)
    def _zero_dz():
        dz_ref[...] = jnp.zeros_like(dz_ref)

    ch_all = n_layers * hidden
    z = z_ref[0]
    h_in = z.shape[0]
    f32 = jnp.float32

    # ---- recompute gathered tile via one-hot matmuls ----
    zr = jax.lax.dot_general(
        srow_ref[...], z.reshape(h_in, w_in * ch_all),
        (((1,), (0,)), ((), ())), preferred_element_type=f32).astype(z.dtype)
    zr = zr.reshape(tile_h, w_in, ch_all)
    scol = scol_ref[...]
    rows = [jax.lax.dot_general(scol, zr[t], (((1,), (0,)), ((), ())),
                                preferred_element_type=f32).astype(z.dtype)
            for t in range(tile_h)]
    zt = jnp.stack(rows, axis=0).reshape(tile_h * w_out, ch_all)
    syn = syn_ref[...].reshape(tile_h * w_out, 3).astype(f32)
    g = g_ref[0].reshape(tile_h * w_out, 3).astype(f32)

    dzt = _chain_bwd(zt, syn, g,
                     w0_ref, b0_ref, wkq_ref, bkq_ref, wq_ref, bq_ref,
                     wl_ref, bl_ref, dw0_ref, db0_ref, dwkq_ref, dbkq_ref,
                     dwq_ref, dbq_ref, dwl_ref, dbl_ref,
                     n_layers=n_layers, hidden=hidden)

    # ---- scatter-adjoint back to LR: S_col^T then S_row^T ----
    dzt = dzt.reshape(tile_h, w_out, ch_all)
    drows = [jax.lax.dot_general(scol.astype(f32), dzt[t],
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
             for t in range(tile_h)]            # each (W_in, C_all)
    dzr = jnp.stack(drows, axis=0)              # (TH, W_in, C_all)
    dz_lr = jax.lax.dot_general(
        srow_ref[...].astype(f32),
        dzr.reshape(tile_h, w_in * ch_all),
        (((0,), (0,)), ((), ())), preferred_element_type=f32)
    dz_ref[0] += dz_lr.reshape(h_in, w_in, ch_all).astype(dz_ref.dtype)


def _bwd_pallas(syn, z, srow, scol, w0, b0, wkq, bkq, wq, bq, wl, bl, g,
                *, interpret: bool):
    b, h_in, w_in, ch_all = z.shape
    h_out = srow.shape[0]
    w_out = scol.shape[0]
    n_layers = wkq.shape[0] + 1
    hidden = w0.shape[1]
    tile_h = _pick_tile_h(h_out)
    grid = (b, h_out // tile_h)
    kern = functools.partial(
        _bwd_kernel, n_layers=n_layers, hidden=hidden, w_in=w_in,
        w_out=w_out, tile_h=tile_h)
    acc = jnp.float32
    out_shape = (
        jax.ShapeDtypeStruct((b, h_in, w_in, ch_all), acc),        # dz
        jax.ShapeDtypeStruct(w0.shape, acc), jax.ShapeDtypeStruct(b0.shape, acc),
        jax.ShapeDtypeStruct(wkq.shape, acc), jax.ShapeDtypeStruct(bkq.shape, acc),
        jax.ShapeDtypeStruct(wq.shape, acc), jax.ShapeDtypeStruct(bq.shape, acc),
        jax.ShapeDtypeStruct(wl.shape, acc), jax.ShapeDtypeStruct(bl.shape, acc),
    )
    full = lambda ib, it: tuple(0 for _ in range(1))
    out_specs = (
        pl.BlockSpec((1, h_in, w_in, ch_all), lambda ib, it: (ib, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, tile_h, w_out, 3),
                         lambda ib, it: (0, it, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_in, w_in, ch_all),
                         lambda ib, it: (ib, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, h_in), lambda ib, it: (it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_out, w_in), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, w_out, 3),
                         lambda ib, it: (ib, it, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(syn[None], z, srow, scol, w0, b0, wkq, bkq, wq, bq, wl, bl, g)


# ---------------------------------------------------------------------------
# Integer-ratio pallas wrappers.
# ---------------------------------------------------------------------------

def _int_weight_specs():
    return [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8


def _fwd_pallas_int(syn, z, w0, b0, wkq, bkq, wq, bq, wl, bl,
                    *, s_h: int, s_w: int, interpret: bool):
    b, h_in, w_in, ch_all = z.shape
    h_out, w_out = h_in * s_h, w_in * s_w
    n_layers = wkq.shape[0] + 1
    hidden = w0.shape[1]
    tile_h = _pick_tile_h_int(h_out, s_h)
    grid = (b, h_out // tile_h)
    kern = functools.partial(
        _fwd_kernel_int, n_layers=n_layers, hidden=hidden, s_h=s_h, s_w=s_w,
        w_out=w_out, tile_h=tile_h)
    flops = 2 * b * h_out * w_out * (
        3 * hidden + (n_layers - 1) * 2 * hidden * hidden + hidden * 3)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, tile_h, w_out, 3),
                         lambda ib, it: (0, it, 0, 0),
                         memory_space=pltpu.VMEM),       # syn
            pl.BlockSpec((1, tile_h // s_h, w_in, ch_all),
                         lambda ib, it: (ib, it, 0, 0),
                         memory_space=pltpu.VMEM),       # z rows of this tile
        ] + _int_weight_specs(),
        out_specs=pl.BlockSpec((1, tile_h, w_out, 3),
                               lambda ib, it: (ib, it, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out, 3), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=z.size * 2,
                                      transcendentals=b * h_out * w_out
                                      * hidden * n_layers),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(syn[None], z, w0, b0, wkq, bkq, wq, bq, wl, bl)


def _bwd_pallas_int(syn, z, w0, b0, wkq, bkq, wq, bq, wl, bl, g,
                    *, s_h: int, s_w: int, interpret: bool):
    b, h_in, w_in, ch_all = z.shape
    h_out, w_out = h_in * s_h, w_in * s_w
    n_layers = wkq.shape[0] + 1
    hidden = w0.shape[1]
    tile_h = _pick_tile_h_int(h_out, s_h)
    grid = (b, h_out // tile_h)
    kern = functools.partial(
        _bwd_kernel_int, n_layers=n_layers, hidden=hidden, s_h=s_h, s_w=s_w,
        w_out=w_out, tile_h=tile_h)
    acc = jnp.float32
    out_shape = (
        jax.ShapeDtypeStruct((b, h_in, w_in, ch_all), acc),        # dz
        jax.ShapeDtypeStruct(w0.shape, acc), jax.ShapeDtypeStruct(b0.shape, acc),
        jax.ShapeDtypeStruct(wkq.shape, acc), jax.ShapeDtypeStruct(bkq.shape, acc),
        jax.ShapeDtypeStruct(wq.shape, acc), jax.ShapeDtypeStruct(bq.shape, acc),
        jax.ShapeDtypeStruct(wl.shape, acc), jax.ShapeDtypeStruct(bl.shape, acc),
    )
    out_specs = (
        # dz: each tile owns its LR row band — direct write, no accumulation
        pl.BlockSpec((1, tile_h // s_h, w_in, ch_all),
                     lambda ib, it: (ib, it, 0, 0),
                     memory_space=pltpu.VMEM),
    ) + tuple(_int_weight_specs())
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, tile_h, w_out, 3),
                         lambda ib, it: (0, it, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h // s_h, w_in, ch_all),
                         lambda ib, it: (ib, it, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + _int_weight_specs() + [
            pl.BlockSpec((1, tile_h, w_out, 3),
                         lambda ib, it: (ib, it, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(syn[None], z, w0, b0, wkq, bkq, wq, bq, wl, bl, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _decode_core_int(syn, z, w0b0, wkqb, wqb, wlbl, s_h, s_w, interpret):
    (w0, b0) = w0b0
    (wkq, bkq) = wkqb
    (wq, bq) = wqb
    (wl, bl) = wlbl
    return _fwd_pallas_int(syn, z, w0, b0, wkq, bkq, wq, bq, wl, bl,
                           s_h=s_h, s_w=s_w, interpret=interpret)


def _decode_int_fwd(syn, z, w0b0, wkqb, wqb, wlbl, s_h, s_w, interpret):
    out = _decode_core_int(syn, z, w0b0, wkqb, wqb, wlbl, s_h, s_w, interpret)
    return out, (syn, z, w0b0, wkqb, wqb, wlbl)


def _decode_int_bwd(s_h, s_w, interpret, res, g):
    syn, z, (w0, b0), (wkq, bkq), (wq, bq), (wl, bl) = res
    douts = _bwd_pallas_int(syn, z, w0, b0, wkq, bkq, wq, bq, wl, bl,
                            g.astype(jnp.float32), s_h=s_h, s_w=s_w,
                            interpret=interpret)
    dz, dw0, db0, dwkq, dbkq, dwq, dbq, dwl, dbl = douts
    return (None, dz.astype(z.dtype),
            (dw0, db0), (dwkq, dbkq), (dwq, dbq), (dwl, dbl))


_decode_core_int.defvjp(_decode_int_fwd, _decode_int_bwd)


# ---------------------------------------------------------------------------
# Public entry with custom VJP.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _decode_core(syn, z, srow, scol, w0b0, wkqb, wqb, wlbl, interpret):
    (w0, b0) = w0b0
    (wkq, bkq) = wkqb
    (wq, bq) = wqb
    (wl, bl) = wlbl
    return _fwd_pallas(syn, z, srow, scol, w0, b0, wkq, bkq, wq, bq, wl, bl,
                       interpret=interpret)


def _decode_fwd(syn, z, srow, scol, w0b0, wkqb, wqb, wlbl, interpret):
    out = _decode_core(syn, z, srow, scol, w0b0, wkqb, wqb, wlbl, interpret)
    return out, (syn, z, srow, scol, w0b0, wkqb, wqb, wlbl)


def _decode_bwd(interpret, res, g):
    syn, z, srow, scol, (w0, b0), (wkq, bkq), (wq, bq), (wl, bl) = res
    douts = _bwd_pallas(syn, z, srow, scol, w0, b0, wkq, bkq, wq, bq, wl, bl,
                        g.astype(jnp.float32), interpret=interpret)
    dz, dw0, db0, dwkq, dbkq, dwq, dbq, dwl, dbl = douts
    return (None, dz.astype(z.dtype), None, None,
            (dw0, db0), (dwkq, dbkq), (dwq, dbq), (dwl, dbl))


_decode_core.defvjp(_decode_fwd, _decode_bwd)


def _auto_interpret(interpret) -> bool:
    """interpret=None resolves by backend: compiled on TPU, interpreter on
    CPU — so module-level fused paths are testable on the CPU mesh."""
    if interpret is not None:
        return interpret
    return jax.default_backend() not in ("tpu", "axon")


def decode_fused(z: Array, syn: Array, out_size: Tuple[int, int], params,
                 *, interpret=None) -> Array:
    """Fused decode of stacked LR features to RGB.

    z: (B, H_in, W_in, L*hidden) stacked per-layer content features
       (bf16 recommended).
    syn: (H_out, W_out, 3) synthesis grid (batch-independent).
    params: dict with keys q0/{kernel,bias}, kq (L-1,H,H), bkq, wq, bq,
       last/{kernel,bias} — see pack_params.
    Returns (B, H_out, W_out, 3) float32.
    """
    b, h_in, w_in, _ = z.shape
    h_out, w_out = out_size
    if h_out % h_in == 0 and w_out % w_in == 0 and h_out // h_in <= 16:
        # integer ratios (all training scales): nearest-exact degenerates to
        # an s x s block repeat — the gather matmuls vanish entirely and only
        # each tile's LR rows are staged into VMEM.
        return _decode_core_int(
            syn.astype(jnp.float32), z,
            (params["w0"], params["b0"]),
            (params["wkq"], params["bkq"]),
            (params["wq"], params["bq"]),
            (params["wl"], params["bl"]),
            h_out // h_in, w_out // w_in, _auto_interpret(interpret))
    srow = jnp.asarray(grids.nearest_exact_onehot(h_in, h_out),
                       dtype=jnp.bfloat16)
    scol = jnp.asarray(grids.nearest_exact_onehot(w_in, w_out),
                       dtype=jnp.bfloat16)
    return decode_fused_window(z, syn, params, srow, scol,
                               interpret=interpret)


def decode_fused_window(z: Array, syn_win: Array, params,
                        srow: Array, scol: Array, *,
                        interpret=None) -> Array:
    """Fused decode of an arbitrary HR window (the eval/streaming unit).

    The kernel's gathers are one-hot matmuls, so a window decode is the
    same kernel with *sliced* gather matrices: ``srow`` (H_win, H_in) /
    ``scol`` (W_win, W_in) select the window's output rows/columns, and
    ``syn_win`` (H_win, W_win, 3) is the window's synthesis grid. Used by
    ``ImplicitDecoder.decode_window`` (chunked eval, reference
    ``diinn.py:149-160``; streaming bands; sharded stripes).
    """
    return _decode_core(
        syn_win.astype(jnp.float32), z,
        srow.astype(jnp.bfloat16), scol.astype(jnp.bfloat16),
        (params["w0"], params["b0"]),
        (params["wkq"], params["bkq"]),
        (params["wq"], params["bq"]),
        (params["wl"], params["bl"]),
        _auto_interpret(interpret))


def pack_params(decoder_params: dict, n_layers: int = 4,
                dtype=jnp.bfloat16) -> dict:
    """Pack nn/diinn.py ImplicitDecoder flax params (mode 3, init_q=False)
    into the kernel's stacked weight layout."""
    p = decoder_params
    return {
        "w0": jnp.asarray(p["q0"]["dense"]["kernel"], dtype),
        "b0": jnp.asarray(p["q0"]["dense"]["bias"], jnp.float32),
        "wkq": jnp.stack([jnp.asarray(p[f"kq{i}"]["dense"]["kernel"], dtype)
                          for i in range(1, n_layers)]),
        "bkq": jnp.stack([jnp.asarray(p[f"kq{i}"]["dense"]["bias"],
                                      jnp.float32)
                          for i in range(1, n_layers)]),
        "wq": jnp.stack([jnp.asarray(p[f"q{i}"]["dense"]["kernel"], dtype)
                         for i in range(1, n_layers)]),
        "bq": jnp.stack([jnp.asarray(p[f"q{i}"]["dense"]["bias"], jnp.float32)
                         for i in range(1, n_layers)]),
        "wl": jnp.asarray(p["last_dense"]["dense"]["kernel"], dtype),
        "bl": jnp.asarray(p["last_dense"]["dense"]["bias"], jnp.float32),
    }
