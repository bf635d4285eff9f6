"""Fused Pallas TPU kernel for the DIINN dual-MLP implicit decoder (mode 3).

Replaces the HR-resolution portion of the factorized decoder (nn/diinn.py
``hr_step``): given the stacked LR content features ``z`` (the per-layer 3x3
convs, concatenated channel-wise) and the synthesis grid, it decodes an HR
tile entirely in VMEM:

    k = relu(z0)
    q = k * sin(syn @ W0 + b0)
    for i in 1..L-1:
        k = relu(q @ Wkq_i + z_i)      # z_i arrives with bkq_i pre-folded
        q = k * sin(q @ Wq_i + bq_i)
    out = q @ Wlast + blast

Contract: ``z`` must carry the per-layer kq biases, folded in at LR
resolution by ``diinn.lr_features_stacked`` — an (M, hidden) HR bias pass
per layer becomes part of the LR conv's bias add, and the bkq grads flow
through that concat's VJP (the kernels return zero for dbkq).

Why a kernel: in the XLA path every matmul materializes a (B, H_out, W_out,
256) bf16 tensor (~19 MB per image per layer) to HBM, and the nearest-exact
upsampled features are 4x256 channels at HR — the decoder is HBM-bound at
~30% MXU utilization. Here the LR features are gathered *inside* the kernel
(one-hot matmuls on the MXU: rows via a per-tile slice of S_row, columns via
S_col), the k/q chain lives in VMEM, and HBM traffic drops to the LR z
(~38x less) plus the RGB output.

The kernel is VPU-bound once the matmuls are fused (measured round 4,
scripts/kernel_probe.py), so the implementation minimises elementwise
passes:

- The two per-layer matmuls run as ONE (hidden -> 2*hidden) matmul against
  the concatenated ``[Wkq | Wq]`` weights (half the MXU launches, N = 512).
- On the integer-ratio path (all training scales) the repeated (M, C_all)
  tile is never materialised: nearest-exact for ``n_out = s * n_in`` is an
  s x s block repeat, so the LR block is *broadcast-added* into each layer's
  pre-activation instead of being copied up-front (saves a full (M, C_all)
  VPU copy per tile, ~1.2 GB/step at the training shape).
- The backward recomputes sin and cos with one shared range reduction
  (core/fastmath._poly_sincos), writes each layer's dz band directly into
  its channel slice (no (M, C_all) concat), applies layer 0's relu mask at
  LR resolution after folding, and backprops both per-layer matmuls through
  single concatenated GEMMs (dq: K = 2*hidden; dW: N = 2*hidden).

Grid: (B, H_out/TILE_H); each program decodes TILE_H full-width output rows.
The backward kernel recomputes the chain per tile and accumulates weight
grads across the sequential TPU grid (multiple-visit output blocks), so no
HR activations are ever saved. Exposed as ``decode_fused`` with a
``jax.custom_vjp``.

Reference semantics: diinn.py:112-147 (mode 3), diinn.py:163-173.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_diinn.core import grids
from tpu_diinn.core.fastmath import _poly_sin as _sin
from tpu_diinn.core.fastmath import _poly_sincos as _sincos

Array = jnp.ndarray


def _pick_tile_h(h_out: int) -> int:
    for t in (16, 8, 32, 4, 2, 1):
        if h_out % t == 0:
            return t
    return 1


def _pick_tile_h_int(h_out: int, s_h: int, cap: int = 16) -> int:
    """Largest multiple of ``s_h`` (<= cap) dividing ``h_out``: the integer
    fast path's tile must cover whole LR rows. The backward uses cap=8 —
    its per-layer f32 stashes (k/sin/cos/q) make the smaller working set
    pipeline better (measured r4, scripts/kernel_probe.py)."""
    best = s_h
    for t in range(s_h, cap + 1, s_h):
        if h_out % t == 0:
            best = t
    return best


def _repeat_block(z, s_h: int, s_w: int):
    """(R, W, C) LR features -> (R*s_h*W*s_w, C) queries, row-major over the
    (R*s_h, W*s_w) output tile — nearest-exact for integer ratios is exactly
    an s_h x s_w block repeat (idx[i] = i // s for n_out = s * n_in)."""
    r, w, c = z.shape
    zb = jnp.broadcast_to(z[:, None, :, None, :], (r, s_h, w, s_w, c))
    return zb.reshape(r * s_h * w * s_w, c)


def _fold_block(dzt, r: int, s_h: int, w: int, s_w: int):
    """Adjoint of ``_repeat_block``: (R*s_h*W*s_w, C) -> (R, W, C) sum over
    each s_h x s_w block."""
    c = dzt.shape[-1]
    return dzt.reshape(r, s_h, w, s_w, c).sum(axis=(1, 3))


def _badd(flat, z_lr, r: int, s_h: int, w: int, s_w: int):
    """flat (M, C) + block-repeat(z_lr (R, W, C)) without materialising the
    repeated tile: reshape to expose the block structure and broadcast-add."""
    c = flat.shape[-1]
    v = flat.reshape(r, s_h, w, s_w, c)
    v = v + z_lr[:, None, :, None, :].astype(flat.dtype)
    return v.reshape(r * s_h * w * s_w, c)


def _bmul(flat, z_lr, r: int, s_h: int, w: int, s_w: int):
    """flat (M, C) * block-repeat(z_lr (R, W, C)), broadcast form."""
    c = flat.shape[-1]
    v = flat.reshape(r, s_h, w, s_w, c)
    v = v * z_lr[:, None, :, None, :].astype(flat.dtype)
    return v.reshape(r * s_h * w * s_w, c)


# ---------------------------------------------------------------------------
# Forward.
# ---------------------------------------------------------------------------

def _chain_fwd(zt, syn, w0_ref, b0_ref, wcat_ref, bcat_ref, wl_ref, bl_ref,
               *, n_layers: int, hidden: int):
    """Dual-MLP chain over a materialised flat (M, C_all) tile (the
    arbitrary-ratio / window path), fp32 accumulation, fused [Wkq|Wq].

    VPU-lean conventions (r5): ``zt`` arrives with the per-layer kq biases
    already folded in at LR resolution (diinn.lr_features_stacked), so only
    the q-half bias is added here; ``q`` is produced directly in the GEMM
    compute dtype (identical GEMM inputs — the cast was mandatory anyway —
    minus one (M, hidden) cast pass per layer)."""
    f32 = jnp.float32
    cdt = w0_ref.dtype
    k = jax.nn.relu(zt[:, :hidden].astype(f32))
    q0 = jax.lax.dot_general(syn.astype(cdt), w0_ref[...],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=f32)
    q = (k * _sin(q0 + b0_ref[...].astype(f32))).astype(cdt)
    for i in range(1, n_layers):
        zi = zt[:, i * hidden:(i + 1) * hidden].astype(f32)
        both = jax.lax.dot_general(
            q, wcat_ref[i - 1],
            (((1,), (0,)), ((), ())), preferred_element_type=f32)
        k = jax.nn.relu(both[:, :hidden] + zi)
        q = (k * _sin(both[:, hidden:]
                      + bcat_ref[i - 1, hidden:].astype(f32))).astype(cdt)
    out = jax.lax.dot_general(
        q, wl_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=f32)
    return out + bl_ref[...].astype(f32)


def _fwd_kernel(syn_ref, z_ref, srow_ref, scol_ref,
                w0_ref, b0_ref, wcat_ref, bcat_ref,
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
    out = _chain_fwd(zt, syn, w0_ref, b0_ref, wcat_ref, bcat_ref, wl_ref,
                     bl_ref, n_layers=n_layers, hidden=hidden)
    out_ref[0] = out.reshape(tile_h, w_out, 3).astype(out_ref.dtype)


def _fwd_kernel_int(syn_ref, z_ref,
                    w0_ref, b0_ref, wcat_ref, bcat_ref,
                    wl_ref, bl_ref, out_ref, *, n_layers: int, hidden: int,
                    s_h: int, s_w: int, w_out: int, tile_h: int):
    """Integer-ratio fast path: the tile's LR rows arrive as a block and the
    nearest-exact gather is a block broadcast — no gather matmuls and no
    materialised (M, C_all) tile. This is the training hot path (train
    scales are integers, SURVEY.md §6)."""
    f32 = jnp.float32
    cdt = w0_ref.dtype
    z = z_ref[0]                      # (R, W_in, C_all) — only this tile's rows
    r, w_in, _ = z.shape
    m = tile_h * w_out
    syn = syn_ref[...].reshape(m, 3)
    k0 = jax.nn.relu(z[:, :, :hidden].astype(f32))        # LR-resolution relu
    q0 = jax.lax.dot_general(syn.astype(cdt), w0_ref[...],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=f32)
    s0 = _sin(q0 + b0_ref[...].astype(f32))
    # kq biases pre-folded into z (lr_features_stacked); q produced in the
    # GEMM compute dtype — see _chain_fwd for the pass accounting.
    q = _bmul(s0, k0, r, s_h, w_in, s_w)
    for i in range(1, n_layers):
        zi = z[:, :, i * hidden:(i + 1) * hidden]
        both = jax.lax.dot_general(
            q.astype(cdt), wcat_ref[i - 1],
            (((1,), (0,)), ((), ())), preferred_element_type=f32)
        k = jax.nn.relu(_badd(both[:, :hidden], zi, r, s_h, w_in, s_w))
        q = k * _sin(both[:, hidden:]
                     + bcat_ref[i - 1, hidden:].astype(f32))
    out = jax.lax.dot_general(q.astype(cdt), wl_ref[...],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)
    out = out + bl_ref[...].astype(f32)
    out_ref[0] = out.reshape(tile_h, w_out, 3).astype(out_ref.dtype)


def _weight_specs():
    return [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6


def _cat_weights(w0, b0, wkq, bkq, wq, bq):
    """Per-layer [Wkq | Wq] / [bkq | bq] concatenation (tiny, traced on the
    params; XLA folds it into the update step)."""
    wcat = jnp.concatenate([wkq, wq], axis=2)       # (L-1, H, 2H)
    bcat = jnp.concatenate([bkq, bq], axis=1)       # (L-1, 2H)
    return wcat, bcat


def _fwd_pallas(syn, z, srow, scol, w0, b0, wkq, bkq, wq, bq, wl, bl,
                *, interpret: bool):
    b, h_in, w_in, ch_all = z.shape
    h_out = srow.shape[0]
    w_out = scol.shape[0]
    n_layers = wkq.shape[0] + 1
    hidden = w0.shape[1]
    tile_h = _pick_tile_h(h_out)
    grid = (b, h_out // tile_h)
    wcat, bcat = _cat_weights(w0, b0, wkq, bkq, wq, bq)
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
        ] + _weight_specs(),
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
    )(syn[None], z, srow, scol, w0, b0, wcat, bcat, wl, bl)


def _fwd_pallas_int(syn, z, w0, b0, wkq, bkq, wq, bq, wl, bl,
                    *, s_h: int, s_w: int, interpret: bool):
    b, h_in, w_in, ch_all = z.shape
    h_out, w_out = h_in * s_h, w_in * s_w
    n_layers = wkq.shape[0] + 1
    hidden = w0.shape[1]
    tile_h = _pick_tile_h_int(h_out, s_h, cap=32)
    grid = (b, h_out // tile_h)
    wcat, bcat = _cat_weights(w0, b0, wkq, bkq, wq, bq)
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
        ] + _weight_specs(),
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
    )(syn[None], z, w0, b0, wcat, bcat, wl, bl)


# ---------------------------------------------------------------------------
# Backward: recompute the chain per tile, accumulate dz and weight grads.
# ---------------------------------------------------------------------------

def _chain_bwd(zt, syn, g,
               w0_ref, b0_ref, wcat_ref, bcat_ref, wl_ref, bl_ref,
               dw0_ref, db0_ref, dwcat_ref, dbcat_ref, dwl_ref, dbl_ref,
               *, n_layers: int, hidden: int):
    """Recompute the chain over a materialised flat (M, C_all) tile and
    backprop ``g``: accumulates weight grads into the d*_ref accumulators
    (multiple-visit output blocks over the sequential TPU grid) and returns
    dzt (M, C_all). The window-path backward; the int path has its own
    broadcast-folded variant below."""
    f32 = jnp.float32
    cdt = w0_ref.dtype

    def mm(a, w):
        return jax.lax.dot_general(a.astype(cdt), w,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    # ---- recompute forward, stashing k / sin / cos / q per layer ----
    # (mirrors _chain_fwd: kq biases pre-folded into zt, q stashed in the
    # GEMM compute dtype — bit-identical GEMM operands, half the stash VMEM)
    ks, qs, sins, coss = [], [], [], []
    z0 = zt[:, :hidden].astype(f32)
    k = jax.nn.relu(z0)
    s0, c0 = _sincos(mm(syn, w0_ref[...]) + b0_ref[...].astype(f32))
    q = (k * s0).astype(cdt)
    ks.append(k); sins.append(s0); coss.append(c0); qs.append(q)
    for i in range(1, n_layers):
        zi = zt[:, i * hidden:(i + 1) * hidden].astype(f32)
        both = mm(q, wcat_ref[i - 1])
        k = jax.nn.relu(both[:, :hidden] + zi)
        s, c = _sincos(both[:, hidden:]
                       + bcat_ref[i - 1, hidden:].astype(f32))
        q = (k * s).astype(cdt)
        ks.append(k); sins.append(s); coss.append(c); qs.append(q)

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
        k = ks[i]
        # relu'(pre) == (k > 0): relu output sign carries the mask.
        dkq_pre = (dq * sins[i]) * (k > 0)
        dq_pre = (dq * k) * coss[i]
        dzt_parts[i] = dkq_pre
        dboth = jnp.concatenate([dkq_pre, dq_pre], axis=1)   # (M, 2H)
        # bkq grads flow through the pre-biased z (lr_features_stacked VJP);
        # only the q-half bias lives in the kernel.
        dbcat_ref[i - 1, hidden:] += jnp.sum(dq_pre, axis=0)
        dwcat_ref[i - 1] += mmT_acc(qs[i - 1], dboth)
        dq = mm_back(dboth, wcat_ref[i - 1])
    # layer 0: q = relu(z0) * sin(syn@w0+b0)
    dpre0 = (dq * ks[0]) * coss[0]
    dw0_ref[...] += mmT_acc(syn, dpre0)
    db0_ref[...] += jnp.sum(dpre0, axis=0)
    dzt_parts[0] = (dq * sins[0]) * (zt[:, :hidden].astype(f32) > 0)

    return jnp.concatenate(dzt_parts, axis=-1)  # (M, C_all)


def _acc_weight_zero(dw0_ref, db0_ref, dwcat_ref, dbcat_ref,
                     dwl_ref, dbl_ref):
    dw0_ref[...] = jnp.zeros_like(dw0_ref)
    db0_ref[...] = jnp.zeros_like(db0_ref)
    dwcat_ref[...] = jnp.zeros_like(dwcat_ref)
    dbcat_ref[...] = jnp.zeros_like(dbcat_ref)
    dwl_ref[...] = jnp.zeros_like(dwl_ref)
    dbl_ref[...] = jnp.zeros_like(dbl_ref)


def _bwd_kernel_int(syn_ref, z_ref,
                    w0_ref, b0_ref, wcat_ref, bcat_ref, wl_ref, bl_ref,
                    g_ref,
                    dz_ref, dw0_ref, db0_ref, dwcat_ref, dbcat_ref,
                    dwl_ref, dbl_ref,
                    *, n_layers: int, hidden: int, s_h: int, s_w: int,
                    w_out: int, tile_h: int):
    """Integer-ratio backward: broadcast gather, per-layer block-sum
    scatter. Each tile owns a disjoint band of LR rows, so dz needs NO
    cross-tile accumulation (written directly to its block); only weight
    grads accumulate across the grid."""
    ib = pl.program_id(0)
    it = pl.program_id(1)

    @pl.when(jnp.logical_and(ib == 0, it == 0))
    def _zero():
        _acc_weight_zero(dw0_ref, db0_ref, dwcat_ref, dbcat_ref,
                         dwl_ref, dbl_ref)

    f32 = jnp.float32
    cdt = w0_ref.dtype
    z = z_ref[0]                      # (R, W_in, C_all)
    r, w_in, _ = z.shape
    m = tile_h * w_out
    syn = syn_ref[...].reshape(m, 3).astype(f32)
    g = g_ref[0].reshape(m, 3).astype(f32)

    def mm(a, w):
        return jax.lax.dot_general(a.astype(cdt), w,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def mmT_acc(a, gout):
        return jax.lax.dot_general(
            a.astype(cdt), gout.astype(cdt),
            (((0,), (0,)), ((), ())), preferred_element_type=f32)

    def mm_back(gout, w):
        return jax.lax.dot_general(
            gout.astype(cdt), w,
            (((1,), (1,)), ((), ())), preferred_element_type=f32)

    # ---- recompute forward (broadcast gather, no (M, C_all) tile) ----
    # (mirrors _fwd_kernel_int: kq biases pre-folded into z, q stashed in
    # the GEMM compute dtype)
    k0_lr = jax.nn.relu(z[:, :, :hidden].astype(f32))     # (R, W_in, H) at LR
    s0, c0 = _sincos(mm(syn, w0_ref[...]) + b0_ref[...].astype(f32))
    q = _bmul(s0, k0_lr, r, s_h, w_in, s_w).astype(cdt)
    ks, qs, sins, coss = [None], [q], [s0], [c0]
    for i in range(1, n_layers):
        zi = z[:, :, i * hidden:(i + 1) * hidden]
        both = mm(q, wcat_ref[i - 1])
        k = jax.nn.relu(_badd(both[:, :hidden], zi, r, s_h, w_in, s_w))
        s, c = _sincos(both[:, hidden:]
                       + bcat_ref[i - 1, hidden:].astype(f32))
        q = (k * s).astype(cdt)
        ks.append(k); sins.append(s); coss.append(c); qs.append(q)

    # ---- backward chain ----
    dwl_ref[...] += mmT_acc(qs[-1], g)
    dbl_ref[...] += jnp.sum(g, axis=0)
    dq = mm_back(g, wl_ref[...])

    for i in range(n_layers - 1, 0, -1):
        k = ks[i]
        dkq_pre = (dq * sins[i]) * (k > 0)
        dq_pre = (dq * k) * coss[i]
        dz_ref[0, :, :, i * hidden:(i + 1) * hidden] = _fold_block(
            dkq_pre, r, s_h, w_in, s_w).astype(dz_ref.dtype)
        # separate GEMMs beat a concat into one K=512 GEMM here (the (M,2H)
        # concat copy costs more than the saved launch — measured r4,
        # scripts/kernel_probe.py bwd ablation); accumulate into the wcat
        # slices so the accumulator layout stays single-buffer. bkq grads
        # flow through the pre-biased z instead (lr_features_stacked VJP).
        dbcat_ref[i - 1, hidden:] += jnp.sum(dq_pre, axis=0)
        dwcat_ref[i - 1, :, :hidden] += mmT_acc(qs[i - 1], dkq_pre)
        dwcat_ref[i - 1, :, hidden:] += mmT_acc(qs[i - 1], dq_pre)
        dq = mm_back(dkq_pre, wcat_ref[i - 1, :, :hidden]) \
            + mm_back(dq_pre, wcat_ref[i - 1, :, hidden:])
    # layer 0: fold first, mask at LR (k0 = relu(z0) lives at LR).
    dk0_lr = _fold_block(dq * sins[0], r, s_h, w_in, s_w)
    dz_ref[0, :, :, :hidden] = (
        dk0_lr * (z[:, :, :hidden].astype(f32) > 0)).astype(dz_ref.dtype)
    dpre0 = _bmul(dq, k0_lr, r, s_h, w_in, s_w) * coss[0]
    dw0_ref[...] += mmT_acc(syn, dpre0)
    db0_ref[...] += jnp.sum(dpre0, axis=0)


def _bwd_kernel(syn_ref, z_ref, srow_ref, scol_ref,
                w0_ref, b0_ref, wcat_ref, bcat_ref, wl_ref, bl_ref,
                g_ref,
                dz_ref, dw0_ref, db0_ref, dwcat_ref, dbcat_ref,
                dwl_ref, dbl_ref,
                *, n_layers: int, hidden: int, w_in: int, w_out: int,
                tile_h: int):
    ib = pl.program_id(0)
    it = pl.program_id(1)

    @pl.when(jnp.logical_and(ib == 0, it == 0))
    def _zero():
        _acc_weight_zero(dw0_ref, db0_ref, dwcat_ref, dbcat_ref,
                         dwl_ref, dbl_ref)

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
                     w0_ref, b0_ref, wcat_ref, bcat_ref, wl_ref, bl_ref,
                     dw0_ref, db0_ref, dwcat_ref, dbcat_ref,
                     dwl_ref, dbl_ref,
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


def _grad_out_shapes(z_shape, w0, b0, wkq, bkq, wq, bq, wl, bl):
    acc = jnp.float32
    n1, h = wkq.shape[0], w0.shape[1]
    return (
        jax.ShapeDtypeStruct(z_shape, acc),                       # dz
        jax.ShapeDtypeStruct(w0.shape, acc),
        jax.ShapeDtypeStruct(b0.shape, acc),
        jax.ShapeDtypeStruct((n1, h, 2 * h), acc),                # dwcat
        jax.ShapeDtypeStruct((n1, 2 * h), acc),                   # dbcat
        jax.ShapeDtypeStruct(wl.shape, acc),
        jax.ShapeDtypeStruct(bl.shape, acc),
    )


def _split_wgrads(douts):
    """(dz, dw0, db0, dwcat, dbcat, dwl, dbl) -> per-tuple grads."""
    dz, dw0, db0, dwcat, dbcat, dwl, dbl = douts
    h = dw0.shape[1]
    return (dz, dw0, db0, dwcat[:, :, :h], dwcat[:, :, h:],
            dbcat[:, :h], dbcat[:, h:], dwl, dbl)


def _bwd_pallas(syn, z, srow, scol, w0, b0, wkq, bkq, wq, bq, wl, bl, g,
                *, interpret: bool):
    b, h_in, w_in, ch_all = z.shape
    h_out = srow.shape[0]
    w_out = scol.shape[0]
    n_layers = wkq.shape[0] + 1
    hidden = w0.shape[1]
    tile_h = _pick_tile_h(h_out)
    grid = (b, h_out // tile_h)
    wcat, bcat = _cat_weights(w0, b0, wkq, bkq, wq, bq)
    kern = functools.partial(
        _bwd_kernel, n_layers=n_layers, hidden=hidden, w_in=w_in,
        w_out=w_out, tile_h=tile_h)
    out_shape = _grad_out_shapes((b, h_in, w_in, ch_all),
                                 w0, b0, wkq, bkq, wq, bq, wl, bl)
    out_specs = (
        pl.BlockSpec((1, h_in, w_in, ch_all), lambda ib, it: (ib, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ) + tuple(_weight_specs())
    douts = pl.pallas_call(
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
        ] + _weight_specs() + [
            pl.BlockSpec((1, tile_h, w_out, 3),
                         lambda ib, it: (ib, it, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(syn[None], z, srow, scol, w0, b0, wcat, bcat, wl, bl, g)
    return _split_wgrads(douts)


def _bwd_pallas_int(syn, z, w0, b0, wkq, bkq, wq, bq, wl, bl, g,
                    *, s_h: int, s_w: int, interpret: bool):
    b, h_in, w_in, ch_all = z.shape
    h_out, w_out = h_in * s_h, w_in * s_w
    n_layers = wkq.shape[0] + 1
    hidden = w0.shape[1]
    tile_h = _pick_tile_h_int(h_out, s_h, cap=8)
    grid = (b, h_out // tile_h)
    wcat, bcat = _cat_weights(w0, b0, wkq, bkq, wq, bq)
    kern = functools.partial(
        _bwd_kernel_int, n_layers=n_layers, hidden=hidden, s_h=s_h, s_w=s_w,
        w_out=w_out, tile_h=tile_h)
    out_shape = _grad_out_shapes((b, h_in, w_in, ch_all),
                                 w0, b0, wkq, bkq, wq, bq, wl, bl)
    out_specs = (
        # dz: each tile owns its LR row band — direct write, no accumulation
        pl.BlockSpec((1, tile_h // s_h, w_in, ch_all),
                     lambda ib, it: (ib, it, 0, 0),
                     memory_space=pltpu.VMEM),
    ) + tuple(_weight_specs())
    douts = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, tile_h, w_out, 3),
                         lambda ib, it: (0, it, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h // s_h, w_in, ch_all),
                         lambda ib, it: (ib, it, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + _weight_specs() + [
            pl.BlockSpec((1, tile_h, w_out, 3),
                         lambda ib, it: (ib, it, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(syn[None], z, w0, b0, wcat, bcat, wl, bl, g)
    return _split_wgrads(douts)


# ---------------------------------------------------------------------------
# custom-VJP wrappers.
# ---------------------------------------------------------------------------

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
    dz, dw0, db0, dwkq, dwq, dbkq, dbq, dwl, dbl = douts
    return (None, dz.astype(z.dtype),
            (dw0, db0), (dwkq, dbkq), (dwq, dbq), (dwl, dbl))


_decode_core_int.defvjp(_decode_int_fwd, _decode_int_bwd)


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
    dz, dw0, db0, dwkq, dwq, dbkq, dbq, dwl, dbl = douts
    return (None, dz.astype(z.dtype), None, None,
            (dw0, db0), (dwkq, dbkq), (dwq, dbq), (dwl, dbl))


_decode_core.defvjp(_decode_fwd, _decode_bwd)


def _int2d_tiles(s_h: int, s_w: int, m_target: int = 4096
                 ) -> Tuple[int, int]:
    """(LR rows, LR cols) per program for the 2-D tiled integer-ratio eval
    kernel: output tile M = s_h*r_t * s_w*wc ~= m_target queries — enough to
    fill the MXU (M x 256 x 512 GEMMs) while the fp32 activation chain stays
    ~16 MB of VMEM regardless of image size."""
    wc = max(8, min(64, m_target // (s_h * s_w)))
    r_t = max(1, m_target // (s_h * s_w * wc))
    return r_t, wc


def decode_fused_int_eval(z: Array, syn: Array, out_size: Tuple[int, int],
                          params, *, interpret=None,
                          m_target: int = 4096) -> Array:
    """Full-image integer-ratio fused decode with 2-D (row, column) tiling.

    Unlike ``decode_fused``'s training kernel (full-width tiles, VMEM-gated
    on width), each program here stages an (r_t, wc) LR patch and decodes
    its (s_h*r_t, s_w*wc) output tile, so VMEM use is O(tile) — benchmark-
    sized full images (reference eval protocol, ``sr_module.py:159-180``)
    run the kernel instead of falling back to the XLA path. LR dims are
    zero-padded up to tile multiples and the output sliced back; forward
    only (eval paths take no grad).
    """
    b, h_in, w_in, ch_all = z.shape
    h_out, w_out = out_size
    s_h, s_w = h_out // h_in, w_out // w_in
    assert h_out == s_h * h_in and w_out == s_w * w_in, (out_size, z.shape)
    n_layers = params["wkq"].shape[0] + 1
    hidden = params["w0"].shape[1]
    r_t, wc = _int2d_tiles(s_h, s_w, m_target)
    h_p = -(-h_in // r_t) * r_t
    w_p = -(-w_in // wc) * wc
    if (h_p, w_p) != (h_in, w_in):
        z = jnp.pad(z, ((0, 0), (0, h_p - h_in), (0, w_p - w_in), (0, 0)))
        syn = jnp.pad(syn, ((0, s_h * h_p - h_out),
                            (0, s_w * w_p - w_out), (0, 0)))
    tile_h, tile_w = s_h * r_t, s_w * wc
    grid = (b, h_p // r_t, w_p // wc)
    wcat, bcat = _cat_weights(params["w0"], params["b0"],
                              params["wkq"], params["bkq"],
                              params["wq"], params["bq"])
    kern = functools.partial(
        _fwd_kernel_int, n_layers=n_layers, hidden=hidden, s_h=s_h, s_w=s_w,
        w_out=tile_w, tile_h=tile_h)
    flops = 2 * b * (s_h * h_p) * (s_w * w_p) * (
        3 * hidden + (n_layers - 1) * 2 * hidden * hidden + hidden * 3)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, tile_h, tile_w, 3),
                         lambda ib, it, ic: (0, it, ic, 0),
                         memory_space=pltpu.VMEM),       # syn tile
            pl.BlockSpec((1, r_t, wc, ch_all),
                         lambda ib, it, ic: (ib, it, ic, 0),
                         memory_space=pltpu.VMEM),       # z patch
        ] + _weight_specs(),
        out_specs=pl.BlockSpec((1, tile_h, tile_w, 3),
                               lambda ib, it, ic: (ib, it, ic, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_h * h_p, s_w * w_p, 3),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=z.size * 2,
            transcendentals=b * h_out * w_out * hidden * n_layers),
        interpret=_auto_interpret(interpret),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(syn.astype(jnp.float32)[None], z,
      params["w0"], params["b0"], wcat, bcat, params["wl"], params["bl"])
    if (h_p, w_p) != (h_in, w_in):
        out = out[:, :h_out, :w_out]
    return out


def _auto_interpret(interpret) -> bool:
    """interpret=None resolves by backend: compiled on TPU, interpreter on
    CPU — so module-level fused paths are testable on the CPU mesh."""
    if interpret is not None:
        return interpret
    return jax.default_backend() not in ("tpu", "axon")


def decode_fused(z: Array, syn: Array, out_size: Tuple[int, int], params,
                 *, interpret=None) -> Array:
    """Fused decode of stacked LR features to RGB.

    z: (B, H_in, W_in, L*hidden) stacked per-layer content features WITH
       the kq biases pre-folded (diinn.lr_features_stacked; bf16
       recommended).
    syn: (H_out, W_out, 3) synthesis grid (batch-independent).
    params: dict with keys w0/b0, wkq/bkq, wq/bq, wl/bl — see pack_params.
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
