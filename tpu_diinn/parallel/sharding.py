"""Query-grid and spatial sharding over the device mesh.

The DIINN/LIIF/MetaSR decode is embarrassingly parallel over HR query pixels
(no cross-query reductions — SURVEY.md §2.3), so the TPU-native scaling story
is:

- **Query sharding (default)**: replicate the small LR feature grid, shard
  the HR pixel grid's W axis over the mesh 'space' axis. Implemented with
  GSPMD sharding constraints — XLA partitions every per-pixel op (matmuls,
  sines, one-hot upsample matmuls) along the constrained axis and inserts no
  collectives at all inside the decode; only the (tiny) LR features are
  broadcast.
- **Batch sharding**: batch axis over 'data'; gradient psum inserted by XLA
  at the parameter reduction, overlapped with the backward pass.
- **Halo exchange**: for spatially-sharded encoder convs on very large
  inputs, ``halo_exchange`` trades a ppermute of edge slabs for full-image
  conv parity (receptive-field halo; RDN-B needs 131 px, so prefer
  replication below ~1k-px inputs — SURVEY.md §7.3).

Replaces the reference's only parallelism (Lightning DDP / NCCL,
configs/default.yaml:70-72) and its serial eval chunking (diinn.py:149-160).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jnp.ndarray


def shard_queries(x: Array, mesh: Optional[Mesh],
                  batch_axis: bool = True) -> Array:
    """Constrain an NHWC HR-grid tensor: batch over 'data', W over 'space'.

    A no-op when mesh is None or trivial. Call on decoder outputs (or any HR
    intermediate); XLA propagates the partitioning through the whole decode.
    """
    if mesh is None or mesh.shape.get("space", 1) * \
            mesh.shape.get("data", 1) == 1:
        return x
    spec = P("data" if batch_axis else None, None, "space", None)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def replicated(mesh: Optional[Mesh]):
    return None if mesh is None else NamedSharding(mesh, P())


def halo_exchange(x: Array, halo: int, axis_name: str = "space",
                  spatial_axis: int = 1) -> Array:
    """Pad a spatially-sharded block with ``halo`` rows from both neighbors.

    Inside shard_map: each device holds a contiguous slab along
    ``spatial_axis``; returns the slab extended by the neighbors' edge rows
    (zero-padded at the global boundary, matching SAME conv padding).
    Communication = 2 ppermutes of (halo, W, C) slabs over ICI.
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)

    def take(arr, lo, size):
        sl = [slice(None)] * arr.ndim
        sl[spatial_axis] = slice(lo, lo + size)
        return arr[tuple(sl)]

    top_edge = take(x, 0, halo)                       # our first rows
    bot_edge = take(x, x.shape[spatial_axis] - halo, halo)
    # send our bottom edge down (to idx+1), our top edge up (to idx-1)
    from_above = jax.lax.ppermute(
        bot_edge, axis_name, [(i, i + 1) for i in range(n - 1)])
    from_below = jax.lax.ppermute(
        top_edge, axis_name, [(i + 1, i) for i in range(n - 1)])
    zeros = jnp.zeros_like(top_edge)
    above = jnp.where(idx == 0, zeros, from_above)
    below = jnp.where(idx == n - 1, zeros, from_below)
    return jnp.concatenate([above, x, below], axis=spatial_axis)


def sharded_encoder_apply(encoder, params, x: Array, mesh: Mesh,
                          axis_name: str = "space") -> Array:
    """Run an encoder with H spatially sharded over ``axis_name``.

    ``encoder`` must have been built with ``halo_axis=axis_name`` (see
    nn/layers.Conv): every k>1 conv then exchanges its own (k-1)//2 edge
    rows via ppermute and convolves VALID along H — bit-identical to the
    unsharded SAME stack at every pixel, including the global boundary.
    Per-layer halos keep the exchange tiny (rows x W x C) and overlappable,
    instead of one receptive-field-sized halo (131 rows for RDN-B).
    """
    n = mesh.shape[axis_name]
    assert x.shape[1] % n == 0, (x.shape, n)

    def local(params, slab):
        return encoder.apply(params, slab)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(None, axis_name, None, None)),
        out_specs=P(None, axis_name, None, None),
        check_vma=False)(params, x)



# jitted decode closures keyed by (net, size, mesh): flax modules are frozen
# dataclasses (hashable) and Mesh hashes by device layout, so repeated
# library calls at one shape reuse ONE compiled program instead of re-jitting
# a fresh closure per invocation.
_DECODE_CACHE: dict = {}


def _decode_fn(net, size: Tuple[int, int], mesh: Mesh):
    key = (net, tuple(size), mesh)
    if key in _DECODE_CACHE:
        return _DECODE_CACHE[key]
    n_space = mesh.shape["space"]
    h_out, w_out = size

    if w_out % n_space == 0 or n_space == 1:
        out_spec = NamedSharding(mesh, P("data", None, "space", None))

        @jax.jit
        def run(params, x):
            out = net.apply(params, x, size)
            return jax.lax.with_sharding_constraint(out, out_spec)
    else:
        stripe_w = -(-w_out // n_space)
        encode_fn, stripe_fn = _stripe_fns(net, size, stripe_w)

        def local(params, feat):
            start = jax.lax.axis_index("space") * stripe_w
            return stripe_fn(params, feat, start)

        @jax.jit
        def run(params, x):
            feat = encode_fn(params, x)
            out = jax.shard_map(
                local, mesh=mesh,
                in_specs=(P(), P()),
                out_specs=P(None, None, "space", None),
                check_vma=False)(params, feat)
            return out[:, :, :w_out]

    _DECODE_CACHE[key] = run
    return run


def decode_sharded(net, params, x: Array, size: Tuple[int, int],
                   mesh: Mesh) -> Array:
    """Full query-sharded inference: replicated encoder input, HR output
    partitioned (batch x W) over (data x space).

    When W_out divides the space axis, a GSPMD sharding constraint does the
    partitioning (works for any model on the shared contract). Otherwise
    GSPMD silently drops the constraint, so DIINN falls back to an explicit
    shard_map over clamped column stripes (``ImplicitDecoder.decode_stripe``)
    — every device decodes an equal-width stripe, the overhang repeating the
    last column and sliced off after the gather.
    """
    x = jax.device_put(x, NamedSharding(mesh, P("data")))
    params = jax.device_put(params, NamedSharding(mesh, P()))
    return _decode_fn(net, size, mesh)(params, x)


def _stripe_fns(net, size: Tuple[int, int], stripe_w: int):
    """(encode, stripe-decode) closures for shard_map stripe sharding.

    Every model family exposes a traced-offset ``decode_stripe``
    (nn/diinn.py, nn/liif.py, nn/metasr.py); DIINN splits encoder/decoder
    params, LIIF/MetaSR decode from their own param tree."""
    from tpu_diinn.nn.diinn import DIINN, ImplicitDecoder
    from tpu_diinn.nn.liif import LIIF
    from tpu_diinn.nn.metasr import MetaSR
    from tpu_diinn.nn.registry import make_encoder

    if isinstance(net, DIINN):
        enc = make_encoder(net.encoder_spec, dtype=net.dtype,
                           lane_pack=net.lane_pack)
        dec = ImplicitDecoder(in_channels=enc.out_dim,
                              hidden_dims=net.hidden_dims, mode=net.mode,
                              init_q=net.init_q, exact_sin=net.exact_sin,
                              dtype=net.dtype)

        def encode(params, x):
            p = params["params"] if "params" in params else params
            return enc.apply({"params": p["encoder"]}, x)

        def stripe(params, feat, start):
            p = params["params"] if "params" in params else params
            return dec.apply({"params": p["decoder"]}, feat, size, start,
                             stripe_w, method=ImplicitDecoder.decode_stripe)

        return encode, stripe

    if isinstance(net, (LIIF, MetaSR)):
        cls = type(net)

        def encode(params, x):
            return net.apply(params, x, method=cls.encode)

        def stripe(params, feat, start):
            return net.apply(params, feat, size, start, stripe_w,
                             method=cls.decode_stripe)

        return encode, stripe

    raise NotImplementedError(
        f"stripe decode not implemented for {type(net).__name__}")
