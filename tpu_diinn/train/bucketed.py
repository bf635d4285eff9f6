"""Bucketed static-shape benchmark eval: O(few) compiles per scale.

The reference evaluates full benchmark images of arbitrary shapes
(``src/models/sr_module.py:159-180``); a naive jit-per-shape port compiles
one TPU program per distinct (LR shape, HR shape) — hundreds of multi-minute
remote compiles over Urban100/B100 (SURVEY.md §7.3, round-4 verdict #3).

Here every image is zero-padded up to a small set of bucket canvases and
decoded by ONE compiled program per bucket:

- the encoder runs under ``nn.masking.valid_extent`` — conv outputs are
  zeroed outside the traced true extent, making every interior activation
  bit-identical to the unpadded run (see nn/masking.py for the argument);
- the decoder consumes host-precomputed gather indices and synthesis grid
  (``ImplicitDecoder.decode_traced``) — float64 index math identical to the
  static path, shipped as traced arrays so the program is shape-generic;
- metrics run masked on the padded canvases (``metrics.psnr_masked`` /
  ``ssim_masked`` / ``lr_psnr_masked``) with the resize matrices for the
  true sizes zero-embedded into bucket-sized operands.

Per-image host work is a few numpy array builds; the device program depends
only on (bucket LR shape, bucket HR shape). Exactness: per-pixel values
match the exact-shape path bit-for-bit; only fp32 reduction order in the
metric means differs (<< 1e-4 dB).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from tpu_diinn.core import grids
from tpu_diinn.core.resize import resize_matrix, resize_by_scale_size
from tpu_diinn.nn.diinn import DIINN, ImplicitDecoder
from tpu_diinn.nn.masking import valid_extent
from tpu_diinn.nn.registry import make_encoder
from tpu_diinn.train import metrics as M
from tpu_diinn.train.task import SRTask, normalize, denormalize


class BucketedUnsupported(Exception):
    """Model/config outside the bucketed-eval scope (callers fall back to
    the exact-shape EvalJit)."""


def _bucket_up(n: int, q: int) -> int:
    return ((n + q - 1) // q) * q


def _centers_np(n: int) -> np.ndarray:
    """fp32 numpy mirror of grids.pixel_center_coords (same op order)."""
    r = 1.0 / n
    return (np.float32(-1.0 + r)
            + np.float32(2.0 * r) * np.arange(n, dtype=np.float32))


def _syn_np(in_size: Tuple[int, int], out_size: Tuple[int, int]) -> np.ndarray:
    """fp32 numpy mirror of grids.syn_input_grid (host-side, exact index
    math in float64 via grids.nearest_exact_indices)."""
    h_in, w_in = in_size
    h_out, w_out = out_size
    ys_o, xs_o = _centers_np(h_out), _centers_np(w_out)
    ys_i, xs_i = _centers_np(h_in), _centers_np(w_in)
    ry = (ys_o - ys_i[grids.nearest_exact_indices(h_in, h_out)]) \
        * np.float32(h_in)
    rx = (xs_o - xs_i[grids.nearest_exact_indices(w_in, w_out)]) \
        * np.float32(w_in)
    syn = np.empty((h_out, w_out, 3), np.float32)
    syn[:, :, 0] = ry[:, None]
    syn[:, :, 1] = rx[None, :]
    syn[:, :, 2] = np.float32((h_in * w_in) / (h_out * w_out))
    return syn


def _pad_to(a: np.ndarray, shape: Tuple[int, ...]) -> np.ndarray:
    out = np.zeros(shape, a.dtype)
    out[tuple(slice(0, s) for s in a.shape)] = a
    return out


def _syn_traced(out_pad: Tuple[int, int], in_pad: Tuple[int, int],
                hv, wv, hhv, wwv, rows, cols) -> jnp.ndarray:
    """In-graph synthesis grid over a padded canvas from TRACED true sizes.

    Shipping the (H_pad, W_pad, 3) grid from the host costs ~32 MB of
    device upload per benchmark image through the remote tunnel; computed
    on device it costs three tiny broadcasts. fp32 op order differs from
    the host mirror by <= 1-2 ulp in the coordinates (well inside the
    1e-4 dB metric budget; the discrete gather INDICES stay host-computed
    float64, where exactness actually matters)."""
    h_pad, w_pad = out_pad
    f32 = jnp.float32

    def centers(n, count):
        nf = jnp.asarray(n, f32)
        r = 1.0 / nf
        return (-1.0 + r) + (2.0 * r) * jnp.arange(count, dtype=f32)

    yo = centers(hhv, h_pad)
    xo = centers(wwv, w_pad)
    yi = centers(hv, in_pad[0])       # LR centers, gathered via rows
    xi = centers(wv, in_pad[1])
    ry = (yo - yi[rows]) * jnp.asarray(hv, f32)
    rx = (xo - xi[cols]) * jnp.asarray(wv, f32)
    ratio = (jnp.asarray(hv, f32) * jnp.asarray(wv, f32)) \
        / (jnp.asarray(hhv, f32) * jnp.asarray(wwv, f32))
    return jnp.stack([jnp.broadcast_to(ry[:, None], (h_pad, w_pad)),
                      jnp.broadcast_to(rx[None, :], (h_pad, w_pad)),
                      jnp.full((h_pad, w_pad), ratio, f32)], axis=-1)


class BucketedEval:
    """Drop-in for ``loop.EvalJit`` on the benchmark test loop: same
    ``test_fn(scale, lr_shape, hr_shape)(params, lr, hr)`` surface, but the
    returned callable pads to a bucket canvas and dispatches to a program
    compiled once per (bucket, scale-protocol)."""

    def __init__(self, task: SRTask, quantum: int = 64,
                 kernel: bool = True):
        from tpu_diinn.nn.liif import LIIF
        from tpu_diinn.nn.metasr import MetaSR
        net = task.net
        if isinstance(net, DIINN):
            if net.mode == 4:
                raise BucketedUnsupported("mode 4 (window output conv)")
            self.arch = "diinn"
            self.enc = make_encoder(net.encoder_spec, dtype=net.dtype,
                                    lane_pack=net.lane_pack)
            self.dec = ImplicitDecoder(in_channels=self.enc.out_dim,
                                       hidden_dims=net.hidden_dims,
                                       mode=net.mode, init_q=net.init_q,
                                       exact_sin=net.exact_sin,
                                       use_fused=net.use_fused,
                                       dtype=net.dtype)
        elif isinstance(net, (LIIF, MetaSR)):
            self.arch = "liif" if isinstance(net, LIIF) else "metasr"
        else:
            raise BucketedUnsupported(type(net).__name__)
        self.net = net
        self.task = task
        self.quantum = quantum
        # kernel=True routes integer-scale DIINN images (HR exactly
        # scale x LR, the benchmark-protocol case) through the 2-D tiled
        # fused Pallas decode (decoder_fused.decode_fused_int_eval) when
        # the decoder config is kernel-eligible.
        self.kernel = kernel
        self._jit: Dict[Any, Any] = {}

    @property
    def n_programs(self) -> int:
        return len(self._jit)

    # -- program construction ------------------------------------------
    def _encode(self, p, lr, h_pad, w_pad, hv, wv):
        from tpu_diinn.nn.masking import apply_valid_mask
        # normalize maps the zero pad region to -1; the first conv must see
        # zeros beyond the true extent (= SAME padding), so the normalized
        # input is masked too.
        x = apply_valid_mask(normalize(lr))
        return self.enc.apply({"params": p["encoder"]}, x)

    def _program(self, key):
        if key in self._jit:
            return self._jit[key]
        kind = key[0]
        h_pad, w_pad, hh_pad, ww_pad = key[1:5]
        dec = getattr(self, "dec", None)
        bsize = self.task.eval_bsize

        if kind in ("liif", "metasr"):
            net = self.net
            cls = type(net)

            def f(params, lr, hr, hv, wv, hhv, wwv, dec_args,
                  mh, mw, hlv, wlv):
                from tpu_diinn.nn.masking import apply_valid_mask
                with valid_extent((h_pad, w_pad), hv, wv):
                    x = apply_valid_mask(normalize(lr))
                    feat = net.apply(params, x, method=cls.encode)
                    pred = net.apply(params, feat, *dec_args,
                                     (hh_pad, ww_pad), bsize,
                                     method=cls.decode_traced)
                pred = jnp.clip(denormalize(pred), 0.0, 1.0)
                return (M.psnr_masked(pred, hr, hhv, wwv),
                        M.ssim_masked(pred, hr, hhv, wwv),
                        M.lr_psnr_masked(pred, hr, mh, mw, hlv, wlv))
        elif kind == "traced":
            def f(params, lr, hr, hv, wv, hhv, wwv, rows, cols,
                  mh, mw, hlv, wlv):
                p = params["params"] if "params" in params else params
                syn = _syn_traced((hh_pad, ww_pad), (h_pad, w_pad),
                                  hv, wv, hhv, wwv, rows, cols)
                with valid_extent((h_pad, w_pad), hv, wv):
                    feat = self._encode(p, lr, h_pad, w_pad, hv, wv)
                    pred = dec.apply({"params": p["decoder"]}, feat, syn,
                                     rows, cols, bsize,
                                     method=ImplicitDecoder.decode_traced)
                pred = jnp.clip(denormalize(pred), 0.0, 1.0)
                return (M.psnr_masked(pred, hr, hhv, wwv),
                        M.ssim_masked(pred, hr, hhv, wwv),
                        M.lr_psnr_masked(pred, hr, mh, mw, hlv, wlv))
        else:  # "kernel": integer scale, 2-D tiled fused Pallas decode
            from tpu_diinn.kernels.decoder_fused import decode_fused_int_eval

            def f(params, lr, hr, hv, wv, hhv, wwv, rows, cols,
                  mh, mw, hlv, wlv):
                p = params["params"] if "params" in params else params
                syn = _syn_traced((hh_pad, ww_pad), (h_pad, w_pad),
                                  hv, wv, hhv, wwv, rows, cols)
                with valid_extent((h_pad, w_pad), hv, wv):
                    feat = self._encode(p, lr, h_pad, w_pad, hv, wv)
                    z, kp = dec.apply(
                        {"params": p["decoder"]}, feat,
                        method=lambda m, f_: (m.lr_features_stacked(f_),
                                              m._fused_params()))
                out = decode_fused_int_eval(z, syn, (hh_pad, ww_pad), kp)
                pred = jnp.clip(denormalize(out.astype(jnp.float32)),
                                0.0, 1.0)
                return (M.psnr_masked(pred, hr, hhv, wwv),
                        M.ssim_masked(pred, hr, hhv, wwv),
                        M.lr_psnr_masked(pred, hr, mh, mw, hlv, wlv))

        self._jit[key] = jax.jit(f)
        return self._jit[key]

    # -- per-image host prep + dispatch ---------------------------------
    def _buckets(self, lr_hw, hr_hw, scale):
        q = self.quantum
        h, w = lr_hw
        hh, ww = hr_hw
        h_pad, w_pad = _bucket_up(h, q), _bucket_up(w, q)
        if float(scale).is_integer():
            s = int(scale)
            hh_pad, ww_pad = s * h_pad, s * w_pad
            # round(H/s) can exceed s*bucket(h) when h is already a
            # multiple of the quantum; widen once.
            if hh_pad < hh:
                h_pad += q
                hh_pad = s * h_pad
            if ww_pad < ww:
                w_pad += q
                ww_pad = s * w_pad
        else:
            hh_pad, ww_pad = _bucket_up(hh, 2 * q), _bucket_up(ww, 2 * q)
        return h_pad, w_pad, hh_pad, ww_pad

    def metrics(self, params, lr: np.ndarray, hr: np.ndarray, scale):
        """(psnr, ssim, lr_psnr) for one (1, h, w, 3)/(1, H, W, 3) pair."""
        lr = np.asarray(lr, np.float32)
        hr = np.asarray(hr, np.float32)
        h, w = lr.shape[1:3]
        hh, ww = hr.shape[1:3]
        buckets = self._buckets((h, w), (hh, ww), scale)
        h_pad, w_pad, hh_pad, ww_pad = buckets

        hl, wl = resize_by_scale_size((hh, ww), scale)
        assert hl <= h_pad and wl <= w_pad, (hl, wl, h_pad, w_pad)
        mh = _pad_to(resize_matrix(hh, hl).astype(np.float32),
                     (h_pad, hh_pad))
        mw = _pad_to(resize_matrix(ww, wl).astype(np.float32),
                     (w_pad, ww_pad))
        lrp = _pad_to(lr, (lr.shape[0], h_pad, w_pad, 3))
        hrp = _pad_to(hr, (hr.shape[0], hh_pad, ww_pad, 3))
        scalars = (np.int32(h), np.int32(w), np.int32(hh), np.int32(ww))
        tail = (mh, mw, np.int32(hl), np.int32(wl))

        if self.arch == "liif":
            from tpu_diinn.nn.liif import _corner_axis_indices
            corners = [(-1, -1), (-1, 1), (1, -1), (1, 1)] \
                if self.net.local_ensemble else [(0, 0)]
            pc = []
            for vy, vx in corners:
                iy, ry = _corner_axis_indices(h, hh, vy,
                                              self.net.local_ensemble)
                ix, rx = _corner_axis_indices(w, ww, vx,
                                              self.net.local_ensemble)
                pc.append((_pad_to(iy, (hh_pad,)), _pad_to(ry, (hh_pad,)),
                           _pad_to(ix, (ww_pad,)), _pad_to(rx, (ww_pad,))))
            cell = np.asarray([2.0 * h / hh, 2.0 * w / ww], np.float32)
            fn = self._program(("liif",) + buckets)
            return fn(params, lrp, hrp, *scalars,
                      (tuple(pc), cell), *tail)
        if self.arch == "metasr":
            from tpu_diinn.nn.metasr import _axis_lookup
            iy, ry = _axis_lookup(h, hh)
            ix, rx = _axis_lookup(w, ww)
            r_rev = np.float32((2.0 / hh) * h / 2.0)
            fn = self._program(("metasr",) + buckets)
            return fn(params, lrp, hrp, *scalars,
                      (_pad_to(iy, (hh_pad,)), _pad_to(ry, (hh_pad,)),
                       _pad_to(ix, (ww_pad,)), _pad_to(rx, (ww_pad,)),
                       r_rev), *tail)

        use_kernel = (self.kernel and float(scale).is_integer()
                      and hh == int(scale) * h and ww == int(scale) * w
                      and hh_pad == int(scale) * h_pad
                      and self.dec._fused_config_ok())
        rows = _pad_to(grids.nearest_exact_indices(h, hh), (hh_pad,))
        cols = _pad_to(grids.nearest_exact_indices(w, ww), (ww_pad,))
        kind = "kernel" if use_kernel else "traced"
        fn = self._program((kind,) + buckets)
        return fn(params, lrp, hrp, *scalars, rows, cols, *tail)

    # -- EvalJit-compatible surface --------------------------------------
    def test_fn(self, scale, lr_shape, hr_shape):
        def run(params, lr, hr):
            return self.metrics(params, np.asarray(lr), np.asarray(hr),
                                scale)
        return run
