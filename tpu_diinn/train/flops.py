"""Analytic FLOP accounting + MFU for the flagship training step.

Gives the perf numbers a denominator (BASELINE.json "SOL-class" target):
``bench.py`` reports decoded pixels/s *and* model FLOPs/s as a fraction of
the chip's peak (MFU), plus the encoder/decoder split, so a speedup claim
can be checked against the roofline instead of against our own first
measurement.

Counts are exact MAC-based model FLOPs (2 x MACs) of the layers the
reference defines — RDN-B encoder (``rdn.py:46-49``: D=16 RDBs x C=8 convs,
G=G0=64) and the mode-3 dual-MLP implicit decoder (``diinn.py:73-92``) in
this framework's factorized form (LR 3x3 convs + HR dense chain,
nn/diinn.py module docstring). Gather one-hot matmuls, bias adds,
activations, and the optimizer are excluded: they are overhead the MXU
roofline does not credit.
"""

from __future__ import annotations

from typing import Dict, Iterable, Sequence

# Peak dense matmul throughput per chip, FLOP/s. The tunneled chip here is
# a TPU v5e (v5litepod): 197 TFLOP/s bf16, 99 TFLOP/s fp32.
PEAK_FLOPS = {
    ("v5e", "bfloat16"): 197e12,
    ("v5e", "float32"): 99e12,
}


def conv_macs_per_px(kh: int, kw: int, cin: int, cout: int) -> int:
    return kh * kw * cin * cout


def rdn_macs_per_px(d: int = 16, c: int = 8, g: int = 64, g0: int = 64,
                    in_ch: int = 3) -> int:
    """RDN feature extractor (no_upsampling) MACs per LR pixel
    (``rdn.py:50-103``)."""
    total = conv_macs_per_px(3, 3, in_ch, g0)          # SFENet1
    total += conv_macs_per_px(3, 3, g0, g)             # SFENet2
    rdb = sum(conv_macs_per_px(3, 3, g0 + i * g, g) for i in range(c))
    rdb += conv_macs_per_px(1, 1, g0 + c * g, g0)      # local fusion
    total += d * rdb
    total += conv_macs_per_px(1, 1, d * g0, g0)        # GFF 1x1
    total += conv_macs_per_px(3, 3, g0, g0)            # GFF 3x3
    return total


def edsr_baseline_macs_per_px(n_resblocks: int = 16, n_feats: int = 64,
                              in_ch: int = 3) -> int:
    """EDSR-baseline headless encoder MACs per LR pixel (``edsr.py:5-47``)."""
    total = conv_macs_per_px(3, 3, in_ch, n_feats)
    total += n_resblocks * 2 * conv_macs_per_px(3, 3, n_feats, n_feats)
    total += conv_macs_per_px(3, 3, n_feats, n_feats)
    return total


def decoder_lr_macs_per_px(feat_ch: int = 64,
                           hidden_dims: Sequence[int] = (256,) * 4) -> int:
    """Factorized content-branch 3x3 convs at LR resolution (k0 + kx_i)."""
    return sum(conv_macs_per_px(3, 3, feat_ch, h) for h in hidden_dims)


def decoder_hr_macs_per_query(hidden_dims: Sequence[int] = (256,) * 4,
                              out_ch: int = 3) -> int:
    """Dense chain per HR query: q0 (3->h0), per layer kq+q (h x h),
    last (h -> 3)."""
    h = list(hidden_dims)
    total = 3 * h[0]
    for i in range(1, len(h)):
        total += 2 * h[i - 1] * h[i]
    total += h[-1] * out_ch
    return total


def train_step_flops(batch: int, patch: int, scales: Iterable[float],
                     encoder: str = "rdn",
                     hidden_dims: Sequence[int] = (256,) * 4,
                     bwd_mult: float = 3.0) -> Dict[str, float]:
    """Model FLOPs of one multi-scale training step (fwd+bwd).

    ``bwd_mult=3`` is the standard dense fwd+bwd factor (grad wrt inputs +
    grad wrt weights each cost one forward). Returns a breakdown dict with
    'encoder', 'decoder_lr', 'decoder_hr', and 'total' FLOPs.
    """
    enc_px = rdn_macs_per_px() if encoder.startswith("rdn") else \
        edsr_baseline_macs_per_px()
    enc = dec_lr = dec_hr = 0.0
    for s in scales:
        lr_px = batch * patch * patch
        hr_px = batch * round(patch * s) * round(patch * s)
        enc += 2 * enc_px * lr_px
        dec_lr += 2 * decoder_lr_macs_per_px(64, hidden_dims) * lr_px
        dec_hr += 2 * decoder_hr_macs_per_query(hidden_dims) * hr_px
    out = {"encoder": enc * bwd_mult, "decoder_lr": dec_lr * bwd_mult,
           "decoder_hr": dec_hr * bwd_mult}
    out["total"] = sum(out.values())
    return out


def mfu(flops_per_step: float, step_time_s: float, chip: str = "v5e",
        dtype: str = "bfloat16") -> float:
    return flops_per_step / step_time_s / PEAK_FLOPS[(chip, dtype)]
