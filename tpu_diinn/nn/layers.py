"""Shared NN building blocks (NHWC, flax.linen).

TPU-native equivalents of the reference's conv blocks
(``src/models/components/common.py:7-87``): same-padded conv, MeanShift,
ResBlock, PixelShuffle upsampler. PixelShuffle is a reshape/transpose
(depth-to-space) — no kernel needed on TPU.

Initializers reproduce torch ``nn.Conv2d``/``nn.Linear`` defaults
(kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
weight and bias) so that training trajectories are distributionally comparable
with the reference.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jnp.ndarray

# DIV2K RGB mean used by EDSR's MeanShift (reference common.py:15).
DIV2K_RGB_MEAN = (0.4488, 0.4371, 0.4040)


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv2d/Linear default weight init in HWIO/(in,out) layout.

    kaiming_uniform(a=sqrt(5)) reduces to U(-b, b) with b = 1/sqrt(fan_in),
    fan_in = prod(kernel spatial) * in_channels.
    """
    if len(shape) == 4:  # HWIO conv kernel
        fan_in = shape[0] * shape[1] * shape[2]
    else:  # (in, out) dense kernel
        fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init_for(fan_in: int) -> Callable:
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _LanePackedConv3x3(nn.Module):
    """3x3 SAME conv computed as a 3x4 stride-(1,2) conv with doubled output
    channels (each matmul row yields TWO adjacent output columns).

    Motivation (PERF.md): the v5e MXU is a 128-lane systolic array; a conv
    with cout=64 leaves half the output lanes idle. Packing column pairs
    doubles N to a full lane set at the cost of K growing 9*cin -> 12*cin,
    a theoretical 1.5x on lane-limited convs. The parameter tree (HWIO
    ``kernel`` (3,3,cin,cout) + ``bias``) is identical to ``nn.Conv``'s, so
    checkpoints/fixtures are interchangeable with the plain path; the packed
    kernel is built by pad+concat inside the forward (differentiable, and
    constant-folded by XLA since it only involves the weights).
    """
    features: int
    h_padding: Any = ((1, 1),)  # H pad; W handled by the packing
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init,
                            (3, 3, cin, self.features))
        bias = self.param("bias", torch_bias_init_for(9 * cin),
                          (self.features,)) if self.use_bias else None
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        b, h, w, _ = x.shape
        if w % 2:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))
        # block d of the packed kernel holds `kernel` at tap columns d..d+2:
        # output col j of the strided conv covers input cols 2j-1..2j+2, so
        # block 0 reproduces the SAME window of col 2j, block 1 of col 2j+1.
        kp = jnp.concatenate([
            jnp.pad(kernel, ((0, 0), (0, 1), (0, 0), (0, 0))),
            jnp.pad(kernel, ((0, 0), (1, 0), (0, 0), (0, 0)))], axis=-1)
        y = jax.lax.conv_general_dilated(
            x, kp, (1, 2), tuple(self.h_padding) + ((1, 2),),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # (B,H',W/2,2*cout) -> (B,H',W,cout): row-major regroup is exactly
        # the column interleave.
        y = y.reshape(b, y.shape[1], y.shape[2] * 2, self.features)
        if w % 2:
            y = y[:, :, :w, :]
        if bias is not None:
            y = y + bias
        return y


class Conv(nn.Module):
    """Same-padded 2-D conv (NHWC) with torch-default init.

    ``halo_axis``: when set (inside shard_map with the H axis sharded over
    that mesh axis), the conv exchanges kernel_size//2 edge rows with its
    neighbors and convolves VALID along H — bit-identical to the unsharded
    SAME conv, including zero padding at the global boundary. This is the
    exact per-layer halo scheme for spatially-sharded encoders
    (SURVEY.md §2.3/§7.3).

    ``lane_pack``: compute a 3x3 conv via the column-pair packed form
    (see ``_LanePackedConv3x3``) — same parameters, same function, full
    MXU lane utilization when ``features`` < 128. No-op for other kernel
    sizes.
    """
    features: int
    kernel_size: int = 3
    use_bias: bool = True
    halo_axis: Any = None
    lane_pack: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from tpu_diinn.nn.masking import apply_valid_mask, masking_active
        in_ch = x.shape[-1]
        k = self.kernel_size
        fan_in = k * k * in_ch
        pad = (k - 1) // 2
        padding = "SAME"
        if self.halo_axis is not None and pad > 0:
            assert not masking_active(), \
                "valid-extent masking is not supported inside halo shard_map"
            from tpu_diinn.parallel.sharding import halo_exchange
            x = halo_exchange(x, pad, self.halo_axis, spatial_axis=1)
            padding = [(0, 0), (pad, pad)]  # VALID on H, SAME on W
        if self.lane_pack and k == 3 and self.features < 128:
            h_pad = (padding[0],) if isinstance(padding, list) else ((1, 1),)
            return apply_valid_mask(_LanePackedConv3x3(
                features=self.features, h_padding=h_pad,
                use_bias=self.use_bias, dtype=self.dtype, name="conv")(x))
        return apply_valid_mask(nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            padding=padding,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init_for(fan_in),
            dtype=self.dtype,
            name="conv",
        )(x))


class Dense(nn.Module):
    """Per-pixel linear layer (== the reference's 1x1 convs) with torch init."""
    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        fan_in = x.shape[-1]
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init_for(fan_in),
            dtype=self.dtype,
            name="dense",
        )(x)


def pixel_shuffle(x: Array, factor: int) -> Array:
    """Depth-to-space: (B, H, W, C*r^2) -> (B, H*r, W*r, C).

    Channel convention matches torch ``nn.PixelShuffle`` applied to an NCHW
    tensor whose channels are ordered (C, r, r): out[c, h*r+i, w*r+j] =
    in[c*r*r + i*r + j, h, w].
    """
    b, h, w, c = x.shape
    r = factor
    c_out = c // (r * r)
    x = x.reshape(b, h, w, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c_out)


class MeanShift(nn.Module):
    """Frozen RGB mean shift (reference common.py:12-22). sign=-1 subtracts."""
    rgb_range: float = 1.0
    sign: int = -1
    rgb_mean: Sequence[float] = DIV2K_RGB_MEAN
    rgb_std: Sequence[float] = (1.0, 1.0, 1.0)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from tpu_diinn.nn.masking import apply_valid_mask
        mean = jnp.asarray(self.rgb_mean, dtype=x.dtype)
        std = jnp.asarray(self.rgb_std, dtype=x.dtype)
        # masked so the following conv still sees zeros beyond the true
        # extent under bucketed (shape-padded) eval
        return apply_valid_mask(
            x / std + self.sign * self.rgb_range * mean / std)


class ResBlock(nn.Module):
    """conv-relu-conv residual block (reference common.py:37-58)."""
    n_feats: int
    kernel_size: int = 3
    res_scale: float = 1.0
    halo_axis: Any = None
    lane_pack: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = Conv(self.n_feats, self.kernel_size, halo_axis=self.halo_axis,
                 lane_pack=self.lane_pack, dtype=self.dtype, name="conv0")(x)
        y = nn.relu(y)
        y = Conv(self.n_feats, self.kernel_size, halo_axis=self.halo_axis,
                 lane_pack=self.lane_pack, dtype=self.dtype, name="conv1")(y)
        return x + y * self.res_scale


class Upsampler(nn.Module):
    """PixelShuffle x2^n / x3 upsampling tail (reference common.py:60-87)."""
    scale: int
    n_feats: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s = self.scale
        if (s & (s - 1)) == 0:  # power of two
            n = int(np.log2(s))
            for i in range(n):
                x = Conv(4 * self.n_feats, 3, dtype=self.dtype,
                         name=f"conv{i}")(x)
                x = pixel_shuffle(x, 2)
        elif s == 3:
            x = Conv(9 * self.n_feats, 3, dtype=self.dtype, name="conv0")(x)
            x = pixel_shuffle(x, 3)
        else:
            raise NotImplementedError(f"Upsampler scale {s}")
        return x
