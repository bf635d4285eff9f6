"""Column-pair lane-packed conv (nn/layers.py::_LanePackedConv3x3).

The packed form computes the SAME function as the plain 3x3 conv with the
SAME parameter tree — these tests pin both claims, plus gradient equality
and composition with encoder wiring / halo sharding.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_diinn.nn.layers import Conv
from tpu_diinn.nn.rdn import RDN
from tpu_diinn.parallel.mesh import make_mesh


def _pair(features=64, k=3):
    return (Conv(features, k, lane_pack=False, name="c"),
            Conv(features, k, lane_pack=True, name="c"))


@pytest.mark.parametrize("w", [8, 9, 48, 1])
@pytest.mark.parametrize("cin", [3, 64, 129])
def test_packed_conv_matches_plain(w, cin):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 7, w, cin)), jnp.float32)
    plain, packed = _pair()
    params = plain.init(jax.random.PRNGKey(1), x)
    # identical parameter trees: the packed module must accept the plain
    # module's params verbatim (and produce identical init itself)
    params2 = packed.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(params) \
        == jax.tree_util.tree_structure(params2)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    y0 = plain.apply(params, x)
    y1 = packed.apply(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-5, atol=2e-5)


def test_packed_conv_gate_large_features_and_k1():
    """features >= 128 or kernel != 3 fall back to the plain path (the
    packing only pays below a full lane set and 1x1 convs have no tap
    overlap to exploit)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 5, 6, 8)), jnp.float32)
    for feats, k in [(128, 3), (64, 1)]:
        a = Conv(feats, k, lane_pack=False, name="c")
        b = Conv(feats, k, lane_pack=True, name="c")
        p = a.init(jax.random.PRNGKey(0), x)
        np.testing.assert_array_equal(np.asarray(a.apply(p, x)),
                                      np.asarray(b.apply(p, x)))


def test_packed_conv_grads_match_plain():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 6, 10, 16)), jnp.float32)
    plain, packed = _pair(features=32)
    params = plain.init(jax.random.PRNGKey(3), x)

    def loss(mod):
        def f(p, x):
            return jnp.sum(jnp.sin(mod.apply(p, x)))
        return jax.grad(f, argnums=(0, 1))(params, x)

    (gp0, gx0), (gp1, gx1) = loss(plain), loss(packed)
    np.testing.assert_allclose(np.asarray(gx0), np.asarray(gx1),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gp0),
                    jax.tree_util.tree_leaves(gp1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_rdn_lane_pack_matches_plain():
    """Whole-encoder equivalence: same params, same features, packed convs."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 11, 13, 3)), jnp.float32)
    enc0 = RDN(growth0=16, config="tiny", lane_pack=False)
    enc1 = RDN(growth0=16, config="tiny", lane_pack=True)
    p = enc0.init(jax.random.PRNGKey(5), x)
    y0, y1 = enc0.apply(p, x), enc1.apply(p, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-5, atol=2e-5)


def test_packed_conv_with_halo_sharding():
    """lane_pack composes with the H-axis halo exchange (padding moves to
    the explicit halo; W packing is orthogonal)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, 16, 10, 8)), jnp.float32)
    ref = Conv(8, 3, lane_pack=True, name="c")
    params = ref.init(jax.random.PRNGKey(7), x)
    want = ref.apply(params, x)

    mesh = make_mesh(data=1, space=4)
    conv_h = Conv(8, 3, lane_pack=True, halo_axis="space", name="c")

    def local(p, xs):
        return conv_h.apply(p, xs)

    f = shard_map(local, mesh=mesh,
                  in_specs=(P(), P(None, "space", None, None)),
                  out_specs=P(None, "space", None, None))
    got = f(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
