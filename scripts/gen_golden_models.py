"""Generate model-parity golden fixtures from the PyTorch reference.

Runs the reference modules (mounted read-only at /root/reference) with
deterministically filled weights (tests/parity_utils.fill_values) on fixed
inputs and records outputs + input-gradients. The committed .npz files let
parity tests run without the reference checkout or its weights.

Cases cover: every DIINN decoder mode x init_q, the full flagship DIINN
(RDN-B encoder, mode=3, init_q=False) at a non-integer scale, LIIF, MetaSR,
and the EDSR-baseline encoder, fwd + bwd.
"""

from __future__ import annotations

import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/repo")

from src.models.components.diinn import DIINN, ImplicitDecoder  # noqa: E402
from src.models.components.liif import LIIF  # noqa: E402
from src.models.components.metasr import MetaSR  # noqa: E402
from src.models.components.edsr import EDSR  # noqa: E402

from tests.parity_utils import fill_values  # noqa: E402

OUT = "/root/repo/tests/golden"


def load_filled(module: torch.nn.Module, seed: int) -> tuple[list, list]:
    sd = module.state_dict()
    names = list(sd.keys())
    shapes = [tuple(v.shape) for v in sd.values()]
    vals = fill_values(names, shapes, seed)
    module.load_state_dict({k: torch.from_numpy(v) for k, v in vals.items()})
    return names, shapes


def run_case(tag: str, module, in_shape, size, seed, call=None):
    torch.manual_seed(seed)
    names, shapes = load_filled(module, seed)
    rng = np.random.default_rng(seed + 1)
    x = rng.standard_normal(in_shape).astype(np.float32)
    xt = torch.from_numpy(x).requires_grad_(True)
    y = call(module, xt) if call else module(xt, size)
    g = torch.from_numpy(
        rng.standard_normal(tuple(y.shape)).astype(np.float32))
    (y * g).sum().backward()
    np.savez_compressed(
        f"{OUT}/{tag}.npz",
        names=np.asarray(names), shapes=np.asarray(
            [",".join(map(str, s)) for s in shapes]),
        seed=seed, x=x, size=np.asarray(size),
        y=y.detach().numpy(), g=g.numpy(), x_grad=xt.grad.numpy())
    print(tag, "out", tuple(y.shape), "|y|max", float(y.abs().max()))


def main():
    # 1) Decoder-only: all modes x init_q, tiny dims, non-integer scale.
    for mode in (1, 2, 3, 4):
        for init_q in (False, True):
            dec = ImplicitDecoder(in_channels=16, hidden_dims=[32, 32, 32],
                                  mode=mode, init_q=init_q)
            run_case(f"diinn_dec_m{mode}_q{int(init_q)}", dec,
                     (2, 16, 7, 9), (17, 23), seed=10 * mode + init_q)

    # 2) Flagship DIINN: full RDN-B encoder, mode 3, init_q False, x~2.6.
    run_case("diinn_full_m3", DIINN(mode=3, init_q=False),
             (1, 3, 12, 17), (31, 43), seed=99)

    # 3) LIIF full (RDN-B), non-integer scale; also chunked path equality.
    run_case("liif_full", LIIF(), (1, 3, 10, 13), (26, 33), seed=7)

    # 4) MetaSR full.
    run_case("metasr_full", MetaSR(), (1, 3, 10, 13), (26, 33), seed=8)

    # 3b/4b) decoder-only paths (grad wrt the 64-ch feature grid): tightly
    # conditioned, so parity tolerances stay strict even though the
    # full-model grads through RDN-B are fp32-ill-conditioned.
    liif = LIIF()

    def liif_decode(m, feat):
        size = (19, 25)
        coord, cell = m.make_coord_and_cell(feat, size)
        return m.reshape_pred(m.query_rgb(feat, coord, cell), size)

    run_case("liif_decode", liif, (1, 64, 7, 9), (19, 25), seed=70,
             call=liif_decode)

    metasr = MetaSR()

    def metasr_decode(m, feat):
        size = (19, 25)
        coord, cell = m.make_coord_and_cell(feat, size)
        return m.reshape_pred(m.query_rgb(feat, coord, cell), size)

    run_case("metasr_decode", metasr, (1, 64, 7, 9), (19, 25), seed=71,
             call=metasr_decode)

    # 5) EDSR-baseline encoder = head+body of reference EDSR (no tail).
    edsr = EDSR(n_resblocks=4, n_feats=24)

    def edsr_headbody(m, x):
        y = m.head(x)
        return y + m.body(y)

    run_case("edsr_baseline", edsr, (2, 3, 9, 11), (0, 0), seed=5,
             call=edsr_headbody)


if __name__ == "__main__":
    main()
