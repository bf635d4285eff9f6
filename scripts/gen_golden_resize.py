"""Generate golden fixtures for MATLAB-convention imresize parity.

Runs the reference repo's pure-numpy MATLAB imresize (an independent oracle)
on fixed random images and saves inputs/outputs to tests/golden/. Requires the
reference checkout at /root/reference; the committed .npz lets tests run
without it.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/reference")
from src.utils.matlab_imresize import imresize  # noqa: E402


def main():
    rng = np.random.default_rng(7)
    cases = {}
    for name, in_size, out in [
        ("down2", (16, 16), (8, 8)),
        ("down_pi", (157, 100), (50, 32)),
        ("up2", (12, 10), (24, 20)),
        ("up_noninteger", (12, 10), (37, 31)),
    ]:
        x = rng.random((*in_size, 3)).astype(np.float64)
        y = imresize(x, output_shape=out)
        cases[f"{name}_in"] = x.astype(np.float32)
        cases[f"{name}_out"] = y.astype(np.float32)
    np.savez_compressed("tests/golden/matlab_resize.npz", **cases)
    print("wrote tests/golden/matlab_resize.npz")


if __name__ == "__main__":
    main()
