"""Training CLI (reference ``train.py``):

    python -m tpu_diinn.cli.train -c tpu_diinn/config/default.yaml \
        --model.arch=diinn --model.mode=3 --model.init_q=false
"""

from __future__ import annotations

import argparse
import faulthandler
import signal

from tpu_diinn.config.config import load_config
from tpu_diinn.config.platform import apply_platform_env
from tpu_diinn.parallel.mesh import maybe_init_distributed
from tpu_diinn.train import loop


def main(argv=None):
    faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps stacks
    parser = argparse.ArgumentParser(description="tpu_diinn trainer")
    parser.add_argument("-c", "--config", default=None,
                        help="YAML config path")
    parser.add_argument("--max-steps", type=int, default=None)
    args, overrides = parser.parse_known_args(argv)
    apply_platform_env()
    cfg = load_config(args.config, overrides)
    maybe_init_distributed()
    loop.train(cfg, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
