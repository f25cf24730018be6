"""MC-NeRF-TPU command-line entry point.

CLI surface identical to the reference (``main.py:244-281``):

  python main.py --train --root_data <dir> --data_name <scene> [--config ./config]
  python main.py --demo  --root_data <dir> --data_name <scene>

plus ``--log`` / ``--tensorboard`` / ``--start_device`` for flag parity.
"""

from __future__ import annotations

import logging

from mc_nerf_tpu.config import build_argparser, from_args


def main() -> None:
    args = build_argparser().parse_args()
    cfg = from_args(args)
    logging.info("config: %s", cfg)

    # multi-process wiring (ref utils/distributed_init.py:7-67): no-op for
    # single-process runs, initializes jax.distributed under a launcher.
    from mc_nerf_tpu.parallel.distributed import initialize_distributed

    initialize_distributed()

    from mc_nerf_tpu.train.engine import Engine

    engine = Engine(cfg)
    if cfg.mode == 0:
        engine.train(resume=True)
    else:
        engine.demo()


if __name__ == "__main__":
    main()
