"""Training CLI (reference: scripts/main.py:21-37, :287-305).

    python -m superslomo_tpu.cli.train -c configs/superslomo_original.ini \
        --expt my_run --log train.log [--msg "notes"]
"""

from __future__ import annotations

import logging
import os
from argparse import ArgumentParser

import numpy as np


def getargs():
    parser = ArgumentParser()
    parser.add_argument("-c", "--config", required=True, help="Path to config.ini file.")
    parser.add_argument("--expt", required=True, help="Experiment Name.")
    parser.add_argument("--log", required=True, help="Path to log file.")
    parser.add_argument("--msg", help="(Optional) experiment notes for TensorBoard.")
    parser.add_argument("--max-steps", type=int, default=None,
                        help="Optional step cap (smoke runs).")
    return parser.parse_args()


def main():
    args = getargs()
    logging.basicConfig(filename=args.log, level=logging.INFO)
    from superslomo_tpu.config import load_config
    from superslomo_tpu.training.trainer import Trainer

    cfg = load_config(args.config)
    cfg.validate()
    np.random.seed(cfg.getint("SEED", "VALUE"))

    writer = None
    try:
        from tensorboardX import SummaryWriter

        log_dir = os.path.join(cfg.get("PROJECT", "LOGDIR"), args.expt, "plots")
        os.makedirs(log_dir, exist_ok=True)
        writer = SummaryWriter(log_dir)
        if args.msg:
            writer.add_text("msg", args.msg, 0)
    except ImportError:
        logging.warning("tensorboardX unavailable; scalar logging disabled")

    trainer = Trainer(cfg, expt_name=args.expt, writer=writer)
    trainer.train(max_steps=args.max_steps)
    if writer:
        writer.close()
    logging.info("Training complete.")


if __name__ == "__main__":
    main()
