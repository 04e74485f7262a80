"""Interpolation evaluation CLI (reference:
scripts/evaluate_interpolation_results.py:24-32, :281-288).

    python -m superslomo_tpu.cli.evaluate_interpolation -c eval.ini \
        --expt my_eval --log eval.log
"""

from __future__ import annotations

import json
import logging
from argparse import ArgumentParser


def main():
    parser = ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--expt", required=True)
    parser.add_argument("--log", required=True)
    parser.add_argument("--max-batches", type=int, default=None)
    args = parser.parse_args()
    logging.basicConfig(filename=args.log, level=logging.INFO)

    from superslomo_tpu.cli.common import load_model_params
    from superslomo_tpu.config import load_config
    from superslomo_tpu.eval.evaluate_interpolation import Evaluator

    cfg = load_config(args.config)
    cfg.validate()
    params = load_model_params(cfg)
    results = Evaluator(cfg, params).run(max_batches=args.max_batches)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
