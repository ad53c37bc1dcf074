#!/usr/bin/env python
"""Run the actual PyTorch reference trainer (/root/reference) on a parity
case and print the final metrics as one JSON line.

Usage: python parity/run_reference.py --case static_fx --workdir /tmp/parity
       [--init <state_dict.pt>]  (transplanted initial weights saved by
                                  run_gaot.py --save-init)

Drives the reference's OWN stack end to end — FileParser-equivalent config,
BaseTrainer lifecycle, optimizer-owned epoch loop (src/utils/optimizers.py:
236-305), and its own metric (src/utils/metrics.py:60-75) — via the
functional stubs in parity/stubs.py. Nothing on the training path is
re-implemented here.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parity import cases, stubs  # noqa: E402


class _Arg:
    """Config namespace matching what main.py:prepare_arg hands trainers."""

    def __init__(self, cfg: dict):
        for k, v in cfg.items():
            setattr(self, k, v)
        self.datarow = {}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--case", required=True, choices=sorted(cases.CASES))
    p.add_argument("--workdir", required=True)
    p.add_argument("--init", default=None,
                   help="torch state_dict .pt with transplanted init weights")
    p.add_argument("--epochs", type=int, default=None,
                   help="override epoch count (smoke runs)")
    args = p.parse_args()

    import torch

    torch.set_num_threads(1)
    stubs.install_all()

    data_dir = os.path.join(args.workdir, "data")
    meta_kwargs = cases.ensure_dataset(args.case, data_dir)

    from src.datasets.dataset import DATASET_METADATA, Metadata

    mk = dict(meta_kwargs)
    mk["domain_x"] = tuple(map(tuple, mk["domain_x"]))
    if mk.get("domain_t") is not None:
        mk["domain_t"] = tuple(mk["domain_t"])
    DATASET_METADATA[cases.metaname(args.case)] = Metadata(**mk)

    cfg = cases.build_config(args.case, data_dir, args.workdir, "ref")
    if args.epochs is not None:
        cfg["optimizer"]["args"]["epoch"] = args.epochs
    for sub in cfg["path"].values():
        os.makedirs(os.path.dirname(sub), exist_ok=True)

    from src.trainer.sequential_trainer import SequentialTrainer
    from src.trainer.static_trainer import StaticTrainer

    trainer_cls = {"static": StaticTrainer,
                   "sequential": SequentialTrainer}[cfg["setup"]["trainer_name"]]
    t0 = time.perf_counter()
    trainer = trainer_cls(_Arg(cfg))
    setup_time = time.perf_counter() - t0

    if args.init:
        sd = torch.load(args.init, weights_only=True)
        trainer.model.load_state_dict(sd, strict=True)
        print(f"loaded transplanted init weights from {args.init}")

    t0 = time.perf_counter()
    trainer.fit(verbose=True)
    fit_time = time.perf_counter() - t0

    row = trainer.config.datarow
    result = {
        "side": "reference", "case": args.case,
        "epochs": cfg["optimizer"]["args"]["epoch"],
        "setup_time_s": round(setup_time, 2),
        "fit_time_s": round(fit_time, 2),
        "metrics": {k: float(v) for k, v in row.items()
                    if k.startswith("relative error") and v == v},
    }
    print("PARITY_RESULT " + json.dumps(result))
    out = os.path.join(args.workdir, f"ref_{args.case}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
