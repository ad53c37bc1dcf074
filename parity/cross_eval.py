#!/usr/bin/env python
"""Cross-stack evaluation probe: take ONE trained checkpoint and evaluate it
through BOTH evaluation stacks (the reference's test() math and gaot_tpu's),
dumping the full per-sample rel-L1 distributions.

Separates "the two frameworks trained to different models" from "the two
evaluation paths score the same model differently", and shows how much of a
final-metric gap is median-order-statistic noise on a small test set.

Usage: python parity/cross_eval.py --case static_fx --workdir /tmp/parity2 \
           [--ckpt <model.pt>]   (default: the reference run's checkpoint)
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parity import cases  # noqa: E402


def ref_per_sample_errors(case_name, workdir, ckpt_path):
    """Reference stack: per-sample rel-L1 on the test set with `ckpt_path`."""
    import torch

    from parity import stubs

    torch.set_num_threads(1)
    stubs.install_all()

    data_dir = os.path.join(workdir, "data")
    meta_kwargs = cases.ensure_dataset(case_name, data_dir)
    from src.datasets.dataset import DATASET_METADATA, Metadata

    mk = dict(meta_kwargs)
    mk["domain_x"] = tuple(map(tuple, mk["domain_x"]))
    if mk.get("domain_t") is not None:
        mk["domain_t"] = tuple(mk["domain_t"])
    DATASET_METADATA[cases.metaname(case_name)] = Metadata(**mk)

    cfg = cases.build_config(case_name, data_dir, workdir, "ref")

    class _Arg:
        def __init__(self, c):
            for k, v in c.items():
                setattr(self, k, v)
            self.datarow = {}

    from src.trainer.static_trainer import StaticTrainer
    from src.core.trainer_utils import denormalize_data
    from src.utils.metrics import compute_batch_errors

    trainer = StaticTrainer(_Arg(cfg))
    sd = torch.load(ckpt_path, weights_only=True, map_location="cpu")
    sd = sd.get("model", sd)
    trainer.model.load_state_dict(sd, strict=True)
    trainer.model.eval()

    errs = []
    with torch.no_grad():
        for batch in trainer.test_loader:
            if trainer.coord_mode == "fx":
                pred, y, _, _ = trainer._test_step_fixed_coords(batch)
            else:
                pred, y, _, _ = trainer._test_step_variable_coords(batch)
            pred = denormalize_data(pred, trainer.data_processor.u_mean,
                                    trainer.data_processor.u_std)
            y = denormalize_data(y, trainer.data_processor.u_mean,
                                 trainer.data_processor.u_std)
            errs.append(compute_batch_errors(y, pred, trainer.metadata))
    return torch.cat(errs, dim=0).numpy().ravel(), sd


def gaot_per_sample_errors(case_name, workdir, torch_sd):
    """gaot_tpu stack: transplant `torch_sd` and collect per-sample errors."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gaot_jax_cache")

    data_dir = os.path.join(workdir, "data")
    meta_kwargs = cases.ensure_dataset(case_name, data_dir)
    from gaot_tpu.core.metadata import DATASET_METADATA, Metadata

    mk = dict(meta_kwargs)
    mk["domain_x"] = tuple(map(tuple, mk["domain_x"]))
    if mk.get("domain_t") is not None:
        mk["domain_t"] = tuple(mk["domain_t"])
    DATASET_METADATA[cases.metaname(case_name)] = Metadata(**mk)

    cfg = cases.build_config(case_name, data_dir, workdir, "gaot")
    for sub in cfg["path"].values():
        os.makedirs(os.path.dirname(sub), exist_ok=True)

    from gaot_tpu.train import StaticTrainer
    from gaot_tpu.utils.torch_interop import torch_to_flax_params

    trainer = StaticTrainer(cfg)
    sd_np = {k: np.asarray(v) for k, v in torch_sd.items()}
    trainer.params = torch_to_flax_params(sd_np, trainer.params)
    trainer.test()
    errors = trainer.last_test_errors  # [n_test] per-sample rel-L1
    return np.asarray(errors).ravel(), trainer.datarow


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--case", default="static_fx")
    p.add_argument("--workdir", default="/tmp/parity2")
    p.add_argument("--ckpt", default=None)
    args = p.parse_args()

    ckpt = args.ckpt or os.path.join(args.workdir, "ref", args.case,
                                     "ckpt", "model.pt")
    ref_errs, sd = ref_per_sample_errors(args.case, args.workdir, ckpt)

    # gaot side in a subprocess would double the startup; jax+torch coexist
    # fine on CPU, run in-process.
    gaot_errs, datarow = gaot_per_sample_errors(
        args.case, args.workdir, sd)

    def med(v):  # torch lower-middle median
        v = np.sort(v)
        return float(v[(len(v) - 1) // 2])

    out = {
        "case": args.case,
        "ckpt": ckpt,
        "n_test": int(len(ref_errs)),
        "ref_stack": {"median": med(ref_errs), "mean": float(ref_errs.mean())},
        "gaot_stack": {"median": med(gaot_errs),
                       "mean": float(gaot_errs.mean())},
        "per_sample_max_abs_diff": float(np.abs(ref_errs - gaot_errs).max()),
        "ref_errs": [round(float(x), 6) for x in ref_errs],
        "gaot_errs": [round(float(x), 6) for x in gaot_errs],
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(args.workdir, f"cross_eval_{args.case}.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
