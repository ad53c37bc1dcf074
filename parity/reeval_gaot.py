#!/usr/bin/env python
"""Re-evaluate a finished gaot-side parity run's checkpoint with the current
test() (e.g. after the static-metric pooling fix) and update the cached
gaot_<case>.json in place — avoids retraining when only evaluation changed.

Usage: python parity/reeval_gaot.py --case static_fx --workdir /tmp/parity2
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parity import cases  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--case", required=True, choices=sorted(cases.CASES))
    p.add_argument("--workdir", required=True)
    args = p.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gaot_jax_cache")

    data_dir = os.path.join(args.workdir, "data")
    meta_kwargs = cases.ensure_dataset(args.case, data_dir)

    from gaot_tpu.core.metadata import DATASET_METADATA, Metadata

    mk = dict(meta_kwargs)
    mk["domain_x"] = tuple(map(tuple, mk["domain_x"]))
    if mk.get("domain_t") is not None:
        mk["domain_t"] = tuple(mk["domain_t"])
    DATASET_METADATA[cases.metaname(args.case)] = Metadata(**mk)

    cfg = cases.build_config(args.case, data_dir, args.workdir, "gaot")

    from gaot_tpu.train import SequentialTrainer, StaticTrainer

    trainer_cls = {"static": StaticTrainer,
                   "sequential": SequentialTrainer}[cfg["setup"]["trainer_name"]]
    trainer = trainer_cls(cfg)
    trainer.load_ckpt()
    trainer.test()

    out = os.path.join(args.workdir, f"gaot_{args.case}.json")
    with open(out) as f:
        result = json.load(f)
    result["metrics"] = {k: float(v) for k, v in trainer.datarow.items()
                         if k.startswith("relative error") and v == v}
    result["reevaluated"] = True
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print("PARITY_REEVAL " + json.dumps(result))


if __name__ == "__main__":
    main()
