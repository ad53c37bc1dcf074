#!/usr/bin/env python
"""Run the gaot_tpu trainer on a parity case and print final metrics as one
JSON line; also saves the initial weights as a torch state dict so the
reference run (run_reference.py --init) starts from IDENTICAL parameters.

Usage: python parity/run_gaot.py --case static_fx --workdir /tmp/parity
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parity import cases  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--case", required=True, choices=sorted(cases.CASES))
    p.add_argument("--workdir", required=True)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "auto"])
    p.add_argument("--perturb-scale", type=float, default=0.0,
                   help="perturb every float param leaf by "
                        "scale*std(leaf)*N(0,1) before training (noise-floor "
                        "study, see parity/perturb_study.py)")
    p.add_argument("--perturb-seed", type=int, default=0)
    args = p.parse_args()

    if args.platform != "auto":
        os.environ["JAX_PLATFORMS"] = args.platform
        # The container's axon sitecustomize pins jax_platforms to the TPU
        # tunnel regardless of the env var (see __graft_entry__); force the
        # explicit config before any backend initializes, else parity runs
        # block on the single-tenant chip.
        import jax

        jax.config.update("jax_platforms", args.platform)
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
    if args.epochs is not None:
        cfg["optimizer"]["args"]["epoch"] = args.epochs
    for sub in cfg["path"].values():
        os.makedirs(os.path.dirname(sub), exist_ok=True)

    from gaot_tpu.train import SequentialTrainer, StaticTrainer

    trainer_cls = {"static": StaticTrainer,
                   "sequential": SequentialTrainer}[cfg["setup"]["trainer_name"]]
    t0 = time.perf_counter()
    trainer = trainer_cls(cfg)
    setup_time = time.perf_counter() - t0

    if args.perturb_scale:
        # Noise-floor variant: nudge the (seeded, hence reproducible) init by
        # eps ~ the measured cross-framework forward difference and let the
        # otherwise-unmodified trainer amplify it. opt_state (AdamW zeros) is
        # value-independent, so perturbing after construction is exact.
        import jax
        import jax.numpy as jnp
        import numpy as np

        rng = np.random.default_rng(args.perturb_seed)

        def _nudge(w):
            a = np.asarray(w)
            if a.dtype.kind != "f":
                return w
            # std==0 (incl. size-1 leaves) falls back to abs-max then 1.0 so
            # EVERY float leaf is perturbed, matching the --perturb-scale help.
            std = float(a.std()) or float(np.abs(a).max()) or 1.0
            noise = args.perturb_scale * std * rng.standard_normal(a.shape)
            # Add in float32+ so a sub-ulp nudge on low-precision params does
            # not silently round back to the original values.
            out = (a.astype(np.float64) + noise).astype(a.dtype)
            if np.array_equal(out, a):
                print(f"WARNING: perturbation below ulp for a leaf of shape "
                      f"{a.shape} dtype {a.dtype}; run is effectively det")
            out = jnp.asarray(out)
            if isinstance(w, jax.Array):
                out = jax.device_put(out, w.sharding)
            return out

        trainer.params = jax.tree.map(_nudge, trainer.params)
        print(f"perturbed init: scale={args.perturb_scale} "
              f"seed={args.perturb_seed}")

    # Save transplantable init weights for the reference run.
    init_path = os.path.join(args.workdir, f"init_{args.case}.pt")
    import torch

    from gaot_tpu.utils.torch_interop import flax_to_torch_state_dict

    torch.save({k: torch.tensor(v) for k, v in
                flax_to_torch_state_dict(trainer.params).items()}, init_path)
    print(f"saved init weights to {init_path}")

    t0 = time.perf_counter()
    trainer.fit(verbose=True)
    fit_time = time.perf_counter() - t0

    result = {
        "side": "gaot_tpu", "case": args.case,
        "platform": args.platform,
        "perturb_scale": args.perturb_scale,
        "perturb_seed": args.perturb_seed,
        "epochs": cfg["optimizer"]["args"]["epoch"],
        "setup_time_s": round(setup_time, 2),
        "fit_time_s": round(fit_time, 2),
        "metrics": {k: float(v) for k, v in trainer.datarow.items()
                    if k.startswith("relative error") and v == v},
    }
    print("PARITY_RESULT " + json.dumps(result))
    with open(os.path.join(args.workdir, f"gaot_{args.case}.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
