"""Weight interop with the PyTorch reference implementation.

Maps a gaot_tpu Flax param tree to/from the reference GAOT
``model.state_dict()`` (camlab-ethz/GAOT, src/model/gaot.py), so users can
migrate trained reference checkpoints (``.pt``, saved by
src/core/trainer_utils.py:23-48 as ``{"model": state_dict}``) into gaot_tpu
and back. Covered surface — everything the reference main path trains:

- MAGNO encoder/decoder: AGNO kernel MLP (all transform types), dot-product
  attention projections, lifting/projection ChannelMLPs, statistical and
  pointnet geometric embeddings + recovery, learned multiscale weights;
- ``patch_linear`` and the UViT processor (input/output proj, per-block
  RMSNorms, GQA projections, SwiGLU FFN, decoder skip projections,
  time-conditional norm corrections).

Both directions are STRICT: params the mapping does not cover (e.g. a
config knob this table misses) raise with the offending paths listed, so a
silent partial import is impossible.

Transforms per entry kind:
- linear:  torch ``weight [out, in]`` = flax ``kernel [in, out]``.T
- conv1d:  torch ``weight [out, in, 1]`` (reference ChannelMLP uses 1x1
  Conv1d, src/model/layers/mlp.py:272-281) = flax ``kernel``.T[..., None]
- norm:    torch ``weight`` = flax ``weight`` (RMSNorm)
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

Entry = Tuple[Tuple[str, ...], str, str]  # (flax path, torch prefix, kind)


def _dense_ids(subtree: dict, stem: str = "dense_") -> List[int]:
    return sorted(int(k.split("_")[1]) for k in subtree if k.startswith(stem))


def mapping_entries(params) -> List[Entry]:
    """The (flax path, torch name prefix, kind) table for this param tree."""
    p = params.get("params", params)
    ents: List[Entry] = []

    def magno(side: str, final_name: str):
        sub = p[side]
        for i in _dense_ids(sub["agno"]["channel_mlp"]):
            ents.append(((side, "agno", "channel_mlp", f"dense_{i}"),
                         f"{side}.agno.channel_mlp.fcs.{i}", "linear"))
        for proj in ("query_proj", "key_proj"):   # dot-product attention
            if proj in sub["agno"]:
                ents.append(((side, "agno", proj),
                             f"{side}.agno.{proj}", "linear"))
        for i in _dense_ids(sub[final_name]):
            ents.append(((side, final_name, f"dense_{i}"),
                         f"{side}.{final_name}.fcs.{i}", "conv1d"))
        if "geoembed" in sub:
            g = sub["geoembed"]
            if "stat_dense0" in g:
                ents.append(((side, "geoembed", "stat_dense0"),
                             f"{side}.geoembed.mlp.0", "linear"))
                ents.append(((side, "geoembed", "stat_dense1"),
                             f"{side}.geoembed.mlp.2", "linear"))
            else:                                  # pointnet
                ents.append(((side, "geoembed", "pointnet_mlp", "dense_0"),
                             f"{side}.geoembed.pointnet_mlp.0", "linear"))
                ents.append(((side, "geoembed", "pointnet_mlp", "dense_1"),
                             f"{side}.geoembed.pointnet_mlp.2", "linear"))
                ents.append(((side, "geoembed", "fc"),
                             f"{side}.geoembed.fc.0", "linear"))
            for i in _dense_ids(sub["recovery"]):
                ents.append(((side, "recovery", f"dense_{i}"),
                             f"{side}.recovery.fcs.{i}", "conv1d"))
        if "scale_weighting" in sub:
            # reference nn.Sequential(Linear, ReLU, Linear) → indices 0, 2
            ents.append(((side, "scale_weighting", "fc0"),
                         f"{side}.scale_weighting.0", "linear"))
            ents.append(((side, "scale_weighting", "fc1"),
                         f"{side}.scale_weighting.2", "linear"))

    magno("encoder", "lifting")
    magno("decoder", "projection")
    ents.append((("patch_linear",), "patch_linear", "linear"))

    proc = p["processor"]
    if "input_proj" in proc:
        ents.append((("processor", "input_proj"),
                     "processor.input_proj", "linear"))
    if "output_proj" in proc:
        ents.append((("processor", "output_proj"),
                     "processor.output_proj", "linear"))

    def block(flax_name: str, torch_name: str, skip: bool):
        b = proc[flax_name]
        base = ("processor", flax_name)
        for norm in ("attn_norm", "ffn_norm"):
            if norm in b:
                ents.append((base + (norm,),
                             f"processor.{torch_name}.{norm}", "norm"))
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            ents.append((base + ("attn", proj),
                         f"processor.{torch_name}.attn.{proj}", "linear"))
        for w in ("w1", "w2", "w3"):
            ents.append((base + ("ffn", w),
                         f"processor.{torch_name}.ffn.{w}", "linear"))
        for mod in ("attn", "ffn"):           # time-conditional norm
            if "correction" in b.get(mod, {}):
                for m in ("mlp_scale", "mlp_bias"):
                    # reference MLP(num_layers=2) is a single Linear in a
                    # ModuleList (mlp.py:49-52) → '<m>.layers.0'
                    ents.append(
                        (base + (mod, "correction", m, "Dense_0"),
                         f"processor.{torch_name}.{mod}.correction.{m}"
                         f".layers.0", "linear"))
        if skip and "skip_proj" in b:
            ents.append((base + ("skip_proj",),
                         f"processor.{torch_name}.skip_proj", "linear"))

    for i in _dense_ids(proc, "encoder_"):
        block(f"encoder_{i}", f"encoder_layers.{i}", skip=False)
    if "middle" in proc:
        block("middle", "middle_layer", skip=False)
    for i in _dense_ids(proc, "decoder_"):
        block(f"decoder_{i}", f"decoder_layers.{i}", skip=True)
    return ents


def _get(p: dict, path: Tuple[str, ...]) -> dict:
    for k in path:
        p = p[k]
    return p


def _leaf_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaf_paths(v, prefix + (k,))
    else:
        yield prefix


def _check_coverage(p: dict, ents: List[Entry]) -> None:
    covered = set()
    for path, _, kind in ents:
        sub = _get(p, path)
        names = ("weight",) if kind == "norm" else tuple(sub.keys())
        for n in names:
            covered.add(path + (n,))
    missing = ["/".join(q) for q in _leaf_paths(p) if q not in covered]
    if missing:
        raise ValueError(
            "params not covered by the torch mapping (model config uses "
            f"features outside the interop surface): {missing}")


def flax_to_torch_state_dict(params) -> Dict[str, np.ndarray]:
    """Flax params → reference torch state dict (NumPy values)."""
    p = params.get("params", params)
    ents = mapping_entries(params)
    _check_coverage(p, ents)
    sd: Dict[str, np.ndarray] = {}
    for path, name, kind in ents:
        sub = _get(p, path)
        if kind == "norm":
            sd[f"{name}.weight"] = np.asarray(sub["weight"]).copy()
            continue
        w = np.asarray(sub["kernel"]).T.copy()
        sd[f"{name}.weight"] = w[..., None] if kind == "conv1d" else w
        if "bias" in sub:
            sd[f"{name}.bias"] = np.asarray(sub["bias"]).copy()
    return sd


def torch_to_flax_params(state_dict: Dict, params_template):
    """Reference torch state dict → Flax params shaped like the template.

    ``state_dict`` values may be torch tensors or NumPy arrays; a
    ``module.`` DataParallel prefix is stripped (reference
    src/core/trainer_utils.py:78-89). Unused state-dict keys and uncovered
    template params both raise.
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if ".rotary_emb." in k:
            # rotary-embedding-torch registers its deterministic inverse
            # frequencies as a parameter (reference attn.py:75-76); gaot_tpu
            # computes RoPE closed-form, so these carry no trained state.
            continue
        sd[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                           else v)

    import jax.numpy as jnp

    p = params_template.get("params", params_template)
    ents = mapping_entries(params_template)
    _check_coverage(p, ents)
    expected = []
    for path, name, kind in ents:
        sub = _get(p, path)
        expected.append(f"{name}.weight")
        if kind != "norm" and "bias" in sub:
            expected.append(f"{name}.bias")
    absent = [k for k in expected if k not in sd]
    if absent:
        raise ValueError(
            "checkpoint is missing keys the model config requires (config/"
            f"checkpoint mismatch): {absent}")

    out: dict = {}
    used = set()

    def put(path, key, value, like):
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        if value.shape != like.shape:
            raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                             f"ckpt {value.shape} vs model {like.shape}")
        node[path[-1]] = jnp.asarray(value, dtype=like.dtype)
        used.add(key)

    for path, name, kind in ents:
        sub = _get(p, path)
        if kind == "norm":
            put(path + ("weight",), f"{name}.weight",
                sd[f"{name}.weight"], sub["weight"])
            continue
        w = sd[f"{name}.weight"]
        if kind == "conv1d":
            w = w[..., 0]
        put(path + ("kernel",), f"{name}.weight", w.T, sub["kernel"])
        if "bias" in sub:
            put(path + ("bias",), f"{name}.bias", sd[f"{name}.bias"],
                sub["bias"])

    leftover = [k for k in sd if k not in used]
    if leftover:
        raise ValueError(f"checkpoint keys not consumed by the mapping: "
                         f"{sorted(leftover)}")
    return {"params": out} if "params" in params_template else out
