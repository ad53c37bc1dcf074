"""Import harness for the PyTorch reference at /root/reference.

The reference depends on omegaconf, rotary-embedding-torch, and
torch_scatter, none of which are installed here. For parity testing we stub
them: omegaconf/rotary are inert placeholders (unused on the tested paths),
and torch_scatter gets small pure-torch implementations of the four ops the
reference uses (segment_csr, scatter_mean/sum/max).
"""
import os
import sys
import types

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "src"))


def install_stubs():
    import torch

    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")

        class OmegaConf:  # placeholder; unused on the model path
            pass

        class DictConfig(dict):
            pass

        om.OmegaConf = OmegaConf
        om.DictConfig = DictConfig
        sys.modules["omegaconf"] = om

    if "rotary_embedding_torch" not in sys.modules:
        rot = types.ModuleType("rotary_embedding_torch")

        class RotaryEmbedding:
            def __init__(self, dim):
                self.dim = dim

        rot.RotaryEmbedding = RotaryEmbedding
        sys.modules["rotary_embedding_torch"] = rot

    if "torch_scatter" not in sys.modules:
        ts = types.ModuleType("torch_scatter")

        def _csr_index(indptr):
            counts = indptr[1:] - indptr[:-1]
            return torch.repeat_interleave(
                torch.arange(len(counts), device=indptr.device), counts), counts

        def segment_csr(src, indptr, reduce="sum"):
            if indptr.ndim == 2:          # batched: [B, Q+1], src [B, E, C]
                index, counts = _csr_index(indptr[0])
                q = indptr.shape[1] - 1
                out = torch.zeros(src.shape[0], q, *src.shape[2:], dtype=src.dtype)
                if reduce in ("sum", "mean"):
                    out.index_add_(1, index, src)
                    if reduce == "mean":
                        shape = [1, q] + [1] * (src.ndim - 2)
                        out = out / counts.clamp(min=1).reshape(shape)
                elif reduce == "max":
                    idx = index.reshape(1, -1, *([1] * (src.ndim - 2))).expand_as(src)
                    out.scatter_reduce_(1, idx, src, reduce="amax", include_self=False)
                return out
            index, counts = _csr_index(indptr)
            q = indptr.shape[0] - 1
            out = torch.zeros(q, *src.shape[1:], dtype=src.dtype)
            if reduce in ("sum", "mean"):
                out.index_add_(0, index, src)
                if reduce == "mean":
                    shape = [q] + [1] * (src.ndim - 1)
                    out = out / counts.clamp(min=1).reshape(shape)
            elif reduce == "max":
                idx = index.reshape(-1, *([1] * (src.ndim - 1))).expand_as(src)
                out.scatter_reduce_(0, idx, src, reduce="amax", include_self=False)
            else:
                raise ValueError(reduce)
            return out

        def scatter_sum(src, index, dim=0, dim_size=None):
            assert dim == 0
            n = dim_size if dim_size is not None else int(index.max()) + 1
            out = torch.zeros(n, *src.shape[1:], dtype=src.dtype)
            out.index_add_(0, index, src)
            return out

        def scatter_mean(src, index, dim=0, dim_size=None):
            out = scatter_sum(src, index, dim, dim_size)
            counts = torch.zeros(out.shape[0], dtype=src.dtype)
            counts.index_add_(0, index, torch.ones(len(index), dtype=src.dtype))
            shape = [out.shape[0]] + [1] * (src.ndim - 1)
            return out / counts.clamp(min=1).reshape(shape)

        def scatter_max(src, index, dim=0, dim_size=None):
            assert dim == 0
            n = dim_size if dim_size is not None else int(index.max()) + 1
            out = torch.zeros(n, *src.shape[1:], dtype=src.dtype)
            idx = index.reshape(-1, *([1] * (src.ndim - 1))).expand_as(src)
            out.scatter_reduce_(0, idx, src, reduce="amax", include_self=False)
            return out, None  # reference unpacks (values, argmax)

        ts.segment_csr = segment_csr
        ts.scatter_sum = scatter_sum
        ts.scatter_mean = scatter_mean
        ts.scatter_max = scatter_max
        # importlib.util.find_spec requires a spec; the reference also does
        # `import torch_scatter.segment_csr as f` and then CALLS it, so the
        # submodule entry must be callable.
        import importlib.machinery

        ts.__spec__ = importlib.machinery.ModuleSpec("torch_scatter", None)

        class _CallableModule(types.ModuleType):
            def __init__(self, name, fn):
                super().__init__(name)
                self._fn = fn

            def __call__(self, *args, **kwargs):
                return self._fn(*args, **kwargs)

        sys.modules["torch_scatter"] = ts
        sys.modules["torch_scatter.segment_csr"] = _CallableModule(
            "torch_scatter.segment_csr", segment_csr)

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)


def build_reference_model(input_size, output_size, latent_tokens_size,
                          magno_kwargs, transformer_kwargs, attn_kwargs):
    """Instantiate the reference GAOT with plain dataclass configs."""
    install_stubs()
    from dataclasses import dataclass

    from src.model.gaot import GAOT as RefGAOT
    from src.model.layers.attn import (
        AttentionConfig as RefAttnConfig,
        TransformerConfig as RefTransformerConfig,
    )
    from src.model.layers.magno import MAGNOConfig as RefMAGNOConfig

    @dataclass
    class Args:
        magno: object
        transformer: object

    @dataclass
    class MC:
        latent_tokens_size: tuple
        args: object

    magno = RefMAGNOConfig(**magno_kwargs)
    transformer = RefTransformerConfig(
        attn_config=RefAttnConfig(**attn_kwargs), **transformer_kwargs)
    cfg = MC(latent_tokens_size=tuple(latent_tokens_size),
             args=Args(magno=magno, transformer=transformer))
    return RefGAOT(input_size=input_size, output_size=output_size, config=cfg)
