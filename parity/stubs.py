"""Functional dependency stubs for running the FULL PyTorch reference
trainer stack (/root/reference) in this environment.

The forward-parity tests (tests/reference_stub.py) stub omegaconf and
rotary-embedding-torch as inert placeholders because the model path never
touches them. Running the reference *trainer* end-to-end additionally needs:

- a working ``OmegaConf.structured/merge/to_object`` (used by the reference
  merge_config, src/core/default_configs.py:15-19) — implemented here as a
  recursive dict-into-dataclass merge with nested dataclass instantiation;
- a working ``xarray.open_dataset`` (used by the data processors,
  src/datasets/data_processor.py:73, sequential_data_processor.py:68) whose
  API surface in the reference is exactly ``ds[name].values`` under a
  context manager — implemented over h5py (NetCDF4 is HDF5 underneath).

These stubs contain no reference code; they re-implement the tiny API
slices of two third-party libraries.
"""
import dataclasses
import os
import sys
import types

_TESTS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests")


def _merge_into_dataclass(cls_or_obj, user):
    """Instantiate a dataclass (tree) from defaults and apply a nested
    mapping of overrides, mirroring OmegaConf.structured+merge+to_object
    semantics for the reference's config dataclasses."""
    if dataclasses.is_dataclass(cls_or_obj) and isinstance(cls_or_obj, type):
        obj = cls_or_obj()
    else:
        obj = cls_or_obj
    if user is None:
        return obj
    if not isinstance(user, dict):
        # Already a dataclass instance (or scalar): passthrough.
        return user
    fields = {f.name: f for f in dataclasses.fields(obj)}
    for key, val in user.items():
        if key not in fields:
            raise KeyError(f"unknown config key {key!r} for {type(obj).__name__}")
        cur = getattr(obj, key)
        if dataclasses.is_dataclass(cur) and isinstance(val, dict):
            setattr(obj, key, _merge_into_dataclass(cur, val))
        else:
            setattr(obj, key, val)
    return obj


def _with_spec(mod):
    """torch._dynamo trace_rules walks installed modules with
    importlib.util.find_spec, which raises on spec-less stub modules."""
    import importlib.machinery

    mod.__spec__ = importlib.machinery.ModuleSpec(mod.__name__, None)
    return mod


def install_omegaconf_stub():
    om = _with_spec(types.ModuleType("omegaconf"))

    class DictConfig(dict):
        pass

    class OmegaConf:
        @staticmethod
        def structured(cls):
            return cls  # deferred; merge() instantiates

        @staticmethod
        def merge(struct, user_config):
            return _merge_into_dataclass(struct, dict(user_config)
                                         if user_config else {})

        @staticmethod
        def to_object(merged):
            if dataclasses.is_dataclass(merged) and isinstance(merged, type):
                return merged()
            return merged

        @staticmethod
        def load(f):
            import json
            return json.load(f)

    om.OmegaConf = OmegaConf
    om.DictConfig = DictConfig
    sys.modules["omegaconf"] = om


def install_xarray_stub():
    xr = _with_spec(types.ModuleType("xarray"))

    class _Var:
        def __init__(self, arr):
            self.values = arr

    class Dataset:
        def __init__(self, path):
            import h5py
            self._f = h5py.File(path, "r")

        def __getitem__(self, name):
            import numpy as np
            return _Var(np.asarray(self._f[name]))

        def __contains__(self, name):
            return name in self._f

        def __enter__(self):
            return self

        def __exit__(self, *a):
            self._f.close()
            return False

    def open_dataset(path):
        return Dataset(path)

    xr.Dataset = Dataset
    xr.open_dataset = open_dataset
    sys.modules["xarray"] = xr


def install_all():
    """Install every stub the full reference trainer stack needs, then put
    /root/reference on sys.path."""
    # Functional omegaconf must go in BEFORE reference_stub's inert one.
    if "omegaconf" not in sys.modules or not hasattr(
            sys.modules["omegaconf"].OmegaConf, "merge"):
        install_omegaconf_stub()
    if "xarray" not in sys.modules:
        install_xarray_stub()
    if _TESTS_DIR not in sys.path:
        sys.path.insert(0, _TESTS_DIR)
    import reference_stub
    reference_stub.install_stubs()  # torch_scatter, rotary, sys.path
    return reference_stub
