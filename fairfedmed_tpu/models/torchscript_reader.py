"""Pure-numpy reader for torch checkpoint archives — no torch required.

The public OpenAI CLIP checkpoints are TorchScript archives: a zip whose
``<root>/data.pkl`` is a standard protocol-2 pickle emitted by the C++
pickler.  Module objects are pickled as ``__torch__.*`` classes built with
NEWOBJ and BUILD(dict-of-attributes); tensors are
``torch._utils._rebuild_tensor_v2(storage, offset, size, stride, ...)``
calls whose storages are persistent IDs ``('storage', <TypedStorage>, key,
location, numel)`` resolving to the raw little-endian bytes in
``<root>/data/<key>``.  Plain ``torch.save`` checkpoints (the zip format)
use the same tensor encoding with a dict at the root.  Both therefore
unpickle with a restricted ``pickle.Unpickler`` whose ``find_class``
substitutes numpy rebuilds — which is what this module does.

Replaces the reference's torch-side deserialization
(``trainers/GLP_OT_SVLoRA.py:23-43``: ``torch.jit.load`` with a
``torch.load`` fallback) so a TPU VM without torch can still ingest the
real checkpoints.  ``tests/test_converter.py`` pins this reader against a
``torch.jit.save``-written synthetic archive with torch's own loader as the
oracle.
"""

from __future__ import annotations

import collections
import pickle
import zipfile

import numpy as np


def _bfloat16_dtype():
    import ml_dtypes  # ships with jax

    return np.dtype(ml_dtypes.bfloat16)


# torch legacy TypedStorage names -> numpy dtypes (all archives are written
# little-endian; <root>/byteorder says so explicitly in torch >= 2.1)
_STORAGE_DTYPES = {
    "DoubleStorage": np.dtype("<f8"),
    "FloatStorage": np.dtype("<f4"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
    "ComplexFloatStorage": np.dtype("<c8"),
    "ComplexDoubleStorage": np.dtype("<c16"),
}


class _StorageType:
    """Marker returned by find_class for ``torch.XStorage`` globals; carries
    the element dtype to persistent_load."""

    def __init__(self, dtype: np.dtype):
        self.dtype = dtype


class _ScriptObject:
    """Generic stand-in for any ``__torch__.*`` TorchScript class: NEWOBJ
    with no args, then BUILD updates ``__dict__`` (pickle's default when no
    ``__setstate__`` exists), preserving attribute order = archive order."""


_script_classes: dict = {}


def _script_class(module: str, name: str):
    key = (module, name)
    if key not in _script_classes:
        _script_classes[key] = type(name, (_ScriptObject,), {"__module__": module})
    return _script_classes[key]


def _rebuild_tensor_v2(storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None):
    """numpy re-implementation of ``torch._utils._rebuild_tensor_v2``:
    materialize the (possibly strided, possibly overlapping) view as an
    owned contiguous array."""
    itemsize = storage.dtype.itemsize
    base = storage[storage_offset:]
    arr = np.lib.stride_tricks.as_strided(
        base, shape=tuple(size), strides=tuple(s * itemsize for s in stride))
    return np.ascontiguousarray(arr)


def _rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


class _TorchUnpickler(pickle.Unpickler):
    """Restricted unpickler: only tensor rebuilds, storages, OrderedDict and
    opaque ``__torch__`` script classes resolve; anything else raises."""

    def __init__(self, file, read_record):
        super().__init__(file)
        self._read_record = read_record
        self._storages: dict = {}

    def find_class(self, module, name):
        if module == "torch._utils":
            if name == "_rebuild_tensor_v2":
                return _rebuild_tensor_v2
            if name == "_rebuild_tensor":  # pre-1.3 layout: v2 minus extras
                return _rebuild_tensor_v2
            if name == "_rebuild_parameter":
                return _rebuild_parameter
        # data-only numpy/stdlib globals that ordinary torch.save checkpoints
        # carry alongside tensors (np scalars like best_acc, saved argparse
        # namespaces); the caller filters non-ndarray values afterwards
        if module in ("numpy._core.multiarray", "numpy.core.multiarray") \
                and name in ("scalar", "_reconstruct"):
            try:  # numpy >= 2 spelling; fall back on numpy 1.x hosts
                import numpy._core.multiarray as _ma
            except ImportError:
                import numpy.core.multiarray as _ma
            return getattr(_ma, name)
        if module == "numpy" and name in ("dtype", "ndarray"):
            return getattr(np, name)
        if module == "argparse" and name == "Namespace":
            import argparse
            return argparse.Namespace
        if module == "_codecs" and name == "encode":
            import codecs  # numpy scalar pickles route bytes through this
            return codecs.encode
        if module == "torch":
            if name in _STORAGE_DTYPES:
                return _StorageType(_STORAGE_DTYPES[name])
            if name == "BFloat16Storage":
                return _StorageType(_bfloat16_dtype())
        if module == "collections" and name == "OrderedDict":
            return collections.OrderedDict
        if module == "torch.jit._pickle" and name == "build_tensor_from_id":
            # constants.pkl indirection; state_dict extraction never needs it
            return lambda *a: None
        if module.startswith("__torch__"):
            return _script_class(module, name)
        raise pickle.UnpicklingError(
            f"disallowed global in checkpoint pickle: {module}.{name}")

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id: {pid!r}")
        storage_type, key = pid[1], pid[2]
        if key not in self._storages:
            raw = self._read_record(str(key))
            self._storages[key] = np.frombuffer(raw, storage_type.dtype)
        return self._storages[key]


def _collect_state(obj, prefix: str, out: dict) -> None:
    """Walk a TorchScript module object tree depth-first, collecting tensor
    attributes under their dotted names — reproduces
    ``torch.jit.load(path).state_dict()`` keys (parameters AND buffers, in
    attribute order)."""
    for k, v in vars(obj).items():
        if isinstance(v, np.ndarray):
            out[prefix + k] = v
        elif isinstance(v, _ScriptObject):
            _collect_state(v, prefix + k + ".", out)


def load_state_dict(path: str) -> dict:
    """Read a TorchScript archive or a zip-format ``torch.save`` checkpoint
    into a flat ``{dotted_name: np.ndarray}`` dict, torch-free.

    Mirrors the reference's two-stage loader (``torch.jit.load`` falling
    back to ``torch.load``, trainers/GLP_OT_SVLoRA.py:23-43).
    """
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl = [n for n in names if n.endswith("/data.pkl") or n == "data.pkl"]
        if not pkl:
            raise ValueError(f"{path}: no data.pkl in archive")
        pkl_name = min(pkl, key=len)  # the root archive's, not a nested one
        root = pkl_name[: -len("data.pkl")]

        byteorder = root + "byteorder"
        if byteorder in names and zf.read(byteorder).strip() != b"little":
            raise ValueError(f"{path}: big-endian checkpoint not supported")

        def read_record(key: str) -> bytes:
            return zf.read(f"{root}data/{key}")

        with zf.open(pkl_name) as f:
            obj = _TorchUnpickler(f, read_record).load()

    if isinstance(obj, dict):
        # plain torch.save zip: already {name: tensor} (or a wrapper dict
        # holding one, e.g. {'state_dict': {...}})
        if "state_dict" in obj and isinstance(obj["state_dict"], dict):
            obj = obj["state_dict"]
        return {k: v for k, v in obj.items() if isinstance(v, np.ndarray)}
    state: dict = {}
    _collect_state(obj, "", state)
    return state
