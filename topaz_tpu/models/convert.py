"""Convert reference PyTorch checkpoints (.sav) to topaz_tpu parameter trees.

Handles both bare state dicts (the bundled pretrained weights,
topaz/pretrained/) and whole pickled nn.Modules (per-epoch checkpoints
written by topaz/training.py:596-603 and topaz/denoising/models.py:628-633).
torch is only imported here — the runtime loads converted .npz checkpoints
without it.

Layout conversion: torch conv weights are OIHW (OIDHW for 3D); ours are
HWIO (DHWIO) channels-last for TPU-friendly convolutions.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional, Tuple

import numpy as np


def _to_hwio(w: np.ndarray) -> np.ndarray:
    """OI<spatial> -> <spatial>IO."""
    nd = w.ndim
    perm = tuple(range(2, nd)) + (1, 0)
    return np.ascontiguousarray(np.transpose(w, perm))


def _load_torch(path_or_file):
    import torch

    obj = torch.load(path_or_file, map_location="cpu", weights_only=False)
    return obj


# -- torch-free .sav reader -------------------------------------------------
#
# A torch checkpoint is either a zip archive (torch >= 1.6: data.pkl +
# data/<key> raw storages) or the legacy sequential stream (magic pickle,
# protocol pickle, sys_info pickle, main pickle with persistent storage ids,
# pickled key list, then int64-size-prefixed raw storage blobs). Both carry
# tensors as pickled rebuild calls over raw little-endian storages, so a
# restricted unpickler + a storage decoder covers them without torch
# (SURVEY section 7.1 commitment; reference load sites
# topaz/model/factory.py:54-56, topaz/denoising/models.py:608-610).
# Unknown classes (torch.nn.*, topaz.*) unpickle as inert stubs that mimic
# just enough of nn.Module (attribute lookup through _modules/_parameters/
# _buffers, Sequential iteration, state_dict) for the converters above.

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("?"),
    "BFloat16Storage": np.dtype("<u2"),  # decoded to f32 on materialize
}


class _StorageRef:
    """Placeholder for a torch storage; raw bytes attach after unpickling
    (legacy) or on registration (zip)."""

    def __init__(self, dtype_name: str):
        self.dtype_name = dtype_name
        self.array = None  # 1-D numpy array once data is attached

    def attach(self, raw: bytes):
        dt = _STORAGE_DTYPES[self.dtype_name]
        arr = np.frombuffer(raw, dtype=dt)
        if self.dtype_name == "BFloat16Storage":
            arr = (arr.astype(np.uint32) << 16).view(np.float32)
        self.array = arr


class _StorageView:
    """Legacy-format storage view: (root storage, element offset, numel)."""

    def __init__(self, root: _StorageRef, offset: int, numel: int):
        self.root, self.offset, self.numel = root, offset, numel

    @property
    def array(self):
        return self.root.array[self.offset : self.offset + self.numel]


class _LazyTensor:
    """Deferred tensor: materializes from its storage after the raw blobs
    are available (legacy storages follow the pickle in the stream)."""

    def __init__(self, storage, offset, size, stride):
        self.storage, self.offset = storage, offset
        self.size, self.stride = tuple(size), tuple(stride)

    def materialize(self) -> np.ndarray:
        arr = self.storage.array
        if arr is None:
            raise ValueError("storage data missing for tensor")
        if not self.size:
            return arr[self.offset : self.offset + 1].reshape(()).copy()
        strides = tuple(s * arr.itemsize for s in self.stride)
        out = np.lib.stride_tricks.as_strided(
            arr[self.offset :], shape=self.size, strides=strides)
        return np.ascontiguousarray(out)


def _rebuild_tensor_v2(storage, offset, size, stride, *_args):
    return _LazyTensor(storage, offset, size, stride)


def _rebuild_tensor(storage, offset, size, stride):
    return _LazyTensor(storage, offset, size, stride)


def _rebuild_parameter(data, *_args):
    return data


class _TorchStub:
    """Inert stand-in for an unpicklable class (nn.Module subclasses and
    friends). Captures __dict__ and emulates the few nn.Module behaviors
    the converters use."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif isinstance(state, (tuple, list)):
            for part in state:
                if isinstance(part, dict):
                    self.__dict__.update(part)

    def __getattr__(self, name):
        for container in ("_parameters", "_buffers", "_modules"):
            d = self.__dict__.get(container)
            if d is not None and name in d:
                return d[name]
        raise AttributeError(name)

    def __iter__(self):  # nn.Sequential iteration
        return iter(self.__dict__.get("_modules", {}).values())

    def __len__(self):
        return len(self.__dict__.get("_modules", {}))

    def state_dict(self):
        out = {}

        def walk(mod, prefix):
            d = mod.__dict__ if isinstance(mod, _TorchStub) else {}
            for k, v in (d.get("_parameters") or {}).items():
                if v is not None:
                    out[prefix + k] = v
            for k, v in (d.get("_buffers") or {}).items():
                if v is not None:
                    out[prefix + k] = v
            for k, sub in (d.get("_modules") or {}).items():
                if sub is not None:
                    walk(sub, prefix + k + ".")

        walk(self, "")
        return out


def _restricted_unpickler(fh, persistent_load, stub_cache):
    import pickle
    from collections import OrderedDict

    safe = {
        ("collections", "OrderedDict"): OrderedDict,
        ("builtins", "set"): set,
        ("builtins", "frozenset"): frozenset,
        ("__builtin__", "set"): set,
        ("__builtin__", "frozenset"): frozenset,
        ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
        ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
        ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
        ("torch._utils", "_rebuild_parameter_with_state"): _rebuild_parameter,
        ("torch", "Size"): tuple,
        ("torch.serialization", "_get_layout"): lambda name: name,
        ("numpy", "ndarray"): np.ndarray,
        ("numpy", "dtype"): np.dtype,
    }
    np_multiarray = getattr(np, "_core", getattr(np, "core", np)).multiarray
    for np_mod in ("numpy.core.multiarray", "numpy._core.multiarray"):
        safe[(np_mod, "_reconstruct")] = np_multiarray._reconstruct
        safe[(np_mod, "scalar")] = np_multiarray.scalar

    class Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if (module, name) in safe:
                return safe[(module, name)]
            if module == "torch" and name in _STORAGE_DTYPES:
                return stub_cache.setdefault(
                    ("storage", name),
                    type(name, (), {"_dtype_name": name}))
            # torch/topaz/torchvision classes become inert stubs whose
            # class NAME is preserved (infer_picker_config reads it)
            root = module.split(".")[0]
            if root in ("torch", "topaz", "torchvision"):
                return stub_cache.setdefault(
                    (module, name),
                    type(name, (_TorchStub,), {"_source": f"{module}.{name}"}))
            raise pickle.UnpicklingError(
                f"torch-free .sav reader: refusing to unpickle "
                f"{module}.{name}")

    up = Unpickler(fh)
    up.persistent_load = persistent_load
    return up


def _materialize(obj, memo=None):
    """Walk the unpickled object graph replacing _LazyTensor with arrays."""
    if memo is None:
        memo = {}
    oid = id(obj)
    if oid in memo:
        return memo[oid]
    if isinstance(obj, _LazyTensor):
        out = obj.materialize()
        memo[oid] = out
        return out
    if isinstance(obj, dict):
        memo[oid] = obj
        for k in list(obj):
            obj[k] = _materialize(obj[k], memo)
        return obj
    if isinstance(obj, list):
        memo[oid] = obj
        for i in range(len(obj)):
            obj[i] = _materialize(obj[i], memo)
        return obj
    if isinstance(obj, tuple):
        out = tuple(_materialize(v, memo) for v in obj)
        memo[oid] = out
        return out
    if isinstance(obj, _TorchStub):
        memo[oid] = obj
        obj.__dict__.update(
            {k: _materialize(v, memo) for k, v in obj.__dict__.items()})
        return obj
    return obj


def _load_sav_zip(path_or_file):
    import zipfile

    stub_cache: Dict = {}
    with zipfile.ZipFile(path_or_file) as zf:
        names = zf.namelist()
        pkl_name, = [n for n in names if n.endswith("/data.pkl")
                     or n == "data.pkl"]
        prefix = pkl_name[: -len("data.pkl")]
        storages: Dict[str, _StorageRef] = {}

        def persistent_load(pid):
            if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
                raise ValueError(f"unknown persistent id {pid!r}")
            storage_type, key, _location, _numel = pid[1:5]
            if key not in storages:
                ref = _StorageRef(storage_type._dtype_name)
                ref.attach(zf.read(f"{prefix}data/{key}"))
                storages[key] = ref
            return storages[key]

        import io

        with zf.open(pkl_name) as raw:
            up = _restricted_unpickler(io.BytesIO(raw.read()),
                                       persistent_load, stub_cache)
            obj = up.load()
    return _materialize(obj)


def _load_sav_legacy(fh):
    import struct

    stub_cache: Dict = {}
    storages: Dict[str, _StorageRef] = {}

    def persistent_load(pid):
        if isinstance(pid, tuple) and pid and pid[0] == "module":
            # legacy whole-module pickles carry ('module', class,
            # source_file, source) ids; torch returns the class — here
            # that is already our stub class from find_class
            return pid[1]
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise ValueError(f"unknown persistent id {pid!r}")
        storage_type, root_key, _location, numel = pid[1:5]
        view_metadata = pid[5] if len(pid) > 5 else None
        if root_key not in storages:
            storages[root_key] = _StorageRef(storage_type._dtype_name)
        root = storages[root_key]
        if view_metadata:
            _view_key, offset, view_numel = view_metadata[:3]
            return _StorageView(root, offset, view_numel)
        return root

    def _load():
        return _restricted_unpickler(fh, persistent_load, stub_cache).load()

    # the preamble pickles (magic, protocol, sys_info — builtins only) go
    # through the restricted unpickler too: a plain pickle.load here would
    # let a crafted non-zip .sav execute arbitrary GLOBAL+REDUCE payloads
    # before the guard ever sees the main pickle
    magic = _load()
    if magic != 0x1950A86A20F9469CFC6C:
        raise ValueError("not a torch legacy checkpoint (bad magic)")
    _load()  # protocol version
    _load()  # sys_info

    obj = _load()
    keys = _load()
    for key in keys:
        (numel,) = struct.unpack("<q", fh.read(8))
        ref = storages[key]
        itemsize = _STORAGE_DTYPES[ref.dtype_name].itemsize
        ref.attach(fh.read(numel * itemsize))
    return _materialize(obj)


def load_sav(path_or_file):
    """Load a reference ``.sav`` checkpoint WITHOUT torch (state dicts and
    whole pickled nn.Modules, zip and legacy formats). Falls back to
    ``torch.load`` for pickles the restricted reader refuses, so exotic
    checkpoints still work where torch is installed."""
    import zipfile

    pos = path_or_file.tell() if hasattr(path_or_file, "read") else None
    try:
        if pos is not None:
            is_zip = zipfile.is_zipfile(path_or_file)
            path_or_file.seek(pos)
            if is_zip:
                return _load_sav_zip(path_or_file)
            return _load_sav_legacy(path_or_file)
        if zipfile.is_zipfile(path_or_file):
            return _load_sav_zip(path_or_file)
        with open(path_or_file, "rb") as fh:
            return _load_sav_legacy(fh)
    except Exception as e:  # noqa: BLE001 - fall back to torch if present
        try:
            import torch  # noqa: F401
        except ImportError:
            raise RuntimeError(
                f"torch-free .sav reader failed ({e!r}) and torch is not "
                f"installed to fall back to") from e
        import warnings

        warnings.warn(f"torch-free .sav reader failed ({e!r}); "
                      f"falling back to torch.load")
        if pos is not None:
            # rewind to where the handle stood on entry, not to byte 0 —
            # the checkpoint may start mid-file
            path_or_file.seek(pos)
        return _load_torch(path_or_file)


def _state_dict_of(obj) -> Dict[str, np.ndarray]:
    if hasattr(obj, "state_dict"):
        sd = obj.state_dict()
    else:
        sd = obj
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            for k, v in sd.items()}


def params_tree_from_state_dict(sd: Dict[str, np.ndarray],
                                allow_bn: bool = False) -> Dict:
    """Generic torch state dict -> nested param tree (weights to HWIO).

    1-D 'weight' entries are batch-norm scales; modules whose apply paths
    do not implement batchnorm must reject them (``allow_bn=False``)
    rather than silently loading-and-ignoring them."""
    params: Dict = {}
    for key, val in sd.items():
        parts = key.split(".")
        leaf = parts[-1]
        if leaf not in ("weight", "bias"):
            continue
        val = np.asarray(val)
        if leaf == "weight" and val.ndim == 1 and not allow_bn:
            raise ValueError(
                f"state dict entry {key!r} looks like batch-norm, which "
                f"this module's apply path does not implement; conversion "
                f"would silently drop the normalization")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if leaf == "weight" and val.ndim > 1:
            node["w"] = _to_hwio(val)
        elif leaf == "weight":
            node["scale"] = val
        else:
            node["b"] = val
    return params


def picker_params_from_state_dict(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """Map a LinearClassifier state dict to (params, state) pytrees.

    Reference key layout (topaz/model/classifier.py + features/*):
      features.features.{i}.conv.{weight,bias}         BasicConv
      features.features.{i}.{conv0,conv1,proj}.*       ResidA
      features.features.{i}.bn{,0,1}.{weight,bias,running_mean,running_var}
      classifier.{weight,bias}                         1x1 head
    """
    feat_params: Dict[str, Dict] = {}
    feat_state: Dict[str, Dict] = {}
    params: Dict = {"features": feat_params}
    state: Dict = {"features": feat_state}

    pat = re.compile(r"^features\.features\.(\d+)\.(.+)$")
    for key, val in sd.items():
        if key == "classifier.weight":
            params["classifier"] = params.get("classifier", {})
            params["classifier"]["w"] = _to_hwio(val)
            continue
        if key == "classifier.bias":
            params["classifier"] = params.get("classifier", {})
            params["classifier"]["b"] = val
            continue
        m = pat.match(key)
        if m is None:
            continue
        idx, rest = m.group(1), m.group(2)
        lp = feat_params.setdefault(idx, {})
        ls = feat_state.setdefault(idx, {})
        sub, _, leaf = rest.partition(".")
        if sub == "conv" and leaf == "weight":
            lp["conv_w"] = _to_hwio(val)
        elif sub == "conv" and leaf == "bias":
            lp["conv_b"] = val
        elif sub in ("conv0", "conv1", "proj") and leaf == "weight":
            lp[{"conv0": "conv0_w", "conv1": "conv1_w", "proj": "proj_w"}[sub]] = _to_hwio(val)
        elif sub in ("conv0", "conv1") and leaf == "bias":
            lp[f"{sub}_b"] = val
        elif sub.startswith("bn"):
            if leaf == "weight":
                lp.setdefault(sub, {})["scale"] = val
            elif leaf == "bias":
                lp.setdefault(sub, {})["bias"] = val
            elif leaf == "running_mean":
                ls.setdefault(sub, {})["mean"] = val
            elif leaf == "running_var":
                ls.setdefault(sub, {})["var"] = val
        elif sub == "act" and leaf == "weight":  # PReLU slope
            lp["prelu"] = np.asarray(val).reshape(())

    # prune empty entries
    for d in (feat_params, feat_state):
        for k in [k for k, v in d.items() if not v]:
            del d[k]
    return params, state


def infer_picker_config(sd: Dict[str, np.ndarray],
                        module_names: Optional[Dict[int, str]] = None) -> Dict:
    """Guess (arch, units, bn, pooling) from a reference picker state dict.

    ``module_names`` maps Sequential index -> module class name when the
    source was a whole-module pickle (convert_picker_sav reads it off the
    live module) — needed to tell MaxPool slots from Dropout slots.

    Pooling-trained resnets are detected by the param-less MaxPool modules'
    gaps in the Sequential indices; classification counts param-BEARING
    modules so pooled and plain variants classify identically. Our spec
    ordering mirrors the reference module ordering (pools and dropouts in
    the same slots), so the torch Sequential indices map 1:1 onto spec
    positions and the converted param keys line up without remapping."""
    if "features.features.0.conv.weight" not in sd:
        raise ValueError(
            "this .sav uses the reference BasicConv (conv31/63/127) module "
            "layout, which this converter does not support yet; train the "
            "conv architectures natively ('topaz train --model conv31 ...') "
            "instead of converting a reference checkpoint")
    idxs = sorted({
        int(m.group(1))
        for k in sd
        if (m := re.match(r"^features\.features\.(\d+)\.", k))
    })
    n_layers = len(idxs)
    gaps = set(range(max(idxs) + 1)) - set(idxs)
    # param-less Sequential slots are MaxPool or Dropout — indices align
    # onto our spec either way (both occupy one spec slot), but the
    # GEOMETRY differs: pooled resnets use stride-1 convs + pools. The
    # state dict alone cannot distinguish them; whole-module pickles can
    # (module class names, see convert_picker_sav).
    pooling = None
    if gaps:
        if module_names is None:
            raise ValueError(
                "this picker state dict has param-less Sequential slots "
                "(MaxPool or Dropout) which change the architecture "
                "geometry; convert from the whole-module .sav (the "
                "reference's normal save format) so the module types can "
                "be read")
        if any("MaxPool" in module_names.get(i, "") for i in gaps):
            pooling = "max"
    units = sd["features.features.0.conv.weight"].shape[0]
    bn = any(".bn" in k for k in sd)
    k0 = sd["features.features.0.conv.weight"].shape[-1]
    if any(f"features.features.{i}.conv0.weight" in sd for i in idxs) and k0 == 7:
        arch = "resnet8" if n_layers == 5 else "resnet16"
    else:
        arch = "resnet6"
    out = {"arch": arch, "units": int(units), "bn": bool(bn)}
    if pooling:
        out["pooling"] = pooling
    return out


def convert_picker_sav(path: str) -> Tuple[Dict, Dict, Dict]:
    """Load a reference .sav picker -> (meta, params, state)."""
    obj = load_sav(path)
    sd = _state_dict_of(obj)
    module_names = None
    try:  # whole-module pickles expose the Sequential's module types
        module_names = {i: type(m).__name__
                        for i, m in enumerate(obj.features.features)}
    except AttributeError:
        pass
    meta = infer_picker_config(sd, module_names=module_names)
    meta["dims"] = 2
    params, state = picker_params_from_state_dict(sd)
    return meta, params, state


# -- torch-free .sav WRITER (reverse interop) --------------------------------
#
# Export our checkpoints as torch-zip-format state-dict .sav files that
# `torch.load` (and therefore the reference CLI's --model flag,
# topaz/model/factory.py:54-56) reads directly — written with zipfile +
# pickle only, no torch import. The pickle references
# torch._utils._rebuild_tensor_v2 and torch.FloatStorage as globals; when
# torch is importable the real objects are used, otherwise inert stand-ins
# are registered under a synthetic 'torch' module for the duration of the
# pickling (the pickle bytes are identical either way).


class _StorageOut:
    """Marker whose persistent id becomes the ('storage', ...) pid."""

    def __init__(self, storage_cls, key: str, numel: int):
        self.storage_cls = storage_cls
        self.key = key
        self.numel = numel


class _TensorOut:
    """Pickles as torch._utils._rebuild_tensor_v2(storage, 0, size,
    stride, False, OrderedDict())."""

    def __init__(self, rebuild, storage: _StorageOut, shape, stride):
        self._rebuild = rebuild
        self._storage = storage
        self._shape = tuple(int(s) for s in shape)
        self._stride = tuple(int(s) for s in stride)

    def __reduce__(self):
        from collections import OrderedDict

        return (self._rebuild, (self._storage, 0, self._shape,
                                self._stride, False, OrderedDict()))


def _sav_write_globals():
    """(rebuild_fn, float_storage_cls) with the import paths torch.load
    expects; real torch objects when available, stand-ins otherwise."""
    try:
        import torch

        return torch._utils._rebuild_tensor_v2, torch.FloatStorage, None
    except ImportError:
        import sys
        import types

        torch_mod = types.ModuleType("torch")
        utils_mod = types.ModuleType("torch._utils")

        def _rebuild_tensor_v2(*args):  # never called; pickled by name
            raise RuntimeError("write-side stub")

        _rebuild_tensor_v2.__module__ = "torch._utils"
        _rebuild_tensor_v2.__qualname__ = "_rebuild_tensor_v2"

        class FloatStorage:  # noqa: N801 - torch class name
            pass

        FloatStorage.__module__ = "torch"
        FloatStorage.__qualname__ = "FloatStorage"
        utils_mod._rebuild_tensor_v2 = _rebuild_tensor_v2
        torch_mod._utils = utils_mod
        torch_mod.FloatStorage = FloatStorage
        inserted = []
        for name, mod in (("torch", torch_mod), ("torch._utils", utils_mod)):
            # a None entry means imports are blocked — same as absent here
            if sys.modules.get(name) is None:
                sys.modules[name] = mod
                inserted.append(name)
        return _rebuild_tensor_v2, FloatStorage, inserted


def write_sav(path: str, state_dict: Dict[str, np.ndarray]) -> None:
    """Write ``state_dict`` (name -> float array) as a torch zip-format
    ``.sav`` readable by ``torch.load`` — without importing torch."""
    import io
    import pickle
    import sys
    import zipfile
    from collections import OrderedDict

    rebuild, storage_cls, inserted = _sav_write_globals()
    try:
        out = OrderedDict()
        storages = []
        for i, (name, arr) in enumerate(state_dict.items()):
            arr = np.ascontiguousarray(np.asarray(arr, dtype=np.float32))
            # C-contiguous strides in ELEMENTS (torch convention)
            stride = []
            acc = 1
            for s in reversed(arr.shape):
                stride.insert(0, acc)
                acc *= int(s)
            storage = _StorageOut(storage_cls, str(i), arr.size)
            storages.append((storage, arr))
            out[name] = _TensorOut(rebuild, storage, arr.shape, stride)

        buf = io.BytesIO()
        p = pickle.Pickler(buf, protocol=2)

        def persistent_id(obj):
            if isinstance(obj, _StorageOut):
                return ("storage", obj.storage_cls, obj.key, "cpu",
                        obj.numel)
            return None

        p.persistent_id = persistent_id
        p.dump(out)

        base = os.path.splitext(os.path.basename(path))[0]
        with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
            zf.writestr(f"{base}/data.pkl", buf.getvalue())
            for storage, arr in storages:
                zf.writestr(f"{base}/data/{storage.key}", arr.tobytes())
            zf.writestr(f"{base}/version", "3\n")
    finally:
        for name in inserted or []:
            sys.modules.pop(name, None)


def _from_hwio(w: np.ndarray) -> np.ndarray:
    """<spatial>IO -> OI<spatial> (inverse of _to_hwio)."""
    nd = w.ndim
    perm = (nd - 1, nd - 2) + tuple(range(nd - 2))
    return np.ascontiguousarray(np.transpose(np.asarray(w), perm))


def _basic_conv_state_dict(spec, params: Dict, state: Dict) -> Dict[str, np.ndarray]:
    """conv31/63/127 export layout: the reference BasicConv
    (topaz/model/features/basic.py:15-76) stores raw nn.Conv2d /
    BatchNorm / activation modules directly in its Sequential, so every
    conv group spans several Sequential slots (conv, [bn], act, [pool],
    [dropout]) — unlike our one-spec-per-group indexing and unlike the
    resnet module layout."""
    from topaz_tpu.models.layers import ConvSpec, DropoutSpec, PoolSpec

    sd: Dict[str, np.ndarray] = {}
    feat_params = params.get("features", {})
    feat_state = (state or {}).get("features", {})
    slot = 0
    for idx, lspec in enumerate(spec.features):
        lp = feat_params.get(str(idx), {})
        ls = feat_state.get(str(idx), {})
        if isinstance(lspec, (PoolSpec, DropoutSpec)):
            slot += 1  # param-less Sequential slot
            continue
        if not isinstance(lspec, ConvSpec):
            raise ValueError(
                f"unexpected layer {type(lspec).__name__} in a conv arch")
        pre = f"features.features.{slot}."
        sd[pre + "weight"] = _from_hwio(lp["conv_w"])
        if "conv_b" in lp:
            sd[pre + "bias"] = np.asarray(lp["conv_b"])
        slot += 1
        if lspec.bn:
            pre = f"features.features.{slot}."
            sd[pre + "weight"] = np.asarray(lp["bn"]["scale"])
            sd[pre + "bias"] = np.asarray(lp["bn"]["bias"])
            sd[pre + "running_mean"] = np.asarray(ls["bn"]["mean"])
            sd[pre + "running_var"] = np.asarray(ls["bn"]["var"])
            sd[pre + "num_batches_tracked"] = np.zeros((), np.int64)
            slot += 1
        if "prelu" in lp:  # nn.PReLU() holds one weight; ReLU is param-less
            sd[f"features.features.{slot}.weight"] = \
                np.asarray(lp["prelu"]).reshape(1)
        slot += 1
    if "classifier" in params:
        sd["classifier.weight"] = _from_hwio(params["classifier"]["w"])
        sd["classifier.bias"] = np.asarray(params["classifier"]["b"])
    return sd


def picker_state_dict(spec, params: Dict, state: Dict) -> Dict[str, np.ndarray]:
    """Inverse of :func:`picker_params_from_state_dict`: our picker trees
    -> the reference LinearClassifier state-dict key layout
    (topaz/model/classifier.py + features/resnet.py; conv archs use the
    raw-Sequential layout of features/basic.py via
    :func:`_basic_conv_state_dict`)."""
    if spec.arch.startswith("conv"):
        return _basic_conv_state_dict(spec, params, state)
    sd: Dict[str, np.ndarray] = {}
    feat_params = params.get("features", {})
    feat_state = (state or {}).get("features", {})
    for idx, lp in feat_params.items():
        pre = f"features.features.{idx}."
        ls = feat_state.get(idx, {})
        for ours, theirs, is_conv in (
                ("conv_w", "conv.weight", True),
                ("conv_b", "conv.bias", False),
                ("conv0_w", "conv0.weight", True),
                ("conv0_b", "conv0.bias", False),
                ("conv1_w", "conv1.weight", True),
                ("conv1_b", "conv1.bias", False),
                ("proj_w", "proj.weight", True)):
            if ours in lp:
                v = lp[ours]
                sd[pre + theirs] = _from_hwio(v) if is_conv else np.asarray(v)
        if "prelu" in lp:
            sd[pre + "act.weight"] = np.asarray(lp["prelu"]).reshape(1)
        for sub, d in lp.items():
            if isinstance(d, dict) and sub.startswith("bn"):
                if "scale" in d:
                    sd[pre + sub + ".weight"] = np.asarray(d["scale"])
                if "bias" in d:
                    sd[pre + sub + ".bias"] = np.asarray(d["bias"])
        for sub, d in ls.items():
            if isinstance(d, dict) and sub.startswith("bn"):
                if "mean" in d:
                    sd[pre + sub + ".running_mean"] = np.asarray(d["mean"])
                if "var" in d:
                    sd[pre + sub + ".running_var"] = np.asarray(d["var"])
                sd[pre + sub + ".num_batches_tracked"] = np.zeros((), np.int64)
    if "classifier" in params:
        sd["classifier.weight"] = _from_hwio(params["classifier"]["w"])
        sd["classifier.bias"] = np.asarray(params["classifier"]["b"])
    return sd


def export_picker_sav(path: str, model: str,
                      whole_module: bool = False) -> None:
    """Export a picker (alias or .npz checkpoint) as a reference-layout
    ``.sav``.

    Default (torch-free): a state-dict archive — load on the torch side
    with ``model.load_state_dict(torch.load(path, weights_only=True))``
    on a matching-architecture LinearClassifier.

    ``whole_module=True``: a pickled nn.Module, drop-in for the reference
    CLI's ``--model`` flag (whose user path expects a whole module,
    topaz/model/factory.py:54-56) — requires torch AND the reference
    ``topaz`` package importable at export time."""
    from topaz_tpu.models.factory import load_picker

    spec, params, state = load_picker(model)
    sd = picker_state_dict(spec, params, state)
    if not whole_module:
        write_sav(path, sd)
        return

    import torch
    try:
        from topaz.model.classifier import LinearClassifier
        from topaz.model.factory import get_feature_extractor
    except ImportError as e:
        raise ImportError(
            "whole-module export pickles a reference nn.Module, so the "
            "reference 'topaz' package must be importable at export time "
            "(pip install topaz-em, or add its checkout to PYTHONPATH); "
            "use the default state-dict export otherwise"
        ) from e

    cfg = dict(spec.config or [])
    # reference kwargs are plain bools/ints (resnet.py:255,281 / basic.py:15)
    kwargs = {"units": int(cfg.get("units", 32)),
              "dropout": float(cfg.get("dropout", 0.0)),
              "bn": bool(cfg.get("bn", False))}
    if cfg.get("pooling"):
        kwargs["pooling"] = cfg["pooling"]
    if spec.arch.startswith("conv") and cfg.get("unit_scaling"):
        kwargs["unit_scaling"] = int(cfg["unit_scaling"])
    act = cfg.get("activation")
    if act is not None:
        # reference defaults: PReLU for conv archs (basic.py:16), ReLU for
        # resnets (resnet.py:255,281) — only pass the kwarg when it differs
        default = "prelu" if spec.arch.startswith("conv") else "relu"
        if act != default:
            import torch.nn as nn

            kwargs["activation"] = {"relu": nn.ReLU, "prelu": nn.PReLU}[act]
    feat = get_feature_extractor(spec.arch, **kwargs)
    module = LinearClassifier(feat)
    module.load_state_dict({
        k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()
    })
    module.eval()
    torch.save(module, path)


def state_dict_from_params_tree(params: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    """Inverse of :func:`params_tree_from_state_dict`: nested tree with
    'w'/'b'/'scale' leaves -> torch dotted state-dict names (weights back
    to OI<spatial>)."""
    sd: Dict[str, np.ndarray] = {}
    for key, val in params.items():
        name = prefix + key if prefix == "" else f"{prefix}.{key}"
        if isinstance(val, dict):
            sd.update(state_dict_from_params_tree(val, name))
        elif key == "w":
            sd[prefix + ".weight" if prefix else "weight"] = _from_hwio(val)
        elif key == "b":
            sd[prefix + ".bias" if prefix else "bias"] = np.asarray(val)
        elif key == "scale":
            sd[prefix + ".weight" if prefix else "weight"] = np.asarray(val)
        else:
            sd[name] = np.asarray(val)
    return sd


def export_denoiser_sav(path: str, model: str,
                        whole_module: bool = False) -> None:
    """Export a denoiser (alias, .npz checkpoint, or .sav) as a
    reference-layout ``.sav``.

    Default (torch-free): a state-dict archive readable by ``torch.load``
    + ``load_state_dict`` on a matching-architecture module.

    ``whole_module=True``: a pickled nn.Module — drop-in for the
    reference denoise CLI's ``--model`` flag, whose user path does a bare
    ``torch.load`` and only re-instantiates 2D modules when it gets a
    whole module back (topaz/denoising/models.py:608-610) — requires
    torch AND the reference ``topaz`` package importable at export
    time."""
    from topaz_tpu.models.denoise_factory import load_denoiser

    meta, params = load_denoiser(model)
    sd = state_dict_from_params_tree(params)
    if not whole_module:
        if meta.get("arch") == "unet3":
            import warnings

            warnings.warn(
                "exporting a unet3 (noise-residual) denoiser as a "
                "state-dict: the reference must load it as UDenoiseNet3, "
                "which its state-dict loader cannot express — use "
                "whole_module=True or pass the arch explicitly on the "
                "reference side")
        write_sav(path, sd)
        return

    import torch
    try:
        from topaz.denoising import models as ref_models
    except ImportError as e:
        raise ImportError(
            "whole-module export pickles a reference nn.Module, so the "
            "reference 'topaz' package must be importable at export time "
            "(pip install topaz-em, or add its checkout to PYTHONPATH); "
            "use the default state-dict export otherwise"
        ) from e

    arch = meta.get("arch")
    dims = int(meta.get("dims", 2))
    nf = int(meta.get("nf", 48))
    bw = int(meta.get("base_width", 11))
    tw = int(meta.get("top_width", 3))
    if dims == 3:
        if arch not in ("unet",):
            raise ValueError(
                f"no reference 3D module for denoiser arch {arch!r}")
        module = ref_models.UDenoiseNet3D(nf=nf, base_width=bw, top_width=tw)
    elif arch == "unet":
        module = ref_models.UDenoiseNet(nf=nf, base_width=bw, top_width=tw)
    elif arch == "unet-small":
        module = ref_models.UDenoiseNetSmall(nf=nf, width=bw, top_width=tw)
    elif arch == "unet2":
        module = ref_models.UDenoiseNet2(nf=nf)
    elif arch == "unet3":
        module = ref_models.UDenoiseNet3()
    elif arch == "fcnet":
        module = ref_models.DenoiseNet2(nf, width=bw)
    elif arch == "affine":
        module = ref_models.AffineDenoise()
    else:
        raise ValueError(f"unknown denoiser arch {arch!r}")
    module.load_state_dict({
        k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()
    })
    module.eval()
    torch.save(module, path)
