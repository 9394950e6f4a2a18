"""ctypes loader for the native deploy inference core (mlp_infer.cpp).

Compiles the shared library with g++ on first use (cached next to the
source; zero-egress image, no pip) and exposes `NativePolicy`, a drop-in for
`pbhc_tpu.deploy.export.NumpyPolicy` with preallocated native scratch — the
TPU framework's equivalent of the reference's onnxruntime C++ deploy core
(reference urci.py:97-136, deploy_real.py:31).
"""
from __future__ import annotations

import ctypes
import json
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SRC = _DIR / "mlp_infer.cpp"
_SO = _DIR / "mlp_infer.so"
_ACT = {"ELU": 0, "ReLU": 1, "Tanh": 2}


def _build():
    if _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           str(_SRC), "-o", str(_SO)]
    subprocess.run(cmd, check=True, capture_output=True)


_lib = None


def _load():
    global _lib
    if _lib is None:
        _build()
        _lib = ctypes.CDLL(str(_SO))
        _lib.mlp_create.restype = ctypes.c_void_p
        _lib.mlp_create.argtypes = [ctypes.c_int32]
        _lib.mlp_add_layer.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32]
        _lib.mlp_infer.restype = ctypes.c_int32
        _lib.mlp_infer.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_float)]
        _lib.mlp_destroy.argtypes = [ctypes.c_void_p]
    return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativePolicy:
    """Native-core policy: same .npz artifact and call surface as NumpyPolicy."""

    def __init__(self, path):
        lib = _load()
        data = np.load(path)
        self.meta = json.loads(bytes(data["meta_json"]).decode())
        act = _ACT.get(str(self.meta.get("activation", "ELU")), 0)
        self._h = ctypes.c_void_p(lib.mlp_create(act))
        self._lib = lib
        n = self.meta["n_layers"]
        self.layers = []
        for i in range(n):
            w = np.ascontiguousarray(data[f"w{i}"], dtype=np.float32)
            b = np.ascontiguousarray(data[f"b{i}"], dtype=np.float32)
            self.layers.append((w, b))
            lib.mlp_add_layer(self._h, _fptr(w), _fptr(b), w.shape[0], w.shape[1])
        self.obs_dim = self.layers[0][0].shape[0]
        self.out_dim = self.layers[-1][1].shape[0]
        self._out = np.empty(self.out_dim, dtype=np.float32)

    def __call__(self, obs):
        obs = np.ascontiguousarray(obs, dtype=np.float32)
        if obs.ndim == 1:
            r = self._lib.mlp_infer(self._h, _fptr(obs), obs.shape[0], _fptr(self._out))
            assert r == self.out_dim, f"native infer failed (got {r})"
            return self._out.copy()
        out = np.empty((obs.shape[0], self.out_dim), dtype=np.float32)
        for i in range(obs.shape[0]):
            row = np.ascontiguousarray(obs[i])
            r = self._lib.mlp_infer(self._h, _fptr(row), row.shape[0], _fptr(out[i]))
            assert r == self.out_dim
        return out

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.mlp_destroy(self._h)
        except Exception:
            pass
