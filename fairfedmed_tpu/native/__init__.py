"""Native (C++) data-pipeline runtime: NPZ reader + threaded prefetch pool.

The reference hides NPZ decode latency behind torch DataLoader worker
processes (Dassl/dassl/data/data_manager.py:49-56).  Our equivalent is
``npz_loader.cpp``: a zip/NPY parser with zlib inflate and a GIL-free
producer-consumer thread pool, bound over a C ABI with ctypes (no pybind11 in
the image).  The library is compiled on first use with g++ and cached next to
the source; every entry point falls back to numpy's ``np.load`` when the
toolchain is unavailable, so the Python path never hard-depends on the native
build.

Public surface:

* ``NpzReader(path)``        — dict-like .keys()/.get(name) → np.ndarray
* ``PrefetchPool(n_threads)``— submit(path, member) → ticket; collect(ticket)
* ``native_available()``     — True when the compiled library loaded
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "npz_loader.cpp")
_SO = os.path.join(_HERE, "_npz_loader.so")

_lib = None
_lib_lock = threading.Lock()
_DTYPES = {
    "<f4": np.float32, "<f8": np.float64, "<i4": np.int32, "<i8": np.int64,
    "<i2": np.int16, "<u2": np.uint16, "|i1": np.int8, "|u1": np.uint8,
    "|b1": np.bool_, "<f2": np.float16, "<u4": np.uint32, "<u8": np.uint64,
}


def _build_candidates():
    """Yield loadable .so paths in preference order (JPEG build first),
    building missing/stale artifacts on the fly.

    Feature-suffixed artifacts so a cached NPZ-only build is upgraded to the
    JPEG build once libjpeg headers appear (a single mtime-cached .so would
    pin whichever feature set happened to build first).  A missing .cpp
    source (pruned deployment) treats any cached .so as current instead of
    raising; a candidate that fails to dlopen (e.g. libjpeg removed after
    the build) is SKIPPED by the caller, so the plain NPZ build still serves
    the prefetch pool."""
    so_jpeg = os.path.join(_HERE, "_npz_loader_jpeg.so")
    so_plain = _SO
    src_mtime = os.path.getmtime(_SRC) if os.path.exists(_SRC) else None
    last_err = ""
    for so, extra in ((so_jpeg, (["-DFFM_WITH_JPEG"], ["-ljpeg"])),
                      (so_plain, ([], []))):
        if os.path.exists(so) and (src_mtime is None
                                   or os.path.getmtime(so) >= src_mtime):
            yield so
            continue
        if src_mtime is None:
            continue  # nothing cached and no source to build from
        # negative-result stamp: a feature build that failed for THIS source
        # is not retried by every later process (the jpeg attempt otherwise
        # costs a full g++ launch per process on hosts without libjpeg).
        # Installing the missing dep later: touch the source or delete the
        # stamp to retry.
        stamp = so + ".failed"
        if os.path.exists(stamp):
            try:
                with open(stamp) as f:
                    if f.read().strip() == repr(src_mtime):
                        continue
            except OSError:
                pass
        # compile to a private temp name, then atomically publish: a
        # concurrent process must never dlopen a half-written .so, and a
        # killed compile must not leave a fresh-mtime truncated artifact
        # that every later process trusts and fails to load
        tmp = f"{so}.tmp{os.getpid()}"
        cmd = (["g++", "-O2", "-shared", "-fPIC", "-std=c++17"] + extra[0]
               + [_SRC, "-o", tmp, "-lz", "-lpthread"] + extra[1])
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
            os.replace(tmp, so)
            yield so
        except FileNotFoundError:
            continue  # no compiler: cached later candidates still serve
        except subprocess.CalledProcessError as e:
            last_err = (e.stderr or "")[-400:]
            try:
                with open(stamp, "w") as f:
                    f.write(repr(src_mtime))
            except OSError:
                pass
            continue
        finally:
            if os.path.exists(tmp):
                try:
                    os.remove(tmp)
                except OSError:
                    pass
    if last_err:
        print(f"[native] build failed, using numpy fallback: {last_err}")


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib if _lib is not False else None
        lib = None
        for so in _build_candidates():
            try:
                lib = ctypes.CDLL(so)
                break
            except OSError as e:  # e.g. cached .so against a missing soname
                print(f"[native] cannot load {so} ({e}); trying next build")
        if lib is None:
            _lib = False
            return None
        lib.nlz_open.restype = ctypes.c_void_p
        lib.nlz_open.argtypes = [ctypes.c_char_p]
        lib.nlz_close.argtypes = [ctypes.c_void_p]
        lib.nlz_num_members.argtypes = [ctypes.c_void_p]
        lib.nlz_member_name.restype = ctypes.c_char_p
        lib.nlz_member_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.nlz_member_info.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int64)]
        lib.nlz_read.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                 ctypes.c_void_p, ctypes.c_int64]
        lib.nlp_create.restype = ctypes.c_void_p
        lib.nlp_create.argtypes = [ctypes.c_int]
        lib.nlp_destroy.argtypes = [ctypes.c_void_p]
        lib.nlp_submit.restype = ctypes.c_long
        lib.nlp_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p]
        lib.nlp_wait_info.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int64)]
        lib.nlp_collect.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                    ctypes.c_void_p, ctypes.c_int64]
        lib.nlp_discard.argtypes = [ctypes.c_void_p, ctypes.c_long]
        if hasattr(lib, "njd_decode_gray"):  # FFM_WITH_JPEG build
            lib.njd_decode_gray.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                            ctypes.POINTER(ctypes.c_float)]
            lib.nlp_submit_jpeg.restype = ctypes.c_long
            lib.nlp_submit_jpeg.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                            ctypes.c_int]
        _lib = lib
        return lib


def native_available() -> bool:
    return _load() is not None


def jpeg_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "njd_decode_gray")


def decode_jpeg_gray(path: str, resolution: int) -> Optional[np.ndarray]:
    """Native grayscale JPEG decode + bilinear resize to
    ``(resolution, resolution)`` fp32 (0-255), or None when the JPEG-enabled
    native build is unavailable or the file can't be decoded."""
    lib = _load()
    if lib is None or not hasattr(lib, "njd_decode_gray"):
        return None
    out = np.empty((resolution, resolution), np.float32)
    rc = lib.njd_decode_gray(path.encode(), resolution,
                             out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if rc == 0 else None


class NpzReader:
    """Read members of one .npz without numpy's zipfile layer."""

    def __init__(self, path: str):
        self.path = path
        self._lib = _load()
        self._h = None
        if self._lib is not None:
            h = self._lib.nlz_open(path.encode())
            if h:
                self._h = ctypes.c_void_p(h)
        if self._h is None:
            self._fallback = np.load(path, allow_pickle=False)
        else:
            self._fallback = None

    def keys(self) -> List[str]:
        if self._fallback is not None:
            return list(self._fallback.keys())
        n = self._lib.nlz_num_members(self._h)
        out = []
        for i in range(n):
            name = self._lib.nlz_member_name(self._h, i).decode()
            out.append(name[:-4] if name.endswith(".npy") else name)
        return out

    def get(self, name: str) -> np.ndarray:
        if self._fallback is not None:
            return self._fallback[name]
        dtype16 = ctypes.create_string_buffer(16)
        shape8 = (ctypes.c_int64 * 8)()
        ndim = ctypes.c_int()
        nbytes = ctypes.c_int64()
        rc = self._lib.nlz_member_info(self._h, name.encode(), dtype16, shape8,
                                       ctypes.byref(ndim), ctypes.byref(nbytes))
        if rc != 0:
            raise KeyError(name)
        dt = _DTYPES.get(dtype16.value.decode())
        if dt is None:
            raise TypeError(f"unsupported dtype {dtype16.value!r} in {self.path}:{name}")
        shape = tuple(shape8[i] for i in range(ndim.value))
        arr = np.empty(shape, dtype=dt)
        rc = self._lib.nlz_read(self._h, name.encode(),
                                arr.ctypes.data_as(ctypes.c_void_p),
                                ctypes.c_int64(arr.nbytes))
        if rc < 0:
            raise IOError(f"read failed for {self.path}:{name}")
        return arr

    def __getitem__(self, name: str) -> np.ndarray:
        return self.get(name)

    def close(self):
        if self._h is not None:
            self._lib.nlz_close(self._h)
            self._h = None
        if self._fallback is not None:
            self._fallback.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class PrefetchPool:
    """Decode (path, member) requests on C++ threads ahead of consumption."""

    def __init__(self, n_threads: int = 2):
        self._lib = _load()
        self._p = None
        if self._lib is not None:
            self._p = ctypes.c_void_p(self._lib.nlp_create(n_threads))

    @property
    def native(self) -> bool:
        return self._p is not None

    def submit(self, path: str, member: str):
        if self._p is None:
            # fallback: decode synchronously, stash the result as the ticket
            with np.load(path, allow_pickle=False) as z:
                return ("_sync", z[member])
        t = self._lib.nlp_submit(self._p, path.encode(), member.encode())
        if t < 0:
            raise IOError(f"cannot open {path}")
        return t

    @property
    def supports_jpeg(self) -> bool:
        return self._p is not None and hasattr(self._lib, "njd_decode_gray")

    def submit_jpeg(self, path: str, resolution: int):
        """Queue a grayscale-JPEG decode+resize job (FedChexMimic X-rays);
        resolves through the same collect/discard machinery.  Callers must
        check :attr:`supports_jpeg` first — without the native JPEG build
        there is nothing to overlap, and the dataset's lazy PIL path is the
        faster synchronous decode."""
        if not self.supports_jpeg:
            raise RuntimeError("JPEG-enabled native build unavailable "
                               "(check PrefetchPool.supports_jpeg)")
        return self._lib.nlp_submit_jpeg(self._p, path.encode(), resolution)

    def collect(self, ticket) -> np.ndarray:
        if isinstance(ticket, tuple) and ticket[0] == "_sync":
            return ticket[1]
        dtype16 = ctypes.create_string_buffer(16)
        shape8 = (ctypes.c_int64 * 8)()
        ndim = ctypes.c_int()
        nbytes = ctypes.c_int64()
        rc = self._lib.nlp_wait_info(self._p, ctypes.c_long(ticket), dtype16,
                                     shape8, ctypes.byref(ndim), ctypes.byref(nbytes))
        if rc != 0:
            raise IOError(f"prefetch ticket {ticket} failed")
        dt = _DTYPES.get(dtype16.value.decode())
        if dt is None:
            raise TypeError(f"unsupported dtype {dtype16.value!r}")
        shape = tuple(shape8[i] for i in range(ndim.value))
        arr = np.empty(shape, dtype=dt)
        rc = self._lib.nlp_collect(self._p, ctypes.c_long(ticket),
                                   arr.ctypes.data_as(ctypes.c_void_p),
                                   ctypes.c_int64(arr.nbytes))
        if rc != 0:
            raise IOError(f"prefetch collect {ticket} failed")
        return arr

    def discard(self, ticket):
        """Drop an uncollected ticket so its decoded payload is freed."""
        if isinstance(ticket, tuple) and ticket[0] == "_sync":
            return
        if self._p is not None:
            self._lib.nlp_discard(self._p, ctypes.c_long(ticket))

    def close(self):
        if self._p is not None:
            self._lib.nlp_destroy(self._p)
            self._p = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
