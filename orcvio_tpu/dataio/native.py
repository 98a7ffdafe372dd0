"""ctypes bindings for the native EuRoC loader (native/euroc_loader.cpp).

Builds the shared library on first use (g++, libpng — both baked into the
image) and exposes the same interface as the Python reader in euroc.py, plus
threaded image prefetch. Falls back gracefully if the toolchain is missing.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libeuroc_loader.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "euroc_loader.cpp")


def build_native(force: bool = False) -> Optional[str]:
    """Compile the loader if needed; returns the .so path or None."""
    if os.path.exists(_SO_PATH) and not force:
        if os.path.getmtime(_SO_PATH) >= os.path.getmtime(_SRC_PATH):
            return _SO_PATH
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _SO_PATH, _SRC_PATH, "-lpng", "-lpthread"],
            check=True, capture_output=True, text=True,
        )
        return _SO_PATH
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        import warnings

        warnings.warn(f"native loader build failed: {getattr(e, 'stderr', e)}")
        return None


class NativeEurocLoader:
    """Threaded native EuRoC reader with the euroc.py interface + images."""

    def __init__(self, root: str, prefetch_threads: int = 3, prefetch_ahead: int = 8):
        so = build_native()
        if so is None:
            raise RuntimeError("native loader unavailable (g++/libpng missing)")
        lib = ctypes.CDLL(so)
        lib.el_open.restype = ctypes.c_void_p
        lib.el_open.argtypes = [ctypes.c_char_p]
        vp, ci, cd = ctypes.c_void_p, ctypes.c_int, ctypes.c_double
        dblp = ctypes.POINTER(ctypes.c_double)
        fltp = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        sigs = {
            "el_num_frames": (ci, [vp]),
            "el_num_imu": (ci, [vp]),
            "el_num_gt": (ci, [vp]),
            "el_frame_times": (None, [vp, dblp]),
            "el_copy_imu": (None, [vp, dblp, dblp, dblp]),
            "el_copy_gt": (None, [vp, dblp, dblp, dblp]),
            "el_bin_imu": (None, [vp, ci, cd, cd, dblp, dblp, dblp, u8p]),
            "el_image_size": (ci, [vp, ctypes.POINTER(ci), ctypes.POINTER(ci)]),
            "el_start_prefetch": (None, [vp, ci, ci]),
            "el_get_image": (ci, [vp, ci, fltp, ci]),
            "el_close": (None, [vp]),
        }
        for name, (res, args) in sigs.items():
            getattr(lib, name).restype = res
            getattr(lib, name).argtypes = args
        self._lib = lib
        self._h = lib.el_open(root.encode())
        if not self._h:
            raise RuntimeError(f"el_open failed for {root}")
        self.n_frames = lib.el_num_frames(self._h)
        self.n_imu = lib.el_num_imu(self._h)
        self.n_gt = lib.el_num_gt(self._h)

        self.cam_t = np.zeros(self.n_frames)
        lib.el_frame_times(self._h, self.cam_t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))

        self.imu_t = np.zeros(self.n_imu)
        self.gyro = np.zeros((self.n_imu, 3))
        self.acc = np.zeros((self.n_imu, 3))
        dbl = ctypes.POINTER(ctypes.c_double)
        lib.el_copy_imu(
            self._h, self.imu_t.ctypes.data_as(dbl),
            self.gyro.ctypes.data_as(dbl), self.acc.ctypes.data_as(dbl),
        )
        if self.n_gt:
            self.gt_t = np.zeros(self.n_gt)
            self.gt_p = np.zeros((self.n_gt, 3))
            self.gt_q = np.zeros((self.n_gt, 4))
            lib.el_copy_gt(
                self._h, self.gt_t.ctypes.data_as(dbl),
                self.gt_p.ctypes.data_as(dbl), self.gt_q.ctypes.data_as(dbl),
            )
        else:
            self.gt_t = self.gt_p = self.gt_q = None

        w = ctypes.c_int()
        h = ctypes.c_int()
        if self.n_frames and lib.el_image_size(self._h, ctypes.byref(w), ctypes.byref(h)) == 0:
            self.width, self.height = w.value, h.value
        else:
            self.width = self.height = 0

        if prefetch_threads > 0 and self.n_frames:
            lib.el_start_prefetch(self._h, prefetch_threads, prefetch_ahead)

    def bin_imu(self, slab: int, td: float = 0.0, imu_rate_hint: float = 200.0):
        K = self.n_frames
        out_t = np.zeros((K, slab))
        out_g = np.zeros((K, slab, 3))
        out_a = np.zeros((K, slab, 3))
        out_m = np.zeros((K, slab), np.uint8)
        dbl = ctypes.POINTER(ctypes.c_double)
        self._lib.el_bin_imu(
            self._h, slab, ctypes.c_double(td), ctypes.c_double(imu_rate_hint),
            out_t.ctypes.data_as(dbl), out_g.ctypes.data_as(dbl), out_a.ctypes.data_as(dbl),
            out_m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out_t, out_g, out_a, out_m.astype(bool)

    def get_image(self, k: int) -> np.ndarray:
        buf = np.zeros(self.width * self.height, np.float32)
        n = self._lib.el_get_image(
            self._h, k, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), buf.size
        )
        if n < 0:
            raise RuntimeError(f"el_get_image({k}) -> {n}")
        return buf[:n].reshape(self.height, self.width)

    def close(self):
        if self._h:
            self._lib.el_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
