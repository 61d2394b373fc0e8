"""ctypes bindings for the native tar reader (native/tarindex.cpp).

Builds the shared library on first use with g++ (cached in native/build);
falls back cleanly to the pure-python tarfile reader if the toolchain or
format support is missing (pax archives return -2 from the index call).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Dict, Iterator, List, Optional, Tuple

log = logging.getLogger("x2i_tpu.data.native")

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "tarindex.cpp")
_SO = os.path.join(_REPO, "native", "build", "libtarindex.so")
_lock = threading.Lock()
_lib = None
_tried = False


class TarEntry(ctypes.Structure):
    _fields_ = [("name", ctypes.c_char * 256),
                ("offset", ctypes.c_int64),
                ("size", ctypes.c_int64)]


def _build() -> Optional[str]:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception as exn:              # noqa: BLE001
        log.warning("native tar build failed (%r); using python reader",
                    exn)
        return None


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _SO if os.path.exists(_SO) else _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.tar_index.restype = ctypes.c_int64
        lib.tar_index.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(TarEntry),
                                  ctypes.c_int64]
        lib.tar_read.restype = ctypes.c_int64
        lib.tar_read.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                 ctypes.c_int64, ctypes.c_char_p]
        _lib = lib
        return _lib


def index_tar(path: str, max_entries: int = 1 << 20
              ) -> Optional[List[Tuple[str, int, int]]]:
    """-> [(member_name, offset, size)] or None if unsupported."""
    lib = get_lib()
    if lib is None:
        return None
    arr = (TarEntry * max_entries)()
    n = lib.tar_index(path.encode(), arr, max_entries)
    if n < 0:
        return None
    return [(arr[i].name.decode(errors="replace"), arr[i].offset,
             arr[i].size) for i in range(min(n, max_entries))]


def read_member(path: str, offset: int, size: int) -> bytes:
    lib = get_lib()
    buf = ctypes.create_string_buffer(size)
    got = lib.tar_read(path.encode(), offset, size, buf)
    return buf.raw[:got]


def native_tar_samples(path: str) -> Optional[Iterator[Dict]]:
    """Webdataset-convention sample iterator over one shard using the
    native index; None when the archive needs the python fallback."""
    idx = index_tar(path)
    if idx is None:
        return None

    def gen():
        current_key = None
        sample: Dict = {}
        for name, offset, size in idx:
            base = os.path.basename(name)
            if "." not in base:
                continue
            key, ext = base.split(".", 1)
            if key != current_key:
                if current_key is not None and sample:
                    yield sample
                current_key = key
                sample = {"__key__": key, "__url__": path}
            sample[ext.lower()] = read_member(path, offset, size)
        if current_key is not None and sample:
            yield sample

    return gen()
