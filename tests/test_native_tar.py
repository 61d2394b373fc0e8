"""Native C++ tar reader: builds, indexes, reads; byte-identical samples to
the python tarfile path; pax fallback works."""

import io
import json
import tarfile

import numpy as np
import pytest

from x2i_tpu.data.native_tar import get_lib, index_tar, native_tar_samples
from x2i_tpu.data.webdataset import tar_samples


def _write_shard(path, n, fmt=tarfile.GNU_FORMAT):
    with tarfile.open(path, "w", format=fmt) as tf:
        for i in range(n):
            for ext, data in [("json", json.dumps(
                    {"caption_en": f"cap {i}"}).encode()),
                    ("bin", bytes(range(i % 250, i % 250 + 5)))]:
                info = tarfile.TarInfo(f"{i:06d}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


def test_native_lib_builds():
    assert get_lib() is not None


def test_index_and_samples_match_python(tmp_path):
    shard = str(tmp_path / "s.tar")
    _write_shard(shard, 5)
    idx = index_tar(shard)
    assert idx is not None and len(idx) == 10
    native = list(native_tar_samples(shard))
    python = list(tar_samples(iter([shard]), use_native=False))
    assert len(native) == len(python) == 5
    for a, b in zip(native, python):
        assert a["__key__"] == b["__key__"]
        assert a["json"] == b["json"]
        assert a["bin"] == b["bin"]


def test_long_names(tmp_path):
    shard = str(tmp_path / "long.tar")
    longdir = "x" * 140
    with tarfile.open(shard, "w", format=tarfile.GNU_FORMAT) as tf:
        data = b"hello"
        info = tarfile.TarInfo(f"{longdir}/sample0.txt")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    native = list(native_tar_samples(shard))
    assert native[0]["txt"] == b"hello"


def test_pax_falls_back(tmp_path):
    shard = str(tmp_path / "pax.tar")
    # force a pax extended header with a non-ascii member name
    with tarfile.open(shard, "w", format=tarfile.PAX_FORMAT) as tf:
        data = b"{}"
        info = tarfile.TarInfo("样本0.json")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
        info2 = tarfile.TarInfo("a0.json")
        info2.size = len(data)
        tf.addfile(info2, io.BytesIO(data))
    assert index_tar(shard) is None        # native refuses pax headers
    samples = list(tar_samples(iter([shard])))  # python fallback kicks in
    assert len(samples) == 2
