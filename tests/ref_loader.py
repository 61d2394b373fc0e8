"""Import helpers for the reference's vendored torch modules.

The reference modules under /root/reference/minicpm were written against
older deps (transformers 4.49 APIs, soundfile/librosa/vocos installed).
This environment lacks some of those, so golden tests load the modules
with minimal, semantics-preserving shims:

  * stub modules for soundfile / librosa / vocos (audio-IO only; the
    forward math under test never touches them),
  * `LogitsWarper` (removed from new transformers) aliased to
    LogitsProcessor via a source-level rewrite (an injected module
    attribute is discarded by transformers' lazy import machinery),
  * resampler.py's missing `from typing import List` injected (the
    reference file uses the name without importing it).

Nothing about the models' numerics is altered — the loaded classes run
their original code.
"""

from __future__ import annotations

import importlib.machinery
import importlib.util
import sys
import types

REF = "/root/reference/minicpm"
REF_IVL = "/root/reference/model_internvl/internvl"


def _stub(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


def install_audio_stubs() -> None:
    _stub("soundfile")
    _stub("librosa")
    v = _stub("vocos")
    if not hasattr(v, "Vocos"):
        v.Vocos = object
    vp = _stub("vocos.pretrained")
    if not hasattr(vp, "instantiate_class"):
        vp.instantiate_class = lambda *a, **k: None
    v.pretrained = vp


_REWRITES = {
    # removed from new transformers; only used as a type annotation /
    # base class for the TTS logits warper
    "from transformers import LogitsWarper":
        "from transformers import LogitsProcessor as LogitsWarper",
    "from transformers.generation.logits_process import LogitsWarper":
        "from transformers.generation.logits_process import "
        "LogitsProcessor as LogitsWarper",
    # new transformers unified the attention dispatch into one class and
    # dropped the past_key_value element from the return tuple; restore
    # the old 3-tuple contract (numerics identical)
    "from transformers.models.whisper.modeling_whisper import "
    "WHISPER_ATTENTION_CLASSES":
        "from transformers.models.whisper.modeling_whisper import "
        "WhisperAttention as _WhisperAttention2\n"
        "class _WhisperAttention3(_WhisperAttention2):\n"
        "    def forward(self, *args, **kwargs):\n"
        "        pkv = kwargs.pop('past_key_value', None)\n"
        "        if pkv is not None:\n"
        "            kwargs['past_key_values'] = pkv\n"
        "        out = super().forward(*args, **kwargs)\n"
        "        return out if len(out) == 3 else tuple(out) + (pkv,)\n"
        "WHISPER_ATTENTION_CLASSES = {'eager': _WhisperAttention3, "
        "'sdpa': _WhisperAttention3, "
        "'flash_attention_2': _WhisperAttention3}",
}


def install_timm_stub() -> None:
    """timm is absent; the reference InternViT only uses DropPath, which
    at drop_path_rate=0 (the shipped configs) is Identity anyway."""
    import torch.nn as nn
    t = _stub("timm")
    tm = _stub("timm.models")
    tl = _stub("timm.models.layers")
    if not hasattr(tl, "DropPath"):
        class DropPath(nn.Identity):
            def __init__(self, drop_prob=0.0):
                assert not drop_prob, "stubbed DropPath supports rate 0 only"
                super().__init__()
        tl.DropPath = DropPath
    tm.layers = tl
    t.models = tm


def load_reference_module(filename: str, modname: str,
                          extra_globals: dict | None = None,
                          root: str = REF) -> types.ModuleType:
    """Exec a reference file with the shims above; returns the module."""
    install_audio_stubs()
    path = f"{root}/{filename}"
    with open(path) as f:
        src = f.read()
    for old, new in _REWRITES.items():
        src = src.replace(old, new)
    mod = types.ModuleType(modname)
    mod.__file__ = path
    mod.__spec__ = importlib.machinery.ModuleSpec(modname, None,
                                                  origin=path)
    if extra_globals:
        mod.__dict__.update(extra_globals)
    sys.modules[modname] = mod
    code = compile(src, path, "exec")
    exec(code, mod.__dict__)
    return mod


def load_navit_siglip() -> types.ModuleType:
    return load_reference_module("modeling_navit_siglip.py", "ref_navit")


def load_resampler() -> types.ModuleType:
    from typing import List
    return load_reference_module("resampler.py", "ref_resampler",
                                 extra_globals={"List": List})


def load_intern_vit() -> types.ModuleType:
    """The reference InternViT (modeling_intern_vit.py) with a timm
    DropPath stub; relative config import pre-seeded via a synthetic
    package rooted at model_internvl/internvl."""
    if "refivl.modeling_intern_vit" in sys.modules:
        return sys.modules["refivl.modeling_intern_vit"]
    install_timm_stub()
    pkg = types.ModuleType("refivl")
    pkg.__path__ = [REF_IVL]
    pkg.__spec__ = importlib.machinery.ModuleSpec(
        "refivl", None, is_package=True)
    pkg.__spec__.submodule_search_locations = [REF_IVL]
    sys.modules.setdefault("refivl", pkg)
    return load_reference_module("modeling_intern_vit.py",
                                 "refivl.modeling_intern_vit",
                                 extra_globals={"__package__": "refivl"},
                                 root=REF_IVL)


def load_minicpmo() -> types.ModuleType:
    """modeling_minicpmo.py uses package-relative imports; register a
    synthetic `refpkg` package rooted at the reference dir, pre-seed the
    submodules that need shims, then exec with __package__ set."""
    if "refpkg.modeling_minicpmo" in sys.modules:
        return sys.modules["refpkg.modeling_minicpmo"]
    install_audio_stubs()
    pkg = types.ModuleType("refpkg")
    pkg.__path__ = [REF]
    pkg.__spec__ = importlib.machinery.ModuleSpec(
        "refpkg", None, is_package=True)
    pkg.__spec__.submodule_search_locations = [REF]
    sys.modules.setdefault("refpkg", pkg)
    from typing import List
    sys.modules["refpkg.resampler"] = load_reference_module(
        "resampler.py", "refpkg.resampler", extra_globals={"List": List})
    sys.modules["refpkg.modeling_navit_siglip"] = load_reference_module(
        "modeling_navit_siglip.py", "refpkg.modeling_navit_siglip")
    mod = load_reference_module("modeling_minicpmo.py",
                                "refpkg.modeling_minicpmo",
                                extra_globals={"__package__": "refpkg"})
    return mod


def load_minicpmo_processor() -> types.ModuleType:
    """processing_minicpmo.py (placeholder math + audio chunking). Needs
    a torchaudio stub (import-only; the paths under test never call it)
    and the package-relative image_processing_minicpmv."""
    if "refpkg.processing_minicpmo" in sys.modules:
        return sys.modules["refpkg.processing_minicpmo"]
    _stub("torchaudio")
    pkg = types.ModuleType("refpkg")
    pkg.__path__ = [REF]
    pkg.__spec__ = importlib.machinery.ModuleSpec(
        "refpkg", None, is_package=True)
    pkg.__spec__.submodule_search_locations = [REF]
    sys.modules.setdefault("refpkg", pkg)
    if "refpkg.image_processing_minicpmv" not in sys.modules:
        sys.modules["refpkg.image_processing_minicpmv"] = \
            load_reference_module("image_processing_minicpmv.py",
                                  "refpkg.image_processing_minicpmv",
                                  extra_globals={"__package__": "refpkg"})
    return load_reference_module("processing_minicpmo.py",
                                 "refpkg.processing_minicpmo",
                                 extra_globals={"__package__": "refpkg"})


def install_datamodule_stubs() -> None:
    """webdataset / torchvision / pytorch_lightning / braceexpand /
    core.data.dataloader are absent; the datamodule parity goldens only
    call `ImageEmbeddingDataset.preproc` (pure tokenization), which
    touches none of them — stub just enough for module import.

    What must exist at import time of utils/datamodule_*.py:
      * class bases `wds.DataPipeline` / `wds.compat.FluidInterface`
        and `LightningDataModule`,
      * `wds.handlers.reraise_exception` (a def-time default arg),
      * `wds.filters.pipelinefilter` (called at module level),
      * attribute-only imports from torchvision / braceexpand / tqdm /
        core.data.dataloader.
    """
    w = _stub("webdataset")
    if not hasattr(w, "DataPipeline"):
        class DataPipeline:
            def __init__(self, *a, **k):
                pass
        w.DataPipeline = DataPipeline
        compat = _stub("webdataset.compat")
        class FluidInterface:
            pass
        compat.FluidInterface = FluidInterface
        w.compat = compat
        handlers = _stub("webdataset.handlers")
        handlers.reraise_exception = lambda exn: False
        w.handlers = handlers
        filters = _stub("webdataset.filters")
        filters.pipelinefilter = lambda fn: (lambda *a, **k: fn)
        w.filters = filters

    tv = _stub("torchvision")
    tvt = _stub("torchvision.transforms")
    tvf = _stub("torchvision.transforms.functional")
    if not hasattr(tvf, "crop"):
        tvf.crop = lambda img, top, left, h, w_: img
    tvt.functional = tvf
    for name in ("Compose", "ToTensor", "Normalize", "CenterCrop"):
        if not hasattr(tvt, name):
            setattr(tvt, name, type(name, (), {
                "__init__": lambda self, *a, **k: None}))
    tvu = _stub("torchvision.utils")
    if not hasattr(tvu, "save_image"):
        tvu.save_image = lambda *a, **k: None
    tv.transforms = tvt
    tv.utils = tvu

    pl = _stub("pytorch_lightning")
    if not hasattr(pl, "LightningDataModule"):
        class LightningDataModule:
            def __init__(self, *a, **k):
                pass
        pl.LightningDataModule = LightningDataModule

    _stub("braceexpand")
    zh = _stub("zhconv")
    if not hasattr(zh, "convert"):
        zh.convert = lambda text, locale: text   # identity: goldens use
        # captions that are already simplified Chinese or English
    core = _stub("core")
    cdata = _stub("core.data")
    cdl = _stub("core.data.dataloader")
    if not hasattr(cdl, "PreprocessDataLoader"):
        cdl.PreprocessDataLoader = object
    if not hasattr(cdl, "Preprocess"):
        cdl.Preprocess = object
    cdata.dataloader = cdl
    core.data = cdata


def load_reference_datamodule(family: str) -> types.ModuleType:
    """Load /root/reference/utils/datamodule_{family}.py with the stubs
    above; returns the module (use ImageEmbeddingDataset.preproc)."""
    name = f"refdm_{family}"
    if name in sys.modules:
        return sys.modules[name]
    install_datamodule_stubs()
    return load_reference_module(f"datamodule_{family}.py", name,
                                 root="/root/reference/utils")
